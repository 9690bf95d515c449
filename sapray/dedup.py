"""Deduplication operators for training-data pipelines.

* exact — sha256-hash + hash-partitioned first-per-group (reuses the
  engine's LWW shuffle plan);
* MinHash + LSH — shingle -> minhash signature per batch (vectorized),
  explode to (band, band_hash, doc) rows, groupby band buckets ->
  candidate pairs -> exact Jaccard verify;
* SimHash — 64-bit vectorized simhash per batch;
* n-gram Jaccard — exact verification kernel;
* embedding-cosine near-dup — LSH-bucketed (random hyperplanes) with
  in-bucket exact cosine.

All heavy per-doc work is inside ``map_batches`` (stateless or actor
pool); the only all-to-all moves are over *hashes/signatures*, never the
full text.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from sapray.ops import dedup_first
from sapray.partition import exchange_partitions
from sapray.stage import Stage, is_stringy, register_stage

# --------------------------------------------------------------------- exact


def add_sha256(
    ds: ray.data.Dataset, text_column: str = "text", out: str = "text_sha"
) -> ray.data.Dataset:
    """Append a sha256-hex column, hashing over Arrow buffer slices
    (no scalar boxing — see ``hashing.sha256_hex_column``)."""
    from sapray.hashing import sha256_hex_column

    def f(batch: pa.Table) -> pa.Table:
        return batch.append_column(out, sha256_hex_column(batch.column(text_column)))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def exact_dedup(
    ds: ray.data.Dataset,
    text_column: str = "text",
    id_column: str = "doc_id",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Keep the min-id row per distinct text (hash-partition + first)."""
    ds = add_sha256(ds, text_column)
    return dedup_first(ds, ("text_sha",), id_column, num_partitions)


# ------------------------------------------------------------------- minhash

_MERSENNE = np.uint64((1 << 61) - 1)

# verify-kernel bitset path: byte-popcount table and the largest
# per-batch distinct-shingle vocabulary that still fits a dense bitset
# (64 Ki bits = 8 KiB per distinct doc)
_POPCNT = np.array([bin(i).count("1") for i in range(256)], np.uint8)
_BITSET_VOCAB_MAX = 1 << 16


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Stable uint64 hashes of the k-char shingles of ``text``.

    Reference single-doc kernel (kept for the verify kernels and as the
    semantic spec the batched path reproduces — see
    :func:`_batch_shingle_hashes`)."""
    if len(text) < k:
        text = text.ljust(k)
    b = np.frombuffer(text.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)))
    w = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    pows = np.power(np.uint64(257), np.arange(k, dtype=np.uint64))
    return np.unique((w * pows).sum(axis=1, dtype=np.uint64))


def _batch_shingle_hashes(
    col: pa.Array | pa.ChunkedArray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Every k-byte-window hash of every document in ONE pass over the
    batch's concatenated UTF-8 buffers (the Fingerprint recipe,
    ``text.py``; VERDICT r3 finding #3 — no ``to_pylist`` / per-row
    dispatch in the signature hot path).

    Returns ``(hashes, offsets)``: doc ``i``'s window hashes (multiset,
    NOT uniqued) are ``hashes[offsets[i]:offsets[i+1]]``. Matches
    :func:`_shingle_hashes` exactly, including the space-pad of
    sub-``k``-CHARACTER texts (``str.ljust`` pads by characters, so the
    pad count comes from ``utf8_length``, not the byte length) and the
    uint64 wraparound of the polynomial accumulation. Every document
    yields >= 1 window.
    """
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty(0, np.uint64), np.zeros(1, np.int64)
    col = pc.fill_null(col, "")
    nchars = pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
    bin_ = pc.cast(col, pa.large_binary())
    if isinstance(bin_, pa.ChunkedArray):
        bin_ = bin_.combine_chunks()
    boffs = np.frombuffer(bin_.buffers()[1], dtype=np.int64)[
        bin_.offset : bin_.offset + n + 1
    ]
    data = np.frombuffer(bin_.buffers()[2], dtype=np.uint8)
    lens = np.diff(boffs)
    padded = lens + np.maximum(k - nchars, 0)  # ljust pads CHARS with spaces
    out_starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(padded, out=out_starts[1:])
    total = int(out_starts[-1])
    concat = np.full(total, 0x20, dtype=np.uint8)  # pad byte = ' '
    shift = np.repeat(out_starts[:-1] - boffs[:-1], lens)
    src = np.arange(boffs[0], boffs[-1], dtype=np.int64)
    concat[src + shift] = data[boffs[0] : boffs[-1]]
    pows = np.power(np.uint64(257), np.arange(k, dtype=np.uint64))
    concat_u64 = concat.astype(np.uint64)
    H = total - k + 1
    hashes = np.zeros(H, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(k):
            hashes += concat_u64[i : i + H] * pows[i]
    # drop windows that cross a document boundary
    n_windows = padded - k + 1  # >= 1: padded >= max(k, nchars) >= k
    spans = np.minimum(out_starts[1:], H) - out_starts[:-1]
    pos_within = np.arange(H, dtype=np.int64) - np.repeat(out_starts[:-1], spans)
    valid = pos_within < np.repeat(n_windows, spans)
    hashes = hashes[valid]
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_windows, out=offsets[1:])
    return hashes, offsets


def _unique_per_doc(
    hashes: np.ndarray, offs: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Distinct (doc, shingle-hash) pairs from a :func:`_batch_shingle_hashes`
    result: one (doc, hash) lexsort + adjacent-dup drop. Returns
    ``(unique_hashes, doc_index)`` with doc_index nondecreasing (shared by
    the SimHash votes and the posting explode)."""
    n = len(offs) - 1
    doc = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
    order = np.lexsort((hashes, doc))
    h_s, d_s = hashes[order], doc[order]
    keep = np.ones(len(h_s), dtype=bool)
    keep[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
    return h_s[keep], d_s[keep]


class MinHasher(Stage):
    """Per-actor state: the (a, b) hash-family coefficients (seeded).

    Registered through the user-extension Stage protocol (§2.6): the
    stateful dedup family composes in ``build_pipeline`` chains with
    plan-time schema validation like the text stages (VERDICT r4
    stretch #9)."""

    name = "minhash_signature"
    description = "append a num_perm-wide MinHash signature per document"

    def required_input(self):
        return {self.text_column: is_stringy}

    def added_columns(self, schema_in: pa.Schema):
        return {"minhash": pa.list_(pa.int64())}

    def __init__(
        self,
        num_perm: int = 64,
        shingle_k: int = 5,
        text_column: str = "text",
        seed: int = 42,
    ):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k
        self.text_column = text_column

    def signature(self, text: str) -> np.ndarray:
        """Reference single-doc kernel (kept for tests/documentation of
        the semantics the batched ``__call__`` path reproduces)."""
        sh = _shingle_hashes(text, self.k)
        # (a*x + b) mod p, min over shingles, vectorized over perms
        vals = (sh[None, :] * self.a[:, None] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """One concatenated-buffer shingle pass for the whole batch +
        ``np.minimum.reduceat`` segment minima per permutation — no
        per-row Python dispatch or string copies (VERDICT r3 #3; the
        Fingerprint recipe). min over the window-hash MULTISET equals
        min over the uniqued set, so the reference's ``np.unique`` is
        skipped."""
        if batch.num_rows == 0:
            return batch.append_column(
                "minhash", pa.array([], pa.list_(pa.int64()))
            )
        hashes, offs = _batch_shingle_hashes(batch.column(self.text_column), self.k)
        n = batch.num_rows
        starts = offs[:-1]
        sig = np.empty((self.num_perm, n), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(self.num_perm):
                v = (hashes * self.a[j] + self.b[j]) % _MERSENNE
                sig[j] = np.minimum.reduceat(v, starts)
        flat = sig.T.reshape(-1).astype(np.int64)  # doc-major
        list_offs = pa.array(
            np.arange(n + 1, dtype=np.int64) * self.num_perm, pa.int64()
        )
        col = pa.LargeListArray.from_arrays(list_offs, pa.array(flat)).cast(
            pa.list_(pa.int64())
        )
        return batch.append_column("minhash", col)


register_stage(MinHasher)


def minhash_lsh_candidates(
    ds: ray.data.Dataset,
    id_column: str = "doc_id",
    text_column: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    concurrency: int = 4,
    bucket_cap: int = 1024,
    distinct_pairs: bool = True,
) -> ray.data.Dataset:
    """Candidate near-dup pairs via MinHash+LSH.

    shingle->minhash per batch (actor pool) -> explode to
    (band, band_hash, id) -> groupby band buckets -> within-bucket pairs
    (capped, see ``_bucket_pairs``). Only signatures cross the
    shuffle. Output: (id_a, id_b) with id_a < id_b; distinct unless
    ``distinct_pairs=False`` (a pair can fire in several bands — pass
    False when feeding :func:`verify_pairs_jaccard`, whose reunite step
    deduplicates pairs structurally, saving this extra all-to-all).
    """
    if num_perm % bands:
        raise ValueError(
            f"num_perm ({num_perm}) must be divisible by bands ({bands}); "
            "trailing permutations would be computed but never hashed "
            "into any band"
        )
    rows_per_band = num_perm // bands

    ds = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={
            "num_perm": num_perm,
            "shingle_k": shingle_k,
            "text_column": text_column,
        },
        batch_format="pyarrow",
        concurrency=(1, concurrency),
    )

    def explode(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"band": pa.array([], pa.int32()),
                 "band_hash": pa.array([], pa.int64()),
                 id_column: pa.array([], pa.int64())}
            )
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        # fixed-length lists with no nulls: flatten + reshape is zero-copy
        # (a pandas round-trip boxes every signature into an object row)
        mh = batch.column("minhash").combine_chunks()
        sigs = (
            mh.flatten().to_numpy(zero_copy_only=False)
            .astype(np.uint64).reshape(len(mh), num_perm)
        )
        n = len(ids)
        band_ids = np.repeat(np.arange(bands, dtype=np.int32), n)
        doc_ids = np.tile(ids, bands)
        bh = np.empty(bands * n, dtype=np.uint64)
        for b in range(bands):
            seg = sigs[:, b * rows_per_band : (b + 1) * rows_per_band]
            h = np.zeros(n, dtype=np.uint64)
            for c in range(rows_per_band):
                h = h * np.uint64(1099511628211) + seg[:, c]
            bh[b * n : (b + 1) * n] = h
        return pa.table(
            {
                "band": pa.array(band_ids),
                "band_hash": pa.array(bh.astype(np.int64)),
                id_column: pa.array(doc_ids),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow")

    pairs = _bucket_pairs(
        exploded, ("band", "band_hash"), id_column, bucket_cap
    )
    if not distinct_pairs:
        return pairs
    from sapray.ops import distinct

    return distinct(pairs, ["id_a", "id_b"])


def _bucket_pairs(
    rows: ray.data.Dataset,
    bucket_columns: tuple[str, ...],
    id_column: str,
    bucket_cap: int,
    num_partitions: int | None = None,
    cap_mode: str = "star",
    prehashed: str | None = None,
    local_distinct: bool = False,
) -> ray.data.Dataset:
    """Candidate pairs from LSH bucket membership rows, at scale.

    Buckets are routed with ONE hash exchange on the bucket id and
    expanded inside a vectorized per-PARTITION kernel: singleton buckets
    (the overwhelming majority) are dropped wholesale by a run-length
    filter without ever touching Python, and only multi-member runs emit
    pairs — a per-bucket ``map_groups`` callback would pay the
    interpreter once per bucket instead.

    A degenerate bucket (boilerplate / empty docs sharing one hash)
    would emit O(n^2) pairs; above ``bucket_cap`` members it degrades
    per ``cap_mode``:

    * ``"star"`` — O(n) pairs against the min-id representative, keeping
      every member connected to one cluster head (what LSH dedup
      clustering consumes);
    * ``"drop"`` — the bucket emits nothing (what an inverted-index
      posting list wants: a shingle shared by more than ``bucket_cap``
      docs is a stopword carrying no near-dup signal).

    ``prehashed`` names a uint64-uniform int64 column to route on
    directly, skipping the generic composite-key hash. With
    ``local_distinct`` the kernel collapses duplicate pairs within its
    partition (cheap ``np.unique``) before they enter the next exchange.
    (Similarity-join length/positional pruning lives in
    :func:`prefix_filtered_candidates`' own pair kernel.)
    """
    from sapray.hashing import hash_key

    if num_partitions is None:
        num_partitions = exchange_partitions(rows)

    def route(batch: pa.Table) -> pa.Table:
        if prehashed is not None:
            kh = batch.column(prehashed).to_numpy(zero_copy_only=False).astype(np.uint64)
        else:
            kh = hash_key(batch, bucket_columns)
        part = (kh % np.uint64(num_partitions)).astype(np.int32)
        return batch.append_column("__bh", pa.array(kh)).append_column(
            "__part", pa.array(part)
        )

    routed = rows.map_batches(route, batch_format="pyarrow", zero_copy_batch=True)

    def kernel(g: pa.Table) -> pa.Table:
        bh = g.column("__bh").to_numpy(zero_copy_only=False)
        ids = g.column(id_column).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, bh))
        bh_s, ids_s = bh[order], ids[order]
        starts = np.concatenate([[0], np.nonzero(np.diff(bh_s))[0] + 1]) if len(bh_s) else np.empty(0, np.int64)
        ends = np.concatenate([starts[1:], [len(bh_s)]]) if len(bh_s) else starts
        sizes = ends - starts
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for s, e in zip(starts[sizes >= 2], ends[sizes >= 2]):
            run = ids_s[s:e]
            if len(run) > bucket_cap:
                if cap_mode == "drop":
                    continue
                out_a.append(np.full(len(run) - 1, run[0]))
                out_b.append(run[1:])
            else:
                a, b = np.triu_indices(len(run), k=1)
                out_a.append(run[a])
                out_b.append(run[b])
        if not out_a:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        if local_distinct and len(a):
            order = np.lexsort((b, a))
            a, b = a[order], b[order]
            keep = np.concatenate([[True], (np.diff(a) != 0) | (np.diff(b) != 0)])
            a, b = a[keep], b[keep]
        return pa.table({"id_a": pa.array(a), "id_b": pa.array(b)})

    return routed.groupby("__part").map_groups(kernel, batch_format="pyarrow")


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    """Exact k-shingle Jaccard similarity (verification kernel)."""
    sa, sb = set(_shingle_hashes(a or "", k)), set(_shingle_hashes(b or "", k))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


# ------------------------------------------- n-gram Jaccard (inverted index)


def ngram_inverted_candidates(
    ds: ray.data.Dataset,
    id_column: str = "doc_id",
    text_column: str = "text",
    shingle_k: int = 5,
    df_cap: int = 64,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Candidate near-dup pairs via a shingle INVERTED INDEX — the exact
    counterpart of :func:`minhash_lsh_candidates`.

    Each doc emits its distinct k-shingle hashes as ``(shingle, id)``
    posting rows; one exchange on the shingle hash co-locates each
    posting list, and every pair sharing a shingle becomes a candidate.
    Unlike MinHash (fixed ``num_perm`` rows/doc, probabilistic recall),
    the exchange here moves ~``len(text)`` rows/doc but recall is exact
    for any pair sharing at least one shingle with document frequency
    <= ``df_cap``.

    ``df_cap`` drops stopword shingles (posting lists longer than the
    cap emit nothing — ``cap_mode="drop"``): a shingle shared by
    hundreds of docs carries no near-dup signal but would emit O(df^2)
    pairs. A true near-dup pair at Jaccard >= t shares >= t/(1+t) of its
    shingles, so it survives unless EVERY shared shingle is a stopword —
    pick ``df_cap`` above the corpus' per-doc minimum shingle df
    (sf fixtures: <= 36 on the augmented corpus; default 64).
    Duplicate pair rows (a pair shares many shingles) are collapsed
    per-partition (``local_distinct``) before the verify exchange.
    """
    postings = _explode_postings(ds, id_column, text_column, shingle_k)
    return _bucket_pairs(
        postings,
        ("shingle",),
        id_column,
        bucket_cap=df_cap,
        num_partitions=num_partitions,
        cap_mode="drop",
        prehashed="shingle",
        local_distinct=True,
    )


def _explode_postings(
    ds: ray.data.Dataset,
    id_column: str,
    text_column: str,
    shingle_k: int,
) -> ray.data.Dataset:
    """(shingle, id) posting rows — one per DISTINCT k-shingle per doc
    (the shared first stage of the inverted-index and prefix-filter
    candidate generators)."""

    def explode(batch: pa.Table) -> pa.Table:
        # one concatenated-buffer window pass for the whole batch, then
        # per-doc DISTINCT shingles via a (doc, hash) lexsort +
        # adjacent-dup drop — the batched MinHash/SimHash recipe; the
        # prior per-row _shingle_hashes loop paid a to_pylist string
        # copy + Python dispatch per document on the widest stage of
        # both candidate generators
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        hashes, offs = _batch_shingle_hashes(batch.column(text_column), shingle_k)
        h_u, d_u = _unique_per_doc(hashes, offs)
        return pa.table(
            {
                "shingle": pa.array(h_u.astype(np.int64)),
                id_column: pa.array(ids[d_u]),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def prefix_filtered_candidates(
    ds: ray.data.Dataset,
    id_column: str = "doc_id",
    text_column: str = "text",
    shingle_k: int = 5,
    threshold: float = 0.8,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Candidate pairs via PREFIX FILTERING (Bayardo et al., "Scaling Up
    All Pairs Similarity Search", WWW'07) — exact recall at ANY corpus
    scale, unlike a fixed df cap (whose "some shared shingle is rare"
    precondition silently breaks as the corpus grows: at sf0.1 a df_cap
    of 64 missed 857 of 2074 true pairs).

    Guarantee: under one TOTAL order on shingles — (global df asc,
    shingle hash asc) — any pair with J(A,B) >= t shares a token among
    their first ``floor((1-t)*n) + 1`` tokens. Proof: |A\\B| <=
    |A| - t*|A∪B| <= (1-t)*|A|; the smallest COMMON token c in the
    order has only non-common A-tokens before it in A (all A-tokens
    below c are < every common token, hence not in B), i.e. fewer than
    (1-t)*|A| + 1 of them, so c sits inside A's prefix — and B's, by
    symmetry.

    Three keyed exchanges, all linear in posting rows: (1) route by
    shingle to annotate each posting with its GLOBAL df (run length —
    every posting of a shingle lands in one partition); (2) route by doc
    to keep each doc's prefix (rarest-first sort, vectorized segment
    sweep); (3) route the surviving ~(1-t) fraction by shingle for pair
    generation, where the LENGTH filter (J >= t forces t <= |A|/|B| <=
    1/t) prunes cross-size junk pairs before they reach a verifier.
    Posting lists of prefix tokens are short by construction (prefixes
    prefer rare shingles); a cluster of k IDENTICAL docs still emits its
    true O(k^2) pairs — run exact dedup first if boilerplate clusters
    are expected.
    """
    from sapray.window import partitioned_apply, _run_starts

    if num_partitions is None:
        num_partitions = exchange_partitions(ds)
    postings = _explode_postings(ds, id_column, text_column, shingle_k)

    def annotate_df(g: pa.Table) -> pa.Table:
        sh = g.column("shingle").to_numpy(zero_copy_only=False)
        ids = g.column(id_column).to_numpy(zero_copy_only=False)
        order = np.argsort(sh, kind="stable")
        sh_s, ids_s = sh[order], ids[order]
        starts = _run_starts(sh_s)
        ends = np.concatenate([starts[1:], [len(sh_s)]]) if len(starts) else starts
        df = np.zeros(len(sh_s), dtype=np.int64)
        if len(starts):
            run_id = np.searchsorted(starts, np.arange(len(sh_s)), side="right") - 1
            df = (ends - starts)[run_id]
        return pa.table(
            {"shingle": pa.array(sh_s), id_column: pa.array(ids_s),
             "df": pa.array(df)}
        )

    ann = partitioned_apply(postings, "shingle", annotate_df, num_partitions)

    def keep_prefix(g: pa.Table) -> pa.Table:
        ids = g.column(id_column).to_numpy(zero_copy_only=False)
        sh = g.column("shingle").to_numpy(zero_copy_only=False)
        df = g.column("df").to_numpy(zero_copy_only=False)
        order = np.lexsort((sh, df, ids))  # per doc: df asc, hash asc
        ids_s, sh_s = ids[order], sh[order]
        starts = _run_starts(ids_s)
        if not len(starts):
            return pa.table({"shingle": pa.array([], pa.int64()),
                             id_column: pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "rank": pa.array([], pa.int64())})
        ends = np.concatenate([starts[1:], [len(ids_s)]])
        run_id = np.searchsorted(starts, np.arange(len(ids_s)), side="right") - 1
        # |doc's shingle set| = its posting-run length here (ALL of a
        # doc's postings are co-located by this exchange, one per
        # distinct shingle) — recomputing it saves an 8-byte column
        # through the two widest exchanges
        n = (ends - starts)[run_id]
        rank = np.arange(len(ids_s)) - starts[run_id]
        # +1e-9: keep the bound exact when (1-t)*n is an integer that
        # float rounding pulls just below itself (t=0.8 -> 1-t is
        # 0.19999...; floor(0.2*600)=119 would shorten the safe prefix)
        p = np.floor((1.0 - threshold) * n + 1e-9).astype(np.int64) + 1
        keep = rank < p
        return pa.table(
            {"shingle": pa.array(sh_s[keep]), id_column: pa.array(ids_s[keep]),
             "n": pa.array(n[keep]), "rank": pa.array(rank[keep])}
        )

    pref = partitioned_apply(ann, id_column, keep_prefix, num_partitions)

    def route(batch: pa.Table) -> pa.Table:
        sh = batch.column("shingle").to_numpy(zero_copy_only=False)
        part = (sh.view(np.uint64) % np.uint64(num_partitions)).astype(np.int32)
        return batch.append_column("__part", pa.array(part))

    routed = pref.map_batches(route, batch_format="pyarrow", zero_copy_batch=True)
    t = threshold

    def pair_kernel(g: pa.Table) -> pa.Table:
        sh = g.column("shingle").to_numpy(zero_copy_only=False)
        ids = g.column(id_column).to_numpy(zero_copy_only=False)
        ns = g.column("n").to_numpy(zero_copy_only=False)
        rk = g.column("rank").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, sh))
        sh_s, ids_s, ns_s, rk_s = sh[order], ids[order], ns[order], rk[order]
        starts = _run_starts(sh_s)
        if not len(starts):
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        ends = np.concatenate([starts[1:], [len(sh_s)]])
        sizes = ends - starts
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for s, e in zip(starts[sizes >= 2], ends[sizes >= 2]):
            run_id_, run_n, run_rk = ids_s[s:e], ns_s[s:e], rk_s[s:e]
            a, b = np.triu_indices(e - s, k=1)
            na, nb = run_n[a], run_n[b]
            # LENGTH filter: J >= t forces t <= |A|/|B| <= 1/t (the
            # -1e-9 keeps integer boundaries exact under float rounding)
            ok = np.minimum(na, nb) >= t * np.maximum(na, nb) - 1e-9
            # POSITIONAL filter: the smallest common token c (rank i in
            # A, j in B) has no common token before it, so the overlap
            # fits in the suffixes: o <= 1 + min(nA-i-1, nB-j-1); a true
            # pair needs o >= ceil(t/(1+t)(nA+nB)). Applying it to every
            # collision is safe — the pair always survives via c's run.
            ia, jb = run_rk[a], run_rk[b]
            ub = 1 + np.minimum(na - ia - 1, nb - jb - 1)
            ok &= ub >= np.ceil(t / (1.0 + t) * (na + nb) - 1e-9)
            a, b = a[ok], b[ok]
            out_a.append(run_id_[a])
            out_b.append(run_id_[b])
        if not out_a:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        pair = np.unique(np.stack([lo, hi], axis=1), axis=0)
        return pa.table({"id_a": pa.array(pair[:, 0]),
                         "id_b": pa.array(pair[:, 1])})

    return routed.groupby("__part").map_groups(pair_kernel, batch_format="pyarrow")


def distinct_pairs(
    pairs: ray.data.Dataset, num_partitions: int | None = None
) -> ray.data.Dataset:
    """Global distinct over (id_a, id_b) candidate pairs — ONE skinny
    keyed exchange (16 B/row on id_a; every copy of a pair shares id_a so
    all copies meet) + a per-partition lexsort unique.

    Prefix filtering emits a pair once per shared prefix token (~2 dup
    factor measured at sf0.1); deduping BEFORE the verify halves the
    verify's text-value exchange, which ships document bodies and
    dominates the pipeline's bytes."""
    from sapray.window import partitioned_apply

    def kernel(g: pa.Table) -> pa.Table:
        a = g.column("id_a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = g.column("id_b").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        first = np.ones(len(a), dtype=bool)
        first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        return pa.table({"id_a": pa.array(a[first]), "id_b": pa.array(b[first])})

    return partitioned_apply(pairs, "id_a", kernel, num_partitions)


def ngram_jaccard_dedup(
    ds: ray.data.Dataset,
    id_column: str = "doc_id",
    text_column: str = "text",
    threshold: float = 0.8,
    shingle_k: int = 5,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Exact n-gram-Jaccard near-dup pairs: prefix-filtered candidates
    (exact recall at any scale) -> distributed exact-Jaccard verify
    (texts reach verifiers via keyed exchanges, never a driver
    broadcast)."""
    if num_partitions is None:
        num_partitions = exchange_partitions(ds)
    candidates = prefix_filtered_candidates(
        ds, id_column, text_column, shingle_k, threshold,
        num_partitions=max(num_partitions, 2),
    )
    # prefix filtering emits a pair once per shared prefix token (~2x at
    # sf0.1); one skinny distinct exchange halves the verify's text
    # exchange (measured 30.9 s -> 17.8 s verify at sf0.1)
    candidates = distinct_pairs(candidates, max(num_partitions, 2))
    return verify_pairs_jaccard(
        candidates, ds, id_column, text_column, threshold, shingle_k, num_partitions
    )


# ------------------------------------------------- distributed pair verify

_PAIR_MIX = np.int64(2654435761)  # Knuth multiplicative-hash constant


def _values_for_pairs(
    pairs: ray.data.Dataset,
    values: ray.data.Dataset,
    id_column: str,
    value_column: str,
    num_partitions: int | None,
) -> ray.data.Dataset:
    """Attach ``values[id]`` to BOTH members of every candidate pair with
    two keyed exchanges and NO driver-side materialization (the round-1
    design broadcast a driver-built ``{id: value}`` dict of the whole
    corpus — a hard scale-killer).

    Exchange 1 routes pair-member rows and value rows by ``id %
    num_partitions``; inside each group a sorted-array lookup joins the
    value onto each pair side. Only values referenced by a candidate
    survive. Exchange 2 (by mixed pair hash) reunites the two sides.
    Size ``num_partitions`` so corpus/num_partitions fits a worker's
    heap — exchange-1 groups hold that partition's full value stream.
    Output: one row per DISTINCT pair with ``val_a``/``val_b`` columns —
    duplicate input pairs collapse structurally (the reunite sweep emits
    one row per 0->1 side transition of each sorted (id_a, id_b) run),
    so callers need not pre-distinct their candidate stream.
    """
    if num_partitions is None:
        num_partitions = exchange_partitions(values)
    vtype = dict(zip(values.schema().names, values.schema().types))[value_column]

    def pair_sides(batch: pa.Table) -> pa.Table:
        ia = batch.column("id_a").to_numpy(zero_copy_only=False)
        ib = batch.column("id_b").to_numpy(zero_copy_only=False)
        n = len(ia)
        join_id = np.concatenate([ia, ib])
        return pa.table(
            {
                "bucket": pa.array(join_id % num_partitions),
                "join_id": pa.array(join_id),
                "id_a": pa.array(np.concatenate([ia, ia])),
                "id_b": pa.array(np.concatenate([ib, ib])),
                "side": pa.array(
                    np.concatenate([np.zeros(n, np.int8), np.ones(n, np.int8)])
                ),
                "val": pa.nulls(2 * n, vtype),
            }
        )

    def value_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        n = len(ids)
        val = batch.column(value_column)
        return pa.table(
            {
                "bucket": pa.array(ids % num_partitions),
                "join_id": pa.array(ids),
                "id_a": pa.nulls(n, pa.int64()),
                "id_b": pa.nulls(n, pa.int64()),
                "side": pa.array(np.full(n, 2, np.int8)),
                "val": val.combine_chunks() if isinstance(val, pa.ChunkedArray) else val,
            }
        )

    tagged = pairs.map_batches(pair_sides, batch_format="pyarrow").union(
        values.map_batches(value_rows, batch_format="pyarrow")
    )

    def attach(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy(zero_copy_only=False)
        vrows = g.filter(pa.array(side == 2))
        prows = g.filter(pa.array(side != 2))
        if prows.num_rows == 0:
            return _SIDES_EMPTY(vtype)
        vids = vrows.column("join_id").to_numpy(zero_copy_only=False)
        order = np.argsort(vids)
        vids_sorted = vids[order]
        vvals = vrows.column("val").combine_chunks().take(pa.array(order))
        jid = prows.column("join_id").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(vids_sorted, jid)
        pos_c = np.clip(pos, 0, max(len(vids_sorted) - 1, 0))
        found = (
            (vids_sorted[pos_c] == jid)
            if len(vids_sorted)
            else np.zeros(len(jid), bool)
        )
        prows = prows.filter(pa.array(found))  # drop sides with no value
        val = vvals.take(pa.array(pos_c[found]))
        ia = prows.column("id_a").to_numpy(zero_copy_only=False)
        ib = prows.column("id_b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "pbucket": pa.array((ia * _PAIR_MIX + ib) % num_partitions),
                "id_a": prows.column("id_a"),
                "id_b": prows.column("id_b"),
                "side": prows.column("side"),
                "val": val,
            }
        )

    sides = tagged.groupby("bucket").map_groups(attach, batch_format="pyarrow")

    def reunite(g: pa.Table) -> pa.Table:
        idx = pa.compute.sort_indices(
            g, sort_keys=[("id_a", "ascending"), ("id_b", "ascending"),
                          ("side", "ascending")]
        )
        g = g.take(idx)
        ia = g.column("id_a").to_numpy(zero_copy_only=False)
        ib = g.column("id_b").to_numpy(zero_copy_only=False)
        side = g.column("side").to_numpy(zero_copy_only=False)
        # complete pairs are adjacent (side 0 then side 1)
        n = len(ia)
        first = (
            (np.arange(n - 1) >= 0)
            & (ia[:-1] == ia[1:])
            & (ib[:-1] == ib[1:])
            & (side[:-1] == 0)
            & (side[1:] == 1)
        )
        a_idx = np.nonzero(first)[0]
        if len(a_idx) == 0:
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                 "val_a": pa.nulls(0, vtype), "val_b": pa.nulls(0, vtype)}
            )
        vals = g.column("val").combine_chunks()
        return pa.table(
            {
                "id_a": pa.array(ia[a_idx]),
                "id_b": pa.array(ib[a_idx]),
                "val_a": vals.take(pa.array(a_idx)),
                "val_b": vals.take(pa.array(a_idx + 1)),
            }
        )

    return sides.groupby("pbucket").map_groups(reunite, batch_format="pyarrow")


def _SIDES_EMPTY(vtype: pa.DataType) -> pa.Table:
    return pa.table(
        {
            "pbucket": pa.array([], pa.int64()),
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "side": pa.array([], pa.int8()),
            "val": pa.nulls(0, vtype),
        }
    )


def verify_pairs_jaccard(
    pairs: ray.data.Dataset,
    docs: ray.data.Dataset,
    id_column: str = "doc_id",
    text_column: str = "text",
    threshold: float = 0.8,
    shingle_k: int = 5,
    num_partitions: int | None = None,
    bitset_vocab_max: int = _BITSET_VOCAB_MAX,
) -> ray.data.Dataset:
    """Exact-Jaccard verify of candidate pairs, fully distributed.

    ``docs`` is a Dataset: text reaches the verifiers through keyed
    exchanges (:func:`_values_for_pairs`), never through a driver-built
    lookup. Output: (id_a, id_b, jaccard) rows with jaccard >= threshold.

    Scoring picks per batch between two exact intersection kernels: a
    dense-bitset AND+popcount when the batch's distinct-shingle
    vocabulary fits ``bitset_vocab_max`` bits per doc (boilerplate-heavy
    corpora concentrate many pairs on few shingles — pairs x vocab/8
    bytes of work), and a flat label-lexsort otherwise (pairs x shingles
    log-sort, no vocabulary-size dependence).
    """
    joined = _values_for_pairs(pairs, docs, id_column, text_column, num_partitions)

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                 "jaccard": pa.array([], pa.float64())}
            )
        ia = batch.column("id_a").to_numpy(zero_copy_only=False)
        ib = batch.column("id_b").to_numpy(zero_copy_only=False)
        # a doc in k candidate pairs would shingle k times — shingle each
        # distinct id ONCE per batch, and shingle ALL distinct docs in
        # one concatenated-buffer pass (_batch_shingle_hashes +
        # _unique_per_doc) instead of a to_pylist + per-doc Python loop
        # (review finding; the same recipe as the signature kernels)
        all_ids = np.concatenate([ia, ib])
        uids, first = np.unique(all_ids, return_index=True)
        va_col = batch.column("val_a").combine_chunks()
        vb_col = batch.column("val_b").combine_chunks()
        texts = pa.concat_arrays(
            [va_col.cast(pa.large_string()), vb_col.cast(pa.large_string())]
        ).take(pa.array(first))
        hashes, offs = _batch_shingle_hashes(texts, shingle_k)
        h_u, d_u = _unique_per_doc(hashes, offs)
        cnts = np.bincount(d_u, minlength=len(uids))
        bounds = np.zeros(len(uids) + 1, dtype=np.int64)
        np.cumsum(cnts, out=bounds[1:])
        arrs: dict = {
            int(uid): h_u[bounds[j] : bounds[j + 1]]
            for j, uid in enumerate(uids)
        }
        sh_a = [arrs[i] for i in ia.tolist()]
        sh_b = [arrs[i] for i in ib.tolist()]
        na = np.array([s.size for s in sh_a], dtype=np.int64)
        nb = np.array([s.size for s in sh_b], dtype=np.int64)
        n = len(ia)
        vocab = (
            np.unique(np.concatenate(list(arrs.values())))
            if arrs
            else np.array([], np.uint64)
        )
        if vocab.size and vocab.size <= bitset_vocab_max:
            # DENSE-vocab batch (synthetic/boilerplate corpora put many
            # candidate pairs over few distinct shingles; the lexsort
            # below would sort pairs x shingles elements — measured
            # 517 s at sf0.1). Encode each DISTINCT doc once as a
            # V-bit set, then every pair's intersection is one
            # AND + popcount over V/8 bytes: work scales with
            # pairs x vocab/8, not pairs x shingles.
            w = (vocab.size + 7) >> 3
            row_of = {i: r for r, i in enumerate(arrs)}
            m = np.zeros((len(arrs), w), np.uint8)
            rows = np.repeat(
                np.arange(len(arrs)), [v.size for v in arrs.values()]
            )
            codes = np.searchsorted(vocab, np.concatenate(list(arrs.values())))
            np.bitwise_or.at(
                m, (rows, codes >> 3), np.uint8(1) << (codes & 7).astype(np.uint8)
            )
            ra = np.fromiter((row_of[i] for i in ia.tolist()), np.int64, n)
            rb = np.fromiter((row_of[i] for i in ib.tolist()), np.int64, n)
            c = np.empty(n, np.float64)
            step = max(1, (1 << 24) // max(w, 1))  # ~16 MB AND scratch
            for s in range(0, n, step):
                e = min(n, s + step)
                c[s:e] = _POPCNT[m[ra[s:e]] & m[rb[s:e]]].sum(
                    axis=1, dtype=np.int64
                )
        else:
            # one flat label-lexsort counts every pair's intersection at
            # once: each (pair, shingle) occurs <= once per side (shingle
            # arrays are unique), so an adjacent duplicate in the sorted
            # (pair, shingle) stream is exactly one shared shingle
            labels = np.repeat(
                np.arange(2 * n, dtype=np.int64) % n, np.concatenate([na, nb])
            )
            flat = (
                np.concatenate(sh_a + sh_b)
                if (sh_a or sh_b)
                else np.array([], np.uint64)
            )
            order = np.lexsort((flat, labels))
            labels, flat = labels[order], flat[order]
            dup = np.zeros(len(flat), dtype=bool)
            if len(flat) > 1:
                dup[1:] = (labels[1:] == labels[:-1]) & (flat[1:] == flat[:-1])
            c = np.bincount(labels[dup], minlength=n).astype(np.float64)
        denom = na + nb - c
        sims = np.where(denom > 0, c / np.maximum(denom, 1), 1.0)
        out = pa.table(
            {"id_a": batch.column("id_a"), "id_b": batch.column("id_b"),
             "jaccard": pa.array(sims, pa.float64())}
        )
        return out.filter(pa.compute.greater_equal(out.column("jaccard"), threshold))

    return joined.map_batches(score, batch_format="pyarrow")


# ------------------------------------------------------------------- simhash


class SimHasher(Stage):
    """64-bit SimHash over shingle hashes, vectorized per document.
    Stage-registered like MinHasher (§2.6)."""

    name = "simhash_signature"
    description = "append a 64-bit SimHash fingerprint per document"

    def required_input(self):
        return {self.text_column: is_stringy}

    def added_columns(self, schema_in: pa.Schema):
        return {"simhash": pa.int64()}

    def __init__(self, text_column: str = "text", shingle_k: int = 5):
        self.text_column = text_column
        self.k = shingle_k
        self.bits = np.arange(64, dtype=np.uint64)

    def simhash(self, text: str) -> int:
        """Reference single-doc kernel (semantic spec for ``__call__``)."""
        sh = _shingle_hashes(text, self.k)
        if len(sh) == 0:
            return 0
        bits = (sh[:, None] >> self.bits[None, :]) & np.uint64(1)
        # votes must be SIGNED: uint64 arithmetic would wrap negative
        # tallies to huge positives and set every minority bit
        votes = bits.sum(axis=0).astype(np.int64) * 2 - len(sh)
        return int(((votes > 0).astype(np.uint64) << self.bits).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Batched simhash: one concatenated-buffer shingle pass, per-doc
        UNIQUE shingles via a (doc, hash) lexsort + adjacent-dup drop
        (simhash votes count each DISTINCT shingle once — unlike minhash,
        the multiset is not equivalent), then 64 bit-plane
        ``np.add.reduceat`` segment sums. O(shingles) memory — no
        (shingles x 64) matrix."""
        n = batch.num_rows
        if n == 0:
            return batch.append_column("simhash", pa.array([], pa.int64()))
        hashes, offs = _batch_shingle_hashes(batch.column(self.text_column), self.k)
        h_u, d_u = _unique_per_doc(hashes, offs)
        cnt = np.bincount(d_u, minlength=n)  # >= 1 per doc (>=1 window)
        starts = np.zeros(n, dtype=np.int64)
        np.cumsum(cnt[:-1], out=starts[1:])
        out = np.zeros(n, dtype=np.uint64)
        for b in range(64):
            ones = np.add.reduceat(
                ((h_u >> np.uint64(b)) & np.uint64(1)).astype(np.int64), starts
            )
            out |= (ones * 2 > cnt).astype(np.uint64) << np.uint64(b)
        return batch.append_column("simhash", pa.array(out.astype(np.int64)))


register_stage(SimHasher)


# -------------------------------------------------- embedding cosine near-dup


def embedding_neardup_pairs(
    ds: ray.data.Dataset,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    threshold: float = 0.95,
    num_tables: int = 4,
    planes_per_table: int = 16,
    seed: int = 42,
    bucket_cap: int = 512,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Near-duplicate pairs by cosine similarity — banded multi-table
    hyperplane LSH, then exact distributed verify.

    ``num_tables`` independent sign-hash tables of ``planes_per_table``
    hyperplanes each (2^16 buckets/table instead of round-1's 256 global
    buckets): a pair is a candidate if it collides in ANY table, so
    recall grows with tables while in-bucket pair explosion stays capped
    (``_bucket_pairs_fn`` star-degrades buckets above ``bucket_cap``).
    Only (table, bucket, id) rows cross the candidate shuffle — vectors
    reach the exact-cosine verify through keyed exchanges
    (:func:`_values_for_pairs`), never a driver broadcast. Exact copies
    collide in every table, so injected-duplicate recall is 1.0.
    """

    def add_sig(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"table": pa.array([], pa.int32()),
                 "bucket": pa.array([], pa.int64()),
                 id_column: pa.array([], pa.int64())}
            )
        from sapray.similarity import _to_matrix

        v = _to_matrix(batch.column(vec_column))
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        # seeded rng -> identical plane tables in every batch/task
        rng = np.random.default_rng(seed)
        t_out, b_out, i_out = [], [], []
        for t in range(num_tables):
            planes = rng.standard_normal((v.shape[1], planes_per_table))
            bits = (v @ planes) > 0
            packed = np.zeros(len(v), dtype=np.int64)
            for i in range(planes_per_table):
                packed |= bits[:, i].astype(np.int64) << i
            t_out.append(np.full(len(v), t, dtype=np.int32))
            b_out.append(packed)
            i_out.append(ids)
        return pa.table(
            {
                "table": pa.array(np.concatenate(t_out)),
                "bucket": pa.array(np.concatenate(b_out)),
                id_column: pa.array(np.concatenate(i_out)),
            }
        )

    sigs = ds.map_batches(add_sig, batch_format="pyarrow")
    # no distinct stage: a pair colliding in several tables reaches the
    # verify duplicated, and verify's reunite step structurally emits one
    # row per distinct pair (single 0->1 side transition per sorted run)
    candidates = _bucket_pairs(
        sigs, ("table", "bucket"), id_column, bucket_cap, num_partitions
    )
    return verify_pairs_cosine(
        candidates, ds, id_column, vec_column, threshold, num_partitions
    )


def verify_pairs_cosine(
    pairs: ray.data.Dataset,
    vectors: ray.data.Dataset,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    threshold: float = 0.95,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Exact-cosine verify of candidate pairs, fully distributed
    (vectors joined to pairs via keyed exchanges, scored with one
    vectorized matmul-row per batch)."""
    joined = _values_for_pairs(pairs, vectors, id_column, vec_column, num_partitions)

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                 "cosine": pa.array([], pa.float64())}
            )
        from sapray.similarity import _to_matrix

        va = _to_matrix(batch.column("val_a"))
        vb = _to_matrix(batch.column("val_b"))
        na = np.linalg.norm(va, axis=1)
        nb = np.linalg.norm(vb, axis=1)
        na[na == 0] = 1.0
        nb[nb == 0] = 1.0
        cos = (va * vb).sum(axis=1) / (na * nb)
        out = pa.table(
            {"id_a": batch.column("id_a"), "id_b": batch.column("id_b"),
             "cosine": pa.array(cos, pa.float64())}
        )
        return out.filter(pa.compute.greater_equal(out.column("cosine"), threshold))

    return joined.map_batches(score, batch_format="pyarrow")


# ------------------------------------------------ paragraph-level dedup


def paragraph_dedup_stats(
    ds: ray.data.Dataset,
    id_column: str = "doc_id",
    text_column: str = "text",
    words_per_para: int = 10,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """CCNet/RefinedWeb-style PARAGRAPH-level dedup signals: per document,
    how many of its paragraphs appear more than once in the corpus.

    Paragraphs are fixed ``words_per_para``-word segments (the corpus has
    no sentence separators; fixed segments keep the oracle expressible as
    SQL list slicing). Explode is per-batch vectorized — the loop is over
    SEGMENT POSITIONS (a handful), each one Arrow ``list_slice`` +
    ``binary_join`` over every still-long-enough document, the ChunkDocs
    pattern. Duplicate detection is ONE keyed exchange on the paragraph
    STRING (value-exact, no hash-collision caveat): every copy of a
    paragraph lands in one partition, so within-partition counts are
    global counts; per-document partials then fold through the combiner
    groupby. Emits (id, n_paras, n_dup_paras).
    """
    import pyarrow.compute as pc

    from sapray import ops
    from sapray.window import partitioned_apply

    def explode(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(batch.column(text_column), pattern=" ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        n = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        n = np.nan_to_num(n, nan=0).astype(np.int64)
        ids = batch.column(id_column)
        out_ids, out_paras = [], []
        max_segs = int(np.ceil(n.max() / words_per_para)) if len(n) else 0
        for j in range(max_segs):
            start = j * words_per_para
            has = n > start
            if not has.any():
                break
            sub = pc.list_slice(
                words.filter(pa.array(has)), start, start + words_per_para
            )
            out_paras.append(pc.binary_join(sub, " "))
            out_ids.append(ids.filter(pa.array(has)))
        if not out_ids:
            return pa.table({
                id_column: pa.array([], ids.type),
                "para": pa.array([], pa.string()),
            })
        return pa.table({
            id_column: pa.concat_arrays(
                [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
                 for a in out_ids]
            ),
            "para": pa.concat_arrays(
                [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
                 for p in out_paras]
            ),
        })

    paras = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    def kernel(g: pa.Table) -> pa.Table:
        # all copies of each para value are in this partition: counts here
        # ARE the global counts
        p = g.column("para").to_numpy(zero_copy_only=False)
        ids = g.column(id_column).to_numpy(zero_copy_only=False)
        _, inv, cnt = np.unique(p, return_inverse=True, return_counts=True)
        dup = (cnt > 1)[inv]
        uid, uinv = np.unique(ids, return_inverse=True)
        n_paras = np.bincount(uinv)
        n_dup = np.bincount(uinv, weights=dup).astype(np.int64)
        return pa.table({
            id_column: pa.array(uid.astype(np.int64)),
            "n_paras": pa.array(n_paras.astype(np.int64)),
            "n_dup_paras": pa.array(n_dup),
        })

    partials = partitioned_apply(paras, "para", kernel, num_partitions)
    return ops.grouped_aggregate(
        partials, [id_column],
        {"n_paras": ("n_paras", "sum"), "n_dup_paras": ("n_dup_paras", "sum")},
    )


# ------------------------------------------- duplicated n-gram spans

# positional mixers for gram keys (odd constants: splitmix64 / xxhash
# primes); uint64 wraparound is the point — numpy array arithmetic
# wraps silently
_GRAM_P1 = np.uint64(0x9E3779B97F4A7C15)
_GRAM_P2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _gram_window_keys(
    col: "pa.Array | pa.ChunkedArray",
    ids: np.ndarray,
    k: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """128-bit gram keys for every word-k-gram window of a text column.

    Tokens are single-space splits (``string_split(text, ' ')`` parity;
    NULL tokenizes like ``''``). Neither the gram string NOR the token
    occurrences are materialized: the flat token pool dictionary-encodes
    (C++, zero Python objects per occurrence) and ``pd.util.hash_array``
    runs per seed over the DISTINCT vocabulary only (``categorize=False``
    — the partitioning invariant; value-determinism makes hash-the-
    dictionary-then-gather identical to hashing every occurrence), then
    the k token hashes of every in-document window combine positionally
    under two independent 64-bit polynomial mixes. Equal token windows
    always collide onto equal keys; unequal ones split apart up to the
    128-bit birthday bound (~G^2/2^129 over G distinct grams — the same
    practical-zero contract as exact dedup's sha256 keys).

    Returns ``(gh1, gh2, doc_id, pos)`` flat arrays, one entry per gram
    window; ``pos`` is the 0-based token index where the window starts.
    """
    import pandas as pd
    import pyarrow.compute as pc

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    toks = pc.split_pattern(col, pattern=" ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    nt = np.diff(off)
    ng = np.maximum(nt - (k - 1), 0)
    total = int(ng.sum())
    e = np.empty(0, np.uint64)
    if total == 0:
        return e, e, np.empty(0, np.int64), np.empty(0, np.int64)
    # offsets are absolute into .values, so indexing by them is safe
    # whatever the array offset
    enc = toks.values.dictionary_encode()
    vocab = enc.dictionary.to_numpy(zero_copy_only=False)
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    dh1 = pd.util.hash_array(vocab, hash_key="sapraydupgrams01", categorize=False)
    dh2 = pd.util.hash_array(vocab, hash_key="sapraydupgrams02", categorize=False)
    th1 = dh1[idx]
    th2 = dh2[idx]
    ends = np.cumsum(ng)
    # in-doc gram start (0-based) and its flat index into the token pool
    rel = np.arange(total, dtype=np.int64) - np.repeat(ends - ng, ng)
    base = np.repeat(off[:-1], ng) + rel
    pows1 = np.power(_GRAM_P1, np.arange(k, dtype=np.uint64))
    pows2 = np.power(_GRAM_P2, np.arange(k, dtype=np.uint64))
    acc1 = np.zeros(total, np.uint64)
    acc2 = np.zeros(total, np.uint64)
    for j in range(k):  # k vectorized gathers, not a row loop
        acc1 += th1[base + j] * pows1[j]
        acc2 += th2[base + j] * pows2[j]
    return acc1, acc2, np.repeat(ids, ng), rel


def _gram_ids64(batch: pa.Table, id_column: str) -> np.ndarray:
    """Doc ids as int64 for the gram-key operators."""
    return (
        batch.column(id_column)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )


def _dup_gram_keep(
    a1: np.ndarray, a2: np.ndarray, d: np.ndarray, *tied: np.ndarray
) -> tuple[np.ndarray, ...] | None:
    """Sort gram rows by (gh1, gh2, doc) and keep those whose 128-bit
    gram key occurs in >= 2 DISTINCT documents (the shared duplicated-
    gram definition of the span stats and span removal kernels; within-
    doc repeats alone never count). Returns the kept ``(d, *tied)``
    arrays in sorted order, or ``None`` when nothing survives."""
    order = np.lexsort((d, a2, a1))
    a1, a2, d = a1[order], a2[order], d[order]
    n = len(a1)
    gnew = np.empty(n, bool)
    gnew[0] = True
    gnew[1:] = (a1[1:] != a1[:-1]) | (a2[1:] != a2[:-1])
    gid = np.cumsum(gnew) - 1
    pnew = gnew.copy()
    pnew[1:] |= d[1:] != d[:-1]  # new (gram, doc) pair
    ndocs = np.bincount(gid[pnew])
    keep = (ndocs >= 2)[gid]
    if not keep.any():
        return None
    return (d[keep],) + tuple(t[order][keep] for t in tied)


def dup_ngram_span_stats(
    ds: ray.data.Dataset,
    id_column: str = "doc_id",
    text_column: str = "text",
    k: int = 8,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-document duplicated n-gram span signals (the substring-dedup
    family of Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better"): position ``i`` of a document's word-token
    sequence carries the k-gram ``tokens[i:i+k]``; a gram is DUPLICATED
    when it occurs in >= 2 DISTINCT documents. Emits one row per
    document: ``(id, n_grams, n_dup_grams)`` — total gram positions and
    how many of them carry a corpus-duplicated gram (the mask a
    span-removal pass would cut).

    Tokens are single-space splits (exact ``string_split(text, ' ')``
    parity with the SQL oracle; NULL text tokenizes like ``''``). The
    gram string is never materialized: each batch hashes its FLAT token
    array once (``pd.util.hash_array``, ``categorize=False`` — the
    partitioning invariant), then combines the k token hashes of every
    in-document window positionally under two independent 64-bit
    polynomial mixes, so the all-to-all moves only
    ``(gh1, gh2, id, cnt)`` rows — 28 bytes per gram position, already
    combined per (gram, doc) within the batch — never token text (~k x
    the corpus bytes for gram strings). Equal token windows always
    collide onto equal keys; unequal ones split apart up to the 128-bit
    birthday bound (~G^2/2^129 over G distinct grams — the same
    practical-zero contract as exact dedup's sha256 keys).

    Distinct-doc counting happens inside ONE keyed exchange (every copy
    of a gram key lands in one partition, so per-partition counts are
    global); per-document partials and the per-document gram totals
    (a second cheap scan that only counts separators — no split, no
    exchange) then fold through the combiner groupby. No join anywhere,
    so the map_groups empty-block join hazard never arises.
    """
    import pyarrow.compute as pc

    from sapray import ops
    from sapray.window import partitioned_apply

    def explode(batch: pa.Table) -> pa.Table:
        acc1, acc2, gdoc, _pos = _gram_window_keys(
            batch.column(text_column), _gram_ids64(batch, id_column), k
        )
        total = len(acc1)
        if total == 0:
            return pa.table({
                "gh1": pa.array([], pa.uint64()),
                "gh2": pa.array([], pa.uint64()),
                id_column: pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
            })
        # pre-combine per (gram, doc): the exchange moves counts, not
        # positions
        order = np.lexsort((gdoc, acc2, acc1))
        a1, a2, d = acc1[order], acc2[order], gdoc[order]
        new = np.empty(total, bool)
        new[0] = True
        new[1:] = (a1[1:] != a1[:-1]) | (a2[1:] != a2[:-1]) | (d[1:] != d[:-1])
        idx = np.flatnonzero(new)
        cnt = np.diff(np.append(idx, total)).astype(np.int64)
        return pa.table({
            "gh1": pa.array(a1[idx]),
            "gh2": pa.array(a2[idx]),
            id_column: pa.array(d[idx]),
            "cnt": pa.array(cnt),
        })

    _EMPTY = pa.table({
        id_column: pa.array([], pa.int64()),
        "n_grams": pa.array([], pa.int64()),
        "n_dup_grams": pa.array([], pa.int64()),
    })

    def kernel(g: pa.Table) -> pa.Table:
        # all copies of a gram key land in this partition: distinct-doc
        # counts here ARE the global counts
        if g.num_rows == 0:
            return _EMPTY
        kept = _dup_gram_keep(
            g.column("gh1").to_numpy(zero_copy_only=False),
            g.column("gh2").to_numpy(zero_copy_only=False),
            g.column(id_column).to_numpy(zero_copy_only=False),
            g.column("cnt").to_numpy(zero_copy_only=False),
        )
        if kept is None:
            return _EMPTY
        dk, ck = kept
        uid, uinv = np.unique(dk, return_inverse=True)
        nd = np.bincount(uinv, weights=ck).astype(np.int64)
        return pa.table({
            id_column: pa.array(uid),
            "n_grams": pa.array(np.zeros(len(uid), np.int64)),
            "n_dup_grams": pa.array(nd),
        })

    def totals(batch: pa.Table) -> pa.Table:
        # gram totals need only the token COUNT: separators + 1, no split
        col = pc.fill_null(batch.column(text_column), "")
        nt = (
            pc.count_substring(col, " ")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
            + 1
        )
        ng = np.maximum(nt - (k - 1), 0)
        ids = _gram_ids64(batch, id_column)
        return pa.table({
            id_column: pa.array(ids),
            "n_grams": pa.array(ng),
            "n_dup_grams": pa.array(np.zeros(len(ids), np.int64)),
        })

    grams = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    partials = partitioned_apply(grams, "gh1", kernel, num_partitions)
    totals_ds = ds.map_batches(totals, batch_format="pyarrow", zero_copy_batch=True)
    return ops.grouped_aggregate(
        partials.union(totals_ds),
        [id_column],
        {"n_grams": ("n_grams", "sum"), "n_dup_grams": ("n_dup_grams", "sum")},
    )


def dup_ngram_span_remove(
    ds: ray.data.Dataset,
    id_column: str = "doc_id",
    text_column: str = "text",
    k: int = 8,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Substring dedup with REMOVAL (Lee et al. 2022): cut every token
    covered by a corpus-duplicated k-gram and emit the cleaned text.
    A gram is duplicated when it occurs in >= 2 DISTINCT documents; a
    duplicated gram starting at token position ``p`` covers tokens
    ``[p, p+k)``; the kept tokens re-join with single spaces. Emits one
    row per input document: ``(id, text_clean, n_removed)``.

    Two keyed exchanges, neither a join:

    1. **gram-key exchange** — :func:`_gram_window_keys` turns each
       batch into flat ``(gh1, gh2, id, pos)`` rows (32 bytes per gram
       position, never gram text); every copy of a gram key lands in one
       partition, so the per-partition distinct-doc count is global and
       the kernel emits only the DUPLICATED positions ``(id, pos)`` —
       16 bytes each, and only for the duplicated fraction.
    2. **doc-id exchange** — the original ``(id, text)`` rows (tagged
       ``pos = -1``) union with the dup-position rows and co-locate per
       document. Text crossing this exchange once is inherent to
       rewriting it (same class as the CDC payload shuffle); positions
       fold into ONE flat difference array over the partition's token
       pool (``np.add.at`` at span starts/ends, cumsum > 0 = covered),
       and the kept tokens rebuild per-doc strings via a single Arrow
       ``binary_join`` — no per-document Python.

    Gram equality is the stats operator's 128-bit hash-key contract
    (birthday-bound collisions ~G^2/2^129, practical zero); tokens are
    single-space splits with NULL text tokenizing like ``''``.
    """
    import pyarrow.compute as pc

    from sapray.window import partitioned_apply

    def explode_pos(batch: pa.Table) -> pa.Table:
        gh1, gh2, gdoc, pos = _gram_window_keys(
            batch.column(text_column), _gram_ids64(batch, id_column), k
        )
        return pa.table({
            "gh1": pa.array(gh1),
            "gh2": pa.array(gh2),
            id_column: pa.array(gdoc),
            "pos": pa.array(pos),
        })

    _EMPTY_POS = pa.table({
        id_column: pa.array([], pa.int64()),
        "pos": pa.array([], pa.int64()),
    })

    def dup_kernel(g: pa.Table) -> pa.Table:
        # all copies of a gram key are here: distinct-doc counts are global
        if g.num_rows == 0:
            return _EMPTY_POS
        kept = _dup_gram_keep(
            g.column("gh1").to_numpy(zero_copy_only=False),
            g.column("gh2").to_numpy(zero_copy_only=False),
            g.column(id_column).to_numpy(zero_copy_only=False),
            g.column("pos").to_numpy(zero_copy_only=False),
        )
        if kept is None:
            return _EMPTY_POS
        dk, pk = kept
        return pa.table({
            id_column: pa.array(dk),
            "pos": pa.array(pk),
        })

    def tag_text(batch: pa.Table) -> pa.Table:
        ids = _gram_ids64(batch, id_column)
        txt = pc.cast(
            pc.fill_null(batch.column(text_column), ""), pa.large_string()
        )
        return pa.table({
            id_column: pa.array(ids),
            "pos": pa.array(np.full(len(ids), -1, np.int64)),
            "text": txt,
        })

    def tag_pos(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_column: batch.column(id_column),
            "pos": batch.column("pos"),
            "text": pa.nulls(batch.num_rows, pa.large_string()),
        })

    _EMPTY_OUT = pa.table({
        id_column: pa.array([], pa.int64()),
        "text_clean": pa.array([], pa.large_string()),
        "n_removed": pa.array([], pa.int64()),
    })

    def rewrite_kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _EMPTY_OUT
        pos = g.column("pos").to_numpy(zero_copy_only=False)
        ids = g.column(id_column).to_numpy(zero_copy_only=False)
        is_text = pos == -1
        if not is_text.any():
            return _EMPTY_OUT
        txt = g.column("text").combine_chunks().filter(pa.array(is_text))
        tids = ids[is_text]
        toks = pc.split_pattern(txt, pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        base = off - off[0]  # flat token index of each doc's first token
        nt = np.diff(base)
        total = int(base[-1])
        # doc-id -> text-row index for the dup positions (every dup id
        # came from this same corpus, so membership always holds; guard
        # anyway so a stray id cannot corrupt the difference array)
        order = np.argsort(tids, kind="stable")
        sids = tids[order]
        dids, dpos = ids[~is_text], pos[~is_text]
        loc = np.searchsorted(sids, dids)
        ok = (loc < len(sids)) & (sids[np.minimum(loc, len(sids) - 1)] == dids)
        row = order[loc[ok]]
        dpos = dpos[ok]
        # one flat difference array over the partition's token pool:
        # +1 at each covered span's start, -1 past its end
        diff = np.zeros(total + 1, np.int64)
        start = base[row] + dpos
        end = base[row] + np.minimum(dpos + k, nt[row])
        np.add.at(diff, start, 1)
        np.add.at(diff, end, -1)
        keep = np.cumsum(diff[:-1]) == 0
        cs = np.concatenate([[0], np.cumsum(keep)])
        kept_per_doc = cs[base[1:]] - cs[base[:-1]]
        # list offsets are absolute into .values whatever the array
        # offset (same contract _gram_window_keys relies on)
        values = toks.values.slice(int(off[0]), total)
        kept_vals = values.filter(pa.array(keep))
        new_off = np.concatenate([[0], np.cumsum(kept_per_doc)])
        lst = pa.LargeListArray.from_arrays(
            pa.array(new_off, pa.int64()), pc.cast(kept_vals, pa.large_string())
        )
        return pa.table({
            id_column: pa.array(tids),
            "text_clean": pc.binary_join(lst, pa.scalar(" ", pa.large_string())),
            "n_removed": pa.array(nt - kept_per_doc),
        })

    positions = ds.map_batches(
        explode_pos, batch_format="pyarrow", zero_copy_batch=True
    )
    dup_pos = partitioned_apply(positions, "gh1", dup_kernel, num_partitions)
    text_rows = ds.map_batches(
        tag_text, batch_format="pyarrow", zero_copy_batch=True
    )
    tagged_pos = dup_pos.map_batches(
        tag_pos, batch_format="pyarrow", zero_copy_batch=True
    )
    return partitioned_apply(
        text_rows.union(tagged_pos), id_column, rewrite_kernel, num_partitions
    )


# ------------------------------------------------------------------ SemDeDup


def semdedup(
    ds: ray.data.Dataset,
    seed_ids: tuple[int, ...],
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    scale: int = 400,
    threshold_num: int = 95,
    threshold_den: int = 100,
    num_partitions: int | None = None,
    block_rows: int = 2048,
) -> ray.data.Dataset:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023 — public
    literature): cluster the embedding space, then mark as duplicates
    the rows whose cosine similarity to an EARLIER row (smaller id) of
    the SAME cluster reaches the threshold. Clustering bounds the pair
    set to sum-of-cluster-sizes-squared — that is the whole point of the
    algorithm at 100 TB, where all-pairs cosine is unthinkable.

    Exactness (the oracle gate): vectors quantize to an int64 grid
    (``floor(float64(x)·scale + 0.5)``, similarity._quantize_matrix);
    cluster = nearest seed vector by integer squared-L2 (ties -> lowest
    cluster index, matching SQL ``ORDER BY d, cid``); the cosine test
    ``dot/sqrt(nn_i·nn_j) >= num/den`` is evaluated as the pure-integer
    predicate ``dot > 0 AND dot²·den² >= num²·nn_i·nn_j`` — no float
    anywhere, so a SQL oracle replays it bit-exactly.

    Scale shape: the k seed centroids broadcast once (k·d ints); the
    only all-to-all moves (id, cluster, embedding) rows keyed by
    cluster; the per-cluster verify is a blocked int64 matmul
    (``block_rows`` × cluster-size at a time, never the full pair
    matrix). At 100 TB, k scales with corpus size to bound cluster
    sizes (the paper uses ~100k clusters); seeds are a config choice.

    Returns (id, cluster, is_dup) — callers drop ``is_dup`` rows to
    dedup, or join back for inspection.
    """
    import pyarrow.compute as pc

    from sapray.similarity import _quantize_matrix
    from sapray.window import partitioned_apply

    # int64-overflow guard for the pure-integer cosine predicate:
    # dot <= d·scale² for unit-ball inputs, so dot²·den² and
    # num²·nn_i·nn_j are bounded by (d·scale²)²·max(num,den)²
    dim_probe = None  # validated lazily per batch (d known only there)

    k = len(seed_ids)
    seed_set = pa.array(list(seed_ids), pa.int64())
    seeds = (
        ds.map_batches(
            lambda b: b.filter(
                pc.is_in(b.column(id_column), value_set=seed_set)
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .to_pandas()
        .sort_values(id_column)
    )
    if len(seeds) != k:
        raise ValueError(f"expected {k} seed rows, got {len(seeds)}")
    C = _quantize_matrix(seeds[vec_column], scale)  # (k, d)
    cc = np.einsum("ij,ij->i", C, C)
    d = C.shape[1]
    bound = (d * scale * scale) ** 2 * max(threshold_num, threshold_den) ** 2
    if bound >= 2**63:
        raise ValueError(
            f"scale={scale} overflows the int64 cosine predicate at "
            f"d={d}; need d²·scale⁴·max(num,den)² < 2^63"
        )

    def assign(batch: pa.Table) -> pa.Table:
        X = _quantize_matrix(batch.column(vec_column), scale)
        if len(X) and np.abs(X).max() > scale:
            # the overflow bound above assumed unit-ball inputs
            raise ValueError(
                "semdedup: embedding components exceed the unit ball; "
                "lower `scale` or normalize vectors first"
            )
        # |x|² - 2x·Cᵀ + |c|² — exact int64; argmin takes the first
        # (lowest) cluster index on ties, matching ORDER BY d, cid
        xx = np.einsum("ij,ij->i", X, X)
        dist = xx[:, None] - 2 * (X @ C.T) + cc[None, :]
        a = np.argmin(dist, axis=1).astype(np.int64)
        return pa.table({
            id_column: batch.column(id_column),
            "cluster": pa.array(a),
            vec_column: batch.column(vec_column),
        })

    assigned = ds.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    )

    num2 = threshold_num * threshold_num
    den2 = threshold_den * threshold_den

    def kernel(t: pa.Table) -> pa.Table:
        ids_t = pa.table({id_column: t.column(id_column)})
        if t.num_rows == 0:
            return pa.table({
                id_column: ids_t.column(id_column),
                "cluster": pa.array([], pa.int64()),
                "is_dup": pa.array([], pa.bool_()),
            })
        ids = t.column(id_column).to_numpy(zero_copy_only=False)
        cl = t.column("cluster").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, cl))
        ids, cl = ids[order], cl[order]
        X = _quantize_matrix(t.column(vec_column), scale)[order]
        is_dup = np.zeros(len(ids), dtype=bool)
        starts = np.flatnonzero(
            np.concatenate([[True], cl[1:] != cl[:-1]])
        )
        ends = np.concatenate([starts[1:], [len(cl)]])
        for s, e in zip(starts, ends):
            G = X[s:e]
            nn = np.einsum("ij,ij->i", G, G)
            m = e - s
            for bs in range(1, m, block_rows):  # row 0 is never a dup
                be = min(bs + block_rows, m)
                dot = G[bs:be] @ G.T  # (be-bs, m) int64
                cond = (dot > 0) & (
                    dot * dot * den2 >= num2 * nn[bs:be, None] * nn[None, :]
                )
                # only earlier rows (strictly lower id; ids unique and
                # sorted, so positional j < i is id_j < id_i)
                js = np.arange(m)[None, :]
                cond &= js < np.arange(bs, be)[:, None]
                is_dup[s + bs : s + be] = cond.any(axis=1)
        return pa.table({
            id_column: pa.array(ids),
            "cluster": pa.array(cl),
            "is_dup": pa.array(is_dup),
        })

    return partitioned_apply(assigned, "cluster", kernel, num_partitions)


# ---------------------------------------------------------------- winnowing


def winnow_fingerprints(text: str, k: int = 16, w: int = 8) -> set[int]:
    """Reference single-doc winnowing kernel (Schleimer, Wilkerson &
    Aiken, "Winnowing: Local Algorithms for Document Fingerprinting",
    SIGMOD 2003): the set of k-gram rolling-hash minima selected over
    every window of ``w`` consecutive k-gram hashes. Winnowing's tie
    rule (rightmost min) only affects selected POSITIONS — the selected
    VALUE set equals the set of window minima, which is what the batched
    path and the SQL oracle reproduce. Kept as the semantic spec for the
    differential test, like ``MinHasher.signature``."""
    b = np.frombuffer((text or "").encode("utf-8"), dtype=np.uint8)
    if len(b) == 0:
        return set()
    base = np.uint64(1099511628211)
    pows = np.power(base, np.arange(k, dtype=np.uint64))
    if len(b) < k:
        return set()
    wins = np.lib.stride_tricks.sliding_window_view(b.astype(np.uint64), k)
    hashes = (wins * pows).sum(axis=1, dtype=np.uint64)
    if len(hashes) < w:
        return set()
    mins = np.lib.stride_tricks.sliding_window_view(hashes, w).min(axis=1)
    return {int(np.int64(m.astype(np.int64))) for m in mins}


def winnow_fingerprint_rows(
    ds: ray.data.Dataset,
    id_column: str = "doc_id",
    text_column: str = "text",
    k: int = 16,
    w: int = 8,
) -> ray.data.Dataset:
    """Distinct winnowing fingerprints per document as (id, fp) rows —
    the MOSS-style local fingerprint sample. One concatenated-buffer
    pass per batch (``text.rolling_window_hashes``), a w-offset
    accumulated sliding min (O(H·w), w small), then a lexsort distinct —
    no per-row Python. Only (id, 8-byte fp) rows leave the stage."""
    from sapray.text import rolling_window_hashes

    base = np.uint64(1099511628211)
    pows = np.power(base, np.arange(k, dtype=np.uint64))
    umax = np.uint64(0xFFFFFFFFFFFFFFFF)

    def kern(batch: pa.Table) -> pa.Table:
        col = batch.column(text_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        empty = pa.table({
            id_column: pa.array([], batch.schema.field(id_column).type),
            "fp": pa.array([], pa.int64()),
        })
        if n == 0:
            return empty
        hashes, out_starts, _lens, padded = rolling_window_hashes(col, k, pows)
        H = len(hashes)
        c = padded - k + 1           # valid k-gram hashes per doc
        counts = np.maximum(c - w + 1, 0)  # full winnow windows per doc
        total = int(counts.sum())
        if total == 0:
            return empty
        # sliding min over w consecutive hash slots, accumulated per
        # offset (masked slots are uint64-max and never selected because
        # window starts are restricted to fully-valid ranges below)
        hpad = np.concatenate([hashes, np.full(w - 1, umax)])
        wm = hpad[:H].copy()
        for o in range(1, w):
            np.minimum(wm, hpad[o : o + H], out=wm)
        csum = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=csum[1:])
        doc_idx = np.repeat(np.arange(n), counts)
        local = np.arange(total, dtype=np.int64) - np.repeat(csum[:-1], counts)
        fps = wm[np.repeat(out_starts[:-1], counts) + local]
        order = np.lexsort((fps, doc_idx))
        di, fv = doc_idx[order], fps[order]
        keep = np.concatenate(
            [[True], (di[1:] != di[:-1]) | (fv[1:] != fv[:-1])]
        )
        return pa.table({
            id_column: pa.array(ids[di[keep]]),
            "fp": pa.array(fv[keep].astype(np.int64)),
        })

    return ds.map_batches(kern, batch_format="pyarrow", zero_copy_batch=True)


def winnow_pairs(
    ds: ray.data.Dataset,
    id_column: str = "doc_id",
    text_column: str = "text",
    k: int = 16,
    w: int = 8,
    df_cap: int = 64,
    min_shared: int = 2,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Winnowing near-dup pairs: documents sharing >= ``min_shared``
    selected fingerprints, with fingerprints present in more than
    ``df_cap`` documents dropped as boilerplate (the cap is part of the
    operator's SEMANTICS — the SQL oracle applies the same HAVING
    count <= cap — so engine and oracle agree at any scale, unlike a
    best-effort truncation). Scale shape: only (id, fp) rows cross the
    exchange; ONE hash route on fp (``_bucket_pairs`` run-length
    kernel), then the (id_a, id_b) count fold through the partial-agg
    combiner."""
    import pyarrow.compute as pc

    from sapray import ops

    rows = winnow_fingerprint_rows(ds, id_column, text_column, k=k, w=w)
    pairs = _bucket_pairs(
        rows, ("fp",), id_column,
        bucket_cap=df_cap, cap_mode="drop", prehashed="fp",
        num_partitions=num_partitions,
    )
    shared = ops.grouped_aggregate(
        pairs, ["id_a", "id_b"], {"n_shared": (None, "count")}
    )

    def thresh(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.greater_equal(batch.column("n_shared"), pa.scalar(min_shared))
        )

    return shared.map_batches(thresh, batch_format="pyarrow")
