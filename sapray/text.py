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

# deterministic mini n-gram profiles per language (public-knowledge
# character trigram heuristics; good enough for a ranking heuristic)
_LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "ing", "ion", "is ", " th", "er ", "of "),
    "de": ("der", "die", "und", "ein", "ich", "sch", "en ", "ch "),
    "fr": ("les", "ent", "de ", "la ", "ion", "que", "es ", " le"),
    "es": ("de ", "la ", "que", "el ", "en ", "os ", "ión", " de"),
    "zh": ("的", "是", "了", "在", "我", "有", "他", "这"),
}


class LangId:
    """Character n-gram language-ID heuristic (actor-pool stage).

    Scores each language by profile-trigram hit count normalized by text
    length; deterministic tie-break by language code.
    """

    def __init__(self, text_column: str = "text", out_column: str = "pred_lang"):
        self.text_column = text_column
        self.out_column = out_column
        self.langs = sorted(_LANG_PROFILES)
        self.patterns = {
            lang: re.compile("|".join(re.escape(g) for g in grams))
            for lang, grams in _LANG_PROFILES.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pandas().str.lower()
        scores = np.zeros((len(texts), len(self.langs)))
        for j, lang in enumerate(self.langs):
            scores[:, j] = texts.str.count(self.patterns[lang]).to_numpy()
        best = np.argmax(scores, axis=1)  # ties -> lowest index = sorted lang
        pred = np.array(self.langs, dtype=object)[best]
        pred[scores.max(axis=1) == 0] = "und"
        return batch.append_column(self.out_column, pa.array(pred, pa.string()))


class QualityScore:
    """Document quality signals: lengths, whitespace, stopword hits.

    Emits integer-valued signals so downstream checks are hash-exact.
    """

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column

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


class TokenCount:
    """Whitespace + BPE-ish token counting (compiled once per actor)."""

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column
        # BPE-ish word/number/punct splitter (public GPT-2-style shape)
        self.bpe = re.compile(r"\w+|[^\w\s]")

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column(self.text_column)
        trimmed = pc.utf8_trim_whitespace(text)
        ws_tokens = pc.list_value_length(
            pc.split_pattern_regex(trimmed, pattern=r"\s+")
        ).cast(pa.int64())
        s = batch.column(self.text_column).to_pandas()
        bpe_tokens = pa.array(s.str.count(self.bpe).astype("int64"))
        return batch.append_column("n_ws_tokens", ws_tokens).append_column(
            "n_bpe_tokens", bpe_tokens
        )


class Fingerprint:
    """Rolling-hash document fingerprint (polynomial Rabin-style over
    bytes, window-min sampled) — deterministic across runs."""

    def __init__(self, text_column: str = "text", window: int = 16):
        self.text_column = text_column
        self.window = window
        base = np.uint64(1099511628211)
        self.pows = np.power(base, np.arange(window, dtype=np.uint64))

    def _fp(self, s: str) -> int:
        b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        if len(b) < self.window:
            b = np.pad(b, (0, self.window - len(b)), constant_values=0)
        w = np.lib.stride_tricks.sliding_window_view(b, self.window)
        hashes = (w * self.pows).sum(axis=1, dtype=np.uint64)
        return int(hashes.min())

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = [self._fp(t) if t else 0 for t in batch.column(self.text_column).to_pylist()]
        return batch.append_column(
            "fingerprint", pa.array(np.array(fps, dtype=np.uint64).astype(np.int64))
        )


def analyze_documents(ds: ray.data.Dataset, concurrency: int = 4) -> ray.data.Dataset:
    """Full text-analysis pipeline: langid -> quality -> token counts."""
    return (
        ds.map_batches(LangId, batch_format="pyarrow", concurrency=(1, concurrency))
        .map_batches(QualityScore, batch_format="pyarrow", concurrency=(1, concurrency))
        .map_batches(TokenCount, batch_format="pyarrow", concurrency=(1, concurrency))
    )
