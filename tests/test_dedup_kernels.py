"""Batched signature kernels must reproduce the per-doc reference
kernels bit-exactly (VERDICT r3 finding #3 vectorization)."""

import numpy as np
import pyarrow as pa

from sapray.dedup import (
    MinHasher,
    SimHasher,
    _batch_shingle_hashes,
    _shingle_hashes,
)

TRICKY = [
    "",                     # empty -> space-padded
    "ab",                   # shorter than k (chars)
    "ééé",                  # multibyte: 3 chars / 6 bytes, char-pad rule
    "hello world " * 40,    # long repetitive
    "ünïcode — emoji \U0001f600 tail",
    "exactly5!",
    " \t\n  ",              # whitespace only
    "x" * 5,                # exactly k chars
    "日本語のテキストです。" * 3,
    None,                   # NULL -> ""
]


def test_batch_shingles_match_reference():
    k = 5
    col = pa.array(TRICKY, pa.large_string())
    hashes, offs = _batch_shingle_hashes(col, k)
    assert len(offs) == len(TRICKY) + 1
    for i, t in enumerate(TRICKY):
        ref = _shingle_hashes(t or "", k)  # reference uniques; multiset here
        got = np.unique(hashes[offs[i] : offs[i + 1]])
        assert np.array_equal(got, ref), f"doc {i}: {t!r}"


def test_minhash_batch_matches_reference():
    mh = MinHasher(num_perm=16, shingle_k=5, text_column="text")
    batch = pa.table(
        {"doc_id": pa.array(range(len(TRICKY))),
         "text": pa.array(TRICKY, pa.large_string())}
    )
    out = batch_col = mh(batch).column("minhash")
    for i, t in enumerate(TRICKY):
        ref = mh.signature(t or "").astype(np.int64)
        got = np.asarray(out[i].as_py())
        assert np.array_equal(got, ref), f"doc {i}: {t!r}"


def test_simhash_batch_matches_reference():
    sh = SimHasher(text_column="text", shingle_k=5)
    batch = pa.table(
        {"doc_id": pa.array(range(len(TRICKY))),
         "text": pa.array(TRICKY, pa.large_string())}
    )
    out = sh(batch).column("simhash").to_numpy(zero_copy_only=False)
    for i, t in enumerate(TRICKY):
        ref = np.int64(np.uint64(sh.simhash(t or "")).astype(np.int64))
        assert out[i] == ref, f"doc {i}: {t!r}"


def test_empty_batch():
    mh = MinHasher(num_perm=8, text_column="text")
    sh = SimHasher(text_column="text")
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.large_string())})
    assert mh(empty).num_rows == 0
    assert sh(empty).num_rows == 0


def test_both_string_widths():
    """content is pa.large_string end to end, but the kernels must accept
    both widths (CLAUDE.md invariant)."""
    for typ in (pa.string(), pa.large_string()):
        col = pa.array(["abcdefg", "hi"], typ)
        hashes, offs = _batch_shingle_hashes(col, 5)
        assert np.array_equal(
            np.unique(hashes[offs[0] : offs[1]]), _shingle_hashes("abcdefg", 5)
        )
        assert np.array_equal(
            np.unique(hashes[offs[1] : offs[2]]), _shingle_hashes("hi", 5)
        )
