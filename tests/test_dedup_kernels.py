"""Batched signature kernels must reproduce the per-doc reference
kernels bit-exactly (VERDICT r3 finding #3 vectorization)."""

import pytest
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


def test_dup_ngram_span_stats_edges(ray_session):
    """Semantic spec of dup_ngram_span_stats on a hand-checkable corpus:
    duplicated = the k-gram occurs in >= 2 DISTINCT docs; within-doc
    repeats alone never count; sub-k docs emit (0, 0); NULL text
    tokenizes like ''."""
    import ray

    from sapray.dedup import dup_ngram_span_stats

    k = 3
    shared = "alpha beta gamma"          # one 3-gram, in docs 0 and 1
    docs = [
        (0, shared + " delta"),          # grams: (a,b,g),(b,g,d) -> 1 dup
        (1, "x y " + shared),            # grams: (x,y,a),(y,a,b),(a,b,g) -> 1 dup
        (2, "p q r p q r p q r"),        # 7 grams, repeats only WITHIN doc -> 0
        (3, "just two"),                 # < k tokens -> 0 grams
        (4, None),                       # NULL -> '' -> 1 token -> 0 grams
    ]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.large_string()),
    }))
    out = dup_ngram_span_stats(ds, "doc_id", "text", k=k).to_pandas()
    got = {int(r.doc_id): (int(r.n_grams), int(r.n_dup_grams))
           for r in out.itertuples()}
    assert got == {0: (2, 1), 1: (3, 1), 2: (7, 0), 3: (0, 0), 4: (0, 0)}


def test_dup_ngram_span_stats_empty(ray_session):
    import ray

    from sapray.dedup import dup_ngram_span_stats

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.large_string()),
    }))
    # rows-only on empty input, like the rest of the aggregate family
    # (test_empty_inputs.py): Ray bypasses UDFs on empty blocks, so the
    # grouped_aggregate schema is not reconstructible without rows
    out = dup_ngram_span_stats(ds, "doc_id", "text", k=4).to_pandas()
    assert len(out) == 0

def test_dup_ngram_span_remove_edges(ray_session):
    """Semantic spec of dup_ngram_span_remove: every token covered by a
    cross-doc-duplicated k-gram is cut (spans merge and clip at doc
    ends), within-doc repeats alone cut nothing, sub-k and NULL docs
    pass through, and a fully-duplicated doc becomes ''."""
    import ray

    from sapray.dedup import dup_ngram_span_remove

    k = 3
    shared = "alpha beta gamma"           # one 3-gram, in docs 0, 1, 5
    docs = [
        (0, shared + " delta"),           # covers toks 0-2 -> "delta"
        (1, "x y " + shared),             # covers toks 2-4 -> "x y"
        (2, "p q r p q r p q r"),         # within-doc repeats only -> kept
        (3, "just two"),                  # < k tokens -> kept
        (4, None),                        # NULL -> '' -> kept as ''
        (5, shared),                      # fully covered -> ''
    ]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.large_string()),
    }))
    out = dup_ngram_span_remove(ds, "doc_id", "text", k=k).to_pandas()
    got = {int(r.doc_id): (r.text_clean, int(r.n_removed))
           for r in out.itertuples()}
    assert got == {
        0: ("delta", 3),
        1: ("x y", 3),
        2: ("p q r p q r p q r", 0),
        3: ("just two", 0),
        4: ("", 0),
        5: ("", 3),
    }


@pytest.mark.parametrize("seed,k", [(11, 5), (23, 3), (47, 8)])
def test_dup_ngram_span_remove_matches_brute_force(ray_session, seed, k):
    """Randomized differential: vectorized two-exchange removal ==
    per-doc brute force over a corpus with injected shared spans."""
    import ray

    from sapray.dedup import dup_ngram_span_remove

    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(40)]
    shared = " ".join(rng.choice(vocab, 10))
    docs = []
    for i in range(60):
        pre = " ".join(rng.choice(vocab, rng.integers(0, 15)))
        post = " ".join(rng.choice(vocab, rng.integers(0, 15)))
        parts = [pre, shared, post] if i % 3 == 0 else [pre, post]
        docs.append(" ".join(x for x in parts if x))
    from collections import defaultdict

    gram_docs = defaultdict(set)
    toksl = [d.split(" ") for d in docs]
    for i, toks in enumerate(toksl):
        for p in range(len(toks) - k + 1):
            gram_docs[tuple(toks[p:p + k])].add(i)
    expected = {}
    for i, toks in enumerate(toksl):
        cov = np.zeros(len(toks), bool)
        for p in range(len(toks) - k + 1):
            if len(gram_docs[tuple(toks[p:p + k])]) >= 2:
                cov[p:p + k] = True
        expected[i] = (
            " ".join(t for t, c in zip(toks, cov) if not c), int(cov.sum())
        )
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.large_string()),
    }))
    out = dup_ngram_span_remove(ds, "doc_id", "text", k=k).to_pandas()
    assert len(out) == len(docs)
    got = {int(r.doc_id): (r.text_clean, int(r.n_removed))
           for r in out.itertuples()}
    assert got == expected


def test_dup_ngram_span_remove_messy_spacing_vs_duckdb(ray_session):
    """Differential vs the SQL oracle shape on a corpus with empty
    tokens (double/leading/trailing spaces): single-space split parity
    must hold exactly, including '' tokens inside duplicated grams."""
    import duckdb
    import ray

    from sapray.dedup import dup_ngram_span_remove

    rng = np.random.default_rng(5)
    vocab = ["a", "bb", "ccc", ""]  # '' injects double spaces
    shared = " ".join(rng.choice(vocab, 6))
    docs = []
    for i in range(30):
        pre = " ".join(rng.choice(vocab, rng.integers(0, 8)))
        post = " ".join(rng.choice(vocab, rng.integers(0, 8)))
        parts = [pre, shared, post] if i % 2 == 0 else [pre, post]
        t = " ".join(parts)  # may create leading/trailing/double spaces
        docs.append(t)
    docs += ["", None, " ", "  "]
    k = 4
    tbl = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.large_string()),
    })
    con = duckdb.connect()
    con.register("documents", tbl)
    exp = con.sql(f"""
WITH t AS (
  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS toks FROM documents
),
p AS (
  SELECT doc_id, toks, unnest(range(1, len(toks) - {k - 2})) AS i
  FROM t WHERE len(toks) >= {k}
),
g AS (
  SELECT doc_id, i, array_to_string(toks[i:i+{k - 1}], ' ') AS gram FROM p
),
d AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) > 1),
dup AS (SELECT doc_id, i FROM g JOIN d USING (gram)),
cov AS (
  SELECT DISTINCT dup.doc_id, dup.i + r.range AS j FROM dup, range(0, {k}) r
),
tok AS (
  SELECT doc_id, unnest(toks) AS tk, unnest(range(1, len(toks) + 1)) AS j
  FROM t
),
kept AS (
  SELECT tok.doc_id AS doc_id,
         string_agg(tok.tk, ' ' ORDER BY tok.j) AS text_clean,
         count(*) AS cnt
  FROM tok ANTI JOIN cov ON tok.doc_id = cov.doc_id AND tok.j = cov.j
  GROUP BY tok.doc_id
)
SELECT t.doc_id AS doc_id,
       coalesce(kept.text_clean, '') AS text_clean,
       CAST(len(t.toks) - coalesce(kept.cnt, 0) AS BIGINT) AS n_removed
FROM t LEFT JOIN kept USING (doc_id)
""").fetchall()
    expected = {r[0]: (r[1], r[2]) for r in exp}
    out = dup_ngram_span_remove(
        ray.data.from_arrow(tbl), "doc_id", "text", k=k
    ).to_pandas()
    got = {int(r.doc_id): (r.text_clean, int(r.n_removed))
           for r in out.itertuples()}
    assert got == expected


# ------------------------------------------------------------------ semdedup


def _semdedup_naive(ids, X, seeds_idx, scale, num, den):
    """Reference SemDeDup: O(n²) within-cluster pairwise, pure ints."""
    Q = np.floor(X.astype(np.float64) * scale + 0.5).astype(np.int64)
    C = Q[seeds_idx]
    d = (
        np.einsum("ij,ij->i", Q, Q)[:, None]
        - 2 * (Q @ C.T)
        + np.einsum("ij,ij->i", C, C)[None, :]
    )
    cl = np.argmin(d, axis=1)
    nn = np.einsum("ij,ij->i", Q, Q)
    order = np.argsort(ids)
    dup = {}
    for i in order:
        isdup = False
        for j in order:
            if ids[j] >= ids[i] or cl[j] != cl[i]:
                continue
            dot = int(Q[i] @ Q[j])
            if dot > 0 and dot * dot * den * den >= num * num * int(nn[i]) * int(nn[j]):
                isdup = True
                break
        dup[int(ids[i])] = (int(cl[i]), isdup)
    return dup


@pytest.mark.parametrize("block_rows", [1, 3, 2048])
def test_semdedup_blocked_matches_naive(ray_session, block_rows):
    """The blocked int64 matmul kernel equals the O(n²) per-pair spec at
    every block boundary (block_rows=1 and 3 force splits mid-cluster)."""
    import ray

    from sapray.dedup import semdedup

    rng = np.random.default_rng(7)
    n, dim = 80, 8
    X = rng.normal(size=(n, dim))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    # inject exact copies so positives exist
    X[40:50] = X[0:10]
    ids = rng.permutation(n).astype(np.int64)
    seeds = sorted(int(ids[i]) for i in (0, 25, 55))
    tbl = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([list(map(float, r)) for r in X],
                              pa.list_(pa.float32())),
    })
    Xf32 = np.stack([np.asarray(v, np.float32) for v in
                     tbl.column("embedding").to_pylist()])
    seeds_idx = [int(np.flatnonzero(ids == s)[0]) for s in
                 sorted(seeds)]
    expected = _semdedup_naive(ids, Xf32, seeds_idx, 400, 45, 100)
    out = semdedup(
        ray.data.from_arrow(tbl), tuple(sorted(seeds)),
        scale=400, threshold_num=45, threshold_den=100,
        block_rows=block_rows,
    ).to_pandas()
    got = {int(r.vec_id): (int(r.cluster), bool(r.is_dup))
           for r in out.itertuples()}
    assert got == expected
    assert any(v[1] for v in got.values())  # positives exercised


def test_semdedup_rejects_out_of_ball(ray_session):
    import ray

    from sapray.dedup import semdedup

    tbl = pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array([[0.1, 0.2], [3.0, 0.0]],
                              pa.list_(pa.float32())),
    })
    with pytest.raises(Exception, match="unit ball"):
        semdedup(ray.data.from_arrow(tbl), (0,), scale=400).to_pandas()


def test_winnow_batch_matches_reference(ray_session):
    """Batched winnow_fingerprint_rows reproduces the per-doc reference
    winnow_fingerprints set on ASCII corpora (the oracle's ord() hash
    matches UTF-8 bytes only on ASCII, like the fingerprint oracle)."""
    import ray

    from sapray.dedup import winnow_fingerprint_rows, winnow_fingerprints

    rng = np.random.default_rng(7)
    docs = []
    for i in range(60):
        n = int(rng.integers(0, 120))
        docs.append("".join(chr(int(c)) for c in rng.integers(32, 127, n)))
    docs += ["", None, "short", "x" * 16, "y" * 23, "z" * 24]
    ids = list(range(len(docs)))
    ds = ray.data.from_arrow(pa.table({"doc_id": ids, "text": docs}))
    got = {}
    for row in winnow_fingerprint_rows(ds, k=16, w=8).take_all():
        got.setdefault(row["doc_id"], set()).add(row["fp"])
    for i, t in zip(ids, docs):
        assert got.get(i, set()) == winnow_fingerprints(t or "", k=16, w=8), i
