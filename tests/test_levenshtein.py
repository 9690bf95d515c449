"""Batched Levenshtein kernel vs DuckDB's levenshtein() — differential
fuzz over random ASCII strings plus NULL / empty / chunk-boundary edges.

The kernel is pure numpy (no Ray session needed): the DP loops over
character positions with length-B vectors inside, decoding the Arrow
string column via concatenated-buffer offset arithmetic.
"""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from sapray.text import levenshtein_batch


def _oracle(pairs):
    con = duckdb.connect()
    tbl = pa.table({
        "a": pa.array([p[0] for p in pairs], pa.string()),
        "b": pa.array([p[1] for p in pairs], pa.string()),
    })
    con.register("t", tbl)
    return [
        r[0]
        for r in con.sql("SELECT levenshtein(a, b) FROM t").fetchall()
    ]


def test_known_distances():
    a = pa.array(["kitten", "flaw", "", "abc", "same", "abcdef"])
    b = pa.array(["sitting", "lawn", "abc", "", "same", "abcdef"])
    assert levenshtein_batch(a, b).to_pylist() == [3, 2, 3, 3, 0, 0]


def test_null_propagates():
    a = pa.array(["x", None, None, "y"])
    b = pa.array([None, "x", None, "y"])
    assert levenshtein_batch(a, b).to_pylist() == [None, None, None, 0]


def test_empty_input():
    e = pa.array([], pa.string())
    assert levenshtein_batch(e, e).to_pylist() == []


def test_large_string_width():
    a = pa.array(["kitten", "flaw"], pa.large_string())
    b = pa.array(["sitting", "lawn"], pa.large_string())
    assert levenshtein_batch(a, b).to_pylist() == [3, 2]


def test_chunked_and_sliced_input():
    a = pa.chunked_array([
        pa.array(["kitten", "ab"]), pa.array(["xyz", ""])
    ])
    b = pa.chunked_array([
        pa.array(["sitting", "ba"]), pa.array(["xy", "q"])
    ])
    assert levenshtein_batch(a, b).to_pylist() == [3, 2, 1, 1]
    # sliced chunks exercise the chunk.offset arithmetic
    base = pa.array(["pad", "kitten", "flaw"])
    assert levenshtein_batch(base.slice(1), pa.array(["sitting", "lawn"])
                             ).to_pylist() == [3, 2]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fuzz_vs_duckdb(seed):
    rng = np.random.default_rng(seed)
    alpha = list("abcdefgh XYZ018#")
    pairs = []
    for _ in range(300):
        la, lb = rng.integers(0, 24, size=2)
        pairs.append((
            "".join(rng.choice(alpha, la)),
            "".join(rng.choice(alpha, lb)),
        ))
    got = levenshtein_batch(
        pa.array([p[0] for p in pairs]), pa.array([p[1] for p in pairs])
    ).to_pylist()
    assert got == _oracle(pairs)


# ---------------------------------------------------------------------------
# full (unrestricted) Damerau-Levenshtein
# ---------------------------------------------------------------------------


def test_damerau_known_distances():
    from sapray.text import damerau_levenshtein_batch as dl

    a = pa.array(["CA", "ab", "kitten", "", None, "same"])
    b = pa.array(["ABC", "ba", "sitting", "xy", "q", "same"])
    # CA->ABC is 2 under FULL DL (3 under restricted/OSA) — the
    # distinguishing case for DuckDB's damerau_levenshtein semantics
    assert dl(a, b).to_pylist() == [2, 1, 3, 2, None, 0]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_damerau_fuzz_vs_duckdb(seed):
    from sapray.text import damerau_levenshtein_batch as dl

    rng = np.random.default_rng(seed)
    # small alphabet maximizes transposition collisions
    alpha = list("abcd")
    pairs = []
    for _ in range(300):
        la, lb = rng.integers(0, 14, size=2)
        pairs.append((
            "".join(rng.choice(alpha, la)),
            "".join(rng.choice(alpha, lb)),
        ))
    got = dl(
        pa.array([p[0] for p in pairs]), pa.array([p[1] for p in pairs])
    ).to_pylist()
    con = duckdb.connect()
    tbl = pa.table({
        "a": pa.array([p[0] for p in pairs], pa.string()),
        "b": pa.array([p[1] for p in pairs], pa.string()),
    })
    con.register("t", tbl)
    want = [
        r[0]
        for r in con.sql("SELECT damerau_levenshtein(a, b) FROM t").fetchall()
    ]
    assert got == want


# ---------------------------------------------------------------------------
# character-set Jaccard (DuckDB jaccard)
# ---------------------------------------------------------------------------


def test_charset_jaccard_known():
    from sapray.text import charset_jaccard_batch as j

    a = pa.array(["abc", "aa", "abcdefg", "", None])
    b = pa.array(["bcd", "a", "efghijk", "x", "y"])
    got = j(a, b).to_pylist()
    assert got[0] == 0.5 and got[1] == 1.0
    assert got[2] == 3 / 11
    assert got[3] is None and got[4] is None  # empty / NULL -> NULL


@pytest.mark.parametrize("seed", [0, 1])
def test_charset_jaccard_fuzz_vs_duckdb(seed):
    from sapray.text import charset_jaccard_batch as j

    rng = np.random.default_rng(seed)
    alpha = list("abcdefgh XYZ018#")
    pairs = []
    for _ in range(300):
        la, lb = rng.integers(1, 24, size=2)  # DuckDB rejects empties
        pairs.append((
            "".join(rng.choice(alpha, la)),
            "".join(rng.choice(alpha, lb)),
        ))
    got = j(
        pa.array([p[0] for p in pairs]), pa.array([p[1] for p in pairs])
    ).to_pylist()
    con = duckdb.connect()
    tbl = pa.table({
        "a": pa.array([p[0] for p in pairs], pa.string()),
        "b": pa.array([p[1] for p in pairs], pa.string()),
    })
    con.register("t", tbl)
    want = [r[0] for r in con.sql("SELECT jaccard(a, b) FROM t").fetchall()]
    assert got == want  # bit-exact: same small-int double division


def test_all_null_and_all_empty_columns():
    """An all-NULL or all-empty-string column has a ZERO-length Arrow
    data buffer; the offset gather must not index into it (review
    finding: IndexError killed the whole map_batches task)."""
    from sapray.text import charset_jaccard_batch, damerau_levenshtein_batch

    nulls = pa.array([None, None], pa.string())
    vals = pa.array(["x", "y"])
    assert levenshtein_batch(nulls, vals).to_pylist() == [None, None]
    assert levenshtein_batch(vals, nulls).to_pylist() == [None, None]
    assert damerau_levenshtein_batch(nulls, vals).to_pylist() == [None, None]
    assert charset_jaccard_batch(nulls, vals).to_pylist() == [None, None]
    empties = pa.array(["", ""], pa.string())
    assert levenshtein_batch(empties, vals).to_pylist() == [1, 1]
    assert levenshtein_batch(empties, empties).to_pylist() == [0, 0]
    assert charset_jaccard_batch(empties, vals).to_pylist() == [None, None]
