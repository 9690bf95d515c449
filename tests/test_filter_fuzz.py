"""Differential fuzz of the ``$filter`` compiler vs DuckDB.

Each random predicate tree is emitted twice in tandem — once as an OData
v2 ``$filter`` string (the textual surface of ``reference
SapODataConfigTest.java:59``) and once as the equivalent DuckDB SQL —
then evaluated through the REAL pushdown path (``pyarrow.dataset`` scan
filter over a Parquet file, the same expression ``ops.read_projected``
feeds to ``ray.data.read_parquet``) and compared row-for-row against
the SQL WHERE. Covers eq/ne/gt/ge/lt/le on int/float/string/timestamp
columns with NULLs (SQL three-valued logic), and/or/not nesting,
literal-on-the-left flips, IS NULL, and every canonical function the
compiler supports. No Ray session needed: the pushdown expression is
evaluated by the Arrow dataset scanner directly.
"""

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from sapray.config import filter_to_expression

N = 400


@pytest.fixture(scope="module")
def table_and_path(tmp_path_factory):
    rng = np.random.default_rng(2024)
    words = ["alpha", "Beta", "GAMMA", "delta x", " pad ", "it's", ""]
    ints = [None if rng.random() < 0.15 else int(x)
            for x in rng.integers(-5, 15, N)]
    # exact halves: bit-identical under DOUBLE in both engines
    floats = [None if rng.random() < 0.15 else float(x) / 2.0
              for x in rng.integers(-8, 20, N)]
    strs = [None if rng.random() < 0.15 else words[int(i)]
            for i in rng.integers(0, len(words), N)]
    days = rng.integers(0, 365, N)
    secs = rng.integers(0, 86400, N)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    tss = [None if rng.random() < 0.15
           else base + np.timedelta64(int(d), "D") + np.timedelta64(int(s), "s")
           for d, s in zip(days, secs)]
    t = pa.table({
        "id": pa.array(np.arange(N), pa.int64()),
        "i": pa.array(ints, pa.int64()),
        "f": pa.array(floats, pa.float64()),
        "s": pa.array(strs, pa.string()),
        "ts": pa.array(tss, pa.timestamp("us")),
    })
    path = str(tmp_path_factory.mktemp("fuzz") / "t.parquet")
    pq.write_table(t, path)
    return t, path


_OPS = [("eq", "="), ("ne", "<>"), ("gt", ">"),
        ("ge", ">="), ("lt", "<"), ("le", "<=")]


def _sql_str(v: str) -> str:
    return "'" + v.replace("'", "''") + "'"


def _odata_str(v: str) -> str:
    return "'" + v.replace("'", "''") + "'"


def _gen_comparison(rng) -> tuple[str, str]:
    """-> (odata, sql) for one leaf comparison."""
    kind = rng.choice(
        ["int", "float", "str", "ts", "isnull", "func"],
        p=[0.22, 0.16, 0.22, 0.12, 0.12, 0.16],
    )
    op, sop = _OPS[int(rng.integers(0, len(_OPS)))]
    if kind == "int":
        lit = int(rng.integers(-5, 15))
        if rng.random() < 0.3:  # literal-on-the-left flip path
            return f"{lit} {op} i", f"{lit} {sop} i"
        return f"i {op} {lit}", f"i {sop} {lit}"
    if kind == "float":
        lit = float(rng.integers(-8, 20)) / 2.0
        # bare fraction literals are DECIMAL in DuckDB (exact-rational
        # compare); cast ::DOUBLE to match the engine's float64 compare
        return f"f {op} {lit}", f"f {sop} {lit}::DOUBLE"
    if kind == "str":
        lit = ["alpha", "Beta", "GAMMA", "delta x", " pad ", "it's", "", "zz"][
            int(rng.integers(0, 8))]
        return f"s {op} {_odata_str(lit)}", f"s {sop} {_sql_str(lit)}"
    if kind == "ts":
        d, s = int(rng.integers(0, 365)), int(rng.integers(0, 86400))
        from datetime import datetime, timedelta

        dt = datetime(2024, 1, 1) + timedelta(days=d, seconds=s)
        iso = dt.isoformat()
        return (f"ts {op} datetime'{iso}'",
                f"ts {sop} TIMESTAMP '{iso.replace('T', ' ')}'")
    if kind == "isnull":
        col = ["i", "f", "s", "ts"][int(rng.integers(0, 4))]
        if rng.random() < 0.5:
            return f"{col} eq null", f"{col} IS NULL"
        return f"{col} ne null", f"{col} IS NOT NULL"
    # canonical functions over the string / timestamp columns
    f = ["substringof", "startswith", "endswith", "tolower", "toupper",
         "trim", "length", "year", "month", "hour"][int(rng.integers(0, 10))]
    if f == "substringof":
        needle = ["a", "lph", "B", "zz", " "][int(rng.integers(0, 5))]
        od = f"substringof({_odata_str(needle)}, s)"
        sql = f"contains(s, {_sql_str(needle)})"
        if rng.random() < 0.5:  # bare boolean predicate vs eq true/false
            return od, sql
        b = "true" if rng.random() < 0.5 else "false"
        return f"{od} eq {b}", f"{sql} = {b}"
    if f in ("startswith", "endswith"):
        pre = ["a", "al", "B", "G", "x", " "][int(rng.integers(0, 6))]
        kern = "starts_with" if f == "startswith" else "ends_with"
        return (f"{f}(s, {_odata_str(pre)})",
                f"{kern}(s, {_sql_str(pre)})")
    if f in ("tolower", "toupper", "trim"):
        sqlf = {"tolower": "lower", "toupper": "upper", "trim": "trim"}[f]
        lit = {"tolower": "gamma", "toupper": "BETA", "trim": "pad"}[f]
        return (f"{f}(s) {op} {_odata_str(lit)}",
                f"{sqlf}(s) {sop} {_sql_str(lit)}")
    if f == "length":
        n = int(rng.integers(0, 8))
        return f"length(s) {op} {n}", f"length(s) {sop} {n}"
    # year/month/hour over ts; DuckDB part functions return BIGINT
    part = {"year": 2024, "month": int(rng.integers(1, 13)),
            "hour": int(rng.integers(0, 24))}[f]
    return f"{f}(ts) {op} {part}", f"{f}(ts) {sop} {part}"


def _gen_expr(rng, depth: int) -> tuple[str, str]:
    if depth <= 0 or rng.random() < 0.4:
        return _gen_comparison(rng)
    kind = rng.choice(["and", "or", "not"], p=[0.4, 0.4, 0.2])
    if kind == "not":
        od, sql = _gen_expr(rng, depth - 1)
        return f"not ({od})", f"NOT ({sql})"
    lo, ls = _gen_expr(rng, depth - 1)
    ro, rs = _gen_expr(rng, depth - 1)
    return f"({lo}) {kind} ({ro})", f"({ls}) {kind.upper()} ({rs})"


def test_filter_fuzz_vs_duckdb(table_and_path):
    import duckdb

    t, path = table_and_path
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    dataset = pads.dataset(path)
    rng = np.random.default_rng(97)
    nonempty = 0
    for trial in range(120):
        od, sql = _gen_expr(rng, depth=3)
        expr = filter_to_expression(od)
        got = sorted(dataset.to_table(filter=expr).column("id").to_pylist())
        exp = sorted(
            r[0] for r in
            con.execute(f"SELECT id FROM t WHERE {sql}").fetchall()
        )
        assert got == exp, (
            f"trial {trial}: {od!r} vs {sql!r}: "
            f"{len(got)} rows != {len(exp)} rows"
        )
        nonempty += bool(got)
    # the generator must actually exercise matching rows, not just
    # vacuous always-false predicates
    assert nonempty > 60
