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
compiler supports. The filter-only fuzz needs no Ray session (the
pushdown expression is evaluated by the Arrow dataset scanner
directly); the composition fuzz drives the FULL textual surface —
$select/$filter/$orderby/$top/$skip in one query string — through
``ops.read_projected`` + ``ops.skip`` end to end.
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
        ["int", "float", "str", "ts", "isnull", "func", "arith"],
        p=[0.18, 0.13, 0.18, 0.10, 0.10, 0.16, 0.15],
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
    if kind == "arith":
        # add/sub/mul/div/mod with OData precedence vs DuckDB arithmetic;
        # div is TRUNCATED on integers (pyarrow divide) so the oracle
        # trunc()s explicitly (DuckDB // floors)
        form = int(rng.integers(0, 8))
        k = int(rng.integers(1, 5))
        m = int(rng.integers(-6, 18))
        if form == 6:
            # float fmod: DuckDB % on DOUBLE is fmod (7.5 % 2 = 1.5);
            # the compiler's trunc-division remainder must match
            r = float(rng.integers(-3, 4)) / 2.0
            return (f"f mod {k + 1} {op} {r}",
                    f"f % {k + 1} {sop} {r}::DOUBLE")
        if form == 7:
            # field-valued denominator WITH zeros: i/f contain 0 — SQL
            # x/0 is NULL in DuckDB; the compiler nulls zero slots
            # (Arrow would raise on int /0 and give +-inf on float /0)
            if rng.random() < 0.5:
                return (
                    f"{m} div i {op} {k}",
                    f"CAST(trunc(CAST({m} AS DOUBLE) / i) AS BIGINT) "
                    f"{sop} {k}",
                )
            return (f"{m} div f {op} {k}",
                    f"{m}::DOUBLE / f {sop} {k}")
        if form == 0:
            return f"i add {k} {op} {m}", f"i + {k} {sop} {m}"
        if form == 1:
            return f"i sub {k} {op} {m}", f"i - {k} {sop} {m}"
        if form == 2:
            return (f"i mul 2 sub {k} {op} {m}",
                    f"i * 2 - {k} {sop} {m}")
        if form == 3:
            r = int(rng.integers(-3, 4))
            return f"i mod {k + 1} {op} {r}", f"i % {k + 1} {sop} {r}"
        if form == 4:
            return (
                f"i div {k + 1} {op} {m}",
                f"CAST(trunc(CAST(i AS DOUBLE) / {k + 1}) AS BIGINT) "
                f"{sop} {m}",
            )
        flit = float(rng.integers(-4, 8)) / 2.0
        return (f"f mul 2 add {flit} {op} {m}",
                f"f * 2 + {flit}::DOUBLE {sop} {m}")
    # canonical functions over the string / float / timestamp columns
    f = ["substringof", "startswith", "endswith", "tolower", "toupper",
         "trim", "length", "year", "month", "hour",
         "concat", "indexof", "substring", "replace",
         "round", "floor", "ceiling"][int(rng.integers(0, 17))]
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
    if f == "concat":
        suf = ["x", " pad", "'s"][int(rng.integers(0, 3))]
        lit = ["alphax", "Betax", " pad  pad", "it's's", "x"][
            int(rng.integers(0, 5))]
        return (f"concat(s, {_odata_str(suf)}) {op} {_odata_str(lit)}",
                f"s || {_sql_str(suf)} {sop} {_sql_str(lit)}")
    if f == "indexof":  # 0-based / -1 absent; DuckDB strpos is 1-based/0
        needle = ["a", "lph", "B", "zz", " ", "t"][int(rng.integers(0, 6))]
        n = int(rng.integers(-1, 5))
        return (f"indexof(s, {_odata_str(needle)}) {op} {n}",
                f"strpos(s, {_sql_str(needle)}) - 1 {sop} {n}")
    if f == "substring":  # 0-based start; DuckDB substr is 1-based
        st, ln = int(rng.integers(0, 3)), int(rng.integers(1, 4))
        lit = ["lph", "et", "ta", "a", "lp", "de"][int(rng.integers(0, 6))]
        return (f"substring(s, {st}, {ln}) {op} {_odata_str(lit)}",
                f"substr(s, {st + 1}, {ln}) {sop} {_sql_str(lit)}")
    if f == "replace":
        lit = ["olpho", "Beto", "it's", "delto x"][int(rng.integers(0, 4))]
        return (f"replace(s, 'a', 'o') {op} {_odata_str(lit)}",
                f"replace(s, 'a', 'o') {sop} {_sql_str(lit)}")
    if f in ("round", "floor", "ceiling"):
        # halves away from zero on both sides (pyarrow round_mode is
        # explicit in the compiler; DuckDB round is half-away)
        n = int(rng.integers(-5, 12))
        return f"{f}(f) {op} {n}", f"{f}(f) {sop} {n}"
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


def test_filter_division_semantics(table_and_path):
    """Targeted review-finding regressions: (a) float 'mod' is fmod, not
    the ~0 a-(a/b)*b true-division remainder; (b) a literal-zero
    denominator is a parse-time ConfigError on every path, not a
    scan-time ArrowInvalid; (c) a field denominator containing zeros
    yields SQL NULL — no crash on integer /0, no +-inf rows on float /0
    (the CLAUDE.md Arrow-inf-vs-DuckDB-NULL rule)."""
    from sapray.config import ConfigError

    t, path = table_and_path
    dataset = pads.dataset(path)

    # (a) fmod: f contains 7.5 / -7.5 style halves -> f mod 2 == 1.5
    got = dataset.to_table(
        filter=filter_to_expression("f mod 2 eq 1.5")
    ).column("f").to_pylist()
    import math
    exp = [v for v in t.column("f").to_pylist()
           if v is not None and math.fmod(v, 2) == 1.5]
    assert sorted(got) == sorted(exp) and got, "float mod must be fmod"

    # (b) literal zero denominator: parse-time error, both operators,
    # field-on-the-left included (only the lit/lit fold rejected it)
    for q in ("i div 0 eq 1", "i mod 0 eq 1", "f div 0 gt 5"):
        with pytest.raises(ConfigError):
            filter_to_expression(q)

    # (c) field denominators with zero slots: i and f both contain 0
    assert dataset.to_table(  # integer /0 must not ArrowInvalid the scan
        filter=filter_to_expression("10 div i gt 1000000")
    ).num_rows == 0
    assert dataset.to_table(  # float /0 must yield NULL, not +inf
        filter=filter_to_expression("10 div f gt 1000000")
    ).num_rows == 0


def test_full_query_composition_fuzz_vs_duckdb(table_and_path, ray_session):
    """Randomized end-to-end fuzz of the composed query surface: ONE
    query string carrying all five options — $select prunes the read,
    $filter compiles to read pushdown (referencing columns OUTSIDE the
    projection: filter-then-project), $orderby picks direction, and
    $top/$skip slice the exact global order via ops.skip — compared
    against the equivalent DuckDB ORDER BY/LIMIT/OFFSET. Percent-encoded
    quotes exercise the _decode path (%27, reference
    SapODataConfigTest.java:59)."""
    from urllib.parse import quote

    import duckdb
    import pandas as pd
    import ray.data  # noqa: F401

    from sapray import ops
    from sapray.config import (
        parse_filter,
        parse_orderby,
        parse_select,
        parse_top_skip,
    )

    t, path = table_and_path
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    rng = np.random.default_rng(431)
    nonempty = 0
    for trial in range(15):
        od, sql = _gen_expr(rng, depth=2)
        ord_col = ["i", "f"][int(rng.integers(0, 2))]
        desc = bool(rng.random() < 0.5)
        top = int(rng.integers(1, 80))
        sk = int(rng.integers(0, 40))
        query = (
            f"?$select=id,{ord_col}&$top={top}&$skip={sk}"
            f"&$filter={quote(od, safe=' (),')}"
            f"&$orderby={ord_col}{' desc' if desc else ' asc'}"
        )
        cols = parse_select(query)
        top2, sk2 = parse_top_skip(query)
        fexpr = parse_filter(query)
        ((ob_col, ob_desc),) = parse_orderby(query)
        assert (cols, top2, sk2, ob_col, ob_desc) == (
            ["id", ord_col], top, sk, ord_col, desc
        ), f"trial {trial}: query round-trip drifted"
        ds = ops.read_projected(path, columns=cols, filter_expr=fexpr)
        gdf = ops.skip(
            ds, ob_col, "id", offset=sk2, limit=top2, descending=ob_desc
        ).to_pandas()
        exp = con.execute(
            f"SELECT id, {ord_col} FROM t WHERE {sql} "
            f"ORDER BY {ord_col} {'DESC' if desc else 'ASC'}, id "
            f"LIMIT {top} OFFSET {sk}"
        ).fetch_df().sort_values("id").reset_index(drop=True)
        if gdf.empty or exp.empty:
            # a filter matching nothing / an offset past the end must be
            # empty on BOTH sides (the empty-input global_rank path)
            assert gdf.empty and exp.empty, (
                f"trial {trial}: {query!r} vs {sql!r}: "
                f"{len(gdf)} rows != {len(exp)} rows"
            )
            continue
        got = gdf.sort_values("id").reset_index(drop=True)
        assert list(got["id"]) == list(exp["id"]), (
            f"trial {trial}: {query!r} vs {sql!r}"
        )
        vg = got[ord_col].tolist()
        ve = exp[ord_col].tolist()
        assert all(
            (a == b) or (pd.isna(a) and pd.isna(b)) for a, b in zip(vg, ve)
        ), f"trial {trial}: values diverged for {query!r}"
        nonempty += bool(len(got))
    assert nonempty >= 8  # the slices must actually select rows


def test_filter_null_literal_semantics(table_and_path):
    """Null-literal propagation (review findings): a null function
    argument folds at COMPILE time — the string/date kernels have no
    null-typed-scalar variant, so the old path crashed the scan with
    ArrowNotImplementedError after validate() accepted the config — and
    ordering against null compiles to the constant null predicate (SQL
    ``x > NULL`` is NULL for every row). Both Kleene-propagate through
    not/and/or exactly like the DuckDB oracle's WHERE."""
    t, path = table_and_path
    dataset = pads.dataset(path)

    # value function of a null argument folds to the null literal, and
    # `eq null` keeps OData semantics: true exactly where s IS NULL
    got = dataset.to_table(filter=filter_to_expression("tolower(null) eq s"))
    assert got.num_rows == t.column("s").null_count

    # boolean function with a null argument: never matches — standalone
    # AND negated (NOT NULL is NULL, not TRUE)
    assert dataset.to_table(
        filter=filter_to_expression("substringof('a', null)")
    ).num_rows == 0
    assert dataset.to_table(
        filter=filter_to_expression("not substringof('a', null)")
    ).num_rows == 0

    # ordering against null, direct and constant-folded ('null add 1'):
    # 0 rows, and NOT(...) stays 0 rows (Kleene)
    for q in ("i gt null", "i gt null add 1", "null sub 2 lt i",
              "not (i ge null)"):
        assert dataset.to_table(
            filter=filter_to_expression(q)
        ).num_rows == 0, q
    # OR recovers the other side: NULL OR true = true, NULL OR false/null
    # drops — exactly the i > 0 row set
    n_pos = dataset.to_table(filter=filter_to_expression("i gt 0")).num_rows
    assert n_pos > 0
    assert dataset.to_table(
        filter=filter_to_expression("i gt null or i gt 0")
    ).num_rows == n_pos

    # folded-null arithmetic on an eq comparison: `null add 1 eq i`
    # flips to `i eq null` == IS NULL
    assert dataset.to_table(
        filter=filter_to_expression("null add 1 eq i")
    ).num_rows == t.column("i").null_count


def test_skip_descending_temporal_and_string_guard(table_and_path, ray_session):
    """ops.skip(descending=True) on a TIMESTAMP order column (review
    finding: negate_checked has no temporal kernel) — the epoch-integer
    involution ranks `ORDER BY ts DESC NULLS LAST, id` and restores the
    original Arrow type on output; a string order column raises the
    actionable order_by_slice error at plan time instead of
    ArrowNotImplementedError inside the streaming pipeline."""
    import duckdb

    from sapray import ops

    t, path = table_and_path
    ds = ops.read_projected(path, columns=["id", "ts"])
    out = ops.skip(ds, "ts", "id", offset=5, limit=40, descending=True)
    sch = out.schema()
    assert dict(zip(sch.names, sch.types))["ts"] == pa.timestamp("us")
    got = out.to_pandas()
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    exp = con.execute(
        "SELECT id FROM t ORDER BY ts DESC NULLS LAST, id "
        "LIMIT 40 OFFSET 5"
    ).fetch_df()
    assert sorted(got["id"]) == sorted(exp["id"])

    dss = ops.read_projected(path, columns=["id", "s"])
    with pytest.raises(ValueError, match="order_by_slice"):
        ops.skip(dss, "s", "id", offset=0, limit=5, descending=True)
