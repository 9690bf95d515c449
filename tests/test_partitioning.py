"""Keyed-exchange sizing (VERDICT r3 finding #1): exchange widths must
scale with the cluster and the data, not sit at a 16/32 literal."""

import numpy as np
import pyarrow as pa
import pytest

from sapray.partition import exchange_partitions


def test_grows_with_cluster_cpus(monkeypatch):
    import ray

    monkeypatch.setattr(ray, "is_initialized", lambda: True)
    sizes = {}
    for ncpu in (8, 32, 256):
        monkeypatch.setattr(ray, "cluster_resources", lambda n=ncpu: {"CPU": n})
        sizes[ncpu] = exchange_partitions()
    assert sizes[8] == 8 and sizes[32] == 32 and sizes[256] == 256
    assert sizes[8] < sizes[32] < sizes[256]


def test_grows_with_input_bytes(monkeypatch):
    import ray

    monkeypatch.setattr(ray, "is_initialized", lambda: True)
    monkeypatch.setattr(ray, "cluster_resources", lambda: {"CPU": 8})

    class FakeMeta:
        def __init__(self, size_bytes):
            self.size_bytes = size_bytes

    class FakeDs:
        def __init__(self, size_bytes):
            class Dag:
                def infer_metadata(dag_self):
                    return FakeMeta(size_bytes)

            class Plan:
                dag = Dag()

            self._logical_plan = Plan()

    small = exchange_partitions(FakeDs(1 << 20))
    big = exchange_partitions(FakeDs(100 << 30))  # 100 GiB
    assert small == 8  # CPU floor dominates tiny inputs
    assert big > small
    assert big <= 16 * 8  # cap_per_cpu guard against task explosion


def test_unknown_size_falls_back_to_cpus(monkeypatch):
    import ray

    monkeypatch.setattr(ray, "is_initialized", lambda: True)
    monkeypatch.setattr(ray, "cluster_resources", lambda: {"CPU": 12})

    class Opaque:
        pass  # no _logical_plan: probe must not raise, just fall back

    assert exchange_partitions(Opaque()) == 12


def test_partitioned_apply_default_resolves(ray_session):
    """End to end: a default-width partitioned_apply on the 4-CPU test
    session still routes every row exactly once."""
    import ray.data

    from sapray.window import partitioned_apply

    t = pa.table({"k": pa.array(np.arange(1000) % 37), "v": pa.array(np.arange(1000))})
    ds = ray.data.from_arrow(t)
    out = partitioned_apply(ds, "k", lambda g: g).take_all()
    assert len(out) == 1000
    assert sorted(r["v"] for r in out) == list(range(1000))


def test_global_rank_int64_above_2_53_with_nulls(ray_session):
    """int64 values above 2^53 must not round through float64 when the
    column carries NULLs (ADVICE r3): adjacent huge values that collide
    as doubles must still rank in exact integer order, NULLs last."""
    import ray.data

    from sapray.ops import global_rank

    base = 1 << 60
    vals = [base + 3, base + 1, None, base + 2, base, None]
    t = pa.table({
        "v": pa.array(vals, pa.int64()),
        "id": pa.array(range(len(vals)), pa.int64()),
    })
    out = global_rank(ray.data.from_arrow(t), "v", "id", num_partitions=3)
    rows = sorted(out.take_all(), key=lambda r: r["rk"])
    got = [r["id"] for r in rows]
    # exact ascending value order: base, +1, +2, +3, then NULLs by id
    assert got == [4, 1, 3, 0, 2, 5]
    assert [r["rk"] for r in rows] == [1, 2, 3, 4, 5, 6]


def test_skip_none_offset_and_limit(ray_session):
    """parse_top_skip returns None for absent options — ops.skip must
    treat offset=None as 0 and limit=None as unbounded."""
    import ray.data

    from sapray.ops import skip

    t = pa.table({"v": pa.array(range(20), pa.int64()),
                  "id": pa.array(range(20), pa.int64())})
    out = skip(ray.data.from_arrow(t), "v", "id", offset=None, limit=5)
    assert sorted(r["id"] for r in out.take_all()) == [0, 1, 2, 3, 4]
    out2 = skip(ray.data.from_arrow(t), "v", "id", offset=15, limit=None)
    assert sorted(r["id"] for r in out2.take_all()) == [15, 16, 17, 18, 19]


def test_global_rank_int64_near_max(ray_session):
    """Values near int64 max must not wrap through the float64 splitter
    cast (a wrapped splitter un-sorts the array and misroutes rows)."""
    import ray.data

    from sapray.ops import global_rank

    hi = np.iinfo(np.int64).max
    vals = [hi, hi - 1, hi - 2, None, 0, hi - 3]
    t = pa.table({"v": pa.array(vals, pa.int64()),
                  "id": pa.array(range(len(vals)), pa.int64())})
    out = global_rank(ray.data.from_arrow(t), "v", "id", num_partitions=3)
    rows = sorted(out.take_all(), key=lambda r: r["rk"])
    assert [r["id"] for r in rows] == [4, 5, 2, 1, 0, 3]


def test_prefix_filtered_default_partitions(ray_session):
    """prefix_filtered_candidates with the default num_partitions=None
    must resolve via exchange_partitions, not crash in the route
    closure (round-4 review finding)."""
    import ray.data

    from sapray.dedup import prefix_filtered_candidates

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["the quick brown fox jumps", "the quick brown fox jumped",
                          "utterly unrelated content here"], pa.large_string()),
    })
    pairs = prefix_filtered_candidates(ray.data.from_arrow(t))
    got = {(r["id_a"], r["id_b"]) for r in pairs.take_all()}
    assert (1, 2) in got


def test_streaming_sessionize_null_keys(ray_session):
    """NULL keys must group as ONE key (matching the batch twin) instead
    of crashing the bucket actor (string) or splintering (numeric)."""
    import ray.data

    from sapray.streaming import streaming_sessionize
    from sapray.window import session_counts

    ts = [np.datetime64("2026-01-01T00:00:00") + np.timedelta64(i * 10, "m")
          for i in range(12)]
    t = pa.table({
        "k": pa.array([None, "a", None, "a", None, "b"] * 2, pa.string()),
        "ts": pa.array([x.astype("datetime64[us]").item() for x in ts],
                       pa.timestamp("us")),
    })
    gap = np.timedelta64(25, "m")
    got = streaming_sessionize(ray.data.from_arrow(t), "k", "ts", gap)
    batch = session_counts(ray.data.from_arrow(t), "k", "ts", gap)
    g = {(r["k"], r["n_sessions"]) for r in got.to_pylist()}
    b = {(r["k"], r["n_sessions"])
         for r in batch.take_all()}
    assert g == b
    assert sum(1 for k, _ in g if k is None) == 1


def test_streaming_sessionize_narrow_int_key(ray_session):
    """An int32 key column must work (the int64 sentinel used to raise
    inside fill_null — advisory finding), and a REAL key equal to the
    width-derived sentinel must raise loudly, not merge with NULLs."""
    import ray.data

    from sapray.streaming import streaming_sessionize
    from sapray.window import session_counts

    ts = [np.datetime64("2026-01-01T00:00:00") + np.timedelta64(i * 10, "m")
          for i in range(12)]
    tsa = pa.array([x.astype("datetime64[us]").item() for x in ts],
                   pa.timestamp("us"))
    t = pa.table({
        "k": pa.array([None, 1, None, 1, None, 2] * 2, pa.int32()),
        "ts": tsa,
    })
    gap = np.timedelta64(25, "m")
    got = streaming_sessionize(ray.data.from_arrow(t), "k", "ts", gap)
    batch = session_counts(ray.data.from_arrow(t), "k", "ts", gap)
    g = {(r["k"], r["n_sessions"]) for r in got.to_pylist()}
    b = {(r["k"], r["n_sessions"]) for r in batch.take_all()}
    assert g == b
    assert sum(1 for k, _ in g if k is None) == 1

    # a REAL key equal to the sentinel is fine when the column has no
    # NULLs (fill_null is then a no-op — review finding: the guard must
    # not reject inputs that sessionize correctly)
    lo = int(np.iinfo(np.int32).min)
    fine = pa.table({
        "k": pa.array([lo, 1] * 6, pa.int32()),
        "ts": tsa,
    })
    got2 = streaming_sessionize(ray.data.from_arrow(fine), "k", "ts", gap)
    batch2 = session_counts(ray.data.from_arrow(fine), "k", "ts", gap)
    assert {(r["k"], r["n_sessions"]) for r in got2.to_pylist()} == {
        (r["k"], r["n_sessions"]) for r in batch2.take_all()
    }

    # sentinel value AND real NULLs together is the genuine merge
    # hazard: raise loudly before the offending batch ships
    bad = pa.table({
        "k": pa.array([lo, 1, None, 1] * 3, pa.int32()),
        "ts": tsa,
    })
    with pytest.raises(ValueError, match="reserved NULL sentinel"):
        streaming_sessionize(ray.data.from_arrow(bad), "k", "ts", gap)


def test_pack_null_token_counts(ray_session):
    """A NULL token count packs as 0 instead of poisoning the prefix sum
    with INT64_MIN."""
    import ray.data

    from sapray.pack import pack_by_token_budget

    t = pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "n_tokens": pa.array([10, None, 10, 10, None, 10], pa.int64()),
    })
    out = pack_by_token_budget(
        ray.data.from_arrow(t), "doc_id", "n_tokens", budget=25
    )
    rows = sorted(out.take_all(), key=lambda r: r["doc_id"])
    assert [r["tok_before"] for r in rows] == [0, 10, 10, 20, 30, 30]
    assert all(r["tok_before"] >= 0 for r in rows)


def test_json_schema_pins_layout():
    """Extra JSON keys must not add columns when a schema is pinned."""
    from sapray.jsonx import parse_json_column

    schema = pa.schema([("a", pa.int64())])
    col = pa.array(['{"a": 1}', '{"a": 2, "extra": 9}'], pa.large_string())
    out = parse_json_column(col, schema=schema)
    assert out.schema.names == ["a"]
    assert out.column("a").to_pylist() == [1, 2]


def test_connected_components_null_edges(ray_session):
    """NULL edge endpoints are dropped — not astype'd to INT64_MIN and
    elected cluster minimum."""
    import ray.data

    from sapray.graph import connected_components

    t = pa.table({
        "a": pa.array([1, 3, None, 5], pa.int64()),
        "b": pa.array([2, 4, 1, None], pa.int64()),
    })
    out = connected_components(ray.data.from_arrow(t), num_partitions=2)
    labels = {r["node"]: r["cluster_id"] for r in out.take_all()}
    assert labels == {1: 1, 2: 1, 3: 3, 4: 3}


def test_chain_edges_null_ids(ray_session):
    import ray.data

    from sapray.graph import chain_edges

    t = pa.table({
        "k": pa.array(["x", "x", "x", "y"], pa.string()),
        "doc_id": pa.array([1, None, 2, 9], pa.int64()),
    })
    out = chain_edges(ray.data.from_arrow(t), "k", "doc_id", num_partitions=2)
    assert {(r["a"], r["b"]) for r in out.take_all()} == {(1, 2)}


def test_state_sha_counts_multiplicity():
    """A row duplicated an even number of times must CHANGE the state
    sha (the old xor fold cancelled it to nothing)."""
    from sapray.hashing import table_state_sha

    one = pa.table({
        "repo": pa.array(["r"], pa.large_string()),
        "path": pa.array(["p"], pa.large_string()),
        "content_sha256": pa.array(["aa"], pa.string()),
    })
    tripled = pa.concat_tables([one, one, one])
    assert table_state_sha(one, ("repo", "path")) != table_state_sha(
        tripled, ("repo", "path")
    )
    # order independence preserved
    two = pa.table({
        "repo": pa.array(["r", "s"], pa.large_string()),
        "path": pa.array(["p", "q"], pa.large_string()),
        "content_sha256": pa.array(["aa", "bb"], pa.string()),
    })
    rev = two.take(pa.array([1, 0]))
    assert table_state_sha(two, ("repo", "path")) == table_state_sha(
        rev, ("repo", "path")
    )


def test_resize_bmp_top_down():
    """A negative-height (top-down) BMP must keep its orientation
    through resize, not flip."""
    import struct

    import numpy as np

    from sapray.multimodal import resize_bmp

    w, h = 4, 4
    row = ((3 * w + 3) // 4) * 4
    # distinct row colors, stored TOP-DOWN: row 0 = brightest
    body = np.zeros((h, row), np.uint8)
    for y in range(h):
        body[y, : 3 * w] = 250 - 60 * y
    data = body.tobytes()
    td = (b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
          + struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 24, 0, len(data),
                        2835, 2835, 0, 0) + data)
    # bottom-up twin with the same VISUAL content (rows reversed)
    bu = (b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
          + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                        2835, 2835, 0, 0) + body[::-1].tobytes())
    assert resize_bmp(td, 2, 2) == resize_bmp(bu, 2, 2)


def test_geo_null_json_and_geography_collection():
    from sapray.geo import extract_geospatial

    assert extract_geospatial("null") is None
    got = extract_geospatial({
        "type": "GeographyCollection", "dimension": "GEOGRAPHY",
        "geometries": [{"type": "Point", "coordinates": [1.0, 2.0]}],
    })
    assert got["type"] == "GeographyCollection"
    import pytest

    with pytest.raises(ValueError, match="unsupported geospatial"):
        extract_geospatial("[1, 2]")


def test_string_agg_large_string(ray_session):
    import ray.data

    from sapray.window import string_agg

    t = pa.table({
        "k": pa.array(["a", "a", "b"], pa.string()),
        "v": pa.array(["x", None, "y"], pa.large_string()),
        "o": pa.array([1, 2, 1], pa.int64()),
    })
    out = string_agg(ray.data.from_arrow(t), "k", "v", "o", num_partitions=2)
    got = {r["k"]: r["agg"] for r in out.take_all()}
    assert got == {"a": "x", "b": "y"}


def test_null_value_sums_vs_duckdb(ray_session):
    """NULL values must act as SQL SUM's skip-NULLs, not INT64_MIN."""
    import duckdb
    import ray.data

    from sapray.window import running_sum

    t = pa.table({
        "k": pa.array(["a"] * 5, pa.string()),
        "o": pa.array(range(5), pa.int64()),
        "v": pa.array([1, None, 10, None, 100], pa.int64()),
    })
    out = running_sum(
        ray.data.from_arrow(t), "k", "o", "o", "v", num_partitions=2
    ).to_pandas().sort_values("o")
    con = duckdb.connect(); con.register("t", t.to_pandas())
    exp = con.execute(
        "SELECT o, CAST(sum(v) OVER (PARTITION BY k ORDER BY o, o) AS BIGINT)"
        " AS rs FROM t ORDER BY o").fetch_df()
    # engine fills NULL as 0, SQL's running sum also skips them — values agree
    assert list(out.iloc[:, -1]) == list(exp["rs"])


def test_grouped_quantile_ignores_nulls(ray_session):
    import duckdb
    import ray.data

    from sapray.window import grouped_quantile

    t = pa.table({
        "k": pa.array(["a"] * 4 + ["b"] * 2, pa.string()),
        "v": pa.array([1, 2, 3, None, None, None], pa.int64()),
    })
    out = grouped_quantile(
        ray.data.from_arrow(t), "k", "v", 1.0, num_partitions=2
    ).to_pandas().set_index("k")["quantile"]
    con = duckdb.connect(); con.register("t", t.to_pandas())
    exp = con.execute(
        "SELECT k, quantile_disc(v, 1.0) AS q FROM t GROUP BY k"
    ).fetch_df().set_index("k")["q"]
    assert out["a"] == exp["a"] == 3
    assert pd_isna(out["b"]) and pd_isna(exp["b"])


def pd_isna(x):
    import pandas as pd

    return pd.isna(x)


def test_asof_join_null_keys_never_match(ray_session):
    import ray.data

    from sapray.window import asof_join

    left = pa.table({
        "k": pa.array([None, "a"], pa.string()),
        "t": pa.array([10, 10], pa.int64()),
        "lid": pa.array([1, 2], pa.int64()),
    })
    right = pa.table({
        "k": pa.array([None, "a"], pa.string()),
        "t": pa.array([5, 5], pa.int64()),
        "rv": pa.array([99, 7], pa.int64()),
    })
    out = asof_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        key="k", ts_column="t", num_partitions=2,
    )
    got = {r["lid"]: r["rv"] for r in out.take_all()}
    assert got == {1: None, 2: 7}


def test_null_text_stages():
    import pyarrow.compute as pc

    from sapray.text import ChunkDocs, LangId, RepetitionStats, word_ngrams

    batch = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([None, "the cat the cat"], pa.large_string()),
    })
    parent, grams = word_ngrams(batch, "text", 2)
    assert (parent == 1).all() and len(grams) == 3
    rs = RepetitionStats()(batch)
    assert rs.column("n_words").to_pylist()[0] == 1  # "" splits to [""]
    li = LangId()(batch)
    assert li.column("pred_lang").to_pylist()[0] == "und"
    # chunk-count boundary: a doc of exactly `size` chars is ONE chunk
    cd = ChunkDocs(size=8, overlap=2)
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array(["x" * 8], pa.string())})
    assert cd(t).num_rows == 1


def test_descending_key_int64_min():
    from sapray.window import _descending_key

    v = np.array([np.iinfo(np.int64).min, -5, 0, np.iinfo(np.int64).max],
                 np.int64)
    d = _descending_key(v)
    assert list(np.argsort(d, kind="stable")) == [3, 2, 1, 0]


def test_mean_with_nulls_vs_duckdb(ray_session):
    """AVG divides by the non-null count; all-NULL groups yield NULL."""
    import duckdb
    import ray.data

    from sapray.ops import grouped_aggregate

    t = pa.table({
        "k": pa.array(["a", "a", "a", "b"], pa.string()),
        "x": pa.array([10, None, 20, None], pa.int64()),
    })
    out = grouped_aggregate(
        ray.data.from_arrow(t), ["k"], {"avg_x": ("x", "mean")}
    ).to_pandas().set_index("k")["avg_x"]
    con = duckdb.connect(); con.register("t", t.to_pandas())
    exp = con.execute(
        "SELECT k, avg(x) AS avg_x FROM t GROUP BY k"
    ).fetch_df().set_index("k")["avg_x"]
    assert out["a"] == exp["a"] == 15.0
    assert pd_isna(out["b"]) and pd_isna(exp["b"])


def test_latest_by_key_part_column_and_null_seq(ray_session):
    import ray.data

    from sapray.ops import latest_by_key

    t = pa.table({
        "k": pa.array(["a", "a", "a"], pa.string()),
        "seq": pa.array([1, None, 2], pa.int64()),
        "part": pa.array([7, 7, 7], pa.int64()),  # caller's own column
    })
    out = latest_by_key(ray.data.from_arrow(t), ("k",), "seq",
                        num_partitions=2).take_all()
    assert len(out) == 1
    assert out[0]["seq"] == 2  # the NULL-seq row never wins
    assert out[0]["part"] == 7  # caller's column survives


def test_grouped_hll_all_null_group(ray_session):
    import ray.data

    from sapray.ops import grouped_hll_distinct

    t = pa.table({
        "g": pa.array(["a"] * 3 + ["b"] * 2, pa.string()),
        "v": pa.array([1, 2, 2, None, None], pa.int64()),
    })
    out = grouped_hll_distinct(
        ray.data.from_arrow(t), "g", ["v"], num_partitions=2
    ).to_pandas().set_index("g")["approx_distinct"]
    assert round(out["a"]) == 2
    assert out["b"] == 0.0  # group persists with COUNT(DISTINCT)=0


def test_minhash_band_divisibility(ray_session):
    import pytest
    import ray.data

    from sapray.dedup import minhash_lsh_candidates

    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array(["hello"], pa.large_string())})
    with pytest.raises(ValueError, match="divisible"):
        minhash_lsh_candidates(ray.data.from_arrow(t), num_perm=64, bands=12)


def test_write_partitioned_rejects_unknown_mode(ray_session, tmp_path):
    import pytest
    import ray.data

    from sapray.ops import write_partitioned

    ds = ray.data.from_arrow(pa.table({"x": pa.array([1])}))
    with pytest.raises(ValueError, match="mode"):
        write_partitioned(ds, str(tmp_path / "o"), mode="append")
