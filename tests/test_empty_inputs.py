"""Empty-input sweep over the wide-operator surface.

A pushdown filter that matches nothing hands every downstream operator
a dataset of empty-but-schema'd blocks — exactly the shape that crashed
``global_rank`` (NaN splitters from an empty sample; found by the
composed-query fuzz). SQL semantics on empty input are well-defined:
row-returning operators return ZERO rows (with their schema intact
where the engine materializes one), scalar aggregates return NULL/NaN,
counts return 0. Every operator here must satisfy that — never raise.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from sapray import ops


def _empty_events() -> pa.Table:
    return pa.table({
        "event_id": pa.array([], pa.int64()),
        "user_id": pa.array([], pa.int64()),
        "event_type": pa.array([], pa.string()),
        "value": pa.array([], pa.float64()),
        "ts": pa.array([], pa.timestamp("us")),
    })


@pytest.fixture()
def empty_ds(ray_session):
    return ray.data.from_arrow(_empty_events())


def _nrows(out) -> int:
    if isinstance(out, pa.Table):
        return out.num_rows
    return out.count()


SPEC = {"n": (None, "count"), "s": ("value", "sum")}


def test_order_and_rank_family_empty(empty_ds):
    assert _nrows(ops.topk(empty_ds, ["value"], [True], 5)) == 0
    assert _nrows(ops.order_by_slice(
        empty_ds, ["event_type", "value"], [False, True], offset=2, limit=5
    )) == 0
    assert _nrows(ops.global_rank(empty_ds, "value", "event_id")) == 0
    assert _nrows(ops.skip(empty_ds, "value", "event_id", offset=2, limit=3)) == 0
    assert _nrows(ops.skip(
        empty_ds, "value", "event_id", offset=0, limit=3, descending=True
    )) == 0


def test_aggregate_family_empty(empty_ds):
    assert _nrows(ops.grouped_aggregate(empty_ds, ["event_type"], SPEC)) == 0
    # the () grouping set yields ONE row even on empty input (DuckDB:
    # GROUP BY ROLLUP/CUBE over an empty table -> (NULL, ..., 0, NULL))
    for out in (
        ops.rollup_aggregate(empty_ds, ["event_type", "user_id"], SPEC),
        ops.cube_aggregate(empty_ds, ["event_type", "user_id"], SPEC),
        ops.grouping_sets_aggregate(
            empty_ds, ["event_type", "user_id"], [("event_type",), ()], SPEC
        ),
    ):
        rows = out.take_all()
        assert len(rows) == 1
        assert rows[0]["n"] == 0 and rows[0]["s"] is None
        assert rows[0]["event_type"] is None and rows[0]["user_id"] is None
    assert _nrows(ops.latest_by_key(empty_ds, ("user_id",), "event_id")) == 0
    assert _nrows(ops.distinct(empty_ds, ["event_type"])) == 0
    assert _nrows(ops.heavy_hitters(empty_ds, ["event_type"], 0.1)) == 0
    assert _nrows(ops.weighted_sample(empty_ds, "value", 5, "event_id")) == 0
    assert _nrows(ops.grouped_hll_distinct(empty_ds, "event_type", ["user_id"])) == 0
    assert ops.hll_distinct_count(empty_ds, ["user_id"]) == 0.0


def test_quantiles_empty(empty_ds):
    # quantile of an empty set is NULL in SQL; NaN/None both acceptable —
    # the contract is "no crash, one slot per requested q"
    got = ops.exact_global_quantiles(empty_ds, "value", [0.5, 0.9])
    assert len(got) == 2
    assert all(g is None or (isinstance(g, float) and np.isnan(g)) for g in got)
    got = ops.quantile_cont(empty_ds, "value", [0.5])
    assert len(got) == 1
    assert got[0] is None or np.isnan(got[0])


def test_reshape_and_set_ops_empty(empty_ds, ray_session):
    assert _nrows(ops.unpivot(
        empty_ds, ["event_id"], ["value", "user_id"],
        value_column="melted", value_type=pa.float64(),
    )) == 0
    nonempty = ray.data.from_arrow(pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([7, 8], pa.int64()),
        "event_type": pa.array(["a", "b"], pa.string()),
        "value": pa.array([1.0, 2.0], pa.float64()),
        "ts": pa.array([None, None], pa.timestamp("us")),
    }))
    assert _nrows(ops.except_distinct(empty_ds, nonempty, ["user_id"])) == 0
    # EXCEPT with an empty right side keeps the distinct left keys
    assert _nrows(ops.except_distinct(nonempty, empty_ds, ["user_id"])) == 2
    assert _nrows(ops.intersect_distinct(nonempty, empty_ds, ["user_id"])) == 0
    assert _nrows(ops.except_all(empty_ds, nonempty, ["user_id"])) == 0
    assert _nrows(ops.intersect_all(nonempty, empty_ds, ["user_id"])) == 0


def test_window_family_empty(empty_ds, ray_session):
    from sapray import window

    assert _nrows(window.rank_in_key(
        empty_ds, "user_id", "value", "event_id", top_n=3
    )) == 0
    assert _nrows(window.rank_in_key(
        empty_ds, ("user_id", "event_type"), "value", "event_id", top_n=3
    )) == 0
    assert _nrows(window.windowed_agg(
        empty_ds, "user_id", "ts",
        np.timedelta64(1, "h"), np.timedelta64(0, "s"), "event_id",
    )) == 0
    empty_right = ray.data.from_arrow(pa.table({
        "user_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "rv": pa.array([], pa.float64()),
    }))
    assert _nrows(window.asof_join(empty_ds, empty_right, "user_id", "ts")) == 0
    # a schema-less side (all-empty map_batches) fails actionably
    with pytest.raises(ValueError, match="schema"):
        window.asof_join(
            empty_ds,
            empty_right.map_batches(lambda b: b, batch_format="pyarrow"),
            "user_id", "ts",
        )


def test_joins_empty(empty_ds, ray_session):
    small = pa.table({
        "uid": pa.array([7], pa.int64()),
        "name": pa.array(["x"], pa.string()),
    })
    right = ray.data.from_arrow(small)
    assert _nrows(ops.broadcast_join(empty_ds, small, "user_id", "uid")) == 0
    assert _nrows(ops.shuffle_join(empty_ds, right, "user_id", "uid")) == 0
    empty_small = small.slice(0, 0)
    assert _nrows(ops.broadcast_join(empty_ds, empty_small, "user_id", "uid")) == 0


def _empty_docs() -> pa.Table:
    return pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.large_string()),
    })


def test_dedup_and_text_family_empty(ray_session):
    from sapray import dedup, pack, text

    docs = ray.data.from_arrow(_empty_docs())
    assert dedup.exact_dedup(docs).count() == 0
    assert dedup.minhash_lsh_candidates(docs, concurrency=2).count() == 0
    assert dedup.ngram_jaccard_dedup(docs).count() == 0
    assert dedup.paragraph_dedup_stats(docs).count() == 0
    assert text.analyze_documents(docs, concurrency=2).count() == 0
    toks = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "n_tokens": pa.array([], pa.int64()),
    }))
    assert pack.pack_by_token_budget(toks, "doc_id", "n_tokens", 512).count() == 0


def test_similarity_family_empty(ray_session):
    from sapray import similarity

    corpus = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float64())),
    }))
    qs = pa.table({
        "vec_id": pa.array([9], pa.int64()),
        "embedding": pa.array([np.ones(4)], pa.list_(pa.float64())),
    })
    # searching an EMPTY corpus yields no neighbors for any query
    assert similarity.brute_force_topk(corpus, qs, k=3).count() == 0
    from sapray import dedup

    assert dedup.embedding_neardup_pairs(corpus).count() == 0


def test_rollup_schemaless_empty_raises_actionable(ray_session):
    """Review finding: an all-empty pipeline that lost its schema (e.g.
    none-matching filter -> map_batches) must raise the actionable
    no-schema ValueError from rollup/grouping-sets, not AttributeError
    on None.names."""
    import pyarrow as pa
    import ray.data

    t = pa.table({"g": pa.array(["a"]), "v": pa.array([1], pa.int64())})
    ds = (
        ray.data.from_arrow(t)
        .filter(expr="v > 100")
        .map_batches(lambda b: b, batch_format="pyarrow")
    )
    assert ds.schema() is None
    spec = {"total": ("v", "sum")}
    with pytest.raises(ValueError, match="no schema"):
        ops.rollup_aggregate(ds, ["g"], spec)
    with pytest.raises(ValueError, match="no schema"):
        ops.grouping_sets_aggregate(ds, ["g"], [("g",), ()], spec)


def test_round5_new_ops_empty(ray_session):
    """Round-5 additions follow the same SQL empty-input contract:
    winnow / weighted median / bitwise fold / sweep-line emit zero rows;
    the KMV sketch emits its one summary row with the exact-count branch
    (n_seen = 0, est 0.0)."""
    from sapray import dedup, ops
    from sapray.window import grouped_weighted_median

    docs = ray.data.from_arrow(_empty_docs())
    assert dedup.winnow_fingerprint_rows(docs).count() == 0
    assert dedup.winnow_pairs(docs).count() == 0

    wm = ray.data.from_arrow(pa.table({
        "k": pa.array([], pa.int64()),
        "v": pa.array([], pa.int64()),
        "w": pa.array([], pa.int64()),
    }))
    assert grouped_weighted_median(
        wm, "k", "v", "w", num_partitions=2
    ).count() == 0

    kmv = ops.kmv_distinct_sketch(
        ray.data.from_arrow(pa.table({"x": pa.array([], pa.int64())})),
        "x", k=8,
    ).take_all()
    assert kmv == [
        {"k": 8, "n_seen": 0, "hk": 0, "est_distinct": 0.0}
    ]
