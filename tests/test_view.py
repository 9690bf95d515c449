"""Incremental materialized-view maintenance (sapray/view.py)."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from sapray.config import CDCConfig
from sapray.ops import grouped_aggregate
from sapray.pipeline import CDCEngine
from sapray.view import incremental_group_view

SPEC = {"n_files": (None, "count"), "total_bytes": ("__sz", "sum")}


def _prepare(ds):
    def add_sz(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__sz", pc.cast(pc.utf8_length(b.column("content")), pa.int64())
        )

    return ds.map_batches(add_sz, batch_format="pyarrow")


def _full_view(eng) -> dict:
    t = grouped_aggregate(_prepare(eng.state_dataset()), ["repo"], SPEC).to_pandas()
    return {
        r["repo"]: (int(r["n_files"]), int(r["total_bytes"]))
        for _, r in t.iterrows()
    }


def _as_dict(view: pa.Table) -> dict:
    return {
        r["repo"]: (int(r["n_files"]), int(round(r["total_bytes"])))
        for r in view.to_pylist()
    }


def test_chained_refresh_matches_recompute(ray_session, changelog_dir, tmp_path):
    """Three commits; base view at w1, feed-only refreshes w1->w2->end.
    Each refresh must equal a from-scratch recompute, and the chained
    refresh must never re-aggregate state (partials are threaded)."""
    out, _ = changelog_dir
    stages = []
    for i, segs in enumerate((["v1"], ["v1", "v2"]), start=1):
        d = tmp_path / f"stage{i}"
        os.makedirs(d)
        for s in segs:
            shutil.copytree(os.path.join(out, s), d / s)
        stages.append(str(d))

    lake = str(tmp_path / "lake")
    eng = CDCEngine(
        CDCConfig(lake_dir=lake, num_partitions=8, sink_mode="delta", compact_every=99)
    )
    w1 = int(eng.apply(stages[0])["watermark"])
    w2 = int(eng.apply(stages[1])["watermark"])
    eng.apply(out)

    view2, partials2 = incremental_group_view(
        eng, "repo", SPEC, since=w1, until=w2, prepare=_prepare
    )
    # independent check of the intermediate view: recompute at w2
    t2 = grouped_aggregate(
        _prepare(eng.state_dataset(as_of=w2)), ["repo"], SPEC
    ).to_pandas()
    exp2 = {
        r["repo"]: (int(r["n_files"]), int(r["total_bytes"]))
        for _, r in t2.iterrows()
    }
    assert _as_dict(view2) == exp2

    # chained: advance w2 -> end from the returned partials; state is
    # touched only for pre-images inside the call
    view3, _ = incremental_group_view(
        eng, "repo", SPEC, since=w2, base_partials=partials2, prepare=_prepare
    )
    assert _as_dict(view3) == _full_view(eng)


def _write_micro_changelog(root: str) -> None:
    """Two-commit micro log where repo 'b' is fully deleted in commit 2."""
    from sapray.changelog import _events_chunk

    def chunk(seqs, ops, repos, paths, contents):
        return _events_chunk(
            np.array(repos, dtype=object),
            np.array(paths, dtype=object),
            np.array(["py"] * len(seqs), dtype=object),
            np.array(contents, dtype=object),
            np.array(seqs, dtype=np.int64),
            np.array(ops, dtype=object),
            schema_ver=2,
        )

    os.makedirs(os.path.join(root, "v1"))
    os.makedirs(os.path.join(root, "v2"))
    pq.write_table(
        chunk(
            [1, 2, 3],
            ["I", "I", "I"],
            ["a", "b", "b"],
            ["x.py", "y.py", "z.py"],
            ["aaaa", "bb", "cc"],
        ),
        os.path.join(root, "v1", "chunk-0.parquet"),
    )
    pq.write_table(
        chunk(
            [4, 5, 6],
            ["D", "D", "U"],
            ["b", "b", "a"],
            ["y.py", "z.py", "x.py"],
            [None, None, "aaaaaaaa"],
        ),
        os.path.join(root, "v2", "chunk-0.parquet"),
    )


def test_emptied_group_is_dropped(ray_session, tmp_path):
    """A repo whose files are all tombstoned in the refresh window must
    vanish from the view (not linger with zero counts)."""
    cl = str(tmp_path / "cl")
    os.makedirs(cl)
    _write_micro_changelog(cl)
    stage1 = str(tmp_path / "stage1")
    os.makedirs(stage1)
    shutil.copytree(os.path.join(cl, "v1"), os.path.join(stage1, "v1"))

    lake = str(tmp_path / "lake")
    eng = CDCEngine(
        CDCConfig(lake_dir=lake, num_partitions=4, sink_mode="delta", compact_every=99)
    )
    w1 = int(eng.apply(stage1)["watermark"])
    eng.apply(cl)

    view, _ = incremental_group_view(eng, "repo", SPEC, since=w1, prepare=_prepare)
    assert _as_dict(view) == {"a": (1, 8)}


def test_multi_commit_window_counts_each_key_once(ray_session, tmp_path):
    """Regression: a refresh window spanning several commits carries one
    post-image of the same key per touched commit; only the final one may
    be added (and exactly one retraction paired), else sums double-count."""
    from sapray.changelog import _events_chunk

    def chunk(seqs, ops, repos, paths, contents):
        return _events_chunk(
            np.array(repos, dtype=object),
            np.array(paths, dtype=object),
            np.array(["py"] * len(seqs), dtype=object),
            np.array(contents, dtype=object),
            np.array(seqs, dtype=np.int64),
            np.array(ops, dtype=object),
            schema_ver=2,
        )

    cl = str(tmp_path / "cl")
    for seg, rows in (
        ("v1", ([1, 2], ["I", "I"], ["a", "a"], ["x.py", "y.py"], ["aa", "bbbb"])),
        # x.py rewritten in BOTH later commits; y.py deleted then re-created
        ("v2", ([3, 4], ["U", "D"], ["a", "a"], ["x.py", "y.py"], ["cccccc", None])),
        ("v3", ([5, 6], ["U", "I"], ["a", "a"], ["x.py", "y.py"], ["d", "ee"])),
    ):
        os.makedirs(os.path.join(cl, seg))
        pq.write_table(chunk(*rows), os.path.join(cl, seg, "chunk-0.parquet"))

    stages = []
    for i, segs in enumerate((["v1"], ["v1", "v2"]), start=1):
        d = tmp_path / f"mstage{i}"
        os.makedirs(d)
        for s in segs:
            shutil.copytree(os.path.join(cl, s), d / s)
        stages.append(str(d))

    eng = CDCEngine(
        CDCConfig(
            lake_dir=str(tmp_path / "lake"),
            num_partitions=4,
            sink_mode="delta",
            compact_every=99,
        )
    )
    w1 = int(eng.apply(stages[0])["watermark"])
    eng.apply(stages[1])  # commit 2: v2 only (resume filters seq > w1)
    eng.apply(cl)  # commit 3: v3 — two commits inside one refresh window

    view, _ = incremental_group_view(eng, "repo", SPEC, since=w1, prepare=_prepare)
    # final state: x.py="d" (1 byte), y.py="ee" (2 bytes)
    assert _as_dict(view) == {"a": (2, 3)}


def test_unsupported_aggregate_refused(ray_session, changelog_dir, tmp_path):
    out, _ = changelog_dir
    lake = str(tmp_path / "lake")
    eng = CDCEngine(
        CDCConfig(lake_dir=lake, num_partitions=4, sink_mode="delta", compact_every=99)
    )
    eng.apply(out)
    with pytest.raises(ValueError, match="not incrementally maintainable"):
        incremental_group_view(
            eng, "repo", {"m": ("size_bytes", "max")}, since=0
        )


def _write_minmax_changelog(root: str) -> None:
    """Commit 1: repo 'a' holds the corpus max (len 10) and min (len 1);
    repo 'c' is untouched later. Commit 2 DELETES a's max row and
    UPDATES a's min row longer — both of a's extremes must be
    recomputed, while c's must survive from the base."""
    from sapray.changelog import _events_chunk

    def chunk(seqs, ops, repos, paths, contents):
        return _events_chunk(
            np.array(repos, dtype=object),
            np.array(paths, dtype=object),
            np.array(["py"] * len(seqs), dtype=object),
            np.array(contents, dtype=object),
            np.array(seqs, dtype=np.int64),
            np.array(ops, dtype=object),
            schema_ver=2,
        )

    os.makedirs(os.path.join(root, "v1"))
    os.makedirs(os.path.join(root, "v2"))
    pq.write_table(
        chunk(
            [1, 2, 3, 4],
            ["I", "I", "I", "I"],
            ["a", "a", "a", "c"],
            ["max.py", "min.py", "mid.py", "only.py"],
            ["x" * 10, "x", "xxx", "ccccc"],
        ),
        os.path.join(root, "v1", "chunk-0.parquet"),
    )
    pq.write_table(
        chunk(
            [5, 6],
            ["D", "U"],
            ["a", "a"],
            ["max.py", "min.py"],
            [None, "x" * 6],
        ),
        os.path.join(root, "v2", "chunk-0.parquet"),
    )


def test_minmax_view_recomputes_affected_groups(ray_session, tmp_path):
    """The classic MIN/MAX IVM bug: after the max row is deleted and the
    min row grows, a stale extreme would report (1, 10); the affected-
    group re-aggregation must yield a=(3, 6) while untouched repo c
    keeps its base (5, 5) without re-aggregation."""
    cl = str(tmp_path / "cl")
    os.makedirs(cl)
    _write_minmax_changelog(cl)
    stage1 = str(tmp_path / "stage1")
    os.makedirs(stage1)
    shutil.copytree(os.path.join(cl, "v1"), os.path.join(stage1, "v1"))

    lake = str(tmp_path / "lake")
    eng = CDCEngine(
        CDCConfig(lake_dir=lake, num_partitions=4, sink_mode="delta", compact_every=99)
    )
    w1 = int(eng.apply(stage1)["watermark"])
    eng.apply(cl)

    view, _ = incremental_group_view(
        eng, "repo", {"n_files": (None, "count")}, since=w1, prepare=_prepare,
        minmax={"min_bytes": ("__sz", "min"), "max_bytes": ("__sz", "max")},
    )
    got = {
        r["repo"]: (int(r["n_files"]), int(r["min_bytes"]), int(r["max_bytes"]))
        for r in view.to_pylist()
    }
    assert got == {"a": (2, 3, 6), "c": (1, 5, 5)}


class _StubEng:
    """Minimal engine facade for exercising view logic directly."""

    def __init__(self, old: pa.Table, new: pa.Table, feed: pa.Table):
        self._old, self._new, self._feed = old, new, feed

        class Cfg:
            key_columns = ("path",)
            seq_column = "seq"

        self.cfg = Cfg()

    def changes_table(self, since, until=None):
        return self._feed

    def state_dataset(self, as_of=None):
        import ray

        return ray.data.from_arrow(self._old if as_of is not None else self._new)


def test_mean_sum_over_nullable_column(ray_session):
    """SQL AVG divides by the value column's NON-NULL count, and SUM over
    zero non-null values is NULL — a shared __n divisor silently deflated
    means over nullable columns (advisory finding), and an all-null sum
    partial (NaN) must not poison the merge arithmetic."""
    old = pa.table({
        "path": pa.array(["a", "b", "d"]),
        "g": pa.array(["x", "x", "y"]),
        "v": pa.array([10, None, None], pa.int64()),
    })
    # feed inserts path c into group x with a NULL value
    feed1 = pa.table({
        "path": pa.array(["c"]),
        "g": pa.array(["x"]),
        "v": pa.array([None], pa.int64()),
        "seq": pa.array([5], pa.int64()),
        "change_op": pa.array(["U"]),
    })
    new1 = pa.table({
        "path": pa.array(["a", "b", "d", "c"]),
        "g": pa.array(["x", "x", "y", "x"]),
        "v": pa.array([10, None, None, None], pa.int64()),
    })
    spec = {"n": (None, "count"), "sum_v": ("v", "sum"), "avg_v": ("v", "mean")}
    view1, partials = incremental_group_view(
        _StubEng(old, new1, feed1), "g", spec, since=1
    )
    got1 = {
        r["g"]: (r["n"], r["sum_v"], r["avg_v"]) for r in view1.to_pylist()
    }
    # x: 3 rows but ONE non-null value -> avg 10.0 (not 10/3); y all-null
    assert got1 == {"x": (3, 10, 10.0), "y": (1, None, None)}

    # chained refresh: the only non-null value in x is retracted to NULL
    feed2 = pa.table({
        "path": pa.array(["a"]),
        "g": pa.array(["x"]),
        "v": pa.array([None], pa.int64()),
        "seq": pa.array([6], pa.int64()),
        "change_op": pa.array(["U"]),
    })
    new2 = pa.table({
        "path": pa.array(["a", "b", "d", "c"]),
        "g": pa.array(["x", "x", "y", "x"]),
        "v": pa.array([None, None, None, None], pa.int64()),
    })
    view2, _ = incremental_group_view(
        _StubEng(new1, new2, feed2), "g", spec, since=2, base_partials=partials
    )
    got2 = {
        r["g"]: (r["n"], r["sum_v"], r["avg_v"]) for r in view2.to_pylist()
    }
    assert got2 == {"x": (3, None, None), "y": (1, None, None)}


def test_minmax_view_null_group_key(ray_session):
    """A NULL group key must neither crash the affected-set broadcast
    (sorted() over None raises) nor keep a stale extreme — the null
    group routes through an explicit is_null branch (review finding)."""
    old = pa.table({
        "path": pa.array(["a", "b", "c"]),
        "g": pa.array([None, None, "py"], pa.string()),
        "sz": pa.array([9, 2, 3], pa.int64()),
    })
    # feed deletes path 'a' (the null group's max row)
    feed = pa.table({
        "path": pa.array(["a"]),
        "g": pa.array([None], pa.string()),
        "sz": pa.array([None], pa.int64()),
        "seq": pa.array([4], pa.int64()),
        "change_op": pa.array(["D"]),
    })
    new = pa.table({
        "path": pa.array(["b", "c"]),
        "g": pa.array([None, "py"], pa.string()),
        "sz": pa.array([2, 3], pa.int64()),
    })
    view, _ = incremental_group_view(
        _StubEng(old, new, feed), "g", {"n": (None, "count")}, since=1,
        minmax={"max_sz": ("sz", "max")},
    )
    got = {r["g"]: (int(r["n"]), int(r["max_sz"])) for r in view.to_pylist()}
    assert got == {None: (1, 2), "py": (1, 3)}


def test_finalize_int_sum_schema_stable_with_all_null_group():
    """Review finding: an all-null group must NOT flip an integer SUM
    column to float64 for the whole view — the same view would then
    return int64 on one refresh and float64 on the next (schema drift),
    and the driver's type-sensitive hash would mismatch DuckDB's
    SUM(BIGINT)::BIGINT. Nullable Int64 keeps the Arrow schema int64."""
    import pandas as pd

    from sapray.view import _finalize

    df = pd.DataFrame({
        "repo": ["a", "b"],
        "sum_v": [10, 0],
        "__vcnt_sum_v": [2, 0],  # group b: every input value was NULL
        "__n": [2, 1],
    })
    t = _finalize(df, {"sum_v": ("v", "sum")}, "repo")
    assert t.schema.field("sum_v").type == pa.int64()
    assert t.column("sum_v").to_pylist() == [10, None]
    # float sums keep their dtype and null the all-null group too
    dff = df.assign(sum_v=[10.5, 0.0])
    tf = _finalize(dff, {"sum_v": ("v", "sum")}, "repo")
    assert tf.schema.field("sum_v").type == pa.float64()
    assert tf.column("sum_v").to_pylist() == [10.5, None]


def test_stale_base_partials_raise_contract_error(
    ray_session, changelog_dir, tmp_path
):
    """Review finding: base_partials persisted by an older release
    (lacking the __vcnt_* valid-count columns AVG now carries) must be
    rejected with an actionable contract error, not a pandas KeyError
    deep inside the merge."""
    out, _ = changelog_dir
    lake = str(tmp_path / "lake")
    eng = CDCEngine(
        CDCConfig(lake_dir=lake, num_partitions=4, sink_mode="delta",
                  compact_every=99)
    )
    w1 = int(eng.apply(out)["watermark"])
    spec = {"avg_bytes": ("__sz", "mean")}
    _, partials = incremental_group_view(
        eng, "repo", spec, since=0, until=w1, prepare=_prepare
    )
    stale = partials.drop(
        columns=[c for c in partials.columns if c.startswith("__vcnt_")]
    )
    with pytest.raises(ValueError, match="missing partial columns"):
        incremental_group_view(
            eng, "repo", spec, since=w1, base_partials=stale,
            prepare=_prepare,
        )
