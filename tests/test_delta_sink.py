"""Delta (write-optimized) sink mode: append-only winner deltas with
tombstones, merge-on-read, threshold compaction (O-CDC6 in LSM form)."""

import hashlib

import pyarrow as pa
import pytest

from sapray.changelog import oracle_replay
from sapray.config import CDCConfig
from sapray.pipeline import CDCEngine
from sapray.sink import merge_delta_states, read_manifests


def _assert_matches_oracle(state, oracle):
    srows = {(r["repo"], r["path"]): r for r in state.to_pylist()}
    assert set(srows) == set(oracle)
    for k, r in oracle.items():
        assert srows[k]["seq"] == r["seq"], k
        expected = hashlib.sha256(r["content"].encode()).hexdigest()
        assert srows[k]["content_sha256"] == expected, k


def test_delta_incremental_apply_matches_oracle(ray_session, changelog_dir, tmp_path):
    """Prefix apply -> full apply in delta mode must equal the one-shot
    oracle state, with the second apply appending (not rewriting)."""
    import os
    import shutil

    out, _ = changelog_dir
    pref = tmp_path / "prefix"
    os.makedirs(pref)
    shutil.copytree(os.path.join(out, "v1"), pref / "v1")

    lake = str(tmp_path / "lake")
    eng = CDCEngine(
        CDCConfig(lake_dir=lake, num_partitions=8, sink_mode="delta", compact_every=99)
    )
    s1 = eng.apply(str(pref))
    assert s1["n_upserts"] > 0
    files_after_1 = {p: m["files"] for p, m in read_manifests(lake).items()}
    assert all(len(fs) == 1 for fs in files_after_1.values())

    s2 = eng.apply(out)
    files_after_2 = {p: m["files"] for p, m in read_manifests(lake).items()}
    # second apply appended a delta on touched partitions
    assert any(len(fs) == 2 for fs in files_after_2.values())
    for p, fs in files_after_1.items():
        assert files_after_2[p][: len(fs)] == fs  # append-only

    _assert_matches_oracle(eng.state_table(), oracle_replay(out))
    assert eng.state_dataset().count() == eng.state_table().num_rows


def test_delta_compaction_folds_files(ray_session, changelog_dir, tmp_path):
    """With compact_every=2, the second apply folds each partition back
    to a single snapshot file — and the state is unchanged."""
    import os
    import shutil

    out, _ = changelog_dir
    pref = tmp_path / "prefix"
    os.makedirs(pref)
    shutil.copytree(os.path.join(out, "v1"), pref / "v1")

    lake = str(tmp_path / "lake")
    eng = CDCEngine(
        CDCConfig(lake_dir=lake, num_partitions=8, sink_mode="delta", compact_every=2)
    )
    eng.apply(str(pref))
    eng.apply(out)
    for p, m in read_manifests(lake).items():
        assert len(m["files"]) == 1, f"part {p} not compacted"
        assert m["files"][0].startswith("data-")  # snapshot, not delta
    _assert_matches_oracle(eng.state_table(), oracle_replay(out))


def test_delta_reapply_is_noop(ray_session, changelog_dir, tmp_path):
    out, _ = changelog_dir
    lake = str(tmp_path / "lake")
    eng = CDCEngine(CDCConfig(lake_dir=lake, num_partitions=8, sink_mode="delta"))
    eng.apply(out)
    before = {p: m["files"] for p, m in read_manifests(lake).items()}
    s2 = eng.apply(out)
    assert s2["n_candidates"] == 0
    assert {p: m["files"] for p, m in read_manifests(lake).items()} == before


def test_merge_delta_states_tombstones():
    base = pa.table(
        {
            "repo": ["r", "r"],
            "path": ["a", "b"],
            "seq": [1, 2],
            "content_sha256": ["s1", "s2"],
        }
    )
    delta = pa.table(
        {
            "repo": ["r", "r"],
            "path": ["a", "c"],
            "seq": [5, 6],
            "content_sha256": [None, "s6"],
            "is_delete": [True, False],
        }
    )
    merged = merge_delta_states([base, delta], ("repo", "path"), "seq")
    rows = {(r["repo"], r["path"]): r for r in merged.to_pylist()}
    assert set(rows) == {("r", "b"), ("r", "c")}  # 'a' tombstoned
    assert rows[("r", "c")]["seq"] == 6


def test_delta_mode_with_custom_key_columns(ray_session, changelog_dir, tmp_path):
    """Delta merge-on-read must honor a non-default key config (ADVICE
    round-1: read_partition_state used hardcoded ('repo','path')).
    Keying LWW on repo alone yields one row per repo — the max-seq
    non-delete event — and the merged delta reads must agree."""
    import duckdb
    import glob
    import os

    out, _ = changelog_dir
    lake = str(tmp_path / "lake_repo_key")
    eng = CDCEngine(
        CDCConfig(lake_dir=lake, num_partitions=4, sink_mode="delta",
                  compact_every=99, key_columns=("repo",))
    )
    eng.apply(out)
    state = eng.state_table()

    glob_pat = os.path.join(out, "v*", "*.parquet")
    oracle = duckdb.sql(f"""
      WITH ev AS (
        SELECT seq, op, repo FROM read_parquet('{glob_pat}', union_by_name=true)
      ), last AS (
        SELECT repo, max(seq) AS seq, arg_max(op, seq) AS last_op
        FROM ev GROUP BY repo
      )
      SELECT repo, seq FROM last WHERE last_op <> 'D'
    """).df()
    exp = dict(zip(oracle["repo"], oracle["seq"]))
    got = {r["repo"]: r["seq"] for r in state.select(["repo", "seq"]).to_pylist()}
    assert got == exp


def test_time_travel_reads_prior_commit(ray_session, changelog_dir, tmp_path):
    """as_of the first commit's watermark must reproduce the prefix-only
    oracle state: later updates revert, later tombstones un-delete."""
    import os
    import shutil

    out, _ = changelog_dir
    pref = tmp_path / "prefix"
    os.makedirs(pref)
    shutil.copytree(os.path.join(out, "v1"), pref / "v1")

    lake = str(tmp_path / "lake")
    eng = CDCEngine(
        CDCConfig(lake_dir=lake, num_partitions=8, sink_mode="delta", compact_every=99)
    )
    w1 = int(eng.apply(str(pref))["watermark"])
    eng.apply(out)

    _assert_matches_oracle(eng.state_table(as_of=w1), oracle_replay(str(pref)))
    assert eng.state_dataset(as_of=w1).count() == eng.state_table(as_of=w1).num_rows
    # as_of at/above the current watermark is just the current state
    _assert_matches_oracle(
        eng.state_table(as_of=1 << 60), oracle_replay(out)
    )


def _feed_as_delta(feed: pa.Table) -> pa.Table:
    """Change-feed rows back in delta-file form (is_delete flag)."""
    import pyarrow.compute as pc

    is_del = pc.equal(feed.column("change_op"), "D").combine_chunks()
    return feed.drop_columns(["change_op"]).append_column("is_delete", is_del)


def test_change_feed_reconstructs_state(ray_session, changelog_dir, tmp_path):
    """state(as_of=w1) LWW-merged with changes(w1 -> now) must equal the
    current state exactly — the defining property of a change feed."""
    import os
    import shutil

    out, _ = changelog_dir
    pref = tmp_path / "prefix"
    os.makedirs(pref)
    shutil.copytree(os.path.join(out, "v1"), pref / "v1")

    lake = str(tmp_path / "lake")
    eng = CDCEngine(
        CDCConfig(lake_dir=lake, num_partitions=8, sink_mode="delta", compact_every=99)
    )
    w1 = int(eng.apply(str(pref))["watermark"])
    eng.apply(out)

    feed = eng.changes_table(since=w1)
    assert feed.num_rows > 0
    assert set(feed.column("change_op").to_pylist()) <= {"U", "D"}
    # every feed row postdates the boundary
    assert min(feed.column("seq").to_pylist()) > w1
    reconstructed = merge_delta_states(
        [eng.state_table(as_of=w1), _feed_as_delta(feed)]
    )
    _assert_matches_oracle(reconstructed, oracle_replay(out))

    # until-bounded feed from the beginning == the first commit's state
    first = merge_delta_states([_feed_as_delta(eng.changes_table(until=w1))])
    _assert_matches_oracle(first, oracle_replay(str(pref)))

    # streaming read agrees with the table read
    assert eng.changes_dataset(since=w1).count() == feed.num_rows


def test_change_feed_guards(ray_session, changelog_dir, tmp_path):
    """Snapshot-mode lakes and compacted-away history must refuse."""
    out, _ = changelog_dir
    snap = str(tmp_path / "snap_lake")
    eng = CDCEngine(CDCConfig(lake_dir=snap, num_partitions=8))
    eng.apply(out)
    with pytest.raises(ValueError, match="no change history"):
        eng.changes_table()

    import os
    import shutil

    pref = tmp_path / "prefix"
    os.makedirs(pref)
    shutil.copytree(os.path.join(out, "v1"), pref / "v1")
    comp = str(tmp_path / "comp_lake")
    eng2 = CDCEngine(
        CDCConfig(lake_dir=comp, num_partitions=8, sink_mode="delta", compact_every=99)
    )
    eng2.apply(str(pref))
    eng2.apply(out)
    from sapray.sink import compact_partition

    for p in sorted(read_manifests(comp)):
        compact_partition(comp, p)
    with pytest.raises(ValueError, match="no change history|compacted"):
        eng2.changes_table(since=-1)

    # since >= the watermark is an EMPTY feed, not an error: nothing in the
    # requested (since, now] window was folded away by compaction/snapshot
    w = max(m["watermark"] for m in read_manifests(comp).values())
    assert eng2.changes_table(since=w).num_rows == 0
    w_snap = max(m["watermark"] for m in read_manifests(snap).values())
    assert eng.changes_table(since=w_snap).num_rows == 0


def test_time_travel_guards(ray_session, changelog_dir, tmp_path):
    """Snapshot-mode lakes and compacted-away history must refuse."""
    out, _ = changelog_dir

    snap = str(tmp_path / "snap_lake")
    eng = CDCEngine(CDCConfig(lake_dir=snap, num_partitions=8))
    eng.apply(out)
    with pytest.raises(ValueError, match="history"):
        eng.state_table(as_of=1)

    # compacted delta lake: history below the compaction floor is gone
    import os
    import shutil

    pref = tmp_path / "prefix"
    os.makedirs(pref)
    shutil.copytree(os.path.join(out, "v1"), pref / "v1")
    comp = str(tmp_path / "comp_lake")
    eng2 = CDCEngine(
        CDCConfig(lake_dir=comp, num_partitions=8, sink_mode="delta", compact_every=99)
    )
    w1 = int(eng2.apply(str(pref))["watermark"])
    eng2.apply(out)
    from sapray.sink import compact_partition

    for p in sorted(read_manifests(comp)):
        compact_partition(comp, p)
    with pytest.raises(ValueError, match="history"):
        eng2.state_table(as_of=w1)


def test_point_lookup_prunes_files_and_matches_state(ray_session, tmp_path):
    """Manifest zone maps: each delta commit records per-file key
    min/max; a point lookup opens only files whose range may contain the
    key and returns exactly the full-merge answer (including tombstoned
    and time-traveled keys)."""
    import numpy as np
    import pyarrow as pa

    from sapray.sink import (
        _prune_files, commit_partition_delta, read_manifest,
        read_partition_state,
    )

    lake = str(tmp_path / "lake")

    def delta(keys, seqs, deletes=None):
        n = len(keys)
        deletes = deletes or [False] * n
        return pa.table({
            "repo": pa.array([k[0] for k in keys]),
            "path": pa.array([k[1] for k in keys]),
            "commit": pa.array([f"c{s}" for s in seqs]),
            "seq": pa.array(seqs, pa.int64()),
            "content_sha256": pa.array([f"sha{s}" for s in seqs]),
            "is_delete": pa.array(deletes),
        })

    # three commits with disjoint repo RANGES (zone maps are min/max —
    # a file spanning [a, z] could never be pruned for any key between)
    commit_partition_delta(lake, 0, delta([("a", "x"), ("b", "y")], [1, 2]),
                           2, "s1", stats_columns=("repo", "path"))
    commit_partition_delta(lake, 0, delta([("m", "x"), ("a", "x")], [3, 4]),
                           4, "s2", stats_columns=("repo", "path"))
    commit_partition_delta(lake, 0, delta([("n", "x"), ("z", "x")], [5, 6]),
                           6, "s3", stats_columns=("repo", "path"))

    m = read_manifest(lake, 0)
    assert len(m["files"]) == 3 and len(m["stats"]) == 3
    # ("z","x") only fits file 3's [n, z]; files 1-2 are pruned
    kept = _prune_files(m, {"repo": "z", "path": "x"})
    assert len(kept) == 1 and f"w{6:016d}" in kept[0]
    # ("a","x") fits files 1 and 2, not file 3
    assert len(_prune_files(m, {"repo": "a", "path": "x"})) == 2

    got = read_partition_state(lake, 0, m, ("repo", "path"), "seq",
                               key_equals={"repo": "a", "path": "x"})
    assert got.num_rows == 1 and got.column("seq")[0].as_py() == 4
    got_z = read_partition_state(lake, 0, m, ("repo", "path"), "seq",
                                 key_equals={"repo": "z", "path": "x"})
    assert got_z.num_rows == 1 and got_z.column("seq")[0].as_py() == 6
    # key below every range: every file pruned -> None without a read
    assert read_partition_state(lake, 0, m, ("repo", "path"), "seq",
                                key_equals={"repo": "0", "path": "q"}) is None
    # time-travel composes with the point predicate: ("a","x") before
    # its seq-4 update reverts to the seq-1 value
    old = read_partition_state(lake, 0, m, ("repo", "path"), "seq", as_of=2,
                               key_equals={"repo": "a", "path": "x"})
    assert old.num_rows == 1 and old.column("seq")[0].as_py() == 1
