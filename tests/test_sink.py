"""Exactly-once sink unit tests (O-CDC6): idempotent commits, monotonic
watermarks, content-addressed snapshots, GC."""

import os

import pyarrow as pa

from sapray.sink import (
    commit_partition,
    gc_partition,
    lake_files,
    read_manifests,
    read_partition_state,
)


def _state(n=3):
    return pa.table(
        {
            "repo": pa.array([f"r{i}" for i in range(n)]),
            "path": pa.array([f"p{i}" for i in range(n)]),
            "content": pa.array(["x"] * n),
        }
    )


def test_commit_and_read_roundtrip(tmp_path):
    lake = str(tmp_path)
    m = commit_partition(lake, 3, _state(), watermark=10, state_sha="a" * 64)
    assert m["watermark"] == 10 and m["row_count"] == 3
    got = read_partition_state(lake, 3, read_manifests(lake)[3])
    assert got.num_rows == 3
    assert lake_files(lake) == [os.path.join(lake, "part=00003", m["files"][0])]


def test_retry_same_commit_is_idempotent(tmp_path):
    lake = str(tmp_path)
    m1 = commit_partition(lake, 0, _state(), 10, "a" * 64)
    m2 = commit_partition(lake, 0, _state(), 10, "a" * 64)  # speculative retry
    assert m1 == m2
    assert len(os.listdir(os.path.join(lake, "part=00000"))) == 1


def test_stale_retry_cannot_regress_watermark(tmp_path):
    lake = str(tmp_path)
    commit_partition(lake, 0, _state(5), 20, "b" * 64)
    stale = commit_partition(lake, 0, _state(2), 10, "c" * 64)  # late retry of old run
    assert stale["watermark"] == 20  # compare-and-keep returned the committed one
    assert read_manifests(lake)[0]["row_count"] == 5


def test_higher_watermark_replaces(tmp_path):
    lake = str(tmp_path)
    commit_partition(lake, 0, _state(2), 10, "a" * 64)
    commit_partition(lake, 0, _state(4), 30, "d" * 64)
    m = read_manifests(lake)[0]
    assert m["watermark"] == 30 and m["row_count"] == 4


def test_gc_removes_unreferenced_snapshots(tmp_path):
    lake = str(tmp_path)
    commit_partition(lake, 0, _state(2), 10, "a" * 64)
    commit_partition(lake, 0, _state(4), 30, "d" * 64)
    pdir = os.path.join(lake, "part=00000")
    assert len(os.listdir(pdir)) == 2
    assert gc_partition(lake, 0) == 1
    assert len(os.listdir(pdir)) == 1
    # committed state untouched
    assert read_partition_state(lake, 0, read_manifests(lake)[0]).num_rows == 4


def test_write_partitioned_layout(ray_session, tmp_path):
    """S10 generic sink: hive-partitioned dirs, re-readable, overwrite."""
    import os

    import pyarrow as pa
    import ray.data

    from sapray.ops import write_partitioned

    t = pa.table({"k": ["a", "a", "b"], "v": [1, 2, 3]})
    out = str(tmp_path / "out")
    write_partitioned(ray.data.from_arrow(t), out, partition_cols=["k"])
    subdirs = {d for d in os.listdir(out) if d.startswith("k=")}
    assert subdirs == {"k=a", "k=b"}
    back = ray.data.read_parquet(out).to_pandas()
    assert sorted(back["v"].tolist()) == [1, 2, 3]
    # overwrite replaces, error refuses
    write_partitioned(ray.data.from_arrow(t), out, partition_cols=["k"])
    import pytest as _pytest

    with _pytest.raises(FileExistsError):
        write_partitioned(ray.data.from_arrow(t), out, mode="error")


def test_cli_apply_compact_state(ray_session, changelog_dir, tmp_path):
    """The ray-job-submit surface: apply -> compact -> state via the CLI
    entry points (in-process; the session fixture owns Ray)."""
    import json

    from sapray import cli

    out, _ = changelog_dir
    lake = str(tmp_path / "cli_lake")
    rc = cli.main(
        ["apply", "--changelog", out, "--lake", lake, "--partitions", "8",
         "--sink-mode", "delta"]
    )
    assert rc == 0
    rc = cli.main(["compact", "--lake", lake])
    assert rc == 0
    from sapray.sink import read_manifests

    assert all(len(m["files"]) == 1 for m in read_manifests(lake).values())


def test_cli_lookup_finds_committed_key(ray_session, changelog_dir, tmp_path, capsys):
    """CLI point lookup: routes by the PERSISTED num_partitions (a
    default-config caller must not probe the wrong partition) and
    answers through the manifest zone maps."""
    import json

    from sapray import cli
    from sapray.config import CDCConfig
    from sapray.pipeline import CDCEngine

    out, _ = changelog_dir
    lake = str(tmp_path / "cli_lookup_lake")
    assert cli.main(
        ["apply", "--changelog", out, "--lake", lake, "--partitions", "8",
         "--sink-mode", "delta"]
    ) == 0
    state = CDCEngine(CDCConfig(lake_dir=lake, num_partitions=8)).state_table()
    repo = state.column("repo")[0].as_py()
    path = state.column("path")[0].as_py()
    capsys.readouterr()
    assert cli.main(["lookup", "--lake", lake, "--key", f"repo={repo},path={path}"]) == 0
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got["rows"] == 1 and got["sample"][0]["repo"] == repo
    assert cli.main(["lookup", "--lake", lake, "--key", "repo=__nope__,path=__nope__"]) == 0
    none = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert none["rows"] == 0
