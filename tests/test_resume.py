"""Checkpoint / resume correctness (O-CDC6/7; SURVEY.md §5d).

Incremental apply: replaying a *prefix* of the log (the v1 segment is a
seq-prefix by construction), then the full log, must land on exactly the
one-shot final state. Partial failure: wiping some partitions'
manifests and re-applying must rebuild only those partitions and match."""

import os
import shutil

import pytest

from sapray.changelog import oracle_replay
from sapray.config import CDCConfig
from sapray.hashing import table_state_sha
from sapray.pipeline import CDCEngine
from sapray.sink import read_manifests


@pytest.fixture()
def prefix_dir(changelog_dir, tmp_path):
    """A changelog dir containing only the v1 segment (a seq-prefix)."""
    out, _ = changelog_dir
    pref = tmp_path / "prefix"
    os.makedirs(pref)
    shutil.copytree(os.path.join(out, "v1"), pref / "v1")
    return str(pref)


def test_incremental_apply_then_full(ray_session, changelog_dir, prefix_dir, tmp_path):
    out, _ = changelog_dir
    lake = str(tmp_path / "lake")
    eng = CDCEngine(CDCConfig(lake_dir=lake, num_partitions=8))

    s1 = eng.apply(prefix_dir)  # checkpoint after the prefix
    assert s1["final_rows"] > 0
    wm1 = {p: m["watermark"] for p, m in read_manifests(lake).items()}

    s2 = eng.apply(out)  # resume with the full log — prefix events skipped
    wm2 = {p: m["watermark"] for p, m in read_manifests(lake).items()}
    assert all(wm2[p] >= wm1.get(p, -1) for p in wm2)  # monotonic watermarks

    oracle = oracle_replay(out)
    state = eng.state_table()
    assert state.num_rows == len(oracle)
    srows = {(r["repo"], r["path"]): r["content_sha256"] for r in state.to_pylist()}
    import hashlib

    for k, r in oracle.items():
        assert srows[k] == hashlib.sha256(r["content"].encode()).hexdigest()


def test_resume_after_partial_failure(ray_session, changelog_dir, tmp_path):
    """Simulate a crash where some partitions never committed: drop their
    manifests + data, re-run, expect the identical one-shot state."""
    out, _ = changelog_dir
    lake = str(tmp_path / "lake")
    eng = CDCEngine(CDCConfig(lake_dir=lake, num_partitions=8))
    eng.apply(out)
    full_sha = table_state_sha(eng.state_table(), ("repo", "path"))

    # wipe partitions 0-2 (manifest + snapshots) — as if they never ran
    for p in (0, 1, 2):
        shutil.rmtree(os.path.join(lake, f"part={p:05d}"), ignore_errors=True)
        mp = os.path.join(lake, "_manifests", f"part-{p:05d}.json")
        if os.path.exists(mp):
            os.remove(mp)

    s = eng.apply(out)  # resume: untouched partitions skip via watermark
    assert table_state_sha(eng.state_table(), ("repo", "path")) == full_sha
    per = s["per_partition"]
    rebuilt = set(per[per["n_candidates"] > 0]["part"]) if len(per) else set()
    assert rebuilt <= {0, 1, 2}
