"""Change-log generator determinism + shape tests (FIXTURES.md §2)."""

import glob
import os

import pyarrow.parquet as pq

from sapray.changelog import generate_changelog, oracle_replay
from tests.conftest import SF_DIR


def test_deterministic_regeneration(tmp_path):
    a = generate_changelog(SF_DIR, str(tmp_path / "a"), n_updates=500, seed=7)
    b = generate_changelog(SF_DIR, str(tmp_path / "b"), n_updates=500, seed=7)
    assert a.n_events == b.n_events
    fa = sorted(glob.glob(str(tmp_path / "a" / "v*" / "*.parquet")))
    fb = sorted(glob.glob(str(tmp_path / "b" / "v*" / "*.parquet")))
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        assert pq.read_table(x).equals(pq.read_table(y))


def test_cached_meta_short_circuits(tmp_path):
    out = str(tmp_path / "c")
    a = generate_changelog(SF_DIR, out, n_updates=200)
    mtimes = {f: os.path.getmtime(f) for f in glob.glob(out + "/v*/*.parquet")}
    b = generate_changelog(SF_DIR, out, n_updates=200)
    assert b.n_events == a.n_events
    assert {f: os.path.getmtime(f) for f in glob.glob(out + "/v*/*.parquet")} == mtimes


def test_segment_schemas_evolve(changelog_dir):
    out, _ = changelog_dir
    s1 = pq.read_schema(sorted(glob.glob(out + "/v1/*.parquet"))[0])
    s2 = pq.read_schema(sorted(glob.glob(out + "/v2/*.parquet"))[0])
    s3 = pq.read_schema(sorted(glob.glob(out + "/v3/*.parquet"))[0])
    assert "size_bytes" not in s1.names
    assert str(s2.field("size_bytes").type) == "int32"
    assert str(s3.field("size_bytes").type) == "int64"


def test_event_stream_properties(changelog_dir):
    out, meta = changelog_dir
    tables = [pq.read_table(f) for f in sorted(glob.glob(out + "/v*/*.parquet"))]
    seqs = [s for t in tables for s in t.column("seq").to_pylist()]
    assert len(seqs) == meta.n_events
    # duplicates exist (O-CDC8 exercise) but each (key,seq) dup is identical
    assert len(set(seqs)) < len(seqs)
    ops = {o for t in tables for o in t.column("op").to_pylist()}
    assert ops == {"I", "U", "D"}


def test_oracle_replay_sanity(changelog_dir):
    out, meta = changelog_dir
    oracle = oracle_replay(out)
    assert 0 < len(oracle) <= meta.n_base
    # deleted keys are absent; survivors carry max-seq content
    for (repo, path), row in list(oracle.items())[:5]:
        assert row["op"] in ("I", "U") and row["content"] is not None
