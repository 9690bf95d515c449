"""End-to-end CDC replay correctness (SURVEY.md §5c/d).

The engine's replayed final table must match the pure-Python dict-replay
oracle on row set, per-row seq, and per-row ``content`` sha256
(BASELINE.json:15 invariant)."""

import hashlib

import pytest

from sapray.changelog import oracle_replay
from sapray.config import CDCConfig
from sapray.hashing import table_state_sha
from sapray.pipeline import CDCEngine


def _assert_state_matches_oracle(state, oracle):
    srows = {(r["repo"], r["path"]): r for r in state.to_pylist()}
    assert set(srows) == set(oracle)
    for k, r in oracle.items():
        s = srows[k]
        assert s["seq"] == r["seq"], k
        assert s["commit"] == r["commit"], k
        expected_sha = hashlib.sha256(r["content"].encode()).hexdigest()
        assert s["content_sha256"] == expected_sha, k
        assert hashlib.sha256(s["content"].encode()).hexdigest() == expected_sha, k


@pytest.fixture(scope="module", params=["broadcast", "shuffle"])
def applied(request, ray_session, changelog_dir, tmp_path_factory):
    out, meta = changelog_dir
    lake = str(tmp_path_factory.mktemp(f"lake_e2e_{request.param}"))
    eng = CDCEngine(
        CDCConfig(lake_dir=lake, num_partitions=16, winner_strategy=request.param)
    )
    summary = eng.apply(out)
    return eng, summary, out, meta


def test_final_state_matches_oracle(applied):
    eng, summary, out, _ = applied
    oracle = oracle_replay(out)
    state = eng.state_table()
    assert state.num_rows == len(oracle) == summary["final_rows"]
    _assert_state_matches_oracle(state, oracle)


def test_metrics_summary(applied):
    eng, summary, out, meta = applied
    assert summary["partitions"] == 16
    oracle = oracle_replay(out)
    assert summary["watermark"] >= max(r["seq"] for r in oracle.values())
    assert summary["n_candidates"] >= summary["final_rows"]


def test_reapply_is_idempotent(applied):
    """Replaying the same log over the committed lake is a no-op
    (watermark skip, O-CDC7/8)."""
    eng, _, out, _ = applied
    before = table_state_sha(eng.state_table(), ("repo", "path"))
    summary2 = eng.apply(out)
    after = table_state_sha(eng.state_table(), ("repo", "path"))
    assert before == after
    assert summary2["n_candidates"] == 0  # every event filtered by watermark


def test_hot_key_salting_active(ray_session, changelog_dir, tmp_path):
    """The generator makes one hot key (~20% of updates); detection must
    fire and the two-stage salted plan must still be exact."""
    from sapray.partition import detect_hot_key_hashes
    from sapray.pipeline import sample_events

    out, _ = changelog_dir
    cfg = CDCConfig(lake_dir=str(tmp_path / "lake"), num_partitions=8)
    hot = detect_hot_key_hashes(sample_events(out, cfg.hot_key_sample), cfg)
    assert len(hot) >= 1


def test_state_dataset_stream(applied):
    eng, summary, _, _ = applied
    ds = eng.state_dataset()
    assert ds.count() == summary["final_rows"]


def test_hash_key_value_deterministic_across_arrays():
    """Regression: pandas hash_array(categorize=True) — its default — is
    NOT value-deterministic; the same key must hash identically no matter
    what other rows share the batch (otherwise a key fans out over
    multiple partitions and LWW silently keeps multiple rows per key)."""
    import numpy as np
    import pyarrow as pa

    from sapray.hashing import hash_key

    key = ("org0/repo2", "src/dir10/file3234.md")
    rng = np.random.default_rng(7)
    expected = None
    for n in (1, 10, 1000, 40000):
        repos = [f"org{int(x)}/r{int(x)}" for x in rng.integers(0, 5000, n)] + [key[0]]
        paths = [f"p{int(x)}" for x in rng.integers(0, 5000, n)] + [key[1]]
        t = pa.table({"repo": repos, "path": paths})
        h = int(hash_key(t, ("repo", "path"))[-1])
        if expected is None:
            expected = h
        assert h == expected, f"hash varies with array context at n={n}"


def test_amplified_apply_scales_keyspace(ray_session, changelog_dir, tmp_path):
    """Row-multiplication proxy (10^10-scale bench path): amplification=3
    must yield exactly 3x the final keys, with replica 0 identical to the
    unamplified state."""
    import pyarrow.compute as pc

    out, _ = changelog_dir
    e1 = CDCEngine(CDCConfig(lake_dir=str(tmp_path / "l1"), num_partitions=8))
    s1 = e1.apply(out)
    e3 = CDCEngine(
        CDCConfig(lake_dir=str(tmp_path / "l3"), num_partitions=8, amplification=3)
    )
    s3 = e3.apply(out)
    assert s3["final_rows"] == 3 * s1["final_rows"]
    t3 = e3.state_table()
    replica0 = t3.filter(pc.invert(pc.match_substring(t3.column("path"), "~")))
    base = e1.state_table()
    key = lambda t: sorted(
        zip(t.column("path").to_pylist(), t.column("content_sha256").to_pylist())
    )
    assert key(replica0) == key(base)


def test_incompatible_segment_schema_rejected(ray_session, tmp_path):
    """A DDIC segment that changes a column to an incompatible type must
    fail schema unification with the reference's message shape (M20 /
    O-CDC3 reject path), before any data is applied."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from sapray.schema import SchemaCompatError

    cl = tmp_path / "badlog"
    os.makedirs(cl / "v1")
    os.makedirs(cl / "v2")
    base = {
        "seq": pa.array([1], pa.int64()), "op": pa.array(["I"]),
        "repo": pa.array(["r"]), "path": pa.array(["p"]),
        "commit": pa.array(["c"]), "content": pa.array(["x"]),
    }
    pq.write_table(pa.table(base), cl / "v1" / "part-0.parquet")
    bad = dict(base)
    bad["seq"] = pa.array(["not-an-int"])  # int64 -> string: not a widening
    pq.write_table(pa.table(bad), cl / "v2" / "part-0.parquet")

    from sapray.config import CDCConfig
    from sapray.pipeline import CDCEngine

    eng = CDCEngine(CDCConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4))
    with pytest.raises(SchemaCompatError, match="not compatible"):
        eng.apply(str(cl))
