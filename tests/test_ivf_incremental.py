"""Incremental IVF index maintenance: search after update_ivf_index
equals a fresh rebuild over the post-update corpus (VERDICT r3 #8)."""

import numpy as np
import pyarrow as pa
import pytest

from sapray.similarity import build_ivf_index, ivf_index_topk, update_ivf_index

DIM = 8
N = 60


def _base_table() -> pa.Table:
    rng = np.random.default_rng(7)
    v = rng.standard_normal((N, DIM))
    return pa.table({
        "vec_id": pa.array(np.arange(N, dtype=np.int64)),
        "embedding": pa.array(list(v), pa.list_(pa.float64())),
    })


def _rows(ds):
    return sorted(
        ((r["query_id"], r["rank"], r["neighbor_id"]) for r in ds.take_all())
    )


@pytest.fixture()
def corpus(ray_session):
    return _base_table()


def _queries(vecs: np.ndarray, ids) -> pa.Table:
    return pa.table({
        "vec_id": pa.array(np.asarray(ids, np.int64)),
        "embedding": pa.array(list(vecs), pa.list_(pa.float64())),
    })


def test_incremental_update_equals_rebuild(corpus, tmp_path, ray_session):
    import ray.data

    rng = np.random.default_rng(11)
    new5 = rng.standard_normal(DIM)
    new100 = rng.standard_normal(DIM)
    feed = pa.table({
        "vec_id": pa.array([5, 100, 7], pa.int64()),
        "embedding": pa.array(
            [new5, new100, np.zeros(DIM)], pa.list_(pa.float64())
        ),
        "op": pa.array(["U", "U", "D"]),
    })

    inc_dir = str(tmp_path / "inc")
    build_ivf_index(
        ray.data.from_arrow(corpus), inc_dir, n_cells=8, sample_size=N
    )
    meta = update_ivf_index(inc_dir, feed, op_column="op")
    assert meta["epoch"] == 1

    # fresh rebuild over the post-update corpus
    base = corpus.to_pandas().set_index("vec_id")
    base.loc[5, "embedding"] = new5
    base = base.drop(index=7)
    base.loc[100] = [new100]
    post = pa.table({
        "vec_id": pa.array(base.index.to_numpy(np.int64)),
        "embedding": pa.array(list(base["embedding"]), pa.list_(pa.float64())),
    })
    full_dir = str(tmp_path / "full")
    build_ivf_index(
        ray.data.from_arrow(post), full_dir, n_cells=8, sample_size=N
    )

    # probe EVERY cell so both indexes score the same candidate set and
    # the comparison isolates the LWW/tombstone logic from centroid drift
    old5 = corpus.column("embedding")[5].as_py()
    qs = _queries(
        np.stack([new5, new100, np.asarray(old5)]), [900, 901, 902]
    )
    got = _rows(ivf_index_topk(inc_dir, qs, k=5, nprobe=8))
    want = _rows(ivf_index_topk(full_dir, qs, k=5, nprobe=8))
    assert got == want

    neighbors = {n for (_, _, n) in got}
    assert 7 not in neighbors          # tombstoned id never surfaces
    assert (900, 1, 5) in got         # upserted vector found at rank 1
    assert (901, 1, 100) in got       # brand-new id found at rank 1


def test_second_update_lww(corpus, tmp_path, ray_session):
    """An id upserted twice resolves to the LATEST epoch's vector."""
    import ray.data

    idx = str(tmp_path / "idx")
    build_ivf_index(ray.data.from_arrow(corpus), idx, n_cells=8, sample_size=N)
    rng = np.random.default_rng(3)
    v1, v2 = rng.standard_normal((2, DIM))
    update_ivf_index(idx, _queries(v1[None, :], [5]))
    meta = update_ivf_index(idx, _queries(v2[None, :], [5]))
    assert meta["epoch"] == 2

    got = _rows(ivf_index_topk(idx, _queries(np.stack([v2, v1]), [900, 901]),
                               k=3, nprobe=8))
    assert (900, 1, 5) in got          # latest vector wins...
    v1_top = [n for (q, r, n) in got if q == 901 and r == 1]
    assert v1_top != [5] or np.allclose(v1, v2)  # ...the overwritten one lost


def test_delete_only_update(corpus, tmp_path, ray_session):
    import ray.data

    idx = str(tmp_path / "idx")
    build_ivf_index(ray.data.from_arrow(corpus), idx, n_cells=8, sample_size=N)
    update_ivf_index(idx, delete_ids=[0, 1, 2])
    q = _queries(np.stack([corpus.column("embedding")[0].as_py()]), [900])
    got = _rows(ivf_index_topk(idx, q, k=5, nprobe=8))
    assert got and all(n not in (0, 1, 2) for (_, _, n) in got)


def test_same_feed_delete_then_reinsert_resurrects(corpus, tmp_path, ray_session):
    """An id with [D, U] rows in ONE feed must resolve by feed order
    (last row wins): the re-inserted vector stays searchable."""
    import ray.data

    idx = str(tmp_path / "idx")
    build_ivf_index(ray.data.from_arrow(corpus), idx, n_cells=8, sample_size=N)
    rng = np.random.default_rng(5)
    v = rng.standard_normal(DIM)
    feed = pa.table({
        "vec_id": pa.array([9, 9], pa.int64()),
        "embedding": pa.array([np.zeros(DIM), v], pa.list_(pa.float64())),
        "op": pa.array(["D", "U"]),
    })
    update_ivf_index(idx, feed, op_column="op")
    got = _rows(ivf_index_topk(idx, _queries(v[None, :], [900]), k=3, nprobe=8))
    assert (900, 1, 9) in got
    # and the dual: [U, D] tombstones
    idx2 = str(tmp_path / "idx2")
    build_ivf_index(ray.data.from_arrow(corpus), idx2, n_cells=8, sample_size=N)
    feed2 = pa.table({
        "vec_id": pa.array([9, 9], pa.int64()),
        "embedding": pa.array([v, np.zeros(DIM)], pa.list_(pa.float64())),
        "op": pa.array(["U", "D"]),
    })
    update_ivf_index(idx2, feed2, op_column="op")
    got2 = _rows(ivf_index_topk(idx2, _queries(v[None, :], [900]), k=3, nprobe=8))
    assert all(n != 9 for (_, _, n) in got2)


def test_compact_folds_deltas_and_log(corpus, tmp_path, ray_session):
    """After update -> compact: search is unchanged, the updates/ log is
    gone, and every bucket holds exactly ONE file (VERDICT r4 finding:
    unbounded delta/log growth)."""
    import glob
    import os

    import ray.data

    from sapray.similarity import compact_ivf_index

    idx = str(tmp_path / "idx")
    build_ivf_index(ray.data.from_arrow(corpus), idx, n_cells=8, sample_size=N)
    rng = np.random.default_rng(13)
    v5, v100 = rng.standard_normal((2, DIM))
    feed = pa.table({
        "vec_id": pa.array([5, 100, 7], pa.int64()),
        "embedding": pa.array(
            [v5, v100, np.zeros(DIM)], pa.list_(pa.float64())
        ),
        "op": pa.array(["U", "U", "D"]),
    })
    update_ivf_index(idx, feed, op_column="op")
    qs = _queries(np.stack([v5, v100]), [900, 901])
    before = _rows(ivf_index_topk(idx, qs, k=5, nprobe=8))

    compact_ivf_index(idx)
    assert not os.path.exists(os.path.join(idx, "updates"))
    for bdir in glob.glob(os.path.join(idx, "vectors", "bucket=*")):
        assert len(glob.glob(os.path.join(bdir, "*.parquet"))) == 1
    after = _rows(ivf_index_topk(idx, qs, k=5, nprobe=8))
    assert after == before
    assert all(n != 7 for (_, _, n) in after)  # tombstone stays dropped

    # a further incremental update on the compacted index still works
    v6 = rng.standard_normal(DIM)
    update_ivf_index(idx, _queries(v6[None, :], [6]))
    got = _rows(ivf_index_topk(idx, _queries(v6[None, :], [902]), k=3, nprobe=8))
    assert (902, 1, 6) in got


def test_crashed_update_is_invisible_and_retry_commits(
    corpus, tmp_path, ray_session, monkeypatch
):
    """The manifest epoch bump is the commit point (advisory finding): a
    crash after the delta/log writes but before the manifest replace must
    leave search showing the OLD state exactly — no duplicate copies, no
    un-tombstoned deletes — and a retry of the same feed commits
    idempotently over the partial files."""
    import ray.data

    import sapray.similarity as sim

    idx = str(tmp_path / "idx")
    build_ivf_index(ray.data.from_arrow(corpus), idx, n_cells=8, sample_size=N)
    rng = np.random.default_rng(17)
    v5 = rng.standard_normal(DIM)
    old5 = np.asarray(corpus.column("embedding")[5].as_py())
    feed = pa.table({
        "vec_id": pa.array([5, 7], pa.int64()),
        "embedding": pa.array([v5, np.zeros(DIM)], pa.list_(pa.float64())),
        "op": pa.array(["U", "D"]),
    })
    qs = _queries(np.stack([v5, old5]), [900, 901])
    before = _rows(ivf_index_topk(idx, qs, k=5, nprobe=8))

    real_write = sim._write_manifest

    def crash(*a, **kw):
        raise RuntimeError("simulated crash before manifest commit")

    monkeypatch.setattr(sim, "_write_manifest", crash)
    with pytest.raises(RuntimeError, match="simulated crash"):
        update_ivf_index(idx, feed, op_column="op")
    # uncommitted delta + log rows are invisible: old state exactly
    assert _rows(ivf_index_topk(idx, qs, k=5, nprobe=8)) == before

    monkeypatch.setattr(sim, "_write_manifest", real_write)
    meta = update_ivf_index(idx, feed, op_column="op")
    assert meta["epoch"] == 1  # retry recomputed the SAME epoch
    got = _rows(ivf_index_topk(idx, qs, k=5, nprobe=8))
    assert (900, 1, 5) in got
    assert all(n != 7 for (_, _, n) in got)


def test_leftover_compaction_staging_is_invisible(corpus, tmp_path, ray_session):
    """A crash mid-compaction leaves only the ``vectors.compacting``
    staging tree: search must be unaffected by it, and the next
    compaction must pre-clean and succeed."""
    import glob
    import os

    import pyarrow.parquet as pq
    import ray.data

    from sapray.similarity import compact_ivf_index

    idx = str(tmp_path / "idx")
    build_ivf_index(ray.data.from_arrow(corpus), idx, n_cells=8, sample_size=N)
    rng = np.random.default_rng(29)
    v = rng.standard_normal(DIM)
    update_ivf_index(idx, _queries(v[None, :], [5]))
    qs = _queries(v[None, :], [900])
    before = _rows(ivf_index_topk(idx, qs, k=3, nprobe=8))

    # simulate a crashed compaction: a partial staging tree with garbage
    stage = os.path.join(idx, "vectors.compacting", "bucket=0")
    os.makedirs(stage)
    pq.write_table(
        pa.table({"vec_id": pa.array([999999], pa.int64())}),
        os.path.join(stage, "base-9.parquet"),
    )
    assert _rows(ivf_index_topk(idx, qs, k=3, nprobe=8)) == before

    compact_ivf_index(idx)
    assert not os.path.exists(os.path.join(idx, "vectors.compacting"))
    assert _rows(ivf_index_topk(idx, qs, k=3, nprobe=8)) == before
    for bdir in glob.glob(os.path.join(idx, "vectors", "bucket=*")):
        assert len(glob.glob(os.path.join(bdir, "*.parquet"))) == 1


def test_compaction_crash_between_renames_self_heals(
    corpus, tmp_path, ray_session
):
    """A compaction crash BETWEEN the two commit renames leaves the live
    tree under ``vectors.old`` (rename-aside swap) — the next search,
    update, or compaction must restore it, never losing index data."""
    import os

    import ray.data

    from sapray.similarity import compact_ivf_index

    idx = str(tmp_path / "idx")
    build_ivf_index(ray.data.from_arrow(corpus), idx, n_cells=8, sample_size=N)
    rng = np.random.default_rng(31)
    v = rng.standard_normal(DIM)
    update_ivf_index(idx, _queries(v[None, :], [5]))
    qs = _queries(v[None, :], [900])
    before = _rows(ivf_index_topk(idx, qs, k=3, nprobe=8))

    # simulate the crash window: live tree renamed aside, staged tree gone
    vec = os.path.join(idx, "vectors")
    os.rename(vec, vec + ".old")
    assert not os.path.exists(vec)

    # search self-heals (would otherwise glob an empty tree)
    assert _rows(ivf_index_topk(idx, qs, k=3, nprobe=8)) == before
    assert os.path.exists(vec) and not os.path.exists(vec + ".old")

    # same crash again, recovered by update_ivf_index then compaction
    os.rename(vec, vec + ".old")
    update_ivf_index(idx, _queries(v[None, :] * 0.5, [6]))
    assert os.path.exists(vec)
    os.rename(vec, vec + ".old")
    compact_ivf_index(idx)
    assert os.path.exists(vec) and not os.path.exists(vec + ".old")
    got = _rows(ivf_index_topk(idx, qs, k=3, nprobe=8))
    assert (900, 1, 5) in got


def test_update_accepts_dataset_feed(corpus, tmp_path, ray_session):
    """A Ray Dataset change feed works (delta-size-guarded driver
    materialization), equal to passing the same rows as a Table."""
    import ray.data

    idx = str(tmp_path / "idx")
    build_ivf_index(ray.data.from_arrow(corpus), idx, n_cells=8, sample_size=N)
    rng = np.random.default_rng(23)
    v = rng.standard_normal(DIM)
    update_ivf_index(idx, ray.data.from_arrow(_queries(v[None, :], [5])))
    got = _rows(ivf_index_topk(idx, _queries(v[None, :], [900]), k=3, nprobe=8))
    assert (900, 1, 5) in got


def test_train_sample_spans_corpus(ray_session):
    """The training sample must include vectors from the corpus TAIL
    even when the input is a multi-block non-read dataset (the
    first-rows / prefix-truncation regressions)."""
    import ray.data

    from sapray.similarity import _train_sample

    head = pa.table({"embedding": pa.array(
        [[0.0, float(i)] for i in range(4000)], pa.list_(pa.float64()))})
    tail = pa.table({"embedding": pa.array(
        [[1.0, float(i)] for i in range(4000)], pa.list_(pa.float64()))})
    ds = ray.data.from_arrow(head).union(ray.data.from_arrow(tail))
    m = _train_sample(ds, "embedding", 100)
    assert len(m) <= 100
    assert (m[:, 0] == 0.0).any() and (m[:, 0] == 1.0).any()


def test_compact_skips_empty_bucket_dir(corpus, tmp_path, ray_session):
    """Review finding: a crashed update can leave an EMPTY bucket
    directory behind (_drop_uncommitted unlinks the uncommitted delta
    file but not the new directory it created); compaction must skip it
    — it holds no live rows — rather than crash on concat_tables([])."""
    import os

    import ray.data

    from sapray.similarity import compact_ivf_index

    idx = str(tmp_path / "idx")
    build_ivf_index(ray.data.from_arrow(corpus), idx, n_cells=8, sample_size=N)
    rng = np.random.default_rng(31)
    v = rng.standard_normal(DIM)
    update_ivf_index(idx, _queries(v[None, :], [5]))
    qs = _queries(v[None, :], [900])
    before = _rows(ivf_index_topk(idx, qs, k=3, nprobe=8))

    empty = os.path.join(idx, "vectors", "bucket=999")
    os.makedirs(empty)
    compact_ivf_index(idx)  # must not raise
    assert not os.path.exists(empty)  # empty bucket simply disappears
    assert _rows(ivf_index_topk(idx, qs, k=3, nprobe=8)) == before
