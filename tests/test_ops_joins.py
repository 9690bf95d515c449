"""Join-operator dtype fidelity + engine resume guards.

The shuffle join must preserve int/bool/timestamp dtypes exactly through
the keyed exchange — a null-padded pandas merge upcasts ints to float64
and mangles bools (round-1 VERDICT "What's wrong" #5).
"""

import json
import os

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from sapray import ops


def test_shuffle_join_dtype_roundtrip(ray_session):
    ts = pa.array(
        np.array(["2024-01-01T00:00:00", "2024-01-02T12:34:56", "2024-03-01T01:02:03"],
                 dtype="datetime64[us]")
    )
    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                  "big": pa.array([2**60, 2**60 + 1, 7], pa.int64()),
                  "flag": pa.array([True, False, True]),
                  "ts": ts})
    )
    right = ray.data.from_arrow(
        pa.table({"rk": pa.array([2, 3, 4], pa.int64()),
                  "w": pa.array([10, 20, 30], pa.int32())})
    )
    out = ops.shuffle_join(left, right, "k", "rk", how="outer", num_buckets=4)
    import ray as _ray

    blocks = [t for t in _ray.get(out.to_arrow_refs()) if t.num_rows]
    t = pa.concat_tables(blocks, promote_options="default")
    got = {f.name: f.type for f in t.schema}
    # ints stay ints (no float64 upcast), bools stay bools, ts stays ts
    assert got["big"] == pa.int64()
    assert pa.types.is_boolean(got["flag"])
    assert pa.types.is_timestamp(got["ts"])
    assert t.num_rows == 4  # keys 1,2,3 from left + unmatched 4 from right
    rows = {r["k"]: r for r in t.to_pylist()}
    assert rows[2]["w"] == 10 and rows[2]["big"] == 2**60 + 1
    # 2^53-adjacent exactness: a float64 round trip would corrupt this
    assert {r["big"] for r in rows.values() if r["big"] is not None} == {
        2**60, 2**60 + 1, 7,
    }


def test_broadcast_join_inner_matches(ray_session):
    big = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 1, 2, 5], pa.int64()),
                  "v": pa.array([10, 11, 20, 50], pa.int64())})
    )
    small = pa.table({"kk": pa.array([1, 2], pa.int64()),
                      "name": pa.array(["a", "b"])})
    out = ops.broadcast_join(big, small, "k", "kk").to_pandas()
    assert len(out) == 3
    assert set(out.columns) >= {"k", "v", "name"}
    assert sorted(out[out["k"] == 1]["v"]) == [10, 11]


def test_broadcast_cache_is_bounded(ray_session):
    ops._BROADCAST_CACHE.clear()
    import ray as _ray

    for i in range(ops._BROADCAST_CACHE_MAX + 3):
        ref = _ray.put(i)
        ops._cached_broadcast(ref, lambda x: x)
    assert len(ops._BROADCAST_CACHE) <= ops._BROADCAST_CACHE_MAX


def _fake_lake(tmp_path, num_partitions: int) -> str:
    lake = str(tmp_path / "lake")
    mdir = os.path.join(lake, "_manifests")
    os.makedirs(mdir)
    with open(os.path.join(mdir, "part-00000.json"), "w") as f:
        json.dump({"part": 0, "watermark": 10, "files": [],
                   "num_partitions": num_partitions}, f)
    return lake


def test_apply_refuses_amplification_onto_existing_lake(tmp_path):
    from sapray.config import CDCConfig
    from sapray.pipeline import CDCEngine

    lake = _fake_lake(tmp_path, 16)
    eng = CDCEngine(CDCConfig(lake_dir=lake, num_partitions=16, amplification=4))
    with pytest.raises(ValueError, match="amplification"):
        eng.apply("/nonexistent/changelog")


def test_apply_refuses_partition_count_mismatch(tmp_path):
    from sapray.config import CDCConfig
    from sapray.pipeline import CDCEngine

    lake = _fake_lake(tmp_path, 16)
    eng = CDCEngine(CDCConfig(lake_dir=lake, num_partitions=32))
    with pytest.raises(ValueError, match="num_partitions"):
        eng.apply("/nonexistent/changelog")


def test_asof_join_semantics(ray_session):
    from sapray.window import asof_join

    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 1, 1, 2], pa.int64()),
                  "t": pa.array([5, 7, 9, 3], pa.int64()),
                  "lv": pa.array([50, 70, 90, 30], pa.int64())})
    )
    right = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 1, 2], pa.int64()),
                  "t": pa.array([4, 7, 9], pa.int64()),
                  "w": pa.array([100, 101, 102], pa.int64())})
    )
    out = asof_join(left, right, key="k", ts_column="t", num_partitions=4)
    rows = {(r["k"], r["t"]): r["w"] for r in out.to_pandas().to_dict("records")}
    import pandas as pd

    assert rows[(1, 5)] == 100          # latest right t<=5 is t=4
    assert rows[(1, 7)] == 101          # equal ts included (<= semantics)
    assert rows[(1, 9)] == 101
    assert pd.isna(rows[(2, 3)])        # key 2 has no right row at/before t=3


def test_trailing_counts_overflow_fallback(ray_session):
    """Timestamps spanning ~2^61 us force the banded searchsorted to use
    the per-run fallback; counts must match the banded path's semantics."""
    from sapray.window import trailing_counts

    base = np.int64(0)
    far = np.int64(1) << 61
    ts = pa.array(
        np.array([base, base + 10**6, far, far + 10**6, far + 10**13],
                 dtype="datetime64[us]")
    )
    t = pa.table({"k": pa.array([1, 1, 2, 2, 2], pa.int64()),
                  "eid": pa.array([1, 2, 3, 4, 5], pa.int64()),
                  "ts": ts})
    out = trailing_counts(
        ray.data.from_arrow(t), "k", "ts", np.timedelta64(1, "h"), "eid",
        out_name="n", num_partitions=2,
    ).to_pandas()
    got = dict(zip(out["eid"], out["n"]))
    # within 1h: eid2 sees eid1 (+1s apart); eid4 sees eid3; eid5 is
    # ~115 days after eid4 -> alone
    assert got == {1: 1, 2: 2, 3: 1, 4: 2, 5: 1}


def test_trailing_counts_guard_survives_int64_wrap(ray_session):
    """5 keys x ~2^61-us span: the Python-int guard product (~1.15e19)
    exceeds 2^63, where np.int64 arithmetic would wrap NEGATIVE and
    silently take the banded path with non-monotonic bands (the round-2
    review finding) — the fallback must engage and count correctly."""
    from sapray.window import trailing_counts

    far = np.int64(1) << 61
    ts_vals, keys, eids = [], [], []
    for k in range(5):
        base = np.int64(k)  # keep per-key pairs 1s apart
        ts_vals += [base, base + 10**6]
        keys += [k, k]
        eids += [2 * k + 1, 2 * k + 2]
    ts_vals[-1] = far  # stretch the global span past 2^61
    t = pa.table({
        "k": pa.array(keys, pa.int64()),
        "eid": pa.array(eids, pa.int64()),
        "ts": pa.array(np.array(ts_vals, dtype="datetime64[us]")),
    })
    out = trailing_counts(
        ray.data.from_arrow(t), "k", "ts", np.timedelta64(1, "h"), "eid",
        out_name="n", num_partitions=1,
    ).to_pandas()
    got = dict(zip(out["eid"], out["n"]))
    expect = {2 * k + 1: 1 for k in range(5)} | {2 * k + 2: 2 for k in range(4)}
    expect[10] = 1  # key 4's second event was moved to `far` -> alone
    assert got == expect


def test_global_quantiles_ignore_nan(ray_session):
    """NaN values are not Arrow nulls; they must be excluded from the
    population count, not just the histogram (review finding: high-q
    ranks overflowed the cumulative histogram and crashed)."""
    vals = np.concatenate([np.arange(100, dtype=np.float64), [np.nan] * 50])
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals)}))
    got = ops.exact_global_quantiles(ds, "v", [0.0, 0.5, 0.99, 1.0])
    clean = np.sort(vals[~np.isnan(vals)])
    expect = [clean[int(np.floor(q * (len(clean) - 1)))] for q in (0.0, 0.5, 0.99, 1.0)]
    assert got == expect


def test_global_quantiles_skewed_column_never_collects(ray_session):
    """Heavy-tailed column (90% one value): the target bucket holds most
    of the dataset, so pass 2 must recurse the histogram / switch to
    per-value counts instead of collecting the bucket to the driver
    (VERDICT r2 finding #8). collect_cap=100 forces the recursion path
    at test scale."""
    rng = np.random.default_rng(7)
    vals = np.concatenate([
        np.full(9000, 42.5),
        rng.uniform(0.0, 100.0, 1000),
    ])
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals)}))
    qs = [0.0, 0.25, 0.5, 0.9, 0.95, 1.0]
    got = ops.exact_global_quantiles(ds, "v", qs, collect_cap=100)
    clean = np.sort(vals)
    expect = [float(clean[int(np.floor(q * (len(clean) - 1)))]) for q in qs]
    assert got == expect


def test_global_quantiles_skewed_int_column(ray_session):
    """Same skew guard on an integer column (duplicates force the
    float-resolution per-value-count endgame)."""
    vals = np.concatenate([
        np.full(5000, 7, dtype=np.int64),
        np.arange(1000, dtype=np.int64),
    ])
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals)}))
    qs = [0.1, 0.5, 0.99]
    got = ops.exact_global_quantiles(ds, "v", qs, collect_cap=50)
    clean = np.sort(vals)
    expect = [float(clean[int(np.floor(q * (len(clean) - 1)))]) for q in qs]
    assert got == expect


def test_broadcast_join_rejects_outer_modes(ray_session):
    ds = ray.data.from_arrow(pa.table({"k": pa.array([1], pa.int64())}))
    small = pa.table({"k": pa.array([1], pa.int64()), "v": pa.array(["a"])})
    for how in ("right", "outer"):
        with pytest.raises(ValueError, match="shuffle_join"):
            ops.broadcast_join(ds, small, "k", "k", how=how)


def test_rank_in_key_descending_timestamp(ray_session):
    """descending=True on a datetime64 order column (unary minus raises
    on datetime64 — review finding): top-1 most recent per key."""
    from sapray.window import rank_in_key

    ts = pa.array(np.array([0, 10**6, 5, 7], dtype="datetime64[us]"))
    t = pa.table({"k": pa.array([1, 1, 2, 2], pa.int64()),
                  "eid": pa.array([1, 2, 3, 4], pa.int64()), "ts": ts})
    out = rank_in_key(
        ray.data.from_arrow(t), "k", "ts", "eid", top_n=1, descending=True,
        num_partitions=2,
    ).to_pandas()
    assert sorted(out["eid"]) == [2, 4]


def test_semi_join_filter_accepts_none_keys(ray_session):
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 3], pa.int64())})
    )
    out = ops.semi_join_filter(ds, {None, 2, 3}, "k").to_pandas()
    assert sorted(out["k"]) == [2, 3]


def test_dedup_stages_handle_empty_blocks(ray_session):
    """Empty blocks flow through minhash/inverted-index stages without
    np.stack/np.concatenate crashes (review finding)."""
    from sapray import dedup

    full = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                     "text": pa.array(["abcdefghij", "abcdefghij"])})
    empty = full.slice(0, 0)
    ds = ray.data.from_arrow([full, empty])
    pairs = dedup.minhash_lsh_candidates(ds, concurrency=1).to_pandas()
    assert [(1, 2)] == list(zip(pairs["id_a"], pairs["id_b"]))
    # duplicate pairs across shingle partitions are contract (the verify
    # stage collapses them structurally); within a partition they're
    # collapsed by local_distinct
    pairs2 = dedup.ngram_inverted_candidates(ds).to_pandas()
    assert {(1, 2)} == set(zip(pairs2["id_a"], pairs2["id_b"]))


def test_bloom_prefilter_no_false_negatives(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data
    from sapray import ops

    members = np.arange(0, 4000, 2, dtype=np.int64)  # evens
    probe = np.arange(4001, dtype=np.int64)
    small = ray.data.from_arrow(pa.table({"k": pa.array(members)})).repartition(3)
    big = ray.data.from_arrow(pa.table({"k": pa.array(probe)})).repartition(3)
    ref, n_bits, k = ops.bloom_build(small, "k", n_bits_log2=16)
    out = ops.bloom_prefilter(big, "k", ref, n_bits, k).to_pandas()["k"].to_numpy()
    got = set(out.tolist())
    assert set(members.tolist()) <= got  # zero false negatives
    # false-positive rate on the 2001 odd non-members stays modest
    fp = len(got - set(members.tolist()))
    assert fp / 2001 < 0.1


def test_salted_join_exact_under_skew(ray_session):
    """One key owns 90% of the left side; the salted plan must still
    produce exactly the unsalted join's multiset (inner and left)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from sapray import ops

    rng = np.random.default_rng(7)
    n = 5000
    k = np.where(rng.random(n) < 0.9, 1, rng.integers(1, 50, size=n)).astype(np.int64)
    sub = np.arange(n, dtype=np.int64)  # varies within the hot key
    left = ray.data.from_arrow(
        pa.table({"k": pa.array(k), "sub": pa.array(sub)})
    ).repartition(4)
    # right misses some keys (exercises left-outer null padding)
    right = ray.data.from_arrow(
        pa.table(
            {"rk": pa.array(np.arange(1, 40, dtype=np.int64)),
             "name": pa.array([f"r{i}" for i in range(1, 40)])}
        )
    )

    def frame(ds):
        return (
            ds.to_pandas()
            .sort_values(["k", "sub"])
            .reset_index(drop=True)
        )

    for how in ("inner", "left"):
        salted = frame(ops.salted_join(left, right, "k", "rk", "sub",
                                       n_salt=8, how=how))
        plain = frame(ops.shuffle_join(left, right, "k", "rk", how=how))
        pd.testing.assert_frame_equal(
            salted[sorted(salted.columns)], plain[sorted(plain.columns)]
        )

    with pytest.raises(ValueError, match="salt replica"):
        ops.salted_join(left, right, "k", "rk", "sub", how="outer")


def test_profile_columns_all_null_column(ray_session):
    """An entirely-null column must still profile (n_distinct = 0), not
    vanish from the output."""
    import pyarrow as pa
    import ray.data
    from sapray import ops

    t = pa.table(
        {
            "a": pa.array([1, 2, 2, None], pa.int64()),
            "b": pa.array([None, None, None, None], pa.int64()),
        }
    )
    prof = ops.profile_columns(ray.data.from_arrow(t), ["a", "b"]).to_pandas()
    prof = prof.set_index("col_name")
    assert set(prof.index) == {"a", "b"}
    assert prof.loc["b", "n"] == 4
    assert prof.loc["b", "n_null"] == 4
    assert prof.loc["b", "n_distinct"] == 0
    assert prof.loc["a", "n_distinct"] == 2


def test_prefix_filtered_candidates_exact_recall(ray_session):
    """Prefix filtering (Bayardo et al. WWW'07) must emit EVERY pair with
    J >= t — including boundary cases where (1-t)*n is an integer and
    float rounding could shorten the safe prefix — over a corpus dense
    enough that the length/positional filters all engage."""
    from sapray import dedup
    from sapray.dedup import _shingle_hashes, ngram_jaccard

    rng = np.random.default_rng(7)
    words = ["alpha", "beta", "gamma", "delta", "epsi", "zeta"]
    texts = []
    for i in range(60):
        base = " ".join(rng.choice(words, size=rng.integers(8, 30)).tolist())
        texts.append(base)
        if i % 3 == 0:
            texts.append(base + " tail")  # near-dup partner
    ids = list(range(len(texts)))
    t = 0.8
    truth = set()
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            if ngram_jaccard(texts[a], texts[b], 5) >= t:
                truth.add((a, b))
    assert truth, "fixture must contain true near-dup pairs"

    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    empty = tbl.slice(0, 0)
    ds = ray.data.from_arrow([tbl, empty])
    cand = dedup.prefix_filtered_candidates(ds, threshold=t, num_partitions=4)
    got = set(zip(*[cand.to_pandas()[c].tolist() for c in ("id_a", "id_b")]))
    assert truth <= got, f"prefix filter lost true pairs: {sorted(truth - got)[:5]}"

    verified = dedup.ngram_jaccard_dedup(ds, threshold=t, num_partitions=4)
    vp = verified.to_pandas()
    assert truth == set(zip(vp["id_a"], vp["id_b"]))


def test_verify_bitset_and_lexsort_paths_agree(ray_session):
    """The dense-vocab bitset popcount path and the generic lexsort path
    of verify_pairs_jaccard must score identically."""
    from sapray import dedup

    rng = np.random.default_rng(11)
    texts = [
        "".join(rng.choice(list("abcdef "), size=rng.integers(30, 120)).tolist())
        for _ in range(40)
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(40), pa.int64()), "text": pa.array(texts)}
    )
    ia = rng.integers(0, 40, 200)
    ib = (ia + 1 + rng.integers(0, 39, 200)) % 40
    pairs = pa.table(
        {"id_a": pa.array(ia, pa.int64()), "id_b": pa.array(ib, pa.int64())}
    )
    docs = ray.data.from_arrow(tbl)
    pd_ds = ray.data.from_arrow(pairs)
    scored = {}
    for vocab_max in (1 << 16, 0):  # bitset path, then forced lexsort path
        out = dedup.verify_pairs_jaccard(
            pd_ds, docs, threshold=0.0, num_partitions=4,
            bitset_vocab_max=vocab_max,
        ).to_pandas()
        scored[vocab_max] = dict(
            zip(zip(out.id_a, out.id_b), out.jaccard)
        )
        # ground truth per pair
        for _, r in out.sample(n=min(50, len(out)), random_state=0).iterrows():
            expect = dedup.ngram_jaccard(texts[int(r.id_a)], texts[int(r.id_b)], 5)
            assert abs(r.jaccard - expect) < 1e-12
    assert scored[1 << 16] == scored[0]


def test_heavy_hitters_exact_under_compression(ray_session):
    """Misra-Gries pass-1 must compress (distinct keys >> capacity per
    batch) and the exact second pass must still return precisely the
    keys at/above the threshold with exact counts."""
    from sapray import ops

    rng = np.random.default_rng(3)
    # 20_000 rows: 3 heavy keys (~8% each), the rest spread over 5_000
    # rare keys so every batch holds far more distinct keys than capacity
    heavy = np.repeat(np.array([1, 2, 3], np.int64), [1600, 1700, 1800])
    rare = rng.integers(1000, 6000, 20000 - len(heavy)).astype(np.int64)
    keys = np.concatenate([heavy, rare])
    rng.shuffle(keys)
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(keys)})
    ).repartition(8)
    out = ops.heavy_hitters(ds, ["k"], min_frac=0.05, capacity=64).to_pandas()
    got = dict(zip(out["k"], out["cnt"]))

    import collections
    true_counts = collections.Counter(keys.tolist())
    n = len(keys)
    expect = {k: c for k, c in true_counts.items() if c >= 0.05 * n}
    assert got == expect
    # threshold margin sanity: min_frac too tight for capacity must raise
    with pytest.raises(ValueError):
        ops.heavy_hitters(ds, ["k"], min_frac=0.01, capacity=64)


def test_heavy_hitters_counts_rows_of_fully_compressed_batches(ray_session):
    """A batch whose Misra-Gries summary compresses to nothing (all top
    counts tie, e.g. all-singleton batches) must still contribute its
    row count to N — otherwise the threshold min_frac*N is computed
    against an undercounted total and sub-threshold keys leak through
    (review finding)."""
    from sapray import ops

    blocks = []
    # 5 all-singleton blocks: 1000 distinct keys each, count 1 — the MG
    # summary at capacity 64 compresses these to nothing but a carrier
    for i in range(5):
        blocks.append(pa.table(
            {"k": pa.array(np.arange(i * 1000, (i + 1) * 1000) + 100, pa.int64())}
        ))
    # 5 blocks each holding key 7 a hundred times (true count 500)
    for _ in range(5):
        blocks.append(pa.table({"k": pa.array(np.full(100, 7, np.int64))}))
    ds = ray.data.from_arrow(blocks)
    n = 5 * 1000 + 5 * 100  # 5500
    # key 7: 500/5500 = 9.09% — above 5%, must be found with exact count
    out = ops.heavy_hitters(ds, ["k"], min_frac=0.05, capacity=64).to_pandas()
    assert dict(zip(out["k"], out["cnt"])) == {7: 500}
    # 9.1%: above 500/5500 only if N were undercounted to ~5*100+fringe;
    # with N=5500 the threshold is 500.5 > 500 — key 7 must NOT appear
    out2 = ops.heavy_hitters(ds, ["k"], min_frac=0.091, capacity=64).to_pandas()
    assert len(out2) == 0


def test_heavy_hitters_weighted_exact(ray_session):
    """Weighted mode: keys carrying >= min_frac of TOTAL WEIGHT, exact
    sums, with compression engaged; negative weights are rejected."""
    from sapray import ops

    rng = np.random.default_rng(5)
    keys = rng.integers(0, 3000, 20000).astype(np.int64)
    w = rng.integers(1, 50, 20000).astype(np.int64)
    # one key carries a huge weight in few rows — weighted-heavy but
    # count-light (the case counts cannot find)
    keys[:10] = 77777
    w[:10] = 20000
    ds = ray.data.from_arrow(pa.table({"k": pa.array(keys), "w": pa.array(w)})
                             ).repartition(5)
    total = int(w.sum())
    out = ops.heavy_hitters(ds, ["k"], min_frac=0.05, capacity=64,
                            weight_column="w").to_pandas()
    sums: dict[int, int] = {}
    for k, wi in zip(keys.tolist(), w.tolist()):
        sums[k] = sums.get(k, 0) + wi
    expect = {k: s for k, s in sums.items() if s >= 0.05 * total}
    assert 77777 in expect
    assert dict(zip(out["k"], out["wsum"])) == expect

    bad = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2], pa.int64()),
                  "w": pa.array([5, -1], pa.int64())})
    )
    with pytest.raises(Exception, match="non-negative"):
        ops.heavy_hitters(bad, ["k"], min_frac=0.5, capacity=8,
                          weight_column="w").to_pandas()


def test_unnest_null_and_empty_lists(ray_session):
    """UNNEST semantics: null and empty lists emit no rows; positions
    are 1-based per row."""
    t = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "xs": pa.array([[10, 20], None, [], [30]], pa.list_(pa.int64())),
    })
    out = ops.unnest(ray.data.from_arrow(t), "xs", ["id"]).to_pandas()
    rows = sorted(zip(out["id"], out["pos"], out["val"]))
    assert rows == [(1, 1, 10), (1, 2, 20), (4, 1, 30)]


def test_apply_refuses_key_column_mismatch(tmp_path):
    from sapray.config import CDCConfig
    from sapray.pipeline import CDCEngine

    lake = str(tmp_path / "lake")
    mdir = os.path.join(lake, "_manifests")
    os.makedirs(mdir)
    with open(os.path.join(mdir, "part-00000.json"), "w") as f:
        json.dump({"part": 0, "watermark": 10, "files": [],
                   "num_partitions": 16, "key_columns": ["repo", "path"]}, f)
    eng = CDCEngine(CDCConfig(lake_dir=lake, num_partitions=16,
                              key_columns=("path", "repo")))
    with pytest.raises(ValueError, match="key_columns"):
        eng.apply("/nonexistent/changelog")


def test_cube_empty_input_and_validation(ray_session):
    """CUBE over empty input yields SQL's grand-total row (count 0,
    min NULL); non-key grouping-set columns are rejected."""
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.string()),
                      "v": pa.array([], pa.int64())})
    ds = ray.data.from_arrow(empty)
    out = ops.cube_aggregate(
        ds, ["a", "b"], {"n": (None, "count"), "mn": ("v", "min")}
    ).to_pandas()
    total = out[out["a"].isna() & out["b"].isna()]
    assert len(total) == 1
    import pandas as pd

    assert total["n"].iloc[0] == 0 and pd.isna(total["mn"].iloc[0])
    with pytest.raises(ValueError, match="non-key"):
        ops.grouping_sets_aggregate(ds, ["a"], [("v",)], {"n": (None, "count")})



def test_rank_functions_null_peer_group(ray_session):
    """NULL order values form one peer group (SQL DENSE_RANK), not one
    rank per NaN."""
    from sapray.window import rank_functions

    t = pa.table({
        "k": pa.array([1] * 5, pa.int64()),
        "v": pa.array([1.0, None, None, 2.0, None], pa.float64()),
        "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
    })
    out = rank_functions(
        ray.data.from_arrow(t), "k", "v", "id", ntile_k=2, num_partitions=2
    ).to_pandas().sort_values("id")
    got = dict(zip(out["id"], out["dense_rank"]))
    # ascending sort puts NaN last: values 1.0 -> 1, 2.0 -> 2, NULLs all 3
    assert got == {1: 1, 4: 2, 2: 3, 3: 3, 5: 3}


def test_weighted_sample_prefers_heavy_rows(ray_session):
    """A-ES weighted sampling: selection frequency tracks weights (one
    huge-weight row is always selected); non-positive weights rejected."""
    n = 2000
    w = np.ones(n, np.int64)
    w[7] = 1_000_000  # ~always selected at k=100
    ds = ray.data.from_arrow(
        pa.table({"id": pa.array(np.arange(n)), "w": pa.array(w)})
    ).repartition(4)
    out = ops.weighted_sample(ds, "w", k=100, id_column="id").to_pandas()
    assert len(out) == 100 and 7 in set(out["id"])
    bad = ray.data.from_arrow(pa.table({"id": pa.array([1], pa.int64()),
                                        "w": pa.array([0], pa.int64())}))
    with pytest.raises(Exception, match="positive"):
        ops.weighted_sample(bad, "w", k=1, id_column="id").to_pandas()


def test_string_agg_null_semantics(ray_session):
    """SQL string_agg semantics on nullable data: null VALUES are
    skipped (all-null group -> NULL), null KEYS form one group."""
    import pandas as pd

    from sapray.window import string_agg

    t = pa.table({
        "k": pa.array([1, 1, 1, 2, 2, None, None], pa.int64()),
        "v": pa.array(["a", None, "c", None, None, "x", "y"], pa.string()),
        "o": pa.array([1, 2, 3, 1, 2, 1, 2], pa.int64()),
    })
    out = string_agg(
        ray.data.from_arrow(t), "k", "v", "o", sep=",", num_partitions=2
    ).to_pandas()
    by_key = {(None if pd.isna(r.k) else int(r.k)): r.agg
              for r in out.itertuples(index=False)}
    assert by_key[1] == "a,c"           # null value skipped
    assert pd.isna(by_key[2])           # all-null group -> NULL
    assert by_key[None] == "x,y"        # one NULL-key group, not two
    assert len(out) == 3


def test_set_ops_treat_null_keys_as_equal(ray_session):
    """SQL EXCEPT/INTERSECT match NULL keys across sides (NULLs compare
    equal in set ops). The raw dictionary-indices path gave NULL keys
    NaN codes that never matched (ADVICE r2 regression)."""
    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, None, None, 3], pa.int64()),
    }))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([2, None], pa.int64()),
    }))
    # NULL intersects NULL; 2 intersects 2
    vals = ops.intersect_distinct(left, right, ["k"], num_partitions=2).to_pandas()["k"]
    assert vals.isna().sum() == 1
    assert set(vals.dropna().astype(int)) == {2}
    exc = ops.except_distinct(left, right, ["k"], num_partitions=2).to_pandas()["k"]
    assert exc.isna().sum() == 0
    assert set(exc.dropna().astype(int)) == {1, 3}


def test_chain_edges_null_keys_form_one_group(ray_session):
    """PARTITION BY groups NULLs together: null-keyed rows must chain
    into edges like any other group (ADVICE r2 regression)."""
    from sapray.graph import chain_edges

    t = pa.table({
        "k": pa.array(["a", "a", None, None, None], pa.string()),
        "i": pa.array([1, 2, 10, 11, 12], pa.int64()),
    })
    out = chain_edges(
        ray.data.from_arrow(t), "k", "i", num_partitions=2
    ).to_pandas()
    edges = set(zip(out["a"].astype(int), out["b"].astype(int)))
    assert (1, 2) in edges
    assert (10, 11) in edges and (11, 12) in edges
    assert len(edges) == 3


def test_broadcast_join_rejects_key_name_collision(ray_session):
    """Renaming the small side's key onto an existing column would fail
    per-batch with an opaque ArrowInvalid; fail at plan time instead
    (ADVICE r2)."""
    ds = ray.data.from_arrow(pa.table({"k": pa.array([1], pa.int64())}))
    small = pa.table({
        "rk": pa.array([1], pa.int64()),
        "k": pa.array([9], pa.int64()),  # collides with left_on
    })
    with pytest.raises(ValueError, match="already has a column named"):
        ops.broadcast_join(ds, small, "k", "rk")


def test_global_rank_total_order(ray_session):
    """Sample-based range partitioning must reproduce ROW_NUMBER() OVER
    (ORDER BY v, id) exactly, duplicates and all."""
    rng = np.random.default_rng(3)
    v = rng.integers(0, 50, 500)  # heavy duplicates across partitions
    ids = rng.permutation(500)
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array(ids, pa.int64()), "v": pa.array(v, pa.int64()),
    }))
    out = ops.global_rank(ds, "v", "id", num_partitions=8).to_pandas()
    out = out.sort_values("rk").reset_index(drop=True)
    expect = sorted(zip(v, ids))
    assert list(out["rk"]) == list(range(1, 501))
    assert list(zip(out["v"], out["id"])) == expect


def test_global_rank_single_partition_fallback(ray_session):
    """All-identical values collapse the splitters; everything lands in
    one range partition and the result is still the exact total order."""
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array([3, 1, 2], pa.int64()),
        "v": pa.array([7, 7, 7], pa.int64()),
    }))
    out = ops.global_rank(ds, "v", "id", num_partitions=4).to_pandas()
    assert dict(zip(out["id"], out["rk"])) == {1: 1, 2: 2, 3: 3}


def test_quantile_cont_interpolates_exactly(ray_session):
    """PERCENTILE_CONT: both neighbor order statistics selected exactly,
    closed-form interpolation; dyadic q over ints is bit-exact vs numpy."""
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 10_000, 1001)
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals, pa.int64())}))
    qs = [0.0, 0.25, 0.5, 0.75, 1.0]
    got = ops.quantile_cont(ds, "v", qs)
    expect = [float(np.quantile(vals, q, method="linear")) for q in qs]
    assert got == expect


def test_quantile_cont_even_count_midpoint(ray_session):
    """n=4, q=0.5 lands between ranks 1 and 2 -> exact midpoint."""
    ds = ray.data.from_arrow(pa.table({"v": pa.array([10, 20, 31, 40], pa.int64())}))
    assert ops.quantile_cont(ds, "v", [0.5]) == [25.5]


def test_ivf_persisted_index_build_and_pruned_search(ray_session, tmp_path):
    """Persisted IVF: build writes centroids + cell-bucket-partitioned
    vectors; search probes nearest cells only and still finds the exact
    twin at rank 1."""
    from sapray import similarity

    rng = np.random.default_rng(5)
    n, d = 240, 8
    blob = rng.integers(0, 2, n)  # two far-apart blobs
    base = np.where(blob[:, None] == 0, 10.0, -10.0) * np.eye(d)[0]
    vecs = (base + rng.normal(0, 0.1, (n, d))).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
    })
    idx = str(tmp_path / "ivf")
    meta = similarity.build_ivf_index(
        ray.data.from_arrow(t), idx, n_cells=8, n_buckets=4, sample_size=n
    )
    assert meta["n_buckets"] == 4
    assert os.path.exists(os.path.join(idx, "centroids.parquet"))
    bucket_dirs = [
        p for p in os.listdir(os.path.join(idx, "vectors"))
        if p.startswith("bucket=")
    ]
    assert len(bucket_dirs) >= 2  # really partitioned
    # query = clone of vec 7 under a new id: its twin must be rank 1
    q = pa.table({
        "vec_id": pa.array([10_007], pa.int64()),
        "embedding": pa.array([vecs[7]], pa.list_(pa.float32())),
    })
    out = similarity.ivf_index_topk(idx, q, k=3, nprobe=2).to_pandas()
    r1 = out[out["rank"] == 1]
    assert list(r1["query_id"]) == [10_007]
    assert list(r1["neighbor_id"]) == [7]


def test_global_rank_nulls_last(ray_session):
    """NULL values rank last (SQL NULLS LAST), tie-broken by id."""
    import duckdb

    t = pa.table({
        "id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "v": pa.array([10, None, 5, None, 10, 1], pa.int64()),
    })
    got = ops.global_rank(
        ray.data.from_arrow(t), "v", "id", num_partitions=3
    ).to_pandas().sort_values("id")
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    exp = con.execute(
        "SELECT id, row_number() OVER (ORDER BY v NULLS LAST, id) AS rk "
        "FROM t ORDER BY id"
    ).fetch_df()
    assert list(got["rk"]) == list(exp["rk"])


def test_grouped_quantile_cont_ignores_nulls(ray_session):
    """SQL quantile_cont ignores NULLs; an all-null group still appears
    with a NULL quantile (review finding: NaN sorted into the selection
    and shifted ranks)."""
    from sapray import window

    t = pa.table({
        "k": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "v": pa.array([10, None, 20, None, None], pa.int64()),
    })
    out = window.grouped_quantile_cont(
        ray.data.from_arrow(t), "k", "v", 0.5, out_name="m", num_partitions=2
    ).to_pandas().set_index("k")["m"]
    assert out[1] == 15.0  # DuckDB: quantile_cont ignores the NULL
    assert np.isnan(out[2])  # all-null group -> NULL, group still present


def test_rows_window_sum_null_values(ray_session):
    """SUM over a ROWS frame skips NULLs; an all-NULL frame is NULL (a
    raw astype turned NaN into INT64_MIN and poisoned later frames —
    review finding)."""
    from sapray import window

    t = pa.table({
        "k": pa.array([1, 1, 1, 2], pa.int64()),
        "o": pa.array([1, 2, 3, 1], pa.int64()),
        "i": pa.array([1, 2, 3, 4], pa.int64()),
        "v": pa.array([5, None, 7, None], pa.int64()),
    })
    out = window.rows_window_sum(
        ray.data.from_arrow(t), "k", "o", "i", "v", preceding=1,
        out_name="s", num_partitions=2,
    ).to_pandas().set_index("i")["s"]
    assert out[1] == 5       # frame [5]
    assert out[2] == 5       # frame [5, NULL] -> 5
    assert out[3] == 7       # frame [NULL, 7] -> 7
    assert np.isnan(out[4])  # frame [NULL] -> NULL
    with pytest.raises(ValueError, match="preceding"):
        window.rows_window_sum(
            ray.data.from_arrow(t), "k", "o", "i", "v", preceding=-1
        )
    with pytest.raises(ValueError, match="following"):
        window.rows_window_sum(
            ray.data.from_arrow(t), "k", "o", "i", "v", preceding=1,
            following=-1,
        )


def test_rows_window_sum_following_vs_duckdb(ray_session):
    """Centered / forward ROWS frames (following > 0) match DuckDB over
    randomized ragged partitions with NULL values."""
    import duckdb

    from sapray import window

    rng = np.random.default_rng(7)
    n = 400
    t = pa.table({
        "k": pa.array(rng.integers(0, 12, n), pa.int64()),
        "o": pa.array(rng.integers(0, 40, n), pa.int64()),
        "i": pa.array(np.arange(n), pa.int64()),
        "v": pa.array(
            [None if rng.random() < 0.15 else int(x)
             for x in rng.integers(-50, 50, n)],
            pa.int64(),
        ),
    })
    for prec, foll in ((3, 3), (0, 2), (2, 0), (5, 1)):
        got = window.rows_window_sum(
            ray.data.from_arrow(t), "k", "o", "i", "v",
            preceding=prec, following=foll, out_name="s",
            num_partitions=3,
        ).to_pandas().sort_values("i")["s"].reset_index(drop=True)
        con = duckdb.connect()
        con.register("t", t)
        want = con.sql(f"""
            SELECT i, sum(v) OVER (
              PARTITION BY k ORDER BY o, i
              ROWS BETWEEN {prec} PRECEDING AND {foll} FOLLOWING
            ) AS s FROM t ORDER BY i
        """).df()["s"]
        assert ((got == want) | (got.isna() & want.isna())).all(), (
            prec, foll,
        )


def test_unpivot_rejects_collisions_and_empty(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array([1], pa.int64()), "a": pa.array([2], pa.int64()),
    }))
    with pytest.raises(ValueError, match="non-empty"):
        ops.unpivot(ds, ["id"], [])
    with pytest.raises(ValueError, match="collides"):
        ops.unpivot(ds, ["id"], ["a"], name_column="id")
    with pytest.raises(ValueError, match="collides"):
        ops.unpivot(ds, ["id"], ["a"], value_column="a")


def test_set_ops_all_bag_semantics_with_nulls(ray_session):
    """EXCEPT ALL / INTERSECT ALL multiplicities, NULL keys comparing
    equal like the DISTINCT variants."""
    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 1, 1, 2, None, None], pa.int64()),
    }))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([1, None, 3], pa.int64()),
    }))
    exc = ops.except_all(left, right, ["k"], num_partitions=2).to_pandas()["k"]
    # 1 appears 3-1=2 times, 2 once, NULL 2-1=1 time, 3 never (right-only)
    assert sorted(exc.dropna().astype(int).tolist()) == [1, 1, 2]
    assert int(exc.isna().sum()) == 1
    inter = ops.intersect_all(left, right, ["k"], num_partitions=2).to_pandas()["k"]
    # min(3,1)=1 copy of 1; min(2,1)=1 NULL; 2 and 3 absent
    assert sorted(inter.dropna().astype(int).tolist()) == [1]
    assert int(inter.isna().sum()) == 1


def test_set_ops_partial_null_composite_keys(ray_session):
    """(1, NULL) and (NULL, 1) are DISTINCT keys (SQL component-wise IS
    NOT DISTINCT FROM) — a composite-string encode collapsed every
    partial-NULL key to one code (review finding)."""
    left = ray.data.from_arrow(pa.table({
        "a": pa.array([1, None, 1], pa.int64()),
        "b": pa.array([None, 1, None], pa.int64()),
    }))
    right = ray.data.from_arrow(pa.table({
        "a": pa.array([None], pa.int64()),
        "b": pa.array([1], pa.int64()),
    }))
    # EXCEPT ALL: (1,NULL) x2 survive (right only has (NULL,1))
    exc = ops.except_all(left, right, ["a", "b"], num_partitions=2).to_pandas()
    assert len(exc) == 2
    assert exc["a"].tolist() == [1, 1] and exc["b"].isna().all()
    # INTERSECT ALL: exactly one (NULL,1)
    inter = ops.intersect_all(left, right, ["a", "b"], num_partitions=2).to_pandas()
    assert len(inter) == 1
    assert inter["a"].isna().all() and inter["b"].tolist() == [1]
    # DISTINCT variants agree
    exc_d = ops.except_distinct(left, right, ["a", "b"], num_partitions=2).to_pandas()
    assert len(exc_d) == 1 and exc_d["a"].tolist() == [1]
    int_d = ops.intersect_distinct(left, right, ["a", "b"], num_partitions=2).to_pandas()
    assert len(int_d) == 1 and int_d["b"].tolist() == [1]


def test_drop_empty_blocks_all_empty_keeps_schema(ray_session):
    """All-empty input must stay SCHEMA-FUL (a zero-column fallback
    recreates the pathological block shape — review finding)."""
    t = pa.table({"node": pa.array([], pa.int64()),
                  "cluster_id": pa.array([], pa.int64())})
    out = ops.drop_empty_blocks(ray.data.from_arrow(t))
    assert out.count() == 0
    assert set(out.schema().names) == {"node", "cluster_id"}


def test_rolling_quantile_disc_vs_duckdb(ray_session):
    """Moving quantile_disc over trailing ROWS frames matches DuckDB
    across q values and frame widths on ragged NULL-bearing partitions."""
    import duckdb

    from sapray import window

    rng = np.random.default_rng(11)
    n = 400
    t = pa.table({
        "k": pa.array(rng.integers(0, 10, n), pa.int64()),
        "o": pa.array(rng.integers(0, 50, n), pa.int64()),
        "i": pa.array(np.arange(n), pa.int64()),
        "v": pa.array(
            [None if rng.random() < 0.12 else int(x)
             for x in rng.integers(-100, 100, n)],
            pa.int64(),
        ),
    })
    con = duckdb.connect()
    con.register("t", t)
    for q, prec in ((0.5, 9), (0.25, 4), (0.9, 6), (1.0, 3)):
        got = window.rolling_quantile_disc(
            ray.data.from_arrow(t), "k", "o", "i", "v", q=q,
            preceding=prec, out_name="m", num_partitions=3,
        ).to_pandas().sort_values("i")["m"].reset_index(drop=True)
        want = con.sql(f"""
            SELECT i, quantile_disc(v, {q}) OVER (
              PARTITION BY k ORDER BY o, i
              ROWS BETWEEN {prec} PRECEDING AND CURRENT ROW
            ) AS m FROM t ORDER BY i
        """).df()["m"]
        assert ((got == want) | (got.isna() & want.isna())).all(), (q, prec)
    with pytest.raises(ValueError, match="q must"):
        window.rolling_quantile_disc(
            ray.data.from_arrow(t), "k", "o", "i", "v", q=0.0, preceding=1
        )


def test_running_distinct_vs_duckdb(ray_session):
    """Running COUNT(DISTINCT) matches DuckDB, including NULL values
    (never counted) and string value columns."""
    import duckdb

    from sapray import window

    rng = np.random.default_rng(13)
    n = 300
    vals = [None if rng.random() < 0.1 else f"t{rng.integers(0, 6)}"
            for _ in range(n)]
    t = pa.table({
        "k": pa.array(rng.integers(0, 8, n), pa.int64()),
        "o": pa.array(rng.integers(0, 60, n), pa.int64()),
        "i": pa.array(np.arange(n), pa.int64()),
        "v": pa.array(vals, pa.string()),
    })
    got = window.running_distinct(
        ray.data.from_arrow(t), "k", "o", "i", "v", out_name="c",
        num_partitions=3,
    ).to_pandas().sort_values("i")["c"].reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", t)
    want = con.sql("""
        SELECT i, count(DISTINCT v) OVER (
          PARTITION BY k ORDER BY o, i
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS c FROM t ORDER BY i
    """).df()["c"]
    assert (got == want).all()
