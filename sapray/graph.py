"""Distributed connected components — duplicate-pair clustering.

Near-dup pipelines (MinHash/LSH, embedding LSH, n-gram Jaccard —
``sapray/dedup.py``) emit verified PAIRS; turning pairs into dedup
clusters (keep one representative per component) is a connected-
components problem. This module implements the **hash-to-min** BSP
algorithm (public knowledge: Rastogi et al., "Finding Connected
Components in MapReduce and Beyond"): every node carries a member set,
each round the set's minimum is broadcast to all members and the set is
shipped to the minimum. O(log n) rounds on paths; each round is ONE
keyed exchange (hash-partition on node) with a fully vectorized kernel —
no joins, no driver-side graph.

State is the pair list (v, u) meaning "u ∈ C(v)": linear in edges plus
one row per (cluster-min, member) — the latter IS the output. The
reference implements no graph operators (SURVEY.md §2.4); engine-added.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from sapray.window import _key_codes, _run_starts, partitioned_apply


def chain_edges(
    ds: ray.data.Dataset,
    key: str,
    id_column: str,
    num_partitions: int | None = None,
    out_a: str = "a",
    out_b: str = "b",
) -> ray.data.Dataset:
    """Edges between CONSECUTIVE ids sharing ``key`` (path per group).

    ``k`` same-key rows produce ``k-1`` edges instead of the
    ``k·(k-1)/2`` of all-pairs output — the degenerate-bucket-safe way
    to materialize an equivalence relation as a graph (same cap
    rationale as ``dedup._bucket_pairs``). One keyed exchange."""

    def kernel(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # a NULL id cannot join the graph — drop the row instead of
        # letting NaN poison the int64 edge arrays (review finding)
        if t.column(id_column).null_count:
            t = t.filter(pc.is_valid(t.column(id_column)))
        ids = t.column(id_column).to_numpy(zero_copy_only=False)
        # NULL keys form ONE group (SQL PARTITION BY semantics) —
        # _key_codes owns that invariant (ADVICE r2)
        codes = _key_codes(t, key)
        order = np.lexsort((ids, codes))
        ids, codes = ids[order], codes[order]
        same = codes[1:] == codes[:-1] if len(codes) else np.empty(0, bool)
        return pa.table(
            {
                out_a: pa.array(ids[:-1][same], pa.int64()),
                out_b: pa.array(ids[1:][same], pa.int64()),
            }
        )

    return partitioned_apply(ds, key, kernel, num_partitions)


def connected_components(
    edges: ray.data.Dataset,
    node_a: str = "a",
    node_b: str = "b",
    max_rounds: int = 30,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Label every node with its component's minimum node id.

    Returns a Dataset with columns ``(node, cluster_id)``. Runs
    hash-to-min rounds until the state's (count, multiset-hash) signature
    is unchanged — the algorithm's fixpoint leaves the state literally
    identical, so the signature is stable exactly there. The multiset
    hash is an order-independent sum of a 64-bit mix of each (v, u) pair
    (plain sum-of-ids was blind to min-swaps that conserve the total —
    review finding); a collision would need two distinct states agreeing
    on count and both 32-bit hash-sum halves. Edges with a NULL endpoint
    are dropped (a NULL id cannot join the graph; the float64 round-trip
    would otherwise turn it into INT64_MIN and elect it cluster minimum).
    """
    import pyarrow.compute as pc

    def init(t: pa.Table) -> pa.Table:
        valid = pc.and_(
            pc.is_valid(t.column(node_a)), pc.is_valid(t.column(node_b))
        )
        if not pc.min(valid).as_py():
            t = t.filter(valid)
        a = t.column(node_a).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(node_b).to_numpy(zero_copy_only=False).astype(np.int64)
        v = np.concatenate([a, b, a, b])
        u = np.concatenate([b, a, a, b])  # neighbors + self-membership
        return pa.table({"v": pa.array(v), "u": pa.array(u)})

    state = edges.map_batches(
        init, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    sig = None

    def hash_to_min(t: pa.Table) -> pa.Table:
        v = t.column("v").to_numpy(zero_copy_only=False)
        u = t.column("u").to_numpy(zero_copy_only=False)
        # dedupe the partition's pairs (previous round emits duplicates)
        pair = np.unique(np.stack([v, u], axis=1), axis=0)
        v, u = pair[:, 0], pair[:, 1]  # sorted by (v, u) — runs contiguous
        starts = _run_starts(v)
        run_id = np.searchsorted(starts, np.arange(len(v)), side="right") - 1
        m = u[starts][run_id]  # first u per run == min(C_v), incl. self
        # min -> every member, and every member -> min's set
        return pa.table(
            {
                "v": pa.array(np.concatenate([u, m]), pa.int64()),
                "u": pa.array(np.concatenate([m, u]), pa.int64()),
            }
        )

    for _ in range(max_rounds):
        state = partitioned_apply(
            state, "v", hash_to_min, num_partitions
        ).materialize()
        cnt = state.count()
        if cnt == 0:  # no edges at all -> empty labeling (sum() is None)
            return ray.data.from_arrow(
                pa.table(
                    {
                        "node": pa.array([], pa.int64()),
                        "cluster_id": pa.array([], pa.int64()),
                    }
                )
            )
        def sig_parts(t: pa.Table) -> pa.Table:
            # per-batch partial sums of the pair-mix hash in four 16-bit
            # chunks: each partial is exact in int64 (rows x 2^16), the
            # driver recombines mod 2^64 — so the fold is batching-
            # independent (a masked per-batch sum would change with the
            # block layout and stall convergence detection)
            from sapray.ops import _bloom_mix

            v = t.column("v").to_numpy(zero_copy_only=False).astype(np.uint64)
            u = t.column("u").to_numpy(zero_copy_only=False).astype(np.uint64)
            with np.errstate(over="ignore"):
                hp = _bloom_mix(v * np.uint64(0x9E3779B97F4A7C15) ^ _bloom_mix(u))
            cols = {}
            for j in range(4):
                chunk = (hp >> np.uint64(16 * j)) & np.uint64(0xFFFF)
                cols[f"s{j}"] = pa.array(
                    [int(chunk.sum(dtype=np.uint64))], pa.int64()
                )
            return pa.table(cols)

        agg = state.map_batches(sig_parts, batch_format="pyarrow").sum(
            ["s0", "s1", "s2", "s3"]
        )
        h64 = sum(
            (agg[f"sum(s{j})"] or 0) << (16 * j) for j in range(4)
        ) % (1 << 64)
        new_sig = (cnt, h64)
        if new_sig == sig:
            break
        sig = new_sig

    def label(t: pa.Table) -> pa.Table:
        v = t.column("v").to_numpy(zero_copy_only=False)
        u = t.column("u").to_numpy(zero_copy_only=False)
        order = np.lexsort((u, v))
        v, u = v[order], u[order]
        starts = _run_starts(v)
        return pa.table(
            {
                "node": pa.array(v[starts], pa.int64()),
                "cluster_id": pa.array(u[starts], pa.int64()),
            }
        )

    return partitioned_apply(state, "v", label, num_partitions)
