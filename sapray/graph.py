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

from sapray.window import partitioned_apply, _run_starts


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
        ids = t.column(id_column).to_numpy(zero_copy_only=False)
        keys = t.column(key).combine_chunks()
        enc = keys.dictionary_encode()
        idx = enc.indices
        if idx.null_count:
            # NULL keys form ONE group (SQL PARTITION BY semantics): raw
            # indices give NaN codes and NaN != NaN, so null-keyed rows
            # would emit no edges (ADVICE r2; window._key_codes pattern).
            import pyarrow.compute as pc

            idx = pc.fill_null(idx, len(enc.dictionary))
        codes = idx.to_numpy(zero_copy_only=False)
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
    hash-to-min rounds until the state's (count, sum-v, sum-u) signature
    is unchanged — the algorithm's fixpoint leaves the state literally
    identical, so the signature is stable exactly there (``max_rounds``
    guards the astronomically unlikely early collision).
    """

    def init(t: pa.Table) -> pa.Table:
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
        agg = state.sum(["v", "u"])
        new_sig = (cnt, agg["sum(v)"], agg["sum(u)"])
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
