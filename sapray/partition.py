"""Key partitioning + explicit salt-based skew splitting (O-CDC4).

Every change event is routed by ``part = stable_hash(repo, path) % P``
so all events for one upsert key meet a single applier (the LWW merge is
per-key, SURVEY.md §7.3). Hot keys — detected from a driver-side sample
— additionally get ``salt = seq % S`` so their (potentially huge) event
stream is split across S partial reducers and re-merged in the final
applier; cold keys keep ``salt = 0``.

The reference has no partitioner at all (single ``NoOpSplit``,
``reference src/main/java/io/cdap/plugin/sap/ODataEntityInputFormat.java:33-36``);
this module is the explicit scale-out design replacing it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from sapray.config import CDCConfig
from sapray.hashing import composite_key, hash_key


def _lazy_input_bytes(ds) -> int | None:
    """Input bytes from READ metadata only — never executes the plan.

    ``Dataset.size_bytes()`` falls back to ``plan.execute()`` when the
    size is not statically inferable (any post-map dataset), which would
    materialize mid-pipeline; this probe returns None instead. Callers
    that want bytes-aware sizing should pass the SOURCE dataset (the
    ``read_parquet`` handle) before transforms erase the metadata.
    """
    try:
        return ds._logical_plan.dag.infer_metadata().size_bytes
    except Exception:
        return None


def exchange_partitions(
    ds=None,
    bytes_per_part: int = 64 << 20,
    floor: int = 2,
    cap_per_cpu: int = 16,
) -> int:
    """Partition count for a keyed ``map_groups`` exchange, sized to the
    cluster and (when cheaply knowable) the data — replaces the fixed
    ``num_partitions=16/32`` literals that capped exchange parallelism
    below the cluster and let per-partition tables outgrow a worker's
    heap at 100x data (VERDICT r3 finding #1).

    Baseline is one partition per cluster CPU (every core busy through
    the exchange); when ``ds`` carries read-metadata size, the count
    grows so each partition holds ~``bytes_per_part``, capped at
    ``cap_per_cpu`` partitions/CPU so tiny-payload exchanges don't
    explode into millions of ms-scale tasks. These exchanges run on the
    sort-based shuffle where partitions > CPUs simply queue — the
    <= session-CPUs deadlock clamp (CLAUDE.md) applies only to native
    hash-join aggregator pools, which ``ops.shuffle_join`` clamps itself.
    """
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    n = max(floor, ncpu)
    if ds is not None:
        sz = _lazy_input_bytes(ds)
        if sz:
            n = max(n, min(cap_per_cpu * ncpu, -(-sz // bytes_per_part)))
    return n


def detect_hot_key_hashes(sample: pa.Table, cfg: CDCConfig) -> np.ndarray:
    """Return sorted uint64 hashes of keys whose share of the sample
    exceeds ``cfg.hot_key_threshold`` (driver-side, sample-sized)."""
    if sample.num_rows == 0:
        return np.empty(0, dtype=np.uint64)
    kh = hash_key(sample, cfg.key_columns)
    vals, counts = np.unique(kh, return_counts=True)
    hot = vals[counts / len(kh) > cfg.hot_key_threshold]
    return np.sort(hot.astype(np.uint64))


def assign_partitions(
    batch: pa.Table,
    cfg: CDCConfig,
    hot_hashes: np.ndarray,
    watermarks: np.ndarray | None = None,
) -> pa.Table:
    """Append ``part``/``salt`` columns; drop events at-or-below the
    partition watermark (idempotent re-delivery skip, O-CDC7/8).

    Fully vectorized: stable siphash over the composite key, modulo for
    the partition id, ``searchsorted`` membership test against the hot
    set, and a numpy mask for the watermark filter.
    """
    kh = hash_key(batch, cfg.key_columns)
    part = (kh % np.uint64(cfg.num_partitions)).astype(np.int32)
    seq = batch.column(cfg.seq_column).to_numpy(zero_copy_only=False)
    if watermarks is not None:
        keep = seq > watermarks[part]
        if not keep.all():
            idx = np.nonzero(keep)[0]
            batch = batch.take(pa.array(idx))
            kh, part, seq = kh[idx], part[idx], seq[idx]
    if len(hot_hashes):
        pos = np.searchsorted(hot_hashes, kh)
        pos[pos == len(hot_hashes)] = 0
        is_hot = hot_hashes[pos] == kh
        salt = np.where(is_hot, (seq % cfg.num_salts), 0).astype(np.int32)
    else:
        salt = np.zeros(len(part), dtype=np.int32)
    return (
        batch.append_column("part", pa.array(part))
        .append_column("salt", pa.array(salt))
        # keep the key hash: downstream LWW combiners reduce on this
        # uint64 instead of re-encoding the key strings every level
        .append_column("kh", pa.array(kh))
    )


def lww_reduce_by_hash(
    batch: pa.Table, kh_column: str = "kh", seq_column: str = "seq"
) -> pa.Table:
    """Within-batch LWW keyed on the precomputed uint64 key hash.

    Pure int lexsort — no string encode. A cross-key hash collision
    merges two keys (probability ~pairs/2^64, the engine's documented
    approximation bound, same identity pass 2 filters on).
    """
    if batch.num_rows <= 1:
        return batch
    kh = batch.column(kh_column).to_numpy(zero_copy_only=False)
    seq = batch.column(seq_column).to_numpy(zero_copy_only=False)
    order = np.lexsort((seq, kh))
    sk = kh[order]
    run_end = np.nonzero(np.diff(sk))[0]
    last = np.concatenate([run_end, [len(order) - 1]])
    idx = order[last]
    if len(idx) == batch.num_rows:
        return batch
    return batch.take(pa.array(np.sort(idx)))


def lww_reduce(batch: pa.Table, key_columns: tuple[str, ...], seq_column: str = "seq") -> pa.Table:
    """Exact within-batch last-writer-wins reduction.

    Dictionary-encode the composite key (exact C-speed grouping — no
    hash-collision risk), lexsort by (key code, seq), keep the last row
    of each run. Collapses duplicate ``(key, seq)`` events (O-CDC8) and
    repeated updates to one key, shrinking the shuffle.
    """
    if batch.num_rows <= 1:
        return batch
    key = composite_key(batch, key_columns)
    codes = pc.dictionary_encode(key).indices.to_numpy(zero_copy_only=False)
    seq = batch.column(seq_column).to_numpy(zero_copy_only=False)
    order = np.lexsort((seq, codes))
    sorted_codes = codes[order]
    # last index of each code run
    run_end = np.nonzero(np.diff(sorted_codes))[0]
    last = np.concatenate([run_end, [len(order) - 1]])
    idx = order[last]
    if len(idx) == batch.num_rows:
        return batch
    return batch.take(pa.array(np.sort(idx)))
