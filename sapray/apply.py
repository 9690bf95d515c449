"""LWW merge appliers (O-CDC5, O-CDC8, O-CDC9).

The applier is the engine's one genuinely stateful stage (the reference's
only per-worker state is an Edm metadata cache,
``reference src/main/java/io/cdap/plugin/sap/odata/odata2/OData2Client.java:60-62``;
ours holds per-partition upsert state). State lives in the lake
partition snapshots — each apply task reads its partition's committed
snapshot, merges the new max-seq-per-key events (last-writer-wins,
deletes remove), and commits atomically through the manifest sink, so a
retried task is idempotent and the per-partition watermark is monotonic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from sapray.config import CDCConfig
from sapray.hashing import composite_key, sha256_hex_column, table_state_sha
from sapray.partition import lww_reduce
from sapray.sink import commit_partition, read_manifest, read_partition_state
from sapray.transform import STATE_SCHEMA

METRICS_SCHEMA = pa.schema(
    [
        pa.field("part", pa.int32()),
        pa.field("n_candidates", pa.int64()),
        pa.field("n_upserts", pa.int64()),
        pa.field("n_deletes", pa.int64()),
        pa.field("prior_rows", pa.int64()),
        pa.field("final_rows", pa.int64()),
        pa.field("watermark", pa.int64()),
    ]
)

_EVENT_STATE_COLS = [
    "repo",
    "path",
    "commit",
    "commit_ts",
    "lang",
    "content",
    "size_bytes",
    "seq",
]


WINNER_SCHEMA = pa.schema(
    [
        pa.field("part", pa.int32()),
        pa.field("kh", pa.uint64()),
        pa.field("seq", pa.int64()),
        pa.field("op", pa.string()),
    ]
)


def resolve_winners(group: pa.Table, cfg: CDCConfig) -> pa.Table:
    """Pass-1 reducer: per-partition winner set over SKINNY event rows.

    Input is the hash-partitioned (already per-batch-combined) stream of
    ``(seq, op, repo, path, part)`` rows; output is one ``(part, kh,
    seq, op)`` row per key — the key's max-seq event. The partition
    watermark equals ``max(seq)`` of these winners: the globally latest
    event of the partition is by definition its own key's winner.
    """
    if group.num_rows == 0:
        return pa.table([], schema=WINNER_SCHEMA)
    from sapray.partition import lww_reduce_by_hash

    winners = lww_reduce_by_hash(group, seq_column=cfg.seq_column)
    return pa.table(
        {
            "part": winners.column("part").cast(pa.int32()),
            "kh": winners.column("kh").cast(pa.uint64()),
            "seq": winners.column("seq").cast(pa.int64()),
            "op": winners.column("op"),
        },
        schema=WINNER_SCHEMA,
    )


def partial_lww(group: pa.Table, cfg: CDCConfig) -> pa.Table:
    """Partial reduce per (part, salt): at most one event per key survives.

    This is the combiner of the two-stage skew plan: a hot key's events
    are spread over ``num_salts`` of these reducers; the final applier
    re-merges the <= num_salts candidates per hot key.
    """
    out = lww_reduce(group, cfg.key_columns, cfg.seq_column)
    return out.drop_columns(["salt"]) if "salt" in out.column_names else out


def _upsert_state_rows(events: pa.Table) -> pa.Table:
    """Project winning non-delete events into STATE_SCHEMA rows."""
    cols = []
    for f in STATE_SCHEMA:
        if f.name == "content_sha256":
            cols.append(sha256_hex_column(events.column("content")))
        else:
            col = events.column(f.name)
            if not col.type.equals(f.type):
                col = col.cast(f.type)
            cols.append(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
    return pa.Table.from_arrays(cols, schema=STATE_SCHEMA)


def apply_partition(group: pa.Table, cfg: CDCConfig) -> pa.Table:
    """Final applier for one partition: merge events into the committed
    snapshot (or append a delta, ``cfg.sink_mode``), exactly-once, emit
    one metrics row."""
    if group.num_rows == 0:
        return pa.table([], schema=METRICS_SCHEMA)
    part = int(group.column("part")[0].as_py())
    n_candidates = group.num_rows

    winners = lww_reduce(group, cfg.key_columns, cfg.seq_column)
    is_del = pc.equal(winners.column(cfg.op_column), "D")
    upserts_ev = winners.filter(pc.invert(is_del))
    deletes_ev = winners.filter(is_del)

    if cfg.sink_mode == "delta":
        return _apply_partition_delta(
            part, n_candidates, winners, upserts_ev, deletes_ev, cfg
        )

    manifest = read_manifest(cfg.lake_dir, part)
    prior = read_partition_state(
        cfg.lake_dir, part, manifest, cfg.key_columns, cfg.seq_column
    )
    prior_watermark = manifest["watermark"] if manifest else -1
    prior_rows = prior.num_rows if prior is not None else 0

    upserts = _upsert_state_rows(upserts_ev.select(_EVENT_STATE_COLS))

    touched = composite_key(winners, cfg.key_columns).to_pandas()
    if prior is not None and prior.num_rows:
        from sapray.schema import normalize_table

        prior = normalize_table(prior, STATE_SCHEMA)
        prior_keys = composite_key(prior, cfg.key_columns).to_pandas()
        keep = ~pd.Index(prior_keys).isin(set(touched))
        prior_kept = prior.filter(pa.array(keep))
        state = pa.concat_tables([prior_kept, upserts])
    else:
        state = upserts

    # deterministic row order -> content-addressed snapshot is retry-stable
    order = np.argsort(
        np.asarray(composite_key(state, cfg.key_columns).to_pandas(), dtype=object),
        kind="stable",
    )
    state = state.take(pa.array(order)).combine_chunks()

    seq_max = pc.max(group.column(cfg.seq_column)).as_py()
    watermark = max(int(seq_max), prior_watermark)
    state_sha = table_state_sha(state, cfg.key_columns)
    commit_partition(
        cfg.lake_dir,
        part,
        state,
        watermark,
        state_sha,
        # num_partitions rides every manifest so a resume with a different
        # partition count fails fast instead of silently re-routing keys
        extra={
            "reference_name": cfg.reference_name,
            "num_partitions": cfg.num_partitions,
            "key_columns": list(cfg.key_columns),
        },
        stats_columns=cfg.key_columns,
    )
    return pa.table(
        {
            "part": pa.array([part], pa.int32()),
            "n_candidates": pa.array([n_candidates], pa.int64()),
            "n_upserts": pa.array([upserts.num_rows], pa.int64()),
            "n_deletes": pa.array([deletes_ev.num_rows], pa.int64()),
            "prior_rows": pa.array([prior_rows], pa.int64()),
            "final_rows": pa.array([state.num_rows], pa.int64()),
            "watermark": pa.array([watermark], pa.int64()),
        },
        schema=METRICS_SCHEMA,
    )


def _tombstone_rows(deletes_ev: pa.Table) -> pa.Table:
    """Delete events as STATE_SCHEMA tombstones (payload columns null)."""
    n = deletes_ev.num_rows
    cols = []
    for f in STATE_SCHEMA:
        if f.name in ("repo", "path"):
            col = deletes_ev.column(f.name)
            cols.append(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
        elif f.name == "seq":
            cols.append(deletes_ev.column("seq").combine_chunks() if isinstance(deletes_ev.column("seq"), pa.ChunkedArray) else deletes_ev.column("seq"))
        elif f.name == "commit":
            col = deletes_ev.column("commit")
            cols.append(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
        else:
            cols.append(pa.nulls(n, f.type))
    return pa.Table.from_arrays(cols, schema=STATE_SCHEMA)


def _apply_partition_delta(
    part: int,
    n_candidates: int,
    winners: pa.Table,
    upserts_ev: pa.Table,
    deletes_ev: pa.Table,
    cfg: CDCConfig,
) -> pa.Table:
    """Write-optimized applier: append this window's winners as ONE delta
    file (tombstones included) without reading prior state; compact when
    the partition accumulates ``cfg.compact_every`` files (O-CDC6 in
    LSM/delta form — write amplification O(window), not O(partition))."""
    from sapray.sink import commit_partition_delta, compact_partition, read_manifest

    upserts = _upsert_state_rows(upserts_ev.select(_EVENT_STATE_COLS))
    tombstones = _tombstone_rows(deletes_ev)
    delta = pa.concat_tables(
        [
            upserts.append_column(
                "is_delete", pa.array(np.zeros(upserts.num_rows, dtype=bool))
            ),
            tombstones.append_column(
                "is_delete", pa.array(np.ones(tombstones.num_rows, dtype=bool))
            ),
        ]
    )
    # deterministic row order -> content-addressed delta is retry-stable
    order = np.argsort(
        np.asarray(composite_key(delta, cfg.key_columns).to_pandas(), dtype=object),
        kind="stable",
    )
    delta = delta.take(pa.array(order)).combine_chunks()

    prior = read_manifest(cfg.lake_dir, part)
    prior_watermark = prior["watermark"] if prior else -1
    seq_max = int(pc.max(winners.column(cfg.seq_column)).as_py())
    watermark = max(seq_max, prior_watermark)
    delta_sha = table_state_sha(delta, cfg.key_columns)
    manifest = commit_partition_delta(
        cfg.lake_dir, part, delta, watermark, delta_sha,
        extra={
            "reference_name": cfg.reference_name,
            "num_partitions": cfg.num_partitions,
            "key_columns": list(cfg.key_columns),
        },
        stats_columns=cfg.key_columns,
    )
    final_rows = -1
    if len(manifest.get("files", [])) >= cfg.compact_every:
        compacted = compact_partition(
            cfg.lake_dir, part, cfg.key_columns, cfg.seq_column
        )
        if compacted is not None:
            final_rows = compacted.get("row_count", -1)
    return pa.table(
        {
            "part": pa.array([part], pa.int32()),
            "n_candidates": pa.array([n_candidates], pa.int64()),
            "n_upserts": pa.array([upserts.num_rows], pa.int64()),
            "n_deletes": pa.array([deletes_ev.num_rows], pa.int64()),
            "prior_rows": pa.array([-1], pa.int64()),
            "final_rows": pa.array([final_rows], pa.int64()),
            "watermark": pa.array([watermark], pa.int64()),
        },
        schema=METRICS_SCHEMA,
    )
