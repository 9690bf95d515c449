"""End-to-end CDC pipeline wiring (the flagship, SURVEY.md §3.3).

    read_parquet(changelog v1/v2/v3) ──┐  per-segment multi-schema scan
        map_batches(decode_events)  ───┤  O-CDC2/3, zero-copy Arrow
    union ─────────────────────────────┘
    map_batches(assign_partitions + lww_reduce)   O-CDC4 + combiner
    [groupby(part, salt).map_groups(partial_lww)] skew path, hot keys only
    groupby(part).map_groups(apply_partition)     O-CDC5 merge + sink
    metrics rollup (small driver-side collect)    O-CDC9

The reference runs the whole ingest as ONE task
(``reference src/main/java/io/cdap/plugin/sap/ODataEntityInputFormat.java:33-36``);
here every stage is a streaming Ray Data operator with backpressure and
the shuffle keys are explicit (SURVEY.md §7.3).
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from sapray.apply import apply_partition, partial_lww
from sapray.config import CDCConfig
from sapray.partition import assign_partitions, detect_hot_key_hashes, lww_reduce
from sapray.sink import lake_files, read_manifests
from sapray.transform import decode_events


def sample_events(changelog_dir: str, n: int) -> pa.Table:
    """Driver-side sample for hot-key detection: up to ``n`` rows spread
    over the segment files (no Ray job; row-group reads only)."""
    files = sorted(glob.glob(os.path.join(changelog_dir, "v*", "*.parquet")))
    if not files:
        return pa.table({"repo": pa.array([], pa.string()), "path": pa.array([], pa.string())})
    per_file = max(1, n // len(files))
    chunks = []
    for f in files:
        pf = pq.ParquetFile(f)
        got = 0
        for b in pf.iter_batches(batch_size=min(per_file, 65_536), columns=["repo", "path"]):
            chunks.append(pa.Table.from_batches([b]))
            got += b.num_rows
            if got >= per_file:
                break
    return pa.concat_tables(chunks)


class CDCEngine:
    """Driver-facing engine handle. Does NOT own the Ray session."""

    def __init__(self, cfg: CDCConfig | None = None):
        self.cfg = cfg or CDCConfig()
        self.cfg.validate()

    # ------------------------------------------------------------------ scan
    def events_dataset(self, changelog_dir: str) -> ray.data.Dataset:
        """Streaming multi-schema scan: one ``read_parquet`` per DDIC
        version segment, normalized per-batch to the unified event
        schema, then unioned (O-CDC1/2/3)."""
        seg_dirs = sorted(glob.glob(os.path.join(changelog_dir, "v*")))
        if not seg_dirs:
            raise FileNotFoundError(f"no changelog segments under {changelog_dir}")
        parts = []
        for seg in seg_dirs:
            ds = ray.data.read_parquet(seg)
            parts.append(
                ds.map_batches(decode_events, batch_format="pyarrow", zero_copy_batch=True)
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.union(p)
        return out

    # ----------------------------------------------------------------- apply
    def apply(self, changelog_dir: str, resume: bool = True) -> dict:
        """Replay the change log into the lake; returns the metrics summary."""
        cfg = self.cfg
        manifests = read_manifests(cfg.lake_dir) if resume else {}
        watermarks = None
        if manifests:
            watermarks = np.full(cfg.num_partitions, -1, dtype=np.int64)
            for p, m in manifests.items():
                if p < cfg.num_partitions:
                    watermarks[p] = m.get("watermark", -1)

        hot = detect_hot_key_hashes(
            sample_events(changelog_dir, cfg.hot_key_sample), cfg
        )

        ds = self.events_dataset(changelog_dir)

        def assign_combine(batch: pa.Table) -> pa.Table:
            batch = assign_partitions(batch, cfg, hot, watermarks)
            return lww_reduce(batch, cfg.key_columns, cfg.seq_column)

        ds = ds.map_batches(
            assign_combine,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=cfg.batch_size,
        )

        if len(hot):
            # two-stage skew plan: partial reduce per (part, salt), then
            # re-merge the (small) per-key candidates per partition
            ds = ds.groupby(["part", "salt"]).map_groups(
                lambda g: partial_lww(g, cfg), batch_format="pyarrow"
            )
        else:
            ds = ds.drop_columns(["salt"])

        metrics = ds.groupby("part").map_groups(
            lambda g: apply_partition(g, cfg), batch_format="pyarrow"
        )
        mdf = metrics.to_pandas()  # one row per touched partition — small
        return {
            "partitions": int(len(mdf)),
            "n_candidates": int(mdf["n_candidates"].sum()) if len(mdf) else 0,
            "n_upserts": int(mdf["n_upserts"].sum()) if len(mdf) else 0,
            "n_deletes": int(mdf["n_deletes"].sum()) if len(mdf) else 0,
            "final_rows": int(mdf["final_rows"].sum()) if len(mdf) else 0,
            "watermark": int(mdf["watermark"].max()) if len(mdf) else -1,
            "per_partition": mdf,
        }

    # ------------------------------------------------------------------ read
    def state_dataset(self) -> ray.data.Dataset:
        """The committed lake as a streaming Dataset (manifest-guided)."""
        files = lake_files(self.cfg.lake_dir)
        if not files:
            return ray.data.from_arrow(pa.table({}))
        return ray.data.read_parquet(files)

    def state_table(self) -> pa.Table:
        """Whole committed lake as one Arrow table — tests/small scales only."""
        files = lake_files(self.cfg.lake_dir)
        if not files:
            from sapray.transform import STATE_SCHEMA

            return pa.table([], schema=STATE_SCHEMA)
        return pa.concat_tables(pq.read_table(f) for f in files)
