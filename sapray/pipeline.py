"""End-to-end CDC pipeline wiring (the flagship, SURVEY.md §3.3).

Two-pass, shuffle-light apply (the default, ``winner_strategy =
"broadcast"``):

    pass 1 — winner resolution over SKINNY columns only:
      read_parquet(all segments, columns=[seq, op, repo, path])
      map_batches(assign part/salt + watermark skip + within-batch LWW)
      [groupby(part, salt).map_groups(partial_lww)]  skew path, hot keys
      groupby(part).map_groups(resolve_winners) -> (part, kh, seq, op)

    pass 2 — payload routing of winners only:
      read_parquet(segment) -> map_batches(filter seq∈winners -> decode)
      groupby(part).map_groups(apply_partition) -> exactly-once sink

The content payload NEVER enters an all-to-all exchange: pass 1 shuffles
~40 B/event of key metadata, pass 2 moves only the winning rows (bounded
by the number of keys touched in the replay window, not by event count).
At 10^10 events over 10^8 keys the winner arrays are ~1.6 GB in the
object store — if they exceed ``cfg.winner_broadcast_limit`` the engine
falls back to the single-pass payload-shuffle plan (``"shuffle"``),
which routes full event rows through one keyed exchange.

The reference runs the whole ingest as ONE task
(``reference src/main/java/io/cdap/plugin/sap/ODataEntityInputFormat.java:33-36``);
here every stage is a streaming Ray Data operator with backpressure and
the shuffle keys are explicit (SURVEY.md §7.3).

Scale assumption (documented per SURVEY.md §7.4): ``seq`` is the global
commit order and unique per event — winner identity in pass 2 is the
``(seq, hash(key))`` pair, checked against both broadcast arrays.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from sapray.apply import apply_partition, partial_lww, resolve_winners
from sapray.config import CDCConfig
from sapray.hashing import hash_key
from sapray.partition import (
    assign_partitions,
    detect_hot_key_hashes,
    lww_reduce,
    lww_reduce_by_hash,
)
from sapray.sink import lake_files, read_manifests
from sapray.transform import decode_events

SKINNY_COLUMNS = ["seq", "op", "repo", "path"]


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


def _filter_decode_batch(
    batch: pa.Table, winners_ref, cfg: CDCConfig
) -> pa.Table:
    """Pass-2 map: keep only winner events, decode them, assign ``part``.

    The winner seq array rides the object store once (``ray.put``) and is
    read zero-copy by every task — not re-shipped per batch. Filtering on
    ``seq`` alone (before any hashing/decoding) is exact: even if seq
    values collided across keys, a stray row admitted here can never
    out-sequence its own key's true winner inside the applier's per-key
    LWW (a key's winner IS its max-seq event), so the final state is
    unaffected — and with the engine's unique-commit-order contract there
    are no collisions at all. Key hashing then runs on ~0.1% of rows.
    """
    wseqs = ray.get(winners_ref)
    n = batch.num_rows
    if len(wseqs) == 0 or n == 0:
        empty = decode_events(batch.slice(0, 0))
        return empty.append_column("part", pa.array([], pa.int32()))
    seq = batch.column("seq").to_numpy(zero_copy_only=False)
    # amplified replicas are filtered WITHOUT materializing them: replica
    # j's events are (seq + j*stride, path || "~j"); match each replica's
    # shifted seq range against the winner array, then reconstruct only
    # the handful of matching rows
    from sapray.changelog import AMPLIFY_STRIDE, shift_replica

    ampl = max(cfg.amplification, 1)
    sel_tables = []
    for j in range(ampl):
        seq_j = seq + j * AMPLIFY_STRIDE
        pos = np.clip(np.searchsorted(wseqs, seq_j), 0, len(wseqs) - 1)
        mask = wseqs[pos] == seq_j
        if not mask.any():
            continue
        sel = batch.take(pa.array(np.nonzero(mask)[0]))
        if j:
            sel = shift_replica(sel, j)
        sel_tables.append(sel)
    if not sel_tables:
        empty = decode_events(batch.slice(0, 0))
        return empty.append_column("part", pa.array([], pa.int32()))
    sel = pa.concat_tables(sel_tables)
    dec = decode_events(sel)
    kh = hash_key(sel, cfg.key_columns)
    part = (kh % np.uint64(cfg.num_partitions)).astype(np.int32)
    return dec.append_column("part", pa.array(part))


def _merge_salted_winners(winners: pa.Table) -> pa.Table:
    """Collapse per-(part, salt) winner rows to one per key hash.

    Only salted (hot) keys produce more than one row; cold keys live in
    exactly one group. Identity here is the 64-bit key hash — the same
    identity pass 2 matches on — so a cross-key kh collision would merge
    two keys' winners; expected collisions are n^2/2^65 (~3e-4 at 10^8
    touched keys), documented as the plan's approximation bound.
    """
    kh = winners.column("kh").to_numpy(zero_copy_only=False)
    seq = winners.column("seq").to_numpy(zero_copy_only=False)
    order = np.lexsort((seq, kh))
    kh_sorted = kh[order]
    run_end = np.nonzero(np.diff(kh_sorted))[0]
    last = np.concatenate([run_end, [len(order) - 1]])
    return winners.take(pa.array(np.sort(order[last])))


def _changes_schema() -> pa.Schema:
    """Change-feed row schema: STATE_SCHEMA + change_op ('U'/'D').
    Tombstone rows carry null payload columns, so every not-null payload
    field is relaxed to nullable (keys/seq stay required)."""
    from sapray.transform import STATE_SCHEMA

    fields = [
        f if f.name in ("repo", "path", "seq") else f.with_nullable(True)
        for f in STATE_SCHEMA
    ]
    return pa.schema(fields).append(pa.field("change_op", pa.string()))


class CDCEngine:
    """Driver-facing engine handle. Does NOT own the Ray session."""

    def __init__(self, cfg: CDCConfig | None = None):
        self.cfg = cfg or CDCConfig()
        self.cfg.validate()

    # ------------------------------------------------------------------ scan
    def events_dataset(
        self,
        changelog_dir: str,
        scan: tuple[list[str], pa.Schema] | None = None,
    ) -> ray.data.Dataset:
        """Streaming multi-schema scan (O-CDC1/2/3): ONE ``read_parquet``
        over every DDIC-version segment with the unified target schema
        (per-segment footers -> ``unify_schemas``: add-column fills null,
        int32 size widens to int64), then per-batch decode.

        A single read operator matters for utilization: per-segment reads
        unioned together fragment the streaming executor's per-operator
        resource reservation — three read branches on an 8-CPU node each
        got ~2 concurrent tasks. ``scan`` threads a precomputed
        (files, schema) pair through so callers that already globbed and
        unified (apply's driver-side validation) don't redo the metadata
        I/O."""
        files, schema = scan if scan is not None else self._files_and_schema(changelog_dir)
        ds = ray.data.read_parquet(
            files, schema=schema, override_num_blocks=self._n_blocks(len(files))
        )
        return ds.map_batches(decode_events, batch_format="pyarrow", zero_copy_batch=True)

    def _files_and_schema(self, changelog_dir: str) -> tuple[list[str], pa.Schema]:
        from sapray.schema import unify_schemas

        files: list[str] = []
        schemas: list[pa.Schema] = []
        for seg in self._segments(changelog_dir):
            fs = sorted(glob.glob(os.path.join(seg, "*.parquet")))
            files.extend(fs)
            if fs:
                schemas.append(pq.read_schema(fs[0]))
        if not files:
            raise FileNotFoundError(f"no changelog segments under {changelog_dir}")
        return files, unify_schemas(schemas)

    def skinny_dataset(self, changelog_dir: str) -> ray.data.Dataset:
        """Pass-1 scan: only the key/order columns leave storage (prune
        at the read — the content column dominates file bytes). The
        skinny columns are schema-stable across DDIC versions, so one
        ``read_parquet`` covers every segment.

        ``override_num_blocks`` ~ 2 blocks/CPU: skinny rows are ~40 B, so
        Ray's default (>=200 blocks) makes thousands of millisecond tasks
        whose scheduling overhead dwarfs the compute."""
        files = sorted(glob.glob(os.path.join(changelog_dir, "v*", "*.parquet")))
        if not files:
            raise FileNotFoundError(f"no changelog segments under {changelog_dir}")
        return ray.data.read_parquet(
            files, columns=SKINNY_COLUMNS, override_num_blocks=self._n_blocks(len(files))
        )

    @staticmethod
    def _n_blocks(n_files: int) -> int:
        """2 blocks/CPU for parallelism, but never fewer than n_files/4
        (blocks of <= 4 files keep per-task memory bounded as the log
        grows — a fixed 2xCPU split of a 1000-file log would make
        multi-GB blocks)."""
        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        return max(min(2 * ncpu, n_files), n_files // 4, 8)

    def _segments(self, changelog_dir: str) -> list[str]:
        seg_dirs = sorted(glob.glob(os.path.join(changelog_dir, "v*")))
        if not seg_dirs:
            raise FileNotFoundError(f"no changelog segments under {changelog_dir}")
        return seg_dirs

    # ----------------------------------------------------------------- apply
    def apply(self, changelog_dir: str, resume: bool = True) -> dict:
        """Replay the change log into the lake; returns the metrics summary."""
        cfg = self.cfg
        committed = read_manifests(cfg.lake_dir)
        if committed:
            # amplified replicas shift seq by j*AMPLIFY_STRIDE, so prior
            # watermarks sit near (ampl-1)*stride and a resumed amplified
            # apply would silently drop every event of replicas 0..ampl-2
            # — refuse instead of corrupting (bench uses fresh lake dirs)
            if cfg.amplification > 1:
                raise ValueError(
                    "amplification > 1 cannot apply onto a lake with existing "
                    "manifests (replica seq shifts make the committed "
                    "watermarks incomparable); use a fresh lake_dir"
                )
            # partition count is part of the lake's identity: watermarks
            # and key routing are indexed by part id, so a different
            # num_partitions would silently skip or double-apply events
            for p, m in committed.items():
                mp = m.get("num_partitions")
                if mp is not None and mp != cfg.num_partitions:
                    raise ValueError(
                        f"lake {cfg.lake_dir} was written with num_partitions="
                        f"{mp}; this apply is configured with "
                        f"{cfg.num_partitions} — refusing to re-route keys"
                    )
                mk = m.get("key_columns")
                if mk is not None and tuple(mk) != tuple(cfg.key_columns):
                    raise ValueError(
                        f"lake {cfg.lake_dir} was written with key_columns="
                        f"{tuple(mk)}; this apply is configured with "
                        f"{tuple(cfg.key_columns)} — the key hash (and its "
                        "ORDER) routes partitions, so a mismatch would "
                        "silently mis-route every key"
                    )
        # design-time schema validation (the reference's configurePipeline
        # step, SapODataSource.java:62-85): unify every segment's footer
        # schema on the driver BEFORE any task runs, so an incompatible
        # DDIC change fails fast with SchemaCompatError instead of
        # surfacing as an Arrow conversion error inside a read task;
        # the (files, schema) result is threaded into the scans below so
        # the glob + footer reads happen once per apply
        scan = self._files_and_schema(changelog_dir)

        manifests = committed if resume else {}
        watermarks = None
        if manifests:
            watermarks = np.full(cfg.num_partitions, -1, dtype=np.int64)
            for p, m in manifests.items():
                if p < cfg.num_partitions:
                    watermarks[p] = m.get("watermark", -1)

        hot = detect_hot_key_hashes(
            sample_events(changelog_dir, cfg.hot_key_sample), cfg
        )

        if cfg.winner_strategy == "shuffle":
            return self._apply_payload_shuffle(changelog_dir, hot, watermarks, scan)

        # ---- pass 1: skinny winner resolution
        winners = self._resolve_winners(changelog_dir, hot, watermarks)
        if winners.num_rows > cfg.winner_broadcast_limit:
            return self._apply_payload_shuffle(changelog_dir, hot, watermarks, scan)

        if winners.num_rows == 0 or "seq" not in winners.column_names:
            # nothing above the watermarks — no-op replay
            wseqs = np.empty(0, dtype=np.int64)
        else:
            wseqs = np.sort(winners.column("seq").to_numpy(zero_copy_only=False))
        winners_ref = ray.put(wseqs)

        # ---- pass 2: payload routing of winners only — ONE read operator
        # over all segments (unified schema) so the executor's resource
        # reservation isn't fragmented across union branches
        files, schema = scan
        ds = ray.data.read_parquet(
            files, schema=schema, override_num_blocks=self._n_blocks(len(files))
        ).map_batches(
            _filter_decode_batch,
            fn_args=(winners_ref, cfg),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        metrics = ds.groupby("part").map_groups(
            lambda g: apply_partition(g, cfg), batch_format="pyarrow"
        )
        return self._summarize(metrics)

    def _resolve_winners(
        self, changelog_dir: str, hot: np.ndarray, watermarks: np.ndarray | None
    ) -> pa.Table:
        """Pass 1: hash-partitioned LWW over skinny rows -> winner table
        (small: one row per touched key)."""
        cfg = self.cfg
        ds = self.skinny_dataset(changelog_dir)

        def assign_combine(batch: pa.Table) -> pa.Table:
            # combine FIRST, amplify SECOND: within-batch LWW commutes
            # with row multiplication (replica key spaces are disjoint
            # copies), so the ~50x reduction runs on raw rows and the
            # replicas are built from the already-reduced survivors —
            # amplifying before reducing would multiply the combine cost
            # by the amplification factor for identical output
            batch = lww_reduce(batch, cfg.key_columns, cfg.seq_column)
            if cfg.amplification > 1:
                from sapray.changelog import amplify_batch

                batch = amplify_batch(batch, cfg.amplification)
            return assign_partitions(batch, cfg, hot, watermarks)

        ds = ds.map_batches(
            assign_combine,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=cfg.skinny_batch_size,
        )
        if len(hot):
            # skew plan: hot keys are salted, so the ONE shuffle groups by
            # (part, salt) — a hot key's stream splits across num_salts
            # reducers; its <= num_salts winner rows are re-merged on the
            # driver (winner tables are tiny), saving a second exchange
            winners_ds = ds.groupby(["part", "salt"]).map_groups(
                lambda g: resolve_winners(g, cfg), batch_format="pyarrow"
            )
        else:
            ds = ds.drop_columns(["salt"])
            winners_ds = ds.groupby("part").map_groups(
                lambda g: resolve_winners(g, cfg), batch_format="pyarrow"
            )
        # winner table is small (one row per touched key) — safe to collect;
        # drop empty blocks (they can carry a column-less schema)
        from sapray.apply import WINNER_SCHEMA

        blocks = [t for t in ray.get(winners_ds.to_arrow_refs()) if t.num_rows]
        winners = (
            pa.concat_tables(blocks)
            if blocks
            else WINNER_SCHEMA.empty_table()
        )
        if len(hot) and winners.num_rows:
            winners = _merge_salted_winners(winners)
        return winners

    def _apply_payload_shuffle(
        self,
        changelog_dir: str,
        hot: np.ndarray,
        watermarks: np.ndarray | None,
        scan: tuple[list[str], pa.Schema] | None = None,
    ) -> dict:
        """Single-pass plan: full event rows (payload included) through
        one keyed exchange. Used when the winner set would be too large
        to broadcast, or explicitly via ``winner_strategy="shuffle"``."""
        cfg = self.cfg
        # decode-then-combine, decode at the default (small) batch size:
        # a combine-before-decode variant was measured SLOWER end-to-end
        # (13.7 s -> 83.6 s first exchange at m80/8 CPUs) — fusing a
        # whole-block combine directly onto a multi-file read task
        # buffers the task's entire raw input as one in-heap batch and
        # destroys read-side streaming, which costs far more than
        # decoding the ~75% of rows the combine later discards (their
        # content columns are zero-copy references through decode anyway)
        ds = self.events_dataset(changelog_dir, scan=scan)

        def assign_combine(batch: pa.Table) -> pa.Table:
            if cfg.amplification > 1:
                from sapray.changelog import amplify_batch

                batch = amplify_batch(batch, cfg.amplification)
            batch = assign_partitions(batch, cfg, hot, watermarks)
            return lww_reduce(batch, cfg.key_columns, cfg.seq_column)

        ds = ds.map_batches(
            assign_combine,
            batch_format="pyarrow",
            zero_copy_batch=True,
            # whole-block batches: a 32k-row batch_size would rebatch the
            # scan into ~700 tiny tasks whose dispatch + 700-block sort
            # dominate wall time; a block is one ~100 MB file, safe heap
            batch_size=None,
        )
        if len(hot):
            ds = ds.groupby(["part", "salt"]).map_groups(
                lambda g: partial_lww(g, cfg), batch_format="pyarrow"
            )
        else:
            ds = ds.drop_columns(["salt"])
        metrics = ds.groupby("part").map_groups(
            lambda g: apply_partition(g, cfg), batch_format="pyarrow"
        )
        return self._summarize(metrics)

    def _summarize(self, metrics: ray.data.Dataset) -> dict:
        mdf = metrics.to_pandas()  # one row per touched partition — small
        # delta-mode partitions report final_rows = -1 (unknown until
        # compaction/merge-on-read); any sentinel makes the total unknown
        final_rows = 0
        if len(mdf):
            final_rows = (
                -1 if (mdf["final_rows"] < 0).any() else int(mdf["final_rows"].sum())
            )
        return {
            "partitions": int(len(mdf)),
            "n_candidates": int(mdf["n_candidates"].sum()) if len(mdf) else 0,
            "n_upserts": int(mdf["n_upserts"].sum()) if len(mdf) else 0,
            "n_deletes": int(mdf["n_deletes"].sum()) if len(mdf) else 0,
            "final_rows": final_rows,
            "watermark": int(mdf["watermark"].max()) if len(mdf) else -1,
            "per_partition": mdf,
        }

    # ------------------------------------------------------------------ read
    def state_dataset(self, as_of: int | None = None) -> ray.data.Dataset:
        """The committed lake as a streaming Dataset (manifest-guided).

        Snapshot-mode lakes stream the files directly; a lake with delta
        manifests is merged per partition inside the read tasks
        (LWW + tombstone removal — merge-on-read). ``as_of`` time-travels
        a delta-mode lake to an earlier commit watermark (exact at commit
        boundaries; see ``sink.read_partition_state``)."""
        cfg = self.cfg
        manifests = read_manifests(cfg.lake_dir)
        if not manifests:
            return ray.data.from_arrow(pa.table({}))
        if not any(m.get("mode") == "delta" for m in manifests.values()):
            if as_of is not None and any(
                as_of < m.get("watermark", -1) for m in manifests.values()
            ):
                raise ValueError("snapshot-mode lakes retain no history")
            return ray.data.read_parquet(lake_files(cfg.lake_dir))

        from sapray.sink import read_manifest, read_partition_state
        from sapray.transform import STATE_SCHEMA

        lake_dir, key_columns, seq_column = cfg.lake_dir, cfg.key_columns, cfg.seq_column
        parts = ray.data.from_items([{"part": p} for p in sorted(manifests)])

        def load(batch: pa.Table) -> pa.Table:
            tables = []
            for p in batch.column("part").to_pylist():
                t = read_partition_state(
                    lake_dir, int(p), read_manifest(lake_dir, int(p)),
                    key_columns, seq_column, as_of=as_of,
                )
                if t is not None and t.num_rows:
                    from sapray.schema import normalize_table

                    tables.append(normalize_table(t, STATE_SCHEMA))
            return (
                pa.concat_tables(tables) if tables else STATE_SCHEMA.empty_table()
            )

        return parts.map_batches(load, batch_format="pyarrow", batch_size=4)

    def changes_dataset(
        self, since: int = -1, until: int | None = None
    ) -> ray.data.Dataset:
        """Change-data-feed: the committed change stream (upserts +
        tombstones, ``change_op`` column) with ``since < seq <= until``,
        as a streaming Dataset — one read task per partition, delta files
        pruned by their name watermark (see
        ``sink.read_partition_changes``). ``state(as_of=a)`` merged with
        ``changes(a, b)`` reproduces ``state(as_of=b)`` exactly."""
        from sapray.schema import normalize_table
        from sapray.sink import read_manifest, read_partition_changes

        cfg = self.cfg
        manifests = read_manifests(cfg.lake_dir)
        schema = _changes_schema()
        if not manifests:
            return ray.data.from_arrow(schema.empty_table())
        lake_dir, seq_column = cfg.lake_dir, cfg.seq_column
        parts = ray.data.from_items([{"part": p} for p in sorted(manifests)])

        def load(batch: pa.Table) -> pa.Table:
            tables = []
            for p in batch.column("part").to_pylist():
                t = read_partition_changes(
                    lake_dir, int(p), read_manifest(lake_dir, int(p)),
                    seq_column, since=since, until=until,
                )
                if t is not None and t.num_rows:
                    tables.append(normalize_table(t, schema))
            return pa.concat_tables(tables) if tables else schema.empty_table()

        return parts.map_batches(load, batch_format="pyarrow", batch_size=4)

    def changes_table(self, since: int = -1, until: int | None = None) -> pa.Table:
        """Whole change feed as one Arrow table — tests/small scales only."""
        from sapray.schema import normalize_table
        from sapray.sink import read_partition_changes

        manifests = read_manifests(self.cfg.lake_dir)
        schema = _changes_schema()
        tables = []
        for p in sorted(manifests):
            t = read_partition_changes(
                self.cfg.lake_dir, p, manifests[p],
                self.cfg.seq_column, since=since, until=until,
            )
            if t is not None and t.num_rows:
                tables.append(normalize_table(t, schema))
        return pa.concat_tables(tables) if tables else schema.empty_table()

    def point_lookup(self, key: dict, as_of: int | None = None) -> pa.Table:
        """Current row(s) for ONE composite key, touching the minimum of
        the lake: the key's hash picks the single partition (the lake
        partition id is salt-free and key-deterministic), and the
        manifest zone maps (per-file key min/max recorded at commit)
        skip every snapshot/delta file whose range excludes the key.
        O(files actually containing the key), not O(partition).
        """
        cfg = self.cfg
        from sapray.sink import read_partition_state
        from sapray.transform import STATE_SCHEMA

        # route with the PERSISTED partition count and KEY-COLUMN ORDER:
        # the manifests carry what the lake was built with, which trumps
        # a caller's default config — the key hash is order-dependent,
        # so a caller supplying {path, repo} in the wrong order would
        # probe the wrong partition and silently miss the key
        manifests = read_manifests(cfg.lake_dir)
        nparts = next(
            (int(m["num_partitions"]) for m in manifests.values()
             if "num_partitions" in m),
            cfg.num_partitions,
        )
        key_columns = next(
            (tuple(m["key_columns"]) for m in manifests.values()
             if "key_columns" in m),
            cfg.key_columns,
        )
        missing = [c for c in key_columns if c not in key]
        if missing:
            raise ValueError(f"point_lookup needs every key column; missing {missing}")
        kt = pa.table({c: pa.array([key[c]]) for c in key_columns})
        part = int(hash_key(kt, key_columns)[0] % np.uint64(nparts))
        t = read_partition_state(
            cfg.lake_dir, part, manifests.get(part),
            key_columns, cfg.seq_column, as_of=as_of,
            key_equals={c: key[c] for c in key_columns},
        )
        if t is None or not t.num_rows:
            return STATE_SCHEMA.empty_table()
        from sapray.schema import normalize_table

        return normalize_table(t, STATE_SCHEMA)

    def state_table(self, as_of: int | None = None) -> pa.Table:
        """Whole committed lake as one Arrow table — tests/small scales only."""
        from sapray.sink import read_partition_state
        from sapray.transform import STATE_SCHEMA

        manifests = read_manifests(self.cfg.lake_dir)
        tables = []
        for p in sorted(manifests):
            t = read_partition_state(
                self.cfg.lake_dir, p, manifests[p],
                self.cfg.key_columns, self.cfg.seq_column, as_of=as_of,
            )
            if t is not None and t.num_rows:
                from sapray.schema import normalize_table

                tables.append(normalize_table(t, STATE_SCHEMA))
        return pa.concat_tables(tables) if tables else STATE_SCHEMA.empty_table()
