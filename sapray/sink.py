"""Exactly-once, manifest-guarded Parquet upsert sink (O-CDC6, O-CDC7).

Layout (resumable; one directory per partition so a rerun skips
finished partitions):

    lake_dir/
      part=00017/data-w<watermark>-<sha12>.parquet
      _manifests/part-00017.json   {part, watermark, files, row_count, state_sha}

Exactly-once under Ray task retries is by construction:

* snapshot files are **content-addressed** (state sha in the name) and
  written temp-then-``os.replace`` — a retried applier recomputes the
  identical bytes and atomically replaces with the same name;
* manifests are **compare-and-keep**: a manifest is only replaced when
  the new watermark is strictly higher, so a stale retry can never
  regress committed state (monotonic per-partition watermark);
* resume reads the manifests and filters replayed events
  ``seq <= watermark`` per partition (see ``partition.assign_partitions``).

This also supplies the reference's lineage-recording duty
(``reference src/main/java/io/cdap/plugin/sap/SapODataSource.java:102-108``)
as per-partition lineage manifests (S10/S11).
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST_DIR = "_manifests"


def _state_sha_algo() -> str:
    # deferred import: sink must stay importable without pulling the
    # hashing module's pandas dependency at module load
    from sapray.hashing import STATE_SHA_ALGO

    return STATE_SHA_ALGO


def _part_dir(lake_dir: str, part: int) -> str:
    return os.path.join(lake_dir, f"part={part:05d}")


def _manifest_path(lake_dir: str, part: int) -> str:
    return os.path.join(lake_dir, MANIFEST_DIR, f"part-{part:05d}.json")


def read_manifest(lake_dir: str, part: int) -> dict | None:
    """Load ONE partition's manifest (applier hot path — avoids listing
    and parsing every manifest in every apply task)."""
    mpath = _manifest_path(lake_dir, part)
    if not os.path.exists(mpath):
        return None
    with open(mpath) as f:
        return json.load(f)


def read_manifests(lake_dir: str) -> dict[int, dict]:
    """Load all committed partition manifests (empty dict on fresh lake)."""
    mdir = os.path.join(lake_dir, MANIFEST_DIR)
    out: dict[int, dict] = {}
    if not os.path.isdir(mdir):
        return out
    for name in os.listdir(mdir):
        if name.startswith("part-") and name.endswith(".json"):
            with open(os.path.join(mdir, name)) as f:
                m = json.load(f)
            out[m["part"]] = m
    return out


def _history_floor(files: list[str]) -> int:
    """Oldest state representable by this file list: the max watermark of
    any base SNAPSHOT file (``data-w…``). Compaction folds all history at
    or below its watermark into one snapshot of winners, so states before
    it are unrecoverable. -1 when the full delta chain is intact."""
    floors = [
        int(f.split("-")[1][1:]) for f in files if f.startswith("data-w")
    ]
    return max(floors, default=-1)


def _column_stats(table: pa.Table, stats_columns) -> dict:
    """Per-file zone map: [min, max] per stats column (JSON-serializable
    key types only — strings/ints)."""
    stats: dict = {}
    for c in stats_columns or ():
        if c in table.column_names and table.num_rows:
            col = table.column(c)
            stats[c] = [pa.compute.min(col).as_py(),
                        pa.compute.max(col).as_py()]
    return stats


def _prune_files(manifest: dict, key_equals: dict | None) -> list[str]:
    """Files that MAY contain the key per the manifest zone maps. A file
    without recorded stats is always kept (pruning must never lose a
    key); exact for key-equality predicates — a delta/tombstone file
    whose key range excludes the key contributes nothing to its merge."""
    files = list(manifest.get("files", []))
    if not key_equals:
        return files
    stats = manifest.get("stats", {})

    def may_contain(f: str) -> bool:
        st = stats.get(f)
        if not st:
            return True
        for c, v in key_equals.items():
            if c in st and not (st[c][0] <= v <= st[c][1]):
                return False
        return True

    return [f for f in files if may_contain(f)]


def read_partition_state(
    lake_dir: str,
    part: int,
    manifest: dict | None,
    key_columns: tuple[str, ...] = ("repo", "path"),
    seq_column: str = "seq",
    as_of: int | None = None,
    key_equals: dict | None = None,
) -> pa.Table | None:
    """Read the committed state for a partition via its manifest.

    Snapshot mode: one full file. Delta mode: the base snapshot plus the
    ordered delta files are merged on read — last-writer-wins by
    ``seq_column`` per ``key_columns``, tombstone rows (``is_delete``)
    removed. Callers with a non-default key config must thread
    ``cfg.key_columns``/``cfg.seq_column`` through.

    ``as_of`` time-travels to the state as of that sequence watermark:
    delta rows with seq > as_of are excluded BEFORE the merge, so keys
    updated or tombstoned later revert to their older committed value.
    Exact at commit boundaries (each commit stores only its window's
    winners — intermediate per-event states never existed in the lake).
    Raises when the requested point predates the retained history
    (snapshot-mode lakes retain none; compaction folds history up to its
    watermark).

    ``key_equals`` ({column: value} over key columns) is a point-lookup
    predicate: files whose manifest zone maps exclude the key are never
    opened, and the merged result is row-filtered to the key.
    """
    if not manifest or not manifest.get("files"):
        return None
    pdir = _part_dir(lake_dir, part)
    travel = as_of is not None and as_of < manifest.get("watermark", -1)
    if travel:
        floor = _history_floor(manifest["files"])
        if manifest.get("mode") != "delta" or as_of < floor:
            raise ValueError(
                f"cannot time-travel partition {part} to seq {as_of}: "
                + ("snapshot-mode lakes retain no history"
                   if manifest.get("mode") != "delta"
                   else f"history compacted up to seq {floor}")
            )
    files = _prune_files(manifest, key_equals)
    if not files:
        return None
    tables = [pq.read_table(os.path.join(pdir, f)) for f in files]
    if travel:
        import pyarrow.compute as pc

        tables = [
            t.filter(pc.less_equal(t.column(seq_column), as_of)) for t in tables
        ]
    if len(tables) == 1 and "is_delete" not in tables[0].column_names:
        out = tables[0]
    else:
        out = merge_delta_states(tables, key_columns, seq_column)
    if key_equals and out is not None:
        import pyarrow.compute as pc

        mask = None
        for c, v in key_equals.items():
            m = pc.equal(out.column(c), v)
            mask = m if mask is None else pc.and_(mask, m)
        out = out.filter(mask)
    return out


def read_partition_changes(
    lake_dir: str,
    part: int,
    manifest: dict | None,
    seq_column: str = "seq",
    since: int = -1,
    until: int | None = None,
) -> pa.Table | None:
    """Change-data-feed for one partition: the ordered stream of committed
    change rows (upserts + tombstones) with ``since < seq <= until``.

    Delta-mode lakes store exactly these rows — each commit appends its
    window's per-key winners — so the feed is a metadata-pruned scan of
    the delta files (a file whose name watermark is <= ``since`` cannot
    contain feed rows), no merge. Rows superseded *within* one commit
    window never existed in the lake, same boundary-exactness contract as
    time travel. Output adds ``change_op`` ('U' upsert / 'D' delete) and
    is seq-ordered. Raises when ``since`` predates the retained history
    (snapshot-mode lakes keep none; compaction folds history up to its
    watermark)."""
    import pyarrow.compute as pc

    if not manifest or not manifest.get("files"):
        return None
    if since >= manifest.get("watermark", -1):
        # nothing committed in (since, now] — empty feed regardless of how
        # much older history was folded away (snapshot/compacted included)
        return None
    if manifest.get("mode") != "delta":
        # a fully-compacted delta partition is indistinguishable from a
        # snapshot one (compaction rewrites the manifest in snapshot form)
        raise ValueError(
            f"partition {part}: no change history retained "
            "(snapshot mode or fully compacted)"
        )
    floor = _history_floor(manifest["files"])
    if since < floor:
        raise ValueError(
            f"partition {part}: change history compacted up to seq {floor}"
        )
    pdir = _part_dir(lake_dir, part)
    tables = []
    for f in manifest["files"]:
        # name watermark upper-bounds the file's seqs; base snapshots
        # (data-w…) hold only folded history at/below the floor <= since
        if f.startswith("data-w") or int(f.split("-")[1][1:]) <= since:
            continue
        t = pq.read_table(os.path.join(pdir, f))
        seq = t.column(seq_column)
        mask = pc.greater(seq, since)
        if until is not None:
            mask = pc.and_(mask, pc.less_equal(seq, until))
        tables.append(t.filter(mask))
    if not tables:
        return None
    feed = pa.concat_tables(tables, promote_options="default")
    is_del = feed.column("is_delete").combine_chunks()
    change_op = pc.if_else(is_del, "D", "U")
    feed = feed.drop_columns(["is_delete"]).append_column("change_op", change_op)
    order = pc.sort_indices(feed.column(seq_column))
    return feed.take(order)


def merge_delta_states(
    tables: list[pa.Table],
    key_columns: tuple[str, ...] = ("repo", "path"),
    seq_column: str = "seq",
) -> pa.Table:
    """LWW-merge snapshot + delta tables; drop tombstones (O-CDC5 merge
    semantics applied at read/compaction time)."""
    import pyarrow.compute as pc

    norm = []
    for t in tables:
        if "is_delete" not in t.column_names:
            t = t.append_column(
                "is_delete", pa.array(np.zeros(t.num_rows, dtype=bool))
            )
        norm.append(t)
    merged = pa.concat_tables(norm, promote_options="default")
    from sapray.partition import lww_reduce

    winners = lww_reduce(merged, key_columns, seq_column)
    live = winners.filter(pc.invert(winners.column("is_delete").combine_chunks()))
    return live.drop_columns(["is_delete"])


def commit_partition(
    lake_dir: str,
    part: int,
    state: pa.Table,
    watermark: int,
    state_sha: str,
    extra: dict | None = None,
    force_replace: bool = False,
    stats_columns: tuple[str, ...] | None = None,
) -> dict:
    """Atomically commit a partition snapshot + manifest.

    Content-addressed filename + temp-write + ``os.replace`` + monotonic
    watermark check = idempotent under retries and speculative
    re-execution. ``stats_columns`` records per-file min/max zone maps
    in the manifest for point-lookup file pruning.
    """
    pdir = _part_dir(lake_dir, part)
    mdir = os.path.join(lake_dir, MANIFEST_DIR)
    os.makedirs(pdir, exist_ok=True)
    os.makedirs(mdir, exist_ok=True)

    mpath = _manifest_path(lake_dir, part)
    if os.path.exists(mpath):
        with open(mpath) as f:
            prev = json.load(f)
        if prev.get("watermark", -1) >= watermark and not (
            force_replace and prev.get("watermark", -1) == watermark
        ):
            return prev  # a newer/equal commit already landed — keep it
            # (force_replace allows equal-watermark compaction rewrites)

    fname = f"data-w{watermark:016d}-{state_sha[:12]}.parquet"
    fpath = os.path.join(pdir, fname)
    if not os.path.exists(fpath):
        tmp = os.path.join(pdir, f".tmp-{uuid.uuid4().hex}.parquet")
        pq.write_table(state, tmp, row_group_size=65_536)
        os.replace(tmp, fpath)

    manifest = {
        "part": part,
        "watermark": watermark,
        "files": [fname],
        "row_count": state.num_rows,
        "state_sha": state_sha,
        "state_sha_algo": _state_sha_algo(),
        **({"stats": {fname: _column_stats(state, stats_columns)}}
           if stats_columns else {}),
        **(extra or {}),
    }
    tmp = mpath + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, mpath)
    return manifest


def commit_partition_delta(
    lake_dir: str,
    part: int,
    delta: pa.Table,
    watermark: int,
    delta_sha: str,
    extra: dict | None = None,
    stats_columns: tuple[str, ...] | None = None,
) -> dict:
    """Append ONE delta file to a partition (write-optimized sink mode).

    The applier never reads prior state: it writes only this replay
    window's winner rows (+ tombstones) as a content-addressed file and
    appends it to the manifest's ordered file list. Exactly-once under
    retries: identical recomputed bytes -> same filename -> idempotent
    ``os.replace``; the monotonic watermark guard drops stale retries.
    Merge happens on read (``merge_delta_states``) or at compaction.
    """
    pdir = _part_dir(lake_dir, part)
    mdir = os.path.join(lake_dir, MANIFEST_DIR)
    os.makedirs(pdir, exist_ok=True)
    os.makedirs(mdir, exist_ok=True)

    mpath = _manifest_path(lake_dir, part)
    prev: dict | None = None
    if os.path.exists(mpath):
        with open(mpath) as f:
            prev = json.load(f)
        if prev.get("watermark", -1) >= watermark:
            return prev

    fname = f"delta-w{watermark:016d}-{delta_sha[:12]}.parquet"
    fpath = os.path.join(pdir, fname)
    if not os.path.exists(fpath):
        tmp = os.path.join(pdir, f".tmp-{uuid.uuid4().hex}.parquet")
        pq.write_table(delta, tmp, row_group_size=65_536)
        os.replace(tmp, fpath)

    files = list(prev.get("files", [])) if prev else []
    files.append(fname)
    stats = dict(prev.get("stats", {})) if prev else {}
    if stats_columns:
        stats[fname] = _column_stats(delta, stats_columns)
    manifest = {
        "part": part,
        "watermark": watermark,
        "files": files,
        "row_count": -1,  # unknown until compaction/read merge
        "state_sha": delta_sha,
        "state_sha_algo": _state_sha_algo(),
        "mode": "delta",
        **({"stats": {f: s for f, s in stats.items() if f in files}}
           if stats else {}),
        **(extra or {}),
    }
    tmp = mpath + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, mpath)
    return manifest


def compact_partition(
    lake_dir: str,
    part: int,
    key_columns: tuple[str, ...] = ("repo", "path"),
    seq_column: str = "seq",
) -> dict | None:
    """Fold a partition's snapshot + deltas into one snapshot file.

    Bounds merge-on-read cost (run when ``len(files)`` exceeds the
    configured threshold); the commit path is the same content-addressed
    atomic snapshot commit, then unreferenced files are garbage-collected.
    """
    from sapray.hashing import table_state_sha

    manifest = read_manifest(lake_dir, part)
    if not manifest or len(manifest.get("files", [])) <= 1:
        return manifest
    state = read_partition_state(lake_dir, part, manifest, key_columns, seq_column)
    state_sha = table_state_sha(state, key_columns)
    out = commit_partition(
        lake_dir,
        part,
        state,
        manifest["watermark"] + 0,  # same watermark: compaction adds no events
        state_sha,
        stats_columns=key_columns if manifest.get("stats") else None,
        # carry lineage fields forward (resume checks num_partitions)
        extra={
            k: manifest[k]
            for k in ("reference_name", "num_partitions", "key_columns")
            if k in manifest
        },
        force_replace=True,
    )
    gc_partition(lake_dir, part)
    return out


def gc_partition(lake_dir: str, part: int) -> int:
    """Remove snapshot files not referenced by the committed manifest."""
    m = read_manifests(lake_dir).get(part)
    pdir = _part_dir(lake_dir, part)
    if not os.path.isdir(pdir):
        return 0
    keep = set(m["files"]) if m else set()
    removed = 0
    for name in os.listdir(pdir):
        if name not in keep and not name.startswith(".tmp-"):
            os.remove(os.path.join(pdir, name))
            removed += 1
    return removed


def lake_files(lake_dir: str) -> list[str]:
    """All committed snapshot files (via manifests) — the readable lake."""
    files = []
    for part, m in read_manifests(lake_dir).items():
        pdir = _part_dir(lake_dir, part)
        files.extend(os.path.join(pdir, f) for f in m.get("files", []))
    return files
