"""Deterministic SAP SLT/ODP-style change-log generator (FIXTURES.md §2).

Models the reference's delta-queue semantics (ordered change events with
INSERT/UPDATE/DELETE op codes and DDIC-style field-metadata versions)
over the driver's repo-table shape ``(repo, path, commit, lang,
content)`` (BASELINE.json input_hint). Content text is drawn from the
driver's ``documents.parquet`` at the given scale factor (TESTDATA.md —
no external data); everything else is seeded numpy, fully vectorized.

Layout (multi-schema, one directory per DDIC metadata version):

    out_dir/v1/chunk-*.parquet   # schema_ver=1: no size_bytes column
    out_dir/v2/chunk-*.parquet   # schema_ver=2: + size_bytes:int32
    out_dir/v3/chunk-*.parquet   # schema_ver=3: size_bytes widened int64
    out_dir/_meta.json

ABAP-style raw encodings the decode stage (O-CDC2) must undo:
``lang`` is right-padded to 4 chars; the commit timestamp is split into
``commit_date`` ("YYYYMMDD") and ``commit_time`` ("HHMMSS") strings —
mirroring the reference's per-type extractors (DateTime handling,
``reference src/main/java/io/cdap/plugin/sap/transformer/ODataEntryToRecordTransformer.java:358-368``).
"""

from __future__ import annotations

import binascii
import json
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
HOT_REPO = "org0/repo0"
HOT_PATH = "src/hot/README.md"
_LANGS = ["py", "java", "rs", "go", "md"]
_EXT = {"py": "py", "java": "java", "rs": "rs", "go": "go", "md": "md"}


def _hex16(a: np.ndarray) -> np.ndarray:
    """Vectorized 16-char lowercase hex of a uint64 array (no Python loop)."""
    b = np.ascontiguousarray(a.astype(">u8")).tobytes()
    h = binascii.hexlify(b)
    return np.frombuffer(h, dtype="S16")


def _commit_ids(kh: np.ndarray, seq: np.ndarray) -> pa.Array:
    """Deterministic 40-hex commit ids: hex(keyhash)||hex(seq)||'00000000'."""
    h = np.char.add(np.char.add(_hex16(kh), _hex16(seq.astype(np.uint64))), b"00000000")
    return pa.array(h.astype("U40"))


def base_table(sf_dir: str) -> dict[str, np.ndarray]:
    """Deterministic base ``repos`` corpus derived from documents.parquet."""
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    texts = np.asarray(docs.column("text").to_pandas(), dtype=object)
    n = len(texts)
    i = np.arange(n)
    repo = np.array([f"org{x % 7}/repo{x % 101}" for x in i], dtype=object)
    lang = np.array([_LANGS[x % len(_LANGS)] for x in i], dtype=object)
    path = np.array(
        [f"src/dir{x % 13}/file{x}.{_EXT[_LANGS[x % len(_LANGS)]]}" for x in i],
        dtype=object,
    )
    # one designated hot key for skew exercises
    repo[0] = HOT_REPO
    path[0] = HOT_PATH
    return {"repo": repo, "path": path, "lang": lang, "content": texts}


@dataclass
class ChangelogMeta:
    n_base: int
    n_events: int
    out_dir: str
    segments: list[str]

    def to_json(self) -> str:
        return json.dumps(self.__dict__)


def _pad_lang(lang_obj: np.ndarray) -> pa.Array:
    """ABAP-style fixed-width (right-padded to 4) lang codes."""
    return pa.array(np.char.ljust(lang_obj.astype("U8"), 4).astype(object))


def _date_time_cols(seq: np.ndarray) -> tuple[pa.Array, pa.Array]:
    """Deterministic ABAP date/time strings from seq (one minute per event)."""
    base = np.datetime64("2024-01-01T00:00:00")
    ts = base + (seq % (365 * 24 * 60)).astype("timedelta64[m]")
    s = np.datetime_as_string(ts, unit="s")  # 2024-01-01T00:00:00
    u = s.view("U1").reshape(len(s), -1)
    date = np.frombuffer(
        np.ascontiguousarray(u[:, [0, 1, 2, 3, 5, 6, 8, 9]]).tobytes(), dtype="U8"
    )
    time = np.frombuffer(
        np.ascontiguousarray(u[:, [11, 12, 14, 15, 17, 18]]).tobytes(), dtype="U6"
    )
    return pa.array(date.astype(object)), pa.array(time.astype(object))


def _key_hash(repo: np.ndarray, path: np.ndarray) -> np.ndarray:
    import pandas as pd

    h1 = pd.util.hash_array(repo, categorize=False)
    h2 = pd.util.hash_array(path, categorize=False)
    return h1 * np.uint64(0x9E3779B97F4A7C15) ^ h2


def _events_chunk(
    repo: np.ndarray,
    path: np.ndarray,
    lang: np.ndarray,
    content: np.ndarray,
    seq: np.ndarray,
    op: np.ndarray,
    schema_ver: int,
) -> pa.Table:
    kh = _key_hash(repo, path)
    is_del = op == "D"
    content = content.copy()
    content[is_del] = None
    lang = lang.copy()
    date_col, time_col = _date_time_cols(seq)
    cols = {
        "seq": pa.array(seq, type=pa.int64()),
        "op": pa.array(op.astype(object)),
        "repo": pa.array(repo),
        "path": pa.array(path),
        "commit": _commit_ids(kh, seq),
        "commit_date": date_col,
        "commit_time": time_col,
        "lang": _pad_lang(lang),
        "content": pa.array(content, type=pa.large_string()),
        "schema_ver": pa.array(np.full(len(seq), schema_ver, dtype=np.int32)),
    }
    if schema_ver >= 2:
        import pyarrow.compute as pc

        t = pa.int32() if schema_ver == 2 else pa.int64()
        # utf8_length of null content is null — deletes carry null size
        cols["size_bytes"] = pc.utf8_length(cols["content"]).cast(t)
    return pa.table(cols)


def generate_changelog(
    sf_dir: str,
    out_dir: str,
    n_updates: int = 20_000,
    seed: int = SEED,
    multiplier: int = 1,
    rows_per_file: int = 250_000,
    hot_share: float = 0.2,
    dup_share: float = 0.01,
    force: bool = False,
) -> ChangelogMeta:
    """Generate the ordered change log deterministically; cached on disk.

    Base rows become ``I`` events (schema v1); then ``n_updates *
    multiplier`` seeded U/D events, seq strictly increasing, split into
    three equal DDIC-version segments (v1 -> v2 adds size_bytes:int32 ->
    v3 widens to int64). ~``dup_share`` of update events are emitted
    twice with identical payloads (idempotent-dedup exercise, O-CDC8);
    ``hot_share`` of updates target the single hot key.
    """
    meta_path = os.path.join(out_dir, "_meta.json")
    params = dict(
        sf_dir=sf_dir,
        n_updates=n_updates,
        seed=seed,
        multiplier=multiplier,
        hot_share=hot_share,
        dup_share=dup_share,
        rows_per_file=rows_per_file,
        v=5,  # v5: content is large_string (int64 offsets)
    )
    if not force and os.path.exists(meta_path):
        with open(meta_path) as f:
            old = json.load(f)
        if old.get("params") == params:
            return ChangelogMeta(
                old["n_base"], old["n_events"], out_dir, old["segments"]
            )
    base = base_table(sf_dir)
    n_base = len(base["repo"])
    rng = np.random.default_rng(seed)
    total_updates = n_updates * multiplier

    import shutil

    for sub in ("v1", "v2", "v3"):
        # wipe stale segments: a param change (e.g. rows_per_file) can
        # leave leftover higher-index chunk files behind otherwise
        shutil.rmtree(os.path.join(out_dir, sub), ignore_errors=True)
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)

    # --- segment boundaries over the update stream
    b1 = total_updates // 3
    b2 = 2 * total_updates // 3

    writers: dict[str, int] = {"v1": 0, "v2": 0, "v3": 0}
    n_events = 0

    def _write(tbl: pa.Table, seg: str) -> None:
        nonlocal n_events
        idx = writers[seg]
        writers[seg] += 1
        tmp = os.path.join(out_dir, seg, f".tmp-chunk-{idx:05d}.parquet")
        pq.write_table(tbl, tmp, row_group_size=65_536)
        os.replace(tmp, os.path.join(out_dir, seg, f"chunk-{idx:05d}.parquet"))
        n_events += tbl.num_rows

    # --- base inserts (schema v1)
    for lo in range(0, n_base, rows_per_file):
        hi = min(lo + rows_per_file, n_base)
        seq = np.arange(lo, hi, dtype=np.int64)
        _write(
            _events_chunk(
                base["repo"][lo:hi],
                base["path"][lo:hi],
                base["lang"][lo:hi],
                base["content"][lo:hi],
                seq,
                np.full(hi - lo, "I", dtype=object),
                1,
            ),
            "v1",
        )

    # --- update/delete stream, chunked
    texts = base["content"]
    for lo in range(0, total_updates, rows_per_file):
        hi = min(lo + rows_per_file, total_updates)
        m = hi - lo
        seq = n_base + np.arange(lo, hi, dtype=np.int64)
        tgt = rng.integers(0, n_base, size=m)
        hot = rng.random(m) < hot_share
        tgt[hot] = 0  # the hot key is base row 0
        op = np.where(rng.random(m) < 0.15, "D", "U").astype(object)
        # new content: another doc's text + a deterministic revision suffix
        src = rng.integers(0, n_base, size=m)
        suffix = np.char.add(b"\n// rev ", _hex16(seq.astype(np.uint64))).astype("U32")
        content = np.char.add(texts[src].astype("U"), suffix).astype(object)
        repo, path, lang = base["repo"][tgt], base["path"][tgt], base["lang"][tgt]
        # inject duplicated (key, seq) events with identical payloads
        dup = np.nonzero(rng.random(m) < dup_share)[0]
        if len(dup):
            sel = np.concatenate([np.arange(m), dup])
            sel.sort(kind="stable")
            repo, path, lang, content, seq, op = (
                a[sel] for a in (repo, path, lang, content, seq, op)
            )
        # split at DDIC-version boundaries so each file has one schema
        bounds = sorted({lo, hi, *[c for c in (b1, b2) if lo < c < hi]})
        for a, b in zip(bounds[:-1], bounds[1:]):
            mask = (seq - n_base >= a) & (seq - n_base < b)
            v = 1 if a < b1 else (2 if a < b2 else 3)
            _write(
                _events_chunk(
                    repo[mask], path[mask], lang[mask], content[mask],
                    seq[mask], op[mask], v,
                ),
                f"v{v}",
            )

    segments = [os.path.join(out_dir, s) for s in ("v1", "v2", "v3")]
    meta = ChangelogMeta(n_base, n_events, out_dir, segments)
    with open(meta_path + ".tmp", "w") as f:
        json.dump(
            {
                "n_base": n_base,
                "n_events": n_events,
                "segments": segments,
                "params": params,
            },
            f,
        )
    os.replace(meta_path + ".tmp", meta_path)
    return meta


AMPLIFY_STRIDE = 1 << 40  # > any realistic on-disk seq


def amplify_batch(batch: pa.Table, ampl: int, stride: int = AMPLIFY_STRIDE) -> pa.Table:
    """In-flight row multiplication (the driver's 10^10-scale proxy).

    Each event batch is replicated ``ampl``x: replica ``j`` shifts ``seq``
    by ``j * stride`` (order preserved, still globally unique) and
    suffixes ``path`` with ``~j`` (disjoint key space, so the replicas are
    real additional work for every stage: hash, shuffle, LWW, sink).
    Deterministic, vectorized, and applied identically in every pass, so
    winner resolution and payload filtering stay consistent. Realized
    event count = on-disk events x ampl.
    """
    if ampl <= 1:
        return batch
    out = [batch]
    for j in range(1, ampl):
        out.append(shift_replica(batch, j, stride))
    return pa.concat_tables(out)


def shift_replica(batch: pa.Table, j: int, stride: int = AMPLIFY_STRIDE) -> pa.Table:
    """Replica ``j`` of an event batch: seq += j*stride, path ||= ~j."""
    import pyarrow.compute as pc

    seq_i = batch.column_names.index("seq")
    path_i = batch.column_names.index("path")
    t = batch.set_column(
        seq_i,
        batch.field(seq_i),
        pc.add(batch.column("seq"), pa.scalar(j * stride, pa.int64())),
    )
    return t.set_column(
        path_i,
        batch.field(path_i),
        pc.binary_join_element_wise(batch.column("path"), pa.scalar(f"~{j:03d}"), ""),
    )


def oracle_replay(out_dir: str) -> dict[tuple[str, str], dict]:
    """Pure-Python dict replay oracle (SURVEY.md §5c): key -> max-seq row,
    deletes removed. Test-scale only."""
    import glob

    rows: dict[tuple[str, str], dict] = {}
    tables = []
    for f in sorted(glob.glob(os.path.join(out_dir, "v*", "*.parquet"))):
        tables.append(pq.read_table(f))
    events: list[dict] = []
    for t in tables:
        events.extend(t.to_pylist())
    events.sort(key=lambda r: r["seq"])
    for r in events:
        key = (r["repo"], r["path"])
        if r["op"] == "D":
            rows.pop(key, None)
        else:
            rows[key] = r
    return rows
