"""Vectorized, run-stable hashing helpers.

The partition id ``hash(repo, path) % P`` must be *stable across runs*
(the lake layout, watermarks, and resume manifests are all keyed by
partition id — O-CDC4/6/7), so we use pandas' fixed-key siphash
(``pd.util.hash_array``; the key is a hardcoded constant, not
process-randomized like Python's ``hash()``), applied to a
null-byte-joined composite of the key columns built with a zero-copy
pyarrow kernel. Throughput is ~5-10M rows/s/core — C-speed, no Python
row loop.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def composite_key(table: pa.Table, key_columns: tuple[str, ...]) -> pa.Array:
    """Join key columns with a ``\\x00`` separator into one string array.

    Non-string key columns (e.g. an int64 ``user_id``) are cast to their
    canonical string form first, so any column mix can key a shuffle.
    """
    cols = []
    widths = set()
    for c in key_columns:
        col = table.column(c)
        if not (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)):
            col = pc.cast(col, pa.string())
        widths.add(pa.types.is_large_string(col.type))
        cols.append(col)
    if len(cols) == 1:
        arr = cols[0]
    else:
        # the join kernel needs ONE string width across inputs AND the
        # separator — an all-large_string key set would otherwise fail
        # kernel dispatch (string kernels must accept both widths,
        # CLAUDE.md invariant)
        if True in widths:
            cols = [
                pc.cast(c, pa.large_string())
                if not pa.types.is_large_string(c.type) else c
                for c in cols
            ]
            sep = pa.scalar("\x00", pa.large_string())
        else:
            sep = "\x00"
        arr = pc.binary_join_element_wise(*cols, sep)
    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr


def hash_key(table: pa.Table, key_columns: tuple[str, ...]) -> np.ndarray:
    """Stable uint64 hash of the composite key, vectorized.

    ``categorize=False`` is load-bearing: pandas' default categorize path
    is NOT value-deterministic — the hash of a string then depends on the
    surrounding array's category structure, so the same key could land on
    different partitions in different batches (observed at sf0.1: every
    key fanned out to ~7 partitions). ``categorize=False`` is a pure
    per-element fixed-key siphash.
    """
    arr = composite_key(table, key_columns)
    # hash each DISTINCT key once (C++ dictionary encode, then siphash of
    # the dictionary values only, then gather). Our own encode+gather is
    # value-deterministic by construction — unlike pandas' categorize path.
    enc = arr.dictionary_encode()
    h = pd.util.hash_array(
        np.asarray(enc.dictionary.to_pandas(), dtype=object), categorize=False
    )
    idx = enc.indices
    if idx.null_count:
        # NULL keys: one deterministic hash (SQL groups all NULLs
        # together); raw null indices surface as NaN and break the
        # gather. NOTE: this is PARTITIONING semantics — a distinct
        # COUNT over these hashes would count NULL as a value; use
        # drop_null_keys first for COUNT(DISTINCT) semantics.
        h = np.concatenate([h, [np.uint64(0x9E3779B97F4A7C15)]])
        idx = pc.fill_null(idx, len(h) - 1)
    return h[idx.to_numpy(zero_copy_only=False)]


def drop_null_keys(table: pa.Table, key_columns: tuple[str, ...]) -> pa.Table:
    """Rows whose key components are all non-null — SQL COUNT(DISTINCT)
    excludes rows with any NULL expression; distinct-count sketches must
    apply this BEFORE hashing (the partitioning hash maps every
    null-bearing composite to one sentinel, which would silently count
    all of them as a single value)."""
    mask = None
    for c in key_columns:
        v = pc.is_valid(table.column(c))
        mask = v if mask is None else pc.and_(mask, v)
    if mask is None or pc.min(mask).as_py() in (True, None):
        return table
    return table.filter(mask)


def partition_ids(
    table: pa.Table, key_columns: tuple[str, ...], num_partitions: int
) -> tuple[np.ndarray, np.ndarray]:
    """Return ``(key_hash_u64, part_id_i32)`` for each row."""
    kh = hash_key(table, key_columns)
    part = (kh % np.uint64(num_partitions)).astype(np.int32)
    return kh, part


def sha256_hex_column(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Per-row sha256 hexdigest of a string/binary column.

    sha256 is inherently per-row work, but the loop hashes straight over
    the Arrow value buffer via (offset, offset+len) memoryview slices —
    no scalar boxing, no Python-str materialization, no utf-8 re-encode
    (Arrow string columns already store utf-8 bytes). ~1.5x a
    ``to_pylist()`` loop at 200-char rows (sha256 itself dominates);
    matches DuckDB's ``sha256(text)`` hex.
    """
    chunks = arr.chunks if isinstance(arr, pa.ChunkedArray) else [arr]
    out: list[str | None] = []
    sha = hashlib.sha256
    for chunk in chunks:
        n = len(chunk)
        if n == 0:
            continue
        t = chunk.type
        off_dtype = (
            np.int64
            if (pa.types.is_large_string(t) or pa.types.is_large_binary(t))
            else np.int32
        )
        bufs = chunk.buffers()
        # buffers: [validity, offsets, data]; offsets are absolute into
        # the (possibly shared) data buffer, shifted by the chunk offset
        offsets = np.frombuffer(
            bufs[1], dtype=off_dtype, count=n + 1 + chunk.offset
        )[chunk.offset :].tolist()  # python ints slice faster than np ints
        data = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
        if chunk.null_count == 0:
            out.extend(
                sha(data[s:e]).hexdigest() for s, e in zip(offsets, offsets[1:])
            )
        else:
            valid = pc.is_valid(chunk).to_numpy(zero_copy_only=False)
            out.extend(
                sha(data[s:e]).hexdigest() if v else None
                for (s, e), v in zip(zip(offsets, offsets[1:]), valid)
            )
    return pa.array(out, type=pa.string())


# manifest tag for the state_sha construction. "adhash-add-v1" is the
# current ADD-fold; the earlier (unreleased) xor fold had no tag, so a
# manifest missing `state_sha_algo` or carrying an older value is an
# OLD HASH FORMAT, not state corruption (advisory finding) — verifiers
# must compare the tag before comparing the digest.
STATE_SHA_ALGO = "adhash-add-v1"


def table_state_sha(table: pa.Table, key_columns: tuple[str, ...]) -> str:
    """Order-insensitive sha256 over the rows of a final-state table.

    Used for the manifest ``state_sha`` (O-CDC6) and test assertions:
    hash per-row ``key -> content_sha256``, ADD-folded mod 2^256 (the
    AdHash multiset construction). An xor fold was multiplicity-blind —
    a row duplicated an even number of times cancelled to nothing, so a
    double-emit bug hashed identically to the correct state, which is
    exactly the regression class this check exists to catch (review
    finding). Addition keeps order independence but counts copies.
    """
    if table.num_rows == 0:
        return hashlib.sha256(b"").hexdigest()
    keys = composite_key(table, key_columns)
    shas = table.column("content_sha256") if "content_sha256" in table.column_names else sha256_hex_column(table.column("content"))
    acc = 0
    for k, s in zip(keys.to_pylist(), shas.to_pylist()):
        h = hashlib.sha256(f"{k}\x00{s}".encode()).digest()
        acc = (acc + int.from_bytes(h, "little")) % (1 << 256)
    return hashlib.sha256(acc.to_bytes(32, "little")).hexdigest()
