"""Sequence packing: assign documents to fixed token-budget training bins.

The standard pretraining prep step after tokenization — documents are
concatenated in a deterministic global order (by ``id_column``) and cut
into bins of ``budget`` tokens; each document belongs to the bin where
its first token lands. The physical plan is a DISTRIBUTED PREFIX SUM:

  pass 1  per range-bucket (``id // bucket_width``) token totals — a tiny
          grouped aggregate (one row per bucket, ~16 B each);
  driver  exclusive prefix over the sorted bucket totals (O(#buckets),
          pure numpy — 1e9 docs / bucket_width=4096 -> 250k rows);
  pass 2  ONE keyed exchange on the bucket id; inside each partition a
          vectorized per-bucket cumsum rebased on the broadcast bucket
          offsets yields every document's global token offset.

No stage materializes the corpus; the only all-to-all moves
(id, n_tokens) pairs — ~16 B/doc regardless of document size.

The reference has no packing analog (it is a source + per-record
transformer, ``reference src/main/java/io/cdap/plugin/sap/SapODataSource.java``);
this is part of the engine-added training-data surface (SURVEY.md §2.7).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from sapray.window import partitioned_apply


def pack_by_token_budget(
    ds: ray.data.Dataset,
    id_column: str,
    token_column: str,
    budget: int,
    bucket_width: int = 4096,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Add ``tok_before`` / ``bin_id`` / ``bin_offset`` columns.

    ``tok_before`` is the exact number of tokens in all documents with a
    smaller ``id_column``; ``bin_id = tok_before // budget`` and
    ``bin_offset = tok_before % budget``. Requires distinct ids.
    """
    if budget <= 0 or bucket_width <= 0:
        raise ValueError("budget and bucket_width must be positive")

    def add_bucket(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        bucket = (ids // bucket_width).astype(np.int64)
        return batch.append_column("__bucket", pa.array(bucket))

    keyed = ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)

    # pass 1: tiny aggregate -> driver-side exclusive prefix per bucket
    totals = keyed.groupby("__bucket").sum(token_column).to_pandas()
    if len(totals):
        totals = totals.sort_values("__bucket").reset_index(drop=True)
        buckets = totals["__bucket"].to_numpy()
        sums = totals[f"sum({token_column})"].to_numpy().astype(np.int64)
        offsets = np.concatenate([[0], np.cumsum(sums)[:-1]])
    else:  # empty input: no bucket partials (nor columns) at all
        buckets = np.array([], dtype=np.int64)
        offsets = np.array([], dtype=np.int64)
    # broadcast the (bucket -> tokens-before-bucket) map via task closure:
    # one row per bucket, so even a billion-doc corpus ships ~4 MB
    offset_by_bucket = dict(zip(buckets.tolist(), offsets.tolist()))

    def sweep(part: pa.Table) -> pa.Table:
        ids = part.column(id_column).to_numpy(zero_copy_only=False)
        # NULL token counts pack as 0 (matching pass 1's null-skipping
        # sum) — a raw astype would turn the NaN into INT64_MIN and
        # poison every later prefix in the partition (review finding;
        # same class as window.rows_window_sum's documented fix)
        tok_col = part.column(token_column)
        if tok_col.null_count:
            tok_col = pa.compute.fill_null(tok_col, 0)
        toks = tok_col.to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = ids // bucket_width
        order = np.lexsort((ids, bucket))
        part = part.take(pa.array(order))
        ids, toks, bucket = ids[order], toks[order], bucket[order]
        # cumsum across the whole partition, rebased at each bucket run
        # start to that bucket's global offset
        csum = np.cumsum(toks)
        before = csum - toks
        starts = np.concatenate([[0], np.nonzero(np.diff(bucket))[0] + 1])
        base = np.array(
            [offset_by_bucket[int(bucket[s])] for s in starts], dtype=np.int64
        )
        run_id = np.searchsorted(starts, np.arange(len(ids)), side="right") - 1
        tok_before = before - before[starts][run_id] + base[run_id]
        out = part.drop_columns(["__bucket"])
        out = out.append_column("tok_before", pa.array(tok_before))
        out = out.append_column("bin_id", pa.array(tok_before // budget))
        return out.append_column("bin_offset", pa.array(tok_before % budget))

    return partitioned_apply(keyed, "__bucket", sweep, num_partitions)
