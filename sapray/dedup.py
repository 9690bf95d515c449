"""Deduplication operators for training-data pipelines.

* exact — sha256-hash + hash-partitioned first-per-group (reuses the
  engine's LWW shuffle plan);
* MinHash + LSH — shingle -> minhash signature per batch (vectorized),
  explode to (band, band_hash, doc) rows, groupby band buckets ->
  candidate pairs -> exact Jaccard verify;
* SimHash — 64-bit vectorized simhash per batch;
* n-gram Jaccard — exact verification kernel;
* embedding-cosine near-dup — LSH-bucketed (random hyperplanes) with
  in-bucket exact cosine.

All heavy per-doc work is inside ``map_batches`` (stateless or actor
pool); the only all-to-all moves are over *hashes/signatures*, never the
full text.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from sapray.ops import dedup_first

# --------------------------------------------------------------------- exact


def add_sha256(
    ds: ray.data.Dataset, text_column: str = "text", out: str = "text_sha"
) -> ray.data.Dataset:
    """Append a sha256-hex column, hashing over Arrow buffer slices
    (no scalar boxing — see ``hashing.sha256_hex_column``)."""
    from sapray.hashing import sha256_hex_column

    def f(batch: pa.Table) -> pa.Table:
        return batch.append_column(out, sha256_hex_column(batch.column(text_column)))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def exact_dedup(
    ds: ray.data.Dataset,
    text_column: str = "text",
    id_column: str = "doc_id",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Keep the min-id row per distinct text (hash-partition + first)."""
    ds = add_sha256(ds, text_column)
    return dedup_first(ds, ("text_sha",), id_column, num_partitions)


# ------------------------------------------------------------------- minhash

_MERSENNE = np.uint64((1 << 61) - 1)


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Stable uint64 hashes of the k-char shingles of ``text``."""
    if len(text) < k:
        text = text.ljust(k)
    b = np.frombuffer(text.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)))
    w = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    pows = np.power(np.uint64(257), np.arange(k, dtype=np.uint64))
    return np.unique((w * pows).sum(axis=1, dtype=np.uint64))


class MinHasher:
    """Per-actor state: the (a, b) hash-family coefficients (seeded)."""

    def __init__(
        self,
        num_perm: int = 64,
        shingle_k: int = 5,
        text_column: str = "text",
        seed: int = 42,
    ):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k
        self.text_column = text_column

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        # (a*x + b) mod p, min over shingles, vectorized over perms
        vals = (sh[None, :] * self.a[:, None] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = np.stack(
            [self.signature(t or "") for t in batch.column(self.text_column).to_pylist()]
        )
        return batch.append_column(
            "minhash", pa.array(list(sigs.astype(np.int64)), pa.list_(pa.int64()))
        )


def minhash_lsh_candidates(
    ds: ray.data.Dataset,
    id_column: str = "doc_id",
    text_column: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    concurrency: int = 4,
) -> ray.data.Dataset:
    """Candidate near-dup pairs via MinHash+LSH.

    shingle->minhash per batch (actor pool) -> explode to
    (band, band_hash, id) -> groupby band buckets -> within-bucket pairs.
    Only signatures cross the shuffle. Output: (id_a, id_b) with
    id_a < id_b, distinct.
    """
    rows_per_band = num_perm // bands

    ds = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={
            "num_perm": num_perm,
            "shingle_k": shingle_k,
            "text_column": text_column,
        },
        batch_format="pyarrow",
        concurrency=(1, concurrency),
    )

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        sigs = np.stack(batch.column("minhash").to_pandas().to_numpy()).astype(np.uint64)
        n = len(ids)
        band_ids = np.repeat(np.arange(bands, dtype=np.int32), n)
        doc_ids = np.tile(ids, bands)
        bh = np.empty(bands * n, dtype=np.uint64)
        for b in range(bands):
            seg = sigs[:, b * rows_per_band : (b + 1) * rows_per_band]
            h = np.zeros(n, dtype=np.uint64)
            for c in range(rows_per_band):
                h = h * np.uint64(1099511628211) + seg[:, c]
            bh[b * n : (b + 1) * n] = h
        return pa.table(
            {
                "band": pa.array(band_ids),
                "band_hash": pa.array(bh.astype(np.int64)),
                id_column: pa.array(doc_ids),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow")

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(group[id_column].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[a], "id_b": ids[b]})

    pairs = exploded.groupby(["band", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    # distinct pairs (a pair can fire in several bands)
    from sapray.ops import distinct

    return distinct(pairs, ["id_a", "id_b"])


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    """Exact k-shingle Jaccard similarity (verification kernel)."""
    sa, sb = set(_shingle_hashes(a or "", k)), set(_shingle_hashes(b or "", k))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def verify_pairs_jaccard(
    pairs: ray.data.Dataset,
    docs: pa.Table,
    id_column: str = "doc_id",
    text_column: str = "text",
    threshold: float = 0.8,
    shingle_k: int = 5,
) -> ray.data.Dataset:
    """Exact-Jaccard verify of candidate pairs against a broadcast doc map."""
    import ray

    lookup = dict(
        zip(docs.column(id_column).to_pylist(), docs.column(text_column).to_pylist())
    )
    ref = ray.put(lookup)

    class _Verify:
        def __init__(self):
            self.docs = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ia = batch.column("id_a").to_pylist()
            ib = batch.column("id_b").to_pylist()
            sims = [
                ngram_jaccard(self.docs.get(x, ""), self.docs.get(y, ""), shingle_k)
                for x, y in zip(ia, ib)
            ]
            out = batch.append_column("jaccard", pa.array(sims, pa.float64()))
            return out.filter(pa.compute.greater_equal(out.column("jaccard"), threshold))

    return pairs.map_batches(_Verify, batch_format="pyarrow", concurrency=(1, 2))


# ------------------------------------------------------------------- simhash


class SimHasher:
    """64-bit SimHash over shingle hashes, vectorized per document."""

    def __init__(self, text_column: str = "text", shingle_k: int = 5):
        self.text_column = text_column
        self.k = shingle_k
        self.bits = np.arange(64, dtype=np.uint64)

    def simhash(self, text: str) -> int:
        sh = _shingle_hashes(text, self.k)
        if len(sh) == 0:
            return 0
        bits = (sh[:, None] >> self.bits[None, :]) & np.uint64(1)
        # votes must be SIGNED: uint64 arithmetic would wrap negative
        # tallies to huge positives and set every minority bit
        votes = bits.sum(axis=0).astype(np.int64) * 2 - len(sh)
        return int(((votes > 0).astype(np.uint64) << self.bits).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs = np.array(
            [self.simhash(t or "") for t in batch.column(self.text_column).to_pylist()],
            dtype=np.uint64,
        )
        return batch.append_column("simhash", pa.array(hs.astype(np.int64)))


# -------------------------------------------------- embedding cosine near-dup


def embedding_neardup_pairs(
    ds: ray.data.Dataset,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    threshold: float = 0.95,
    num_planes: int = 8,
    seed: int = 42,
    dims: int | None = None,
) -> ray.data.Dataset:
    """Near-duplicate pairs by cosine similarity, LSH-bucketed.

    Random-hyperplane signature per batch -> groupby signature bucket ->
    exact in-bucket cosine. The scale path: buckets bound the quadratic
    verify. NOTE: hyperplane LSH is approximate — pairs whose sign
    patterns differ land in different buckets; raise ``num_planes``
    replications for recall. For the *exact* small-side variant see
    ``similarity.brute_force_topk``.
    """

    def add_sig(batch: pa.Table) -> pa.Table:
        v = np.stack(batch.column(vec_column).to_pandas().to_numpy()).astype(np.float64)
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((v.shape[1], num_planes))
        sig = ((v @ planes) > 0).astype(np.uint64)
        packed = np.zeros(len(v), dtype=np.uint64)
        for i in range(num_planes):
            packed |= sig[:, i] << np.uint64(i)
        return pa.table(
            {
                id_column: batch.column(id_column),
                vec_column: batch.column(vec_column),
                "bucket": pa.array(packed.astype(np.int64)),
            }
        )

    ds = ds.map_batches(add_sig, batch_format="pyarrow")

    def in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "cosine": pd.Series([], dtype="float64")})
        order = np.argsort(group[id_column].to_numpy())
        ids = group[id_column].to_numpy()[order]
        v = np.stack(group[vec_column].to_numpy()[order]).astype(np.float64)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        sims = v @ v.T
        a, b = np.triu_indices(len(ids), k=1)
        keep = sims[a, b] >= threshold
        return pd.DataFrame(
            {"id_a": ids[a[keep]], "id_b": ids[b[keep]], "cosine": sims[a, b][keep]}
        )

    return ds.groupby("bucket").map_groups(in_bucket, batch_format="pandas")
