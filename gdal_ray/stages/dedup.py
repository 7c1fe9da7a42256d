"""Deduplication suite (beyond-reference, first-class per project brief).

- exact: content-hash partition + per-group min-key winner
- MinHash + LSH: shingle -> signature -> band buckets -> candidate pairs ->
  Jaccard verify (the standard web-dedup pipeline, expressed as
  map_batches -> flat band expansion -> groupby(band bucket) -> verify)
- SimHash: 64-bit signatures, hamming-ball candidate pairing via band keys
- embedding cosine near-dup: see gdal_ray.stages.sim

Scale notes: the only all-to-all exchanges are on (band_id, band_hash) keys —
signature bands, not documents — and candidate verification re-reads only the
shingle sets of candidate pairs.  No stage materializes the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import textops


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Exact dedup: md5 hash-partition, keep min id per group + group size.

    Output: (text_md5, keep_id, n_dups).  SQL mirror: GROUP BY md5(text).
    """

    def hash_batch(batch: pa.Table) -> pa.Table:
        return textops.md5_hex_batch(batch, text_col).select([id_col, "text_md5"])

    from ray.data.aggregate import Count, Min

    hashed = ds.map_batches(hash_batch, batch_format="pyarrow")
    return hashed.groupby("text_md5").aggregate(
        Min(id_col, alias_name="keep_id"), Count(alias_name="n_dups")
    )


def minhash_lsh_candidates(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
):
    """MinHash-LSH near-dup candidate pairs with verified Jaccard.

    Pipeline: per-batch signatures -> flat_map to (band_id, band_hash, id,
    signature) rows -> groupby band bucket -> within-bucket pairs (deduped by
    (a,b) ordering) -> exact signature-Jaccard estimate attached.

    Returns Dataset of (id_a, id_b, est_jaccard_x1000:int64); pairs may appear
    once per matching band — final consumer dedups by (id_a, id_b) min/first
    (same pattern as the spatial pair dedup, SURVEY §2.7).
    """
    rows_per_band = num_perm // bands

    def to_bands(batch: pa.Table) -> pa.Table:
        import hashlib as _hl

        ids, band_ids, band_hashes, sigs = [], [], [], []
        for did, text in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            sig = textops.minhash_signature(textops._shingle_hashes(text, shingle_k), num_perm)
            for b in range(bands):
                chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
                # hash the ENTIRE band chunk: a bucket match then requires all
                # rows_per_band minhashes to agree (candidate prob jaccard^r,
                # the actual LSH banding guarantee)
                digest = _hl.md5(np.ascontiguousarray(chunk).tobytes()).digest()
                h = int.from_bytes(digest[:8], "little", signed=True)
                ids.append(did)
                band_ids.append(b)
                band_hashes.append(h)
                sigs.append(sig.astype(np.int64).tobytes())
        return pa.table(
            {
                id_col: pa.array(ids),
                "band_id": pa.array(band_ids, type=pa.int32()),
                "band_hash": pa.array(band_hashes, type=pa.int64()),
                "sig": pa.array(sigs, type=pa.binary()),
            }
        )

    banded = ds.map_batches(to_bands, batch_format="pyarrow")

    def bucket_pairs(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n < 2:
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                 "est_jaccard_x1000": pa.array([], pa.int64())}
            )
        ids = group[id_col].to_numpy(zero_copy_only=False)
        sigs = np.vstack(
            [np.frombuffer(s, dtype=np.int64) for s in group["sig"].to_pylist()]
        )
        a_idx, b_idx = np.triu_indices(n, k=1)
        est = (sigs[a_idx] == sigs[b_idx]).mean(axis=1)
        lo = np.minimum(ids[a_idx], ids[b_idx])
        hi = np.maximum(ids[a_idx], ids[b_idx])
        return pa.table(
            {
                "id_a": pa.array(lo),
                "id_b": pa.array(hi),
                "est_jaccard_x1000": pa.array((est * 1000).astype(np.int64)),
            }
        )

    return banded.groupby(["band_id", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pyarrow"
    )


def minhash_lsh_dedup_pairs(ds, min_jaccard_x1000: int = 500, **kwargs):
    """Candidates -> threshold -> exact pair dedup (groupby pair, first)."""
    from ray.data.aggregate import Max

    cands = minhash_lsh_candidates(ds, **kwargs)
    kept = cands.map_batches(
        lambda t: t.filter(pa.compute.greater_equal(t["est_jaccard_x1000"], min_jaccard_x1000)),
        batch_format="pyarrow",
    )
    return kept.groupby(["id_a", "id_b"]).aggregate(
        Max("est_jaccard_x1000", alias_name="est_jaccard_x1000")
    )


def simhash_signatures(ds, text_col: str = "text", id_col: str = "doc_id", shingle_k: int = 3):
    """Attach 64-bit SimHash per doc (hamming-near docs share band keys)."""

    def fn(batch: pa.Table) -> pa.Table:
        sigs = [
            textops.simhash64(textops._shingle_hashes(t, shingle_k))
            for t in batch[text_col].to_pylist()
        ]
        return pa.table(
            {id_col: batch[id_col], "simhash": pa.array(np.array(sigs, dtype=np.int64))}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def ngram_jaccard_pairs(ds, id_col="doc_id", text_col="text", shingle_k=3, min_x1000=300):
    """Exact n-gram Jaccard: LSH candidates -> TRUE shingle-set Jaccard
    verification per pair, thresholded on the exact value.

    The verification side-table (id -> text) is broadcast via ``ray.put`` —
    fine while the candidate-bearing corpus slice fits the object store; the
    scale path re-joins candidate ids to texts with a keyed shuffle instead.
    """
    import ray

    cands = minhash_lsh_candidates(
        ds, text_col=text_col, id_col=id_col, num_perm=32, bands=8, shingle_k=shingle_k
    )
    from ray.data.aggregate import Max

    uniq = cands.groupby(["id_a", "id_b"]).aggregate(
        Max("est_jaccard_x1000", alias_name="est_jaccard_x1000")
    )
    texts = {}
    for row in ds.map_batches(
        lambda t: pa.table({id_col: t[id_col], text_col: t[text_col]}), batch_format="pyarrow"
    ).take_all():
        texts[row[id_col]] = row[text_col]
    texts_ref = ray.put(texts)

    class Verify:
        def __init__(self):
            self.texts = ray.get(texts_ref)
            self.shingles: dict = {}

        def _sh(self, did):
            if did not in self.shingles:
                self.shingles[did] = textops._shingle_hashes(self.texts.get(did, ""), shingle_k)
            return self.shingles[did]

        def __call__(self, batch: pa.Table) -> pa.Table:
            ja = [
                int(round(textops.jaccard(self._sh(a), self._sh(b)) * 1000))
                for a, b in zip(batch["id_a"].to_pylist(), batch["id_b"].to_pylist())
            ]
            out = batch.drop_columns(["est_jaccard_x1000"]).append_column(
                "jaccard_x1000", pa.array(ja, pa.int64())
            )
            return out.filter(pa.compute.greater_equal(out["jaccard_x1000"], min_x1000))

    return uniq.map_batches(Verify, batch_format="pyarrow", concurrency=2)
