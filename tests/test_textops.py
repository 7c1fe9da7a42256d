"""Text-analysis batch kernels: brute-force per-doc oracles."""

from collections import Counter

import numpy as np
import pyarrow as pa

from gdal_ray.stages import textops


def _brute_rep(text: str):
    words = text.split(" ")
    uni = Counter(words)
    bigrams = Counter(zip(words, words[1:]))
    return {
        "n_words": len(words),
        "n_distinct_words": len(uni),
        "top_word_n": max(uni.values()) if uni else 0,
        "top_bigram_n": max(bigrams.values()) if bigrams else 0,
    }


def test_repetition_stats_matches_brute():
    texts = [
        "a b a b a b c",          # dominant bigram
        "x x x x",                # one word repeated
        "all distinct words here",
        "",                        # split -> [''] one empty word
        "double  space  tokens",   # empty words between double spaces
        "solo",
        "a b a b a b c",          # duplicate doc (independent rows)
    ]
    batch = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = textops.repetition_stats_batch(batch).to_pylist()
    for row, text in zip(out, texts):
        exp = _brute_rep(text)
        for k, v in exp.items():
            assert row[k] == v, (text, k, row[k], v)


def test_repetition_stats_flags_degenerate_docs():
    """The downstream Gopher filter's separating power: a boilerplate-repeat
    doc scores a much higher top-bigram fraction than natural-ish text."""
    rep = "buy now " * 50
    nat = "the quick brown fox jumps over the lazy dog again and again today"
    batch = pa.table({"doc_id": [0, 1], "text": [rep.strip(), nat]})
    out = textops.repetition_stats_batch(batch).to_pylist()
    frac = [r["top_bigram_n"] / max(r["n_words"] - 1, 1) for r in out]
    assert frac[0] > 0.4 and frac[1] < 0.2


def test_scrub_pii_redacts_and_counts():
    texts = [
        "write to alice.smith+x@corp.example.org or see https://a.b/c?d=1 now",
        "call +1 (202) 555-0147 today",
        "nothing sensitive here",
    ]
    batch = pa.table({"doc_id": [0, 1, 2], "text": texts})
    out = textops.scrub_pii_batch(batch).to_pylist()
    assert out[0]["n_email"] == 1 and "<EMAIL>" in out[0]["text_scrubbed"]
    assert out[0]["n_url"] == 1 and "<URL>" in out[0]["text_scrubbed"]
    assert "alice" not in out[0]["text_scrubbed"].split("<EMAIL>")[1]
    assert out[1]["n_phone"] == 1 and "<PHONE>" in out[1]["text_scrubbed"]
    assert out[2]["text_scrubbed"] == texts[2]
    assert out[2]["n_email"] == out[2]["n_url"] == out[2]["n_phone"] == 0


def test_ngram_decontaminate_flags_overlap():
    bench = textops.text_ngrams(["the quick brown fox jumps over the dog"], n=5)
    batch = pa.table({"doc_id": [0, 1, 2], "text": [
        "intro text the quick brown fox jumps over something",  # 5-gram overlap
        "the quick brown fox sleeps",                            # only 4 shared words
        "completely different content entirely here now",
    ]})
    out = textops.ngram_decontaminate_batch(batch, bench, n=5).to_pylist()
    assert out[0]["contaminated"] and out[0]["n_gram_hits"] >= 1
    assert not out[1]["contaminated"]
    assert not out[2]["contaminated"]


def test_chunk_dedup_stats_brute():
    """Known duplicated 3-word spans across and within docs."""
    import collections
    import ray.data as rd
    from gdal_ray.stages import dedup

    texts = [
        "a b c d e f",          # spans: "a b c", "d e f"
        "a b c x y z extra",    # "a b c" (dup with doc0), "x y z"; "extra" dropped
        "d e f d e f",          # "d e f" twice (within-doc dup, also dup with doc0)
        "q w",                  # < 3 words -> no spans, absent from output
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    out = dedup.chunk_dedup_stats(rd.from_arrow(t), chunk_words=3).take_all()
    got = {r["doc_id"]: (r["n_chunks"], r["n_dup_chunks"]) for r in out}
    # brute: span occurrences corpus-wide
    occ = collections.Counter()
    per_doc = {}
    for i, txt in enumerate(texts):
        w = txt.split(" ")
        spans = [" ".join(w[j * 3:(j + 1) * 3]) for j in range(len(w) // 3)]
        per_doc[i] = spans
        occ.update(spans)
    exp = {i: (len(s), sum(occ[x] > 1 for x in s)) for i, s in per_doc.items() if s}
    assert got == exp


def test_tfidf_top_term_and_affinity_brute():
    import ray.data as rd

    texts = ["cat cat dog", "dog dog dog bird", "cat bird bird", "fish"]
    langs = ["en", "fr", "en", "fr"]
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                  "text": pa.array(texts), "lang": pa.array(langs)})
    ds = rd.from_arrow(t).repartition(3)

    dfs = pa.Table.from_pylist(textops.doc_frequencies(ds).take_all())
    df_map = {r["term"]: r["df"] for r in dfs.to_pylist()}
    assert df_map == {"cat": 2, "dog": 2, "bird": 2, "fish": 1}

    top = {r["doc_id"]: (r["top_term"], r["tf"], r["df"])
           for r in textops.tfidf_top_term(ds, dfs).take_all()}
    # doc0: cat tf2/df2=1.0 > dog 0.5 -> cat; doc1: dog 3/2 -> dog
    # doc2: bird 2/2=1.0 vs cat 1/2 -> bird; doc3: fish 1/1
    assert top == {0: ("cat", 2, 2), 1: ("dog", 3, 2),
                   2: ("bird", 2, 2), 3: ("fish", 1, 1)}

    stats_ds = textops.term_counts(
        ds, row_filter=lambda b: pa.compute.equal(b["lang"], "en"))
    stats = pa.Table.from_pylist(stats_ds.take_all())
    got = {r["doc_id"]: (r["affinity"], r["n_tokens"])
           for r in textops.target_affinity(ds, stats).take_all()}
    # en corpus tokens: cat cat dog cat bird bird -> cat:3 dog:1 bird:2
    assert got == {0: (3 + 3 + 1, 3), 1: (1 + 1 + 1 + 2, 4),
                   2: (3 + 2 + 2, 3), 3: (0, 1)}


def test_tfidf_tie_breaks_to_smallest_term():
    import ray.data as rd

    # both terms tf=1, df=1 -> identical score; tie -> "alpha"
    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array(["zeta alpha"])})
    ds = rd.from_arrow(t)
    dfs = pa.Table.from_pylist(textops.doc_frequencies(ds).take_all())
    top = textops.tfidf_top_term(ds, dfs).take_all()
    assert top[0]["top_term"] == "alpha"


def test_bloom_membership_exact_and_false_positive(ray_session):
    """Bloom build + membership: every reference doc hits (no false
    negatives, by construction); a crafted non-member whose k positions are
    all covered false-positives — the documented Bloom trade."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.stages import dedup

    ref_texts = [f"ref doc {i}" for i in range(20)]
    ref = rd.from_arrow(pa.table({"doc_id": pa.array(range(20), pa.int64()),
                                  "text": pa.array(ref_texts)}))
    bits = dedup.bloom_build(ref)
    assert bits.sum() <= 20 * dedup.BLOOM_K  # bounded fill
    # positions mirror int(md5[8j:8j+8], 16) % M
    h = hashlib.md5(b"ref doc 0").hexdigest()
    expect = [int(h[8 * j:8 * j + 8], 16) % dedup.BLOOM_M for j in range(dedup.BLOOM_K)]
    assert list(dedup.bloom_positions(["ref doc 0"])[0]) == expect
    # find a guaranteed false positive by brute search
    fp_text = None
    for i in range(100000):
        cand = f"novel {i}"
        if bits[dedup.bloom_positions([cand])[0]].all():
            fp_text = cand
            break
    cand_texts = ref_texts[:3] + ["definitely novel text"] + ([fp_text] if fp_text else [])
    cand = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(cand_texts)), pa.int64()),
        "text": pa.array(cand_texts)}))
    out = {r["doc_id"]: r["bloom_hit"]
           for r in dedup.bloom_decontaminate(cand, ref).take_all()}
    assert out[0] == out[1] == out[2] == 1  # members always hit
    assert out[3] == 0                      # novel text misses
    if fp_text:
        assert out[4] == 1                  # false positive hits (expected)


def test_bpe_pair_counts_brute(ray_session):
    """bpe_pair_counts == brute per-word pair counting; no cross-word or
    cross-document pairs leak through the space mask."""
    from collections import Counter

    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.stages import textops

    texts = ["abab ba", "aa abab", "x", "", "zz zz zz"]
    brute = Counter()
    for t in texts:
        for w in t.split():
            for i in range(len(w) - 1):
                brute[w[i:i + 2]] += 1
    ds = rd.from_arrow(pa.table({"text": pa.array(texts)}))
    out = {r["pair"]: r["cnt"] for r in textops.bpe_pair_counts(ds, top_n=50).take_all()}
    assert out == dict(brute)


def test_epoch_mix_expand_consistent(ray_session):
    """expand=True emits exactly n_repeats rows per doc with 0..n-1 epochs;
    expected count ratio tracks the weights."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.stages import textops

    n = 400
    tbl = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                    "source": pa.array([f"src{i % 4}" for i in range(n)])})
    counts = {r["doc_id"]: r["n_repeats"]
              for r in textops.epoch_mix(rd.from_arrow(tbl)).take_all()}
    rows = textops.epoch_mix(rd.from_arrow(tbl), expand=True).take_all()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r["epoch"])
    for d, c in counts.items():
        assert sorted(per_doc.get(d, [])) == list(range(c))
    # weight for src0 = 0.25x -> mean repeats ~0.25; src3 = (25+111)%.. = 1.36x
    s0 = [counts[d] for d in range(0, n, 4)]
    s3 = [counts[d] for d in range(3, n, 4)]
    assert abs(np.mean(s0) - 0.25) < 0.15
    assert abs(np.mean(s3) - 1.36) < 0.2


def test_char_entropy_brute(ray_session):
    """Zero-copy buffer bincount vs per-doc Counter recompute, including an
    empty doc and chunked input."""
    import collections
    import math

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.stages import textops

    texts = ["hello world", "", "aaaa", "abcabcabc", "the quick brown fox"]
    t = pa.table({"doc_id": pa.array(range(len(texts))), "text": pa.array(texts)})
    out = rd.from_arrow(t).map_batches(
        textops.char_entropy_batch, batch_format="pyarrow"
    ).to_pandas().set_index("doc_id").sort_index()
    for i, s in enumerate(texts):
        cnts = collections.Counter(s.encode())
        ent = sum(int(np.floor(c * math.log(c) * 1e6 + 0.5)) for c in cnts.values())
        assert out.loc[i, "ent_num"] == ent
        assert out.loc[i, "n_chars_t"] == len(s)
        assert out.loc[i, "distinct_chars"] == len(cnts)


def test_gopher_rules_batch():
    """Gopher rules (Rae et al. 2021 Table A1): each rule trips on the
    crafted row and the reason reports the FIRST failure."""
    import pyarrow as pa

    from gdal_ray.stages import textops

    good = "the quick brown fox jumps over that lazy dog again and again today"
    rows = {
        "ok": good,
        "words": "too short",
        "meanlen": "a b c d e f g h i j k l m n o p q r s t",  # mean len 1
        "symbols": " ".join(["xxx#"] * 12) + " the of",  # 12 '#' / 14 words
        "alpha": " ".join(["1234567890"] * 11) + " the of and",
        "stopwords": " ".join(f"token{i}" for i in range(12)),
    }
    t = pa.table({"k": list(rows), "text": list(rows.values())})
    out = textops.gopher_rules_batch(t, min_words=12, max_words=100)
    got = dict(zip(out["k"].to_pylist(), out["reason"].to_pylist()))
    assert got["ok"] == "" and got["words"] == "words"
    assert got["meanlen"] == "meanlen" and got["symbols"] == "symbols"
    assert got["alpha"] == "alpha" and got["stopwords"] == "stopwords"
    keep = dict(zip(out["k"].to_pylist(), out["keep"].to_pylist()))
    assert keep["ok"] and not any(keep[k] for k in rows if k != "ok")
    # nulls behave as empty text
    t2 = pa.table({"k": ["n"], "text": pa.array([None], pa.string())})
    assert textops.gopher_rules_batch(t2)["reason"].to_pylist() == ["words"]


def test_lm_familiarity(ray_session):
    """Train-then-score broadcast LM filter: common trigrams score high,
    alien text scores zero, boundary grams never cross documents."""
    import ray
    import ray.data as rd
    import pyarrow as pa

    from gdal_ray.stages import textops

    corpus = ["the cat sat on the mat"] * 8 + ["zzqqjjxx"]
    ds = rd.from_arrow(pa.table({"doc_id": list(range(9)), "text": corpus}))
    model = textops.train_char_ngram_counts(ds, top_k=16)
    assert model.num_rows <= 16
    cnts = dict(zip(model["gram"].to_pylist(), model["cnt"].to_pylist()))
    def code(s):
        v = 0
        for ch in s:
            v = (v << 21) | ord(ch)
        return v
    # 'the' occurs twice in each of the 8 docs but so do other grams;
    # " th"/"the" are among the most frequent
    assert cnts.get(code("the")) == 16
    ref = ray.put(model)
    out = textops.lm_familiarity_score(ds, ref, min_avg_count=1)
    rows = {r["doc_id"]: r for r in out.take_all()}
    assert rows[0]["score"] > 0 and rows[0]["n_grams"] == len(corpus[0]) - 2
    assert rows[8]["score"] == 0 and not rows[8]["keep"]
    # short/None docs produce zero grams, not errors
    ds2 = rd.from_arrow(pa.table({"doc_id": [0, 1],
                                  "text": pa.array(["ab", None], pa.string())}))
    out2 = textops.lm_familiarity_score(ds2, ref).take_all()
    assert [r["n_grams"] for r in out2] == [0, 0]


def test_line_dedup_corpus_level(ray_session):
    """C4/RefinedWeb line dedup: frequent lines keep only the globally
    first (doc, pos) occurrence (or none), docs reassemble in order, and a
    fully-emptied doc survives with empty text."""
    import pytest
    import ray.data as rd

    from gdal_ray.stages.dedup import line_dedup

    docs = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                     "text": pa.array(["a\nb\nc", "b\nb\nd", "b\ne"])})
    out = {r["doc_id"]: (r["text"], r["n_kept"])
           for r in line_dedup(rd.from_arrow(docs), min_count=2).take_all()}
    assert out == {1: ("a\nb\nc", 3), 2: ("d", 1), 3: ("e", 1)}

    out = {r["doc_id"]: r["text"]
           for r in line_dedup(rd.from_arrow(docs), min_count=2,
                               keep="none").take_all()}
    assert out == {1: "a\nc", 2: "d", 3: "e"}

    docs2 = pa.table({"doc_id": pa.array(["x", "y"]),  # string ids work too
                      "text": pa.array(["q", "q"])})
    out = {r["doc_id"]: (r["text"], r["n_kept"])
           for r in line_dedup(rd.from_arrow(docs2), min_count=2,
                               keep="none").take_all()}
    assert out == {"x": ("", 0), "y": ("", 0)}

    with pytest.raises(ValueError, match="keep"):
        line_dedup(rd.from_arrow(docs), keep="last")


class TestBPETraining:
    """Sennrich et al. BPE merge learning: differential vs a brute-force
    reference on the raw corpus, encoder consistency, bounded histogram."""

    CORPUS = ["low low low low low", "lower lower newest newest",
              "newest newest newest newest", "widest widest widest",
              "low lower newest"]

    @staticmethod
    def _ref_bpe(texts, n_merges):
        """Reference implementation straight from the paper: word counts,
        then greedy highest-count pair with (count, pair) tie order."""
        import re
        from collections import Counter

        from gdal_ray.stages.textops import BPE_PATTERN

        wc = Counter()
        for t in texts:
            wc.update(re.findall(BPE_PATTERN, t))
        seqs = {w: tuple(w) for w in wc}
        merges = []
        for _ in range(n_merges):
            pc = Counter()
            for w, s in seqs.items():
                for a, b in zip(s[:-1], s[1:]):
                    pc[(a, b)] += wc[w]
            if not pc:
                break
            best = max(pc.items(), key=lambda kv: (kv[1], kv[0]))[0]
            merges.append(best)
            j = best[0] + best[1]
            for w, s in seqs.items():
                out, i = [], 0
                while i < len(s):
                    if (i + 1 < len(s) and s[i] == best[0]
                            and s[i + 1] == best[1]):
                        out.append(j)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                seqs[w] = tuple(out)
        return merges

    def test_train_matches_reference(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from gdal_ray.stages import textops

        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(np.arange(len(self.CORPUS), dtype=np.int64)),
            "text": pa.array(self.CORPUS)}))
        words = textops.word_histogram(ds)
        merges = textops.bpe_train_merges(words, n_merges=12)
        assert merges == self._ref_bpe(self.CORPUS, 12)

    def test_histogram_cap_and_min_count(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from gdal_ray.stages import textops

        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "text": pa.array(["a a a b b c", "a b z"])}))
        words = textops.word_histogram(ds, max_words=2)
        assert words.num_rows == 2  # capped, highest counts first
        got = dict(zip(words["word"].to_pylist(), words["cnt"].to_pylist()))
        # pretokens carry their leading space; ties break word-ascending
        assert got == {" b": 3, " a": 2}
        words = textops.word_histogram(ds, min_count=2)
        assert all(c >= 2 for c in words["cnt"].to_pylist())

    def test_encoder_counts(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from gdal_ray.stages import textops

        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(np.arange(len(self.CORPUS), dtype=np.int64)),
            "text": pa.array(self.CORPUS)}))
        merges = textops.bpe_train_merges(textops.word_histogram(ds), 50)
        out = textops.bpe_token_counts(ds, merges).to_pandas()
        n = out.set_index("doc_id")["n_bpe_tokens"]
        # with enough merges every trained word collapses to ~1 token
        assert n[0] <= 5  # "low"x5 -> at most 1 token per word
        # zero merges -> pure character counts (per pretoken)
        out0 = textops.bpe_token_counts(ds, []).to_pandas()
        n0 = out0.set_index("doc_id")["n_bpe_tokens"]
        assert (n0 >= n).all() and n0[0] == len("low") * 5 + 4  # ' low' x4
