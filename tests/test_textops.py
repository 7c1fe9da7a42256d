"""Text-analysis batch kernels: brute-force per-doc oracles."""

from collections import Counter

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
