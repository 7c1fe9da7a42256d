"""Text-analysis stages for the interleaved document corpus.

Beyond-reference operators mandated by the project brief: token counting,
quality scoring, language-ID heuristic, document fingerprinting, and the
hashing primitives the dedup suite builds on (MinHash, SimHash, shingles).

All stages are vectorized ``map_batches`` bodies; regex/state setup happens in
actor ``__init__`` (the stateful-stage pattern).  Counts/scores are integers
so oracle comparisons are bit-stable.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_RE = re.compile(r"[^ ]+")
_PUNCT_RE = re.compile(r"[.,!?;:]")

# tiny per-language stopword lists for the n-gram/stopword language heuristic
_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "de"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "que"},
}


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """n_tokens = count of non-space runs (SQL mirror:
    length(regexp_extract_all(text, '[^ ]+')))."""
    counts = pc.count_substring_regex(batch[text_col], pattern="[^ ]+")
    return batch.append_column("n_tokens", pc.cast(counts, pa.int64()))


def quality_score_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Integer quality features: text length, punct count, token count,
    mean token length x100 (scaled int)."""
    text = batch[text_col]
    n_chars_c = pc.cast(pc.utf8_length(text), pa.int64())
    n_tokens = pc.cast(pc.count_substring_regex(text, pattern="[^ ]+"), pa.int64())
    n_punct = pc.cast(pc.count_substring_regex(text, pattern="[.,!?;:]"), pa.int64())
    out = batch.append_column("n_chars_calc", n_chars_c)
    out = out.append_column("n_tokens", n_tokens)
    out = out.append_column("n_punct", n_punct)
    return out


class LangId:
    """Stopword-voting language heuristic (actor-pool stage: word lists and
    regex compiled once per actor)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word_re = re.compile(r"[a-zA-Z']+")
        self.tables = {lang: frozenset(ws) for lang, ws in _LANG_STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        langs = []
        for t in texts:
            words = self.word_re.findall((t or "").lower())
            best, best_hits = "und", 0
            for lang, stops in self.tables.items():
                hits = sum(1 for w in words if w in stops)
                if hits > best_hits:
                    best, best_hits = lang, hits
            langs.append(best)
        return batch.append_column("lang_pred", pa.array(langs, type=pa.string()))


def md5_hex_batch(batch: pa.Table, text_col: str = "text", out: str = "text_md5") -> pa.Table:
    """Content hash for exact dedup (SQL mirror: md5(text))."""
    hexes = [hashlib.md5((t or "").encode()).hexdigest() for t in batch[text_col].to_pylist()]
    return batch.append_column(out, pa.array(hexes, type=pa.string()))


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit rolling (polynomial) document fingerprint — deterministic,
    order-sensitive digest of the token stream."""
    fps = []
    for t in batch[text_col].to_pylist():
        h = np.uint64(1469598103934665603)  # FNV offset
        for b in (t or "").encode():
            h = np.uint64((int(h) ^ b) * 1099511628211 & 0xFFFFFFFFFFFFFFFF)
        fps.append(np.int64(np.uint64(h) - np.uint64(1 << 63)))
    return batch.append_column("fingerprint", pa.array(np.array(fps, dtype=np.int64)))


# ---------------------------------------------------------------------------
# Sketch primitives for near-dup
# ---------------------------------------------------------------------------


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Hashes of the k-word shingles of a text (word-level shingling)."""
    words = _TOKEN_RE.findall(text or "")
    if len(words) < k:
        grams = [" ".join(words)] if words else [""]
    else:
        grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    out = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        out[i] = np.frombuffer(hashlib.md5(g.encode()).digest()[:8], dtype=np.uint64)[0]
    return out


_MINHASH_A = None
_MINHASH_B = None
_MERSENNE = np.uint64((1 << 61) - 1)


def _minhash_params(num_perm: int):
    global _MINHASH_A, _MINHASH_B
    if _MINHASH_A is None or len(_MINHASH_A) < num_perm:
        # a, b < 2^31 so a*x32 + b fits in uint64 with 32-bit shingle halves;
        # independent seeded streams per array so the first k params are
        # identical for ANY generated size >= k (signatures stay stable when
        # a later call raises num_perm past a previous cap)
        size = max(256, num_perm)
        _MINHASH_A = np.random.default_rng(1234567).integers(1, 1 << 31, size, dtype=np.uint64)
        _MINHASH_B = np.random.default_rng(7654321).integers(0, 1 << 31, size, dtype=np.uint64)
    return _MINHASH_A[:num_perm], _MINHASH_B[:num_perm]


def minhash_signature(shingles: np.ndarray, num_perm: int = 64) -> np.ndarray:
    """(num_perm,) uint64 MinHash signature via universal hashing mod
    Mersenne61, fully vectorized: 32-bit shingle halves keep a*x+b in uint64."""
    a, b = _minhash_params(num_perm)
    if shingles.size == 0:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    x = (shingles.astype(np.uint64) & np.uint64(0xFFFFFFFF))[None, :]
    vals = (a[:, None] * x + b[:, None]) % _MERSENNE
    return vals.min(axis=1)


def simhash64(shingles: np.ndarray) -> np.int64:
    """64-bit SimHash over shingle hashes (unweighted)."""
    if shingles.size == 0:
        return np.int64(0)
    bits = ((shingles[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    votes = (2 * bits - 1).sum(axis=0)
    val = np.uint64(0)
    for j in np.nonzero(votes > 0)[0]:
        val |= np.uint64(1) << np.uint64(j)
    # injective uint64 -> int64: two's-complement reinterpretation
    return val.astype(np.int64)


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    sa, sb = set(a.tolist()), set(b.tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)
