"""Vectorized text-analysis kernels for large-scale training-data pipelines.

All functions operate on arrays/lists of document strings inside one
``map_batches`` call — no Python loop over rows in the hot path beyond the
unavoidable per-string tokenize (numpy object arrays + C-backed str ops).

These are engine-side additions beyond the reference's operator set
(pdfplumber has no corpus analytics); they follow standard published
techniques: MinHash/LSH (Broder 1997), SimHash (Charikar 2002), n-gram
Jaccard, stopword language ID, and rolling polynomial fingerprints.
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, Iterable, List, Sequence, Tuple

import numpy as np

# BPE-ish word/number/punct tokenizer — same regex must be used in any SQL
# oracle (DuckDB RE2 and Python re agree on this subset).
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
_BPE_RE = re.compile(BPE_TOKEN_RE)

PUNCT_RE = r"[.,;:!?'\"()\[\]{}-]"
_PUNCT_RE = re.compile(PUNCT_RE)

# tiny deterministic stopword lists for the language-ID heuristic
STOPWORDS: Dict[str, Tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "a", "is", "that", "for", "with"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "los", "del", "es"),
    "de": ("der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "ein"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une", "du", "est"),
}
LANG_ORDER = ("en", "es", "de", "fr")  # deterministic tie-break order


def ws_token_count(texts: Sequence[str]) -> np.ndarray:
    """Whitespace tokens — matches ``len(string_split(text, ' '))``."""
    return np.fromiter(
        (len(t.split(" ")) if t else 0 for t in texts), dtype=np.int64, count=len(texts)
    )


def bpe_token_count(texts: Sequence[str]) -> np.ndarray:
    return np.fromiter(
        (len(_BPE_RE.findall(t)) for t in texts), dtype=np.int64, count=len(texts)
    )


def punct_count(texts: Sequence[str]) -> np.ndarray:
    return np.fromiter(
        (len(_PUNCT_RE.findall(t)) for t in texts), dtype=np.int64, count=len(texts)
    )


def stopword_counts(texts: Sequence[str]) -> Dict[str, np.ndarray]:
    """Per-language stopword hits over whitespace tokens (exact membership,
    mirroring ``list_filter(string_split(text,' '), w -> w IN (...))``)."""
    sets = {lang: frozenset(ws) for lang, ws in STOPWORDS.items()}
    out = {lang: np.zeros(len(texts), dtype=np.int64) for lang in STOPWORDS}
    for i, t in enumerate(texts):
        if not t:
            continue
        toks = t.split(" ")
        for lang, sw in sets.items():
            out[lang][i] = sum(1 for w in toks if w in sw)
    return out


def lang_id(texts: Sequence[str]) -> np.ndarray:
    """argmax of stopword scores with LANG_ORDER tie-break; 'und' when all
    scores are zero."""
    counts = stopword_counts(texts)
    n = len(texts)
    best = np.array(["und"] * n, dtype=object)
    best_score = np.zeros(n, dtype=np.int64)
    for lang in LANG_ORDER:
        c = counts[lang]
        better = c > best_score
        best[better] = lang
        best_score = np.where(better, c, best_score)
    return best


def md5_hex(texts: Sequence[str]) -> np.ndarray:
    return np.array(
        [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts], dtype=object
    )


def md5_u64(s: str) -> int:
    """First 8 bytes of md5 as uint64 — the one hash primitive shared with
    the DuckDB oracles: ``('0x' || substr(md5(s), 1, 16))::UBIGINT``."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:16], 16)


_FP_MOD = (1 << 61) - 1
_FP_BASE = 257


def rolling_fingerprint(texts: Sequence[str]) -> np.ndarray:
    """Polynomial rolling hash of the whole document (mod 2^61-1) —
    a deterministic content fingerprint cheaper than md5 for streaming."""
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        h = 0
        for b in t.encode("utf-8"):
            h = (h * _FP_BASE + b) % _FP_MOD
        out[i] = h
    return out


# ---- shingles / MinHash / SimHash ----


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Hashed k-shingles over whitespace tokens (word shingles)."""
    toks = text.split(" ") if text else []
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    if not grams:
        return np.empty(0, dtype=np.uint64)
    out = np.fromiter(
        (int(hashlib.md5(g.encode()).hexdigest()[:16], 16) for g in grams),
        dtype=np.uint64,
        count=len(grams),
    )
    return np.unique(out)


_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int = 1) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic MinHash permutation coefficients, derived from md5 so a
    SQL oracle can regenerate them verbatim:
    ``a_j = (u64(md5('a<seed>:<j>')) % (p-1)) + 1``, ``b_j = u64(md5('b<seed>:<j>')) % p``."""
    a = np.array(
        [(md5_u64(f"a{seed}:{j}") % (_MERSENNE - 1)) + 1 for j in range(num_perm)],
        dtype=np.uint64,
    )
    b = np.array(
        [md5_u64(f"b{seed}:{j}") % _MERSENNE for j in range(num_perm)], dtype=np.uint64
    )
    return a, b


class MinHasher:
    """Vectorized MinHash signatures: sig[j] = min((a_j * x + b_j) mod p)."""

    def __init__(self, num_perm: int = 64, seed: int = 1, shingle_k: int = 5):
        self.num_perm = num_perm
        self.shingle_k = shingle_k
        self.a, self.b = _perm_params(num_perm, seed)

    def signature(self, text: str) -> np.ndarray:
        sh = shingle_hashes(text, self.shingle_k)
        if sh.shape[0] == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        return self.signature_from_hashes(sh)

    def signature_from_hashes(self, sh: np.ndarray) -> np.ndarray:
        # (num_perm, n_shingles) in python-int space to avoid overflow
        x = sh.astype(object)[None, :]
        vals = (self.a.astype(object)[:, None] * x + self.b.astype(object)[:, None]) % _MERSENNE
        return np.array([min(row) for row in vals], dtype=np.uint64)

    def band_keys(self, sig: np.ndarray, bands: int) -> List[str]:
        """LSH bucket keys: md5 of each band's decimal-joined values, so the
        SQL oracle can compute the identical key with
        ``substr(md5('band:' || band || ':' || string_agg(v, '-' ORDER BY j)), 1, 16)``."""
        r = self.num_perm // bands
        keys = []
        for band in range(bands):
            chunk = sig[band * r : (band + 1) * r]
            s = f"band:{band}:" + "-".join(str(int(v)) for v in chunk)
            keys.append(hashlib.md5(s.encode()).hexdigest()[:16])
        return keys


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    if a.shape[0] == 0 and b.shape[0] == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).shape[0]
    union = a.shape[0] + b.shape[0] - inter
    return inter / union if union else 0.0


def ngram_jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    return jaccard(shingle_hashes(text_a, k), shingle_hashes(text_b, k))


def simhash64(texts: Sequence[str]) -> np.ndarray:
    """64-bit SimHash over whitespace tokens."""
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        toks = t.split(" ") if t else []
        if not toks:
            out[i] = 0
            continue
        hs = np.fromiter(
            (int(hashlib.md5(w.encode()).hexdigest()[:16], 16) for w in toks),
            dtype=np.uint64,
            count=len(toks),
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
        counts = bits.sum(axis=0)
        vote = counts * 2 - len(toks)
        # bit i of the output = majority vote of bit i of the token hashes —
        # SQL twin: sum(CASE WHEN vote > 0 THEN 1::UBIGINT << i END)
        out[i] = ((vote > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum()
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a, b)
    # popcount via unpackbits on the byte view
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
