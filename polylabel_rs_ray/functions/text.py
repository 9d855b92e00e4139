"""Text-analysis kernels for the large-scale training-data pipeline:
language ID (n-gram heuristic), quality scoring, token counting, document
fingerprinting (rolling hash).  All vectorized or C-speed per batch; used
inside ``map_batches(..., batch_format="pyarrow")`` stages.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# --- language ID -----------------------------------------------------------
# tiny character/stopword profiles; deterministic and dependency-free.
_LANG_PROFILES: dict[str, set[str]] = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "fr": {"le", "la", "les", "et", "de", "des", "un", "une", "est", "que"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "zu"},
    "es": {"el", "la", "los", "las", "y", "de", "un", "una", "es", "que"},
}


def lang_id_one(text: str) -> str:
    """Stopword-vote language ID; CJK codepoint share beats stopwords."""
    if not text:
        return "und"
    cjk = sum(1 for ch in text if "一" <= ch <= "鿿")
    if cjk / max(len(text), 1) > 0.05:
        return "zh"
    tokens = text.lower().split()
    if not tokens:
        return "und"
    best, best_hits = "und", 0
    for lang, words in _LANG_PROFILES.items():
        hits = sum(1 for t in tokens if t in words)
        if hits > best_hits:
            best, best_hits = lang, hits
    return best


def lang_id_batch(texts: list[str | None]) -> list[str]:
    return [lang_id_one(t) if t is not None else "und" for t in texts]


# --- quality scoring -------------------------------------------------------
_STOPWORDS = _LANG_PROFILES["en"]
PUNCT = ".,!?;:"


def quality_batch(texts: pa.Array | pa.ChunkedArray) -> pa.Table:
    """Length / punctuation / stopword-ratio components + combined score.

    punct_count counts only the fixed class ``.,!?;:`` so the DuckDB oracle
    can reproduce it with regexp_replace byte-for-byte."""
    n_chars = pc.utf8_length(texts)
    n_tokens = pc.count_substring_regex(texts, pattern=r"\S+")
    punct = pc.count_substring_regex(texts, pattern=r"[.,!?;:]")
    vals = texts.to_pylist()
    stop_hits = []
    for t in vals:
        if not t:
            stop_hits.append(0)
            continue
        stop_hits.append(sum(1 for w in t.lower().split() if w in _STOPWORDS))
    nt = np.maximum(np.asarray(n_tokens, dtype=np.float64), 1.0)
    nc = np.maximum(np.asarray(n_chars, dtype=np.float64), 1.0)
    stop_ratio = np.asarray(stop_hits, dtype=np.float64) / nt
    punct_ratio = np.asarray(punct, dtype=np.float64) / nc
    # numerator is RAW n_chars (only the denominator is clamped) so an
    # empty text yields 0.0, matching the SQL oracle's
    # length(text)/GREATEST(n_tokens,1) exactly
    mean_word_len = np.asarray(n_chars, dtype=np.float64) / nt
    return pa.table({
        "n_chars": pc.cast(n_chars, pa.int64()),
        "n_tokens": pc.cast(n_tokens, pa.int64()),
        "punct_count": pc.cast(punct, pa.int64()),
        "stopword_hits": pa.array(stop_hits, type=pa.int64()),
        "stop_ratio": pa.array(stop_ratio),
        "punct_ratio": pa.array(punct_ratio),
        "mean_word_len": pa.array(mean_word_len),
    })


# --- token counting (BPE-ish regex) ---------------------------------------
# word pieces: runs of letters, runs of digits, single punctuation marks
BPEISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_counts_batch(texts: pa.Array | pa.ChunkedArray) -> pa.Table:
    ws = pc.count_substring_regex(texts, pattern=r"\S+")
    bpe = pc.count_substring_regex(texts, pattern=BPEISH_PATTERN)
    return pa.table({
        "n_ws_tokens": pc.cast(ws, pa.int64()),
        "n_bpe_tokens": pc.cast(bpe, pa.int64()),
    })


# --- document fingerprint (rolling polynomial hash) ------------------------
FP_BASE = np.uint64(1000003)
FP_MOD_MASK = np.uint64((1 << 61) - 1)  # mod 2^61-1 via masking-free modmul


def fingerprint_one(text: str) -> int:
    """Polynomial rolling hash over utf-8 bytes, mod 2^61-1 — a stable
    content fingerprint (order-sensitive, unlike a bag-of-words hash)."""
    h = 0
    mod = (1 << 61) - 1
    base = 1000003
    for b in text.encode("utf-8"):
        h = (h * base + b + 1) % mod
    return h


def fingerprint_batch(texts: list[str | None]) -> list[int | None]:
    return [fingerprint_one(t) if t is not None else None for t in texts]


def sql_fingerprint_udf(con) -> None:
    """Register fingerprint as a DuckDB scalar UDF for oracle runs."""
    con.create_function("fp61", fingerprint_one, return_type="BIGINT")
