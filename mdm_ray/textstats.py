"""Text analysis operators: token counts, quality scoring, language ID,
document fingerprinting (training-data pipeline extensions; all stateless
vectorized map_batches kernels)."""

from __future__ import annotations


import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

EN_STOPWORDS = {
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "on", "for",
    "with", "as", "at", "by", "this", "that", "be", "are", "was", "from",
}

# tiny trigram profiles for a handful of languages (public heuristic approach:
# rank-order trigram profiling, Cavnar & Trenkle 1994 style, hand-seeded)
_LANG_MARKERS = {
    "en": ["the", "and", "ing", "ion", "th", "he", "er"],
    "de": ["der", "ein", "sch", "ung", "ch", "en", "ei"],
    "fr": ["les", "des", "ent", "que", "ou", "est", "le"],
    "es": ["los", "las", "que", "ión", "de", "el", "ar"],
}


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count + a BPE-ish subword estimate (regex word/punct
    pieces) + char count — all vectorized Arrow kernels."""
    texts = batch[text_col]
    tokens = pc.list_value_length(pc.split_pattern(texts, " "))
    # BPE-ish: alpha runs count ceil(len/4) subwords; digits/punct 1 each
    py = texts.to_pylist()
    import re

    piece_re = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")
    bpe = []
    for t in py:
        if not t:
            bpe.append(0)
            continue
        c = 0
        for m in piece_re.finditer(t):
            tok = m.group(0)
            c += max(1, -(-len(tok) // 4)) if tok[0].isalpha() else 1
        bpe.append(c)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": tokens,
            "n_subwords": pa.array(bpe, pa.int64()),
            "n_chars": pc.utf8_length(texts),
        }
    )


def quality_score_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic quality metrics: mean word length, stopword ratio,
    punctuation ratio, digit ratio, and a combined score in [0,1]."""
    texts = batch[text_col].to_pylist()
    doc_ids = batch["doc_id"]
    mean_wl, stop_r, punct_r, digit_r, score = [], [], [], [], []
    for t in texts:
        if not t:
            mean_wl.append(0.0); stop_r.append(0.0); punct_r.append(0.0)
            digit_r.append(0.0); score.append(0.0)
            continue
        words = t.split(" ")
        wl = sum(len(w) for w in words) / max(1, len(words))
        sr = sum(1 for w in words if w.lower() in EN_STOPWORDS) / max(1, len(words))
        n = len(t)
        pr = sum(1 for c in t if not c.isalnum() and not c.isspace()) / n
        dr = sum(1 for c in t if c.isdigit()) / n
        # plausible-text score: reasonable word length, some stopwords, low punct
        s = 1.0
        s *= min(1.0, wl / 3.0) * (1.0 if wl <= 12 else 0.5)
        s *= min(1.0, 0.2 + sr * 4)
        s *= max(0.0, 1.0 - pr * 3)
        s *= max(0.0, 1.0 - dr * 2)
        mean_wl.append(wl); stop_r.append(sr); punct_r.append(pr)
        digit_r.append(dr); score.append(max(0.0, min(1.0, s)))
    return pa.table(
        {
            "doc_id": doc_ids,
            "mean_word_len": pa.array(mean_wl, pa.float64()),
            "stopword_ratio": pa.array(stop_r, pa.float64()),
            "punct_ratio": pa.array(punct_r, pa.float64()),
            "digit_ratio": pa.array(digit_r, pa.float64()),
            "quality_score": pa.array(score, pa.float64()),
        }
    )


def lang_id(text: str | None) -> str:
    """Marker-trigram language guess; 'und' when no signal."""
    if not text:
        return "und"
    t = " " + text.lower() + " "
    best, best_score = "und", 0
    for lang, markers in _LANG_MARKERS.items():
        s = sum(t.count(m) for m in markers)
        if s > best_score:
            best, best_score = lang, s
    return best


def lang_id_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "predicted_lang": pa.array(
                [lang_id(t) for t in batch[text_col].to_pylist()], pa.string()
            ),
        }
    )


def _fp_hash(s: str) -> int:
    """60-bit window hash: first 15 hex chars of md5 — DuckDB computes the
    identical value (``('0x' || substring(md5(s), 1, 15))::BIGINT``), making
    the fingerprint SQL-oracle-checkable."""
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def fingerprint_batch(batch: pa.Table, text_col: str = "text",
                      window: int = 8) -> pa.Table:
    """Winnowing-style document fingerprint: rolling hash over token windows,
    keep the minimum hash per document + a short hash list for containment
    checks (public algorithm: Schleimer et al., winnowing). Tokenization is
    single-space split with empties dropped (matches the SQL oracle)."""
    texts = batch[text_col].to_pylist()
    fps, mins = [], []
    for t in texts:
        toks = [x for x in t.split(" ") if x] if t else []
        if not toks:
            fps.append([0]); mins.append(0)
            continue
        if len(toks) < window:
            h = _fp_hash(" ".join(toks))
            fps.append([h]); mins.append(h)
            continue
        hashes = [
            _fp_hash(" ".join(toks[i: i + window]))
            for i in range(len(toks) - window + 1)
        ]
        # winnow: min of each stride-window
        sel = sorted({min(hashes[i: i + window]) for i in range(0, len(hashes), window)})
        fps.append(sel); mins.append(min(hashes))
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "fingerprint_min": pa.array(mins, pa.int64()),
            "fingerprints": pa.array(fps, pa.list_(pa.int64())),
        }
    )
