"""SimHash (Charikar) 64-bit fingerprints for near-duplicate detection.

Training-data-pipeline extension (no analogue in the reference): token-hash
sign aggregation into a 64-bit fingerprint; near-dup candidates share band
keys (pigeonhole-exact recall when ``max_hamming < bands``).

Token hash = first 16 hex chars of md5 — chosen because DuckDB computes the
identical value (``('0x' || substring(md5(t), 1, 16))::UBIGINT``), which makes
the whole operator SQL-oracle-checkable end to end. Tokenization is
single-space split with empties dropped, matching
``list_filter(string_split(text, ' '), x -> x <> '')``.
"""

from __future__ import annotations

import hashlib

import numpy as np


def tokens(text: str | None) -> list[str]:
    return [t for t in text.split(" ") if t] if text else []


def _token_hashes(text: str) -> np.ndarray:
    toks = tokens(text)
    if not toks:
        return np.zeros(0, dtype=np.uint64)
    return np.array(
        [int(hashlib.md5(t.encode("utf-8")).hexdigest()[:16], 16) for t in toks],
        dtype=np.uint64,
    )


def simhash64(text: str | None) -> int:
    """64-bit SimHash; 0 for empty input."""
    if not text:
        return 0
    h = _token_hashes(text)
    if h.size == 0:
        return 0
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    counts = (2 * bits - 1).sum(axis=0)
    fp = np.uint64(0)
    for i in range(64):
        if counts[i] > 0:
            fp |= np.uint64(1) << np.uint64(i)
    return int(fp)


def simhash_batch(texts) -> np.ndarray:
    return np.array([simhash64(t) for t in texts], dtype=np.uint64)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def band_keys(fp: int, bands: int = 4) -> list[str]:
    """Split the 64-bit fingerprint into ``bands`` equal bit-bands as keys."""
    width = 64 // bands
    mask = (1 << width) - 1
    return [f"s{i}:{(fp >> (i * width)) & mask:x}" for i in range(bands)]
