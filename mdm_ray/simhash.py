"""SimHash (Charikar) 64-bit fingerprints for near-duplicate detection.

Training-data-pipeline extension (no analogue in the reference): token-hash
sign aggregation into a 64-bit fingerprint; near-dup candidates share one of
four 16-bit bands (catches Hamming distance ≤ 3 pairs with high probability).
"""

from __future__ import annotations

import zlib

import numpy as np


def _token_hashes(text: str) -> np.ndarray:
    toks = text.split()
    if not toks:
        return np.zeros(0, dtype=np.uint64)
    h32 = np.array([zlib.crc32(t.encode("utf-8")) for t in toks], dtype=np.uint64)
    # widen to 64 bits deterministically
    return (h32 << np.uint64(32)) | np.array(
        [zlib.crc32((t + "#").encode("utf-8")) for t in toks], dtype=np.uint64
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
