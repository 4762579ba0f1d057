"""MinHash signatures + LSH band keys (from scratch, NumPy-vectorized).

North-star blocking upgrade (not in the reference — the reference's candidate
generation is an unblocked CROSS JOIN, ``batch_mdm_gcp/bigquery_utils.py:330-332``):
char-k-shingles → CRC32 shingle hashes → ``num_perm`` universal-hash minima →
``bands`` band keys. Two documents sharing any band key become a candidate
pair. All permutation parameters derive from a fixed seed so signatures are
identical at any parallelism.
"""

from __future__ import annotations

import zlib

import numpy as np

_MERSENNE = (1 << 61) - 1
_EMPTY_SENTINEL = np.uint64(_MERSENNE)


class MinHasher:
    """Stateful signer: build once (per actor / per task), sign batches."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 3, bands: int = 16, seed: int = 42):
        if num_perm % bands != 0:
            raise ValueError("num_perm must be divisible by bands")
        self.num_perm = num_perm
        self.shingle_k = shingle_k
        self.bands = bands
        self.rows = num_perm // bands
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)

    def shingle_hashes(self, text: str) -> np.ndarray:
        k = self.shingle_k
        if not text:
            return np.zeros(0, dtype=np.uint64)
        if len(text) <= k:
            grams = [text]
        else:
            grams = {text[i: i + k] for i in range(len(text) - k + 1)}
        return np.array([zlib.crc32(g.encode("utf-8")) for g in grams], dtype=np.uint64)

    def signature(self, text: str | None) -> np.ndarray:
        """[num_perm] uint64 signature; empty text → all-sentinel signature."""
        h = self.shingle_hashes(text) if text else np.zeros(0, dtype=np.uint64)
        if h.size == 0:
            return np.full(self.num_perm, _EMPTY_SENTINEL, dtype=np.uint64)
        # universal hash (a*x + b) mod p, min over shingles, per permutation
        vals = (self.a[:, None] * h[None, :] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def signatures(self, texts) -> np.ndarray:
        """[N, num_perm] signatures for a batch."""
        return np.stack([self.signature(t) for t in texts])

    def band_keys(self, sig: np.ndarray) -> list[str]:
        """LSH band keys for one signature (skips empty-text sentinel sigs)."""
        if sig[0] == _EMPTY_SENTINEL:
            return []
        keys = []
        for bi in range(self.bands):
            band = sig[bi * self.rows: (bi + 1) * self.rows]
            keys.append(f"b{bi}:{zlib.crc32(band.tobytes()):08x}")
        return keys

    def band_keys_batch(self, texts) -> list[list[str]]:
        return [self.band_keys(self.signature(t)) for t in texts]


def minhash_jaccard_estimate(sig1: np.ndarray, sig2: np.ndarray) -> float:
    """Estimated Jaccard similarity from two signatures."""
    return float(np.mean(sig1 == sig2))
