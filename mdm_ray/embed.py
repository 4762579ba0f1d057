"""Embedding stage: actor-pool map_batches with a deterministic local model.

The reference calls a remote Vertex model through SQL
(``ML.GENERATE_EMBEDDING``, ``batch_mdm_gcp/bigquery_utils.py:240-259``,
768-dim) over the content string
``CONCAT(name, ' ', email, ' ', address, ' ', city, ' ', company)``
(``:248-254``). That model is not reproducible offline, so the engine ships a
deterministic **feature-hashing embedder** (char-3-gram hashing into a
``dim``-dimensional signed space, L2-normalized — the classic hashing trick):
same interface, stable across runs/parallelism, swappable for a real model via
the same actor-pool signature (``map_batches(Cls, concurrency=..., batch_size=...)``).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa


def content_string(batch: pa.Table) -> list[str]:
    """IFNULL-concat of name/email/address/city/company — bigquery_utils.py:248-254.

    Vectorized: null→'' fill + one Arrow C++ element-wise join per batch."""
    import pyarrow.compute as pc

    n = batch.num_rows
    cols = []
    for name in ["full_name_clean", "email_clean", "address_clean", "city_clean", "company"]:
        if name in batch.column_names:
            col = batch[name]
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            cols.append(pc.fill_null(col.cast(pa.string()), ""))
        else:
            cols.append(pa.array([""] * n, pa.string()))
    return pc.binary_join_element_wise(*cols, " ").to_pylist()


class HashingEmbedder:
    """Callable-class map_batches stage: state built once per actor."""

    def __init__(self, dim: int = 64, ngram: int = 3, column: str = "embedding"):
        self.dim = dim
        self.ngram = ngram
        self.column = column

    def embed_one(self, text: str) -> np.ndarray:
        v = np.zeros(self.dim, dtype=np.float32)
        t = text.lower()
        k = self.ngram
        if len(t) < k:
            grams = [t] if t else []
        else:
            grams = [t[i: i + k] for i in range(len(t) - k + 1)]
        for g in grams:
            h = zlib.crc32(g.encode("utf-8"))
            idx = h % self.dim
            sign = 1.0 if (h >> 16) & 1 else -1.0
            v[idx] += sign
        n = np.linalg.norm(v)
        if n > 0:
            v /= n
        return v

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = content_string(batch)
        mat = np.stack([self.embed_one(t) for t in texts]) if texts else np.zeros((0, self.dim), np.float32)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(mat.ravel(), pa.float32()), self.dim
        ).cast(pa.list_(pa.float32()))  # zero-copy re-type, no Python round-trip
        return batch.append_column(self.column, col)


import functools


@functools.lru_cache(maxsize=4)
def _cached_embedder(dim: int) -> HashingEmbedder:
    return HashingEmbedder(dim=dim)


def add_embeddings(features_ds, dim: int = 64, concurrency=None, batch_size: int = 4096):
    """Embedding stage.

    Default (``concurrency=None``): stateless tasks with the embedder cached
    per worker process — the hashing embedder's state is a few ints, so an
    actor pool would only add startup latency. A REAL model (weights loaded
    once, GPU residency) should pass ``concurrency=(k, n)`` to get the
    actor-pool form — same callable class, same batch contract."""
    if concurrency is not None:
        return features_ds.map_batches(
            HashingEmbedder,
            fn_constructor_kwargs={"dim": dim},
            batch_format="pyarrow",
            concurrency=concurrency,
            batch_size=batch_size,
        )

    def embed(batch: pa.Table, dim: int = dim) -> pa.Table:
        return _cached_embedder(dim)(batch)

    return features_ds.map_batches(embed, batch_format="pyarrow", batch_size=batch_size)
