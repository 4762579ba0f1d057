"""Document deduplication operators (training-data pipeline extensions).

The reference's only dedup is entity resolution itself (SURVEY.md §2.8 D5);
a 100 TB training-data pipeline needs the standard document-dedup family, each
built Ray-Data-first (hash-partitioned groupbys / sorted-block kernels — never
an all-pairs join):

* exact dedup        — canonicalized-text groups, survivor = min id
* MinHash-LSH        — shingle → signature → band-bucket groupby → verified pairs
* SimHash            — 64-bit fingerprint band buckets → Hamming-verified pairs
* n-gram Jaccard     — within-block true Jaccard above threshold
* embedding cosine   — near-dup pairs above cosine threshold within blocks

Pair-producing ops emit canonical ``(id1 < id2)`` pairs and dedup across
buckets with the same min-common-key trick as the ER blocker (pairs.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dsutil import grouped_kernel
from .minhash import MinHasher, minhash_jaccard_estimate
from .simfuncs import cosine_batch, ngram_jaccard
from .simhash import band_keys as simhash_band_keys
from .simhash import hamming64, simhash_batch


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                canonicalize: bool = False):
    """Keep one survivor (min id) per identical text; returns survivors with
    group size. Hash groupby on the text key — scales as a shuffle of
    (key, id) only when ``project=True`` columns are pre-selected."""
    work = ds.select_columns([id_col, text_col])
    if canonicalize:
        def canon(b: pa.Table) -> pa.Table:
            t = pc.utf8_lower(pc.utf8_trim_whitespace(b[text_col]))
            return b.set_column(b.column_names.index(text_col), text_col, t)
        work = work.map_batches(canon, batch_format="pyarrow")

    def keep_first(batch: pa.Table, starts: np.ndarray, stops: np.ndarray) -> pa.Table:
        idx = pa.array(starts, pa.int64())  # sorted within group by sort key only;
        out = batch.take(idx)
        # survivor = min id within group (deterministic)
        ids = np.asarray(batch[id_col].to_pylist(), dtype=object)
        min_ids = [ids[s:e].min() for s, e in zip(starts, stops)]
        sizes = [int(e - s) for s, e in zip(starts, stops)]
        return pa.table(
            {
                id_col: pa.array(min_ids),
                text_col: out[text_col],
                "group_size": pa.array(sizes, pa.int64()),
            }
        )

    return grouped_kernel(work, text_col, keep_first)


class _BucketEmitter:
    """Emit (bucket_key, id, text, buckets) rows for LSH-style ops."""

    def __init__(self, bucket_fn, id_col: str, text_col: str):
        self.bucket_fn = bucket_fn
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        out_ids, out_texts, out_keys, out_lists = [], [], [], []
        for i, t in zip(ids, texts):
            keys = sorted(set(self.bucket_fn(t)))
            for k in keys:
                out_ids.append(i)
                out_texts.append(t)
                out_keys.append(k)
                out_lists.append(keys)
        return pa.table(
            {
                self.id_col: pa.array(out_ids),
                self.text_col: pa.array(out_texts, pa.string()),
                "bucket": pa.array(out_keys, pa.string()),
                "buckets": pa.array(out_lists, pa.list_(pa.string())),
            }
        )


def _bucket_pairs(ds, id_col: str, text_col: str, verify_fn, max_bucket: int = 2000):
    """Pairs within buckets, deduped via min-common-bucket, verified by
    ``verify_fn(texts_a, texts_b) -> (keep_mask, sims)``."""

    def kernel(batch: pa.Table, starts: np.ndarray, stops: np.ndarray) -> pa.Table:
        ids = np.asarray(batch[id_col].to_pylist(), dtype=object)
        texts = batch[text_col].to_pylist()
        blists = batch["buckets"].to_pylist()
        buckets = np.asarray(batch["bucket"].to_pylist(), dtype=object)
        a_out, b_out, ta, tb = [], [], [], []
        for s, e in zip(starts, stops):
            n = e - s
            if n < 2 or n > max_bucket:
                continue
            base = buckets[s]
            for x in range(s, e):
                for y in range(x + 1, e):
                    common = set(blists[x]) & set(blists[y])
                    if min(common) != base:
                        continue
                    if ids[x] < ids[y]:
                        a_out.append(ids[x]); b_out.append(ids[y])
                        ta.append(texts[x]); tb.append(texts[y])
                    else:
                        a_out.append(ids[y]); b_out.append(ids[x])
                        ta.append(texts[y]); tb.append(texts[x])
        if not a_out:
            return pa.table(
                {
                    "id1": batch[id_col].slice(0, 0),
                    "id2": batch[id_col].slice(0, 0),
                    "similarity": pa.array([], pa.float64()),
                }
            )
        keep, sims = verify_fn(ta, tb)
        t = pa.table(
            {
                "id1": pa.array(a_out),
                "id2": pa.array(b_out),
                "similarity": pa.array(sims, pa.float64()),
            }
        )
        return t.filter(pa.array(keep))

    return grouped_kernel(ds, "bucket", kernel)


def minhash_lsh_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                      threshold: float = 0.7, num_perm: int = 128,
                      bands: int = 32, shingle_k: int = 5,
                      concurrency=(1, 8)):
    """Near-dup pairs with estimated-then-verified Jaccard ≥ threshold."""
    mh = MinHasher(num_perm=num_perm, shingle_k=shingle_k, bands=bands)

    class Emitter(_BucketEmitter):
        def __init__(self):
            super().__init__(
                lambda t: mh.band_keys(mh.signature(t)), id_col, text_col
            )

    bucketed = ds.select_columns([id_col, text_col]).map_batches(
        Emitter, batch_format="pyarrow", concurrency=concurrency
    )

    def verify(ta, tb):
        sims = [ngram_jaccard(a, b, shingle_k) for a, b in zip(ta, tb)]
        return [s >= threshold for s in sims], sims

    return _bucket_pairs(bucketed, id_col, text_col, verify)


def simhash_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                  max_hamming: int = 3, bands: int = 4):
    """Near-dup pairs with SimHash Hamming distance ≤ max_hamming."""

    def bucket_fn(t):
        from .simhash import simhash64
        return simhash_band_keys(simhash64(t), bands)

    bucketed = ds.select_columns([id_col, text_col]).map_batches(
        _BucketEmitter(bucket_fn, id_col, text_col), batch_format="pyarrow"
    )

    def verify(ta, tb):
        fa = simhash_batch(ta)
        fb = simhash_batch(tb)
        dists = [hamming64(int(x), int(y)) for x, y in zip(fa, fb)]
        return [d <= max_hamming for d in dists], [64 - d for d in dists]

    return _bucket_pairs(bucketed, id_col, text_col, verify)


def jaccard_block_dedup(ds, block_col: str, id_col: str = "doc_id",
                        text_col: str = "text", threshold: float = 0.5,
                        ngram: int = 1):
    """True n-gram-Jaccard pairs ≥ threshold within explicit blocks (e.g.
    language). The n=1 case matches DuckDB's ``jaccard`` for oracle checks."""

    def kernel(batch: pa.Table, starts, stops) -> pa.Table:
        ids = np.asarray(batch[id_col].to_pylist(), dtype=object)
        texts = batch[text_col].to_pylist()
        a_out, b_out, sims = [], [], []
        for s, e in zip(starts, stops):
            for x in range(s, e):
                for y in range(x + 1, e):
                    sim = ngram_jaccard(texts[x], texts[y], ngram)
                    if sim >= threshold:
                        i, j = (x, y) if ids[x] < ids[y] else (y, x)
                        a_out.append(ids[i]); b_out.append(ids[j]); sims.append(sim)
        return pa.table(
            {
                "id1": pa.array(a_out) if a_out else batch[id_col].slice(0, 0),
                "id2": pa.array(b_out) if b_out else batch[id_col].slice(0, 0),
                "similarity": pa.array(sims, pa.float64()),
            }
        )

    return grouped_kernel(ds.select_columns([id_col, text_col, block_col]), block_col, kernel)


def embedding_dedup(ds, block_col: str | None, id_col: str = "vec_id",
                    vec_col: str = "embedding", threshold: float = 0.95):
    """Embedding-cosine near-dup pairs ≥ threshold, within blocks (or a
    single block when block_col is None — only for modest N)."""
    cols = [id_col, vec_col] + ([block_col] if block_col else [])
    work = ds.select_columns(cols)
    if block_col is None:
        block_col = "_all"
        work = work.map_batches(
            lambda b: b.append_column("_all", pa.array(["x"] * b.num_rows, pa.string())),
            batch_format="pyarrow",
        )

    def kernel(batch: pa.Table, starts, stops) -> pa.Table:
        ids = np.asarray(batch[id_col].to_pylist(), dtype=object)
        a_out, b_out, sims = [], [], []
        for s, e in zip(starts, stops):
            n = e - s
            if n < 2:
                continue
            mat = np.array(batch[vec_col].slice(s, n).to_pylist(), dtype=np.float64)
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            unit = mat / norms
            sim = unit @ unit.T
            xi, yi = np.nonzero(np.triu(sim >= threshold, k=1))
            for x, y in zip(xi, yi):
                gi, gj = ids[s + x], ids[s + y]
                if gi > gj:
                    gi, gj = gj, gi
                a_out.append(gi); b_out.append(gj); sims.append(float(sim[x, y]))
        return pa.table(
            {
                "id1": pa.array(a_out) if a_out else batch[id_col].slice(0, 0),
                "id2": pa.array(b_out) if b_out else batch[id_col].slice(0, 0),
                "similarity": pa.array(sims, pa.float64()),
            }
        )

    return grouped_kernel(work, block_col, kernel)
