"""Approximate-nearest-neighbor similarity search over embedding columns.

Training-data extension (the reference's ANN is a managed Spanner/BigQuery
vector index, ``streaming_mdm_gcp/spanner_utils.py:544-583`` — unusable
offline). Two tiers:

* ``ann_bruteforce`` — the correctness baseline: broadcast the query matrix
  once (``ray.put``), each map_batches task does one NumPy matmul of its
  block against all queries and keeps a per-block top-k; a final small
  groupby(query) merge yields the global top-k. Data-side stays streaming —
  nothing materializes beyond (num_queries × k) rows per block.
* ``ann_ivf`` — the scale path: k-means-style coarse quantizer (trained on a
  sample, broadcast) assigns each vector to its nearest centroid bucket;
  queries probe only ``nprobe`` buckets. Same output schema; recall measured
  against the brute-force baseline in tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _id_array(col) -> np.ndarray:
    """Id column as numpy — NUMERIC dtype when the column is integer (the
    self-mask equality broadcast is then a C numeric compare instead of
    per-element Python object __eq__), object dtype otherwise."""
    arr = (col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
    if pa.types.is_integer(arr.type) and arr.null_count == 0:
        return arr.to_numpy(zero_copy_only=False)
    return np.asarray(arr.to_pylist(), dtype=object)


def _topk_merge_kernel(k: int):
    def kernel(batch: pa.Table, starts, stops) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {
                    "query_id": batch["query_id"].slice(0, 0),
                    "neighbor_id": batch["neighbor_id"].slice(0, 0),
                    "similarity": pa.array([], pa.float64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        sims = batch["similarity"].to_numpy(zero_copy_only=False)
        # rank-encode neighbor ids (string or int) so the lexsort tie-break
        # compares int64 ranks, not Python objects per comparison
        nids = np.asarray(batch["neighbor_id"].to_pylist(), dtype=object)
        _, nrank = np.unique(nids, return_inverse=True)
        counts = stops - starts
        gid = np.repeat(np.arange(len(starts)), counts)
        # deterministic: per group, sim desc then neighbor_id asc; gid is the
        # primary key so segments stay contiguous with unchanged boundaries
        order = np.lexsort((nrank, -sims, gid))
        pos_in_group = np.arange(n) - np.repeat(starts, counts)
        keep = pos_in_group < k
        t = batch.take(pa.array(order[keep], pa.int64()))
        return pa.table(
            {
                "query_id": t["query_id"],
                "neighbor_id": t["neighbor_id"],
                "similarity": t["similarity"].combine_chunks().cast(pa.float64()),
                "rank": pa.array(pos_in_group[keep] + 1, pa.int64()),
            }
        )

    return kernel


def ann_bruteforce(ds, queries: pa.Table, k: int = 5, id_col: str = "vec_id",
                   vec_col: str = "embedding", include_self: bool = False):
    """Exact top-k cosine neighbors for each query vector.

    ``queries``: small Arrow table (id_col, vec_col) — broadcast via ray.put.
    Returns (query_id, neighbor_id, similarity, rank) with deterministic
    tie-breaks (similarity desc, neighbor_id asc).
    """
    import ray

    from .dsutil import grouped_kernel

    q_ids = _id_array(queries[id_col])
    q_mat = _normalize(np.array(queries[vec_col].to_pylist(), dtype=np.float64))
    broadcast = ray.put((q_ids, q_mat))

    def block_topk(batch: pa.Table) -> pa.Table:
        qid_arr, qmat = ray.get(broadcast)
        if batch.num_rows == 0:  # empty block (e.g. repartition remainder)
            return pa.table(
                {
                    "query_id": batch[id_col].slice(0, 0),
                    "neighbor_id": batch[id_col].slice(0, 0),
                    "similarity": pa.array([], pa.float64()),
                }
            )
        ids = _id_array(batch[id_col])
        mat = _normalize(np.array(batch[vec_col].to_pylist(), dtype=np.float64))
        sims = qmat @ mat.T  # [Q, B]
        if not include_self:
            # one broadcast equality mask (numeric when ids are ints),
            # same pattern as ann_ivf_query
            sims = np.where(ids[None, :] == qid_arr[:, None], -np.inf, sims)
        Q, B = sims.shape
        kk = min(k, B)
        if kk < B:
            top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        else:
            top = np.broadcast_to(np.arange(B), (Q, B))
        rows = np.repeat(np.arange(Q), top.shape[1])
        cols = top.ravel()
        vals = sims[rows, cols]
        keep = vals != -np.inf
        return pa.table(
            {
                "query_id": pa.array(qid_arr[rows[keep]].tolist())
                if keep.any() else batch[id_col].slice(0, 0),
                "neighbor_id": pa.array(ids[cols[keep]].tolist())
                if keep.any() else batch[id_col].slice(0, 0),
                "similarity": pa.array(vals[keep], pa.float64()),
            }
        )

    partial = ds.select_columns([id_col, vec_col]).map_batches(
        block_topk, batch_format="pyarrow"
    )
    return grouped_kernel(partial, "query_id", _topk_merge_kernel(k))


def train_centroids(sample: np.ndarray, num_centroids: int, iters: int = 10,
                    seed: int = 42) -> np.ndarray:
    """Plain Lloyd k-means on a sample (driver-side; sample is small)."""
    rng = np.random.default_rng(seed)
    sample = _normalize(sample)
    idx = rng.choice(len(sample), size=min(num_centroids, len(sample)), replace=False)
    cents = sample[idx].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cents.T, axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _normalize(cents)
    return cents


def _bucket_counts_block(block: pa.Table, k: int) -> np.ndarray:
    if block.num_rows == 0 or "_bucket" not in block.column_names:
        return np.zeros(k, np.int64)
    return np.bincount(
        block["_bucket"].to_numpy(zero_copy_only=False), minlength=k
    ).astype(np.int64)


def _sum_counts(*parts) -> np.ndarray:
    return np.sum(parts, axis=0)


def build_ivf_index(ds, id_col: str = "vec_id", vec_col: str = "embedding",
                    num_centroids: int = 16, train_sample: int = 2048,
                    max_bucket_rows: int | None = None):
    """Build an IVF index: train a coarse quantizer on a sample, assign every
    vector to its nearest centroid, and hash-partition the dataset by bucket
    so each inverted list co-locates (``_bucket`` column).

    Skew guard: real corpora produce hot centroids (a hot bucket's whole
    inverted list would land in ONE block — one straggler task per probing
    query). After assignment a raw-task bincount (tree-reduced, same
    ``_tree_reduce`` as the blocking census) counts each bucket exactly; any
    bucket over ``max_bucket_rows`` (default 4× the mean bucket size, floor
    2048) is split into ``ceil(count/cap)`` deterministic hash-shards and the
    sort key becomes ``bucket·S + shard`` — shards of one bucket land in
    different blocks. Queries are unchanged and exact: ``ann_ivf_query``
    kernels process whatever portion of a probed bucket is resident in their
    block and the per-query top-k merge combines the partials.

    Returns ``(index_ds, centroids)`` — ``index_ds`` is MATERIALIZED (the
    one-time build cost); queries then read only their ``nprobe`` probed
    buckets' blocks. At multi-node scale the bucket partitioning IS the
    pruning: a query's matmul touches ~``nprobe/num_centroids`` of the data
    instead of all of it (the reference's managed equivalent is the Spanner
    vector index, ``streaming_mdm_gcp/spanner_utils.py:544-583``)."""
    import ray

    from .blocking import _tree_reduce
    from .dsutil import _part_codes, block_refs, exchange_fanout

    sample_rows = ds.select_columns([vec_col]).limit(train_sample).take_all()
    sample = np.array([r[vec_col] for r in sample_rows], dtype=np.float64)
    cents = train_centroids(sample, num_centroids)
    cents_ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        cen = ray.get(cents_ref)
        mat = _normalize(np.array(batch[vec_col].to_pylist(), dtype=np.float64))
        b = np.argmax(mat @ cen.T, axis=1).astype(np.int32)
        return batch.append_column("_bucket", pa.array(b, pa.int32()))

    work = ds.select_columns([id_col, vec_col]).map_batches(
        assign, batch_format="pyarrow"
    ).materialize()
    counts_task = ray.remote(_bucket_counts_block)
    counts = _tree_reduce(
        [counts_task.remote(r, len(cents)) for r in block_refs(work)],
        ray.remote(_sum_counts), _sum_counts,
    )
    total = int(counts.sum())
    if max_bucket_rows is None:
        max_bucket_rows = max(2048, 4 * total // max(1, len(cents)))
    shards = np.maximum(1, -(-counts // max(1, max_bucket_rows)))
    S = int(shards.max()) if len(shards) else 1
    if S > 1:
        shards_ref = ray.put(shards)

        def shard(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or "_bucket" not in batch.column_names:
                return batch
            b = batch["_bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
            sh = ray.get(shards_ref)[b]
            h = _part_codes(batch[id_col], 1 << 30).astype(np.int64)
            return batch.append_column(
                "_bshard", pa.array(b * S + (h % sh), pa.int64())
            )

        work = work.map_batches(shard, batch_format="pyarrow")
        sort_key, groups = "_bshard", int(shards.sum())
    else:
        sort_key, groups = "_bucket", len(cents)
    # co-locate each (possibly sharded) inverted list: cheap int sort —
    # equal values land in one block; sorting by bucket·S+shard keeps equal
    # buckets contiguous, so the query kernel's group scan is unchanged
    n = max(1, min(exchange_fanout(total), groups))
    index_ds = (
        work.repartition(n, shuffle=False).sort(sort_key).materialize()
    )
    return index_ds, cents


def ann_ivf_query(index_ds, cents: np.ndarray, queries: pa.Table, k: int = 5,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  nprobe: int = 4, include_self: bool = False):
    """Query an IVF index: each query multiplies ONLY against its ``nprobe``
    probed buckets' vectors (per-block: one matmul per resident bucket with
    the subset of queries probing it), then the small per-block top-k
    partials merge per query. All masks vectorized — no per-row Python."""
    import ray

    from .dsutil import group_boundaries, grouped_kernel

    q_ids = _id_array(queries[id_col])
    q_mat = _normalize(np.array(queries[vec_col].to_pylist(), dtype=np.float64))
    probes = np.argsort(-(q_mat @ cents.T), axis=1)[:, :nprobe]
    # bucket → indices of the queries probing it (tiny: Q × nprobe entries)
    bucket_queries: dict[int, np.ndarray] = {}
    for b in np.unique(probes):
        qi, _ = np.nonzero(probes == b)
        bucket_queries[int(b)] = np.unique(qi)
    broadcast = ray.put((q_ids, q_mat, bucket_queries))

    def block_topk(batch: pa.Table) -> pa.Table:
        qid_arr, qmat, b2q = ray.get(broadcast)
        empty = pa.table(
            {
                "query_id": queries[id_col].slice(0, 0),
                "neighbor_id": queries[id_col].slice(0, 0),
                "similarity": pa.array([], pa.float64()),
            }
        )
        if batch.num_rows == 0 or "_bucket" not in batch.column_names:
            return empty
        buckets = batch["_bucket"].to_numpy(zero_copy_only=False)
        # sort partitions guarantee equal buckets are contiguous per block
        ids = _id_array(batch[id_col])
        mat = _normalize(np.array(batch[vec_col].to_pylist(), dtype=np.float64))
        outs = []
        starts, stops = group_boundaries(buckets)
        for s, e in zip(starts, stops):
            qidx = b2q.get(int(buckets[s]))
            if qidx is None or len(qidx) == 0:
                continue  # bucket probed by no query: its vectors are never read
            sims = qmat[qidx] @ mat[s:e].T  # [q_sub, bucket_size]
            if not include_self:
                sims = np.where(
                    ids[None, s:e] == qid_arr[qidx][:, None], -np.inf, sims
                )
            kk = min(k, sims.shape[1])
            if kk < sims.shape[1]:
                top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            else:
                top = np.broadcast_to(
                    np.arange(sims.shape[1]), (len(qidx), sims.shape[1])
                )
            rows = np.repeat(np.arange(len(qidx)), top.shape[1])
            cols = top.ravel()
            vals = sims[rows, cols]
            keep = vals != -np.inf
            if not keep.any():
                continue
            outs.append(
                pa.table(
                    {
                        "query_id": pa.array(qid_arr[qidx][rows[keep]].tolist()),
                        "neighbor_id": pa.array(ids[s + cols[keep]].tolist()),
                        "similarity": pa.array(vals[keep], pa.float64()),
                    }
                )
            )
        if not outs:
            return empty
        return pa.concat_tables(outs).cast(empty.schema)

    partial = index_ds.map_batches(block_topk, batch_format="pyarrow")
    return grouped_kernel(partial, "query_id", _topk_merge_kernel(k))


def ann_ivf(ds, queries: pa.Table, k: int = 5, id_col: str = "vec_id",
            vec_col: str = "embedding", num_centroids: int = 16,
            nprobe: int = 4, train_sample: int = 2048,
            include_self: bool = False):
    """IVF ANN, one-shot: ``build_ivf_index`` + ``ann_ivf_query``. For
    repeated query batches, build once and reuse the index."""
    index_ds, cents = build_ivf_index(
        ds, id_col=id_col, vec_col=vec_col, num_centroids=num_centroids,
        train_sample=train_sample,
    )
    return ann_ivf_query(
        index_ds, cents, queries, k=k, id_col=id_col, vec_col=vec_col,
        nprobe=nprobe, include_self=include_self,
    )
