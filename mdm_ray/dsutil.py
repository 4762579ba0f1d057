"""Small Dataset helpers shared across operators."""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pyarrow as pa

# Block-size targets tuned for CPU-heavy per-batch kernels: small enough that
# every stage fans out across all cores of a 32-CPU node (the default 128 MiB
# target left the whole ER pipeline running on 5 blocks — 84% idle), large
# enough that per-task overhead stays negligible at 100 TB (16 MiB blocks ⇒
# ~6.5M tasks per PB per stage, well within Ray's metadata budget; raise via
# DataContext on very large clusters if task counts dominate).
TARGET_MAX_BLOCK_SIZE = 16 * 1024 * 1024
TARGET_MIN_BLOCK_SIZE = 32 * 1024


def ensure_context() -> None:
    """Apply the engine's Ray Data context tuning (idempotent)."""
    import ray.data

    ctx = ray.data.DataContext.get_current()
    if getattr(ctx, "_mdm_ray_tuned", False):
        return
    ctx.target_max_block_size = TARGET_MAX_BLOCK_SIZE
    ctx.target_min_block_size = TARGET_MIN_BLOCK_SIZE
    ctx._mdm_ray_tuned = True


def default_parallelism(multiplier: int = 2, lo: int = 16, hi: int = 512) -> int:
    """Shuffle/partition fan-out: ~2× the cluster's CPUs, clamped."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(lo, min(hi, cpus * multiplier))


def join_partitions(hi: int = 16) -> int:
    """Hash-join partition count: Ray's hash-shuffle join spawns one
    aggregator actor per partition; sizing past the CPU count can deadlock a
    small session when joins chain with other shuffles, so clamp to ~CPUs/2."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(2, min(hi, cpus // 2))


def group_boundaries(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(starts, stops) of equal-key runs in an already-sorted key array."""
    n = len(keys)
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    change = np.nonzero(keys[1:] != keys[:-1])[0] + 1
    starts = np.concatenate(([0], change))
    stops = np.concatenate((change, [n]))
    return starts, stops


def zip_with_index(ds, col: str = "row_number", start: int = 1):
    """Attach a global, order-preserving row number to a Dataset (the classic
    ``zipWithIndex`` operator Ray Data lacks; used for O1 presentation
    ranking — reference ``batch_mdm_gcp/bigquery_utils.py:807`` ORDER BY).

    Scale-safe: the driver pulls only per-block row COUNTS (metadata — one
    int per block); block payloads stay in the object store and are numbered
    in place by per-block tasks. The input is materialized (numbering is a
    global property, so every upstream block must exist), which callers of a
    final presentation step do anyway.
    """
    import ray
    import ray.data

    mat = ds.materialize()
    refs: list = []
    counts: list[int] = []
    unknown: list[int] = []  # positions whose metadata lacks num_rows
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows is None:
                unknown.append(len(refs))
            refs.append(ref)
            counts.append(meta.num_rows or 0)
    if unknown:
        @ray.remote
        def _nrows(block) -> int:
            return block.num_rows

        got = ray.get([_nrows.remote(refs[i]) for i in unknown])
        for i, n in zip(unknown, got):
            counts[i] = n
    offsets = start + np.concatenate(([0], np.cumsum(counts, dtype=np.int64)[:-1]))

    @ray.remote
    def _attach(block: pa.Table, off: int) -> pa.Table:
        idx = pa.array(np.arange(off, off + block.num_rows, dtype=np.int64))
        return block.append_column(col, idx)

    return ray.data.from_arrow_refs(
        [_attach.remote(r, int(o)) for r, o in zip(refs, offsets)]
    )


def hash_partition_by(ds, key: str, n: int | None = None):
    """Co-locate equal ``key`` values in one block via the cheap int-sort
    exchange (add ``_part = crc32(key) mod n`` → pre-split → sort): the same
    guarantee a hash shuffle gives, measured faster in Ray 2.49 than both the
    hash-shuffle strategy and a direct string sort. The ``_part`` column is
    left on the output (callers drop or ignore it)."""
    import zlib

    n = n or default_parallelism(multiplier=4)

    def add_part(b: pa.Table) -> pa.Table:
        parts = [
            zlib.crc32(k.encode("utf-8", "surrogatepass")) % n
            for k in b[key].to_pylist()
        ]
        return b.append_column("_part", pa.array(parts, pa.int32()))

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .repartition(n, shuffle=False)
        .sort("_part")
    )


def grouped_kernel(ds, key: str, fn: Callable[[pa.Table, np.ndarray, np.ndarray], pa.Table]):
    """sort(key) + one vectorized kernel per block over ALL its groups.

    ``fn(batch, starts, stops)`` sees group boundaries precomputed. Correct
    because Ray's sort range-partitions by value (equal keys co-locate in one
    block) — the same guarantee map_groups uses, without its per-group UDF
    dispatch overhead.
    """

    def wrapper(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch[key].to_pylist(), dtype=object)
        starts, stops = group_boundaries(keys)
        return fn(batch, starts, stops)

    # pre-split (no shuffle) so the sort fans out to ~2× the cluster CPUs even
    # when the input is one small block; range partitioning never splits an
    # equal-key run, so groups stay whole
    return (
        ds.repartition(default_parallelism(), shuffle=False)
        .sort(key)
        .map_batches(wrapper, batch_size=None, batch_format="pyarrow")
    )
