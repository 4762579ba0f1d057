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


# Exploded blocked rows per pair-exchange partition. Calibration (sf0.1,
# 32 CPUs, 2026-08-18): the ER bench fixture explodes 48,350 docs into ~500k
# (doc, key) rows and needs the full 8×-CPU fan-out to bound the scoring
# straggler (pairs.py:_partition_by_key docstring), so the divisor must keep
# rows/2048 ≥ 8×CPU there; the 40k-row `part` catalog queries explode to
# ~100-280k rows and stop paying 256-partition sort overhead once the
# fan-out tracks their size instead of the cluster's.
EXCHANGE_ROWS_PER_TASK = 2048


def exchange_fanout(rows: int | None, rows_per_task: int = EXCHANGE_ROWS_PER_TASK) -> int:
    """Pair-exchange partition count, scaled to the exploded blocked row
    count: ``ceil(rows / rows_per_task)`` clamped to [1×CPU, 8×CPU]. The 8×
    cap is the straggler bound measured for the ER scoring stage; the 1× floor
    keeps every core fed. ``rows=None`` (unknown) falls back to the cap —
    correct for unbounded inputs, wasteful for small ones, so callers that
    can count cheaply (materialized upstream, census pass) should."""
    cap = default_parallelism(multiplier=8)
    if rows is None:
        return cap
    lo = default_parallelism(multiplier=1, lo=8)
    return max(lo, min(cap, -(-int(rows) // rows_per_task)))


def join_partitions(hi: int = 16) -> int:
    """Hash-join partition count: Ray's hash-shuffle join spawns one
    aggregator actor per partition; sizing past the CPU count can deadlock a
    small session when joins chain with other shuffles, so clamp to ~CPUs/2."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(2, min(hi, cpus // 2))


def block_refs(mat_ds) -> list:
    """Arrow-block object refs of a materialized Dataset (no execution)."""
    return [
        ref
        for bundle in mat_ds.iter_internal_ref_bundles()
        for ref, _meta in bundle.blocks
    ]


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


def collect_table(mat_ds, columns: list[str] | None = None) -> pa.Table:
    """Pull a (small!) materialized Dataset to the driver as ONE Arrow table
    — zero-copy block fetches, no per-row dict conversion (``take()`` costs
    ~0.5 s per 100k rows converting to Python dicts). Callers must bound the
    input (broadcast sides, candidate sets); big data never comes here."""
    import ray

    refs = [
        ref
        for bundle in mat_ds.iter_internal_ref_bundles()
        for ref, _meta in bundle.blocks
    ]
    blocks = ray.get(refs)
    if columns is not None:
        blocks = [b.select(columns) for b in blocks]
    nonempty = [b for b in blocks if b.num_rows]
    if not nonempty:
        return blocks[0] if blocks else pa.table({})
    return pa.concat_tables(nonempty)


def _part_codes(col, n: int) -> np.ndarray:
    """Per-row partition ids ``hash(key) mod n`` for a string or integer
    column (nulls → partition 0; they never join anyway)."""
    import zlib

    import pyarrow.compute as pc

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_integer(arr.type):
        v = pc.fill_null(arr, 0).to_numpy(zero_copy_only=False).astype(np.uint64)
        # splitmix64 finalizer: full avalanche so sequential ids spread evenly
        v = (v ^ (v >> 30)) * np.uint64(0xBF58476D1CE4E5B9)
        v = (v ^ (v >> 27)) * np.uint64(0x94D049BB133111EB)
        v ^= v >> 31
        return (v % np.uint64(n)).astype(np.int32)
    # string keys: hash per UNIQUE value (dictionary-encode in C++, Python
    # crc32 only over the dictionary), then gather — keys repeat per group,
    # so this is O(unique) Python instead of O(rows)
    enc = pc.dictionary_encode(arr)
    uniq = enc.dictionary.to_pylist()
    codes = np.fromiter(
        (zlib.crc32(k.encode("utf-8", "surrogatepass")) % n for k in uniq),
        dtype=np.int32, count=len(uniq),
    )
    iv = pc.fill_null(enc.indices, -1).to_numpy(zero_copy_only=False).astype(np.int64)
    if len(codes) == 0:
        return np.zeros(len(arr), np.int32)
    return np.where(iv < 0, 0, codes[np.maximum(iv, 0)]).astype(np.int32)


def hash_partition_by(ds, key: str, n: int | None = None):
    """Co-locate equal ``key`` values in one block via the cheap int-sort
    exchange (add ``_part = hash(key) mod n`` → pre-split → sort): the same
    guarantee a hash shuffle gives, measured faster in Ray 2.49 than both the
    hash-shuffle strategy and a direct string sort. The ``_part`` column is
    left on the output (callers drop or ignore it)."""
    n = n or default_parallelism(multiplier=4)

    def add_part(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_part", pa.array(_part_codes(b[key], n), pa.int32())
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .repartition(n, shuffle=False)
        .sort("_part")
    )


def copartition_join(left, right, on: str, right_on: str | None = None,
                     how: str = "inner", n: int | None = None):
    """Equi-join two Datasets via ONE cheap int-sort exchange + per-block
    Acero (pyarrow C++) hash joins, replacing Ray's hash-shuffle join (whose
    per-partition aggregator actors cost ~10 s of fixed overhead per join in
    Ray 2.49 regardless of data size).

    Mechanics: each side is widened to the union schema (missing columns
    null-filled — Arrow null arrays are O(1)) plus a ``_side`` tag and a
    unified ``_jk`` key column; the tagged union is hash-partitioned on the
    key (equal keys can never split across blocks: range partition on
    ``_part`` keeps equal values together), and each block joins its two
    sides in C++. Streaming and scale-safe: no driver collect, payload
    crosses the exchange exactly once per side.

    ``how`` ∈ {"inner", "left_outer"}. Output columns: ``on`` (coalesced
    key, left name), then left payload, then right payload. Column names
    must be disjoint across sides (key excepted)."""
    import pyarrow.compute as pc

    right_on = right_on or on
    ls = left.schema()
    rs = right.schema()
    ls = getattr(ls, "base_schema", ls)
    rs = getattr(rs, "base_schema", rs)
    lpay = [f for f in ls if f.name != on]
    rpay = [f for f in rs if f.name != right_on]
    clash = {f.name for f in lpay} & {f.name for f in rpay}
    if clash:
        raise ValueError(f"copartition_join: overlapping payload columns {clash}")
    key_type = ls.field(on).type
    out_fields = [pa.field(on, key_type)] + lpay + rpay
    out_schema = pa.schema(out_fields)
    lnames = [f.name for f in lpay]
    rnames = [f.name for f in rpay]

    def widen(key_name: str, side: int):
        def fn(b: pa.Table) -> pa.Table:
            m = b.num_rows
            if m == 0 or key_name not in b.column_names:
                # sort-partitioned upstream stages can emit schema-less empty
                # blocks; return a typed empty of the tagged-union schema
                return pa.table(
                    {
                        "_jk": pa.array([], key_type),
                        **{f.name: pa.array([], f.type) for f in lpay + rpay},
                        "_side": pa.array([], pa.int8()),
                    }
                )
            cols: dict = {"_jk": b[key_name].combine_chunks().cast(key_type)}
            for f in lpay + rpay:
                cols[f.name] = (
                    b[f.name].combine_chunks()
                    if f.name in b.column_names
                    else pa.nulls(m, f.type)
                )
            cols["_side"] = pa.array(np.full(m, side, np.int8))
            return pa.table(cols)

        return fn

    tagged = left.map_batches(widen(on, 0), batch_format="pyarrow").union(
        right.map_batches(widen(right_on, 1), batch_format="pyarrow")
    )
    part = hash_partition_by(tagged, "_jk", n)
    acero_how = {"inner": "inner", "left_outer": "left outer"}[how]

    def block_join(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {f.name: pa.array([], f.type) for f in out_fields}
        )
        if b.num_rows == 0:
            return empty
        side = b["_side"]
        lt = b.filter(pc.equal(side, 0)).select(["_jk"] + lnames)
        rt = b.filter(pc.equal(side, 1)).select(["_jk"] + rnames)
        if lt.num_rows == 0:
            return empty
        j = lt.join(rt, keys=["_jk"], join_type=acero_how, coalesce_keys=True)
        j = j.rename_columns([on if c == "_jk" else c for c in j.column_names])
        return j.select([f.name for f in out_fields]).cast(out_schema)

    return part.map_batches(block_join, batch_size=None, batch_format="pyarrow")


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


def top_k_per_group(ds, group_cols: list[str], order_col: str, k: int,
                    tie_col: str, largest: bool = True):
    """Top-k rows per group by ``order_col`` (ties broken by ``tie_col``
    ascending — deterministic at any parallelism). ONE sort exchange on the
    group key (grouped_kernel: range partitioning co-locates each group),
    then a vectorized per-block rank filter — no per-group Python dispatch,
    no global sort of the full table by the order column.

    Output: the input columns + 1-based ``rank``. Scale note: a group larger
    than a block would need the salted two-stage top-k (per-shard top-k →
    merge) — groups here are bounded (k ≪ block budget, group = category key),
    documented per the custom-operator rule."""

    def add_key(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        key = None
        for c in group_cols:
            part = pc.cast(b[c], pa.string())
            key = part if key is None else pc.binary_join_element_wise(key, part, "|")
        return b.append_column("_gk", key)

    def kernel(b: pa.Table, starts: np.ndarray, stops: np.ndarray) -> pa.Table:
        out_cols = [c for c in b.column_names if c != "_gk"]
        if b.num_rows == 0:
            t = b.select(out_cols)
            return t.append_column("rank", pa.array([], pa.int64()))
        n = b.num_rows
        counts = stops - starts
        gid = np.repeat(np.arange(len(starts)), counts)
        order_v = b[order_col].to_numpy(zero_copy_only=False)
        tie_v = b[tie_col].to_numpy(zero_copy_only=False)
        sort_order = np.lexsort(
            (tie_v, -order_v if largest else order_v, gid)
        )
        # gid is the primary lexsort key, so segments stay contiguous with
        # unchanged boundaries: within-group rank = position - segment start
        rank = np.arange(n) - np.repeat(starts, counts)
        keep = sort_order[rank < k]
        t = b.take(pa.array(keep, pa.int64())).select(out_cols)
        return t.append_column("rank", pa.array(rank[rank < k] + 1, pa.int64()))

    return grouped_kernel(ds.map_batches(add_key, batch_format="pyarrow"),
                          "_gk", kernel)
