"""Distributed EXACT per-group percentiles (order statistics).

The scale-safe pattern (no group ever has to fit in one block, unlike a
naive ``map_groups`` percentile):

1. ``sort((group, value))`` — Ray's range partition leaves each group's
   values globally ordered across consecutive blocks.
2. Metadata pass: one tiny task per block returns its per-group run counts
   (O(groups-in-block) ints — never the values). The driver prefix-sums
   them into each block's starting offset within every group, and computes
   each requested quantile's global target index per group with DuckDB's
   ``quantile_disc`` convention: 0-based ``ceil(q·n) − 1``.
3. Pick pass: one tiny task per block that owns at least one target row
   extracts just those rows by local index. Output is groups × quantiles
   values — driver-side state is per-block group counts plus that result,
   both bounded and block-payload-free.

The reference has no percentile operator; this is a training-data analytics
extension (e.g. quality-score distribution cutoffs per language/source).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def group_percentiles(ds, group_col: str, value_col: str,
                      qs: tuple[float, ...] = (0.5, 0.95, 0.99),
                      out_names: tuple[str, ...] | None = None):
    """One output row per group: ``group_col`` + one exact ``quantile_disc``
    value column per q. Returns a (small) ray.data.Dataset."""
    import ray
    import ray.data

    out_names = out_names or tuple(f"p{int(q * 100)}" for q in qs)
    if len(out_names) != len(qs):
        raise ValueError("out_names must match qs")

    sorted_ds = (
        ds.select_columns([group_col, value_col])
        .sort([group_col, value_col])
        .materialize()
    )

    @ray.remote
    def block_group_counts(block: pa.Table):
        if block.num_rows == 0:
            return [], []
        g = block[group_col].to_pylist()
        arr = np.asarray(g, dtype=object)
        change = np.nonzero(arr[1:] != arr[:-1])[0] + 1
        starts = np.concatenate(([0], change))
        stops = np.concatenate((change, [len(arr)]))
        return [arr[s] for s in starts], (stops - starts).tolist()

    refs = []
    for bundle in sorted_ds.iter_internal_ref_bundles():
        for ref, _meta in bundle.blocks:
            refs.append(ref)
    per_block = ray.get([block_group_counts.remote(r) for r in refs])

    # global per-group totals + each block's starting offset within the group
    totals: dict = {}
    block_offsets: list[list[tuple]] = []  # per block: (group, local_start, count, group_offset)
    for groups, counts in per_block:
        entries = []
        local = 0
        for g, c in zip(groups, counts):
            entries.append((g, local, c, totals.get(g, 0)))
            totals[g] = totals.get(g, 0) + c
            local += c
        block_offsets.append(entries)

    # target global index per (group, q): DuckDB quantile_disc = ceil(q·n)−1
    targets: dict = {}
    for g, n in totals.items():
        targets[g] = [min(n - 1, max(0, int(np.ceil(q * n)) - 1)) for q in qs]

    # route each target to the block that owns it
    picks_per_block: list[list[tuple[int, object, int]]] = [[] for _ in refs]
    for bi, entries in enumerate(block_offsets):
        for g, local_start, count, goff in entries:
            for qi, t in enumerate(targets[g]):
                if goff <= t < goff + count:
                    picks_per_block[bi].append((local_start + (t - goff), g, qi))

    @ray.remote
    def pick(block: pa.Table, picks):
        vals = block[value_col].to_numpy(zero_copy_only=False)
        return [(g, qi, float(vals[i])) for i, g, qi in picks]

    got = ray.get([
        pick.remote(refs[bi], p) for bi, p in enumerate(picks_per_block) if p
    ])
    by_group: dict = {g: [None] * len(qs) for g in totals}
    for chunk in got:
        for g, qi, v in chunk:
            by_group[g][qi] = v

    groups_sorted = sorted(by_group)
    cols: dict = {group_col: pa.array(groups_sorted)}
    for qi, name in enumerate(out_names):
        cols[name] = pa.array(
            [by_group[g][qi] for g in groups_sorted], pa.float64()
        )
    return ray.data.from_arrow(pa.table(cols))
