"""Small Dataset helpers shared across operators."""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pyarrow as pa


def group_boundaries(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(starts, stops) of equal-key runs in an already-sorted key array."""
    n = len(keys)
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    change = np.nonzero(keys[1:] != keys[:-1])[0] + 1
    starts = np.concatenate(([0], change))
    stops = np.concatenate((change, [n]))
    return starts, stops


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

    return ds.sort(key).map_batches(wrapper, batch_size=None, batch_format="pyarrow")
