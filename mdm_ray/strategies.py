"""User-extension surface: pluggable match strategies (SURVEY.md §2.10).

The reference's de-facto plugin API is "write a ``generate_*_sql`` function,
add it to the UNION, add a weight" (``batch_mdm_gcp/bigquery_utils.py:563-604``)
or "add a strategy method + weight on ``StreamingMDMProcessor``"
(``streaming_mdm_gcp/streaming_processor.py:25-36``). The Ray-native analogue
is the :class:`MatchStrategy` protocol below, registered via
``EngineConfig(extra_strategies=(...,))``:

* ``blocking_keys(batch)`` feeds extra candidate-generation keys into the
  standard salted blocking exchange (return ``[]`` per row for none);
* ``score_pairs(pair_batch)`` scores the stage-B pair table (columns
  ``1_*``/``2_*`` over the scoring fields) and MUST return values in
  ``[0, 1]`` — the retain-filter bounds budget ``weight × 1`` for each extra
  strategy, so out-of-range scores could prune pairs incorrectly;
* an optional ``pair_columns`` attribute names extra STRING feature columns
  the engine must carry through the blocking exchange so ``score_pairs``
  can read them as ``1_<col>``/``2_<col>``;
* ``weight`` joins the ensemble sum AFTER the built-in five legs (the
  built-in summation order is bit-frozen against the DuckDB oracles).

Strategies are plain picklable objects: they ship to workers inside the
``map_batches`` closures, so heavyweight state should be built lazily (e.g.
``functools.cached_property``) the way the built-in MinHasher is.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

import numpy as np
import pyarrow as pa


@runtime_checkable
class MatchStrategy(Protocol):
    """Contract for a pluggable pair-scoring strategy."""

    name: str
    weight: float

    def blocking_keys(self, batch: pa.Table) -> list[list[str]]:
        """Extra blocking keys per row of a FEATURES batch (may return an
        empty list per row; keys share the namespace of the built-in keys,
        so prefix them, e.g. ``x_state:NY``)."""
        ...

    def score_pairs(self, batch: pa.Table) -> np.ndarray:
        """Scores in [0, 1] for each row of a stage-B PAIR batch (columns
        ``1_<field>`` / ``2_<field>`` over the scoring fields)."""
        ...


class SegmentExactStrategy:
    """Example plug-in (also exercised by tests/test_strategies.py): equal
    ``customer_segment`` → score 1.0, plus a segment blocking key. Mirrors
    how the reference demo would add a strategy (one more SELECT in the
    UNION + one more weight, bigquery_utils.py:563-604)."""

    name = "segment"
    weight = 0.05
    pair_columns = ("customer_segment",)

    def blocking_keys(self, batch: pa.Table) -> list:
        segs = (
            batch["customer_segment"].to_pylist()
            if "customer_segment" in batch.column_names
            else [None] * batch.num_rows
        )
        return [[f"x_seg:{s}"] if s else [] for s in segs]

    def score_pairs(self, batch: pa.Table) -> np.ndarray:
        import pyarrow.compute as pc

        if "1_customer_segment" not in batch.column_names:
            return np.zeros(batch.num_rows, np.float64)
        eq = pc.fill_null(
            pc.and_(
                pc.equal(batch["1_customer_segment"], batch["2_customer_segment"]),
                pc.not_equal(batch["1_customer_segment"], ""),
            ),
            False,
        )
        return eq.to_numpy(zero_copy_only=False).astype(np.float64)


class SaltCollidingStrategy:
    """Testing plug-in whose blocking keys deliberately land in the reserved
    chunk-pair salt namespace (``…#<int>_<int>``) — exercises the
    ``_escape_salt_marker`` boundary: without escaping, these groups would be
    chunk-filtered to zero pairs (or TypeError on a missing chunk column)."""

    name = "saltkey"
    weight = 0.0
    pair_columns = ("customer_segment",)

    def __init__(self, colliding: bool = True):
        # colliding=False emits the same partition of rows under a key that
        # does NOT hit the reserved namespace — the test's control twin
        self.template = "x_tag:{}#1_2" if colliding else "x_tag:{}_1_2"

    def blocking_keys(self, batch: pa.Table) -> list:
        segs = (
            batch["customer_segment"].to_pylist()
            if "customer_segment" in batch.column_names
            else [None] * batch.num_rows
        )
        return [[self.template.format(s)] if s else [] for s in segs]

    def score_pairs(self, batch: pa.Table) -> np.ndarray:
        return np.zeros(batch.num_rows, np.float64)


class NoopStrategy:
    """Example/testing plug-in that contributes nothing (zero scores, no
    keys) — with a deliberately large weight so the retain-bound budget
    path is exercised."""

    name = "noop"
    weight = 0.25

    def blocking_keys(self, batch: pa.Table) -> list:
        return [[] for _ in range(batch.num_rows)]

    def score_pairs(self, batch: pa.Table) -> np.ndarray:
        return np.zeros(batch.num_rows, np.float64)


def extra_pair_columns(cfg) -> list[str]:
    """Union of the string-typed feature columns registered strategies need
    carried through the blocking exchange into the stage-B pair table (their
    optional ``pair_columns`` attribute); order-stable, deduplicated."""
    seen: list[str] = []
    for strat in getattr(cfg, "extra_strategies", ()):
        for c in getattr(strat, "pair_columns", ()):
            if c not in seen:
                seen.append(c)
    return seen


def extra_weight_sum(cfg) -> float:
    """Total ensemble weight of registered extra strategies (0.0 when none);
    budgeted as the conservative upper bound in the retain prefilters."""
    return float(sum(s.weight for s in getattr(cfg, "extra_strategies", ())))


def apply_extra_scores(batch: pa.Table, combined: np.ndarray, cfg,
                       out_cols: dict | None = None) -> np.ndarray:
    """Add each registered strategy's weighted scores to ``combined``
    (appending a ``<name>_score`` column to ``out_cols`` when given)."""
    for strat in getattr(cfg, "extra_strategies", ()):
        s = np.asarray(strat.score_pairs(batch), dtype=np.float64)
        combined = combined + strat.weight * s
        if out_cols is not None:
            out_cols[f"{strat.name}_score"] = pa.array(s, pa.float64())
    return combined


def _escape_salt_marker(key: str) -> str:
    """The pair machinery reserves the ``…#<int>_<int>`` key suffix for its
    chunk-pair salting (pairs.py ``_emit_group``); a user key that happens to
    land in that namespace (e.g. ``x_tag:A#1_2``) would have its group
    silently chunk-filtered. Escape ``#`` → ``#~`` (injective: machinery
    salts are appended AFTER this, and ``~`` breaks the int parse so the
    group is treated as a plain key)."""
    return key.replace("#", "#~") if "#" in key else key


def extra_blocking_keys(batch: pa.Table, cfg) -> list[list[str]] | None:
    """Union of per-strategy extra blocking keys per row (None when no
    strategy contributes any). Keys are escaped out of the reserved
    ``#<int>_<int>`` salt namespace — strategies may emit any string."""
    strategies = getattr(cfg, "extra_strategies", ())
    if not strategies:
        return None
    merged: list[list[str]] | None = None
    for strat in strategies:
        keys = strat.blocking_keys(batch)
        if merged is None:
            merged = [[_escape_salt_marker(x) for x in k] for k in keys]
        else:
            for row, k in zip(merged, keys):
                row.extend(_escape_salt_marker(x) for x in k)
    return merged
