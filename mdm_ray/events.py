"""Event-stream operators: sessionization, tumbling-window aggregates, as-of
join (training-data pipeline extensions — no analogue in the reference, whose
streaming path is one-record-at-a-time Spanner lookups,
``streaming_mdm_gcp/streaming_processor.py``).

All three follow the same Ray-native shape: ``hash_partition_by(user_id)``
co-locates each entity's full timeline in one block (ONE cheap int-sort
exchange), then a per-block vectorized kernel sorts locally by
``(user, ts, event_id)`` and computes the windows/matches with NumPy
segment ops — no per-row Python, no driver-side data.

Partitioning assumption (documented per the custom-operator rule): one
entity's events fit in a worker block. User timelines are bounded in
practice (≤ millions of events ≪ block budget); a pathological entity would
need time-range chunking with boundary stitching, which these kernels do not
implement.

Money-safe sums: ``value`` sums are accumulated in integer cents
(``rint(value·100)``) so the 6-decimal rounded output is exact regardless of
accumulation order — float sums disagree with a SQL oracle in the last ulp
often enough to flip a 6-dp rounding boundary.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dsutil import hash_partition_by

_US_PER_MIN = 60_000_000


def _sorted_block(b: pa.Table, cols: list[str]):
    """Local (user, ts, event_id) sort; returns column ndarrays. ``ts`` is
    cast to int64 epoch-µs (zero-copy view of timestamp[us])."""
    uid = b["user_id"].to_numpy(zero_copy_only=False)
    ts = pc.cast(b["ts"].combine_chunks(), pa.int64()).to_numpy(zero_copy_only=False)
    eid = b["event_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((eid, ts, uid))
    out = {"user_id": uid[order], "ts": ts[order], "event_id": eid[order]}
    for c in cols:
        out[c] = (
            b[c].to_numpy(zero_copy_only=False)[order]
            if c not in out else out[c]
        )
    return out


def _cents(values: np.ndarray) -> np.ndarray:
    return np.rint(values * 100.0).astype(np.int64)


def sessionize(ds, gap_minutes: int = 30, min_events: int = 1):
    """Gap-based sessionization: a user's events sorted by (ts, event_id)
    start a new session when the gap to the previous event exceeds
    ``gap_minutes``. Emits one row per session:
    (user_id, session_seq, n_events, start_us, end_us, total_value)."""
    gap_us = gap_minutes * _US_PER_MIN

    def empty() -> pa.Table:
        return pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "session_seq": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "start_us": pa.array([], pa.int64()),
                "end_us": pa.array([], pa.int64()),
                "total_value": pa.array([], pa.float64()),
            }
        )

    def kernel(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return empty()
        s = _sorted_block(b, ["value"])
        uid, ts = s["user_id"], s["ts"]
        n = len(uid)
        new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
        gap_break = np.concatenate(([True], (ts[1:] - ts[:-1]) > gap_us))
        new_sess = new_user | gap_break
        starts = np.nonzero(new_sess)[0]
        stops = np.append(starts[1:], n)
        cents = np.add.reduceat(_cents(s["value"]), starts)
        # session_seq: 1-based ordinal within the user (every user start is
        # also a session start, so the per-user first-session index is a
        # cummax over session ordinals)
        su = uid[starts]
        first_of_user = np.maximum.accumulate(
            np.where(np.concatenate(([True], su[1:] != su[:-1])),
                     np.arange(len(starts)), 0)
        )
        keep = (stops - starts) >= min_events
        return pa.table(
            {
                "user_id": pa.array(su[keep], pa.int64()),
                "session_seq": pa.array(
                    (np.arange(len(starts)) - first_of_user + 1)[keep], pa.int64()
                ),
                "n_events": pa.array((stops - starts)[keep], pa.int64()),
                "start_us": pa.array(ts[starts][keep], pa.int64()),
                "end_us": pa.array(ts[stops - 1][keep], pa.int64()),
                "total_value": pa.array(
                    cents[keep].astype(np.float64) / 100.0, pa.float64()
                ),
            }
        )

    cols = ["event_id", "ts", "user_id", "value"]
    return hash_partition_by(ds.select_columns(cols), "user_id").map_batches(
        kernel, batch_size=None, batch_format="pyarrow"
    )


def window_agg(ds, window_minutes: int = 60):
    """Tumbling-window aggregate per (event_type, window): one row per
    non-empty window with count and summed value. Two-stage: each batch
    pre-aggregates locally (combiner), then one small exchange merges the
    per-window partials — the classic partial-aggregate pattern that keeps
    the shuffle at O(windows), not O(events)."""
    win_us = window_minutes * _US_PER_MIN

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "ts" not in b.column_names:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "window_start_us": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "cents": pa.array([], pa.int64()),
                }
            )
        ts = pc.cast(b["ts"].combine_chunks(), pa.int64()).to_numpy(zero_copy_only=False)
        win = (ts // win_us) * win_us
        t = pa.table(
            {
                "event_type": b["event_type"],
                "window_start_us": pa.array(win, pa.int64()),
                "cents": pa.array(_cents(
                    b["value"].to_numpy(zero_copy_only=False)), pa.int64()),
            }
        )
        g = t.group_by(["event_type", "window_start_us"]).aggregate(
            [("cents", "count"), ("cents", "sum")]
        )
        return g.rename_columns(
            ["event_type", "window_start_us", "n_events", "cents"]
        )

    def merge(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "event_type" not in b.column_names:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "window_start_us": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "total_value": pa.array([], pa.float64()),
                }
            )
        g = b.group_by(["event_type", "window_start_us"]).aggregate(
            [("n_events", "sum"), ("cents", "sum")]
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "window_start_us": g["window_start_us"],
                "n_events": g["n_events_sum"],
                "total_value": pa.array(
                    g["cents_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
                    / 100.0,
                    pa.float64(),
                ),
            }
        )

    partials = ds.select_columns(["ts", "event_type", "value"]).map_batches(
        partial, batch_format="pyarrow"
    )

    def add_key(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "event_type" not in b.column_names:
            return pa.table({"_wk": pa.array([], pa.string())})
        return b.append_column(
            "_wk",
            pc.binary_join_element_wise(
                b["event_type"], pc.cast(b["window_start_us"], pa.string()), "|"
            ),
        )

    keyed = partials.map_batches(add_key, batch_format="pyarrow")
    return hash_partition_by(keyed, "_wk", n=16).map_batches(
        lambda b: merge(b.select([c for c in b.column_names if c not in ("_wk", "_part")])
                        if b.num_rows else b),
        batch_size=None, batch_format="pyarrow",
    )


def asof_join(ds, left_type: str = "purchase", right_type: str = "click"):
    """Per-entity as-of join: for every ``left_type`` event, the most recent
    strictly-preceding ``right_type`` event by the same user (order =
    (ts, event_id) — deterministic under equal timestamps). LEFT semantics:
    a purchase with no prior click emits a null match.

    Vectorized per block: one local sort, then a segmented
    last-occurrence carry-forward (``np.maximum.accumulate`` over click
    positions, invalidated across user boundaries) — the Ray Data
    composition the operator table calls for where the Dataset API lacks a
    native as-of join."""

    def empty() -> pa.Table:
        return pa.table(
            {
                "purchase_id": pa.array([], pa.int64()),
                "purchase_us": pa.array([], pa.int64()),
                "click_id": pa.array([], pa.int64()),
                "click_us": pa.array([], pa.int64()),
            }
        )

    def kernel(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return empty()
        s = _sorted_block(b, ["event_type"])
        uid, ts, eid, et = s["user_id"], s["ts"], s["event_id"], s["event_type"]
        n = len(uid)
        idx = np.arange(n)
        is_right = et == right_type
        last_right = np.maximum.accumulate(np.where(is_right, idx, -1))
        user_start = np.maximum.accumulate(
            np.where(np.concatenate(([True], uid[1:] != uid[:-1])), idx, 0)
        )
        lefts = np.nonzero(et == left_type)[0]
        # strictly preceding in (ts, event_id) order: the carry-forward at
        # position i covers rows < i plus i itself; a left row is never a
        # right row, so self-match is impossible
        j = last_right[lefts]
        ok = j >= user_start[lefts]
        click_id = np.where(ok, eid[np.maximum(j, 0)], 0)
        click_us = np.where(ok, ts[np.maximum(j, 0)], 0)
        return pa.table(
            {
                "purchase_id": pa.array(eid[lefts], pa.int64()),
                "purchase_us": pa.array(ts[lefts], pa.int64()),
                "click_id": pa.array(
                    np.ma.masked_array(click_id, mask=~ok), pa.int64()
                ),
                "click_us": pa.array(
                    np.ma.masked_array(click_us, mask=~ok), pa.int64()
                ),
            }
        )

    cols = ["event_id", "ts", "user_id", "event_type"]
    return hash_partition_by(ds.select_columns(cols), "user_id").map_batches(
        kernel, batch_size=None, batch_format="pyarrow"
    )
