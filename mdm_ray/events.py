"""Event-stream operators: sessionization, tumbling-window aggregates, as-of
join (training-data pipeline extensions — no analogue in the reference, whose
streaming path is one-record-at-a-time Spanner lookups,
``streaming_mdm_gcp/streaming_processor.py``).

All three follow the same Ray-native shape: ``hash_partition_by(user_id)``
co-locates each entity's full timeline in one block (ONE cheap int-sort
exchange), then a per-block vectorized kernel sorts locally by
``(user, ts, event_id)`` and computes the windows/matches with NumPy
segment ops — no per-row Python, no driver-side data.

Partitioning assumption (documented per the custom-operator rule): the
default paths put one entity's full timeline in one block (user timelines
are bounded in practice — ≤ millions of events ≪ block budget).
``sessionize``, ``asof_join`` and ``interval_join`` also provide a
two-level ``chunk_hours=k`` scale path with NO such assumption: events are
exchanged on (user, time-chunk), resolved locally, and only per-chunk
summaries (session fragments / last-right rows / replicated interval rows —
never the events) cross the second, tiny exchange. Outputs are
bit-identical to the single-level paths (equivalence tests).

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


def sessionize(ds, gap_minutes: int = 30, min_events: int = 1,
               chunk_hours: int | None = None):
    """Gap-based sessionization: a user's events sorted by (ts, event_id)
    start a new session when the gap to the previous event exceeds
    ``gap_minutes``. Emits one row per session:
    (user_id, session_seq, n_events, start_us, end_us, total_value).

    ``chunk_hours=None`` (default): ONE exchange on user_id; assumes a
    user's timeline fits a block. ``chunk_hours=k``: the two-level scale
    path with NO such assumption — events are exchanged on
    (user, time-chunk), each chunk emits session FRAGMENTS locally, and a
    second exchange carries only the per-fragment summaries (one row per
    fragment — never the events) to a per-user stitch that merges fragments
    across chunk boundaries when the gap allows. All fragment aggregates
    are associative (count / int-cents sum / min / max), so the stitched
    output is bit-identical to the single-level path (equivalence test in
    tests/test_ops.py)."""
    gap_us = gap_minutes * _US_PER_MIN
    if chunk_hours is not None:
        return _sessionize_chunked(ds, gap_us, min_events,
                                   chunk_hours * 60 * _US_PER_MIN)

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


def _sessionize_chunked(ds, gap_us: int, min_events: int, chunk_us: int):
    """Two-level sessionize (see :func:`sessionize`). Stage 1 partitions on
    (user, ts // chunk_us) so even one user's events split into bounded
    blocks; stage 2 partitions the tiny fragment table on user."""

    def add_chunk_key(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return pa.table({"_ck": pa.array([], pa.string())})
        ts = pc.cast(b["ts"].combine_chunks(), pa.int64()).to_numpy(
            zero_copy_only=False)
        chunk = pa.array(ts // chunk_us, pa.int64())
        return b.append_column(
            "_ck",
            pc.binary_join_element_wise(
                pc.cast(b["user_id"], pa.string()),
                pc.cast(chunk, pa.string()), "|",
            ),
        )

    def fragment_kernel(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "start_us": pa.array([], pa.int64()),
                    "end_us": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "cents": pa.array([], pa.int64()),
                }
            )
        s = _sorted_block(b, ["value"])
        uid, ts = s["user_id"], s["ts"]
        n = len(uid)
        # chunk breaks are implicit: a block may hold several (user, chunk)
        # groups, and a gap <= gap_us across a chunk edge is healed in the
        # stitch — here every user/chunk/gap change starts a new fragment
        chunk = ts // chunk_us
        new_frag = (
            np.concatenate(([True], uid[1:] != uid[:-1]))
            | np.concatenate(([True], chunk[1:] != chunk[:-1]))
            | np.concatenate(([True], (ts[1:] - ts[:-1]) > gap_us))
        )
        starts = np.nonzero(new_frag)[0]
        stops = np.append(starts[1:], n)
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "start_us": pa.array(ts[starts], pa.int64()),
                "end_us": pa.array(ts[stops - 1], pa.int64()),
                "n_events": pa.array(stops - starts, pa.int64()),
                "cents": pa.array(
                    np.add.reduceat(_cents(s["value"]), starts), pa.int64()
                ),
            }
        )

    def stitch_kernel(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "user_id" not in b.column_names:
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
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        st = b["start_us"].to_numpy(zero_copy_only=False)
        en = b["end_us"].to_numpy(zero_copy_only=False)
        cnt = b["n_events"].to_numpy(zero_copy_only=False)
        cents = b["cents"].to_numpy(zero_copy_only=False)
        order = np.lexsort((en, st, uid))
        uid, st, en, cnt, cents = (
            uid[order], st[order], en[order], cnt[order], cents[order])
        new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
        # fragments are time-disjoint per user (chunks partition time), so
        # consecutive-sorted merge is exact
        new_sess = new_user | np.concatenate(
            ([True], (st[1:] - en[:-1]) > gap_us))
        starts = np.nonzero(new_sess)[0]
        stops = np.append(starts[1:], len(uid))
        su = uid[starts]
        first_of_user = np.maximum.accumulate(
            np.where(np.concatenate(([True], su[1:] != su[:-1])),
                     np.arange(len(starts)), 0)
        )
        n_ev = np.add.reduceat(cnt, starts)
        tot = np.add.reduceat(cents, starts)
        keep = n_ev >= min_events
        return pa.table(
            {
                "user_id": pa.array(su[keep], pa.int64()),
                "session_seq": pa.array(
                    (np.arange(len(starts)) - first_of_user + 1)[keep],
                    pa.int64()),
                "n_events": pa.array(n_ev[keep], pa.int64()),
                "start_us": pa.array(st[starts][keep], pa.int64()),
                "end_us": pa.array(en[stops - 1][keep], pa.int64()),
                "total_value": pa.array(
                    tot[keep].astype(np.float64) / 100.0, pa.float64()),
            }
        )

    cols = ["event_id", "ts", "user_id", "value"]
    frags = (
        hash_partition_by(
            ds.select_columns(cols).map_batches(
                add_chunk_key, batch_format="pyarrow"),
            "_ck",
        )
        .map_batches(fragment_kernel, batch_size=None, batch_format="pyarrow")
    )
    return hash_partition_by(frags, "user_id").map_batches(
        stitch_kernel, batch_size=None, batch_format="pyarrow"
    )


def window_agg(ds, window_minutes: int = 60):
    """Tumbling-window aggregate per (event_type, window): one row per
    non-empty window with count and summed value. Two-stage: each batch
    pre-aggregates locally (combiner), then one small exchange merges the
    per-window partials — the classic partial-aggregate pattern that keeps
    the shuffle at O(windows), not O(events)."""
    win_us = window_minutes * _US_PER_MIN

    def add_window(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "ts" not in b.column_names:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "window_start_us": pa.array([], pa.int64()),
                    "value": pa.array([], pa.float64()),
                }
            )
        ts = pc.cast(b["ts"].combine_chunks(), pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table(
            {
                "event_type": b["event_type"],
                "window_start_us": pa.array((ts // win_us) * win_us, pa.int64()),
                "value": b["value"],
            }
        )

    keyed = ds.select_columns(["ts", "event_type", "value"]).map_batches(
        add_window, batch_format="pyarrow"
    )
    return window_agg_from_keyed(keyed)


def sliding_window_agg(ds, window_minutes: int = 60, hop_minutes: int = 15):
    """Sliding (hopping) window aggregate per (event_type, window): windows of
    ``window_minutes`` starting every ``hop_minutes`` (must divide evenly);
    an event lands in exactly window/hop windows (fewer near t=0 where
    negative window starts are clipped). Same partial-aggregate shape as
    ``window_agg``: the ×k explode happens INSIDE the combiner batch and is
    collapsed to per-window partials before the exchange, so the shuffle
    stays O(windows), not O(events × k)."""
    if window_minutes % hop_minutes:
        raise ValueError("window_minutes must be a multiple of hop_minutes")
    win_us = window_minutes * _US_PER_MIN
    hop_us = hop_minutes * _US_PER_MIN
    k = win_us // hop_us

    def explode(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "ts" not in b.column_names:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "window_start_us": pa.array([], pa.int64()),
                    "value": pa.array([], pa.float64()),
                }
            )
        ts = pc.cast(b["ts"].combine_chunks(), pa.int64()).to_numpy(
            zero_copy_only=False)
        base = (ts // hop_us) * hop_us
        # window starts base, base-hop, ..., base-(k-1)*hop — each contains ts
        ws = (base[:, None] - np.arange(k, dtype=np.int64) * hop_us).ravel()
        keep = ws >= 0
        idx = pa.array(np.repeat(np.arange(len(ts), dtype=np.int64), k)[keep])
        return pa.table(
            {
                "event_type": b["event_type"].take(idx),
                "window_start_us": pa.array(ws[keep], pa.int64()),
                "value": b["value"].take(idx),
            }
        )

    exploded = ds.select_columns(["ts", "event_type", "value"]).map_batches(
        explode, batch_format="pyarrow"
    )
    return window_agg_from_keyed(exploded)


def window_agg_from_keyed(ds):
    """Shared partial→merge tail for the tumbling/sliding window aggregates:
    input rows already carry (event_type, window_start_us, value)."""

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "event_type" not in b.column_names:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "window_start_us": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "cents": pa.array([], pa.int64()),
                }
            )
        t = pa.table(
            {
                "event_type": b["event_type"],
                "window_start_us": b["window_start_us"],
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

    partials = ds.map_batches(partial, batch_format="pyarrow")

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
    # merge() handles the empty case itself (typed-empty output schema), so
    # call it unconditionally — passing an empty input block through would
    # emit the pre-merge (_wk/_part/cents) schema into the output stream
    return hash_partition_by(keyed, "_wk", n=16).map_batches(
        lambda b: merge(
            b.select([c for c in b.column_names if c not in ("_wk", "_part")])
        ),
        batch_size=None, batch_format="pyarrow",
    )


def interval_join(points, intervals, by: str = "user_id", point_ts: str = "ts",
                  point_id: str = "event_id", start: str = "start_us",
                  end: str = "end_us", interval_key: str = "session_seq",
                  chunk_hours: int | None = None):
    """Range (point-in-interval) join: each point row matches the interval of
    the same ``by`` key with ``start <= point_ts <= end``. INNER semantics.

    Intervals must be NON-OVERLAPPING per key — the containing interval is
    then the last one whose start precedes the point, so the join is ONE
    union exchange plus the same segmented carry-forward kernel as
    :func:`asof_join` — no per-group Python, no O(points × intervals)
    blowup.

    ``chunk_hours=None``: exchange on ``by`` (one key's rows fit a block).
    ``chunk_hours=k``: two-level scale path — points carry their time chunk,
    each interval is REPLICATED once per chunk it overlaps (intervals are
    already summaries, so the replication is tiny), and the exchange runs on
    (key, chunk): no single-block-per-key assumption; a point meets exactly
    the replicas overlapping its chunk, so matches are identical.

    Returns (point_id, by, point_us, interval_key)."""
    chunk_us = (chunk_hours * 60 * _US_PER_MIN) if chunk_hours else None

    def empty() -> pa.Table:
        return pa.table(
            {
                point_id: pa.array([], pa.int64()),
                by: pa.array([], pa.int64()),
                "point_us": pa.array([], pa.int64()),
                interval_key: pa.array([], pa.int64()),
            }
        )

    def tag_points(b: pa.Table) -> pa.Table:
        ts = pc.cast(b[point_ts].combine_chunks(), pa.int64())
        tnp = ts.to_numpy(zero_copy_only=False)
        c = tnp // chunk_us if chunk_us else np.zeros(len(tnp), np.int64)
        return pa.table(
            {
                "_by": pc.cast(b[by].combine_chunks(), pa.int64()),
                "_c": pa.array(c, pa.int64()),
                "_t": ts,
                "_end": pa.nulls(b.num_rows, pa.int64()),
                "_pid": pc.cast(b[point_id].combine_chunks(), pa.int64()),
                "_ik": pa.nulls(b.num_rows, pa.int64()),
                "_kind": pa.array(np.ones(b.num_rows, np.int8), pa.int8()),
            }
        )

    def tag_intervals(b: pa.Table) -> pa.Table:
        st = pc.cast(b[start].combine_chunks(), pa.int64())
        en = pc.cast(b[end].combine_chunks(), pa.int64())
        if chunk_us is None:
            return pa.table(
                {
                    "_by": pc.cast(b[by].combine_chunks(), pa.int64()),
                    "_c": pa.array(np.zeros(b.num_rows, np.int64), pa.int64()),
                    "_t": st,
                    "_end": en,
                    "_pid": pa.nulls(b.num_rows, pa.int64()),
                    "_ik": pc.cast(b[interval_key].combine_chunks(), pa.int64()),
                    "_kind": pa.array(np.zeros(b.num_rows, np.int8), pa.int8()),
                }
            )
        # one replica per chunk the interval overlaps
        stn = st.to_numpy(zero_copy_only=False)
        enn = en.to_numpy(zero_copy_only=False)
        c0 = stn // chunk_us
        counts = (enn // chunk_us - c0 + 1).astype(np.int64)
        ridx = np.repeat(np.arange(b.num_rows, dtype=np.int64), counts)
        within = np.arange(len(ridx), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(counts)[:-1])), counts)
        take = pa.array(ridx, pa.int64())
        return pa.table(
            {
                "_by": pc.cast(b[by].combine_chunks(), pa.int64()).take(take),
                "_c": pa.array(c0[ridx] + within, pa.int64()),
                "_t": st.take(take),
                "_end": en.take(take),
                "_pid": pa.nulls(len(ridx), pa.int64()),
                "_ik": pc.cast(
                    b[interval_key].combine_chunks(), pa.int64()).take(take),
                "_kind": pa.array(np.zeros(len(ridx), np.int8), pa.int8()),
            }
        )

    def kernel(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "_by" not in b.column_names:
            return empty()
        uid = b["_by"].to_numpy(zero_copy_only=False)
        cch = b["_c"].to_numpy(zero_copy_only=False)
        t = b["_t"].to_numpy(zero_copy_only=False)
        kind = b["_kind"].to_numpy(zero_copy_only=False)
        # intervals (_kind 0) sort before points at equal t: start == ts
        # counts as containment; segments are (key, chunk) runs (chunk is
        # all-zero in single-level mode)
        order = np.lexsort((kind, t, cch, uid))
        uid, cch, t, kind = uid[order], cch[order], t[order], kind[order]
        endv = pc.fill_null(b["_end"], -1).to_numpy(zero_copy_only=False)[order]
        pid = pc.fill_null(b["_pid"], 0).to_numpy(zero_copy_only=False)[order]
        ik = pc.fill_null(b["_ik"], 0).to_numpy(zero_copy_only=False)[order]
        n = len(uid)
        idx = np.arange(n)
        last_iv = np.maximum.accumulate(np.where(kind == 0, idx, -1))
        user_start = np.maximum.accumulate(
            np.where(
                np.concatenate(
                    ([True], (uid[1:] != uid[:-1]) | (cch[1:] != cch[:-1]))
                ),
                idx, 0,
            )
        )
        pts = np.nonzero(kind == 1)[0]
        j = last_iv[pts]
        ok = (j >= user_start[pts]) & (t[pts] <= endv[np.maximum(j, 0)])
        pts, j = pts[ok], j[ok]
        return pa.table(
            {
                point_id: pa.array(pid[pts], pa.int64()),
                by: pa.array(uid[pts], pa.int64()),
                "point_us": pa.array(t[pts], pa.int64()),
                interval_key: pa.array(ik[j], pa.int64()),
            }
        )

    union = points.select_columns([by, point_ts, point_id]).map_batches(
        tag_points, batch_format="pyarrow"
    ).union(
        intervals.select_columns([by, start, end, interval_key]).map_batches(
            tag_intervals, batch_format="pyarrow"
        )
    )
    if chunk_us is None:
        part_key = "_by"
    else:
        part_key = "_ck"

        def add_ck(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "_by" not in b.column_names:
                return pa.table({"_ck": pa.array([], pa.string())})
            return b.append_column(
                "_ck",
                pc.binary_join_element_wise(
                    pc.cast(b["_by"], pa.string()),
                    pc.cast(b["_c"], pa.string()), "|",
                ),
            )

        union = union.map_batches(add_ck, batch_format="pyarrow")
    return hash_partition_by(union, part_key).map_batches(
        kernel, batch_size=None, batch_format="pyarrow"
    )


def asof_join(ds, left_type: str = "purchase", right_type: str = "click",
              chunk_hours: int | None = None):
    """Per-entity as-of join: for every ``left_type`` event, the most recent
    strictly-preceding ``right_type`` event by the same user (order =
    (ts, event_id) — deterministic under equal timestamps). LEFT semantics:
    a purchase with no prior click emits a null match.

    Vectorized per block: one local sort, then a segmented
    last-occurrence carry-forward (``np.maximum.accumulate`` over click
    positions, invalidated across user boundaries) — the Ray Data
    composition the operator table calls for where the Dataset API lacks a
    native as-of join.

    ``chunk_hours=None``: one exchange on user_id (a user's timeline fits a
    block). ``chunk_hours=k``: two-level scale path — exchange on
    (user, time-chunk); lefts with a local preceding right resolve in-chunk,
    and only the UNMATCHED lefts plus one last-right summary row per
    (user, chunk) ride the per-user stitch exchange. A left unmatched in its
    chunk has no in-chunk right before it, so its true match is the last
    right of any earlier chunk = the summary carry-forward; results are
    bit-identical to the single-level path (equivalence test)."""
    if chunk_hours is not None:
        return _asof_join_chunked(
            ds, left_type, right_type, chunk_hours * 60 * _US_PER_MIN)

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


def _asof_join_chunked(ds, left_type: str, right_type: str, chunk_us: int):
    """Two-level as-of join (see :func:`asof_join`)."""

    def add_chunk_key(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return pa.table({"_ck": pa.array([], pa.string())})
        ts = pc.cast(b["ts"].combine_chunks(), pa.int64()).to_numpy(
            zero_copy_only=False)
        return b.append_column(
            "_ck",
            pc.binary_join_element_wise(
                pc.cast(b["user_id"], pa.string()),
                pc.cast(pa.array(ts // chunk_us, pa.int64()), pa.string()),
                "|",
            ),
        )

    def _mixed_empty() -> pa.Table:
        return pa.table(
            {
                "purchase_id": pa.array([], pa.int64()),
                "purchase_us": pa.array([], pa.int64()),
                "click_id": pa.array([], pa.int64()),
                "click_us": pa.array([], pa.int64()),
                "_u": pa.array([], pa.int64()),
                "_c": pa.array([], pa.int64()),
                "_kind": pa.array([], pa.int8()),
            }
        )

    def chunk_kernel(b: pa.Table) -> pa.Table:
        # emits _kind 2 = resolved match, 1 = unmatched left, 0 = per-chunk
        # last-right summary
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return _mixed_empty()
        s = _sorted_block(b, ["event_type"])
        uid, ts, eid, et = s["user_id"], s["ts"], s["event_id"], s["event_type"]
        n = len(uid)
        idx = np.arange(n)
        chunk = ts // chunk_us
        seg_start_mask = np.concatenate(
            ([True], (uid[1:] != uid[:-1]) | (chunk[1:] != chunk[:-1]))
        )
        seg_start = np.maximum.accumulate(np.where(seg_start_mask, idx, 0))
        is_right = et == right_type
        last_right = np.maximum.accumulate(np.where(is_right, idx, -1))
        lefts = np.nonzero(et == left_type)[0]
        j = last_right[lefts]
        ok = j >= seg_start[lefts]
        m, um = lefts[ok], lefts[~ok]
        jm = j[ok]
        # per-(user, chunk) last right: segments are contiguous; the carry at
        # the segment's LAST position is the segment's last right (if in-seg)
        seg_starts = np.nonzero(seg_start_mask)[0]
        seg_stops = np.append(seg_starts[1:], n)
        lr = last_right[seg_stops - 1]
        has = lr >= seg_starts
        sm = seg_starts[has]
        lrm = lr[has]
        zeros = np.zeros
        parts = [
            pa.table(
                {
                    "purchase_id": pa.array(eid[m], pa.int64()),
                    "purchase_us": pa.array(ts[m], pa.int64()),
                    "click_id": pa.array(eid[jm], pa.int64()),
                    "click_us": pa.array(ts[jm], pa.int64()),
                    "_u": pa.array(uid[m], pa.int64()),
                    "_c": pa.array(chunk[m], pa.int64()),
                    "_kind": pa.array(np.full(len(m), 2, np.int8)),
                }
            ),
            pa.table(
                {
                    "purchase_id": pa.array(eid[um], pa.int64()),
                    "purchase_us": pa.array(ts[um], pa.int64()),
                    "click_id": pa.array(zeros(len(um), np.int64)),
                    "click_us": pa.array(zeros(len(um), np.int64)),
                    "_u": pa.array(uid[um], pa.int64()),
                    "_c": pa.array(chunk[um], pa.int64()),
                    "_kind": pa.array(np.full(len(um), 1, np.int8)),
                }
            ),
            pa.table(
                {
                    "purchase_id": pa.array(zeros(len(sm), np.int64)),
                    "purchase_us": pa.array(zeros(len(sm), np.int64)),
                    "click_id": pa.array(eid[lrm], pa.int64()),
                    "click_us": pa.array(ts[lrm], pa.int64()),
                    "_u": pa.array(uid[sm], pa.int64()),
                    "_c": pa.array(chunk[sm], pa.int64()),
                    "_kind": pa.array(zeros(len(sm), np.int8)),
                }
            ),
        ]
        return pa.concat_tables(parts)

    def stitch_kernel(b: pa.Table) -> pa.Table:
        # input: _kind 0 summaries + _kind 1 unmatched lefts, partitioned by
        # user. Within a chunk, lefts sort BEFORE that chunk's summary (an
        # unmatched left may only see EARLIER chunks' rights).
        if b.num_rows == 0 or "_u" not in b.column_names:
            return pa.table(
                {
                    "purchase_id": pa.array([], pa.int64()),
                    "purchase_us": pa.array([], pa.int64()),
                    "click_id": pa.array([], pa.int64()),
                    "click_us": pa.array([], pa.int64()),
                }
            )
        u = b["_u"].to_numpy(zero_copy_only=False)
        c = b["_c"].to_numpy(zero_copy_only=False)
        kind = b["_kind"].to_numpy(zero_copy_only=False)
        pid = b["purchase_id"].to_numpy(zero_copy_only=False)
        pus = b["purchase_us"].to_numpy(zero_copy_only=False)
        cid = b["click_id"].to_numpy(zero_copy_only=False)
        cus = b["click_us"].to_numpy(zero_copy_only=False)
        # kind 1 (left) before kind 0 (summary) at equal chunk → invert kind
        order = np.lexsort((-kind, c, u))
        u, c, kind, pid, pus, cid, cus = (
            u[order], c[order], kind[order], pid[order], pus[order],
            cid[order], cus[order])
        n = len(u)
        idx = np.arange(n)
        last_sum = np.maximum.accumulate(np.where(kind == 0, idx, -1))
        user_start = np.maximum.accumulate(
            np.where(np.concatenate(([True], u[1:] != u[:-1])), idx, 0)
        )
        pts = np.nonzero(kind == 1)[0]
        j = last_sum[pts]
        ok = j >= user_start[pts]
        out_cid = np.where(ok, cid[np.maximum(j, 0)], 0)
        out_cus = np.where(ok, cus[np.maximum(j, 0)], 0)
        return pa.table(
            {
                "purchase_id": pa.array(pid[pts], pa.int64()),
                "purchase_us": pa.array(pus[pts], pa.int64()),
                "click_id": pa.array(
                    np.ma.masked_array(out_cid, mask=~ok), pa.int64()),
                "click_us": pa.array(
                    np.ma.masked_array(out_cus, mask=~ok), pa.int64()),
            }
        )

    cols = ["event_id", "ts", "user_id", "event_type"]
    mixed = hash_partition_by(
        ds.select_columns(cols).map_batches(add_chunk_key, batch_format="pyarrow"),
        "_ck",
    ).map_batches(chunk_kernel, batch_size=None, batch_format="pyarrow").materialize()

    matched = mixed.map_batches(
        lambda b: (
            b.filter(pc.equal(b["_kind"], 2)).select(
                ["purchase_id", "purchase_us", "click_id", "click_us"])
            if b.num_rows and "_kind" in b.column_names
            else _mixed_empty().select(
                ["purchase_id", "purchase_us", "click_id", "click_us"])
        ),
        batch_format="pyarrow",
    )
    rest = mixed.map_batches(
        lambda b: (
            b.filter(pc.not_equal(b["_kind"], 2))
            if b.num_rows and "_kind" in b.column_names else _mixed_empty()
        ),
        batch_format="pyarrow",
    )
    stitched = hash_partition_by(rest, "_u").map_batches(
        stitch_kernel, batch_size=None, batch_format="pyarrow"
    )
    return matched.union(stitched)
