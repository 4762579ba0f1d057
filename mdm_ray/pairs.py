"""Within-block candidate-pair generation with shuffle-free dedup.

The Ray-native replacement for the reference's CROSS JOIN + UNION DISTINCT
(``batch_mdm_gcp/bigquery_utils.py:330-332`` pair-space halving via
``record_id <``; ``:563-576`` pair dedup across strategies):

* one hash ``repartition(keys=[block_key])`` co-locates every blocking group
  whole inside one block (and scatters hot groups across partitions — see
  ``_partition_by_key``), then a *block-level* generator kernel locally sorts
  and emits pairs for all groups in the block in one vectorized pass — no
  per-group UDF dispatch;
* pairs are canonicalized ``(min(doc_id), max(doc_id))``;
* **dedup without a second shuffle**: every row carries its full key-set as
  sorted 64-bit fingerprints (``key_hashes``, see ``blocking.key_hash``); a
  pair is emitted only inside the key whose fingerprint is the *minimum*
  fingerprint the two docs share, so a pair discovered under several keys
  materializes exactly once. The shared-minimum test is fully vectorized:
  per pair-chunk, one padded ``[P, m]`` membership sweep per key slot —
  no Python loop over pairs;
* salted groups ``<key>#i_j`` (see ``blocking.salt_batch``) pair chunk-i rows
  with chunk-j rows only (all pairs when i==j), reproducing the unsalted pair
  multiset exactly.

The kernel yields output in ~``max_pairs_per_chunk`` slices so the streaming
executor can pipeline scoring without materializing a block's full pair set.
"""

from __future__ import annotations

import re
from typing import Iterator

import numpy as np
import pyarrow as pa

from .blocking import KEY_HASH_PAD, key_hash

MAX_PAIRS_PER_CHUNK = 32_768  # small chunks → even distribution to scorer actors


def _padded_key_matrix(batch: pa.Table) -> np.ndarray:
    """[n, m] uint64 matrix of each row's sorted key fingerprints, padded."""
    kh = batch["key_hashes"].combine_chunks()
    flat = kh.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
    offsets = kh.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.diff(offsets)
    n = batch.num_rows
    m = int(lens.max()) if n else 1
    K = np.full((n, m), KEY_HASH_PAD, dtype=np.uint64)
    if len(flat):
        rows = np.repeat(np.arange(n), lens)
        cols = np.arange(len(flat)) - np.repeat(offsets[:-1], lens)
        K[rows, cols] = flat
    return K


def _min_shared_hash(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Per pair, the minimum fingerprint present in both rows (PAD if none).

    A, B: [P, m] uint64 padded, rows sorted ascending — so scanning A's
    columns left to right, the FIRST value also present in B is the minimum
    shared one, and resolved pairs drop out of later sweeps (early exit).
    O(P·m) expected when most pairs share an early key; O(P·m²) worst case,
    O(P·m) memory."""
    P, m = A.shape
    out = np.full(P, KEY_HASH_PAD, dtype=np.uint64)
    unresolved = np.arange(P, dtype=np.int64)
    for c in range(m):
        val = A[unresolved, c]
        live = val != KEY_HASH_PAD
        if not live.any():
            break
        rows = unresolved[live]
        vals = val[live]
        hit = (B[rows] == vals[:, None]).any(axis=1)
        out[rows[hit]] = vals[hit]
        keep = live.copy()               # padded-out rows never resolve
        keep[np.nonzero(live)[0][hit]] = False  # resolved rows drop out
        unresolved = unresolved[keep]
        if not len(unresolved):
            break
    return out


# The ONLY key shape treated as a chunk-pair salt: '#<digits>_<digits>' at
# end-of-string. Must stay strictly narrower than what
# blocking.escape_salt_namespace escapes — int()-based parsing accepted
# '#+1_2' / '# 1_2' / '#-1_2', which the escape (correctly) leaves alone.
_SALT_RE = re.compile(r"^(.*)#(\d+)_(\d+)$", re.DOTALL)


def _parse_salt(key: str) -> tuple[str, int, int]:
    m = _SALT_RE.match(key)
    if m is None:
        return key, 0, 0
    return m.group(1), int(m.group(2)), int(m.group(3))


def _emit_group(
    chunks: np.ndarray | None,
    key: str,
    start: int,
    stop: int,
) -> tuple[np.ndarray, np.ndarray, str]:
    """Index pairs (ii, jj) for one blocking group plus its unsalted base key."""
    n = stop - start
    base, i_chunk, j_chunk = _parse_salt(key)
    if i_chunk == j_chunk:
        ii, jj = np.triu_indices(n, k=1)
        ii = ii + start
        jj = jj + start
    else:
        c = chunks[start:stop]
        left = np.nonzero(c == i_chunk)[0] + start
        right = np.nonzero(c == j_chunk)[0] + start
        ii = np.repeat(left, len(right))
        jj = np.tile(right, len(left))
    return ii.astype(np.int64), jj.astype(np.int64), base


# bookkeeping columns never carried into pair payloads
_META_COLS = frozenset({"block_key", "key_hashes", "chunk", "_part"})


def _emit_group_sides(
    chunks: np.ndarray | None, key: str, start: int, stop: int,
) -> tuple[np.ndarray, np.ndarray, bool]:
    """Row-index SIDES for one (possibly salted) group: (left, right, within).
    ``within=True`` means pair left×right upper-triangularly (same chunk);
    otherwise full cross product. Used by kernels that compare the two sides
    wholesale (e.g. one matmul) instead of materializing index pairs."""
    _, i_chunk, j_chunk = _parse_salt(key)
    idx = np.arange(start, stop, dtype=np.int64)
    if i_chunk == j_chunk:
        return idx, idx, True
    c = chunks[start:stop]
    return idx[c == i_chunk], idx[c == j_chunk], False


_TRIU_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}
# bound the cache by total cached ELEMENTS, not entry count — entries are
# O(n²) index arrays that live for the worker's lifetime, so a count cap
# alone could pin GBs (4096 × ~32 MB at max_bucket=2000)
_TRIU_CACHE_MAX_ELEMS = 8_000_000  # ≈128 MB (2 arrays × 8 B × elems)
_triu_cache_elems = 0


def _triu(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Cached upper-triangular index pairs — group sizes repeat heavily, so
    the per-group ``np.triu_indices`` call (the former per-group hot spot)
    amortizes to a dict lookup. Small sizes repeat the most, so only they
    are worth pinning: entries stop being added once the element budget is
    spent (no eviction needed — the kernel still works, just uncached)."""
    global _triu_cache_elems
    got = _TRIU_CACHE.get(n)
    if got is None:
        ii, jj = np.triu_indices(n, k=1)
        got = (ii.astype(np.int64), jj.astype(np.int64))
        if _triu_cache_elems + len(ii) <= _TRIU_CACHE_MAX_ELEMS:
            _TRIU_CACHE[n] = got
            _triu_cache_elems += len(ii)
    return got


def emit_pair_indices_block(
    batch: pa.Table, id_col: str = "doc_id", dedup_keys: bool = True
) -> tuple[pa.Table, "Iterator[tuple[np.ndarray, np.ndarray]]"]:
    """Core of pair emission: returns ``(sorted_batch, generator)`` where the
    generator yields canonical ``(a, b)`` row-index arrays into
    ``sorted_batch`` in ~``MAX_PAIRS_PER_CHUNK`` slices (``doc_id[a] <
    doc_id[b]`` per pair, globally deduped via the min-shared-fingerprint
    rule). Callers gather whatever payload they need from the indices —
    ``emit_pairs_block`` materializes full 1_/2_ tables; the fused scoring
    path computes the cheap legs straight from per-block encodings and only
    gathers strings for bound survivors.

    ``dedup_keys=False`` skips the min-shared-fingerprint sweep (no
    ``key_hashes`` column needed): every within-group pair is emitted, and
    the CALLER must suppress cross-bucket duplicates — used by sketch-keyed
    ops (MinHash/SimHash LSH) whose scorers re-derive each side's full key
    set from the carried sketch and keep a pair only in its first agreeing
    band, so the ×bands key-hash lists never ride the exchange."""
    n = batch.num_rows
    if n == 0:
        return batch, iter(())
    if batch["block_key"].num_chunks > 1:  # multi-chunk blocks slow every take/scan
        batch = batch.combine_chunks()
    keys = np.asarray(batch["block_key"].to_pylist(), dtype=object)
    if n > 1 and np.any(keys[1:] < keys[:-1]):  # local sort for hash-partitioned input
        order = np.argsort(keys, kind="stable")
        batch = batch.take(pa.array(order, pa.int64()))
        keys = keys[order]

    def gen() -> Iterator[tuple[np.ndarray, np.ndarray]]:
        # rank-encode doc ids once per block: the canonical-order swap then
        # compares int64 ranks, not 2×pairs Python string objects
        doc_ids = np.asarray(batch[id_col].to_pylist(), dtype=object)
        _, doc_rank = np.unique(doc_ids, return_inverse=True)
        K = _padded_key_matrix(batch) if dedup_keys else None
        chunks = (
            batch["chunk"].to_numpy(zero_copy_only=False)
            if "chunk" in batch.column_names
            else None
        )
        # group boundaries within the sorted block
        change = np.nonzero(keys[1:] != keys[:-1])[0] + 1
        starts = np.concatenate(([0], change))
        stops = np.concatenate((change, [n]))

        pend_ii: list[np.ndarray] = []
        pend_jj: list[np.ndarray] = []
        pending = 0

        def flush() -> tuple[np.ndarray, np.ndarray]:
            ii = np.concatenate(pend_ii)
            jj = np.concatenate(pend_jj)
            pend_ii.clear()
            pend_jj.clear()
            swap = doc_rank[ii] > doc_rank[jj]
            a = np.where(swap, jj, ii)
            b = np.where(swap, ii, jj)
            return a, b

        # phase 1: raw pair indices + per-group base hash, O(1) Python per group
        raw_ii: list[np.ndarray] = []
        raw_jj: list[np.ndarray] = []
        base_hashes: list[int] = []
        counts: list[int] = []
        for s, e in zip(starts, stops):
            if e - s < 2:
                continue
            key = str(keys[s])
            if "#" not in key:  # unsalted group (the common case): cached triu
                ti, tj = _triu(e - s)
                ii, jj = ti + s, tj + s
                base = key
            else:
                ii, jj, base = _emit_group(chunks, key, s, e)
            if len(ii) == 0:
                continue
            raw_ii.append(ii)
            raw_jj.append(jj)
            base_hashes.append(key_hash(base))
            counts.append(len(ii))
        if not raw_ii:
            return
        II = np.concatenate(raw_ii)
        JJ = np.concatenate(raw_jj)
        BH = np.repeat(np.array(base_hashes, dtype=np.uint64),
                       np.array(counts, dtype=np.int64))

        # phase 2: ONE chunked canonical-key dedup sweep over all raw pairs:
        # keep a pair only where its group's key is the minimum fingerprint the
        # two docs share, so a pair discovered under several keys materializes
        # exactly once (no shuffle needed). Sweep chunk == flush chunk so the
        # yielded pair slices stay ~MAX_PAIRS_PER_CHUNK — downstream scoring
        # batches must fit in cache (bigger chunks thrash the DP temporaries
        # under full-width parallelism).
        step = MAX_PAIRS_PER_CHUNK
        for lo in range(0, len(II), step):
            ci = II[lo: lo + step]
            cj = JJ[lo: lo + step]
            if dedup_keys:
                keep = _min_shared_hash(K[ci], K[cj]) == BH[lo: lo + step]
                if not keep.any():
                    continue
                ci = ci[keep]
                cj = cj[keep]
            pend_ii.append(ci)
            pend_jj.append(cj)
            pending += len(ci)
            if pending >= MAX_PAIRS_PER_CHUNK:
                pending = 0
                yield flush()
        if pending:
            yield flush()

    return batch, gen()


def gather_pair_table(batch: pa.Table, a: np.ndarray, b: np.ndarray,
                      fields: list[str]) -> pa.Table:
    """(sorted_batch, index arrays) → wide ``1_*``/``2_*`` pair table."""
    left = batch.select(fields).take(pa.array(a, pa.int64()))
    right = batch.select(fields).take(pa.array(b, pa.int64()))
    cols = {}
    for f in fields:
        cols["1_" + f] = left[f]
        cols["2_" + f] = right[f]
    return pa.table(cols)


def emit_pairs_block(batch: pa.Table, id_col: str = "doc_id") -> Iterator[pa.Table]:
    """map_batches generator kernel over a block holding complete key groups
    (hash-partitioned or globally sorted — locally sorts by key either way).
    Payload = every non-bookkeeping column (the ER path projects to
    SCORING_FIELDS upstream; other callers pass their own payloads)."""
    fields = [f for f in batch.column_names if f not in _META_COLS]
    sorted_batch, gen = emit_pair_indices_block(batch, id_col)
    emitted_any = False
    for a, b in gen:
        emitted_any = True
        yield gather_pair_table(sorted_batch, a, b, fields)
    if not emitted_any:
        yield _empty_pairs(batch, fields)


def _empty_pairs(batch: pa.Table, fields: list[str]) -> pa.Table:
    cols = {}
    empty = batch.select(fields).slice(0, 0)
    for f in fields:
        cols["1_" + f] = empty[f]
        cols["2_" + f] = empty[f]
    return pa.table(cols)


def plan_partitions(census: dict[str, int], cap: int, n: int) -> dict[str, int]:
    """Driver-side LPT placement of heavy blocking groups across the ``n``
    exchange partitions.

    Pair-emission work is Σ over groups of ~size²/2 — heavily skewed even
    after salting (salted chunk-pair groups still hold ~2×cap rows → ~cap²
    pairs each). Random (crc32) key→partition assignment left the hottest
    partition ~4× the mean, bounding the whole scoring stage on one
    straggler task. The census already knows every key over ``floor`` rows
    exactly, so: expand hot keys into their salted ``k#i_j`` chunk-pair keys
    with estimated pair weights, weight mid-size keys at C(c,2), sort
    descending, and greedily assign each to the currently-lightest partition
    (classic LPT, ≤ 4/3 OPT). Light keys (below the census floor — bounded
    weight, high count) stay on crc32 % n, which balances them by the law of
    large numbers. The assignment dict is small (heavy keys only) and ships
    once via ``ray.put``."""
    import heapq

    items: list[tuple[float, str]] = []
    for k, c in census.items():
        if c > cap:
            m = -(-c // cap)
            s = c / m
            for i in range(m):
                for j in range(i, m):
                    w = s * (s - 1) / 2 if i == j else s * s
                    items.append((w, f"{k}#{i}_{j}"))
        else:
            items.append((c * (c - 1) / 2, k))
    items.sort(reverse=True)
    heap: list[tuple[float, int]] = [(0.0, p) for p in range(n)]
    heapq.heapify(heap)
    assign: dict[str, int] = {}
    for w, k in items:
        load, p = heapq.heappop(heap)
        assign[k] = p
        heapq.heappush(heap, (load + w, p))
    return assign


def _partition_by_key(blocked_ds, assign: dict[str, int] | None = None,
                      n: int | None = None):
    """Hash-partition so every key group lands whole in one block.

    Implemented as sort on a derived ``_part = crc32(block_key) mod n`` int
    column: Ray's sort co-locates equal values in one block (the same
    guarantee pair emission needs), while the hash scatters hot key groups
    pseudo-randomly across partitions — with a plain range partition on the
    key itself, contiguous hot-key regions put ~a quarter of all candidate
    pairs into one straggler partition. Sorting a small-cardinality int is
    also cheaper than sorting the key strings. Each kernel locally re-sorts
    its block by the actual key.

    ``assign``: optional heavy-key → partition overrides from
    ``plan_partitions`` (work-balanced LPT placement).

    ``n``: partition count, default ``exchange_fanout(None)`` = 8× the CPU
    count — the straggler bound for large inputs: scoring cost per pair is
    non-uniform (pairs that survive the cheap bound run the O(L²) DP
    kernel, and true-duplicate-dense keys have far higher survivor rates),
    so the LPT plan's size²-based weights misestimate real cost by 2–3× on
    some partitions. Finer granularity bounds the absolute straggler
    instead: at 4× (one task ≈ 1.6 s mean) the worst scoring task measured
    14–30 s; at 8× it is 7–12 s, and the stage tail no longer dominates the
    4→16-cpu scaling ratio. Per-task scheduling overhead is ~ms at that
    size — but NOT at small inputs, where a fixed 8×-CPU sort exchange is
    pure overhead (256-way sorts on 40k-row catalog tables regressed
    cluster_cc 3× in round 3), so callers that know the exploded row count
    pass ``n = exchange_fanout(rows)``."""
    import ray
    import zlib

    from .dsutil import exchange_fanout

    if n is None:
        n = exchange_fanout(None)
    assign_ref = ray.put(assign) if assign else None

    def add_part(b: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        planned = ray.get(assign_ref) if assign_ref is not None else None
        # keys repeat per blocking group: resolve the plan/crc32 per UNIQUE
        # key (Python over the dictionary only), then gather per row in C
        col = b["block_key"]
        enc = pc.dictionary_encode(
            col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        )
        uniq = enc.dictionary.to_pylist()
        lookup = planned.get if planned else (lambda _k: None)

        def part_of(k: str) -> int:
            p = lookup(k)
            if p is None:
                return zlib.crc32(k.encode("utf-8", "surrogatepass")) % n
            return p

        codes = np.fromiter(
            (part_of(k) for k in uniq), dtype=np.int32, count=len(uniq)
        )
        if len(codes) == 0:
            parts = np.zeros(b.num_rows, np.int32)
        else:
            iv = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            parts = codes[iv]
        return b.append_column("_part", pa.array(parts, pa.int32()))

    # pre-split (cheap, no shuffle): the sort emits one output partition per
    # input block, so the input must already have ~n blocks for n-way fan-out
    return (
        blocked_ds.map_batches(add_part, batch_format="pyarrow")
        .repartition(n, shuffle=False)
        .sort("_part")
    )


def _plan_from_census(census, cfg, n: int):
    """LPT plan for the hot keys; ``n`` must equal the _partition_by_key
    fan-out so planned partition ids are valid."""
    if not census:
        return None
    return plan_partitions(census, cfg.max_block_size, n)


def build_pairs(blocked_ds, id_col: str = "doc_id", census: dict[str, int] | None = None,
                cfg=None, rows: int | None = None):
    """blocked Dataset -> globally-deduped candidate-pair Dataset (both sides'
    scoring fields inline; no further shuffle needed before scoring).

    ``rows``: exploded blocked row count when the caller knows it (e.g. from
    ``blocking.hot_key_census``) — sizes the exchange fan-out."""
    import functools

    from .config import DEFAULT_CONFIG
    from .dsutil import exchange_fanout

    n = exchange_fanout(rows)
    assign = _plan_from_census(census, cfg or DEFAULT_CONFIG, n)
    return _partition_by_key(blocked_ds, assign, n=n).map_batches(
        functools.partial(emit_pairs_block, id_col=id_col),
        batch_size=None, batch_format="pyarrow",
    )


def build_scored(blocked_ds, cfg=None, retain_filter: bool = True,
                 census: dict[str, int] | None = None,
                 rows: int | None = None):
    """blocked Dataset → scored-pair Dataset in TWO streaming stages:

    1. Per exchange partition, a fused generator emits candidate pairs in
       ~``MAX_PAIRS_PER_CHUNK`` slices and immediately runs the CHEAP legs +
       retain-bound prefilter (``scoring.score_cheap_batch``) — the wide
       full-payload pair table never exists; only the surviving ~40%
       narrow intermediate (ids + strings + cheap scores) enters the object
       store, streamed with backpressure.
    2. A separate ``map_batches`` runs the string kernels at a small uniform
       ``batch_size``. This is the load-balance fix: blocks that are real
       duplicate clusters cost ~10× more string-kernel time per pair (high
       bound-survivor rate), so fusing stage 2 into stage 1 stragglered the
       whole pipeline on a few partitions no matter how pairs were placed.
       Re-batching lets Ray spread exactly the expensive work evenly."""
    import functools

    from .config import DEFAULT_CONFIG
    from .scoring import (
        CheapEncodings,
        empty_cheap_table,
        score_cheap_indexed,
        score_strings_batch,
    )

    from .dsutil import exchange_fanout

    cfg = cfg or DEFAULT_CONFIG
    n = exchange_fanout(rows)

    def emit_and_cheap(batch: pa.Table) -> Iterator[pa.Table]:
        sorted_batch, gen = emit_pair_indices_block(batch)
        enc = None
        emitted = False
        for a, b in gen:
            if enc is None:  # built once per partition block
                enc = CheapEncodings(sorted_batch, cfg)
            emitted = True
            yield score_cheap_indexed(
                sorted_batch, a, b, enc, cfg, prefilter=retain_filter
            )
        if not emitted:
            yield empty_cheap_table(cfg)

    inter = _partition_by_key(
        blocked_ds, _plan_from_census(census, cfg, n), n=n
    ).map_batches(emit_and_cheap, batch_size=None, batch_format="pyarrow")
    return inter.map_batches(
        functools.partial(score_strings_batch, cfg=cfg, retain_filter=retain_filter),
        batch_size=cfg.score_batch_size,
        batch_format="pyarrow",
    )
