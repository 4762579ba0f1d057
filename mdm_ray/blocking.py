"""Blocking-key generation + skew salting.

Replaces the reference's unblocked O(N²) CROSS JOIN candidate generation
(``batch_mdm_gcp/bigquery_utils.py:330-332, 390-392, 419-424, 472-474``) with
key-based blocking — the architectural change that makes 10^12-doc scale
possible:

* ``e:`` exact email_clean (J1 semantics, bigquery_utils.py:312-316)
* ``p:`` exact phone_clean (J1, :318-322)
* ``n:`` phonetic name key — Soundex + Metaphone of full_name_clean
  (upgrade over the reference's post-hoc SOUNDEX scoring, :361-366)
* ``l:`` MinHash-LSH band keys over name+address+city shingles (north-star)
* ``m:`` exact media_ref (interleaved-payload extension: shared attachments)

Skew handling (explicit, per the north rule): a first cheap pass counts block
sizes; keys whose block exceeds ``cfg.max_block_size`` are split into
``m = ceil(size/cap)`` deterministic hash-chunks, and each member row is
re-emitted once per chunk-pair ``(i, j), i<=j`` it participates in, under the
salted key ``<key>#i_j`` with its own chunk id carried in the ``chunk`` /
``chunk_pair`` columns. Pair generation then pairs only (chunk_a != chunk_b)
rows for i<j groups and all rows for i==j groups, so every original
within-block pair is produced exactly once across salted groups — verified by
pair-multiset equality tests vs unsalted blocking.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import zlib

from .config import EngineConfig, DEFAULT_CONFIG
from .minhash import MinHasher
from .phonetic import metaphone, soundex

# 64-bit key fingerprints: the pair-dedup total order. crc32 ‖ adler32 of the
# key string — both C-speed; collision ≈ 2^-64 per key pair. Two failure
# modes, both negligible at that probability: colliding keys the pair SHARES
# emit a duplicate pair; a collision between a non-shared key on one side and
# a different key on the other can fake a "shared" minimum in
# _min_shared_hash and DROP a unique pair.
KEY_HASH_PAD = np.uint64(0xFFFFFFFFFFFFFFFF)


def key_hash(k: str) -> int:
    d = k.encode("utf-8")
    h = (zlib.adler32(d) << 32) | zlib.crc32(d)
    return h - 1 if h == int(KEY_HASH_PAD) else h


import re

# the salt namespace: pairs.py treats a block key ending in '#<digits>_<digits>'
# (this exact regex — pairs._SALT_RE is the same object) as a chunk-pair
# salted group, so caller-provided keys must never land in it.
# escape_salt_namespace() appends '#esc' to any key whose suffix could be
# (mis)read as a salt AFTER stripping previous escapes — matching the
# '(#esc)*' tail makes the map injective: a literal 'a#1_2#esc' escapes to
# 'a#1_2#esc#esc', so it can never collide with the escaped form of 'a#1_2'.
# Grouping semantics are unchanged: both sides of a match get the same
# escaped key.
_SALT_SUFFIX_RE = re.compile(r"#\d+_\d+(#esc)*$")


def escape_salt_namespace(k: str) -> str:
    return k + "#esc" if _SALT_SUFFIX_RE.search(k) else k


# columns carried through the blocking shuffle into pair scoring
SCORING_FIELDS = [
    "doc_id",
    "source_system",
    "full_name_clean",
    "email_clean",
    "phone_clean",
    "address_clean",
    "city_clean",
    "state_clean",
    "company",
    "dob_days",
    "name_soundex",
    "annual_income",
    "customer_id",   # only present when use_customer_id_exact inputs carry it
    "embedding",
]


def prep_scoring_columns(batch: pa.Table) -> pa.Table:
    """Add per-doc derived columns used by blocking + scoring (once per doc,
    never per pair): soundex/metaphone of the clean name, DOB in epoch days."""
    names = batch["full_name_clean"].to_pylist()
    batch = batch.append_column("name_soundex", pa.array([soundex(x) for x in names], pa.string()))
    batch = batch.append_column("name_metaphone", pa.array([metaphone(x) for x in names], pa.string()))
    dob = batch["date_of_birth"].to_pylist() if "date_of_birth" in batch.column_names else [None] * batch.num_rows
    days = np.full(len(dob), None, dtype=object)
    for i, d in enumerate(dob):
        if d:
            try:
                days[i] = int(np.datetime64(d, "D").astype(np.int64))
            except ValueError:
                pass
    batch = batch.append_column("dob_days", pa.array(days.tolist(), pa.int32()))
    return batch


class BlockKeyEmitter:
    """map_batches actor: holds the MinHasher state (built once per actor)."""

    def __init__(self, cfg: EngineConfig = DEFAULT_CONFIG):
        self.cfg = cfg
        self.mh = MinHasher(
            num_perm=cfg.lsh_num_perm, shingle_k=cfg.lsh_shingle_k, bands=cfg.lsh_bands
        )

    def keys_for_row(self, row: dict) -> list[str]:
        keys = []
        if row.get("email_clean"):
            keys.append("e:" + row["email_clean"])
        if row.get("phone_clean"):
            keys.append("p:" + row["phone_clean"])
        name = row.get("full_name_clean")
        if name:
            sx = row.get("name_soundex") or soundex(name)
            mp = row.get("name_metaphone") or metaphone(name)
            if self.cfg.use_metaphone_key:
                keys.append(f"n:{sx}|{mp}")
            else:
                keys.append(f"n:{sx}")
            content = " ".join(
                filter(None, [name, row.get("address_clean"), row.get("city_clean")])
            )
            for bk in self.mh.band_keys(self.mh.signature(content)):
                keys.append("l:" + bk)
        if self.cfg.use_media_ref_key:
            for ref in row.get("media_refs") or []:
                keys.append("m:" + ref)
        return keys

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Attach per-doc ``block_keys`` (list<string>) and sorted
        ``key_hashes`` (list<uint64>) columns — computed ONCE per doc in the
        feature stage; the per-key explode is a separate vectorized pass
        (``explode_blocked``)."""
        key_cols = [
            c for c in set(
                SCORING_FIELDS + ["media_refs", "name_metaphone", "address_clean"]
            )
            if c in batch.column_names
        ]
        rows = batch.select(key_cols).to_pylist()
        extra = None
        if getattr(self.cfg, "extra_strategies", ()):
            from .strategies import extra_blocking_keys

            extra = extra_blocking_keys(batch, self.cfg)
        key_lists: list[list[str]] = []
        hash_lists: list[list[int]] = []
        for i, row in enumerate(rows):
            base = self.keys_for_row(row)
            if extra is not None:
                # strategy-supplied keys are untrusted strings: keep them out
                # of the reserved '#i_j' salt namespace (pairs._emit_group
                # would otherwise chunk-filter or TypeError on them)
                base = base + [escape_salt_namespace(k) for k in extra[i]]
            keys = sorted(set(base))
            key_lists.append(keys)
            # ascending-hash order: the dedup total order pairs.py relies on
            hash_lists.append(sorted(key_hash(k) for k in keys))
        batch = batch.append_column(
            "block_keys", pa.array(key_lists, pa.list_(pa.string()))
        )
        return batch.append_column(
            "key_hashes", pa.array(hash_lists, pa.list_(pa.uint64()))
        )


_CENSUS_BUCKETS = 1 << 20  # 8 MiB int64 sketch — constant, independent of key count


def hot_key_counts(keyed_features_ds, cap: int, floor: int | None = None) -> dict[str, int]:
    """Back-compat wrapper around ``hot_key_census`` (hot dict only)."""
    return hot_key_census(keyed_features_ds, cap, floor)[0]


def hot_key_census(keyed_features_ds, cap: int, floor: int | None = None
                   ) -> tuple[dict[str, int], int]:
    """Hot-key census without an all-to-all shuffle (the groupby census cost a
    fixed ~9 s per run regardless of CPU count — it was the pipeline's largest
    serial term). Two map-only passes over the materialized per-doc key
    columns:

    1. **Sketch**: each batch bincounts its key fingerprints into a fixed
       ``M = 2^20``-bucket array and returns the nonzero (bucket, count)
       pairs; the driver merges them into one bounded ``M``-length array.
       A key's bucket sum upper-bounds its true count (collisions only ever
       inflate), so buckets ≤ ``cap`` prove every key they hold is cold —
       no false negatives, ever.
    2. **Exact recount**: only docs holding a key in a candidate (> cap)
       bucket are revisited; their candidate keys are exact-counted and
       merged on the driver. Candidates ≈ true hot keys + a handful of
       collision false positives, so this pass touches a sliver of the data.

    Driver memory is O(M + hot), not O(distinct keys). Both merges run as a
    fan-in TREE of Ray tasks (``_tree_reduce``, fan-in 64): the driver only
    ever merges the final ≤ 64 partials, never one part per block — at
    10⁵–10⁶ blocks the reduce is 2–3 task levels deep instead of a driver
    loop. The candidate mask ships to pass 2 once via ``ray.put``.

    Both passes run as RAW Ray tasks over the input's materialized block
    refs (the input is materialized first if it isn't already): a Dataset
    execution costs ~0.4-0.5 s of executor startup each, which dominated the
    census on small catalog inputs; as tasks the two passes cost ~50 ms/block.

    ``floor`` (default: ``cap``) lowers the exact-recount threshold so the
    census also returns MID-SIZE keys (``floor < count``): pair-partition
    planning (``plan_partitions``) LPT-places those to kill work skew.

    Returns ``(hot, exploded_rows)``: the hot-key dict plus the POST-SALT
    exploded row count — Σ per-doc key-list lengths (the sketch's bucket sum,
    exact: every key occurrence lands in exactly one bucket) plus the salting
    re-emission Σ_{s>cap} s·(⌈s/cap⌉−1) from the hot keys. Free by-product of
    the sketch pass; sizes the pair exchange (``dsutil.exchange_fanout``)."""
    import ray

    from .dsutil import block_refs

    keyed_features_ds = keyed_features_ds.materialize()
    refs = block_refs(keyed_features_ds)
    sketch_task = ray.remote(_census_sketch_block)
    sketch_refs = [sketch_task.remote(r) for r in refs]
    return _census_finish(refs, sketch_refs, cap, floor)


def materialize_with_census(keyed_features_ds, cap: int, floor: int | None = None):
    """Materialize a (lazy) keyed-features Dataset while running the census
    SKETCH pass concurrently with the materialize: blocks are consumed via
    ``iter_internal_ref_bundles`` as the streaming executor produces them,
    and each block's sketch task launches the moment the block lands — the
    census pass overlaps the featurize barrier tail instead of following it.

    Returns ``(features_mat, hot, exploded_rows)`` where ``features_mat`` is
    a zero-copy Dataset over the landed block refs (the same blocks a
    ``materialize()`` would hold)."""
    import ray
    import ray.data

    sketch_task = ray.remote(_census_sketch_block)
    refs: list = []
    sketch_refs: list = []
    for bundle in keyed_features_ds.iter_internal_ref_bundles():
        for ref, _meta in bundle.blocks:
            refs.append(ref)
            sketch_refs.append(sketch_task.remote(ref))
    feats_mat = ray.data.from_arrow_refs(refs)
    hot, rows = _census_finish(refs, sketch_refs, cap, floor)
    return feats_mat, hot, rows


def _census_finish(refs: list, sketch_refs: list, cap: int,
                   floor: int | None) -> tuple[dict[str, int], int]:
    """Shared census tail: tree-merge the sketches, then the exact recount
    over candidate buckets (see ``hot_key_census``)."""
    import ray

    M = _CENSUS_BUCKETS
    if floor is None:
        floor = cap
    nz, cnt = _tree_reduce(sketch_refs, ray.remote(_merge_sketches), _merge_sketches)
    total = np.zeros(M, np.int64)
    total[nz] = cnt
    base_rows = int(total.sum())
    mask = total > floor
    if not mask.any():
        return {}, base_rows
    mask_ref = ray.put(mask)

    exact_task = ray.remote(_census_exact_block)
    keys, cnts = _tree_reduce(
        [exact_task.remote(r, mask_ref) for r in refs],
        ray.remote(_merge_exact), _merge_exact,
    )
    hot = {k: n for k, n in zip(keys, cnts) if n > floor}
    resalt = sum(s * (-(-s // cap) - 1) for s in hot.values() if s > cap)
    return hot, base_rows + resalt


_TREE_REDUCE_FANIN = 64


def _tree_reduce(part_refs: list, merge_task, merge_local,
                 fanin: int = _TREE_REDUCE_FANIN):
    """Fan-in tree reduce over task-output refs: while more than ``fanin``
    parts remain, merge each group of ``fanin`` in a Ray task; the driver
    merges only the final ≤ ``fanin`` partials locally. Bounded driver work
    at any block count (10⁶ blocks ⇒ 3 task levels, never a driver loop)."""
    import ray

    parts = list(part_refs)
    while len(parts) > fanin:
        parts = [
            merge_task.remote(*parts[i:i + fanin])
            for i in range(0, len(parts), fanin)
        ]
    return merge_local(*ray.get(parts))


def _merge_sketches(*parts) -> tuple[np.ndarray, np.ndarray]:
    """Merge (nonzero-buckets, counts) sketch partials into one sparse pair."""
    total = np.zeros(_CENSUS_BUCKETS, np.int64)
    for nz, cnt in parts:
        total[nz] += cnt
    nz = np.flatnonzero(total)
    return nz.astype(np.int64), total[nz]


def _merge_exact(*parts) -> tuple[list, list]:
    """Merge (keys, counts) exact-recount partials into one pair."""
    from collections import Counter

    c: Counter = Counter()
    for keys, cnts in parts:
        for k, n in zip(keys, cnts):
            c[k] += n
    return list(c.keys()), list(c.values())


def _census_sketch_block(block: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Per-block sketch pass: (nonzero buckets, counts) of key fingerprints."""
    M = _CENSUS_BUCKETS
    if block.num_rows == 0 or "key_hashes" not in block.schema.names:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    kh = block["key_hashes"].combine_chunks()
    flat = pc.list_flatten(kh).to_numpy(zero_copy_only=False).astype(np.uint64)
    cnt = np.bincount((flat % M).astype(np.int64), minlength=0)
    nz = np.flatnonzero(cnt)
    return nz.astype(np.int64), cnt[nz].astype(np.int64)


def _census_exact_block(block: pa.Table, mask: np.ndarray) -> tuple[list, list]:
    """Per-block exact recount of keys landing in candidate (> floor) buckets."""
    from collections import Counter

    M = _CENSUS_BUCKETS
    if block.num_rows == 0 or "key_hashes" not in block.schema.names:
        return [], []
    kh = block["key_hashes"].combine_chunks()
    flat = pc.list_flatten(kh).to_numpy(zero_copy_only=False).astype(np.uint64)
    hit = mask[(flat % M).astype(np.int64)]
    c: Counter = Counter()
    if hit.any():
        parent = pc.list_parent_indices(kh).to_numpy(zero_copy_only=False)
        docs = np.unique(parent[hit])
        key_lists = block["block_keys"].take(pa.array(docs)).to_pylist()
        for keys in key_lists:
            for k in keys:
                if mask[key_hash(k) % M]:
                    c[k] += 1
    return list(c.keys()), list(c.values())


def attach_block_keys(features_ds, cfg: EngineConfig = DEFAULT_CONFIG):
    """features → features + (block_keys, key_hashes) per-doc list columns.
    Run once, before any materialize, so the (relatively expensive) MinHash
    signatures are computed a single time and both the hot-key census and the
    per-key explode read the stored lists."""
    return features_ds.map_batches(
        functools.partial(emit_keys_batch, cfg=cfg), batch_format="pyarrow"
    )


def explode_blocked(keyed_features_ds, payload_cols: list[str] | None = None,
                    include_key_hashes: bool = True):
    """One output row per (doc, block_key): vectorized list-flatten explode
    (no Python loop) carrying the payload columns (default: scoring fields)
    + key_hashes.

    ``include_key_hashes=False`` drops the per-doc key-hash list from the
    exploded rows (×num_keys amplification through the exchange) — for
    sketch-keyed ops whose pair dedup re-derives key sets from the sketch."""

    def explode(batch: pa.Table) -> pa.Table:
        cols = [c for c in (payload_cols or SCORING_FIELDS) if c in batch.column_names]
        extra = ["key_hashes"] if include_key_hashes else []
        kl = batch["block_keys"].combine_chunks()
        parent = pc.list_parent_indices(kl)
        taken = batch.select(cols + extra).take(parent)
        return taken.append_column("block_key", pc.list_flatten(kl))

    return keyed_features_ds.map_batches(explode, batch_format="pyarrow")


def salt_batch(batch: pa.Table, hot: dict[str, int], cap: int,
               id_col: str = "doc_id") -> pa.Table:
    """Split rows of oversized blocks into chunk-pair salted groups (see module
    docstring); rows of normal blocks pass through with chunk=0, pair (0,0)."""
    keys = batch["block_key"].to_pylist()
    doc_ids = batch[id_col].to_pylist()
    take_idx: list[int] = []
    new_keys: list[str] = []
    chunks: list[int] = []
    for i, (k, d) in enumerate(zip(keys, doc_ids)):
        size = hot.get(k)
        if not size:
            take_idx.append(i)
            new_keys.append(k)
            chunks.append(0)
            continue
        m = -(-size // cap)
        c = zlib.crc32(str(d).encode()) % m
        for a in range(m):
            lo, hi = min(a, c), max(a, c)
            take_idx.append(i)
            new_keys.append(f"{k}#{lo}_{hi}")
            chunks.append(c)
    out = batch.take(pa.array(take_idx, pa.int64()))
    out = out.drop_columns(["block_key"])
    out = out.append_column("block_key", pa.array(new_keys, pa.string()))
    out = out.append_column("chunk", pa.array(chunks, pa.int32()))
    return out


import functools


@functools.lru_cache(maxsize=4)
def _cached_emitter(num_perm: int, shingle_k: int, bands: int,
                    max_block: int, use_mp: bool, use_media: bool,
                    extra_strategies: tuple = ()) -> BlockKeyEmitter:
    cfg = EngineConfig(
        lsh_num_perm=num_perm, lsh_shingle_k=shingle_k, lsh_bands=bands,
        max_block_size=max_block, use_metaphone_key=use_mp, use_media_ref_key=use_media,
        extra_strategies=extra_strategies,
    )
    return BlockKeyEmitter(cfg)


def emit_keys_batch(batch: pa.Table, cfg: EngineConfig = DEFAULT_CONFIG) -> pa.Table:
    """Stateless-task twin of BlockKeyEmitter: the MinHasher is cached per
    worker process (lru_cache), so plain tasks scale elastically with no
    actor-pool cap while still building the permutation table once."""
    em = _cached_emitter(
        cfg.lsh_num_perm, cfg.lsh_shingle_k, cfg.lsh_bands,
        cfg.max_block_size, cfg.use_metaphone_key, cfg.use_media_ref_key,
        getattr(cfg, "extra_strategies", ()),
    )
    return em(batch)


def build_blocked(features_ds, cfg: EngineConfig = DEFAULT_CONFIG, skip_salting: bool = False,
                  census: dict[str, int] | None = None):
    """features Dataset -> salted (block_key, scoring-fields, chunk) Dataset.

    Fully lazy: the wide exploded table is NEVER materialized. The hot-key
    census runs as a cheap separate pass over the per-doc ``block_keys``
    column (callers materialize features once, so key emission is not
    recomputed), then explode + salt stream straight into pair generation.

    ``census``: optional precomputed ``hot_key_counts`` result (possibly with
    a lower ``floor`` — extra mid-size entries are ignored here but reused by
    ``pairs.plan_partitions`` for work-balanced exchange placement)."""
    sch = features_ds.schema()
    if "block_keys" not in (sch.names if sch is not None else []):
        features_ds = attach_block_keys(features_ds, cfg)
    payload = None
    if getattr(cfg, "extra_strategies", ()):
        from .strategies import extra_pair_columns

        payload = SCORING_FIELDS + extra_pair_columns(cfg)
    blocked = explode_blocked(features_ds, payload_cols=payload)
    if skip_salting:
        return blocked.map_batches(
            lambda b: b.append_column("chunk", pa.array([0] * b.num_rows, pa.int32())),
            batch_format="pyarrow",
        )
    if census is None:
        census = hot_key_counts(features_ds, cfg.max_block_size)
    hot = {k: c for k, c in census.items() if c > cfg.max_block_size}
    if not hot:
        return blocked.map_batches(
            lambda b: b.append_column("chunk", pa.array([0] * b.num_rows, pa.int32())),
            batch_format="pyarrow",
        )
    import ray

    hot_ref = ray.put(hot)
    cap = cfg.max_block_size

    def apply_salt(batch: pa.Table) -> pa.Table:
        return salt_batch(batch, ray.get(hot_ref), cap)

    return blocked.map_batches(apply_salt, batch_format="pyarrow")
