"""Document deduplication operators (training-data pipeline extensions).

The reference's only dedup is entity resolution itself (SURVEY.md §2.8 D5);
a 100 TB training-data pipeline needs the standard document-dedup family,
each built on the SAME salted-pair machinery as the ER blocker
(blocking.py / pairs.py) — hot buckets are split into chunk-pair groups, so
no bucket is ever silently dropped and no group is unboundedly quadratic:

* exact dedup        — canonicalized-text groups, survivor = min id
* MinHash-LSH        — signature → band buckets; each exploded row carries
                       ONLY (id, signature, bucket key) — never document
                       text, never key-hash lists; text is hash-joined back
                       for the (small) candidate set that survives the
                       signature-estimate prefilter
* SimHash            — 64-bit fingerprint band buckets; Hamming verification
                       runs on the fingerprints themselves — text never
                       enters the shuffle at all
* n-gram Jaccard     — within explicit blocks (text rides the shuffle once —
                       one key per doc — and ×m only for salted hot blocks)
* embedding cosine   — salted blocked matmul kernel; emits only survivors

Pair-producing ops emit canonical ``(id1 < id2)`` pairs, scored FUSED inside
the emission kernel (``salted_bucket_scored``). Cross-bucket dedup: explicit-
block ops use the ER blocker's min-common-key-fingerprint rule (pairs.py);
sketch-keyed ops (MinHash/SimHash) re-derive band agreement from the carried
sketch and keep each pair only under its first agreeing band, so the ×bands
key-hash lists never ride the exchange.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dsutil import grouped_kernel
from .minhash import MinHasher
from .simfuncs import ngram_jaccard_batch
from .simhash import band_keys as simhash_band_keys
from .simhash import simhash_batch


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                canonicalize: bool = False):
    """Keep one survivor (min id) per identical text; returns survivors with
    group size. Hash groupby on the text key — scales as a shuffle of
    (key, id) only when ``project=True`` columns are pre-selected."""
    from .dsutil import hash_partition_by

    # grab types from the SOURCE schema (cheap for parquet; canonicalize
    # doesn't change them) so the empty-block guard emits a typed table
    src_schema = ds.schema()
    types = dict(zip(src_schema.names, src_schema.types))
    id_type, text_type = types[id_col], types[text_col]

    work = ds.select_columns([id_col, text_col])
    if canonicalize:
        def canon(b: pa.Table) -> pa.Table:
            t = pc.utf8_lower(pc.utf8_trim_whitespace(b[text_col]))
            return b.set_column(b.column_names.index(text_col), text_col, t)
        work = work.map_batches(canon, batch_format="pyarrow")
    empty = pa.table(
        {
            id_col: pa.array([], id_type),
            text_col: pa.array([], text_type),
            "group_size": pa.array([], pa.int64()),
        }
    )

    def agg(batch: pa.Table) -> pa.Table:
        # per-block Acero group_by (C++ hash agg) — the exchange already
        # co-located equal texts, so a block-local groupby is exact
        if batch.num_rows == 0 or text_col not in batch.column_names:
            return empty
        g = batch.select([id_col, text_col]).group_by(text_col).aggregate(
            [(id_col, "min"), (id_col, "count")]
        )
        return pa.table(
            {
                id_col: g[f"{id_col}_min"],
                text_col: g[text_col],
                "group_size": g[f"{id_col}_count"].cast(pa.int64()),
            }
        )

    # int-hash exchange on the text key (cheaper than a full value sort of
    # the text strings) + vectorized per-block aggregation
    return hash_partition_by(work, text_col).map_batches(
        agg, batch_size=None, batch_format="pyarrow"
    )


def _attach_bucket_keys(batch: pa.Table, *, id_col: str, keys_fn,
                        payload: dict | None = None) -> pa.Table:
    """Per-row bucket-key lists + sorted key fingerprints (the ER blocker's
    per-doc layout, reused so hot_key_counts / explode / salt all apply)."""
    from .blocking import escape_salt_namespace, key_hash

    # keep caller-built bucket keys out of the reserved '#i_j' salt namespace
    key_lists = [
        sorted({escape_salt_namespace(k) for k in ks}) for ks in keys_fn(batch)
    ]
    hash_lists = [sorted(key_hash(k) for k in ks) for ks in key_lists]
    cols = {id_col: batch[id_col]}
    if payload:
        cols.update(payload)
    cols["block_keys"] = pa.array(key_lists, pa.list_(pa.string()))
    cols["key_hashes"] = pa.array(hash_lists, pa.list_(pa.uint64()))
    return pa.table(cols)


def salted_bucket_scored(keyed_ds, id_col: str, payload_cols: list[str],
                         cap: int, make_scorer, num_partitions: int | None = None,
                         pair_dedup: str = "min_key"):
    """Fused variant of ``salted_bucket_pairs``: per partition block, emit
    canonical pair-index chunks and score them IN PLACE — the wide ``1_*``/
    ``2_*`` pair table never enters the object store (the ER path's
    ``build_scored`` pattern, pairs.py:406).

    ``make_scorer(sorted_batch) -> score(a, b) -> pa.Table`` is called once
    per partition block (build per-block caches there: to_pylist columns,
    encodings); ``score`` receives canonical row-index arrays (id[a] < id[b]
    per pair) and returns an output slice, typically already filtered.

    ``pair_dedup``: ``"min_key"`` (default) ships each row's key-hash list
    through the explode and suppresses cross-bucket duplicate pairs with the
    min-shared-fingerprint rule; ``"caller"`` ships NO key hashes (×num_keys
    lighter exchange for multi-key sketch ops) and emits every within-bucket
    pair — the scorer must keep each pair under exactly one of its shared
    buckets (e.g. the first agreeing band, re-derived from the sketch)."""
    import ray

    from .blocking import explode_blocked, hot_key_census, salt_batch
    from .dsutil import exchange_fanout
    from .pairs import _partition_by_key, emit_pair_indices_block

    dedup_keys = pair_dedup == "min_key"
    keyed_ds = keyed_ds.materialize()
    hot, blocked_rows = hot_key_census(keyed_ds, cap)
    blocked = explode_blocked(keyed_ds, payload_cols=[id_col] + payload_cols,
                              include_key_hashes=dedup_keys)
    if hot:
        hot_ref = ray.put(hot)

        def apply_salt(batch: pa.Table) -> pa.Table:
            return salt_batch(batch, ray.get(hot_ref), cap, id_col=id_col)

        blocked = blocked.map_batches(apply_salt, batch_format="pyarrow")

    _EMPTY_IDX = np.zeros(0, dtype=np.int64)

    def kernel(batch: pa.Table):
        sorted_batch, gen = emit_pair_indices_block(
            batch, id_col=id_col, dedup_keys=dedup_keys
        )
        scorer = None
        emitted = False
        for a, b in gen:
            if scorer is None:
                scorer = make_scorer(sorted_batch)
            emitted = True
            yield scorer(a, b)
        if not emitted:
            yield make_scorer(sorted_batch)(_EMPTY_IDX, _EMPTY_IDX)

    n = num_partitions or exchange_fanout(blocked_rows)
    return _partition_by_key(blocked, n=n).map_batches(
        kernel, batch_size=None, batch_format="pyarrow"
    )


def _list_matrix(col, dtype) -> np.ndarray:
    """list<fixed-width> column → [n, d] matrix (zero-copy flatten)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    flat = arr.values.to_numpy(zero_copy_only=False).astype(dtype)
    if n == 0:
        return flat.reshape(0, 0)
    return flat.reshape(n, len(flat) // n)


def minhash_lsh_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                      threshold: float = 0.7, num_perm: int = 128,
                      bands: int = 32, shingle_k: int = 5,
                      max_bucket: int = 2000, est_slack: float = 0.3,
                      num_partitions: int | None = None,
                      broadcast_pairs: int = 100_000):
    """Near-dup pairs with true k-shingle Jaccard ≥ threshold, candidates via
    MinHash-LSH band buckets.

    Scale design: the bucket shuffle carries ``(id, signature, band keys)``
    only — ~num_perm·8 bytes per doc, never the text (a 100 TB corpus would
    otherwise amplify its full text ×bands through the exchange). Candidates
    are prefiltered by the signature Jaccard estimate (≥ threshold −
    est_slack, ~5σ below threshold at num_perm=64 so the exact result is
    unaffected), and only the surviving pairs get the text back for exact
    verification — via a broadcast semi-join (one streaming filter pass over
    the corpus + a ``ray.put`` text lookup) when the candidate set is ≤
    ``broadcast_pairs``, else two copartitioned hash joins (nothing is ever
    dropped; the broadcast path is a fixed-overhead win, the join path is
    the unbounded-candidate scale path)."""
    from .dsutil import join_partitions

    if num_partitions is None:
        num_partitions = join_partitions()
    mh = MinHasher(num_perm=num_perm, shingle_k=shingle_k, bands=bands)

    def keys_fn_and_sigs(batch: pa.Table):
        texts = batch[text_col].to_pylist()
        sigs = [mh.signature(t) for t in texts]
        keys = [mh.band_keys(s) for s in sigs]
        return sigs, keys

    def attach(batch: pa.Table) -> pa.Table:
        sigs, keys = keys_fn_and_sigs(batch)
        return _attach_bucket_keys(
            batch, id_col=id_col, keys_fn=lambda b: keys,
            payload={"_sig": pa.array([s.tolist() for s in sigs],
                                      pa.list_(pa.uint64()))},
        )

    from .dsutil import default_parallelism

    # split-only repartition (no shuffle): a small corpus often arrives as
    # one parquet block, which would serialize the per-doc MinHash loop
    keyed = (
        ds.select_columns([id_col, text_col])
        .repartition(default_parallelism(), shuffle=False)
        .map_batches(attach, batch_format="pyarrow")
    )
    est_min = max(threshold - est_slack, 0.0)

    def make_scorer(sb: pa.Table):
        S = _list_matrix(sb["_sig"].combine_chunks() if sb.num_rows
                         else sb["_sig"], np.uint64)
        ids = sb[id_col].combine_chunks() if sb.num_rows else sb[id_col]
        # band index of each row's bucket, parsed once per block ("b{i}:…",
        # optionally "#{i}_{j}"-salted — the salt follows the hash part)
        beta = np.fromiter(
            (int(k.split(":", 1)[0][1:]) for k in sb["block_key"].to_pylist()),
            dtype=np.int64, count=sb.num_rows,
        ) if sb.num_rows else np.zeros(0, np.int64)

        def score(a: np.ndarray, b: np.ndarray) -> pa.Table:
            if len(a):
                eq = S[a] == S[b]                       # [P, num_perm]
                est = eq.mean(axis=1)
                # cross-bucket dedup without key-hash lists: a pair's shared
                # buckets are exactly its agreeing bands (band keys are
                # sig-derived), so keep it only under the FIRST agreeing
                # band. Same-bucket-but-no-agreeing-band pairs (band-key
                # hash collisions, ~2^-32) are spurious and dropped.
                eqb = eq.reshape(len(a), bands, -1).all(axis=2)
                first = eqb.argmax(axis=1)
                ki = np.nonzero(
                    eqb[np.arange(len(a)), first]
                    & (first == beta[a])
                    & (est >= est_min)
                )[0]
            else:
                ki = np.zeros(0, dtype=np.int64)
            return pa.table(
                {
                    "id1": ids.take(pa.array(a[ki], pa.int64())),
                    "id2": ids.take(pa.array(b[ki], pa.int64())),
                }
            )

        return score

    # est_filter runs fused inside emission (the [P, num_perm] signature
    # pair matrices never enter the object store), and pair_dedup="caller"
    # keeps the ×bands key-hash lists off the exchange entirely — each
    # exploded row is (id, sig, bucket key). Materialized: (id1, id2)
    # pairs only — O(near-dup candidates) × 16 B, held distributed in the
    # object store (never collected to the driver). Splitting the topology
    # here measured 2.5× faster end-to-end than one fused plan: the candidate
    # subgraph and the two text-join exchanges otherwise chain 4 all-to-all
    # barriers in a single streaming run.
    cand = salted_bucket_scored(
        keyed, id_col, ["_sig"], max_bucket, make_scorer, pair_dedup="caller"
    ).materialize()

    # bring the text back for ONLY the surviving candidates
    texts = ds.select_columns([id_col, text_col])
    if cand.count() <= broadcast_pairs:
        return _broadcast_verified_pairs(
            cand, texts, id_col=id_col, text_col=text_col,
            shingle_k=shingle_k, threshold=threshold,
        )

    def rename(suffix):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table({id_col + suffix: b[id_col], "_t" + suffix: b[text_col]})
        return fn

    from .dsutil import copartition_join

    t1 = texts.map_batches(rename("_a"), batch_format="pyarrow")
    t2 = texts.map_batches(rename("_b"), batch_format="pyarrow")
    joined = copartition_join(
        copartition_join(cand, t1, on="id1", right_on=id_col + "_a",
                         n=num_partitions),
        t2, on="id2", right_on=id_col + "_b", n=num_partitions,
    )

    def verify(batch: pa.Table) -> pa.Table:
        sims = ngram_jaccard_batch(
            batch["_t_a"].to_pylist(), batch["_t_b"].to_pylist(), shingle_k
        )
        out = pa.table(
            {
                "id1": batch["id1"],
                "id2": batch["id2"],
                "similarity": pa.array(sims, pa.float64()),
            }
        )
        return out.filter(pa.array(sims >= threshold))

    return joined.map_batches(verify, batch_format="pyarrow")


def _broadcast_verified_pairs(cand, texts, *, id_col: str, text_col: str,
                              shingle_k: int, threshold: float):
    """Exact-Jaccard verification for a SMALL materialized candidate-pair
    set: semi-join the corpus down to the needed ids in one streaming filter
    pass (broadcast ``is_in`` value set — the corpus never shuffles), ship
    the surviving (id, text) rows via ``ray.put``, and verify pairs with an
    ``index_in``/``take`` lookup per candidate block. Total non-streaming
    state is O(candidate ids × text size) — callers gate on a pair cap."""
    import ray

    from .dsutil import collect_table

    cand_tbl = collect_table(cand)
    need = pc.unique(
        pa.concat_arrays(
            [cand_tbl["id1"].combine_chunks(), cand_tbl["id2"].combine_chunks()]
        )
    )
    need_ref = ray.put(need)

    def pick(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or id_col not in b.column_names:
            return pa.table({id_col: need.slice(0, 0),
                             text_col: pa.array([], pa.string())})
        return b.select([id_col, text_col]).filter(
            pc.is_in(b[id_col], value_set=ray.get(need_ref))
        )

    lut = collect_table(
        texts.map_batches(pick, batch_format="pyarrow").materialize()
    )
    lut_ref = ray.put(lut)

    def verify(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "id1": need.slice(0, 0),
                "id2": need.slice(0, 0),
                "similarity": pa.array([], pa.float64()),
            }
        )
        if batch.num_rows == 0 or "id1" not in batch.column_names:
            return empty
        t = ray.get(lut_ref)
        ia = pc.index_in(batch["id1"], value_set=t[id_col])
        ib = pc.index_in(batch["id2"], value_set=t[id_col])
        ta = t[text_col].take(ia).to_pylist()
        tb = t[text_col].take(ib).to_pylist()
        sims = ngram_jaccard_batch(ta, tb, shingle_k)
        out = pa.table(
            {
                "id1": batch["id1"],
                "id2": batch["id2"],
                "similarity": pa.array(sims, pa.float64()),
            }
        )
        return out.filter(pa.array(sims >= threshold))

    return cand.map_batches(verify, batch_format="pyarrow")


# byte-popcount lookup for vectorized Hamming distance on uint64
_POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _hamming64_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (a ^ b).view(np.uint8).reshape(-1, 8)
    return _POPCOUNT8[x].sum(axis=1).astype(np.int64)


def simhash_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                  max_hamming: int = 3, bands: int = 8,
                  max_bucket: int = 2000):
    """Near-dup pairs with SimHash Hamming distance ≤ max_hamming.

    The shuffle carries ``(id, fingerprint, band keys)`` — 8 bytes of payload
    per doc, text never enters the exchange; verification is vectorized
    popcount on the fingerprints. Recall is exact (pigeonhole) whenever
    ``max_hamming < bands``; pass a larger ``bands`` for large distance
    cutoffs."""

    from .simhash import tokens as _sh_tokens

    def attach(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        fps = simhash_batch(texts)
        # bucket every doc that HAS tokens (an all-zero fingerprint is still
        # comparable); only token-less docs are excluded — matches the SQL
        # oracle's len(tokens) > 0 predicate
        keys = [
            simhash_band_keys(int(f), bands) if _sh_tokens(t) else []
            for f, t in zip(fps, texts)
        ]
        return _attach_bucket_keys(
            batch, id_col=id_col, keys_fn=lambda b: keys,
            payload={"_fp": pa.array(fps.tolist(), pa.uint64())},
        )

    from .dsutil import default_parallelism

    keyed = (
        ds.select_columns([id_col, text_col])
        .repartition(default_parallelism(), shuffle=False)
        .map_batches(attach, batch_format="pyarrow")
    )
    def make_scorer(sb: pa.Table):
        fps = sb["_fp"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = sb[id_col].combine_chunks() if sb.num_rows else sb[id_col]
        width = np.uint64(64 // bands)
        mask = (np.uint64(1) << width) - np.uint64(1)
        # [n, bands] raw band bits (band keys are exact bit slices, so
        # "same bucket" ⟺ "equal band value" with no collision caveat)
        shifts = (np.arange(bands, dtype=np.uint64) * width)[None, :]
        bvals = (fps[:, None] >> shifts) & mask
        beta = np.fromiter(
            (int(k.split(":", 1)[0][1:]) for k in sb["block_key"].to_pylist()),
            dtype=np.int64, count=sb.num_rows,
        ) if sb.num_rows else np.zeros(0, np.int64)

        def score(a: np.ndarray, b: np.ndarray) -> pa.Table:
            if len(a):
                d = _hamming64_batch(fps[a], fps[b])
                # keep each pair only under its first agreeing band —
                # cross-bucket dedup without shipping key-hash lists
                eqb = bvals[a] == bvals[b]
                first = eqb.argmax(axis=1)
                ki = np.nonzero(
                    (first == beta[a]) & (d <= max_hamming)
                )[0]
            else:
                d = np.zeros(0, dtype=np.int64)
                ki = np.zeros(0, dtype=np.int64)
            return pa.table(
                {
                    "id1": ids.take(pa.array(a[ki], pa.int64())),
                    "id2": ids.take(pa.array(b[ki], pa.int64())),
                    "similarity": pa.array(
                        (64 - d[ki]).astype(np.float64), pa.float64()
                    ),
                }
            )

        return score

    # Hamming verification + band dedup run fused inside emission on the
    # block's fingerprint vector — pair tables and key-hash lists never
    # enter the object store.
    return salted_bucket_scored(keyed, id_col, ["_fp"], max_bucket, make_scorer,
                                pair_dedup="caller")


def jaccard_block_dedup(ds, block_col: str, id_col: str = "doc_id",
                        text_col: str = "text", threshold: float = 0.5,
                        ngram: int = 1, max_block: int = 2000):
    """True n-gram-Jaccard pairs ≥ threshold within explicit blocks (e.g.
    language). The n=1 case matches DuckDB's ``jaccard`` for oracle checks.

    One key per doc, so text rides the shuffle exactly once (×m only for rows
    of salted hot blocks) — and no block is unboundedly quadratic: blocks over
    ``max_block`` are chunk-pair salted like the ER blocker."""

    def attach(batch: pa.Table) -> pa.Table:
        vals = batch[block_col].to_pylist()
        keys = [[f"j:{v}"] if v is not None else [] for v in vals]
        return _attach_bucket_keys(
            batch, id_col=id_col, keys_fn=lambda b: keys,
            payload={"_txt": batch[text_col]},
        )

    keyed = ds.select_columns([id_col, text_col, block_col]).map_batches(
        attach, batch_format="pyarrow"
    )
    def make_scorer(sb: pa.Table):
        texts = sb["_txt"].to_pylist()
        ids = sb[id_col].combine_chunks() if sb.num_rows else sb[id_col]

        def score(a: np.ndarray, b: np.ndarray) -> pa.Table:
            sims = ngram_jaccard_batch(
                [texts[i] for i in a], [texts[i] for i in b], ngram
            ) if len(a) else np.zeros(0)
            ki = np.nonzero(sims >= threshold)[0]
            return pa.table(
                {
                    "id1": ids.take(pa.array(a[ki], pa.int64())),
                    "id2": ids.take(pa.array(b[ki], pa.int64())),
                    "similarity": pa.array(sims[ki], pa.float64()),
                }
            )

        return score

    # Jaccard verification runs fused inside emission — each block's texts
    # are materialized once (to_pylist) instead of once per pair side.
    return salted_bucket_scored(keyed, id_col, ["_txt"], max_block, make_scorer)


def embedding_dedup(ds, block_col: str | None, id_col: str = "vec_id",
                    vec_col: str = "embedding", threshold: float = 0.95,
                    max_block: int = 4096):
    """Embedding-cosine near-dup pairs ≥ threshold, within blocks (or one
    global block when block_col is None). Hot blocks are chunk-pair salted
    (``max_block`` cap — no O(n²) group ever exceeds cap² comparisons, and
    nothing is dropped); each salted group runs ONE matmul between its two
    chunk sides and emits only the surviving pairs — the full pair set never
    materializes."""
    import ray

    from .blocking import hot_key_census, salt_batch
    from .dsutil import exchange_fanout
    from .pairs import _partition_by_key

    cols = [id_col, vec_col] + ([block_col] if block_col else [])
    work = ds.select_columns(cols)

    def attach(batch: pa.Table) -> pa.Table:
        if block_col is None:
            vals = ["_all"] * batch.num_rows
        else:
            vals = batch[block_col].to_pylist()
        keys = [[f"v:{v}"] if v is not None else [] for v in vals]
        return _attach_bucket_keys(
            batch, id_col=id_col, keys_fn=lambda b: keys,
            payload={"_vec": batch[vec_col]},
        )

    keyed = work.map_batches(attach, batch_format="pyarrow").materialize()

    from .blocking import explode_blocked

    hot, blocked_rows = hot_key_census(keyed, max_block)
    blocked = explode_blocked(keyed, payload_cols=[id_col, "_vec"])
    if hot:
        hot_ref = ray.put(hot)

        def apply_salt(batch: pa.Table) -> pa.Table:
            return salt_batch(batch, ray.get(hot_ref), max_block, id_col=id_col)

        blocked = blocked.map_batches(apply_salt, batch_format="pyarrow")

    def kernel(batch: pa.Table):
        """Per salted group: one cross/upper-triangular matmul, emit
        survivors only (generator — large groups yield in slices)."""
        from .dsutil import group_boundaries
        from .pairs import _emit_group_sides

        empty = pa.table(
            {
                "id1": batch[id_col].slice(0, 0) if id_col in batch.column_names
                else pa.array([], pa.string()),
                "id2": batch[id_col].slice(0, 0) if id_col in batch.column_names
                else pa.array([], pa.string()),
                "similarity": pa.array([], pa.float64()),
            }
        )
        n = batch.num_rows
        if n == 0:
            yield empty
            return
        keys = np.asarray(batch["block_key"].to_pylist(), dtype=object)
        if n > 1 and np.any(keys[1:] < keys[:-1]):
            order = np.argsort(keys, kind="stable")
            batch = batch.take(pa.array(order, pa.int64()))
            keys = keys[order]
        ids = np.asarray(batch[id_col].to_pylist(), dtype=object)
        mat = _list_matrix(batch["_vec"].combine_chunks(), np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = mat / norms
        chunks = (
            batch["chunk"].to_numpy(zero_copy_only=False)
            if "chunk" in batch.column_names else None
        )
        starts, stops = group_boundaries(keys)
        emitted = False
        for s, e in zip(starts, stops):
            left, right, within = _emit_group_sides(chunks, str(keys[s]), s, e)
            if len(left) == 0 or len(right) == 0:
                continue
            sim = unit[left] @ unit[right].T
            if within:
                xi, yi = np.nonzero(np.triu(sim >= threshold, k=1))
            else:
                xi, yi = np.nonzero(sim >= threshold)
            if not len(xi):
                continue
            gi = ids[left[xi]]
            gj = ids[right[yi]]
            swap = gi > gj
            a = np.where(swap, gj, gi)
            b = np.where(swap, gi, gj)
            emitted = True
            yield pa.table(
                {
                    "id1": pa.array(a.tolist()),
                    "id2": pa.array(b.tolist()),
                    "similarity": pa.array(sim[xi, yi], pa.float64()),
                }
            )
        if not emitted:
            yield empty

    return _partition_by_key(blocked, n=exchange_fanout(blocked_rows)).map_batches(
        kernel, batch_size=None, batch_format="pyarrow"
    )
