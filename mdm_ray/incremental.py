"""Incremental (streaming-twin) merge: new documents → existing golden table.

Ray-native re-expression of the reference's streaming path
(``streaming_mdm_gcp/streaming_processor.py``) as a *mini-batch* Dataset
pipeline — the Lambda-layer unification SURVEY.md §1.4/§2.9 describes. One
call merges a Dataset of new interleaved docs into an existing golden-entity
Dataset:

1. featurize + standardize the new docs (same kernels as the batch path —
   the reference documents its streaming standardizer as "100% identical" to
   the batch SQL, ``MDM_STREAMING_JOURNEY.md:127-154``);
2. **bipartite candidate generation** record↔entity via shared blocking keys
   (the Ray-shuffle replacement for the reference's Spanner secondary-index
   point lookups, ``spanner_utils.py:302-307``):
   * ``e:`` email equality  — J9, ``streaming_processor.py:74-108``
   * ``p:`` phone equality  — J9
   * ``n:`` phonetic name key — upgrade over the reference's 3-char-prefix
     ``STARTS_WITH … LIMIT 20`` (J10, ``:110-154``; the LIMIT 20 recall cap
     is deliberately not copied, SURVEY §2.4)
   * ``b:`` company equality, ``g:`` city|state — J11, ``:238-278``
   Keys shuffle both sides with a ``sort(block_key)`` range partition; no
   mutable index is needed, so the stage scales like any other groupby.
3. per-candidate 4-strategy scoring with the streaming weights .33/.28/.22/.17
   (A3, ``streaming_processor.py:25-31, 280-344``): exact 1.0 on email/phone
   equality; fuzzy = name edit similarity kept > 0.6 (``:110-154``); vector =
   cosine when both sides carry embeddings (for fresh records without stored
   entity embeddings this contributes 0.0 — exactly the reference's observed
   behavior, ``:196-213``); business = company 0.3 + city&state 0.2;
4. per-record argmax entity + decision (``:346-365``): ≥0.8 AUTO_MERGE and
   ≥0.6 HUMAN_REVIEW both merge into the winning entity
   (``:435-450``), else a new entity is created;
5. **upsert survivorship** (A7, ``:515-753``): per updated entity, field-wise
   new-wins-if-non-null (applied in doc_id order for determinism at any
   parallelism — the reference's arrival order is wall-clock), lineage
   append + source-set union + count; ``master_id`` stays stable on update
   (the reference never rewrites an entity's id on upsert);
6. unmatched records run the *batch* blocking→scoring→CC→survivorship slice
   among themselves (the reference processes one record at a time so
   intra-batch duplicates implicitly match the first-created entity; the
   set-oriented equivalent is clustering the unmatched set) and land as new
   entities, also emitted to the staging table (S8,
   ``spanner_utils.py:723-769``) with a JSON payload + ``processed=False``;
7. one ``match_results`` row per processed record (S9,
   ``streaming_processor.py:755-809``).

Returned dict: ``golden`` (updated entity Dataset), ``match_results``,
``staged``, ``assignments``.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import config as C
from .config import DEFAULT_CONFIG, EngineConfig
from .dsutil import group_boundaries
from .features import featurize
from .blocking import prep_scoring_columns
from .phonetic import metaphone, soundex
from .simfuncs import EditSimIndex, cosine_batch, edit_similarity_batch

# streaming weights — streaming_processor.py:25-31
STREAM_WEIGHTS = dict(C.WEIGHTS_4WAY)
FUZZY_CANDIDATE_THRESHOLD = 0.6  # streaming_processor.py:148-151

_SIDE_COLUMNS = [
    ("id", pa.string()),            # doc_id (record) / cluster_id (entity)
    ("role", pa.int8()),            # 0 = golden entity, 1 = new record
    ("full_name_clean", pa.string()),
    ("email_clean", pa.string()),
    ("phone_clean", pa.string()),
    ("company", pa.string()),
    ("city_clean", pa.string()),
    ("state_clean", pa.string()),
    ("embedding", pa.list_(pa.float32())),
]


def _candidate_keys(name, email, phone, company, city, state) -> list[str]:
    """Blocking keys shared by both sides (J9/J10/J11 semantics)."""
    keys = []
    if email:
        keys.append("e:" + email)
    if phone:
        keys.append("p:" + phone)
    if name:
        keys.append(f"n:{soundex(name)}|{metaphone(name)}")
    if company:
        keys.append("b:" + company.upper())
    if city and state:
        keys.append(f"g:{city}|{state}")
    return sorted(set(keys))


def _emit_side(batch: pa.Table, role: int, colmap: dict[str, str]) -> pa.Table:
    """Project one side to the shared key-tagged layout (one row per key)."""
    n = batch.num_rows
    get = lambda src: (  # noqa: E731
        batch[src].to_pylist() if src in batch.column_names else [None] * n
    )
    ids = get(colmap["id"])
    names = get(colmap["full_name_clean"])
    emails = get(colmap["email_clean"])
    phones = get(colmap["phone_clean"])
    comps = get(colmap["company"])
    cities = get(colmap["city_clean"])
    states = get(colmap["state_clean"])
    embs = get(colmap.get("embedding", "embedding"))

    out: dict[str, list] = {name: [] for name, _ in _SIDE_COLUMNS}
    out["block_key"] = []
    for i in range(n):
        keys = _candidate_keys(
            names[i], emails[i], phones[i], comps[i], cities[i], states[i]
        )
        for k in keys:
            out["block_key"].append(k)
            out["id"].append(ids[i])
            out["role"].append(role)
            out["full_name_clean"].append(names[i])
            out["email_clean"].append(emails[i])
            out["phone_clean"].append(phones[i])
            out["company"].append(comps[i])
            out["city_clean"].append(cities[i])
            out["state_clean"].append(states[i])
            out["embedding"].append(embs[i])
    arrays = {name: pa.array(out[name], typ) for name, typ in _SIDE_COLUMNS}
    arrays["block_key"] = pa.array(out["block_key"], pa.string())
    return pa.table(arrays)


GOLDEN_COLMAP = {
    "id": "cluster_id",
    "full_name_clean": "master_name",
    "email_clean": "master_email",
    "phone_clean": "master_phone",
    "company": "master_company",
    "city_clean": "master_city",
    "state_clean": "master_state",
    "embedding": "embedding",
}
RECORD_COLMAP = {c: c for c in [
    "full_name_clean", "email_clean", "phone_clean", "company",
    "city_clean", "state_clean", "embedding",
]} | {"id": "doc_id"}


_EMPTY_SCORED = pa.table({
    "doc_id": pa.array([], pa.string()),
    "cluster_id": pa.array([], pa.string()),
    "exact_score": pa.array([], pa.float64()),
    "fuzzy_score": pa.array([], pa.float64()),
    "vector_score": pa.array([], pa.float64()),
    "business_score": pa.array([], pa.float64()),
    "combined_score": pa.array([], pa.float64()),
})


def _score_group_pairs(batch: pa.Table) -> pa.Table:
    """Sorted-by-block_key block → scored (doc_id, cluster_id) candidates.

    Bipartite within-group pairing (records × entities) + 4-strategy scoring
    in one vectorized pass. Pairs sharing several blocking keys are scored
    once per shared key — duplicates score IDENTICALLY (scores depend only on
    the two rows), and the only consumer is the per-doc value argmax
    (`_argmax_per_doc`, tie-break by value), so duplicates cannot change the
    result; skipping the per-pair min-shared-key check keeps this kernel
    Python-free."""
    if batch.num_rows == 0 or "block_key" not in batch.column_names:
        return _EMPTY_SCORED
    keys = np.asarray(batch["block_key"].to_pylist(), dtype=object)
    starts, stops = group_boundaries(keys)
    roles = batch["role"].to_numpy(zero_copy_only=False)

    ii_all, jj_all = [], []
    for s, e in zip(starts, stops):
        r = roles[s:e]
        recs = np.nonzero(r == 1)[0] + s
        ents = np.nonzero(r == 0)[0] + s
        if len(recs) == 0 or len(ents) == 0:
            continue
        ii_all.append(np.repeat(recs, len(ents)))
        jj_all.append(np.tile(ents, len(recs)))

    if not ii_all:
        return _EMPTY_SCORED
    ii = np.concatenate(ii_all)
    jj = np.concatenate(jj_all)
    ii_arr = pa.array(ii, pa.int64())
    jj_arr = pa.array(jj, pa.int64())

    def eq(name: str) -> np.ndarray:
        # non-null, non-empty, equal — all in Arrow kernels
        a = batch[name].take(ii_arr)
        b = batch[name].take(jj_arr)
        m = pc.and_kleene(pc.equal(a, b), pc.not_equal(a, ""))
        return pc.fill_null(m, False).to_numpy(zero_copy_only=False)

    # exact — streaming_processor.py:74-108 (score 1.0 on email/phone equality)
    exact = np.maximum(eq("email_clean"), eq("phone_clean")).astype(np.float64)
    # fuzzy — edit similarity on names, candidates kept > 0.6 (:148-151).
    # Row-indexed kernel: each row is encoded + histogrammed ONCE (rows <<
    # pairs in dense blocks), the bag bound prunes by index gather, and the
    # DP runs on survivors only. Pruning is sound here: pruned entries carry
    # an upper bound ≤ the cutoff and the next line zeroes everything ≤ the
    # cutoff either way.
    esi = EditSimIndex(batch["full_name_clean"].to_pylist())
    fz = esi.similarity(ii, jj, prune_below=FUZZY_CANDIDATE_THRESHOLD)
    fuzzy = np.where(fz > FUZZY_CANDIDATE_THRESHOLD, fz, 0.0)
    # vector — cosine when both sides have embeddings (:196-236); one
    # [rows, d] float matrix per block, pair rows gathered by index
    emb = batch["embedding"].combine_chunks()
    row_valid = pc.is_valid(emb).to_numpy(zero_copy_only=False)
    vector = np.zeros(len(ii))
    pair_valid = row_valid[ii] & row_valid[jj]
    if pair_valid.any():
        rows = np.nonzero(row_valid)[0]
        dense = emb.take(pa.array(rows, pa.int64()))
        n_rows = len(dense)
        flat = dense.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        mat = flat.reshape(n_rows, len(flat) // n_rows)
        row_map = np.full(batch.num_rows, -1, dtype=np.int64)
        row_map[rows] = np.arange(n_rows)
        vi = np.nonzero(pair_valid)[0]
        cos = cosine_batch(mat[row_map[ii[vi]]], mat[row_map[jj[vi]]])
        vector[vi] = np.where(cos > C.VECTOR_SIM_THRESHOLD, cos, 0.0)
    # business — company 0.3, city+state 0.2 (:238-278)
    business = (
        np.where(eq("company"), C.SAME_COMPANY_SCORE, 0.0)
        + np.where(eq("city_clean") & eq("state_clean"), C.SAME_LOCATION_SCORE, 0.0)
    )
    w = STREAM_WEIGHTS
    combined = (
        w["exact"] * exact + w["fuzzy"] * fuzzy
        + w["vector"] * vector + w["business"] * business
    )
    return pa.table({
        "doc_id": batch["id"].take(ii_arr),
        "cluster_id": batch["id"].take(jj_arr),
        "exact_score": pa.array(exact, pa.float64()),
        "fuzzy_score": pa.array(fuzzy, pa.float64()),
        "vector_score": pa.array(vector, pa.float64()),
        "business_score": pa.array(business, pa.float64()),
        "combined_score": pa.array(combined, pa.float64()),
    })


def _argmax_per_doc(batch: pa.Table) -> pa.Table:
    """Sorted-by-doc_id block → best entity per record + decision
    (streaming_processor.py:280-365: per-entity max then global argmax;
    tie-break = smallest cluster_id, deterministic)."""
    if batch.num_rows == 0 or "doc_id" not in batch.column_names:
        return _EMPTY_SCORED.append_column(
            "decision", pa.array([], pa.string())
        )
    ids = np.asarray(batch["doc_id"].to_pylist(), dtype=object)
    starts, stops = group_boundaries(ids)
    scores = batch["combined_score"].to_numpy(zero_copy_only=False)
    clusters = np.asarray(batch["cluster_id"].to_pylist(), dtype=object)
    # one global lexsort: group id primary (keeps groups contiguous), then
    # score desc, then cluster asc — each group's winner lands at its start
    codes = np.repeat(np.arange(len(starts)), stops - starts)
    order = np.lexsort((clusters, -scores, codes))
    pick = order[starts]
    out = batch.take(pa.array(pick, pa.int64()))
    comb = out["combined_score"].to_numpy(zero_copy_only=False)
    decision = np.where(
        comb >= C.AUTO_MERGE_THRESHOLD, "auto_merge",
        np.where(comb >= C.HUMAN_REVIEW_THRESHOLD, "human_review", "no_match"),
    )
    return out.append_column("decision", pa.array(decision.tolist(), pa.string()))


MEMBER_FIELDS = [
    "doc_id", "source_system", "full_name_clean", "email_clean", "phone_clean",
    "address_clean", "city_clean", "state_clean", "company", "customer_segment",
    "embedding",
]
_MEMBER_FIELD_TYPES = {"embedding": pa.list_(pa.float32())}
_UPDATE_FIELD_MAP = {
    # master column ← member feature column (new-wins-if-non-null, A7)
    "master_name": "full_name_clean",
    "master_email": "email_clean",
    "master_phone": "phone_clean",
    "master_address": "address_clean",
    "master_city": "city_clean",
    "master_state": "state_clean",
    "master_company": "company",
    "master_segment": "customer_segment",
}
_FLAG_SOURCE = {
    "has_email": "master_email",
    "has_phone": "master_phone",
    "has_address": "master_address",
}


def _merge_entities_block(batch: pa.Table) -> pa.Table:
    """Sorted-by-cluster_id block of golden rows (role=0) + matched member
    rows (role=1) → upserted golden rows (A7 semantics)."""
    cids = np.asarray(batch["cluster_id"].to_pylist(), dtype=object)
    starts, stops = group_boundaries(cids)
    roles = batch["role"].to_numpy(zero_copy_only=False)
    rows = batch.to_pylist()
    out_rows = []
    for s, e in zip(starts, stops):
        seg = list(range(s, e))
        golden_idx = [i for i in seg if roles[i] == 0]
        member_idx = [i for i in seg if roles[i] == 1]
        if not golden_idx:
            continue  # matched member without its entity row: dropped upstream
        g = dict(rows[golden_idx[0]])
        if member_idx:
            members = sorted((rows[i] for i in member_idx), key=lambda r: r["doc_id"])
            for m in members:
                for master_col, src in _UPDATE_FIELD_MAP.items():
                    v = m.get(src)
                    if v is not None and v != "":
                        g[master_col] = v
                # UPDATE SET embedding = @embedding, processing_path =
                # 'stream_updated' — streaming_processor.py:563-564 (embedding
                # overwritten unconditionally with the incoming record's;
                # income / first_seen / last_activity / confidence untouched).
                g["embedding"] = m.get("embedding")
            g["processing_path"] = "stream_updated"
            ids = set(g["source_record_ids"] or []) | {m["doc_id"] for m in members}
            g["source_record_ids"] = sorted(ids)
            g["source_record_count"] = len(ids)
            systems = set(g["source_systems"] or []) | {
                m["source_system"] for m in members if m.get("source_system")
            }
            g["source_systems"] = sorted(systems)
            for flag, src in _FLAG_SOURCE.items():
                g[flag] = int(bool(g.get(flag)) or g.get(src) is not None)
        out_rows.append({k: g.get(k) for k in _MERGE_GOLDEN_COLUMNS})
    if not out_rows:
        return _empty_golden()
    return pa.Table.from_pylist(out_rows, schema=_merged_golden_schema())


_MERGE_GOLDEN_COLUMNS = [
    "cluster_id", "master_id", "master_name", "master_email", "master_phone",
    "master_address", "master_city", "master_state", "master_company",
    "master_income", "master_segment", "source_record_ids",
    "source_record_count", "source_systems", "first_seen", "last_activity",
    "has_email", "has_phone", "has_address", "confidence_score",
    "processing_path", "embedding",
]


def _merged_golden_schema() -> pa.Schema:
    return pa.schema(
        [
            ("cluster_id", pa.string()),
            ("master_id", pa.string()),
            ("master_name", pa.string()),
            ("master_email", pa.string()),
            ("master_phone", pa.string()),
            ("master_address", pa.string()),
            ("master_city", pa.string()),
            ("master_state", pa.string()),
            ("master_company", pa.string()),
            ("master_income", pa.int64()),
            ("master_segment", pa.string()),
            ("source_record_ids", pa.list_(pa.string())),
            ("source_record_count", pa.int64()),
            ("source_systems", pa.list_(pa.string())),
            ("first_seen", pa.string()),
            ("last_activity", pa.string()),
            ("has_email", pa.int64()),
            ("has_phone", pa.int64()),
            ("has_address", pa.int64()),
            ("confidence_score", pa.float64()),
            ("processing_path", pa.string()),
            ("embedding", pa.list_(pa.float32())),
        ]
    )


def _empty_golden() -> pa.Table:
    sch = _merged_golden_schema()
    return pa.table({f.name: pa.array([], f.type) for f in sch})


def _tag_role(ds, role: int, schema_cols: list[str]):
    """Project to the merge-union layout with a role column."""

    def fn(b: pa.Table) -> pa.Table:
        cols = {}
        for name in schema_cols:
            if name in b.column_names:
                cols[name] = b[name]
            else:
                typ = _merged_golden_schema().field(name).type if name in _MERGE_GOLDEN_COLUMNS else pa.string()
                cols[name] = pa.nulls(b.num_rows, typ)
        cols["role"] = pa.array([role] * b.num_rows, pa.int8())
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def incremental_merge(new_docs_ds, golden_ds, cfg: EngineConfig = DEFAULT_CONFIG):
    """Merge new interleaved docs into an existing golden table (module doc)."""
    import ray.data

    from .dsutil import ensure_context

    ensure_context()
    feats = featurize(new_docs_ds).map_batches(
        prep_scoring_columns, batch_format="pyarrow"
    ).materialize()
    golden_ds = golden_ds.materialize()

    # --- candidate generation + scoring (bipartite blocking shuffle) --------
    rec_side = feats.map_batches(
        lambda b: _emit_side(b, 1, RECORD_COLMAP), batch_format="pyarrow"
    )
    gold_side = golden_ds.map_batches(
        lambda b: _emit_side(b, 0, GOLDEN_COLMAP), batch_format="pyarrow"
    )
    candidates = (
        rec_side.union(gold_side)
        .sort("block_key")
        .map_batches(_score_group_pairs, batch_size=None, batch_format="pyarrow")
    )
    best = candidates.sort("doc_id").map_batches(
        _argmax_per_doc, batch_size=None, batch_format="pyarrow"
    ).materialize()

    matched = best.map_batches(
        lambda b: b.filter(
            pc.is_in(b["decision"], value_set=pa.array(["auto_merge", "human_review"]))
        ),
        batch_format="pyarrow",
    ).materialize()

    # --- upsert survivorship for matched records ----------------------------
    # The assignment map is bounded by the incremental batch size (the small
    # side by design — the reference processes 100 records per streaming run),
    # so collecting it to the driver and broadcasting via ray.put is the
    # scale-correct pattern (broadcast small side, never shuffle the big one).
    # Zero-copy block collect + vectorized index_in lookups — no per-row
    # Python, so the mini-batch size is bounded by memory, not loop speed.
    from .dsutil import collect_table

    assign_tbl = collect_table(
        matched.select_columns(["doc_id", "cluster_id"]).materialize()
    )
    assigned_arr = assign_tbl["doc_id"].combine_chunks()
    assigned_clusters = assign_tbl["cluster_id"].combine_chunks()
    touched_clusters = sorted(set(assigned_clusters.to_pylist()))

    import ray

    cluster_ref = ray.put(assign_tbl)

    def members_with_cluster(b: pa.Table) -> pa.Table:
        t = ray.get(cluster_ref)
        idx = pc.index_in(b["doc_id"], value_set=t["doc_id"].combine_chunks())
        cl = t["cluster_id"].combine_chunks().take(idx)
        cols = {
            f: b[f] if f in b.column_names
            else pa.nulls(b.num_rows, _MEMBER_FIELD_TYPES.get(f, pa.string()))
            for f in MEMBER_FIELDS
        }
        cols["cluster_id"] = cl
        return pa.table(cols).filter(pc.is_valid(cl))

    members = feats.map_batches(members_with_cluster, batch_format="pyarrow")

    # Untouched entities pass through untouched (zero-copy project) — only the
    # clusters that actually received a new record enter the merge shuffle, so
    # merging a small batch never rewrites the full entity table.
    touched_arr = pa.array(touched_clusters, pa.string())

    def project_golden(b: pa.Table) -> pa.Table:
        return pa.table({c: b[c] for c in _MERGE_GOLDEN_COLUMNS})

    golden_untouched = golden_ds.map_batches(
        lambda b: project_golden(
            b.filter(pc.invert(pc.is_in(b["cluster_id"], value_set=touched_arr)))
        ),
        batch_format="pyarrow",
    )
    golden_touched = golden_ds.map_batches(
        lambda b: b.filter(pc.is_in(b["cluster_id"], value_set=touched_arr)),
        batch_format="pyarrow",
    )

    merge_cols = _MERGE_GOLDEN_COLUMNS + [f for f in MEMBER_FIELDS if f != "doc_id"] + ["doc_id"]
    merged = (
        _tag_role(golden_touched, 0, merge_cols)
        .union(_tag_role(members, 1, merge_cols))
        .sort("cluster_id")
        .map_batches(_merge_entities_block, batch_size=None, batch_format="pyarrow")
    )
    updated_golden = golden_untouched.union(merged)

    # --- new entities: cluster the unmatched set among themselves -----------
    unmatched = feats.map_batches(
        lambda b: b.filter(
            pc.invert(pc.is_in(b["doc_id"], value_set=assigned_arr))
        ),
        batch_format="pyarrow",
    ).materialize()
    if unmatched.count() > 0:
        from .blocking import build_blocked
        from .cluster import build_edges, connected_components, init_labels
        from .pairs import build_scored
        from .survivorship import build_golden

        # mini-batches are small: size the pair exchange from the row count
        # (≤ ~12 block keys per doc) instead of paying the 8×-CPU default
        scored = build_scored(
            build_blocked(unmatched, cfg), cfg, rows=unmatched.count() * 12
        )
        labels = connected_components(
            build_edges(scored), init_labels(unmatched), cfg
        )
        def prefix_cluster(b: pa.Table) -> pa.Table:
            ids = pa.array(
                ["inc-" + x for x in b["cluster_id"].to_pylist()], pa.string()
            )
            b = b.drop_columns(["cluster_id"]).add_column(0, "cluster_id", ids)
            # new streaming entities: confidence 0.8, path 'stream'
            # (streaming_processor.py:630-631); build_golden stamps the batch
            # constants, so overwrite them here.
            n = b.num_rows
            b = b.set_column(
                b.column_names.index("confidence_score"), "confidence_score",
                pa.array([0.8] * n, pa.float64()),
            )
            return b.set_column(
                b.column_names.index("processing_path"), "processing_path",
                pa.array(["stream"] * n, pa.string()),
            )

        new_golden = build_golden(
            unmatched, labels, num_partitions=cfg.cc_num_partitions
        ).map_batches(prefix_cluster, batch_format="pyarrow").materialize()
    else:
        new_golden = ray.data.from_arrow(_empty_golden())

    def to_staged(b: pa.Table) -> pa.Table:
        payload = [
            json.dumps(
                {k: r.get(k) for k in _MERGE_GOLDEN_COLUMNS}, sort_keys=True,
                default=str,
            )
            for r in b.to_pylist()
        ]
        return pa.table({
            "entity_id": b["master_id"],
            "golden_record_data": pa.array(payload, pa.string()),
            "processed": pa.array([False] * b.num_rows, pa.bool_()),
        })

    staged = new_golden.map_batches(to_staged, batch_format="pyarrow")

    new_cols = [c for c in _MERGE_GOLDEN_COLUMNS]
    final_golden = updated_golden.union(
        new_golden.map_batches(
            lambda b: pa.table({c: b[c] for c in new_cols}), batch_format="pyarrow"
        )
    )

    # --- match_results (S9): one row per processed record -------------------
    # (doc_id -> new cluster_id) as a flattened Arrow map: list_flatten the
    # source_record_ids, repeat each cluster_id by list_parent_indices.
    ng_tbl = collect_table(
        new_golden.select_columns(["cluster_id", "source_record_ids"]).materialize()
    )
    ng_ids = ng_tbl["source_record_ids"].combine_chunks()
    ng_map = pa.table(
        {
            "doc_id": pc.list_flatten(ng_ids),
            "cluster_id": ng_tbl["cluster_id"].combine_chunks().take(
                pc.list_parent_indices(ng_ids)
            ),
        }
    )
    ne_ref = ray.put(ng_map)
    _MATCH_DECISIONS = pa.array(["auto_merge", "human_review"])

    def results_batch(b: pa.Table) -> pa.Table:
        t = ray.get(ne_ref)
        is_match = pc.is_in(b["decision"], value_set=_MATCH_DECISIONS)
        new_ent = t["cluster_id"].combine_chunks().take(
            pc.index_in(b["doc_id"], value_set=t["doc_id"].combine_chunks())
        )
        return pa.table({
            "doc_id": b["doc_id"],
            "entity_id": pc.if_else(is_match, b["cluster_id"], new_ent),
            "action": pc.if_else(is_match, b["decision"], pa.scalar("new_entity")),
            "exact_score": b["exact_score"],
            "fuzzy_score": b["fuzzy_score"],
            "vector_score": b["vector_score"],
            "business_score": b["business_score"],
            "combined_score": b["combined_score"],
        })

    # records with no candidates at all never reach `best`; synthesize rows
    seen_arr = collect_table(
        best.select_columns(["doc_id"]).materialize()
    )["doc_id"].combine_chunks()
    seen_ref = ray.put(seen_arr)

    def no_candidate_rows(b: pa.Table) -> pa.Table:
        t = ray.get(ne_ref)
        docs = b["doc_id"].filter(
            pc.invert(pc.is_in(b["doc_id"], value_set=ray.get(seen_ref)))
        ).combine_chunks()
        ent = t["cluster_id"].combine_chunks().take(
            pc.index_in(docs, value_set=t["doc_id"].combine_chunks())
        )
        zero = pa.array(np.zeros(len(docs)), pa.float64())
        return pa.table({
            "doc_id": docs,
            "entity_id": ent,
            "action": pa.array(["new_entity"] * len(docs), pa.string()),
            "exact_score": zero,
            "fuzzy_score": zero,
            "vector_score": zero,
            "business_score": zero,
            "combined_score": zero,
        })

    match_results = best.map_batches(results_batch, batch_format="pyarrow").union(
        feats.map_batches(no_candidate_rows, batch_format="pyarrow")
    )

    return {
        "golden": final_golden,
        "match_results": match_results,
        "staged": staged,
        "assignments": matched,
        # audit/oracle surfaces: the raw candidate score table (pre-argmax)
        # and the new-entity doc→cluster map — queries.q_er_incremental
        # exports both so SQL_ER_INCREMENTAL can re-derive match_results
        # (argmax + thresholds) independently
        "candidates": candidates,
        "new_entity_map": ng_map,
    }
