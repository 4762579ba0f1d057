"""Survivorship (golden-record reduce) + deterministic entity IDs.

Reference semantics (``batch_mdm_gcp/bigquery_utils.py:718-806``):
longest non-null name/address/city/state; most-recent email/phone/company/
segment; MAX income; record count; sorted-unique source systems; has_* flags;
``master_id`` = SHA256('email:'+email)[:36] → SHA256('phone:'+phone)[:36] →
cluster_id (``:766-780``, Python twin ``streaming_processor.py:367-395``).

Scale design: every survivorship rule is associative, so instead of a
per-cluster Python ``map_groups`` the reduce is a native
``groupby(cluster_id).aggregate(...)`` with partial aggregation:

* "longest"      → Max over the composite key ``f"{len:04d}|{value}"``
* "most recent"  → Max over ``f"{recency}|{value}"``
* lineage        → per-block Acero ``distinct`` over doc_id / source_system

Determinism note: in the reference's batch run every row gets the same
``processed_at`` (``bigquery_utils.py:147``), so its "most recent" pick is
engine-arbitrary; we define recency = doc_id order (stable, documented) and
break "longest" ties by value — deterministic at any parallelism.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

LONGEST_FIELDS = {
    "master_name": "full_name_clean",
    "master_address": "address_clean",
    "master_city": "city_clean",
    "master_state": "state_clean",
}
RECENT_FIELDS = {
    "master_email": "email_clean",
    "master_phone": "phone_clean",
    "master_company": "company",
    "master_segment": "customer_segment",
}
FLAG_FIELDS = {
    "has_email": "email_clean",
    "has_phone": "phone_clean",
    "has_address": "address_clean",
}
# master_income = MAX(annual_income) / first_seen = MIN(registration_date) /
# last_activity = MAX(last_activity_date) — bigquery_utils.py:742,750-751.
# Dates ride as ISO strings (span text), so lexicographic Min/Max == date
# Min/Max; income is cast to int64 before the Max.
INCOME_SRC = "annual_income"
FIRST_SEEN_SRC = "registration_date"
LAST_ACTIVITY_SRC = "last_activity_date"
# Constants stamped on the batch path when golden records land in the entity
# store (spanner_utils.py:527-528: 0.95, 'batch_migrated'); the incremental
# path overrides with the streaming values ('stream' 0.8 / 'stream_updated',
# streaming_processor.py:563-564,630-631).
BATCH_CONFIDENCE = 0.95
BATCH_PROCESSING_PATH = "batch_migrated"


def _rank_columns(batch: pa.Table) -> pa.Table:
    """Append composite rank columns consumed by the Max aggregators
    (vectorized Arrow compute; nulls propagate through the joins, matching the
    former per-row None handling)."""
    import pyarrow.compute as pc

    n = batch.num_rows

    def col(src):
        return batch[src] if src in batch.column_names else pa.nulls(n, pa.string())

    for out, src in LONGEST_FIELDS.items():
        v = col(src)
        # f"{len(v):04d}|{v}" — zero-padded length so Max == longest (ties by value)
        ln = pc.utf8_lpad(pc.cast(pc.utf8_length(v), pa.string()), width=4, padding="0")
        batch = batch.append_column(
            "_rk_" + out, pc.binary_join_element_wise(ln, v, "|")
        )
    for out, src in RECENT_FIELDS.items():
        v = col(src)
        # f"{doc_id}|{v}" — recency = doc_id order (deterministic, see module doc)
        batch = batch.append_column(
            "_rk_" + out, pc.binary_join_element_wise(batch["doc_id"], v, "|")
        )
    for out, src in FLAG_FIELDS.items():
        batch = batch.append_column(
            "_fl_" + out, pc.cast(pc.is_valid(col(src)), pa.int64())
        )
    income = col(INCOME_SRC)
    if income.type == pa.string():
        income = pc.cast(income, pa.int64())
    batch = batch.append_column("_income", income)
    batch = batch.append_column("_first_seen", col(FIRST_SEEN_SRC))
    batch = batch.append_column("_last_activity", col(LAST_ACTIVITY_SRC))
    return batch


def deterministic_master_id(email: str | None, phone: str | None, cluster_id: str) -> str:
    """bigquery_utils.py:770-780 / streaming_processor.py:379-395."""
    if email:
        return hashlib.sha256(f"email:{email}".encode()).hexdigest()[:36]
    if phone:
        return hashlib.sha256(f"phone:{phone}".encode()).hexdigest()[:36]
    return cluster_id


def _finalize(batch: pa.Table) -> pa.Table:
    """Parse composite aggregates into golden-record columns."""
    n = batch.num_rows
    cols: dict[str, pa.Array] = {"cluster_id": batch["label"]}

    def split_value(name: str) -> list:
        vals = batch[f"max(_rk_{name})"].to_pylist()
        return [None if v is None else v.split("|", 1)[1] for v in vals]

    parsed = {}
    for out in list(LONGEST_FIELDS) + list(RECENT_FIELDS):
        parsed[out] = split_value(out)

    cluster_ids = batch["label"].to_pylist()
    master_ids = [
        deterministic_master_id(e, p, c)
        for e, p, c in zip(parsed["master_email"], parsed["master_phone"], cluster_ids)
    ]
    cols["master_id"] = pa.array(master_ids, pa.string())
    for out in list(LONGEST_FIELDS) + list(RECENT_FIELDS):
        cols[out] = pa.array(parsed[out], pa.string())

    record_ids = [sorted(x) for x in batch["unique(doc_id)"].to_pylist()]
    cols["source_record_ids"] = pa.array(record_ids, pa.list_(pa.string()))
    cols["source_record_count"] = pa.array([len(x) for x in record_ids], pa.int64())
    cols["source_systems"] = pa.array(
        [sorted(set(x)) for x in batch["unique(source_system)"].to_pylist()],
        pa.list_(pa.string()),
    )
    import pyarrow.compute as pc
    cols["master_income"] = pc.cast(batch["max(_income)"], pa.int64())
    cols["first_seen"] = pc.cast(batch["min(_first_seen)"], pa.string())
    cols["last_activity"] = pc.cast(batch["max(_last_activity)"], pa.string())
    for out in FLAG_FIELDS:
        cols[out] = batch[f"max(_fl_{out})"]
    cols["confidence_score"] = pa.array([BATCH_CONFIDENCE] * n, pa.float64())
    cols["processing_path"] = pa.array([BATCH_PROCESSING_PATH] * n, pa.string())
    # batch-path entities land without an embedding (the reference's batch
    # migration omits the column, spanner_utils.py:408-416); the incremental
    # upsert sets it from the incoming record (streaming_processor.py:563-580).
    cols["embedding"] = pa.nulls(n, pa.list_(pa.float32()))
    return pa.table(cols)


SURVIVE_INPUT_COLUMNS = [
    "doc_id", "source_system", "full_name_clean", "email_clean", "phone_clean",
    "address_clean", "city_clean", "state_clean", "company", "customer_segment",
    "annual_income", "registration_date", "last_activity_date",
]


def empty_golden_table() -> pa.Table:
    fields = [("cluster_id", pa.string()), ("master_id", pa.string())]
    fields += [(c, pa.string()) for c in list(LONGEST_FIELDS) + list(RECENT_FIELDS)]
    fields += [
        ("source_record_ids", pa.list_(pa.string())),
        ("source_record_count", pa.int64()),
        ("source_systems", pa.list_(pa.string())),
        ("master_income", pa.int64()),
        ("first_seen", pa.string()),
        ("last_activity", pa.string()),
    ]
    fields += [(c, pa.int64()) for c in FLAG_FIELDS]
    fields += [
        ("confidence_score", pa.float64()),
        ("processing_path", pa.string()),
        ("embedding", pa.list_(pa.float32())),
    ]
    return pa.table({n: pa.array([], t) for n, t in fields})


def build_golden(features_ds, labels_ds=None, num_partitions: int = 16,
                 label_map: pa.Table | None = None):
    """features ⋈ labels → groupby(cluster).aggregate → golden records.

    ``label_map``: optional SPARSE non-identity (node, label) override table
    (``cluster.edge_map_from_scored`` / ``driver_cc`` output) — every doc not
    in the map is its own singleton cluster. Broadcast once; no labels
    Dataset is needed or executed at all."""
    import ray.data

    if features_ds.schema() is None:  # empty input
        return ray.data.from_arrow(empty_golden_table())
    # project to scalar columns: Arrow hash join rejects list-typed payloads
    cols = [c for c in SURVIVE_INPUT_COLUMNS if c in features_ds.schema().names]
    features_ds = features_ds.select_columns(cols)
    from .dsutil import copartition_join

    if label_map is not None:
        import ray
        import pyarrow.compute as pc

        lref = ray.put(
            (label_map["node"].combine_chunks(), label_map["label"].combine_chunks())
        )

        def attach_sparse(b: pa.Table) -> pa.Table:
            nodes, labs = ray.get(lref)
            doc = b["doc_id"].combine_chunks()
            if len(nodes) == 0:  # no merges at all: every doc is a singleton
                return b.append_column("label", doc)
            idx = pc.index_in(b["doc_id"], value_set=nodes)
            lab = pc.if_else(
                pc.is_valid(idx),
                labs.take(pc.fill_null(idx, 0)),
                doc,
            )
            return b.append_column("label", lab)

        joined = features_ds.map_batches(attach_sparse, batch_format="pyarrow")
    else:
        # Size-adaptive join (the classic broadcast-hash vs shuffle-join
        # switch): the label table is one (node, label) row per doc — when it
        # fits the broadcast cap (~500k rows ≈ 50 MB), ship it once via
        # ray.put and attach labels with a vectorized index_in per features
        # block, saving the whole doc_id exchange. Beyond the cap (production
        # scale) take the co-partitioned join.
        labels_mat = labels_ds.materialize()
        if labels_mat.count() <= 500_000:
            import ray

            from .cluster import _block_refs

            ltab = pa.concat_tables(
                [t for t in ray.get(_block_refs(labels_mat)) if t.num_rows],
                promote_options="default",
            ).combine_chunks()
            lref = ray.put((ltab["node"], ltab["label"]))

            def attach_label(b: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                nodes, labs = ray.get(lref)
                idx = pc.index_in(b["doc_id"], value_set=nodes)
                hit = pc.is_valid(idx)
                lab = labs.take(pc.fill_null(idx, 0))
                return b.append_column("label", lab).filter(hit)

            joined = features_ds.map_batches(attach_label, batch_format="pyarrow")
        else:
            joined = copartition_join(
                features_ds, labels_mat, on="doc_id", right_on="node",
                n=num_partitions,
            )
    ranked = joined.map_batches(_rank_columns, batch_format="pyarrow")
    # One int-hash exchange co-locates every cluster in one block, then a
    # single-threaded Acero (pyarrow C++) hash aggregate computes all 13
    # reductions in one pass per block. Ray's groupby().aggregate() with the
    # same aggregator list cost a near-fixed ~17 s at 4 CPUs on 48k rows —
    # one partial-merge round trip per aggregator; Acero does the whole list
    # in C++ at memory speed. Per-block == global because the exchange never
    # splits a label group.
    from .dsutil import hash_partition_by

    def acero_agg(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        t = batch.drop_columns(["_part"])
        specs = [("_rk_" + out, "max") for out in list(LONGEST_FIELDS) + list(RECENT_FIELDS)]
        specs += [("_fl_" + out, "max") for out in FLAG_FIELDS]
        specs += [
            ("_income", "max"), ("_first_seen", "min"), ("_last_activity", "max"),
            ("doc_id", "distinct"), ("source_system", "distinct"),
        ]
        g = t.group_by("label", use_threads=False).aggregate(specs)
        # rename to the Ray-aggregate convention _finalize expects
        ren = {f"{c}_{f}": (f"{f}(" + c + ")" if f != "distinct" else f"unique({c})")
               for c, f in specs}
        return g.rename_columns([ren.get(c, c) for c in g.column_names])

    agged = hash_partition_by(ranked, "label", n=num_partitions).map_batches(
        acero_agg, batch_size=None, batch_format="pyarrow"
    )
    return agged.map_batches(_finalize, batch_format="pyarrow")
