"""End-to-end ER pipeline assembly (+ checkpoint/resume in storage.py).

Stage chain (the Ray-native analogue of the reference's table chain
``raw_* → customers_standardized → customers_with_embeddings → *_matches →
*_combined_matches → golden_records``, ``batch_mdm_gcp/mdm_batch_processing.ipynb``):

docs → featurize (span parse + standardize) → prep scoring cols → embed
(actor pool) → blocking keys (+salting) → within-block pair gen → score →
edges → connected components (iterative) → survivorship → golden
(+ resolved docs carrying the untouched span sequences).
"""

from __future__ import annotations

import pyarrow as pa

from .blocking import build_blocked, prep_scoring_columns
from .cluster import build_edges, connected_components, init_labels
from .config import EngineConfig, DEFAULT_CONFIG
from .embed import add_embeddings
from .features import featurize
from .pairs import build_pairs
from .scoring import score_pairs
from .survivorship import build_golden


def build_features(docs_ds, cfg: EngineConfig = DEFAULT_CONFIG, with_embeddings: bool = True):
    from .blocking import attach_block_keys
    from .dsutil import ensure_context

    ensure_context()
    feats = featurize(docs_ds)
    feats = feats.map_batches(prep_scoring_columns, batch_format="pyarrow")
    if with_embeddings:
        feats = add_embeddings(feats, dim=cfg.embedding_dim)
    # per-doc block keys computed here (once, before the caller's materialize)
    # so the hot-key census and the per-key explode both read stored lists
    return attach_block_keys(feats, cfg)


def featurize_and_census(docs_ds, cfg: EngineConfig = DEFAULT_CONFIG,
                         with_embeddings: bool = True):
    """Featurize with the hot-key census SKETCH pass overlapping the
    materialize barrier (``blocking.materialize_with_census``): each feature
    block's sketch task launches as the block lands. One census serves
    salting (keys > cap), work-balanced exchange placement (keys > cap/4 get
    LPT partition assignments in ``build_scored``), and the exploded-row
    count that sizes the pair-exchange fan-out."""
    feats_lazy = build_features(docs_ds, cfg, with_embeddings)
    from .blocking import materialize_with_census

    return materialize_with_census(
        feats_lazy, cfg.max_block_size, floor=max(2, cfg.max_block_size // 4)
    )


def cluster_and_survive(feats, scored_mat, cfg: EngineConfig = DEFAULT_CONFIG):
    """Materialized scored pairs → (labels, golden).

    Fast path (edge set ≤ ``cfg.cc_driver_edge_cap``): edges extract as raw
    tasks over the scored block refs, the min-label fixpoint runs driver-side
    (``cluster.driver_cc``), and the sparse label map broadcasts straight
    into survivorship — the whole cluster stage costs ZERO extra Dataset
    executions (labels stays lazy; golden is one execution). Over the cap the
    distributed delta-iteration fixpoint runs unchanged."""
    from .cluster import apply_label_map, edge_map_from_scored

    emap = edge_map_from_scored(scored_mat, cfg)
    if emap is not None:
        labels = apply_label_map(init_labels(feats), emap)
        golden = build_golden(
            feats, num_partitions=cfg.cc_num_partitions, label_map=emap
        )
    else:
        labels = connected_components(
            build_edges(scored_mat), init_labels(feats), cfg
        )
        golden = build_golden(feats, labels, num_partitions=cfg.cc_num_partitions)
    return labels, golden


def run_er(docs_ds, cfg: EngineConfig = DEFAULT_CONFIG, with_embeddings: bool = True):
    """Full pipeline; returns dict of the key stage Datasets (lazy where
    possible — scored/golden are consumed by the caller)."""
    from .pairs import build_scored

    feats, census, blocked_rows = featurize_and_census(docs_ds, cfg, with_embeddings)
    blocked = build_blocked(feats, cfg, census=census)
    scored = build_scored(blocked, cfg, census=census, rows=blocked_rows).materialize()
    labels, golden = cluster_and_survive(feats, scored, cfg)
    return {
        "features": feats,
        "scored": scored,
        "labels": labels,
        "golden": golden,
    }


def run_er_checkpointed(docs_ds, ckpt_root: str | None,
                        cfg: EngineConfig = DEFAULT_CONFIG,
                        with_embeddings: bool = True,
                        stop_after: str | None = None) -> dict:
    """Resume-aware pipeline: each stage lands as a checkpoint table with a
    lineage sidecar; a rerun skips stages whose checkpoint is complete and
    config-compatible (the reference's CREATE OR REPLACE TABLE chain,
    re-expressed — SURVEY.md §3.1).

    ``stop_after``: return right after the named stage's checkpoint lands
    (kill/resume drills — ``tools/kill_resume_check.py`` SIGKILLs the process
    there and verifies a fresh process resumes to byte-identical golden)."""
    from . import storage

    ch = storage.config_hash(
        {"weights": cfg.weights, "lsh": [cfg.lsh_num_perm, cfg.lsh_bands, cfg.lsh_shingle_k],
         "cap": cfg.max_block_size, "jw": cfg.use_jaro_winkler, "dim": cfg.embedding_dim,
         "extras": [[s.name, s.weight] for s in getattr(cfg, "extra_strategies", ())]}
    )
    resumed = {}

    feats, resumed["features"] = storage.stage_or_compute(
        ckpt_root, "features", ch,
        lambda: build_features(docs_ds, cfg, with_embeddings).materialize(),
    )
    if stop_after == "features":
        return {"features": feats, "resumed": resumed}
    from .blocking import hot_key_census
    from .pairs import build_scored

    def _compute_scored():
        census, blocked_rows = hot_key_census(
            feats, cfg.max_block_size, floor=max(2, cfg.max_block_size // 4)
        )
        return build_scored(
            build_blocked(feats, cfg, census=census), cfg, census=census,
            rows=blocked_rows,
        ).materialize()

    scored, resumed["scored"] = storage.stage_or_compute(
        ckpt_root, "scored", ch,
        lambda: _compute_scored(),
        input_stage="features",
        metrics_fn=lambda ds: {"pairs_retained": ds.count()},
    )
    if stop_after == "scored":
        return {"features": feats, "scored": scored, "resumed": resumed}
    labels, resumed["labels"] = storage.stage_or_compute(
        ckpt_root, "labels", ch,
        lambda: connected_components(build_edges(scored), init_labels(feats), cfg),
        input_stage="scored",
    )
    golden, resumed["golden"] = storage.stage_or_compute(
        ckpt_root, "golden", ch,
        lambda: build_golden(feats, labels, num_partitions=cfg.cc_num_partitions),
        input_stage="labels",
        metrics_fn=lambda ds: {"clusters": ds.count()},
    )
    return {
        "features": feats,
        "scored": scored,
        "labels": labels,
        "golden": golden,
        "resumed": resumed,
    }


def resolve_docs(docs_ds, labels_ds, num_partitions: int = 16):
    """Input docs + cluster assignment, spans untouched (span invariant).

    Implemented as a sort-cogroup merge (not Dataset.join) because Arrow hash
    joins reject list-typed payload columns like ``spans``; Ray's sort
    range-partitions by value, so all rows of one doc_id co-locate in a block.
    """

    def tag_docs(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "spans": b["spans"],
                "entity_id": pa.nulls(b.num_rows, pa.string()),
                "is_doc": pa.array([1] * b.num_rows, pa.int8()),
            }
        )

    sch = docs_ds.schema()
    span_type = sch.types[sch.names.index("spans")]

    def tag_labels(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b["node"],
                "spans": pa.nulls(b.num_rows, span_type),
                "entity_id": b["label"],
                "is_doc": pa.array([0] * b.num_rows, pa.int8()),
            }
        )

    _empty = pa.table(
        {
            "doc_id": pa.array([], pa.string()),
            "spans": pa.array([], span_type),
            "entity_id": pa.array([], pa.string()),
        }
    )

    def merge(b: pa.Table) -> pa.Table:
        # vectorized side-split + index_in/take label lookup (the sort
        # co-located each doc_id's doc row with its label row) — no per-row
        # Python on this doc-carrying path
        if b.num_rows == 0 or "is_doc" not in b.column_names:
            return _empty
        import pyarrow.compute as pc

        is_doc = pc.equal(b["is_doc"], 1)
        docs = b.filter(is_doc)
        labels = b.filter(pc.invert(is_doc))
        idx = pc.index_in(
            docs["doc_id"], value_set=labels["doc_id"].combine_chunks()
        )
        ent_col = labels["entity_id"].combine_chunks().take(idx)
        return pa.table(
            {"doc_id": docs["doc_id"], "spans": docs["spans"], "entity_id": ent_col}
        )

    union = docs_ds.map_batches(tag_docs, batch_format="pyarrow").union(
        labels_ds.map_batches(tag_labels, batch_format="pyarrow")
    )
    return union.sort("doc_id").map_batches(
        merge, batch_size=None, batch_format="pyarrow"
    )


_PAIRWISE_F1_MAX_PAIRS = 50_000_000


def pairwise_f1(golden_ds, true_pairs: set[tuple[str, str]]) -> dict:
    """Exact pairwise precision/recall/F1 of predicted clusters vs truth.

    TEST-SCALE ONLY: both the predicted-pair set and ``true_pairs`` are
    driver-side Python sets (the labeled fixtures are small by construction).
    A production-size golden table must never route through here — the guard
    below refuses once the implied pair count passes ~50M rather than
    silently OOMing the driver."""
    predicted: set[tuple[str, str]] = set()
    implied = 0
    for row in golden_ds.select_columns(["source_record_ids"]).iter_rows():
        ids = sorted(row["source_record_ids"])
        implied += len(ids) * (len(ids) - 1) // 2
        if implied > _PAIRWISE_F1_MAX_PAIRS:
            raise ValueError(
                "pairwise_f1 is a test-scale gate (driver-side pair sets); "
                f"input implies > {_PAIRWISE_F1_MAX_PAIRS} pairs"
            )
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                predicted.add((ids[i], ids[j]))
    tp = len(predicted & true_pairs)
    p = tp / len(predicted) if predicted else 0.0
    r = tp / len(true_pairs) if true_pairs else 0.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    return {
        "precision": p,
        "recall": r,
        "f1": f1,
        "predicted_pairs": len(predicted),
        "true_pairs": len(true_pairs),
        "tp": tp,
    }
