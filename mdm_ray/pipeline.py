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
    feats = featurize(docs_ds)
    feats = feats.map_batches(prep_scoring_columns, batch_format="pyarrow")
    if with_embeddings:
        feats = add_embeddings(feats, dim=cfg.embedding_dim)
    return feats


def run_er(docs_ds, cfg: EngineConfig = DEFAULT_CONFIG, with_embeddings: bool = True):
    """Full pipeline; returns dict of the key stage Datasets (lazy where
    possible — scored/golden are consumed by the caller)."""
    feats = build_features(docs_ds, cfg, with_embeddings).materialize()
    blocked = build_blocked(feats, cfg)
    pairs = build_pairs(blocked)
    scored = score_pairs(pairs, cfg).materialize()
    edges = build_edges(scored)
    labels = connected_components(edges, init_labels(feats), cfg)
    golden = build_golden(feats, labels, num_partitions=cfg.cc_num_partitions)
    return {
        "features": feats,
        "scored": scored,
        "labels": labels,
        "golden": golden,
    }


def resolve_docs(docs_ds, labels_ds, num_partitions: int = 16):
    """Input docs + cluster assignment, spans untouched (span invariant)."""
    return docs_ds.join(
        labels_ds,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("doc_id",),
        right_on=("node",),
    )


def pairwise_f1(golden_ds, true_pairs: set[tuple[str, str]]) -> dict:
    """Exact pairwise precision/recall/F1 of predicted clusters vs truth."""
    predicted: set[tuple[str, str]] = set()
    for row in golden_ds.select_columns(["source_record_ids"]).iter_rows():
        ids = sorted(row["source_record_ids"])
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
