"""Engine configuration constants.

The ensemble weights / thresholds mirror the reference exactly:

* 5-way batch weights .30/.25/.20/.15/.10 — ``batch_mdm_gcp/bigquery_utils.py:595-604``
* 4-way streaming weights .33/.28/.22/.17 — ``streaming_mdm_gcp/streaming_processor.py:25-31``
  (the profile we default to: the AI leg is a non-reproducible remote LLM in the
  reference, so the renormalized 4-way profile is the deterministic default; the
  5-way profile is selectable with a deterministic surrogate AI scorer).
* decision thresholds 0.8 auto_merge / 0.6 human_review, retain > 0.3 —
  ``bigquery_utils.py:620-635``; clustering edge threshold 0.6 —
  ``bigquery_utils.py:645-653``.
"""

from __future__ import annotations

from dataclasses import dataclass, field


# ---- ensemble weight profiles -------------------------------------------------

WEIGHTS_5WAY = {
    "exact": 0.30,
    "fuzzy": 0.25,
    "vector": 0.20,
    "business": 0.15,
    "ai": 0.10,
}

WEIGHTS_4WAY = {
    "exact": 0.33,
    "fuzzy": 0.28,
    "vector": 0.22,
    "business": 0.17,
    "ai": 0.0,
}

AUTO_MERGE_THRESHOLD = 0.8     # bigquery_utils.py:622
HUMAN_REVIEW_THRESHOLD = 0.6   # bigquery_utils.py:623
RETAIN_THRESHOLD = 0.3         # bigquery_utils.py:634
CLUSTER_EDGE_THRESHOLD = 0.6   # bigquery_utils.py:652

# Fuzzy pair retention: any of the 4 fuzzy scores > 0.5 (bigquery_utils.py:401-402)
FUZZY_RETAIN_THRESHOLD = 0.5
# Vector pair retention: cosine distance < 0.3 i.e. similarity > 0.7 (bigquery_utils.py:424)
VECTOR_SIM_THRESHOLD = 0.7
# Soundex-equal fixed score (bigquery_utils.py:361-366)
SOUNDEX_EQUAL_SCORE = 0.8

# Business-rule scores (bigquery_utils.py:438-470)
SAME_COMPANY_SCORE = 0.3
SAME_LOCATION_SCORE = 0.2
AGE_365_SCORE = 0.4
AGE_1825_SCORE = 0.2
INCOME_RATIO_MIN = 0.8
INCOME_SCORE = 0.1


@dataclass
class EngineConfig:
    """Tunable knobs for the ER pipeline."""

    # weight profile: "4way" (default, fully deterministic) or "5way"
    weight_profile: str = "4way"
    weights: dict = field(default_factory=lambda: dict(WEIGHTS_4WAY))

    # scoring extensions
    use_jaro_winkler: bool = True   # north-star addition to the fuzzy name max
    # Reference parity flag (bigquery_utils.py:324-328): exact-match on the
    # generator-provided customer_id. Off by default — on the synthetic
    # fixture that column IS the ground truth, so scoring on it would be
    # leakage; a no-op when the input carries no customer_id column.
    use_customer_id_exact: bool = False
    # User-extension surface (SURVEY.md §2.10): extra MatchStrategy objects
    # (see mdm_ray.strategies). Each contributes optional blocking keys and a
    # weighted [0,1] pair score summed AFTER the built-in legs; the retain
    # prefilters budget weight×1 per strategy so pruning stays sound.
    extra_strategies: tuple = ()

    # blocking
    lsh_num_perm: int = 64
    lsh_bands: int = 16           # 16 bands x 4 rows
    lsh_shingle_k: int = 3
    max_block_size: int = 200     # salting cap: blocks larger than this are split
    use_metaphone_key: bool = True
    use_media_ref_key: bool = True

    # embeddings
    embedding_dim: int = 64

    # scoring / execution
    pair_batch_size: int = 4096
    score_batch_size: int = 8192

    # clustering
    max_cc_iterations: int = 50
    cc_num_partitions: int = 16
    # Delta-propagation switch: when an iteration changes fewer labels than
    # this cap, the next iteration broadcasts the changed (node, label) set
    # (ray.put) and applies it with two cheap map passes instead of the full
    # join + sort exchange. Bounded driver memory (cap × ~100 B ≈ 50 MB —
    # the standard broadcast-small-side bound; rows move as Arrow blocks,
    # never Python dicts); larger frontiers keep the distributed path. ER
    # duplicate graphs change ~60% of nodes in the first pass and almost
    # nothing after, so with this cap every iteration past the first full
    # exchange rides the broadcast path; each costs ~0.5 s instead of a
    # multi-second shuffle round.
    cc_frontier_broadcast_cap: int = 500_000
    # Small-graph fast path (the broadcast-join analogue for clustering):
    # when the THRESHOLDED edge set fits under this cap, collect it to the
    # driver (Arrow blocks, dictionary-encoded — ~40 MB at the cap) and run
    # the min-label fixpoint as vectorized numpy pointer-jumping, then
    # broadcast the sparse non-identity (node, label) map back. Exact same
    # fixpoint, zero Dataset iterations. ER edge sets after the 0.6
    # threshold are ~1% of candidate pairs, so even the 485k-doc / 320M-pair
    # fixture stays under the cap; true 10^12-doc scale exceeds it and takes
    # the distributed delta-iteration path.
    cc_driver_edge_cap: int = 5_000_000

    def __post_init__(self) -> None:
        if self.weight_profile == "5way":
            self.weights = dict(WEIGHTS_5WAY)
        elif self.weight_profile == "4way":
            self.weights = dict(WEIGHTS_4WAY)


DEFAULT_CONFIG = EngineConfig()
