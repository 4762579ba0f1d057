"""User-extension surface (SURVEY.md §2.10): pluggable MatchStrategy objects
registered via EngineConfig(extra_strategies=...) — extra blocking keys feed
the standard salted exchange, extra scores join the ensemble after the
built-in legs, and the retain prefilters stay sound (weight×1 budget).

The example strategies live in mdm_ray.strategies (they must be importable
on Ray workers, so they cannot be defined in this test module)."""

from mdm_ray import pipeline, synth
from mdm_ray.config import EngineConfig
from mdm_ray.strategies import (
    MatchStrategy,
    NoopStrategy,
    SaltCollidingStrategy,
    SegmentExactStrategy,
)


def test_protocol_conformance():
    assert isinstance(SegmentExactStrategy(), MatchStrategy)
    assert isinstance(NoopStrategy(), MatchStrategy)


def test_noop_strategy_keeps_scores_and_clusters(ray_session):
    """A zero-scoring strategy must not change any combined score or the
    cluster structure, even though its weight loosens the retain bounds."""
    docs = synth.generate_documents_ray(80, parallelism=2)
    base = pipeline.run_er(docs, EngineConfig())
    docs2 = synth.generate_documents_ray(80, parallelism=2)
    ext = pipeline.run_er(docs2, EngineConfig(extra_strategies=(NoopStrategy(),)))

    def score_map(out):
        t = out["scored"].select_columns(
            ["doc1_id", "doc2_id", "combined_score"]
        ).to_pandas()
        return {(r.doc1_id, r.doc2_id): r.combined_score for r in t.itertuples()}

    assert score_map(base) == score_map(ext)
    assert base["golden"].count() == ext["golden"].count()
    # the extra score column is present (all zeros) on the extended run
    assert "noop_score" in ext["scored"].schema().names


def test_salt_namespace_keys_are_escaped(ray_session):
    """A strategy key shaped like the reserved ``…#<int>_<int>`` salt suffix
    must behave as a plain blocking key: identical pair output to an
    equal-weight twin strategy whose key partitions rows the same way but
    does not collide (corpora identical by construction — content-seeded
    generator). Without escaping, the colliding run chunk-filters those
    groups (dropping pairs) or TypeErrors on the missing chunk column."""
    docs = synth.generate_documents_ray(80, parallelism=2)
    seg = pipeline.run_er(
        docs, EngineConfig(extra_strategies=(SaltCollidingStrategy(colliding=False),))
    )
    docs2 = synth.generate_documents_ray(80, parallelism=2)
    salt = pipeline.run_er(
        docs2, EngineConfig(extra_strategies=(SaltCollidingStrategy(colliding=True),))
    )

    def pair_set(out):
        t = out["scored"].select_columns(["doc1_id", "doc2_id"]).to_pandas()
        return {(r.doc1_id, r.doc2_id) for r in t.itertuples()}

    # x_tag:<seg>#1_2 escapes to a plain key partitioning rows identically to
    # x_seg:<seg> — the candidate-pair sets must be equal
    assert pair_set(salt) == pair_set(seg)


def test_scoring_strategy_shifts_combined_scores(ray_session):
    docs = synth.generate_documents_ray(80, parallelism=2)
    base = pipeline.run_er(docs, EngineConfig())
    docs2 = synth.generate_documents_ray(80, parallelism=2)
    strat = SegmentExactStrategy()
    ext = pipeline.run_er(docs2, EngineConfig(extra_strategies=(strat,)))

    bt = base["scored"].select_columns(["doc1_id", "doc2_id", "combined_score"]).to_pandas()
    et = ext["scored"].select_columns(
        ["doc1_id", "doc2_id", "combined_score", "segment_score"]
    ).to_pandas()
    bmap = {(r.doc1_id, r.doc2_id): r.combined_score for r in bt.itertuples()}
    # every pair retained in BOTH runs: combined == base + weight*segment
    checked = 0
    for r in et.itertuples():
        key = (r.doc1_id, r.doc2_id)
        if key in bmap:
            assert abs(r.combined_score - (bmap[key] + strat.weight * r.segment_score)) < 1e-12
            checked += 1
    assert checked > 0
    # at least one pair actually got a nonzero segment score
    assert (et["segment_score"] > 0).any()
