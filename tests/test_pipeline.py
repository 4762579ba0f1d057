"""End-to-end pipeline tests: F1 gate, span invariant, salting equivalence,
CC-vs-oracle, determinism, checkpoint resume (FIXTURES.md §6 invariants)."""

import os
import shutil

import pyarrow as pa
import pytest

from mdm_ray import pipeline, synth
from mdm_ray.blocking import build_blocked
from mdm_ray.config import EngineConfig
from mdm_ray.pairs import build_pairs
from mdm_ray.survivorship import deterministic_master_id


@pytest.fixture(scope="module")
def t1(ray_session):
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    docs = synth.generate_documents_ray(120, parallelism=4)
    out = pipeline.run_er(docs)
    out["golden"] = out["golden"].materialize()
    return out


def test_t1_pairwise_f1(t1):
    m = pipeline.pairwise_f1(t1["golden"], synth.true_positive_pairs(120))
    assert m["f1"] >= 0.99, m
    assert m["precision"] == 1.0


def test_t1_cluster_shape(t1):
    docs = synth.generate_documents_local(120).num_rows
    clusters = t1["golden"].count()
    # dedup: clusters strictly fewer than docs, at least one per customer seen
    assert clusters < docs
    total_members = sum(
        r["source_record_count"] for r in t1["golden"].iter_rows()
    )
    assert total_members == docs


def test_span_invariant(t1, ray_session):
    import ray.data

    docs_tbl = synth.generate_documents_local(120)
    resolved = pipeline.resolve_docs(
        ray.data.from_arrow(docs_tbl), t1["labels"], num_partitions=4
    )
    got = {r["doc_id"]: r["spans"] for r in resolved.iter_rows()}
    assert len(got) == docs_tbl.num_rows
    for doc_id, spans in zip(
        docs_tbl["doc_id"].to_pylist(), docs_tbl["spans"].to_pylist()
    ):
        out_spans = got[doc_id]
        assert [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in out_spans
        ] == [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans
        ], f"span sequence mutated for {doc_id}"


def test_blocking_recall(t1, ray_session):
    # >=99.9% of labeled positives must be co-blocked (FIXTURES.md §6.3)
    from mdm_ray.pipeline import build_features

    docs = synth.generate_documents_ray(120, parallelism=4)
    feats = build_features(docs, EngineConfig()).materialize()
    pairs = build_pairs(build_blocked(feats, EngineConfig()))
    got = {
        (r["1_doc_id"], r["2_doc_id"])
        for r in pairs.select_columns(["1_doc_id", "2_doc_id"]).iter_rows()
    }
    truth = synth.true_positive_pairs(120)
    recall = len(got & truth) / len(truth)
    assert recall >= 0.999, f"blocking recall {recall}"


def test_salting_pair_multiset_equality(ray_session):
    """Salted blocking must produce exactly the unsalted pair multiset."""
    from mdm_ray.pipeline import build_features

    docs = synth.generate_documents_ray(60, parallelism=2)
    feats = build_features(docs, EngineConfig(), with_embeddings=False).materialize()
    cfg_salt = EngineConfig(max_block_size=5)  # force heavy salting
    cfg_none = EngineConfig(max_block_size=10**9)
    ids = lambda ds: sorted(
        (r["1_doc_id"], r["2_doc_id"])
        for r in ds.select_columns(["1_doc_id", "2_doc_id"]).iter_rows()
    )
    salted = ids(build_pairs(build_blocked(feats, cfg_salt)))
    plain = ids(build_pairs(build_blocked(feats, cfg_none, skip_salting=True)))
    assert salted == plain
    assert len(salted) == len(set(salted)), "duplicate pairs emitted"


def test_cc_matches_union_find_oracle(t1, ray_session):
    edges = [
        (r["doc1_id"], r["doc2_id"])
        for r in t1["scored"].iter_rows()
        if r["match_decision"] in ("auto_merge", "human_review")
        and r["combined_score"] >= 0.6
    ]
    # local union-find oracle
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    all_docs = synth.generate_documents_local(120)["doc_id"].to_pylist()
    for d in all_docs:
        find(d)
    for a, b in edges:
        union(a, b)
    oracle = {d: find(d) for d in all_docs}
    got = {r["node"]: r["label"] for r in t1["labels"].iter_rows()}
    assert got == oracle


def test_driver_cc_equals_distributed_fixpoint(ray_session):
    """The small-graph driver fast path and the distributed delta-iteration
    fixpoint must label identically — including a 6-hop chain (the case the
    reference's 2-round SQL closure gets wrong) and string/min-label ties."""
    import ray.data

    from mdm_ray.cluster import connected_components, driver_cc, init_labels

    pairs = [
        ("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f"), ("f", "g"),
        ("x", "y"), ("m", "m2"),
    ]
    edges_tab = pa.table(
        {
            "src": pa.array([p[0] for p in pairs] + [p[1] for p in pairs]),
            "dst": pa.array([p[1] for p in pairs] + [p[0] for p in pairs]),
        }
    )
    nodes = sorted({n for p in pairs for n in p} | {"zz_lonely"})
    nodes_ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(nodes, pa.string())})
    )
    edges_ds = ray.data.from_arrow(edges_tab)
    fast = connected_components(
        edges_ds, init_labels(nodes_ds), EngineConfig()
    ).take_all()
    dist = connected_components(
        edges_ds, init_labels(nodes_ds), EngineConfig(cc_driver_edge_cap=0)
    ).take_all()
    as_map = lambda rows: {r["node"]: r["label"] for r in rows}
    expect = {n: "a" for n in "abcdefg"} | {
        "x": "x", "y": "x", "m": "m", "m2": "m", "zz_lonely": "zz_lonely"
    }
    assert as_map(fast) == as_map(dist) == expect
    # driver_cc alone returns only non-identity rows
    emap = driver_cc(edges_tab)
    assert {r["node"]: r["label"] for r in emap.to_pylist()} == {
        n: l for n, l in expect.items() if n != l
    }


def test_determinism_across_runs_and_parallelism(ray_session):
    def run(par):
        docs = synth.generate_documents_ray(80, parallelism=par)
        out = pipeline.run_er(docs)
        rows = sorted(
            (r["cluster_id"], r["master_id"], tuple(r["source_record_ids"]),
             r["master_name"], r["master_email"])
            for r in out["golden"].iter_rows()
        )
        return rows

    assert run(2) == run(5)


def test_checkpoint_resume_byte_identical(ray_session, tmp_path):
    import ray.data

    root = str(tmp_path / "ckpt")
    docs = synth.generate_documents_ray(60, parallelism=2)
    out1 = pipeline.run_er_checkpointed(docs, root)
    g1 = sorted(
        (r["cluster_id"], r["master_id"], tuple(r["source_record_ids"]))
        for r in out1["golden"].iter_rows()
    )
    assert not any(out1["resumed"].values())
    # kill-after-stage-k: drop the golden checkpoint, rerun — earlier stages reuse
    shutil.rmtree(os.path.join(root, "golden"))
    out2 = pipeline.run_er_checkpointed(docs, root)
    assert out2["resumed"]["features"] and out2["resumed"]["scored"] and out2["resumed"]["labels"]
    assert not out2["resumed"]["golden"]
    g2 = sorted(
        (r["cluster_id"], r["master_id"], tuple(r["source_record_ids"]))
        for r in out2["golden"].iter_rows()
    )
    assert g1 == g2
    # config change invalidates checkpoints
    out3 = pipeline.run_er_checkpointed(docs, root, EngineConfig(max_block_size=123))
    assert not out3["resumed"]["features"]


def test_master_id_formula(t1):
    import hashlib

    for r in t1["golden"].take(50):
        if r["master_email"]:
            exp = hashlib.sha256(f"email:{r['master_email']}".encode()).hexdigest()[:36]
        elif r["master_phone"]:
            exp = hashlib.sha256(f"phone:{r['master_phone']}".encode()).hexdigest()[:36]
        else:
            exp = r["cluster_id"]
        assert r["master_id"] == exp
    assert deterministic_master_id("a@b.c", None, "x") == deterministic_master_id("a@b.c", "999", "y")


def test_fused_scored_equals_two_phase(ray_session):
    """build_scored (streaming emit+score, retain off) must score exactly the
    pair multiset that build_pairs emits — guards the fused production path
    against dedup/partitioning regressions."""
    from mdm_ray.pairs import build_scored
    from mdm_ray.scoring import retain_scored, score_pairs

    cfg = EngineConfig()
    docs = synth.generate_documents_ray(150, parallelism=4)
    feats = pipeline.build_features(docs, cfg, with_embeddings=False).materialize()
    blocked = build_blocked(feats, cfg).materialize()

    fused = build_scored(blocked, cfg, retain_filter=False).materialize()
    two_phase = score_pairs(build_pairs(blocked), cfg, retain_filter=False).materialize()

    a = fused.to_pandas().sort_values(["doc1_id", "doc2_id"]).reset_index(drop=True)
    b = two_phase.to_pandas().sort_values(["doc1_id", "doc2_id"]).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])
    # retain filter composes identically
    assert retain_scored(fused).count() == score_pairs(
        build_pairs(blocked), cfg, retain_filter=True
    ).count()


def test_hash_partition_group_completeness(ray_session):
    """_partition_by_key must land every block_key group whole in one block
    (the invariant pair emission relies on)."""
    from mdm_ray.pairs import _partition_by_key

    cfg = EngineConfig()
    docs = synth.generate_documents_ray(200, parallelism=4)
    feats = pipeline.build_features(docs, cfg, with_embeddings=False).materialize()
    blocked = build_blocked(feats, cfg).materialize()

    part = _partition_by_key(blocked).materialize()
    import ray

    seen: dict[str, int] = {}
    for bi, ref in enumerate(part.get_internal_block_refs()):
        blk = ray.get(ref)
        if "block_key" not in blk.schema.names:
            assert blk.num_rows == 0  # empty sort partitions are schema-less
            continue
        for k in set(blk["block_key"].to_pylist()):
            assert seen.setdefault(k, bi) == bi, f"group {k} split across blocks"


def test_golden_record_full_field_parity(t1):
    """A5 parity fields (bigquery_utils.py:742-757 + spanner_utils.py:226-247):
    master_income = MAX(annual_income), first_seen = MIN(registration_date),
    last_activity = MAX(last_activity_date), batch confidence/path constants."""
    rows = t1["golden"].take_all()
    assert rows
    for r in rows:
        member_idx = {synth.doc_customer_idx(d) for d in r["source_record_ids"]}
        extras = [synth.base_customer(i) for i in member_idx]
        assert r["master_income"] == max(int(e["annual_income"]) for e in extras)
        assert r["first_seen"] == min(e["registration_date"] for e in extras)
        assert r["last_activity"] == max(e["last_activity_date"] for e in extras)
        assert r["confidence_score"] == 0.95
        assert r["processing_path"] == "batch_migrated"
        assert r["embedding"] is None  # batch migration omits it


def test_retain_prefilter_output_identical():
    """The cheap-leg upper-bound prefilter (scoring.py) must leave the
    retained pair set and every score column byte-identical to full scoring
    followed by the retain filter, in both weight profiles."""
    import numpy as np
    import pyarrow.compute as pc

    import mdm_ray.config as C
    from mdm_ray import synth
    from mdm_ray.blocking import prep_scoring_columns
    from mdm_ray.config import EngineConfig
    from mdm_ray.embed import HashingEmbedder
    from mdm_ray.features import featurize_batch
    from mdm_ray.scoring import score_pairs_batch

    feats = HashingEmbedder(64)(
        prep_scoring_columns(featurize_batch(synth.generate_documents_local(600)))
    )
    rng = np.random.default_rng(1)
    ii = rng.integers(0, feats.num_rows, 20000)
    jj = rng.integers(0, feats.num_rows, 20000)
    cols = {}
    for f in feats.column_names:
        if f in ("spans", "media_refs"):
            continue
        cols["1_" + f] = feats[f].take(pa.array(ii, pa.int64()))
        cols["2_" + f] = feats[f].take(pa.array(jj, pa.int64()))
    batch = pa.table(cols)
    for profile in ("4way", "5way"):
        cfg = EngineConfig(weight_profile=profile)
        fast = score_pairs_batch(batch, cfg, True)
        slow_all = score_pairs_batch(batch, cfg, False)
        slow = slow_all.filter(
            pc.greater(slow_all["combined_score"], C.RETAIN_THRESHOLD)
        )
        assert fast.num_rows == slow.num_rows
        for col in fast.column_names:
            assert fast[col].to_pylist() == slow[col].to_pylist(), (profile, col)


def test_er_fixture_snapshots(ray_session):
    """Snapshot oracle for the ER-fixture trio: the synthesized corpus and
    every pipeline stage are deterministic by construction, so each query's
    output must exactly equal the committed parquet snapshot (regenerate with
    tools/make_er_snapshots.py after an intentional semantic change)."""
    import os

    import pandas as pd

    from mdm_ray.queries import QUERIES
    from tools.make_er_snapshots import SF_DIR, SNAP_DIR, SNAP_QUERIES, canonical

    for name in SNAP_QUERIES:
        expect = pd.read_parquet(os.path.join(SNAP_DIR, f"{name}_sf0001.parquet"))
        got = canonical(QUERIES[name](SF_DIR).to_pandas())
        pd.testing.assert_frame_equal(got, expect, check_exact=True, obj=name)


def test_zero_merge_singletons(ray_session):
    """No pair crosses the merge threshold ⇒ the driver-CC fast path hands an
    EMPTY non-identity label map to survivorship. attach_sparse /
    apply_label_map must fall back to identity labels instead of take()-ing
    into a zero-length label array (ArrowIndexError regression, round 5 —
    the sf0.001 driver-contract fixture hits exactly this)."""
    import ray.data

    cfg = EngineConfig()
    docs = synth.generate_documents_ray(30, parallelism=2)
    feats, _census, _rows = pipeline.featurize_and_census(docs, cfg)
    n_docs = feats.count()
    empty_scored = ray.data.from_arrow(
        pa.table({"doc1_id": pa.array([], pa.string()),
                  "doc2_id": pa.array([], pa.string())})
    ).materialize()
    labels, golden = pipeline.cluster_and_survive(feats, empty_scored, cfg)
    lab = labels.to_pandas()
    assert (lab["node"] == lab["label"]).all()
    assert golden.materialize().count() == n_docs


def test_entry_driver_contract(ray_session):
    """Driver smoke-check twin: __ray_entry__.entry() must run under an
    already-initialised Ray session (no ray.init inside) and yield ≥0 rows
    with a stable schema — the surface the driver exercises every round."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as e

    df = e.entry().to_pandas()
    assert len(df) >= 0 and "cluster_id" in df.columns and "master_id" in df.columns
