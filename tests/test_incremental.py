"""Incremental (streaming-twin) merge tests — SURVEY.md §2.9 semantics.

Fixture: batch ER over a base corpus, then an incremental batch of stream
records (80% brand-new customers / 20% drift-varied existing, mirroring the
streaming notebook cell 14) merged via ``incremental.incremental_merge``.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from mdm_ray import incremental, pipeline, synth

BASE_N = 40
STREAM_N = 30


@pytest.fixture(scope="module")
def merged(ray_session):
    import ray.data

    docs = ray.data.from_arrow(synth.generate_documents_local(BASE_N))
    base = pipeline.run_er(docs, with_embeddings=False)
    golden = base["golden"].materialize()

    stream_tbl = synth.generate_stream_docs(BASE_N, STREAM_N)
    out = incremental.incremental_merge(
        ray.data.from_arrow(stream_tbl), golden
    )
    final = out["golden"].materialize()
    return {
        "golden_before": golden,
        "stream_tbl": stream_tbl,
        "out": out,
        "final": final,
        "results": out["match_results"].to_pandas(),
        "staged": out["staged"].to_pandas(),
    }


def _lineage(golden_ds) -> dict[str, str]:
    owner: dict[str, str] = {}
    for row in golden_ds.select_columns(
        ["cluster_id", "source_record_ids"]
    ).iter_rows():
        for d in row["source_record_ids"]:
            assert d not in owner, f"doc {d} appears in two entities"
            owner[d] = row["cluster_id"]
    return owner


def test_every_record_in_exactly_one_entity(merged):
    owner = _lineage(merged["final"])
    stream_ids = merged["stream_tbl"]["doc_id"].to_pylist()
    for d in stream_ids:
        assert d in owner
    # base docs still all present
    before = _lineage(merged["golden_before"])
    for d in before:
        assert d in owner


def test_record_count_conserved(merged):
    total = sum(
        r["source_record_count"]
        for r in merged["final"].select_columns(["source_record_count"]).iter_rows()
    )
    n_base = sum(
        r["source_record_count"]
        for r in merged["golden_before"].select_columns(["source_record_count"]).iter_rows()
    )
    assert total == n_base + merged["stream_tbl"].num_rows


def test_drift_records_merge_into_correct_entity(merged):
    """Drift records of customers present in the base corpus must land in the
    entity holding that customer's base docs — and never in a wrong one."""
    owner = _lineage(merged["final"])
    before = _lineage(merged["golden_before"])
    base_entity_by_customer: dict[int, set[str]] = {}
    for d, e in before.items():
        base_entity_by_customer.setdefault(synth.doc_customer_idx(d), set()).add(e)

    checked = hits = 0
    for d in merged["stream_tbl"]["doc_id"].to_pylist():
        idx, is_new = synth.stream_doc_customer_idx(d)
        if is_new or idx not in base_entity_by_customer:
            continue
        checked += 1
        if owner[d] in base_entity_by_customer[idx]:
            hits += 1
        else:
            # never merged into an entity belonging to a DIFFERENT customer
            wrong = {
                synth.doc_customer_idx(x)
                for x, e in before.items()
                if e == owner[d]
            }
            assert not wrong or idx in wrong, (d, owner[d], wrong)
    assert checked > 0
    assert hits / checked >= 0.8, f"drift merge recall {hits}/{checked}"


def test_new_customers_become_new_entities(merged):
    owner = _lineage(merged["final"])
    before_entities = {
        r["cluster_id"]
        for r in merged["golden_before"].select_columns(["cluster_id"]).iter_rows()
    }
    news = [
        d for d in merged["stream_tbl"]["doc_id"].to_pylist()
        if synth.stream_doc_customer_idx(d)[1]
    ]
    assert news
    in_new = sum(1 for d in news if owner[d] not in before_entities)
    assert in_new / len(news) >= 0.9, f"{in_new}/{len(news)} new records created entities"


def test_match_results_cover_all_stream_records(merged):
    res = merged["results"]
    assert sorted(res["doc_id"]) == sorted(merged["stream_tbl"]["doc_id"].to_pylist())
    assert set(res["action"]) <= {"auto_merge", "human_review", "new_entity"}
    merged_rows = res[res["action"] != "new_entity"]
    assert (merged_rows["combined_score"] >= 0.6).all()


def test_staged_rows_are_new_entities(merged):
    staged = merged["staged"]
    n_new_entities = merged["final"].count() - merged["golden_before"].count() + \
        num_absorbed_entities(merged)
    assert len(staged) == n_new_entities
    assert (~staged["processed"]).all()
    import json

    payload = json.loads(staged["golden_record_data"].iloc[0])
    assert "master_name" in payload and "source_record_ids" in payload


def num_absorbed_entities(merged) -> int:
    # incremental merge never deletes entities; count difference == new ones
    return 0


def test_updated_entities_apply_new_values(merged):
    """A7 new-wins-if-non-null: a merged entity's lineage grew and its count
    matches the lineage length."""
    before = {
        r["cluster_id"]: r["source_record_count"]
        for r in merged["golden_before"].select_columns(
            ["cluster_id", "source_record_count"]
        ).iter_rows()
    }
    grew = 0
    for r in merged["final"].select_columns(
        ["cluster_id", "source_record_count", "source_record_ids"]
    ).iter_rows():
        assert r["source_record_count"] == len(r["source_record_ids"])
        if r["cluster_id"] in before and r["source_record_count"] > before[r["cluster_id"]]:
            grew += 1
    assert grew > 0


def test_incremental_determinism(merged, ray_session):
    """Same merge re-run → identical golden bytes (content-seeded, no wall
    clock anywhere)."""
    import ray.data

    out2 = incremental.incremental_merge(
        ray.data.from_arrow(merged["stream_tbl"]), merged["golden_before"]
    )
    a = merged["final"].to_pandas().sort_values("cluster_id").reset_index(drop=True)
    b = out2["golden"].to_pandas().sort_values("cluster_id").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(
        a[sorted(a.columns)], b[sorted(b.columns)], check_dtype=False
    )


def test_processing_path_and_confidence(merged):
    """Updated entities: path='stream_updated', embedding = incoming record's
    (streaming_processor.py:563-580); new entities: path='stream',
    confidence=0.8 (:630-631); untouched entities keep batch constants."""
    before = {r["cluster_id"] for r in
              merged["golden_before"].select_columns(["cluster_id"]).iter_rows()}
    touched = set(merged["out"]["assignments"].to_pandas()["cluster_id"])
    saw_updated = saw_new = False
    for r in merged["final"].iter_rows():
        cid = r["cluster_id"]
        if cid in touched:
            assert r["processing_path"] == "stream_updated"
            saw_updated = True
        elif cid in before:
            assert r["processing_path"] == "batch_migrated"
            assert r["confidence_score"] == 0.95
        else:
            assert r["processing_path"] == "stream"
            assert r["confidence_score"] == 0.8
            saw_new = True
    assert saw_updated and saw_new
