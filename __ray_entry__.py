"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship ER pipeline end-to-end: it reads
``/root/testdata/sf0.001/documents.parquet``, adapts each row into the
interleaved-span input shape (the engine's native input per BASELINE.json
``input_hint``), runs standardize → blocking → pair scoring → connected
components → survivorship, and returns the golden-record Dataset.

``queries()`` / ``oracle_sql()`` expose the full operator catalog from
``mdm_ray.queries`` — one entry per operator family of SURVEY.md §2 plus the
training-data extensions; SQL-expressible ones carry an exactly-matching
DuckDB oracle (same column names, floats rounded to 6dp on both sides).

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def _adapt_documents_to_spans(sf_dir: str):
    """Generic ingestion adapter: a flat text table -> interleaved-doc shape.

    Each source row becomes a doc whose span sequence carries the text split
    into a name-like head span and an address-like tail span plus city/company
    metadata spans — demonstrating the engine runs over arbitrary interleaved
    tables, not only the customer fixture.
    """
    import pyarrow as pa
    import ray.data

    from mdm_ray.schema import DOCS_SCHEMA

    def to_docs(b: pa.Table) -> pa.Table:
        doc_ids, spans = [], []
        for did, text, lang, source in zip(
            b["doc_id"].to_pylist(),
            b["text"].to_pylist(),
            b["lang"].to_pylist(),
            b["source"].to_pylist(),
        ):
            toks = (text or "").split()
            row = [
                {"kind": "full_name", "text": " ".join(toks[:3]), "media_ref": "", "offset": 0},
                {"kind": "address", "text": " ".join(toks[3:10]), "media_ref": "", "offset": 1},
                {"kind": "city", "text": lang or "", "media_ref": "", "offset": 2},
                {"kind": "company", "text": source or "", "media_ref": "", "offset": 3},
            ]
            doc_ids.append(f"t-{did:09d}")
            spans.append(row)
        return pa.Table.from_pydict({"doc_id": doc_ids, "spans": spans}, schema=DOCS_SCHEMA)

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet").map_batches(
        to_docs, batch_format="pyarrow"
    )


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from mdm_ray import pipeline

    docs = _adapt_documents_to_spans("/root/testdata/sf0.001")
    out = pipeline.run_er(docs)
    return out["golden"]


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from mdm_ray.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query (same column
    names; floats rounded identically). Non-expressible ops (minhash/simhash
    LSH, lang-id, fingerprints, ER-fixture pipelines, media) are omitted →
    rows-only checks."""
    from mdm_ray.queries import ORACLES

    return dict(ORACLES)
