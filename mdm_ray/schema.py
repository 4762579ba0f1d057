"""Arrow schemas for the engine's logical tables.

Input shape is fixed by the target contract (BASELINE.json ``input_hint``):
``(doc_id: string, spans: list<struct<kind, text, media_ref, offset>>)`` —
an interleaved text+media document. Customer fields from the reference's
21-column record (``batch_mdm_gcp/spark_data_generator.py:65-89``) ride as
text spans keyed by ``kind``; media attachments are spans with
``kind='media'`` and an opaque ``media_ref``.
"""

from __future__ import annotations

import pyarrow as pa

SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

DOCS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_TYPE)),
    ]
)

# canonical span kind order (FIXTURES.md §1)
FIELD_KINDS = [
    "full_name",
    "first_name",
    "last_name",
    "email",
    "phone",
    "address",
    "city",
    "state",
    "zip_code",
    "date_of_birth",
    "company",
    "job_title",
    "customer_segment",
    "annual_income",
    "registration_date",
    "last_activity_date",
    "source_system",
    "source_id",
]
MEDIA_KIND = "media"

FEATURES_SCHEMA = pa.schema(
    [("doc_id", pa.string())]
    + [(k, pa.string()) for k in FIELD_KINDS]
    + [("media_refs", pa.list_(pa.string()))]
)

CLEAN_COLUMNS = [
    "full_name_clean",
    "first_name_clean",
    "last_name_clean",
    "email_clean",
    "phone_clean",
    "address_clean",
    "city_clean",
    "state_clean",
]

PAIRS_SCHEMA_CORE = [
    ("doc1_id", pa.string()),
    ("doc2_id", pa.string()),
    ("source1", pa.string()),
    ("source2", pa.string()),
]

GOLDEN_COLUMNS = [
    "master_id",
    "cluster_id",
    "source_record_ids",
    "master_name",
    "master_email",
    "master_phone",
    "master_address",
    "master_city",
    "master_state",
    "master_company",
    "master_income",
    "master_segment",
    "source_record_count",
    "source_systems",
    "first_seen",
    "last_activity",
    "has_email",
    "has_phone",
    "has_address",
    "confidence_score",
    "processing_path",
    "embedding",
]

LABELS_SCHEMA = pa.schema(
    [
        ("doc1_id", pa.string()),
        ("doc2_id", pa.string()),
        ("label", pa.bool_()),
        ("customer_id", pa.string()),
    ]
)
