"""Standardization kernels (vectorized Arrow compute).

Reproduces the reference's standardization semantics
(``batch_mdm_gcp/bigquery_utils.py:88-151`` SQL; row-wise twin
``streaming_mdm_gcp/streaming_processor.py:38-72``):

* name:    strip non-alpha/space, upper, trim
* email:   trim, lower
* phone:   digits only
* address: upper, trim, word-boundary abbreviation rewrites
           (STREET→ST, AVENUE→AVE, BOULEVARD→BLVD, ROAD→RD, DRIVE→DR)
* city/state: upper, trim

Divergence note: the batch SQL nests the address REGEXP_REPLACEs *inside* the
UPPER() call with uppercase patterns (``bigquery_utils.py:110-122``), so on
title-case input the rewrites never fire there; the streaming twin uppercases
first (``streaming_processor.py:59-66``), which is the documented intent
("100% identical", ``MDM_STREAMING_JOURNEY.md:127-154``). We follow the
streaming order (upper → rewrite).

All functions take and return ``pyarrow.Array``/``ChunkedArray`` — zero-copy
friendly, usable directly inside ``map_batches(batch_format="pyarrow")``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

ADDRESS_ABBREVIATIONS = [
    ("STREET", "ST"),
    ("AVENUE", "AVE"),
    ("BOULEVARD", "BLVD"),
    ("ROAD", "RD"),
    ("DRIVE", "DR"),
]


def _empty_to_null(arr: pa.Array) -> pa.Array:
    """Map '' -> null so downstream IS NOT NULL semantics match SQL NULLs."""
    return pc.if_else(pc.equal(arr, ""), pa.scalar(None, pa.string()), arr)


def clean_name(arr) -> pa.Array:
    """TRIM(UPPER(REGEXP_REPLACE(x, '[^a-zA-Z\\s]', ''))) — bigquery_utils.py:99."""
    out = pc.replace_substring_regex(arr, pattern=r"[^a-zA-Z\s]", replacement="")
    out = pc.utf8_upper(out)
    return pc.utf8_trim_whitespace(out)


def clean_email(arr) -> pa.Array:
    """LOWER(TRIM(email)) — bigquery_utils.py:104."""
    return pc.utf8_lower(pc.utf8_trim_whitespace(arr))


def clean_phone(arr) -> pa.Array:
    """REGEXP_REPLACE(phone, '[^0-9]', '') — bigquery_utils.py:107."""
    return pc.replace_substring_regex(arr, pattern=r"[^0-9]", replacement="")


def clean_address(arr) -> pa.Array:
    """UPPER + TRIM + word-boundary abbreviation rewrites — streaming_processor.py:59-66."""
    out = pc.utf8_trim_whitespace(pc.utf8_upper(arr))
    for long, short in ADDRESS_ABBREVIATIONS:
        out = pc.replace_substring_regex(out, pattern=rf"\b{long}\b", replacement=short)
    return out


def clean_city(arr) -> pa.Array:
    """TRIM(UPPER(city)) — bigquery_utils.py:124."""
    return pc.utf8_trim_whitespace(pc.utf8_upper(arr))


clean_state = clean_city


def standardize_table(t: pa.Table, nullify_empty: bool = True) -> pa.Table:
    """Append *_clean columns to a feature table (Arrow, vectorized).

    Input columns used when present: full_name, email, phone, address, city,
    state. Missing input columns are skipped. Null inputs yield null outputs
    (Arrow kernels propagate nulls), matching SQL semantics.
    """
    rules = {
        "full_name": ("full_name_clean", clean_name),
        # TRIM(UPPER(x)) — bigquery_utils.py:100-101 (no char-class strip,
        # unlike full_name_clean's :99)
        "first_name": ("first_name_clean", clean_city),
        "last_name": ("last_name_clean", clean_city),
        "email": ("email_clean", clean_email),
        "phone": ("phone_clean", clean_phone),
        "address": ("address_clean", clean_address),
        "city": ("city_clean", clean_city),
        "state": ("state_clean", clean_state),
    }
    for src, (dst, fn) in rules.items():
        if src in t.column_names:
            col = fn(t[src])
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if nullify_empty:
                col = _empty_to_null(col)
            t = t.append_column(dst, col)
    return t


def ingest_filter_mask(t: pa.Table) -> pa.Array:
    """WHERE full_name IS NOT NULL AND (email IS NOT NULL OR phone IS NOT NULL)
    — bigquery_utils.py:149-150."""
    has_name = pc.is_valid(t["full_name"])
    has_contact = pc.or_(pc.is_valid(t["email"]), pc.is_valid(t["phone"]))
    return pc.and_(has_name, has_contact)
