"""Deterministic interleaved-document fixture generator.

Reproduces the *structure* of the reference's seeded ground-truth corpus
(``batch_mdm_gcp/data_generator.py``: 120 base customers → ~284 records across
CRM/ERP/E-commerce with controlled variations) in the interleaved-span input
shape (FIXTURES.md). All randomness is content-seeded per
``(customer, source, copy)`` — the parallelism-invariance pattern of
``batch_mdm_gcp/spark_data_generator/spark_data_generator.py:177-182`` — so
any parallelism and any batch partitioning produce identical bytes.

Generation rules ported semantically (not line-by-line):
* source coverage/duplication — ``data_generator.py:178-250``
  (CRM 80% coverage, 15% double; ERP 70%; Ecom 60% with 1-3 copies .7/.25/.05)
* variation families — ``data_generator.py:24-53, 105-166``
  (nicknames, address abbreviations, phone formats, email-domain swap 20%,
  typos 10%, missing field 15%)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .schema import DOCS_SCHEMA, FIELD_KINDS, LABELS_SCHEMA, MEDIA_KIND

SEED = 42

FIRST_NAMES = [
    "John", "Michael", "William", "Robert", "James", "Christopher", "Matthew",
    "Anthony", "Elizabeth", "Jennifer", "David", "Richard", "Joseph", "Thomas",
    "Charles", "Daniel", "Mary", "Patricia", "Linda", "Barbara", "Susan",
    "Jessica", "Sarah", "Karen", "Nancy", "Lisa", "Betty", "Margaret",
    "Sandra", "Ashley", "Kimberly", "Emily", "Donna", "Michelle", "Carol",
    "Amanda", "Dorothy", "Melissa", "Deborah", "Stephanie",
]
NICKNAMES = {
    # data_generator.py:25-36
    "John": "Jon", "Michael": "Mike", "William": "Bill", "Robert": "Bob",
    "James": "Jim", "Christopher": "Chris", "Matthew": "Matt",
    "Anthony": "Tony", "Elizabeth": "Liz", "Jennifer": "Jen",
}
LAST_NAMES = [
    "Smith", "Johnson", "Williams", "Brown", "Jones", "Garcia", "Miller",
    "Davis", "Rodriguez", "Martinez", "Hernandez", "Lopez", "Gonzalez",
    "Wilson", "Anderson", "Thomas", "Taylor", "Moore", "Jackson", "Martin",
    "Lee", "Perez", "Thompson", "White", "Harris", "Sanchez", "Clark",
    "Ramirez", "Lewis", "Robinson", "Walker", "Young", "Allen", "King",
    "Wright", "Scott", "Torres", "Nguyen", "Hill", "Flores",
]
STREET_NAMES = [
    "Main", "Oak", "Pine", "Maple", "Cedar", "Elm", "Washington", "Lake",
    "Hill", "Park", "River", "Spring", "Church", "Mill", "Walnut", "Sunset",
]
STREET_SUFFIXES = ["Street", "Avenue", "Boulevard", "Road", "Drive"]
CITIES = [
    ("Springfield", "IL"), ("Riverside", "CA"), ("Franklin", "TN"),
    ("Greenville", "SC"), ("Bristol", "CT"), ("Clinton", "IA"),
    ("Fairview", "OR"), ("Salem", "MA"), ("Madison", "WI"),
    ("Georgetown", "TX"), ("Arlington", "VA"), ("Ashland", "OH"),
    ("Burlington", "VT"), ("Manchester", "NH"), ("Milton", "GA"),
    ("Auburn", "AL"), ("Dayton", "NV"), ("Lexington", "KY"),
    ("Milford", "DE"), ("Oxford", "MS"),
]
COMPANIES = [
    "Acme Corp", "Globex Inc", "Initech LLC", "Umbrella Group", "Stark Industries",
    "Wayne Enterprises", "Wonka Industries", "Tyrell Corp", "Cyberdyne Systems",
    "Soylent Corp", "Massive Dynamic", "Hooli Inc", "Pied Piper", "Vandelay Industries",
    "Dunder Mifflin", "Sterling Cooper", "Bluth Company", "Prestige Worldwide",
]
JOB_TITLES = [
    "Software Engineer", "Account Manager", "Data Analyst", "Sales Director",
    "Product Manager", "Operations Lead", "Marketing Specialist", "HR Manager",
    "Financial Analyst", "Customer Success Manager", "Field Technician",
    "Research Scientist",
]
SEGMENTS = ["Premium", "Standard", "Basic"]
DOMAINS_BASE = ["example.com", "corpmail.com", "mailhub.net", "webbox.org"]
DOMAINS_SWAP = ["gmail.com", "yahoo.com", "hotmail.com", "outlook.com"]  # data_generator.py:136-138
PHONE_FORMATS = [
    # data_generator.py:46-52
    lambda p: p,
    lambda p: p.replace("-", "."),
    lambda p: p.replace("-", " "),
    lambda p: p.replace("-", ""),
    lambda p: f"({p[:3]}) {p[4:7]}-{p[8:]}",
]
ADDRESS_ABBREVS = [
    # data_generator.py:38-44
    ("Street", "St"), ("Avenue", "Ave"), ("Boulevard", "Blvd"),
    ("Road", "Rd"), ("Drive", "Dr"), ("Apartment", "Apt"), ("Suite", "Ste"),
]
SOURCES = ["crm", "erp", "ecommerce"]


def _rng(*parts) -> np.random.Generator:
    """Content-seeded RNG: stable across processes and partitionings."""
    h = hashlib.sha256(("|".join(str(p) for p in parts) + f"|{SEED}").encode()).digest()
    return np.random.default_rng(int.from_bytes(h[:8], "little"))


def customer_id(idx: int) -> str:
    return f"CUST_{idx + 1:07d}"


def base_customer(idx: int) -> dict:
    rng = _rng("base", idx)
    first = FIRST_NAMES[rng.integers(len(FIRST_NAMES))]
    last = LAST_NAMES[rng.integers(len(LAST_NAMES))]
    city, state = CITIES[rng.integers(len(CITIES))]
    phone = f"{rng.integers(200, 999)}-{rng.integers(100, 999)}-{rng.integers(1000, 9999)}"
    year = int(rng.integers(1946, 2007))
    month = int(rng.integers(1, 13))
    day = int(rng.integers(1, 29))
    return {
        "customer_id": customer_id(idx),
        "first_name": first,
        "last_name": last,
        "full_name": f"{first} {last}",
        "email": f"{first.lower()}.{last.lower()}{rng.integers(1, 9999)}@{DOMAINS_BASE[rng.integers(len(DOMAINS_BASE))]}",
        "phone": phone,
        "address": f"{rng.integers(1, 9999)} {STREET_NAMES[rng.integers(len(STREET_NAMES))]} {STREET_SUFFIXES[rng.integers(len(STREET_SUFFIXES))]}"
        + (f" Apartment {rng.integers(1, 99)}" if rng.random() < 0.3 else ""),
        "city": city,
        "state": state,
        "zip_code": f"{rng.integers(10000, 99999)}",
        "date_of_birth": f"{year:04d}-{month:02d}-{day:02d}",
        "company": COMPANIES[rng.integers(len(COMPANIES))],
        "job_title": JOB_TITLES[rng.integers(len(JOB_TITLES))],
        "customer_segment": SEGMENTS[rng.integers(len(SEGMENTS))],
        # income + date fields (data_generator.py:78-81; Faker windows replaced
        # by a fixed anchor so the fixture is content-seeded). Drawn from a
        # separate rng stream so pre-existing field values stay byte-identical.
        **_extra_fields(idx),
    }


_DATE_ANCHOR = np.datetime64("2026-01-01", "D")


def _extra_fields(idx: int) -> dict:
    rng = _rng("extra", idx)
    reg = _DATE_ANCHOR - int(rng.integers(0, 5 * 365))   # '-5y' window
    act = _DATE_ANCHOR - int(rng.integers(0, 365))       # '-1y' window
    return {
        "annual_income": str(int(rng.integers(30000, 200001))),
        "registration_date": str(reg),
        "last_activity_date": str(act),
    }


def _vary(cust: dict, idx: int, source: str, copy: int) -> dict:
    """Apply the reference's variation families, content-seeded per record."""
    rng = _rng("vary", idx, source, copy)
    rec = dict(cust)
    rec["source_system"] = source
    rec["source_id"] = f"{source.upper()[:3]}_{rng.integers(10000, 99999)}"

    # name variations (data_generator.py:224-235 semantics: 30% family, 30% each rule)
    if rng.random() < 0.3:
        for long, short in NICKNAMES.items():
            if rng.random() < 0.3 and long in rec["full_name"]:
                rec["full_name"] = rec["full_name"].replace(long, short)
    # address variations (40% each rule within 30% family)
    if rng.random() < 0.3:
        for long, short in ADDRESS_ABBREVS:
            if rng.random() < 0.4:
                rec["address"] = rec["address"].replace(long, short)
    # phone format (30% family)
    if rng.random() < 0.3:
        rec["phone"] = PHONE_FORMATS[rng.integers(len(PHONE_FORMATS))](rec["phone"])
    # email domain swap (20%)
    if rng.random() < 0.2:
        local = rec["email"].split("@")[0]
        rec["email"] = f"{local}@{DOMAINS_SWAP[rng.integers(len(DOMAINS_SWAP))]}"
    # typos (10%: name or address, one lowercase char substitution)
    if rng.random() < 0.1:
        field = "full_name" if rng.random() < 0.5 else "address"
        s = rec[field]
        if len(s) > 3:
            pos = int(rng.integers(1, len(s) - 1))
            rec[field] = s[:pos] + "abcdefghijklmnopqrstuvwxyz"[rng.integers(26)] + s[pos + 1:]
    # missing data (15%: one of phone/company/job_title)
    if rng.random() < 0.15:
        rec[["phone", "company", "job_title"][rng.integers(3)]] = None
    return rec


def _media_refs(cust_idx: int, rng: np.random.Generator) -> list[str]:
    """0-2 media spans; shared-with-entity ref at p=0.5 each (FIXTURES.md §1)."""
    n = int(rng.integers(0, 3))
    refs = []
    for k in range(n):
        if rng.random() < 0.5:
            key = f"{customer_id(cust_idx)}:{k}"
        else:
            key = f"{customer_id(cust_idx)}:{rng.integers(1 << 30)}"
        refs.append("m://" + hashlib.sha256(key.encode()).hexdigest()[:8])
    return refs


def records_for_customer(idx: int) -> list[dict]:
    """All source records minted for one base customer (deterministic)."""
    cust = base_customer(idx)
    rng = _rng("coverage", idx)
    out = []
    # CRM: 80% coverage, 15% chance of a second record (data_generator.py:178-186)
    if rng.random() < 0.8:
        copies = 2 if rng.random() < 0.15 else 1
        for c in range(copies):
            out.append((idx, "crm", c, _vary(cust, idx, "crm", c)))
    # ERP: 70% coverage, single record (data_generator.py:198-206)
    if rng.random() < 0.7:
        out.append((idx, "erp", 0, _vary(cust, idx, "erp", 0)))
    # Ecom: 60% coverage, 1-3 copies weighted .7/.25/.05 (data_generator.py:228-233)
    if rng.random() < 0.6:
        r = rng.random()
        copies = 1 if r < 0.7 else (2 if r < 0.95 else 3)
        for c in range(copies):
            out.append((idx, "ecommerce", c, _vary(cust, idx, "ecommerce", c)))
    return out


def doc_id_for(idx: int, source: str, copy: int) -> str:
    return f"d-{idx:09d}-{source}-{copy}"


def doc_customer_idx(doc_id: str) -> int:
    """Ground-truth base-customer index embedded in the fixture doc_id."""
    return int(doc_id.split("-")[1])


def record_to_spans(idx: int, source: str, copy: int, rec: dict) -> list[dict]:
    spans = []
    offset = 0
    for kind in FIELD_KINDS:
        val = rec.get(kind)
        if val is None:
            continue
        spans.append({"kind": kind, "text": str(val), "media_ref": "", "offset": offset})
        offset += 1
    rng = _rng("media", idx, source, copy)
    for ref in _media_refs(idx, rng):
        spans.append({"kind": MEDIA_KIND, "text": "", "media_ref": ref, "offset": offset})
        offset += 1
    return spans


def docs_for_customers(indices) -> pa.Table:
    """Documents table for a set of customer indices (the map_batches kernel)."""
    doc_ids, spans_col = [], []
    for idx in indices:
        for cidx, source, copy, rec in records_for_customer(int(idx)):
            doc_ids.append(doc_id_for(cidx, source, copy))
            spans_col.append(record_to_spans(cidx, source, copy, rec))
    return pa.Table.from_pydict(
        {"doc_id": doc_ids, "spans": spans_col}, schema=DOCS_SCHEMA
    )


def generate_documents_local(num_customers: int) -> pa.Table:
    return docs_for_customers(range(num_customers))


def generate_documents_ray(num_customers: int, parallelism: int = -1):
    """Distributed fixture generation: embarrassingly parallel, content-seeded."""
    import ray.data

    ds = ray.data.range(num_customers, override_num_blocks=parallelism if parallelism > 0 else None)

    def gen(batch: pa.Table) -> pa.Table:
        return docs_for_customers(batch["id"].to_pylist())

    return ds.map_batches(gen, batch_format="pyarrow")


def labels_for_customers(indices, negatives_per_customer: int = 3,
                         num_customers: int | None = None) -> pa.Table:
    """Labeled pairs: all within-customer positives + sampled negatives."""
    d1, d2, lab, cid = [], [], [], []
    for idx in indices:
        idx = int(idx)
        recs = records_for_customer(idx)
        ids = [doc_id_for(i, s, c) for i, s, c, _ in recs]
        for a in range(len(ids)):
            for b in range(a + 1, len(ids)):
                lo, hi = sorted((ids[a], ids[b]))
                d1.append(lo); d2.append(hi); lab.append(True); cid.append(customer_id(idx))
        if num_customers and num_customers > 1 and ids:
            rng = _rng("neg", idx)
            for _ in range(negatives_per_customer):
                j = int(rng.integers(num_customers))
                if j == idx:
                    continue
                other = records_for_customer(j)
                if not other:
                    continue
                oid = doc_id_for(other[0][0], other[0][1], other[0][2])
                lo, hi = sorted((ids[0], oid))
                d1.append(lo); d2.append(hi); lab.append(False); cid.append(customer_id(idx))
    return pa.Table.from_pydict(
        {"doc1_id": d1, "doc2_id": d2, "label": lab, "customer_id": cid},
        schema=LABELS_SCHEMA,
    )


def drift_record(idx: int, seq: int) -> dict:
    """M7 drift-variation twin (``streaming_processor.py:811-878``): take an
    existing customer's base record and mutate exactly one of email-domain /
    phone-format / name-nickname / address-abbreviation — the streaming
    notebook's "existing customer arrives again, slightly changed" fixture.
    Content-seeded per (customer, seq): deterministic at any parallelism."""
    rec = dict(base_customer(idx))
    rng = _rng("drift", idx, seq)
    rec["source_system"] = "stream"
    rec["source_id"] = f"STR_{rng.integers(10000, 99999)}"
    which = int(rng.integers(4))
    if which == 0:  # email domain swap (:822-830)
        local = rec["email"].split("@")[0]
        rec["email"] = f"{local}@{DOMAINS_SWAP[rng.integers(len(DOMAINS_SWAP))]}"
    elif which == 1:  # phone reformat (:832-840)
        rec["phone"] = PHONE_FORMATS[rng.integers(len(PHONE_FORMATS))](rec["phone"])
    elif which == 2:  # name abbreviation (:842-852)
        for long, short in NICKNAMES.items():
            if long in rec["full_name"]:
                rec["full_name"] = rec["full_name"].replace(long, short)
                break
    else:  # address abbreviation (:854-864)
        for long, short in ADDRESS_ABBREVS:
            if long in rec["address"]:
                rec["address"] = rec["address"].replace(long, short)
                break
    return rec


def stream_doc_id(idx: int, seq: int, new: bool) -> str:
    return f"s-{idx:09d}-{'new' if new else 'drift'}-{seq}"


def generate_stream_docs(num_base_customers: int, num_records: int,
                         new_fraction: float = 0.8) -> pa.Table:
    """Incremental-batch fixture (streaming notebook cell 14 semantics:
    ``new_fraction`` brand-new customers, the rest drift-varied existing).
    New customers take indices >= num_base_customers so ground truth stays
    derivable from the doc_id."""
    doc_ids, spans_col = [], []
    for seq in range(num_records):
        rng = _rng("stream", seq)
        if rng.random() < new_fraction:
            idx = num_base_customers + seq
            rec = _vary(base_customer(idx), idx, "stream", 0)
            rec["source_system"] = "stream"
            new = True
        else:
            idx = int(rng.integers(num_base_customers))
            rec = drift_record(idx, seq)
            new = False
        doc_ids.append(stream_doc_id(idx, seq, new))
        spans_col.append(record_to_spans(idx, "stream", seq, rec))
    return pa.Table.from_pydict(
        {"doc_id": doc_ids, "spans": spans_col}, schema=DOCS_SCHEMA
    )


def stream_doc_customer_idx(doc_id: str) -> tuple[int, bool]:
    """(base-customer index, is_new) from a stream fixture doc_id."""
    parts = doc_id.split("-")
    return int(parts[1]), parts[2] == "new"


def true_positive_pairs(num_customers: int) -> set[tuple[str, str]]:
    """Exact ground-truth positive pair set (for pairwise F1)."""
    out = set()
    for idx in range(num_customers):
        ids = sorted(
            doc_id_for(i, s, c) for i, s, c, _ in records_for_customer(idx)
        )
        for a in range(len(ids)):
            for b in range(a + 1, len(ids)):
                out.add((ids[a], ids[b]))
    return out
