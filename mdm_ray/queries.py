"""Operator catalog over the driver testdata tables, with DuckDB oracles.

Every operator family from SURVEY.md §2 (plus the training-data extensions)
is exposed as a named query ``fn(sf_dir) -> Dataset/Table`` with, where
SQL-expressible, an exactly-equivalent DuckDB oracle — same column names,
floats rounded to 6 decimals on both sides. The ER-fixture pipelines (which
run on the synthesized interleaved corpus, invisible to the oracle's
pre-registered views) are rows-only checks.

Blocking keys used here mirror the ER engine's (exact-key groupbys), applied
to the TPC-H-ish tables: customers block on (mktsegment, nationkey), parts on
brand, embeddings on label — the same groupby→within-block-pair pattern that
replaces the reference's CROSS JOINs (bigquery_utils.py:330-332).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dsutil import grouped_kernel
from .simfuncs import edit_similarity_batch, jaro_winkler_batch, token_overlap_batch

ROUND = 6


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    import ray.data

    # column pruning AT the read (cheaper than a select_columns Project op:
    # only the named columns leave the parquet reader)
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _round(x: np.ndarray) -> np.ndarray:
    return np.round(x, ROUND)


# ---------------------------------------------------------------------------
# M2/M4: standardization + ingest filter (documents)
# ---------------------------------------------------------------------------

def q_standardize(sf_dir: str):
    from .textnorm import clean_city, clean_email, clean_name, standardize_table

    def fn(b: pa.Table) -> pa.Table:
        # first/last tokens of the text stand in for the reference's
        # first_name/last_name source fields (bigquery_utils.py:100-101);
        # list_slice+binary_join reproduces split_part('s, ' ', k) semantics
        # ('' when out of range, NULL on NULL input)
        toks = pc.split_pattern(pc.cast(b["text"], pa.string()), pattern=" ")
        base = pa.table(
            {
                "first_name": pc.binary_join(pc.list_slice(toks, 0, 1), ""),
                "last_name": pc.binary_join(pc.list_slice(toks, 1, 2), ""),
            }
        )
        s = standardize_table(base, nullify_empty=False)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "text_clean": clean_name(b["text"]),
                "first_name_clean": s["first_name_clean"],
                "last_name_clean": s["last_name_clean"],
                "source_clean": clean_email(b["source"]),
                "lang_clean": clean_city(b["lang"]),
            }
        )

    return _read(sf_dir, "documents").map_batches(fn, batch_format="pyarrow")


SQL_STANDARDIZE = """
SELECT doc_id,
       trim(upper(regexp_replace(text, '[^a-zA-Z\\s]', '', 'g'))) AS text_clean,
       trim(upper(split_part(text, ' ', 1))) AS first_name_clean,
       trim(upper(split_part(text, ' ', 2))) AS last_name_clean,
       lower(trim(source)) AS source_clean,
       trim(upper(lang)) AS lang_clean
FROM documents
"""


def q_ingest_filter(sf_dir: str):
    ds = _read(sf_dir, "documents")
    return ds.map_batches(
        lambda b: b.filter(pc.greater(b["n_chars"], 100)).select(["doc_id", "n_chars"]),
        batch_format="pyarrow",
    )


SQL_INGEST_FILTER = "SELECT doc_id, n_chars FROM documents WHERE n_chars > 100"


# ---------------------------------------------------------------------------
# M1/D1: union + projection to a common schema
# ---------------------------------------------------------------------------

def q_union_project(sf_dir: str):
    cust = _read(sf_dir, "customer").map_batches(
        lambda b: pa.table(
            {
                "entity_key": b["c_custkey"],
                "entity_name": b["c_name"],
                "acctbal": b["c_acctbal"],
                "source_table": pa.array(["customer"] * b.num_rows, pa.string()),
            }
        ),
        batch_format="pyarrow",
    )
    supp = _read(sf_dir, "supplier").map_batches(
        lambda b: pa.table(
            {
                "entity_key": b["s_suppkey"],
                "entity_name": b["s_name"],
                "acctbal": b["s_acctbal"],
                "source_table": pa.array(["supplier"] * b.num_rows, pa.string()),
            }
        ),
        batch_format="pyarrow",
    )
    return cust.union(supp)


SQL_UNION_PROJECT = """
SELECT c_custkey AS entity_key, c_name AS entity_name, c_acctbal AS acctbal,
       'customer' AS source_table FROM customer
UNION ALL
SELECT s_suppkey, s_name, s_acctbal, 'supplier' FROM supplier
"""


# ---------------------------------------------------------------------------
# J1: exact-key blocked pair generation (customer)
# ---------------------------------------------------------------------------

def _pair_kernel(score_fn, out_schema_fn):
    def kernel(batch: pa.Table, starts, stops) -> pa.Table:
        ii_all, jj_all = [], []
        for s, e in zip(starts, stops):
            n = e - s
            if n < 2:
                continue
            ii, jj = np.triu_indices(n, k=1)
            ii_all.append(ii + s)
            jj_all.append(jj + s)
        if not ii_all:
            return out_schema_fn(batch, None, None)
        ii = np.concatenate(ii_all)
        jj = np.concatenate(jj_all)
        return score_fn(batch, ii, jj)

    return kernel


def _add_block_key(ds, cols: list[str], name: str = "_bk"):
    def fn(b: pa.Table) -> pa.Table:
        key = None
        for c in cols:
            part = pc.cast(b[c], pa.string())
            key = part if key is None else pc.binary_join_element_wise(key, part, "|")
        return b.append_column(name, key)

    return ds.map_batches(fn, batch_format="pyarrow")


def q_exact_pairs(sf_dir: str):
    ds = _add_block_key(
        _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment", "c_nationkey"]),
        ["c_mktsegment", "c_nationkey"],
    )

    def score(batch, ii, jj):
        keys = batch["c_custkey"].to_numpy(zero_copy_only=False)
        a = np.minimum(keys[ii], keys[jj])
        b_ = np.maximum(keys[ii], keys[jj])
        seg = batch["c_mktsegment"].take(pa.array(ii, pa.int64()))
        nat = batch["c_nationkey"].take(pa.array(ii, pa.int64()))
        return pa.table(
            {
                "custkey1": pa.array(a, pa.int64()),
                "custkey2": pa.array(b_, pa.int64()),
                "c_mktsegment": seg,
                "c_nationkey": nat,
            }
        )

    def empty(batch, *_):
        return pa.table(
            {
                "custkey1": pa.array([], pa.int64()),
                "custkey2": pa.array([], pa.int64()),
                "c_mktsegment": batch["c_mktsegment"].slice(0, 0),
                "c_nationkey": batch["c_nationkey"].slice(0, 0),
            }
        )

    return grouped_kernel(ds, "_bk", _pair_kernel(score, empty))


SQL_EXACT_PAIRS = """
SELECT a.c_custkey AS custkey1, b.c_custkey AS custkey2,
       a.c_mktsegment, a.c_nationkey
FROM customer a JOIN customer b
  ON a.c_mktsegment = b.c_mktsegment AND a.c_nationkey = b.c_nationkey
 AND a.c_custkey < b.c_custkey
"""


# ---------------------------------------------------------------------------
# J2/F1/F3: fuzzy scoring within brand blocks (part)
# ---------------------------------------------------------------------------

def _part_pairs(sf_dir: str):
    return _read(sf_dir, "part", columns=["p_partkey", "p_name", "p_brand"])


def _fused_brand_scored(sf_dir: str, make_scorer, cap: int = 256):
    """Canonical (partkey1 < partkey2) within-brand part pairs, scored FUSED
    inside the emission kernel (dedup.salted_bucket_scored): a brand bigger
    than ``cap`` rows is chunk-pair split so one 800-row brand becomes ~10
    independent pair groups, and the wide 1_/2_ pair table (~90 B × every
    candidate pair) never enters the object store — only the filtered scored
    output does."""
    from .dedup import _attach_bucket_keys, salted_bucket_scored

    def attach(b: pa.Table) -> pa.Table:
        keys = [[f"b:{v}"] for v in b["p_brand"].to_pylist()]
        return _attach_bucket_keys(
            b, id_col="p_partkey", keys_fn=lambda _: keys,
            payload={"_name": b["p_name"], "_brand": b["p_brand"]},
        )

    keyed = _part_pairs(sf_dir).map_batches(attach, batch_format="pyarrow")
    return salted_bucket_scored(keyed, "p_partkey", ["_name", "_brand"], cap,
                                make_scorer)


def q_fuzzy_pairs(sf_dir: str):
    def make_scorer(sb: pa.Table):
        names = sb["_name"].to_pylist()
        keys = sb["p_partkey"].combine_chunks() if sb.num_rows else sb["p_partkey"]
        brands = sb["_brand"].combine_chunks() if sb.num_rows else sb["_brand"]

        def score(a: np.ndarray, b: np.ndarray) -> pa.Table:
            na = [names[i] for i in a]
            nb = [names[i] for i in b]
            edit = _round(edit_similarity_batch(na, nb))
            # token overlap only for the ~16% of pairs surviving the filter
            ki = np.nonzero(edit > 0.5)[0]
            tok = _round(token_overlap_batch(
                [na[i] for i in ki], [nb[i] for i in ki]
            )) if len(ki) else np.zeros(0)
            ia = pa.array(a[ki], pa.int64())
            ib = pa.array(b[ki], pa.int64())
            return pa.table(
                {
                    "partkey1": keys.take(ia),
                    "partkey2": keys.take(ib),
                    "p_brand": brands.take(ia),
                    "name_edit_sim": pa.array(edit[ki], pa.float64()),
                    "name_token_score": pa.array(tok, pa.float64()),
                }
            )

        return score

    return _fused_brand_scored(sf_dir, make_scorer)


SQL_FUZZY_PAIRS = """
SELECT a.p_partkey AS partkey1, b.p_partkey AS partkey2, a.p_brand,
       round(1.0 - levenshtein(a.p_name, b.p_name)::DOUBLE /
             greatest(length(a.p_name), length(b.p_name)), 6) AS name_edit_sim,
       round(len(list_filter(string_split(a.p_name, ' '),
                             x -> list_contains(string_split(b.p_name, ' '), x)))::DOUBLE /
             greatest(len(string_split(a.p_name, ' ')),
                      len(string_split(b.p_name, ' '))), 6) AS name_token_score
FROM part a JOIN part b ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
WHERE round(1.0 - levenshtein(a.p_name, b.p_name)::DOUBLE /
      greatest(length(a.p_name), length(b.p_name)), 6) > 0.5
"""


def q_jaro_pairs(sf_dir: str):
    def make_scorer(sb: pa.Table):
        names = np.asarray(sb["_name"].to_pylist(), dtype=object)
        keys = sb["p_partkey"].combine_chunks() if sb.num_rows else sb["p_partkey"]

        def score(a: np.ndarray, b: np.ndarray) -> pa.Table:
            jw = _round(jaro_winkler_batch(names[a], names[b])) if len(a) \
                else np.zeros(0)
            ki = np.nonzero(jw > 0.8)[0]
            return pa.table(
                {
                    "partkey1": keys.take(pa.array(a[ki], pa.int64())),
                    "partkey2": keys.take(pa.array(b[ki], pa.int64())),
                    "jw_sim": pa.array(jw[ki], pa.float64()),
                }
            )

        return score

    return _fused_brand_scored(sf_dir, make_scorer)


SQL_JARO_PAIRS = """
SELECT a.p_partkey AS partkey1, b.p_partkey AS partkey2,
       round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw_sim
FROM part a JOIN part b ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
WHERE round(jaro_winkler_similarity(a.p_name, b.p_name), 6) > 0.8
"""


# ---------------------------------------------------------------------------
# J5/O4: capped LLM pair flow — deterministic top-N pairs into the AI
# surrogate scorer (bigquery_utils.py:496-556: LIMIT 500 candidate batch →
# AI.GENERATE_TABLE → similarity > 0.4; the reference's LIMIT is ORDER-BY-less
# and nondeterministic, so the cap here is by pair key, and the remote model
# is the engine's deterministic surrogate: the 5-way profile's ai-leg shape,
# scoring.py — 0.5·name_edit + 0.3·addr_edit + 0.2·phone char-jaccard)
# ---------------------------------------------------------------------------

LLM_PAIR_CAP = 500
LLM_AI_THRESHOLD = 0.4


def q_llm_pair_cap(sf_dir: str):
    """Scale shape: each block's kernel selects its ≤CAP smallest pair keys
    BEFORE gathering any string payload, so the global sort+limit sees at
    most CAP×num_blocks narrow rows and the surrogate scorer runs on exactly
    CAP pairs — the wide pair set never materializes (the cap is the point:
    it bounds LLM spend, reference MDM_BATCH_RESULTS.md:358-388)."""
    from .simfuncs import edit_similarity_batch, ngram_jaccard_batch

    cols = ["c_custkey", "c_mktsegment", "c_nationkey", "c_name", "c_acctbal"]
    ds = _add_block_key(_read(sf_dir, "customer", columns=cols),
                        ["c_mktsegment", "c_nationkey"])

    def score(batch, ii, jj):
        keys = batch["c_custkey"].to_numpy(zero_copy_only=False)
        swap = keys[ii] > keys[jj]
        i1 = np.where(swap, jj, ii)
        i2 = np.where(swap, ii, jj)
        order = np.lexsort((keys[i2], keys[i1]))[:LLM_PAIR_CAP]
        a1 = pa.array(i1[order], pa.int64())
        a2 = pa.array(i2[order], pa.int64())
        return pa.table(
            {
                "custkey1": batch["c_custkey"].take(a1),
                "custkey2": batch["c_custkey"].take(a2),
                "name1": batch["c_name"].take(a1),
                "name2": batch["c_name"].take(a2),
                "bal1": batch["c_acctbal"].take(a1),
                "bal2": batch["c_acctbal"].take(a2),
            }
        )

    def empty(batch, *_):
        s = batch["c_name"].slice(0, 0)
        d = batch["c_acctbal"].slice(0, 0)
        return pa.table(
            {
                "custkey1": batch["c_custkey"].slice(0, 0),
                "custkey2": batch["c_custkey"].slice(0, 0),
                "name1": s, "name2": s, "bal1": d, "bal2": d,
            }
        )

    pairs = grouped_kernel(ds, "_bk", _pair_kernel(score, empty))
    capped = pairs.sort(["custkey1", "custkey2"]).limit(LLM_PAIR_CAP)

    def ai_surrogate(b: pa.Table) -> pa.Table:
        n1 = b["name1"].to_pylist()
        n2 = b["name2"].to_pylist()
        name_sim = edit_similarity_batch(n1, n2)
        name_jac = ngram_jaccard_batch(n1, n2, 1)
        bal1 = b["bal1"].to_numpy(zero_copy_only=False)
        bal2 = b["bal2"].to_numpy(zero_copy_only=False)
        bal_prox = 1.0 - np.abs(bal1 - bal2) / np.maximum(
            np.maximum(np.abs(bal1), np.abs(bal2)), 1.0
        )
        raw = np.round(0.5 * name_sim + 0.3 * name_jac + 0.2 * bal_prox, 6)
        ki = np.nonzero(raw > LLM_AI_THRESHOLD)[0]
        kia = pa.array(ki, pa.int64())
        return pa.table(
            {
                "custkey1": b["custkey1"].take(kia),
                "custkey2": b["custkey2"].take(kia),
                "ai_score": pa.array(raw[ki], pa.float64()),
            }
        )

    return capped.map_batches(ai_surrogate, batch_format="pyarrow")


SQL_LLM_PAIR_CAP = """
WITH pairs AS (
  SELECT a.c_custkey AS custkey1, b.c_custkey AS custkey2,
         a.c_name AS name1, b.c_name AS name2,
         a.c_acctbal AS bal1, b.c_acctbal AS bal2
  FROM customer a JOIN customer b
    ON a.c_mktsegment = b.c_mktsegment AND a.c_nationkey = b.c_nationkey
   AND a.c_custkey < b.c_custkey
  ORDER BY custkey1, custkey2
  LIMIT 500
), scored AS (
  SELECT custkey1, custkey2,
         round(0.5 * (1.0 - levenshtein(name1, name2)::DOUBLE /
                      greatest(length(name1), length(name2)))
             + 0.3 * jaccard(name1, name2)
             + 0.2 * (1.0 - abs(bal1 - bal2) /
                      greatest(abs(bal1), abs(bal2), 1.0)), 6) AS ai_score
  FROM pairs
)
SELECT custkey1, custkey2, ai_score FROM scored WHERE ai_score > 0.4
"""


# ---------------------------------------------------------------------------
# J3/F4: vector similarity within label blocks (embeddings)
# ---------------------------------------------------------------------------

VECTOR_PAIRS_THRESHOLD = 0.38  # driver embeddings: max within-label cos ~0.45


def q_vector_pairs(sf_dir: str):
    from .dedup import embedding_dedup

    ds = _read(sf_dir, "embeddings")
    pairs = embedding_dedup(ds, "label", id_col="vec_id", vec_col="embedding",
                            threshold=VECTOR_PAIRS_THRESHOLD)
    return pairs.map_batches(
        lambda b: pa.table(
            {
                "vec_id1": b["id1"],
                "vec_id2": b["id2"],
                "cosine_sim": pa.array(
                    _round(b["similarity"].to_numpy(zero_copy_only=False)),
                    pa.float64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )


# embedding is list<float32>: cast to DOUBLE[] so DuckDB evaluates (and
# returns) float64 like the engine; without the cast the oracle column is
# float32 and every row hash-mismatches.
SQL_VECTOR_PAIRS = f"""
SELECT a.vec_id AS vec_id1, b.vec_id AS vec_id2,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine_sim
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= {VECTOR_PAIRS_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# F6/A1/A2: business rules + weighted ensemble + decisions (customer)
# ---------------------------------------------------------------------------

def q_combined_scores(sf_dir: str):
    ds = _read(sf_dir, "customer", columns=["c_custkey", "c_name", "c_mktsegment", "c_nationkey", "c_acctbal"]).map_batches(
        lambda b: b.append_column("_bk", pc.cast(b["c_nationkey"], pa.string())),
        batch_format="pyarrow",
    )

    def score(batch, ii, jj):
        keys = batch["c_custkey"].to_numpy(zero_copy_only=False)
        names = batch["c_name"].to_pylist()
        segs = batch["c_mktsegment"].to_pylist()
        bal = batch["c_acctbal"].to_numpy(zero_copy_only=False)
        swap = keys[ii] > keys[jj]
        a = np.where(swap, jj, ii)
        b_ = np.where(swap, ii, jj)
        na = [names[i] for i in a]
        nb = [names[i] for i in b_]
        exact = np.array([x == y for x, y in zip(na, nb)], dtype=np.float64)
        fuzzy = _round(edit_similarity_batch(na, nb))
        seg_score = np.where(
            np.array([segs[x] == segs[y] for x, y in zip(a, b_)]), 0.3, 0.0
        )
        ba, bb = bal[a], bal[b_]
        with np.errstate(invalid="ignore", divide="ignore"):
            ratio = np.where(
                (ba > 0) & (bb > 0), np.minimum(ba, bb) / np.maximum(ba, bb), 0.0
            )
        bal_score = np.where(ratio >= 0.8, 0.1, 0.0)
        business = _round(seg_score + bal_score)
        combined = _round(0.33 * exact + 0.28 * fuzzy + 0.17 * business)
        decision = np.where(
            combined >= 0.8, "auto_merge",
            np.where(combined >= 0.6, "human_review", "no_match"),
        )
        keep = combined > 0.2
        return pa.table(
            {
                "custkey1": pa.array(keys[a], pa.int64()),
                "custkey2": pa.array(keys[b_], pa.int64()),
                "exact_score": pa.array(exact, pa.float64()),
                "fuzzy_score": pa.array(fuzzy, pa.float64()),
                "business_score": pa.array(business, pa.float64()),
                "combined_score": pa.array(combined, pa.float64()),
                "match_decision": pa.array(decision.tolist(), pa.string()),
            }
        ).filter(pa.array(keep))

    def empty(batch, *_):
        return pa.table(
            {
                "custkey1": pa.array([], pa.int64()),
                "custkey2": pa.array([], pa.int64()),
                "exact_score": pa.array([], pa.float64()),
                "fuzzy_score": pa.array([], pa.float64()),
                "business_score": pa.array([], pa.float64()),
                "combined_score": pa.array([], pa.float64()),
                "match_decision": pa.array([], pa.string()),
            }
        )

    return grouped_kernel(ds, "_bk", _pair_kernel(score, empty))


SQL_COMBINED_SCORES = """
WITH pairs AS (
  SELECT a.c_custkey AS custkey1, b.c_custkey AS custkey2,
         CASE WHEN a.c_name = b.c_name THEN 1.0 ELSE 0.0 END AS exact_score,
         round(1.0 - levenshtein(a.c_name, b.c_name)::DOUBLE /
               greatest(length(a.c_name), length(b.c_name)), 6) AS fuzzy_score,
         round(CASE WHEN a.c_mktsegment = b.c_mktsegment THEN 0.3 ELSE 0.0 END +
               CASE WHEN a.c_acctbal > 0 AND b.c_acctbal > 0
                     AND least(a.c_acctbal, b.c_acctbal) /
                         greatest(a.c_acctbal, b.c_acctbal) >= 0.8
                    THEN 0.1 ELSE 0.0 END, 6) AS business_score
  FROM customer a JOIN customer b
    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
)
SELECT custkey1, custkey2, exact_score, fuzzy_score, business_score,
       round(0.33*exact_score + 0.28*fuzzy_score + 0.17*business_score, 6)
         AS combined_score,
       CASE WHEN round(0.33*exact_score + 0.28*fuzzy_score + 0.17*business_score, 6) >= 0.8
              THEN 'auto_merge'
            WHEN round(0.33*exact_score + 0.28*fuzzy_score + 0.17*business_score, 6) >= 0.6
              THEN 'human_review'
            ELSE 'no_match' END AS match_decision
FROM pairs
WHERE round(0.33*exact_score + 0.28*fuzzy_score + 0.17*business_score, 6) > 0.2
"""


# ---------------------------------------------------------------------------
# A4: connected components (part fuzzy edges) — oracle via recursive CTE
# ---------------------------------------------------------------------------

CC_EDGE_THRESHOLD = 0.72


def q_cluster_cc(sf_dir: str):
    from .cluster import connected_components, init_labels
    from .config import EngineConfig

    pairs = q_fuzzy_pairs(sf_dir)

    # CC is label-type-agnostic (grouped-min via value-ranked dictionary
    # codes), so nodes ride as raw int64 — no string padding, cheap exchanges
    def to_edges(b: pa.Table) -> pa.Table:
        kept = b.filter(pc.greater_equal(b["name_edit_sim"], CC_EDGE_THRESHOLD))
        s1 = kept["partkey1"].combine_chunks()
        s2 = kept["partkey2"].combine_chunks()
        return pa.table(
            {
                "src": pa.concat_arrays([s1, s2]),
                "dst": pa.concat_arrays([s2, s1]),
            }
        )

    edges = pairs.map_batches(to_edges, batch_format="pyarrow")
    nodes = _read(sf_dir, "part", columns=["p_partkey"]).map_batches(
        lambda b: pa.table({"doc_id": b["p_partkey"]}),
        batch_format="pyarrow",
    )
    labels = connected_components(edges, init_labels(nodes), EngineConfig(cc_num_partitions=8))
    return labels.map_batches(
        lambda b: pa.table(
            {
                "p_partkey": pc.cast(b["node"], pa.int64()),
                "cluster_id": pc.cast(b["label"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


SQL_CLUSTER_CC = f"""
WITH RECURSIVE edges AS (
  SELECT a.p_partkey AS src, b.p_partkey AS dst
  FROM part a JOIN part b ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
  WHERE round(1.0 - levenshtein(a.p_name, b.p_name)::DOUBLE /
        greatest(length(a.p_name), length(b.p_name)), 6) >= {CC_EDGE_THRESHOLD}
),
bidir AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
reach(src, dst) AS (
  SELECT p_partkey, p_partkey FROM part
  UNION
  SELECT r.src, b.dst FROM reach r JOIN bidir b ON r.dst = b.src
)
SELECT src AS p_partkey, min(dst) AS cluster_id FROM reach GROUP BY src
"""


# ---------------------------------------------------------------------------
# A5/A6/F7: survivorship + deterministic entity ids (customer pseudo-clusters)
# ---------------------------------------------------------------------------

def q_survivorship(sf_dir: str):
    """Pseudo-cluster survivorship incl. the golden-record date fields:
    first_seen = MIN / last_activity = MAX of the member customers' order
    dates (mirrors bigquery_utils.py:750-751 MIN(registration_date) /
    MAX(last_activity_date); pre-aggregated per customer so member_count
    stays a customer count, then a small hash join)."""
    from ray.data.aggregate import Count, Max, Min

    ds = _add_block_key(
        _read(sf_dir, "customer", columns=["c_custkey", "c_name", "c_mktsegment", "c_nationkey", "c_acctbal"]),
        ["c_mktsegment", "c_nationkey"],
        name="cluster_key",
    )

    def date_str(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": b["o_custkey"],
                "_odate": pc.strftime(b["o_orderdate"], format="%Y-%m-%d"),
            }
        )

    per_cust = (
        _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
        .map_batches(date_str, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Min("_odate"), Max("_odate"))
    )
    from .dsutil import copartition_join

    joined = copartition_join(
        ds, per_cust, on="c_custkey", right_on="o_custkey",
        how="left_outer", n=8,
    )

    def rank(b: pa.Table) -> pa.Table:
        names = b["c_name"].to_pylist()
        comp = [f"{len(x):04d}|{x}" for x in names]
        return b.append_column("_name_rank", pa.array(comp, pa.string()))

    agged = joined.map_batches(rank, batch_format="pyarrow").groupby("cluster_key").aggregate(
        Count(), Max("_name_rank"), Max("c_acctbal"), Min("c_custkey"),
        Min("min(_odate)"), Max("max(_odate)"),
    )

    def finalize(b: pa.Table) -> pa.Table:
        names = [x.split("|", 1)[1] for x in b["max(_name_rank)"].to_pylist()]
        return pa.table(
            {
                "cluster_key": b["cluster_key"],
                "master_name": pa.array(names, pa.string()),
                "master_acctbal": pa.array(
                    _round(b["max(c_acctbal)"].to_numpy(zero_copy_only=False)),
                    pa.float64(),
                ),
                "member_count": b["count()"],
                "min_custkey": b["min(c_custkey)"],
                "first_seen": pc.cast(b["min(min(_odate))"], pa.string()),
                "last_activity": pc.cast(b["max(max(_odate))"], pa.string()),
            }
        )

    return agged.map_batches(finalize, batch_format="pyarrow")


SQL_SURVIVORSHIP = """
WITH per_cust AS (
  SELECT o_custkey, min(strftime(o_orderdate, '%Y-%m-%d')) AS f,
         max(strftime(o_orderdate, '%Y-%m-%d')) AS l
  FROM orders GROUP BY o_custkey
)
SELECT c_mktsegment || '|' || c_nationkey AS cluster_key,
       split_part(max(lpad(length(c_name)::VARCHAR, 4, '0') || '|' || c_name), '|', 2)
         AS master_name,
       round(max(c_acctbal), 6) AS master_acctbal,
       count(*) AS member_count,
       min(c_custkey) AS min_custkey,
       min(f) AS first_seen,
       max(l) AS last_activity
FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey
GROUP BY c_mktsegment, c_nationkey
"""


def q_entity_ids(sf_dir: str):
    def fn(b: pa.Table) -> pa.Table:
        names = b["c_name"].to_pylist()
        ids = [
            hashlib.sha256(f"email:{n.lower()}".encode()).hexdigest()[:36]
            for n in names
        ]
        return pa.table(
            {
                "c_custkey": b["c_custkey"],
                "master_id": pa.array(ids, pa.string()),
            }
        )

    return _read(sf_dir, "customer").map_batches(fn, batch_format="pyarrow")


SQL_ENTITY_IDS = """
SELECT c_custkey, substr(sha256('email:' || lower(c_name)), 1, 36) AS master_id
FROM customer
"""


# ---------------------------------------------------------------------------
# O2: deterministic top-k ordering
# ---------------------------------------------------------------------------

TOPK_N = 200


def q_top_matches(sf_dir: str):
    pairs = q_jaro_pairs(sf_dir)
    return pairs.sort(
        ["jw_sim", "partkey1", "partkey2"], descending=[True, False, False]
    ).limit(TOPK_N)


SQL_TOP_MATCHES = f"""
SELECT * FROM ({SQL_JARO_PAIRS})
ORDER BY jw_sim DESC, partkey1, partkey2 LIMIT {TOPK_N}
"""


# ---------------------------------------------------------------------------
# O5 / ANN: top-k cosine neighbors
# ---------------------------------------------------------------------------

ANN_K = 5
ANN_NUM_QUERIES = 10


def _ann_queries(sf_dir: str) -> pa.Table:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    mask = pc.less(t["vec_id"], ANN_NUM_QUERIES)
    return t.filter(mask)


def q_ann_topk(sf_dir: str):
    from .similarity import ann_bruteforce

    ds = _read(sf_dir, "embeddings")
    out = ann_bruteforce(ds, _ann_queries(sf_dir), k=ANN_K)
    return out.map_batches(
        lambda b: pa.table(
            {
                "query_id": b["query_id"],
                "neighbor_id": b["neighbor_id"],
                "cosine_sim": pa.array(
                    _round(b["similarity"].to_numpy(zero_copy_only=False)), pa.float64()
                ),
                "rank": b["rank"],
            }
        ),
        batch_format="pyarrow",
    )


SQL_ANN_TOPK = f"""
SELECT query_id, neighbor_id, round(sim, 6) AS cosine_sim, rank FROM (
  SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
         list_cosine_similarity(q.embedding::DOUBLE[], d.embedding::DOUBLE[]) AS sim,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], d.embedding::DOUBLE[]) DESC, d.vec_id
         ) AS rank
  FROM embeddings q JOIN embeddings d ON q.vec_id <> d.vec_id
  WHERE q.vec_id < {ANN_NUM_QUERIES}
)
WHERE rank <= {ANN_K}
"""


# ---------------------------------------------------------------------------
# Dedup family
# ---------------------------------------------------------------------------

def q_dedup_exact(sf_dir: str):
    from .dedup import exact_dedup

    return exact_dedup(_read(sf_dir, "documents"), "doc_id", "text")


SQL_DEDUP_EXACT = """
SELECT min(doc_id) AS doc_id, text, count(*) AS group_size
FROM documents GROUP BY text
"""

JACCARD_THRESHOLD = 0.9


def q_dedup_jaccard(sf_dir: str):
    from .dedup import jaccard_block_dedup

    ds = _add_block_key(_read(sf_dir, "documents"), ["lang", "source"], name="_blk")
    pairs = jaccard_block_dedup(ds, "_blk", "doc_id", "text",
                                threshold=JACCARD_THRESHOLD, ngram=1)
    return pairs.map_batches(
        lambda b: pa.table(
            {
                "doc_id1": b["id1"],
                "doc_id2": b["id2"],
                "jaccard_sim": pa.array(
                    _round(b["similarity"].to_numpy(zero_copy_only=False)), pa.float64()
                ),
            }
        ),
        batch_format="pyarrow",
    )


SQL_DEDUP_JACCARD = f"""
SELECT a.doc_id AS doc_id1, b.doc_id AS doc_id2,
       round(jaccard(a.text, b.text), 6) AS jaccard_sim
FROM documents a JOIN documents b
  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
WHERE jaccard(a.text, b.text) >= {JACCARD_THRESHOLD}
"""

EMB_DEDUP_THRESHOLD = 0.3  # near-dup tier below the vector-match threshold


def q_dedup_embedding(sf_dir: str):
    from .dedup import embedding_dedup

    pairs = embedding_dedup(
        _read(sf_dir, "embeddings"), "label", threshold=EMB_DEDUP_THRESHOLD
    )
    return pairs.map_batches(
        lambda b: pa.table(
            {
                "vec_id1": b["id1"],
                "vec_id2": b["id2"],
                "cosine_sim": pa.array(
                    _round(b["similarity"].to_numpy(zero_copy_only=False)), pa.float64()
                ),
            }
        ),
        batch_format="pyarrow",
    )


# DOUBLE[] cast: see SQL_VECTOR_PAIRS.
SQL_DEDUP_EMBEDDING = f"""
SELECT a.vec_id AS vec_id1, b.vec_id AS vec_id2,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine_sim
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= {EMB_DEDUP_THRESHOLD}
"""


MINHASH_THRESHOLD = 0.9  # the near-dup tier LSH can catch with P(miss)≈3e-8


def q_dedup_minhash(sf_dir: str):
    """Global MinHash-LSH near-dup pairs, exact-verified at 5-shingle Jaccard
    ≥ 0.9. 16 bands × 4 rows: candidate probability at ≥0.9 similarity is
    1 − 3e-8 per pair (deterministic given the seed — oracle equality
    verifies no pair is missed), while background pairs (J ≈ 0.25) collide
    rarely (s⁴ ≈ 0.004/band). A threshold much below ~0.85 would need more
    bands/rows for exact recall — the operator takes num_perm/bands
    parameters for that; the signature-estimate prefilter (est ≥ t − 0.3)
    prunes the background candidates before the text join either way."""
    from .dedup import minhash_lsh_dedup

    pairs = minhash_lsh_dedup(
        _read(sf_dir, "documents"), "doc_id", "text",
        threshold=MINHASH_THRESHOLD, shingle_k=5, num_perm=64, bands=16,
    )
    return pairs.map_batches(
        lambda b: pa.table(
            {
                "doc_id1": b["id1"],
                "doc_id2": b["id2"],
                "jaccard_sim": pa.array(
                    _round(b["similarity"].to_numpy(zero_copy_only=False)),
                    pa.float64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )


# Brute-force oracle: DuckDB 5-shingle sets via generate_series/list_transform;
# intersect-over-union with the same substring semantics as simfuncs.ngram_set
# (texts shorter than k collapse to [text]). The length-ratio join predicate
# is implied by Jaccard ≥ t (|A|/|B| ≥ t) and prunes the O(n²) pair space.
SQL_DEDUP_MINHASH = f"""
WITH sh AS MATERIALIZED (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(length(text) - 4, 1)),
           i -> substring(text, i, 5))) AS s
  FROM documents
)
SELECT a.doc_id AS doc_id1, b.doc_id AS doc_id2,
       round(len(list_intersect(a.s, b.s))::DOUBLE /
             (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6)
         AS jaccard_sim
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
   AND len(a.s)::DOUBLE >= {MINHASH_THRESHOLD} * len(b.s)
   AND len(b.s)::DOUBLE >= {MINHASH_THRESHOLD} * len(a.s)
WHERE len(list_intersect(a.s, b.s))::DOUBLE /
      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= {MINHASH_THRESHOLD}
"""


def q_dedup_simhash(sf_dir: str):
    # bands=16 > max_hamming → pigeonhole-exact recall (dedup.simhash_dedup),
    # so the output equals the SQL brute-force Hamming oracle exactly
    from .dedup import simhash_dedup

    return simhash_dedup(
        _read(sf_dir, "documents"), "doc_id", "text",
        max_hamming=SIMHASH_MAX_HAMMING, bands=16,
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

def q_token_count(sf_dir: str):
    from .textstats import token_count_batch

    out = _read(sf_dir, "documents").map_batches(
        token_count_batch, batch_format="pyarrow"
    )
    return out.select_columns(["doc_id", "n_tokens", "n_chars"])


SQL_TOKEN_COUNT = """
SELECT doc_id, len(string_split(text, ' ')) AS n_tokens, length(text) AS n_chars
FROM documents
"""


def q_quality(sf_dir: str):
    from .textstats import quality_score_batch

    out = _read(sf_dir, "documents").map_batches(
        quality_score_batch, batch_format="pyarrow"
    )

    def rounded(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "mean_word_len": pa.array(
                    _round(b["mean_word_len"].to_numpy(zero_copy_only=False)), pa.float64()
                ),
                "stopword_ratio": pa.array(
                    _round(b["stopword_ratio"].to_numpy(zero_copy_only=False)), pa.float64()
                ),
                "digit_ratio": pa.array(
                    _round(b["digit_ratio"].to_numpy(zero_copy_only=False)), pa.float64()
                ),
            }
        )

    return out.map_batches(rounded, batch_format="pyarrow")


_SW = "'" + "','".join(sorted(
    {"the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "on", "for",
     "with", "as", "at", "by", "this", "that", "be", "are", "was", "from"}
)) + "'"

SQL_QUALITY = f"""
SELECT doc_id,
       round(length(replace(text, ' ', ''))::DOUBLE /
             len(string_split(text, ' ')), 6) AS mean_word_len,
       round(len(list_filter(string_split(lower(text), ' '),
                             x -> x IN ({_SW})))::DOUBLE /
             len(string_split(text, ' ')), 6) AS stopword_ratio,
       round((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE /
             length(text), 6) AS digit_ratio
FROM documents
"""


def q_lang_id(sf_dir: str):
    from .textstats import lang_id_batch

    return _read(sf_dir, "documents").map_batches(lang_id_batch, batch_format="pyarrow")


def _lang_id_sql() -> str:
    """Independent SQL implementation of the same public marker-count
    heuristic: occurrences via length(replace(...)) (non-overlapping, matching
    str.count), argmax with first-declared-language tie-break."""
    from .textstats import _LANG_MARKERS

    score_exprs, cases = [], []
    for lang, markers in _LANG_MARKERS.items():
        terms = " + ".join(
            f"(length(t) - length(replace(t, '{m}', ''))) // {len(m)}"
            for m in markers
        )
        score_exprs.append(f"({terms}) AS s_{lang}")
        cases.append(f"WHEN s_{lang} = m THEN '{lang}'")
    langs = list(_LANG_MARKERS)
    greatest = "greatest(" + ", ".join(f"s_{l}" for l in langs) + ")"
    return f"""
WITH scored AS (
  SELECT doc_id, {', '.join(score_exprs)}
  FROM (SELECT doc_id, ' ' || lower(text) || ' ' AS t FROM documents)
)
SELECT doc_id,
       CASE WHEN {greatest} <= 0 THEN 'und' {' '.join(cases)} END AS predicted_lang
FROM (SELECT doc_id, {', '.join(f's_{l}' for l in langs)}, {greatest} AS m FROM scored)
"""


SQL_LANG_ID = _lang_id_sql()


def q_fingerprint(sf_dir: str):
    from .textstats import fingerprint_batch

    return _read(sf_dir, "documents").map_batches(
        fingerprint_batch, batch_format="pyarrow"
    ).select_columns(["doc_id", "fingerprint_min"])


# md5-window hash == textstats._fp_hash; tokenization matches exactly
SQL_FINGERPRINT = """
WITH tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ts
  FROM documents
)
SELECT doc_id,
  CASE WHEN len(ts) = 0 THEN 0
       WHEN len(ts) < 8 THEN
         ('0x' || substring(md5(array_to_string(ts, ' ')), 1, 15))::BIGINT
       ELSE list_min(list_transform(generate_series(1, len(ts) - 7),
         i -> ('0x' || substring(md5(array_to_string(list_slice(ts, i, i + 7), ' ')), 1, 15))::BIGINT))
  END AS fingerprint_min
FROM tok
"""


# Full simhash in SQL: identical md5 token hashes, per-bit sign sums, HUGEINT
# bit assembly, popcount Hamming — an end-to-end independent oracle for the
# distributed LSH + salting machinery.
SIMHASH_MAX_HAMMING = 10

SQL_DEDUP_SIMHASH = f"""
WITH tok AS (
  SELECT doc_id,
         list_transform(list_filter(string_split(text, ' '), x -> x <> ''),
                        t -> ('0x' || substring(md5(t), 1, 16))::UBIGINT) AS hs
  FROM documents
), fp AS (
  SELECT doc_id, len(hs) AS nt,
    (CASE WHEN len(hs) = 0 THEN 0::HUGEINT ELSE
      list_sum(list_transform(generate_series(0, 63), i ->
        CASE WHEN list_sum(list_transform(hs, h ->
               CASE WHEN ((h >> i) & 1) = 1 THEN 1 ELSE -1 END)) > 0
             THEN (1::HUGEINT << i) ELSE 0::HUGEINT END))
    END)::UBIGINT AS f
  FROM tok
)
SELECT a.doc_id AS id1, b.doc_id AS id2,
       (64 - bit_count(xor(a.f, b.f)))::DOUBLE AS similarity
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE a.nt > 0 AND b.nt > 0
  AND bit_count(xor(a.f, b.f)) <= {SIMHASH_MAX_HAMMING}
"""


# ---------------------------------------------------------------------------
# Event-stream operators (events table): sessionization, tumbling windows,
# as-of join — see mdm_ray/events.py for the kernels + partitioning notes
# ---------------------------------------------------------------------------

SESSION_GAP_MINUTES = 30
WINDOW_MINUTES = 60


def q_sessionize(sf_dir: str):
    from .events import sessionize

    return sessionize(
        _read(sf_dir, "events",
              columns=["event_id", "ts", "user_id", "value"]),
        gap_minutes=SESSION_GAP_MINUTES,
    )


SQL_SESSIONIZE = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id)
                   > {SESSION_GAP_MINUTES * 60_000_000}
              THEN 1 ELSE 0 END AS new_s
  FROM events
), sess AS (
  SELECT user_id, ts, value,
         CAST(1 + sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_seq
  FROM flagged
)
SELECT user_id, session_seq, count(*) AS n_events,
       epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us,
       round(sum(value), 6) AS total_value
FROM sess GROUP BY user_id, session_seq
"""


def q_window_agg(sf_dir: str):
    from .events import window_agg

    return window_agg(
        _read(sf_dir, "events", columns=["ts", "event_type", "value"]),
        window_minutes=WINDOW_MINUTES,
    )


SQL_WINDOW_AGG = f"""
SELECT event_type,
       (epoch_us(ts) // {WINDOW_MINUTES * 60_000_000})
         * {WINDOW_MINUTES * 60_000_000} AS window_start_us,
       count(*) AS n_events,
       round(sum(value), 6) AS total_value
FROM events GROUP BY 1, 2
"""


HOP_MINUTES = 15
_HOP_US = HOP_MINUTES * 60_000_000
_SLIDE_K = WINDOW_MINUTES // HOP_MINUTES


def q_sliding_window(sf_dir: str):
    from .events import sliding_window_agg

    return sliding_window_agg(
        _read(sf_dir, "events", columns=["ts", "event_type", "value"]),
        window_minutes=WINDOW_MINUTES, hop_minutes=HOP_MINUTES,
    )


SQL_SLIDING_WINDOW = f"""
SELECT event_type, ws AS window_start_us,
       count(*) AS n_events, round(sum(value), 6) AS total_value
FROM (
  SELECT event_type, value,
         unnest(generate_series(
           (epoch_us(ts) // {_HOP_US}) * {_HOP_US} - {(_SLIDE_K - 1) * _HOP_US},
           (epoch_us(ts) // {_HOP_US}) * {_HOP_US},
           {_HOP_US})) AS ws
  FROM events)
WHERE ws >= 0
GROUP BY 1, 2
"""


def q_range_join(sf_dir: str):
    from .events import interval_join, sessionize

    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "value"])
    sess = sessionize(ev, gap_minutes=SESSION_GAP_MINUTES)
    return interval_join(ev, sess)


SQL_RANGE_JOIN = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id)
                   > {SESSION_GAP_MINUTES * 60_000_000}
              THEN 1 ELSE 0 END AS new_s
  FROM events
), bounds AS (
  SELECT user_id,
         CAST(1 + sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_seq,
         ts
  FROM flagged
), spans AS (
  SELECT user_id, session_seq,
         epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us
  FROM bounds GROUP BY user_id, session_seq
)
SELECT e.event_id, e.user_id, epoch_us(e.ts) AS point_us, s.session_seq
FROM events e JOIN spans s
  ON e.user_id = s.user_id
 AND epoch_us(e.ts) BETWEEN s.start_us AND s.end_us
"""


CHUNK_HOURS = 2


def q_sessionize_chunked(sf_dir: str):
    """The two-level time-chunked sessionize scale path, hash-checked
    against the SAME SQL oracle as q_sessionize (outputs are identical by
    construction — events.py)."""
    from .events import sessionize

    return sessionize(
        _read(sf_dir, "events",
              columns=["event_id", "ts", "user_id", "value"]),
        gap_minutes=SESSION_GAP_MINUTES, chunk_hours=CHUNK_HOURS,
    )


def q_asof_join_chunked(sf_dir: str):
    from .events import asof_join

    return asof_join(
        _read(sf_dir, "events",
              columns=["event_id", "ts", "user_id", "event_type"]),
        "purchase", "click", chunk_hours=CHUNK_HOURS,
    )


def q_range_join_chunked(sf_dir: str):
    from .events import interval_join, sessionize

    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "value"])
    sess = sessionize(ev, gap_minutes=SESSION_GAP_MINUTES,
                      chunk_hours=CHUNK_HOURS)
    return interval_join(ev, sess, chunk_hours=CHUNK_HOURS)


def q_percentiles(sf_dir: str):
    """Exact per-group order statistics over events.value (distributed
    sort + metadata-routed picks — mdm_ray/quantiles.py)."""
    from .quantiles import group_percentiles

    return group_percentiles(
        _read(sf_dir, "events", columns=["event_type", "value"]),
        "event_type", "value",
    )


SQL_PERCENTILES = """
SELECT event_type,
       quantile_disc(value, 0.5) AS p50,
       quantile_disc(value, 0.95) AS p95,
       quantile_disc(value, 0.99) AS p99
FROM events GROUP BY event_type
"""


def q_asof_join(sf_dir: str):
    from .events import asof_join

    return asof_join(
        _read(sf_dir, "events",
              columns=["event_id", "ts", "user_id", "event_type"]),
        "purchase", "click",
    )


SQL_ASOF_JOIN = """
WITH pc AS (
  SELECT p.event_id AS purchase_id, epoch_us(p.ts) AS purchase_us,
         (SELECT c.event_id FROM events c
           WHERE c.user_id = p.user_id AND c.event_type = 'click'
             AND (c.ts < p.ts OR (c.ts = p.ts AND c.event_id < p.event_id))
           ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS click_id
  FROM events p WHERE p.event_type = 'purchase')
SELECT pc.purchase_id, pc.purchase_us, pc.click_id, epoch_us(e.ts) AS click_us
FROM pc LEFT JOIN events e ON e.event_id = pc.click_id
"""


# ---------------------------------------------------------------------------
# A8: analytics aggregate (lineitem) + deterministic sample
# ---------------------------------------------------------------------------

def q_analytics_agg(sf_dir: str):
    """A8 analytics rollup, partial-aggregate form: each batch reduces to
    its (returnflag, linestatus) partials in Acero (6 groups — the exchange
    carries O(groups x blocks) rows, never the 600k lineitems), then one
    tiny merge. Sums run in exact integer cents, so the result is identical
    at any parallelism/order (no float-sum order dependence)."""

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "l_returnflag" not in b.column_names:
            return pa.table({
                "grp": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "qty_c": pa.array([], pa.int64()),
                "price_c": pa.array([], pa.int64()),
                "disc_max": pa.array([], pa.float64()),
            })
        grp = pc.binary_join_element_wise(
            b["l_returnflag"], b["l_linestatus"], "|")
        t = pa.table({
            "grp": grp,
            "qty_c": pa.array(np.rint(
                b["l_quantity"].to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64), pa.int64()),
            "price_c": pa.array(np.rint(
                b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64), pa.int64()),
            "disc": b["l_discount"],
        })
        g = t.group_by(["grp"]).aggregate(
            [("qty_c", "count"), ("qty_c", "sum"), ("price_c", "sum"),
             ("disc", "max")]
        )
        return g.rename_columns(["grp", "n", "qty_c", "price_c", "disc_max"])

    def merge(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "grp" not in b.column_names:
            return pa.table({
                "grp": pa.array([], pa.string()),
                "row_count": pa.array([], pa.int64()),
                "sum_qty": pa.array([], pa.float64()),
                "avg_price": pa.array([], pa.float64()),
                "max_discount": pa.array([], pa.float64()),
            })
        g = b.group_by(["grp"]).aggregate(
            [("n", "sum"), ("qty_c", "sum"), ("price_c", "sum"),
             ("disc_max", "max")]
        )
        n = g["n_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "grp": g["grp"],
            "row_count": g["n_sum"],
            "sum_qty": pa.array(_round(
                g["qty_c_sum"].to_numpy(zero_copy_only=False) / 100.0),
                pa.float64()),
            "avg_price": pa.array(_round(
                g["price_c_sum"].to_numpy(zero_copy_only=False) / 100.0 / n),
                pa.float64()),
            "max_discount": pa.array(_round(
                g["disc_max_max"].to_numpy(zero_copy_only=False)), pa.float64()),
        })

    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity",
                        "l_extendedprice", "l_discount"])
    return ds.map_batches(
        partial, batch_size=None, batch_format="pyarrow"
    ).repartition(1, shuffle=False).map_batches(
        merge, batch_size=None, batch_format="pyarrow")


SQL_ANALYTICS_AGG = """
SELECT l_returnflag || '|' || l_linestatus AS grp,
       count(*) AS row_count,
       round(sum(l_quantity), 6) AS sum_qty,
       round(avg(l_extendedprice), 6) AS avg_price,
       round(max(l_discount), 6) AS max_discount
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


def q_sample_agg(sf_dir: str):
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents").map_batches(
        lambda b: b.filter(pc.equal(pc.bit_wise_and(b["doc_id"], 7), 0)),
        batch_format="pyarrow",
    )
    return ds.groupby("lang").count().map_batches(
        lambda b: pa.table({"lang": b["lang"], "sampled_docs": b["count()"]}),
        batch_format="pyarrow",
    )


SQL_SAMPLE_AGG = """
SELECT lang, count(*) AS sampled_docs FROM documents
WHERE doc_id % 8 = 0 GROUP BY lang
"""

TOPK_PER_GROUP_K = 3


def q_topk_per_group(sf_dir: str):
    """Top-k per group (curation primitive: keep the best docs per domain):
    top-3 documents per (lang, source) by n_chars desc, doc_id tiebreak.
    One sort exchange + vectorized per-block rank filter (dsutil)."""
    from .dsutil import top_k_per_group

    return top_k_per_group(
        _read(sf_dir, "documents", columns=["doc_id", "lang", "source", "n_chars"]),
        group_cols=["lang", "source"], order_col="n_chars",
        k=TOPK_PER_GROUP_K, tie_col="doc_id",
    )


SQL_TOPK_PER_GROUP = f"""
SELECT doc_id, lang, source, n_chars,
       CAST(row_number() OVER (PARTITION BY lang, source
                               ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank
FROM documents
QUALIFY rank <= {TOPK_PER_GROUP_K}
"""


RANDOM_SAMPLE_K = 500
_SAMPLE_MULT = 2654435761  # Knuth multiplicative hash constant


def q_random_sample(sf_dir: str):
    """O3: seeded random sample (``ORDER BY RAND() LIMIT k``,
    bigquery_utils.py:266-271), re-expressed with a deterministic pseudo-
    random key — h(doc_id) = (doc_id · 2654435761) mod 2³² — so the sampled
    SET is identical at any parallelism and exactly reproducible by the SQL
    oracle (the engine's random_shuffle(seed) subset depends on
    partitioning)."""

    def keyed(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids % np.uint64(2**32)) * np.uint64(_SAMPLE_MULT) % np.uint64(2**32)
        return pa.table(
            {"doc_id": b["doc_id"], "lang": b["lang"],
             "_h": pa.array(h.astype(np.int64), pa.int64())}
        )

    return (
        _read(sf_dir, "documents", columns=["doc_id", "lang"])
        .map_batches(keyed, batch_format="pyarrow")
        .sort(["_h", "doc_id"])
        .limit(RANDOM_SAMPLE_K)
        .drop_columns(["_h"])
    )


STRATIFIED_K = 50


def q_stratified_sample(sf_dir: str):
    """Seeded per-group sample: the deterministic-hash order of
    q_random_sample applied PER lang stratum (top_k_per_group with
    largest=False over the hash key) — the sampled set per stratum is
    identical at any parallelism and exactly reproducible in SQL."""
    from .dsutil import top_k_per_group

    def keyed(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids % np.uint64(2**32)) * np.uint64(_SAMPLE_MULT) % np.uint64(2**32)
        return pa.table(
            {"doc_id": b["doc_id"], "lang": b["lang"],
             "_h": pa.array(h.astype(np.int64), pa.int64())}
        )

    ds = (
        _read(sf_dir, "documents", columns=["doc_id", "lang"])
        .map_batches(keyed, batch_format="pyarrow")
    )
    return top_k_per_group(
        ds, ["lang"], "_h", STRATIFIED_K, "doc_id", largest=False
    ).drop_columns(["_h"])


SQL_STRATIFIED_SAMPLE = f"""
SELECT doc_id, lang, CAST(rn AS BIGINT) AS rank FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY ((doc_id % 4294967296)::HUGEINT * {_SAMPLE_MULT}) % 4294967296,
                    doc_id) AS rn
  FROM documents)
WHERE rn <= {STRATIFIED_K}
"""


def q_broadcast_join(sf_dir: str):
    """Dimension enrichment via BROADCAST join — the pattern for small-side
    joins at 100 TB: the nation->region lookup (tiny by construction) is
    assembled once on the driver, shipped once via ``ray.put``, and applied
    per batch with vectorized ``pc.index_in`` + ``take`` — the fact table
    never shuffles (the reference joins these dims in SQL; here the big side
    stays streaming)."""
    import ray

    nation = _read(sf_dir, "nation").to_arrow_refs()
    region = _read(sf_dir, "region").to_arrow_refs()
    ntab = pa.concat_tables([t for t in ray.get(nation) if t.num_rows] or ray.get(nation))
    rtab = pa.concat_tables([t for t in ray.get(region) if t.num_rows] or ray.get(region))
    r_by_key = {k: v for k, v in zip(rtab["r_regionkey"].to_pylist(),
                                     rtab["r_name"].to_pylist())}
    lookup_ref = ray.put(
        (
            ntab["n_nationkey"].combine_chunks(),
            ntab["n_name"].combine_chunks(),
            pa.array([r_by_key[k] for k in ntab["n_regionkey"].to_pylist()],
                     pa.string()),
        )
    )

    def enrich(b: pa.Table) -> pa.Table:
        nk, nname, rname = ray.get(lookup_ref)
        idx = pc.index_in(b["c_nationkey"], value_set=nk)
        return pa.table(
            {
                "c_custkey": b["c_custkey"],
                "n_name": nname.take(idx),
                "r_name": rname.take(idx),
            }
        )

    return _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey"]).map_batches(
        enrich, batch_format="pyarrow"
    )


SQL_BROADCAST_JOIN = """
SELECT c_custkey, n_name, r_name
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
"""


ANTI_JOIN_PRIORITY = "1-URGENT"


def q_anti_join(sf_dir: str):
    """Anti join: customers with NO urgent orders (the unfiltered variant is
    degenerate on this fixture — every customer has some order). The right
    side is filtered AT THE READ, distinct custkeys are pre-deduped per
    batch (combiner) so the exchange carries unique keys, then ONE
    copartition_join(left_outer) + null filter — no driver-side membership
    set, scale-safe on both sides."""
    from .dsutil import copartition_join, hash_partition_by

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal"])

    def local_unique(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "o_custkey" not in b.column_names:
            return pa.table({"c_custkey": pa.array([], pa.int64()),
                             "_has_order": pa.array([], pa.int8())})
        f = b.filter(pc.equal(b["o_orderpriority"], ANTI_JOIN_PRIORITY))
        u = pc.unique(f["o_custkey"].combine_chunks())
        return pa.table({"c_custkey": u,
                         "_has_order": pa.array(np.ones(len(u), np.int8))})

    order_keys = (
        hash_partition_by(
            _read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
            .map_batches(local_unique, batch_format="pyarrow"),
            "c_custkey",
        )
        .drop_columns(["_part"])
        .map_batches(local_unique_pass2, batch_format="pyarrow")
    )
    joined = copartition_join(cust, order_keys, on="c_custkey", how="left_outer")
    return joined.map_batches(
        lambda b: b.filter(pc.is_null(b["_has_order"])).select(
            ["c_custkey", "c_name", "c_acctbal"]),
        batch_format="pyarrow",
    )


def local_unique_pass2(b: pa.Table) -> pa.Table:
    """Second-stage dedup after co-location: equal keys are now in one block."""
    if b.num_rows == 0 or "c_custkey" not in b.column_names:
        return pa.table({"c_custkey": pa.array([], pa.int64()),
                         "_has_order": pa.array([], pa.int8())})
    u = pc.unique(b["c_custkey"].combine_chunks())
    return pa.table({"c_custkey": u,
                     "_has_order": pa.array(np.ones(len(u), np.int8))})


SQL_ANTI_JOIN = f"""
SELECT c_custkey, c_name, c_acctbal FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '{ANTI_JOIN_PRIORITY}')
"""


def q_distinct_count(sf_dir: str):
    """COUNT(DISTINCT) per group, two-stage: per-batch local distinct pairs
    (combiner), co-locate by the pair key so cross-batch duplicates meet in
    one block, second local distinct, then a tiny per-priority count merge —
    the exchange carries unique pairs, never raw rows."""
    from .dsutil import hash_partition_by

    def local_pairs(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "o_orderpriority" not in b.column_names:
            return pa.table({"o_orderpriority": pa.array([], pa.string()),
                             "o_custkey": pa.array([], pa.int64()),
                             "_pk": pa.array([], pa.string())})
        t = pa.table({"o_orderpriority": b["o_orderpriority"],
                      "o_custkey": b["o_custkey"]})
        g = t.group_by(["o_orderpriority", "o_custkey"]).aggregate([])
        return g.append_column(
            "_pk",
            pc.binary_join_element_wise(
                g["o_orderpriority"], pc.cast(g["o_custkey"], pa.string()), "|"),
        )

    def count_unique(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "o_orderpriority" not in b.column_names:
            return pa.table({"o_orderpriority": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        t = pa.table({"o_orderpriority": b["o_orderpriority"],
                      "o_custkey": b["o_custkey"]})
        g = t.group_by(["o_orderpriority", "o_custkey"]).aggregate([])
        c = g.group_by(["o_orderpriority"]).aggregate([("o_custkey", "count")])
        return c.rename_columns(["o_orderpriority", "n"])

    def merge(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "o_orderpriority" not in b.column_names:
            return pa.table({"o_orderpriority": pa.array([], pa.string()),
                             "distinct_customers": pa.array([], pa.int64())})
        g = b.group_by(["o_orderpriority"]).aggregate([("n", "sum")])
        return g.rename_columns(["o_orderpriority", "distinct_customers"])

    pairs = _read(sf_dir, "orders", columns=["o_orderpriority", "o_custkey"]).map_batches(local_pairs, batch_format="pyarrow")
    counted = hash_partition_by(pairs, "_pk").map_batches(
        lambda b: count_unique(
            b.select([c for c in b.column_names if c not in ("_pk", "_part")])),
        batch_size=None, batch_format="pyarrow",
    )
    return hash_partition_by(counted, "o_orderpriority", n=8).map_batches(
        lambda b: merge(
            b.select([c for c in b.column_names if c != "_part"])),
        batch_size=None, batch_format="pyarrow",
    )


SQL_DISTINCT_COUNT = """
SELECT o_orderpriority, count(DISTINCT o_custkey) AS distinct_customers
FROM orders GROUP BY o_orderpriority
"""


SQL_RANDOM_SAMPLE = f"""
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         ((doc_id % 4294967296)::HUGEINT * {_SAMPLE_MULT}) % 4294967296 AS h
  FROM documents
  ORDER BY h, doc_id LIMIT {RANDOM_SAMPLE_K}
)
"""


# media oracles: re-derive the deterministic payloads' decoded features in
# pure SQL — sha256(media_ref) seeds the pixel/sample generators exactly as
# codecs.synth_rgb / synth_pcm do (integer arithmetic end to end), the grid
# mirrors the 16x16→8x8 nearest-neighbor resize (source coords 2y, 2x), and
# the aggregates are exact integer sums, so the hash check is full-precision
SQL_MEDIA_FEATURES = """
WITH refs AS (
  SELECT 'm://' || CAST(doc_id AS VARCHAR) AS media_ref FROM documents
), base AS (
  SELECT media_ref,
         ('0x' || substr(sha256(media_ref), 1, 2))::INT AS b0,
         ('0x' || substr(sha256(media_ref), 3, 2))::INT AS b1,
         ('0x' || substr(sha256(media_ref), 5, 2))::INT AS b2
  FROM refs
), grid AS (
  SELECT y.g * 2 AS sy, x.g * 2 AS sx
  FROM generate_series(0, 7) AS y(g), generate_series(0, 7) AS x(g)
), px AS (
  SELECT media_ref,
         (b0 + (sx * 1 + sy * 3) * 7) % 256 AS r,
         (b1 + (sx * 2 + sy * 2) * 7) % 256 AS g,
         (b2 + (sx * 3 + sy * 1) * 7) % 256 AS b
  FROM base CROSS JOIN grid
)
SELECT media_ref,
       8::INT AS width, 8::INT AS height,
       AVG(r) AS mean_r, AVG(g) AS mean_g, AVG(b) AS mean_b
FROM px GROUP BY media_ref
"""


SQL_MEDIA_AUDIO = """
WITH refs AS (
  SELECT 'm://' || CAST(doc_id AS VARCHAR) AS media_ref FROM documents
), p AS (
  SELECT media_ref,
         16 + (('0x' || substr(sha256(media_ref), 1, 2))::INT % 240) AS step,
         1 + (('0x' || substr(sha256(media_ref), 3, 2))::INT % 15) AS m
  FROM refs
), s AS (
  SELECT media_ref, m * (((i.g * step) % 4096) - 2048) AS v
  FROM p CROSS JOIN generate_series(0, 799) AS i(g)
)
SELECT media_ref,
       100.0::DOUBLE AS duration_ms,
       round(sqrt(AVG((v::BIGINT * v)::DOUBLE)), 6) AS rms,
       8000::INT AS sample_rate,
       800::BIGINT AS n_samples
FROM s GROUP BY media_ref
"""


# ---------------------------------------------------------------------------
# End-to-end ER over a real parquet table — full SQL oracle incl. O1 ordering
# ---------------------------------------------------------------------------

E2E_EDGE_THRESHOLD = 0.85  # lev<=2 on the fixed-width customer names


def q_er_e2e(sf_dir: str):
    """The engine's ER machinery composed end-to-end over ``customer``:
    block → fuzzy pair scoring → connected components → survivorship →
    O1 presentation ordering (reference ``bigquery_utils.py:807`` ORDER BY
    source_record_count DESC, master_name), with the rank exposed as a
    ``presentation_rank`` column (``zip_with_index``) so the order-insensitive
    oracle compare still verifies the ordering exactly."""
    from ray.data.aggregate import Count, Max, Min

    from .cluster import connected_components, init_labels
    from .config import EngineConfig
    from .dsutil import zip_with_index

    ds = _add_block_key(
        _read(sf_dir, "customer", columns=["c_custkey", "c_name", "c_mktsegment", "c_nationkey", "c_acctbal"]),
        ["c_nationkey", "c_mktsegment"],
    )

    def score(batch, ii, jj):
        keys = batch["c_custkey"].to_numpy(zero_copy_only=False)
        names = batch["c_name"].to_pylist()
        sim = _round(edit_similarity_batch([names[i] for i in ii],
                                           [names[j] for j in jj]))
        keep = sim >= E2E_EDGE_THRESHOLD
        a = np.minimum(keys[ii], keys[jj])[keep]
        b_ = np.maximum(keys[ii], keys[jj])[keep]
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b_]), pa.int64()),
                "dst": pa.array(np.concatenate([b_, a]), pa.int64()),
            }
        )

    def empty(batch, *_):
        return pa.table(
            {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
        )

    edges = grouped_kernel(ds, "_bk", _pair_kernel(score, empty))
    nodes = ds.map_batches(
        lambda b: pa.table({"doc_id": b["c_custkey"]}), batch_format="pyarrow"
    )
    labels = connected_components(
        edges, init_labels(nodes), EngineConfig(cc_num_partitions=8)
    ).map_batches(
        lambda b: pa.table(
            {
                "l_custkey": pc.cast(b["node"], pa.int64()),
                "cluster_id": pc.cast(b["label"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    def rank(b: pa.Table) -> pa.Table:
        comp = [f"{len(x):04d}|{x}" for x in b["c_name"].to_pylist()]
        return b.append_column("_name_rank", pa.array(comp, pa.string()))

    from .dsutil import copartition_join

    golden = (
        copartition_join(
            ds.drop_columns(["_bk"]).map_batches(rank, batch_format="pyarrow"),
            labels, on="c_custkey", right_on="l_custkey", n=8,
        )
        .groupby("cluster_id")
        .aggregate(Count(), Max("_name_rank"), Max("c_acctbal"), Min("c_custkey"))
    )

    def finalize(b: pa.Table) -> pa.Table:
        names = [x.split("|", 1)[1] for x in b["max(_name_rank)"].to_pylist()]
        return pa.table(
            {
                "cluster_id": b["cluster_id"],
                "master_name": pa.array(names, pa.string()),
                "master_acctbal": pa.array(
                    _round(b["max(c_acctbal)"].to_numpy(zero_copy_only=False)),
                    pa.float64(),
                ),
                "source_record_count": b["count()"],
                "min_custkey": b["min(c_custkey)"],
            }
        )

    ordered = golden.map_batches(finalize, batch_format="pyarrow").sort(
        ["source_record_count", "master_name", "cluster_id"],
        descending=[True, False, False],
    )
    return zip_with_index(ordered, col="presentation_rank")


SQL_ER_E2E = f"""
WITH RECURSIVE edges AS (
  SELECT a.c_custkey AS src, b.c_custkey AS dst
  FROM customer a JOIN customer b
    ON a.c_nationkey = b.c_nationkey AND a.c_mktsegment = b.c_mktsegment
   AND a.c_custkey < b.c_custkey
  WHERE round(1.0 - levenshtein(a.c_name, b.c_name)::DOUBLE /
        greatest(length(a.c_name), length(b.c_name)), 6) >= {E2E_EDGE_THRESHOLD}
),
bidir AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
reach(src, dst) AS (
  SELECT c_custkey, c_custkey FROM customer
  UNION
  SELECT r.src, b.dst FROM reach r JOIN bidir b ON r.dst = b.src
),
labels AS (SELECT src AS c_custkey, min(dst) AS cluster_id FROM reach GROUP BY src),
golden AS (
  SELECT l.cluster_id,
         split_part(max(lpad(length(c_name)::VARCHAR, 4, '0') || '|' || c_name),
                    '|', 2) AS master_name,
         round(max(c_acctbal), 6) AS master_acctbal,
         count(*) AS source_record_count,
         min(c.c_custkey) AS min_custkey
  FROM customer c JOIN labels l ON c.c_custkey = l.c_custkey
  GROUP BY l.cluster_id
)
SELECT cluster_id, master_name, master_acctbal, source_record_count, min_custkey,
       row_number() OVER (
         ORDER BY source_record_count DESC, master_name, cluster_id
       ) AS presentation_rank
FROM golden
"""


# ---------------------------------------------------------------------------
# ER-fixture pipelines. The input corpus is SYNTHESIZED (invisible to the
# oracle's pre-registered parquet views), so each query side-exports its own
# intermediate tables (features / labels / candidate scores) to
# ``/tmp/mdm_ray_oracle_exports/<query>/`` and the oracle SQL reads those —
# a write-then-read contract: the driver runs the Ray query first, then its
# SQL (the order tools/check_oracles.py mimics). The SQL re-derives the
# OUTPUT from the exported INPUTS (full survivorship rules, the resolve
# join, the streaming argmax + decision thresholds), so the reduce/join/
# argmax operators are hash-checked, not just row-counted.
# ---------------------------------------------------------------------------

_ORACLE_EXPORT_ROOT = "/tmp/mdm_ray_oracle_exports"


def _export_for_oracle(name: str, tables: dict[str, pa.Table]) -> None:
    import os

    import pyarrow.parquet as pq

    d = os.path.join(_ORACLE_EXPORT_ROOT, name)
    os.makedirs(d, exist_ok=True)
    for t, tab in tables.items():
        pq.write_table(tab, os.path.join(d, t + ".parquet"))


def _collect(ds, columns: list[str] | None = None) -> pa.Table:
    from .dsutil import collect_table

    # select AFTER the concat so schema-less empty sort partitions (which
    # collect_table drops) can't break the projection
    tab = collect_table(ds.materialize())
    return tab.select(columns) if columns is not None else tab


ER_CUSTOMERS = {"0.001": 120, "0.01": 400, "0.1": 2000}


def _er_scale(sf_dir: str) -> int:
    for key, n in ER_CUSTOMERS.items():
        if f"sf{key}" in sf_dir:
            return n
    return 120


def q_er_golden(sf_dir: str):
    """Full batch ER; the survivorship reduce is oracle-checked: the query
    exports its (features, labels) inputs and SQL_ER_GOLDEN re-derives every
    master_* rule (longest-name composite max, doc_id-recency email/phone,
    sha256 master_id cascade, distinct record count) from them."""
    from . import pipeline, synth

    docs = synth.generate_documents_ray(_er_scale(sf_dir), parallelism=8)
    out = pipeline.run_er(docs)
    _export_for_oracle("er_golden", {
        "features": _collect(
            out["features"],
            columns=["doc_id", "full_name_clean", "email_clean", "phone_clean"],
        ),
        "labels": _collect(out["labels"]),
    })
    golden = out["golden"]
    return golden.map_batches(
        lambda b: b.select(
            ["cluster_id", "master_id", "master_name", "master_email",
             "master_phone", "source_record_count"]
        ),
        batch_format="pyarrow",
    )


def q_er_resolved(sf_dir: str):
    """Cluster→records resolve (J8): the sort-cogroup merge is oracle-checked
    against a plain SQL join of the exported (input docs, labels) tables."""
    from . import pipeline, synth

    n = _er_scale(sf_dir)
    docs = synth.generate_documents_ray(n, parallelism=8)
    out = pipeline.run_er(docs)
    resolve_input = synth.generate_documents_ray(n, parallelism=8)
    _export_for_oracle("er_resolved", {
        "docs": _collect(
            resolve_input.map_batches(
                lambda b: pa.table(
                    {
                        "doc_id": b["doc_id"],
                        "n_spans": pc.list_value_length(b["spans"]),
                    }
                ),
                batch_format="pyarrow",
            )
        ),
        "labels": _collect(out["labels"]),
    })
    resolved = pipeline.resolve_docs(resolve_input, out["labels"])
    return resolved.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"],
                "entity_id": b["entity_id"],
                "n_spans": pc.list_value_length(b["spans"]),
            }
        ),
        batch_format="pyarrow",
    )


def q_er_incremental(sf_dir: str):
    """Streaming-twin merge (SURVEY §2.9): batch ER on the fixture corpus,
    then an incremental batch (80% new / 20% drift) merged into the golden
    table. Oracle-checked: the query exports the raw candidate score table,
    the new-entity assignment map and the processed doc ids, and
    SQL_ER_INCREMENTAL re-derives match_results (per-doc argmax with the
    smallest-cluster tie-break, 0.8/0.6 decision thresholds, new-entity
    fallback) from them."""
    import ray.data

    from . import incremental, pipeline, synth

    n = min(_er_scale(sf_dir), 400)
    docs = ray.data.from_arrow(synth.generate_documents_local(n))
    golden = pipeline.run_er(docs, with_embeddings=False)["golden"].materialize()
    stream_tab = synth.generate_stream_docs(n, max(20, n // 4))
    out = incremental.incremental_merge(
        ray.data.from_arrow(stream_tab), golden,
    )
    _export_for_oracle("er_incremental", {
        "candidates": _collect(
            out["candidates"], columns=["doc_id", "cluster_id", "combined_score"]
        ),
        "new_entity_map": out["new_entity_map"],
        "stream_docs": stream_tab.select(["doc_id"]),
    })
    return out["match_results"].map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"],
                "entity_id": b["entity_id"],
                "action": b["action"],
                "combined_score": pa.array(
                    _round(b["combined_score"].to_numpy(zero_copy_only=False)),
                    pa.float64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )


# DuckDB twins over the queries' side-exports (write-then-read contract —
# see the section comment above). Paths are static because each query always
# exports to the same directory; the driver runs the query, then the SQL.

SQL_ER_GOLDEN = f"""
WITH f AS (SELECT * FROM read_parquet('{_ORACLE_EXPORT_ROOT}/er_golden/features.parquet')),
l AS (SELECT * FROM read_parquet('{_ORACLE_EXPORT_ROOT}/er_golden/labels.parquet')),
j AS (SELECT f.*, l.label AS cluster_id FROM f JOIN l ON f.doc_id = l.node),
raw AS (
  SELECT cluster_id,
         -- longest non-null name, ties by value (composite lpad-length max —
         -- survivorship.py _rank_columns; NULL name -> NULL composite)
         max(lpad(length(full_name_clean)::VARCHAR, 4, '0')
             || '|' || full_name_clean) AS rk_name,
         -- most recent = doc_id-order composite max (module determinism note)
         max(doc_id || '|' || email_clean) AS rk_email,
         max(doc_id || '|' || phone_clean) AS rk_phone,
         count(DISTINCT doc_id) AS source_record_count
  FROM j GROUP BY cluster_id
),
g AS (
  -- duckdb's split_part(NULL, ...) yields '' (not NULL), so guard the parse
  SELECT cluster_id, source_record_count,
         CASE WHEN rk_name IS NOT NULL
              THEN split_part(rk_name, '|', 2) END AS master_name,
         CASE WHEN rk_email IS NOT NULL
              THEN split_part(rk_email, '|', 2) END AS master_email,
         CASE WHEN rk_phone IS NOT NULL
              THEN split_part(rk_phone, '|', 2) END AS master_phone
  FROM raw
)
SELECT cluster_id,
       CASE WHEN master_email IS NOT NULL AND master_email <> ''
              THEN substr(sha256('email:' || master_email), 1, 36)
            WHEN master_phone IS NOT NULL AND master_phone <> ''
              THEN substr(sha256('phone:' || master_phone), 1, 36)
            ELSE cluster_id END AS master_id,
       master_name, master_email, master_phone, source_record_count
FROM g
"""

SQL_ER_RESOLVED = f"""
SELECT d.doc_id, l.label AS entity_id, d.n_spans
FROM read_parquet('{_ORACLE_EXPORT_ROOT}/er_resolved/docs.parquet') d
JOIN read_parquet('{_ORACLE_EXPORT_ROOT}/er_resolved/labels.parquet') l
  ON d.doc_id = l.node
"""

SQL_ER_INCREMENTAL = f"""
WITH cand AS (
  SELECT * FROM read_parquet('{_ORACLE_EXPORT_ROOT}/er_incremental/candidates.parquet')
),
best AS (
  SELECT doc_id,
         -- argmax entity: max combined score, ties to the smallest cluster_id
         -- (incremental._argmax_per_doc lexsort)
         first(cluster_id ORDER BY combined_score DESC, cluster_id) AS best_cluster,
         max(combined_score) AS best_score
  FROM cand GROUP BY doc_id
),
nem AS (
  SELECT * FROM read_parquet('{_ORACLE_EXPORT_ROOT}/er_incremental/new_entity_map.parquet')
),
docs AS (
  SELECT doc_id FROM read_parquet('{_ORACLE_EXPORT_ROOT}/er_incremental/stream_docs.parquet')
)
SELECT d.doc_id,
       CASE WHEN b.best_score >= 0.6 THEN b.best_cluster
            ELSE n.cluster_id END AS entity_id,
       CASE WHEN b.best_score >= 0.8 THEN 'auto_merge'
            WHEN b.best_score >= 0.6 THEN 'human_review'
            ELSE 'new_entity' END AS action,
       round(coalesce(b.best_score, 0.0), 6) AS combined_score
FROM docs d
LEFT JOIN best b ON d.doc_id = b.doc_id
LEFT JOIN nem n ON d.doc_id = n.doc_id
"""


def q_media_features(sf_dir: str):
    """Image decode + feature pipeline with a REAL strict-mode codec: each
    doc_id gets a deterministic 16x16 BMP payload (``codecs.synth_rgb`` —
    integer-exact, so the DuckDB oracle reproduces every pixel), the
    actor-pool ImageDecoder really parses the BMP and resizes to 8x8, and the
    features are per-channel means (exact: integer sums / 64)."""
    from .codecs import encode_bmp, synth_rgb
    from .media import decode_pipeline

    def to_media(b: pa.Table) -> pa.Table:
        refs = ["m://" + str(d) for d in b["doc_id"].to_pylist()]
        return pa.table(
            {
                "media_ref": pa.array(refs, pa.string()),
                "payload": pa.array(
                    [encode_bmp(synth_rgb(r, 16, 16)) for r in refs], pa.binary()
                ),
            }
        )

    media = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        to_media, batch_format="pyarrow"
    )
    decoded = decode_pipeline(media, mode="strict", out_hw=(8, 8))

    def feats(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0 or "pixels" not in b.column_names:
            return pa.table(
                {
                    "media_ref": pa.array([], pa.string()),
                    "width": pa.array([], pa.int32()),
                    "height": pa.array([], pa.int32()),
                    "mean_r": pa.array([], pa.float64()),
                    "mean_g": pa.array([], pa.float64()),
                    "mean_b": pa.array([], pa.float64()),
                }
            )
        flat = b["pixels"].combine_chunks()
        arr = (
            flat.values.to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(n, 8 * 8, 3)
        )
        means = arr.mean(axis=1)  # exact: integer sums < 2^53, then /64
        return pa.table(
            {
                "media_ref": b["media_ref"],
                "width": pa.array(np.full(n, 8, np.int32), pa.int32()),
                "height": pa.array(np.full(n, 8, np.int32), pa.int32()),
                "mean_r": pa.array(means[:, 0], pa.float64()),
                "mean_g": pa.array(means[:, 1], pa.float64()),
                "mean_b": pa.array(means[:, 2], pa.float64()),
            }
        )

    return decoded.map_batches(feats, batch_format="pyarrow")


def q_media_audio(sf_dir: str):
    """WAV decode pipeline with the REAL strict-mode PCM16 codec: each doc_id
    gets a deterministic integer-sawtooth WAV (``codecs.synth_pcm``), the
    AudioDecoder parses RIFF chunks and computes duration/RMS — all
    integer-exact up to one correctly-rounded division + sqrt, so the DuckDB
    oracle matches to full float precision (rounded to 6dp on both sides)."""
    from .codecs import encode_wav, synth_pcm
    from .media import audio_pipeline

    def to_media(b: pa.Table) -> pa.Table:
        refs = ["m://" + str(d) for d in b["doc_id"].to_pylist()]
        return pa.table(
            {
                "media_ref": pa.array(refs, pa.string()),
                "payload": pa.array(
                    [encode_wav(synth_pcm(r, 800, 8000), 8000) for r in refs],
                    pa.binary(),
                ),
            }
        )

    media = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        to_media, batch_format="pyarrow"
    )

    def rounded(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "rms" not in b.column_names:
            return pa.table(
                {
                    "media_ref": pa.array([], pa.string()),
                    "duration_ms": pa.array([], pa.float64()),
                    "rms": pa.array([], pa.float64()),
                    "sample_rate": pa.array([], pa.int32()),
                    "n_samples": pa.array([], pa.int64()),
                }
            )
        return b.set_column(
            b.column_names.index("rms"),
            "rms",
            pa.array(_round(b["rms"].to_numpy(zero_copy_only=False)), pa.float64()),
        )

    return audio_pipeline(media, mode="strict").map_batches(
        rounded, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# catalog
# ---------------------------------------------------------------------------

QUERIES = {
    "standardize": q_standardize,
    "ingest_filter": q_ingest_filter,
    "union_project": q_union_project,
    "exact_pairs": q_exact_pairs,
    "fuzzy_pairs": q_fuzzy_pairs,
    "jaro_pairs": q_jaro_pairs,
    "llm_pair_cap": q_llm_pair_cap,
    "vector_pairs": q_vector_pairs,
    "combined_scores": q_combined_scores,
    "cluster_cc": q_cluster_cc,
    "survivorship": q_survivorship,
    "entity_ids": q_entity_ids,
    "top_matches": q_top_matches,
    "ann_topk": q_ann_topk,
    "dedup_exact": q_dedup_exact,
    "dedup_jaccard": q_dedup_jaccard,
    "dedup_embedding": q_dedup_embedding,
    "dedup_minhash": q_dedup_minhash,
    "dedup_simhash": q_dedup_simhash,
    "token_count": q_token_count,
    "quality_scores": q_quality,
    "lang_id": q_lang_id,
    "fingerprint": q_fingerprint,
    "analytics_agg": q_analytics_agg,
    "sample_agg": q_sample_agg,
    "random_sample": q_random_sample,
    "topk_per_group": q_topk_per_group,
    "percentiles": q_percentiles,
    "stratified_sample": q_stratified_sample,
    "anti_join": q_anti_join,
    "broadcast_join": q_broadcast_join,
    "distinct_count": q_distinct_count,
    "sessionize": q_sessionize,
    "window_agg": q_window_agg,
    "sliding_window": q_sliding_window,
    "range_join": q_range_join,
    "asof_join": q_asof_join,
    "sessionize_chunked": q_sessionize_chunked,
    "asof_join_chunked": q_asof_join_chunked,
    "range_join_chunked": q_range_join_chunked,
    "er_e2e": q_er_e2e,
    "er_golden": q_er_golden,
    "er_resolved": q_er_resolved,
    "er_incremental": q_er_incremental,
    "media_features": q_media_features,
    "media_audio": q_media_audio,
}

ORACLES = {
    "standardize": SQL_STANDARDIZE,
    "ingest_filter": SQL_INGEST_FILTER,
    "union_project": SQL_UNION_PROJECT,
    "exact_pairs": SQL_EXACT_PAIRS,
    "fuzzy_pairs": SQL_FUZZY_PAIRS,
    "jaro_pairs": SQL_JARO_PAIRS,
    "llm_pair_cap": SQL_LLM_PAIR_CAP,
    "vector_pairs": SQL_VECTOR_PAIRS,
    "combined_scores": SQL_COMBINED_SCORES,
    "cluster_cc": SQL_CLUSTER_CC,
    "survivorship": SQL_SURVIVORSHIP,
    "entity_ids": SQL_ENTITY_IDS,
    "top_matches": SQL_TOP_MATCHES,
    "ann_topk": SQL_ANN_TOPK,
    "dedup_exact": SQL_DEDUP_EXACT,
    "dedup_jaccard": SQL_DEDUP_JACCARD,
    "dedup_embedding": SQL_DEDUP_EMBEDDING,
    "dedup_minhash": SQL_DEDUP_MINHASH,
    "dedup_simhash": SQL_DEDUP_SIMHASH,
    "lang_id": SQL_LANG_ID,
    "fingerprint": SQL_FINGERPRINT,
    "random_sample": SQL_RANDOM_SAMPLE,
    "er_e2e": SQL_ER_E2E,
    "token_count": SQL_TOKEN_COUNT,
    "quality_scores": SQL_QUALITY,
    "analytics_agg": SQL_ANALYTICS_AGG,
    "sample_agg": SQL_SAMPLE_AGG,
    "topk_per_group": SQL_TOPK_PER_GROUP,
    "percentiles": SQL_PERCENTILES,
    "stratified_sample": SQL_STRATIFIED_SAMPLE,
    "anti_join": SQL_ANTI_JOIN,
    "broadcast_join": SQL_BROADCAST_JOIN,
    "distinct_count": SQL_DISTINCT_COUNT,
    "sessionize": SQL_SESSIONIZE,
    "window_agg": SQL_WINDOW_AGG,
    "sliding_window": SQL_SLIDING_WINDOW,
    "range_join": SQL_RANGE_JOIN,
    "asof_join": SQL_ASOF_JOIN,
    "sessionize_chunked": SQL_SESSIONIZE,
    "asof_join_chunked": SQL_ASOF_JOIN,
    "range_join_chunked": SQL_RANGE_JOIN,
    "media_features": SQL_MEDIA_FEATURES,
    "media_audio": SQL_MEDIA_AUDIO,
    # er_* fixture pipelines: oracled via each query's side-export (the SQL
    # re-derives the output from exported INPUTS — survivorship rules,
    # resolve join, streaming argmax; see the export section comment)
    "er_golden": SQL_ER_GOLDEN,
    "er_resolved": SQL_ER_RESOLVED,
    "er_incremental": SQL_ER_INCREMENTAL,
}
