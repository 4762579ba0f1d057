"""Pair scoring: the 5 strategies + weighted ensemble + decisions, vectorized.

One stateless ``map_batches`` kernel computes ALL strategy scores per pair in
a single pass over the pair batch (the reference needs 5 CROSS-JOIN tables +
a 5-way LEFT JOIN re-assembly, ``batch_mdm_gcp/bigquery_utils.py:301-636``;
here it's column arithmetic on Arrow batches).

Strategy semantics (exact reference parity, cited per formula):

* exact  — email/phone equality → 1.0, overall = GREATEST (bigquery_utils.py:312-337).
  (The reference also matches on generator-provided ``customer_id``
  (:324-328) — ground-truth leakage on the synthetic fixture, so it is
  opt-in via ``EngineConfig.use_customer_id_exact`` and inert unless the
  input actually carries a ``customer_id`` column.)
* fuzzy  — name edit-distance score, Soundex-equal 0.8, token overlap,
  address edit score; name_fuzzy = max of name scores (optionally incl.
  Jaro-Winkler — north-star addition, on by default); fuzzy_overall =
  (name_fuzzy + address_score)/2, retained only when any component > 0.5
  (bigquery_utils.py:342-403).
* vector — cosine similarity, retained when > 0.7 i.e. distance < 0.3
  (bigquery_utils.py:406-425).
* business — company 0.3 + location 0.2 + DOB proximity 0.4/0.2 + income 0.1,
  unfiltered (bigquery_utils.py:428-475).
* ai     — deterministic surrogate for the non-reproducible LLM leg (only in
  the 5-way profile; see config.WEIGHTS_5WAY), filtered per
  bigquery_utils.py:539-540.

Ensemble: combined = Σ wᵢ·scoreᵢ with the profile's weights; decisions
auto_merge ≥0.8 / human_review ≥0.6 / else no_match; retain > 0.3
(bigquery_utils.py:595-635).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import config as C
from .strategies import extra_weight_sum
from .config import EngineConfig, DEFAULT_CONFIG
from .simfuncs import (
    cosine_batch,
    edit_similarity_batch,
    jaro_winkler_batch,
    ngram_jaccard_batch,
    token_overlap_batch,
)

PAIR_OUTPUT_COLUMNS = [
    "doc1_id", "doc2_id", "source1", "source2",
    "exact_score", "fuzzy_score", "vector_score", "business_score", "ai_score",
    "combined_score", "match_decision", "confidence_level",
]


def _col(batch: pa.Table, name: str, default=None):
    if name in batch.column_names:
        return batch[name].to_pylist()
    return [default] * batch.num_rows


def _acol(batch: pa.Table, name: str, typ=None):
    if name in batch.column_names:
        return batch[name]
    return pa.nulls(batch.num_rows, typ or pa.string())


def _eq_nonnull(a, b) -> np.ndarray:
    """Vectorized ``x is not None and x != '' and x == y`` on Arrow columns
    (null on either side → False via fill_null)."""
    import pyarrow.compute as pc

    e = pc.and_(pc.equal(a, b), pc.not_equal(a, ""))
    return pc.fill_null(e, False).to_numpy(zero_copy_only=False)


def _emb_matrix(col) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy list<float> column → ([n, d] float64 matrix, valid mask).

    Avoids per-row ``to_pylist`` (the former scorer hot spot): one flatten +
    one reshape when all rows share the fixed dim; rows that are null or of a
    different length are zeroed with valid=False.
    """
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.zeros((0, 0)), np.zeros(0, dtype=bool)
    # .values (raw child) stays aligned with .offsets even when slots are null
    # (.flatten() would skip null slots and desynchronize)
    values = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.diff(offsets)
    null_mask = np.asarray(arr.is_null())
    d = int(lens.max()) if len(lens) else 0
    valid = (~null_mask) & (lens == d) & (d > 0)
    if d and valid.all() and offsets[0] + n * d <= len(values) and np.all(lens == d):
        return values[offsets[0]: offsets[0] + n * d].reshape(n, d), valid
    mat = np.zeros((n, max(d, 1)), dtype=np.float64)
    for i in np.nonzero(valid)[0]:
        mat[i] = values[offsets[i]: offsets[i] + d]
    return mat, valid


# string-side columns stage A must carry for stage B (besides ids/sources)
_STRING_STAGE_COLS = [
    "full_name_clean", "address_clean", "email_clean", "name_soundex",
]


class CheapEncodings:
    """Per-partition-block column encodings for index-based cheap-leg scoring.

    Built ONCE per exchange partition (~15k docs) instead of gathering
    full payload columns per pair (~300k pairs): equality legs become int
    code compares (``codes[a] == codes[b]``), numeric legs are NumPy takes,
    and the embedding matrix is converted to float64 a single time — the
    per-pair-chunk ``_emb_matrix`` conversion plus the 2×256 B/pair embedding
    gather were the memory-bandwidth hot spot that stopped the emit stage
    scaling past ~8 CPUs."""

    def __init__(self, batch: pa.Table, cfg: EngineConfig):
        import pyarrow.compute as pc

        n = batch.num_rows
        self.n = n

        def eqcodes(name: str) -> np.ndarray:
            """Dictionary codes with null AND empty-string mapped to -1, so
            ``codes[a] >= 0 and codes[a] == codes[b]`` ≡ ``_eq_nonnull``."""
            if name not in batch.column_names:
                return np.full(n, -1, np.int64)
            d = pc.dictionary_encode(batch[name].combine_chunks())
            codes = pc.fill_null(d.indices, -1).to_numpy(zero_copy_only=False).astype(np.int64)
            dic = d.dictionary.to_pylist()
            if "" in dic:
                codes[codes == dic.index("")] = -1
            return codes

        self.email = eqcodes("email_clean")
        self.phone = eqcodes("phone_clean")
        self.company = eqcodes("company")
        self.city = eqcodes("city_clean")
        self.state = eqcodes("state_clean")
        self.customer = (
            eqcodes("customer_id")
            if cfg.use_customer_id_exact and "customer_id" in batch.column_names
            else None
        )
        if "dob_days" in batch.column_names:
            dc = batch["dob_days"]
            self.dob_ok = pc.is_valid(dc).to_numpy(zero_copy_only=False)
            self.dob = pc.fill_null(dc, 0).to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            self.dob_ok = np.zeros(n, bool)
            self.dob = np.zeros(n, np.int64)
        if "annual_income" in batch.column_names:
            c = batch["annual_income"]
            if c.type == pa.string():
                c = pc.cast(c, pa.float64())
            self.income = pc.fill_null(c, 0.0).to_numpy(zero_copy_only=False).astype(np.float64)
        else:
            self.income = np.zeros(n, np.float64)
        if "embedding" in batch.column_names:
            self.E64, self.evalid = _emb_matrix(batch["embedding"])
            E32 = self.E64.astype(np.float32)
            norms = np.sqrt(np.einsum("ij,ij->i", E32, E32))
            with np.errstate(invalid="ignore", divide="ignore"):
                self.E32n = np.where(norms[:, None] > 0, E32 / norms[:, None], 0.0).astype(np.float32)
        else:
            self.E64 = None
            self.evalid = np.zeros(n, bool)
            self.E32n = None
        # NOTE on a tempting non-optimization: dictionary-encoding the string
        # payload once per block and gathering int32 codes per pair LOOKS
        # like a bandwidth win, but Arrow ``take`` on a dictionary array
        # keeps the FULL block dictionary on every output chunk — each
        # yielded ~32k-pair slice then serializes the whole ~15k-doc string
        # dictionary again, and the fused pipeline ships ~400 such chunks
        # (measured 2× SLOWER end-to-end). Plain string gathers stay.
# float32 quick-cosine safety margin: unit-vector dot over ≤512 dims carries
# ≤ ~1e-5 rounding error; 5e-4 is ~50× that. Only ever ADDS bound survivors.
_COS32_MARGIN = 5e-4


def score_cheap_indexed(batch: pa.Table, a: np.ndarray, b: np.ndarray,
                        enc: CheapEncodings, cfg: EngineConfig = DEFAULT_CONFIG,
                        prefilter: bool = True) -> pa.Table:
    """Index-pair twin of ``score_cheap_batch``: same output schema/values,
    but the cheap legs read the per-block encodings and the quick float32
    cosine drives the retain bound — the bit-exact float64 cosine runs only
    on bound survivors (the only rows whose ``vector_score`` is ever output;
    the float32 bound is an upper bound, so the survivor set is a superset
    of the exact-filter one and stage B drops the difference)."""
    import pyarrow.compute as pc

    w = cfg.weights

    def eq(codes: np.ndarray | None) -> np.ndarray:
        if codes is None:
            return np.zeros(len(a), bool)
        ca = codes[a]
        return (ca >= 0) & (ca == codes[b])

    exact = np.maximum(eq(enc.email).astype(np.float64), eq(enc.phone).astype(np.float64))
    if enc.customer is not None:
        exact = np.maximum(exact, eq(enc.customer).astype(np.float64))

    if enc.E32n is not None:
        evalid = enc.evalid[a] & enc.evalid[b]
        cos32 = np.einsum("ij,ij->i", enc.E32n[a], enc.E32n[b]).astype(np.float64)
        cos_ub = np.where(evalid, np.minimum(cos32 + _COS32_MARGIN, 1.0), 0.0)
        vec_ub = np.where(cos_ub > C.VECTOR_SIM_THRESHOLD, cos_ub, 0.0)
    else:
        evalid = np.zeros(len(a), bool)
        vec_ub = np.zeros(len(a), np.float64)

    same_company = np.where(eq(enc.company), C.SAME_COMPANY_SCORE, 0.0)
    same_loc = np.where(eq(enc.city) & eq(enc.state), C.SAME_LOCATION_SCORE, 0.0)
    dob_ok = enc.dob_ok[a] & enc.dob_ok[b]
    diff = np.abs(enc.dob[a] - enc.dob[b])
    age = np.where(
        dob_ok & (diff <= 365), C.AGE_365_SCORE,
        np.where(dob_ok & (diff <= 1825), C.AGE_1825_SCORE, 0.0),
    )
    inc1, inc2 = enc.income[a], enc.income[b]
    with np.errstate(invalid="ignore", divide="ignore"):
        ratio = np.where(
            (inc1 > 0) & (inc2 > 0),
            np.minimum(inc1, inc2) / np.maximum(inc1, inc2),
            0.0,
        )
    income = np.where(ratio >= C.INCOME_RATIO_MIN, C.INCOME_SCORE, 0.0)
    business = same_company + same_loc + age + income

    w_string = w["fuzzy"] + w.get("ai", 0.0) + extra_weight_sum(cfg)
    if prefilter:
        ub = (w["exact"] * exact + w["vector"] * vec_ub
              + w["business"] * business + w_string)
        alive = np.nonzero(ub > C.RETAIN_THRESHOLD)[0]
    else:
        alive = np.arange(len(a))
    aa, bb = a[alive], b[alive]

    # bit-exact float64 cosine (DuckDB list_cosine_similarity semantics) on
    # the survivors only
    m = len(alive)
    if enc.E64 is not None and m:
        va = evalid[alive]
        cos = np.zeros(m)
        idx = np.nonzero(va)[0]
        if len(idx):
            from .simfuncs import cosine_batch as _cb

            cos[idx] = _cb(enc.E64[aa[idx]], enc.E64[bb[idx]])
        vector = np.where(cos > C.VECTOR_SIM_THRESHOLD, cos, 0.0)
    else:
        vector = np.zeros(m)

    ia = pa.array(aa, pa.int64())
    ib = pa.array(bb, pa.int64())
    cols: dict = {
        "1_doc_id": batch["doc_id"].take(ia),
        "2_doc_id": batch["doc_id"].take(ib),
        "1_source_system": _acol(batch, "source_system").take(ia),
        "2_source_system": _acol(batch, "source_system").take(ib),
    }
    from .strategies import extra_pair_columns

    for f in _STRING_STAGE_COLS + extra_pair_columns(cfg):
        cols["1_" + f] = _acol(batch, f).take(ia)
        cols["2_" + f] = _acol(batch, f).take(ib)
    cols["exact_score"] = pa.array(exact[alive], pa.float64())
    cols["vector_score"] = pa.array(vector, pa.float64())
    cols["business_score"] = pa.array(business[alive], pa.float64())
    return pa.table(cols)


def empty_cheap_table(cfg: EngineConfig = DEFAULT_CONFIG) -> pa.Table:
    from .strategies import extra_pair_columns

    cols: dict = {}
    for c in ["1_doc_id", "2_doc_id", "1_source_system", "2_source_system"]:
        cols[c] = pa.array([], pa.string())
    for f in _STRING_STAGE_COLS + extra_pair_columns(cfg):
        cols["1_" + f] = pa.array([], pa.string())
        cols["2_" + f] = pa.array([], pa.string())
    for c in ["exact_score", "vector_score", "business_score"]:
        cols[c] = pa.array([], pa.float64())
    return pa.table(cols)


def score_cheap_batch(batch: pa.Table, cfg: EngineConfig = DEFAULT_CONFIG,
                      prefilter: bool = True) -> pa.Table:
    """Stage A of pair scoring: the vectorized cheap legs (exact, vector,
    business) + the retain-bound prefilter, emitting a NARROW intermediate
    (ids, sources, string fields, cheap scores) for the string-kernel stage.

    Splitting here lets the expensive string stage re-batch at a small
    uniform ``batch_size`` across the whole cluster: partitions whose blocks
    are real duplicate clusters cost ~10× more string-kernel time per pair
    (high survivor rate), so a fused per-partition scorer stragglers even
    when emitted-pair counts are LPT-balanced."""
    n = batch.num_rows
    w = cfg.weights

    # ---- exact (bigquery_utils.py:312-337) ----------------------------------
    email_eq = _eq_nonnull(
        _acol(batch, "1_email_clean"), _acol(batch, "2_email_clean")
    ).astype(np.float64)
    phone_eq = _eq_nonnull(
        _acol(batch, "1_phone_clean"), _acol(batch, "2_phone_clean")
    ).astype(np.float64)
    exact = np.maximum(email_eq, phone_eq)
    if cfg.use_customer_id_exact and "1_customer_id" in batch.column_names:
        # reference customer_id exact leg (bigquery_utils.py:324-328);
        # opt-in — see the config flag's leakage note
        cid_eq = _eq_nonnull(batch["1_customer_id"], batch["2_customer_id"])
        exact = np.maximum(exact, cid_eq.astype(np.float64))

    # ---- vector (bigquery_utils.py:406-425) ---------------------------------
    if "1_embedding" in batch.column_names:
        m1, v1 = _emb_matrix(batch["1_embedding"])
        m2, v2 = _emb_matrix(batch["2_embedding"])
        valid = v1 & v2
        cos = np.zeros(n)
        if valid.any():
            idx = np.nonzero(valid)[0]
            cos[idx] = cosine_batch(m1[idx], m2[idx])
        vector = np.where(cos > C.VECTOR_SIM_THRESHOLD, cos, 0.0)
    else:
        cos = np.zeros(n)
        vector = np.zeros(n)

    # ---- business (bigquery_utils.py:428-475) -------------------------------
    import pyarrow.compute as pc

    same_company = np.where(
        _eq_nonnull(_acol(batch, "1_company"), _acol(batch, "2_company")),
        C.SAME_COMPANY_SCORE, 0.0,
    )
    same_loc = np.where(
        _eq_nonnull(_acol(batch, "1_city_clean"), _acol(batch, "2_city_clean"))
        & _eq_nonnull(_acol(batch, "1_state_clean"), _acol(batch, "2_state_clean")),
        C.SAME_LOCATION_SCORE, 0.0,
    )
    dc1 = _acol(batch, "1_dob_days", pa.int32())
    dc2 = _acol(batch, "2_dob_days", pa.int32())
    dob_ok = (
        pc.fill_null(pc.and_(pc.is_valid(dc1), pc.is_valid(dc2)), False)
        .to_numpy(zero_copy_only=False)
    )
    d1 = pc.fill_null(dc1, 0).to_numpy(zero_copy_only=False).astype(np.int64)
    d2 = pc.fill_null(dc2, 0).to_numpy(zero_copy_only=False).astype(np.int64)
    diff = np.abs(d1 - d2)
    age = np.where(
        dob_ok & (diff <= 365), C.AGE_365_SCORE,
        np.where(dob_ok & (diff <= 1825), C.AGE_1825_SCORE, 0.0),
    )

    def _income(name: str) -> np.ndarray:
        c = _acol(batch, name)
        if c.type == pa.string():
            c = pc.cast(c, pa.float64())
        return pc.fill_null(c, 0.0).to_numpy(zero_copy_only=False).astype(np.float64)

    inc1 = _income("1_annual_income")
    inc2 = _income("2_annual_income")
    with np.errstate(invalid="ignore", divide="ignore"):
        ratio = np.where(
            (inc1 > 0) & (inc2 > 0),
            np.minimum(inc1, inc2) / np.maximum(inc1, inc2),
            0.0,
        )
    income = np.where(ratio >= C.INCOME_RATIO_MIN, C.INCOME_SCORE, 0.0)
    business = same_company + same_loc + age + income

    # ---- retain-bound prefilter ---------------------------------------------
    # With fuzzy ≤ 1 and ai ≤ 1, ub bounds the combined score from the cheap
    # legs alone. When prefilter is on, pairs with ub ≤ RETAIN_THRESHOLD
    # are dropped by the final filter NO MATTER what the string kernels say —
    # so the expensive fuzzy/ai legs run only on the ~40% that can survive.
    # Output-preserving: surviving pairs get the full computation; skipped
    # pairs are dropped in both paths (their true combined ≤ ub ≤ threshold).
    w_string = w["fuzzy"] + w.get("ai", 0.0) + extra_weight_sum(cfg)
    if prefilter and n:
        ub = (w["exact"] * exact + w["vector"] * vector
              + w["business"] * business + w_string)
        alive = np.nonzero(ub > C.RETAIN_THRESHOLD)[0]
    else:
        alive = np.arange(n)
    m = len(alive)
    sub = batch if m == n else batch.take(pa.array(alive, pa.int64()))

    def pick(v: np.ndarray) -> np.ndarray:
        return v if m == n else v[alive]

    cols: dict = {
        "1_doc_id": sub["1_doc_id"],
        "2_doc_id": sub["2_doc_id"],
        "1_source_system": _acol(sub, "1_source_system"),
        "2_source_system": _acol(sub, "2_source_system"),
    }
    from .strategies import extra_pair_columns

    for f in _STRING_STAGE_COLS + extra_pair_columns(cfg):
        cols["1_" + f] = _acol(sub, "1_" + f)
        cols["2_" + f] = _acol(sub, "2_" + f)
    cols["exact_score"] = pa.array(pick(exact), pa.float64())
    cols["vector_score"] = pa.array(pick(vector), pa.float64())
    cols["business_score"] = pa.array(pick(business), pa.float64())
    return pa.table(cols)


def score_strings_batch(batch: pa.Table, cfg: EngineConfig = DEFAULT_CONFIG,
                        retain_filter: bool = True) -> pa.Table:
    """Stage B of pair scoring: the string-kernel legs (fuzzy, ai) over the
    stage-A intermediate, the weighted ensemble, decisions, and the final
    retain filter.

    When ``retain_filter`` is on, a SECOND bound — exact Soundex/token/JW
    plus the length-difference Levenshtein bound ``sim ≤ 1 − |l1−l2|/max`` —
    proves most pairs unretainable before the edit-distance DP runs (only
    ~3% of candidate pairs are ultimately retained), so the O(L²) DP sweeps
    see a small fraction of the batch."""
    n = batch.num_rows
    # stage A ships string payload dictionary-encoded (bandwidth); decode
    # once per scoring batch so every kernel below sees plain strings
    for i, f in enumerate(batch.schema):
        if pa.types.is_dictionary(f.type):
            batch = batch.set_column(
                i, f.name, batch[f.name].cast(f.type.value_type)
            )
    w = cfg.weights
    exact = batch["exact_score"].to_numpy(zero_copy_only=False)
    vector = batch["vector_score"].to_numpy(zero_copy_only=False)
    business = batch["business_score"].to_numpy(zero_copy_only=False)
    cheap = w["exact"] * exact + w["vector"] * vector + w["business"] * business
    w_ai = w.get("ai", 0.0)

    name1, name2 = _col(batch, "1_full_name_clean"), _col(batch, "2_full_name_clean")
    addr1, addr2 = _col(batch, "1_address_clean"), _col(batch, "2_address_clean")
    # exact cheap string legs (no DP)
    name_soundex = np.where(
        _eq_nonnull(_acol(batch, "1_name_soundex"), _acol(batch, "2_name_soundex")),
        C.SOUNDEX_EQUAL_SCORE, 0.0,
    )
    name_token = token_overlap_batch(name1, name2)
    if cfg.use_jaro_winkler:
        name_jw = jaro_winkler_batch(name1, name2)
    else:
        name_jw = np.zeros(n)
    if w_ai > 0:
        email_jac = ngram_jaccard_batch(
            _col(batch, "1_email_clean"), _col(batch, "2_email_clean"), 3
        )
    else:
        email_jac = np.zeros(n)
    nf0 = np.maximum.reduce([name_soundex, name_token, name_jw]) if n else np.zeros(0)

    if retain_filter and n:
        # length-difference upper bound on edit similarity (0 when either empty)
        def edit_ub(a: list, b: list) -> np.ndarray:
            la = np.fromiter((len(s) if s else 0 for s in a), np.float64, count=n)
            lb = np.fromiter((len(s) if s else 0 for s in b), np.float64, count=n)
            mx = np.maximum(la, lb)
            with np.errstate(invalid="ignore", divide="ignore"):
                ub = np.where((la > 0) & (lb > 0), 1.0 - np.abs(la - lb) / np.maximum(mx, 1.0), 0.0)
            return ub

        nf_ub = np.maximum(nf0, edit_ub(name1, name2))
        ae_ub = edit_ub(addr1, addr2)
        fuzzy_ub = np.where(
            np.maximum(nf_ub, ae_ub) > C.FUZZY_RETAIN_THRESHOLD,
            (nf_ub + ae_ub) / 2.0, 0.0,
        )
        ai_ub_raw = 0.5 * nf_ub + 0.3 * ae_ub + 0.2 * email_jac
        ai_ub = np.where(ai_ub_raw + 1e-6 > 0.4, ai_ub_raw + 1e-6, 0.0)
        # 1e-9 margin: summation-order float drift must never prove a
        # marginally-retainable pair dead. Extra strategies budget their full
        # weight (scores are contract-bounded to [0,1]).
        from .strategies import extra_weight_sum

        ub2 = cheap + w["fuzzy"] * fuzzy_ub + w_ai * ai_ub + 1e-9 + extra_weight_sum(cfg)
        alive = np.nonzero(ub2 > C.RETAIN_THRESHOLD)[0]
    else:
        alive = np.arange(n)
    m = len(alive)
    if m == n:
        sub_n1, sub_n2, sub_a1, sub_a2 = name1, name2, addr1, addr2
    else:
        sub_n1 = [name1[i] for i in alive]
        sub_n2 = [name2[i] for i in alive]
        sub_a1 = [addr1[i] for i in alive]
        sub_a2 = [addr2[i] for i in alive]

    def scatter(vals: np.ndarray) -> np.ndarray:
        if m == n:
            return vals
        full = np.zeros(n, dtype=np.float64)
        full[alive] = vals
        return full

    # ---- fuzzy (bigquery_utils.py:342-403) — DP on the bound survivors only -
    name_edit = scatter(edit_similarity_batch(sub_n1, sub_n2))
    addr_edit = scatter(edit_similarity_batch(sub_a1, sub_a2))
    name_fuzzy = np.maximum(nf0, name_edit)
    fuzzy_overall = (name_fuzzy + addr_edit) / 2.0
    fuzzy_retained = np.maximum(name_fuzzy, addr_edit) > C.FUZZY_RETAIN_THRESHOLD
    fuzzy = np.where(fuzzy_retained, fuzzy_overall, 0.0)

    # ---- ai surrogate (5-way profile only; deterministic) -------------------
    if w_ai > 0:
        ai_raw = np.round(0.5 * name_fuzzy + 0.3 * addr_edit + 0.2 * email_jac, 6)
        ai = np.where(ai_raw > 0.4, ai_raw, 0.0)  # bigquery_utils.py:539
    else:
        ai = np.zeros(n)

    # same summation ORDER as the reference formula (and round 1's monolith):
    # float addition is not associative, and the oracle hash is bit-sensitive
    combined = (
        w["exact"] * exact
        + w["fuzzy"] * fuzzy
        + w["vector"] * vector
        + w["business"] * business
        + w_ai * ai
    )
    extra_cols: dict = {}
    if getattr(cfg, "extra_strategies", ()):
        from .strategies import apply_extra_scores

        combined = apply_extra_scores(batch, combined, cfg, extra_cols)
    decision = np.where(
        combined >= C.AUTO_MERGE_THRESHOLD, "auto_merge",
        np.where(combined >= C.HUMAN_REVIEW_THRESHOLD, "human_review", "no_match"),
    )
    confidence = np.where(
        combined >= C.AUTO_MERGE_THRESHOLD, "high",
        np.where(combined >= C.HUMAN_REVIEW_THRESHOLD, "medium", "low"),
    )

    out = pa.table(
        {
            "doc1_id": batch["1_doc_id"],
            "doc2_id": batch["2_doc_id"],
            "source1": batch["1_source_system"],
            "source2": batch["2_source_system"],
            "exact_score": pa.array(exact, pa.float64()),
            "fuzzy_score": pa.array(fuzzy, pa.float64()),
            "name_jw_score": pa.array(name_jw, pa.float64()),
            "vector_score": pa.array(vector, pa.float64()),
            "business_score": pa.array(business, pa.float64()),
            "ai_score": pa.array(ai, pa.float64()),
            "combined_score": pa.array(combined, pa.float64()),
            "match_decision": pa.array(decision.tolist(), pa.string()),
            "confidence_level": pa.array(confidence.tolist(), pa.string()),
            **extra_cols,
        }
    )
    if not retain_filter:
        return out
    # retain > 0.3 (bigquery_utils.py:634)
    import pyarrow.compute as pc

    return out.filter(pc.greater(out["combined_score"], C.RETAIN_THRESHOLD))


def score_pairs_batch(batch: pa.Table, cfg: EngineConfig = DEFAULT_CONFIG,
                      retain_filter: bool = True) -> pa.Table:
    """One-shot pair scorer (stage A + stage B in-process) for standalone
    pair Datasets; the streaming ER path runs the stages as separate
    operators (``pairs.build_scored``) so the string stage load-balances."""
    return score_strings_batch(
        score_cheap_batch(batch, cfg, prefilter=retain_filter), cfg, retain_filter
    )


def retain_scored(scored_ds):
    """Apply the retain > 0.3 filter to an unfiltered scored Dataset."""
    import pyarrow.compute as pc

    return scored_ds.map_batches(
        lambda b: b.filter(pc.greater(b["combined_score"], C.RETAIN_THRESHOLD)),
        batch_format="pyarrow",
    )


def score_pairs(pairs_ds, cfg: EngineConfig = DEFAULT_CONFIG, retain_filter: bool = True):
    """Wide pair batches → narrow scored rows, as stateless tasks.

    For the streaming block→pair→score path use ``pairs.build_scored`` (one
    fused generator kernel per sort partition — the wide pair table never
    exists); this standalone stage is for scoring an already-materialized
    pair Dataset."""
    import functools

    return pairs_ds.map_batches(
        functools.partial(score_pairs_batch, cfg=cfg, retain_filter=retain_filter),
        batch_format="pyarrow",
        batch_size=cfg.score_batch_size,
    )
