"""Batched similarity kernels (NumPy-vectorized where it counts).

These power the O(pairs) hot path, so the per-pair work is vectorized across
the whole batch of candidate pairs:

* ``levenshtein_batch`` — one dynamic-programming sweep where every NumPy op
  spans all pairs at once (no per-pair Python DP as in the reference's
  ``streaming_mdm_gcp/streaming_processor.py:155-194``).
* ``edit_similarity_batch`` — ``1 - dist/GREATEST(len1,len2)`` clamped to
  [0,1], the reference's score (``batch_mdm_gcp/bigquery_utils.py:354-359``).
* ``token_overlap_batch`` — |tokens(a) present in tokens(b)| /
  max(#tokens(a), #tokens(b)), split on single space, duplicates on a's side
  counted — exactly ``bigquery_utils.py:376-388``.
* ``jaro_winkler_batch`` — standard Jaro-Winkler (prefix ≤4, scale 0.1,
  boost threshold 0.7); north-star addition, validated against DuckDB's
  ``jaro_winkler_similarity`` in tests.
* ``cosine_batch`` — rowwise cosine similarity (``1 - COSINE_DISTANCE``,
  ``bigquery_utils.py:417``).
* ``char_jaccard_batch`` / ``ngram_jaccard_batch`` — set Jaccard over
  characters / char-n-grams (DuckDB ``jaccard`` is the n=1 case).
"""

from __future__ import annotations

import numpy as np

_MAX_LEV_LEN = 64  # truncation guard for the DP sweep (names/addresses are short)


def _encode_padded(strings: list[str | None], max_len: int | None) -> tuple[np.ndarray, np.ndarray]:
    """Return (codes[N, L] int32 padded with -1, lengths[N] int32).

    ONE join + ONE utf-32 encode + ONE frombuffer for the whole batch, then a
    vectorized scatter — the per-string encode/astype loop was the scorer's
    single hottest line. ``max_len=None`` disables truncation."""
    n = len(strings)
    if max_len is None:
        trunc = [s if s else "" for s in strings]
    else:
        trunc = [(s[:max_len] if s else "") for s in strings]
    lens = np.fromiter((len(s) for s in trunc), dtype=np.int32, count=n)
    width = max(int(lens.max()) if n else 0, 1)
    codes = np.full((n, width), -1, dtype=np.int32)
    total = int(lens.sum())
    if total:
        flat = np.frombuffer(
            "".join(trunc).encode("utf-32-le"), dtype=np.uint32
        ).astype(np.int32)
        rows = np.repeat(np.arange(n, dtype=np.int64), lens)
        offs = np.concatenate(([0], np.cumsum(lens, dtype=np.int64)[:-1]))
        cols = np.arange(total, dtype=np.int64) - np.repeat(offs, lens)
        codes[rows, cols] = flat
    return codes, lens


def levenshtein_batch(a: list[str | None], b: list[str | None], max_len: int = _MAX_LEV_LEN) -> np.ndarray:
    """Levenshtein distances for N string pairs, vectorized across the batch.

    Strings longer than ``max_len`` are truncated (config guard — candidate
    fields are short). Empty/None counts as length 0.

    Dispatch: ``max_len ≤ 64`` (the default) runs the bit-parallel Myers
    kernel — O(|b|) iterations of ~15 uint64 ops on [N] vectors, ~10× the
    row-DP sweep, output-identical (``test_myers_matches_dp``); longer
    inputs fall back to the [N, L] DP sweep."""
    assert len(a) == len(b)
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=np.int32)
    if max_len <= 64:
        ca, la = _encode_padded(a, max_len)
        cb, lb = _encode_padded(b, max_len)
        return _myers_batch(ca, la, cb, lb)
    return _levenshtein_dp_batch(a, b, max_len)


def _myers_batch(ca: np.ndarray, la: np.ndarray, cb: np.ndarray, lb: np.ndarray) -> np.ndarray:
    """Bit-parallel Myers (1999) edit distance, vectorized over N pairs.

    Requires pattern length ≤ 64 (one uint64 word per pair). Per text
    position: the standard VP/VN carry recurrence on [N] uint64 vectors (the
    uint64 '+' wraps mod 2^64 — that wraparound IS the algorithm's carry
    propagation); the per-pair score bit is the pattern's last-row bit
    ``1 << (len(a)-1)``. Inactive rows (j ≥ len(b)) hold their state via
    np.where, so mixed-length batches need no sorting or bucketing."""
    n, L1 = ca.shape
    assert L1 <= 64
    one = np.uint64(1)
    # compact alphabet over the text side's codes; pattern chars absent from
    # every text never have their Peq column read
    alph = np.unique(cb)  # sorted, includes the -1 pad
    bmap = np.searchsorted(alph, cb).astype(np.int64)  # [N, L2]
    pos = np.searchsorted(alph, ca)
    np.clip(pos, 0, len(alph) - 1, out=pos)
    present = (alph[pos] == ca) & (ca != -1)
    # Peq[p, c]: bit i set iff a_p[i] == alph[c]. Within one (row, char) cell
    # the contributing bit positions are DISTINCT powers of two, so OR == SUM
    # — which bincount computes in C. float64 weights are exact for sums of
    # distinct powers up to 2^53, so accumulate in two uint32 halves.
    A = len(alph)
    col = np.arange(L1)[None, :]
    live = present & (col < la[:, None])
    rows, cols_i = np.nonzero(live)
    cell = rows * A + pos[rows, cols_i]
    lo_mask = cols_i < 32
    lo = np.bincount(cell[lo_mask], weights=(1.0 * (1 << cols_i[lo_mask])),
                     minlength=n * A)
    peq = lo.astype(np.uint64)
    if not lo_mask.all():
        hi_mask = ~lo_mask
        hi = np.bincount(cell[hi_mask],
                         weights=(1.0 * (1 << (cols_i[hi_mask] - 32))),
                         minlength=n * A)
        peq |= hi.astype(np.uint64) << np.uint64(32)
    peq = peq.reshape(n, A)

    score = la.astype(np.int64).copy()
    vp = np.where(la > 0, (~np.uint64(0)) >> np.uint64(64) - la.astype(np.uint64), np.uint64(0))
    vn = np.zeros(n, dtype=np.uint64)
    last_bit = one << np.maximum(la.astype(np.uint64), one) - one  # 1<<(la-1)
    rows_all = np.arange(n)
    L2 = cb.shape[1]
    for j in range(L2):
        active = (j < lb) & (la > 0)
        if not active.any():
            break
        eq = peq[rows_all, bmap[:, j]]
        xv = eq | vn
        xh = (((eq & vp) + vp) ^ vp) | eq
        hp = vn | ~(xh | vp)
        hn = vp & xh
        score += np.where(active & ((hp & last_bit) != 0), 1, 0)
        score -= np.where(active & ((hn & last_bit) != 0), 1, 0)
        hp = (hp << one) | one
        hn = hn << one
        vp_new = hn | ~(xv | hp)
        vn_new = hp & xv
        vp = np.where(active, vp_new, vp)
        vn = np.where(active, vn_new, vn)
    # empty pattern: distance is len(b)
    return np.where(la > 0, score, lb.astype(np.int64)).astype(np.int32)


def _levenshtein_dp_batch(a: list[str | None], b: list[str | None], max_len: int) -> np.ndarray:
    """Row-sweep DP twin of ``_myers_batch`` (used for max_len > 64 and as
    the validation oracle in tests)."""
    n = len(a)
    la_max = min(max((len(s) if s else 0) for s in a), max_len)
    lb_max = min(max((len(s) if s else 0) for s in b), max_len)
    ca, la = _encode_padded(a, max(la_max, 1))
    cb, lb = _encode_padded(b, max(lb_max, 1))

    result = np.empty(n, dtype=np.int32)
    # pairs where a is empty: distance = len(b)
    done = la == 0
    result[done] = lb[done]

    # int16 DP state: distances are bounded by max_len (≤ 64 by default, and
    # always < 2^15) — half the memory traffic of int32 sweeps
    prev = np.broadcast_to(np.arange(lb_max + 1, dtype=np.int16), (n, lb_max + 1)).copy()
    cur = np.empty_like(prev)
    j_idx = np.arange(lb_max, dtype=np.int16)[None, :]
    j_idx1 = np.arange(1, lb_max + 1, dtype=np.int16)[None, :]
    for i in range(1, la_max + 1):
        cur[:, 0] = i
        ai = ca[:, i - 1][:, None]          # [N,1]
        sub_cost = (cb[:, :lb_max] != ai).astype(np.int16)  # [N, lb_max]
        # deletion / substitution are per-j independent; insertion is a scan
        del_sub = np.minimum(prev[:, 1:] + 1, prev[:, :-1] + sub_cost)
        # insertion: cur[:, j] = min(del_sub[:, j-1], cur[:, j-1] + 1)
        # running-min scan: cur[j] = min over k<=j of (del_sub[k] + (j-k))
        # computed via prefix-min of (del_sub - j_index) + j_index
        shifted = del_sub - j_idx
        np.minimum.accumulate(shifted, axis=1, out=shifted)
        cur[:, 1:] = shifted + j_idx
        # also allow path through cur[:,0] + j (all-insertions after i deletions)
        np.minimum(cur[:, 1:], cur[:, 0][:, None] + j_idx1, out=cur[:, 1:])
        hit = (~done) & (la == i)
        if hit.any():
            result[hit] = cur[hit, lb[hit]]
            done |= hit
        prev, cur = cur, prev
    return result


def _bag_distance_bound(sa: list[str], sb: list[str]) -> np.ndarray:
    """Vectorized bag-distance LOWER bound on Levenshtein: per pair,
    ``max(|chars of a unmatched in b|, |chars of b unmatched in a|)`` over
    64-bucket character histograms (``code & 63``; bucket collisions only
    LOOSEN the bound, never break it). O(total chars), no DP."""
    n = len(sa)
    # same truncation as levenshtein_batch so the bound can never exceed
    # the DP distance the unpruned path would have computed
    ca, la = _encode_padded(sa, _MAX_LEV_LEN)
    cb, lb = _encode_padded(sb, _MAX_LEV_LEN)

    def hist(codes: np.ndarray, lens: np.ndarray) -> np.ndarray:
        valid = np.arange(codes.shape[1])[None, :] < lens[:, None]
        rows = np.nonzero(valid)[0]
        flat = rows * 64 + (codes[valid] & 63)
        return np.bincount(flat, minlength=n * 64).reshape(n, 64).astype(np.int32)

    d = hist(ca, la) - hist(cb, lb)
    pos = np.clip(d, 0, None).sum(axis=1)
    neg = np.clip(-d, 0, None).sum(axis=1)
    return np.maximum(pos, neg).astype(np.float64)


class EditSimIndex:
    """Row-indexed edit similarity for dense within-block pair sets.

    ``edit_similarity_batch`` pays its encode + histogram cost PER PAIR; in a
    blocking group every row participates in many pairs, so that cost is paid
    |pairs|/|rows| times over (measured 76 s of a 97 s incremental scoring
    kernel at a 10k mini-batch). This index encodes and histograms each ROW
    once; ``similarity(ii, jj)`` then evaluates pairs with O(pairs x 64)
    int16 gathers for the bag bound and runs the DP only on bound survivors.
    Same outputs as ``edit_similarity_batch(..., prune_below=...)``: pruned
    entries hold an upper bound <= the cutoff, empties are 0.0."""

    _PAIR_CHUNK = 1 << 19  # bound-gather working set ~64 MB per side

    def __init__(self, strings):
        self.strings = [s if s else "" for s in strings]
        codes, lens = _encode_padded(self.strings, _MAX_LEV_LEN)
        # FULL lengths for the similarity denominator (edit_similarity_batch
        # truncates the DP but not the GREATEST(len) denominator); truncated
        # histograms stay a valid lower bound on the truncated DP distance
        self.lens = np.fromiter(
            (len(s) for s in self.strings), np.float64, count=len(self.strings)
        )
        n = len(self.strings)
        valid = np.arange(codes.shape[1])[None, :] < lens[:, None]
        rows = np.nonzero(valid)[0]
        flat = rows * 64 + (codes[valid] & 63)
        self.hist = (
            np.bincount(flat, minlength=n * 64).reshape(n, 64).astype(np.int16)
        )

    def similarity(self, ii: np.ndarray, jj: np.ndarray,
                   prune_below: float) -> np.ndarray:
        p = len(ii)
        out = np.zeros(p, dtype=np.float64)
        la, lb = self.lens[ii], self.lens[jj]
        mx = np.maximum(np.maximum(la, lb), 1.0)
        valid = (la > 0) & (lb > 0)
        sim_ub = np.zeros(p, dtype=np.float64)
        for s in range(0, p, self._PAIR_CHUNK):
            e = min(s + self._PAIR_CHUNK, p)
            d = self.hist[ii[s:e]].astype(np.int16)
            d -= self.hist[jj[s:e]]
            bound = np.maximum(
                np.clip(d, 0, None).sum(axis=1, dtype=np.int32),
                np.clip(-d, 0, None).sum(axis=1, dtype=np.int32),
            )
            sim_ub[s:e] = np.clip(1.0 - bound / mx[s:e], 0.0, 1.0)
        live = valid & (sim_ub > prune_below)
        # pruned-but-valid entries report their (<= cutoff) upper bound
        out[valid] = sim_ub[valid]
        li = np.nonzero(live)[0]
        if len(li):
            sa = [self.strings[i] for i in ii[li]]
            sb = [self.strings[i] for i in jj[li]]
            dist = levenshtein_batch(sa, sb).astype(np.float64)
            out[li] = np.clip(1.0 - dist / mx[li], 0.0, 1.0)
        return out


def edit_similarity_batch(a: list[str | None], b: list[str | None],
                          prune_below: float | None = None) -> np.ndarray:
    """1 - dist/max(len) clamped to [0,1]; 0.0 when either side empty/None.

    Matches bigquery_utils.py:354-359 (NULL guard) and the streaming clamp at
    streaming_processor.py:192-194.

    ``prune_below``: callers that only consume similarities STRICTLY ABOVE
    this cutoff can skip the DP for pairs the bag-distance bound proves are
    at/below it. Pruned entries hold an UPPER BOUND ≤ the cutoff (not the
    exact similarity) — only pass this when downstream filters on
    ``sim > prune_below``.
    """
    n = len(a)
    out = np.zeros(n, dtype=np.float64)
    valid = np.array([bool(x) and bool(y) for x, y in zip(a, b)])
    if not valid.any():
        return out
    idx = np.nonzero(valid)[0]
    sa = [a[i] for i in idx]
    sb = [b[i] for i in idx]
    mx = np.maximum([len(s) for s in sa], [len(s) for s in sb]).astype(np.float64)
    if prune_below is not None and len(sa) >= 64:
        sim_ub = np.clip(1.0 - _bag_distance_bound(sa, sb) / mx, 0.0, 1.0)
        live = sim_ub > prune_below
        out[idx] = np.where(live, 0.0, sim_ub)
        li = np.nonzero(live)[0]
        if len(li):
            dist = levenshtein_batch(
                [sa[i] for i in li], [sb[i] for i in li]
            ).astype(np.float64)
            out[idx[li]] = np.clip(1.0 - dist / mx[li], 0.0, 1.0)
        return out
    dist = levenshtein_batch(sa, sb).astype(np.float64)
    out[idx] = np.clip(1.0 - dist / mx, 0.0, 1.0)
    return out


def token_overlap(a: str | None, b: str | None) -> float:
    """bigquery_utils.py:376-388: count tokens of a present in b's token set,
    over max(#tokens a, #tokens b); SPLIT(' ') keeps empty tokens."""
    if not a or not b:
        return 0.0
    ta = a.split(" ")
    tb = b.split(" ")
    b_set = set(tb)
    inter = sum(1 for t in ta if t in b_set)
    return inter / max(len(ta), len(tb))


def token_overlap_batch(a: list[str | None], b: list[str | None]) -> np.ndarray:
    return np.array([token_overlap(x, y) for x, y in zip(a, b)], dtype=np.float64)


# ---- Jaro-Winkler ------------------------------------------------------------

def jaro(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    window = max(l1, l2) // 2 - 1
    if window < 0:
        window = 0
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - window)
        hi = min(l2, i + window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = True
                m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / l1 + matches / l2 + (matches - t) / matches) / 3.0


def jaro_winkler(s1: str | None, s2: str | None, prefix_weight: float = 0.1,
                 boost_threshold: float = 0.7) -> float:
    """Standard Jaro-Winkler; matches DuckDB jaro_winkler_similarity."""
    if not s1 or not s2:
        return 0.0
    j = jaro(s1, s2)
    if j > boost_threshold:
        prefix = 0
        for c1, c2 in zip(s1[:4], s2[:4]):
            if c1 == c2:
                prefix += 1
            else:
                break
        j += prefix * prefix_weight * (1.0 - j)
    return j


def jaro_winkler_batch(a: list[str | None], b: list[str | None],
                       prefix_weight: float = 0.1,
                       boost_threshold: float = 0.7) -> np.ndarray:
    """Vectorized Jaro-Winkler over all pairs at once (no truncation —
    validated against DuckDB's jaro_winkler_similarity in tests).

    The greedy match loop runs over a's character POSITIONS (≤ longest
    string), each step a [N, L2] boolean sweep; the per-pair Python loop was
    the scorer's #2 hot spot."""
    n = len(a)
    out = np.zeros(n, dtype=np.float64)
    if n == 0:
        return out
    ca, la = _encode_padded(a, None)
    cb, lb = _encode_padded(b, None)
    valid = (la > 0) & (lb > 0)
    if not valid.any():
        return out

    L1, L2 = ca.shape[1], cb.shape[1]
    window = np.maximum(np.maximum(la, lb) // 2 - 1, 0).astype(np.int64)
    m1 = np.zeros((n, L1), dtype=bool)
    m2 = np.zeros((n, L2), dtype=bool)
    jcol = np.arange(L2, dtype=np.int64)[None, :]
    for i in range(L1):
        active = valid & (i < la)
        if not active.any():
            break
        lo = (i - window)[:, None]
        hi = np.minimum(lb, i + window + 1)[:, None]
        cand = (cb == ca[:, i][:, None]) & ~m2 & (jcol >= lo) & (jcol < hi) \
            & active[:, None]
        hitrows = np.nonzero(cand.any(axis=1))[0]
        if len(hitrows):
            j = cand[hitrows].argmax(axis=1)   # first eligible j (greedy)
            m1[hitrows, i] = True
            m2[hitrows, j] = True

    matches = m1.sum(axis=1)

    def compact(codes: np.ndarray, m: np.ndarray) -> np.ndarray:
        """Matched chars in original order, left-compacted, -1 padded."""
        order = np.argsort(~m, axis=1, kind="stable")
        gathered = np.take_along_axis(codes, order, axis=1)
        width = codes.shape[1]
        mask = np.arange(width)[None, :] < m.sum(axis=1)[:, None]
        return np.where(mask, gathered, -1)

    am = compact(ca, m1)
    bm = compact(cb, m2)
    k = min(am.shape[1], bm.shape[1])
    trans = ((am[:, :k] != bm[:, :k]) & (am[:, :k] != -1)).sum(axis=1) // 2

    has = valid & (matches > 0)
    with np.errstate(invalid="ignore", divide="ignore"):
        mf = matches.astype(np.float64)
        j_sim = (mf / la + mf / lb + (mf - trans) / mf) / 3.0
    out[has] = j_sim[has]

    # Winkler prefix boost (prefix ≤ 4, applied when jaro > threshold)
    p = min(4, L1, L2)
    if p:
        eq = (ca[:, :p] == cb[:, :p]) & (ca[:, :p] != -1)
        prefix = np.cumprod(eq, axis=1).sum(axis=1)
        boost = has & (out > boost_threshold)
        out[boost] += prefix[boost] * prefix_weight * (1.0 - out[boost])
    return out


# ---- vector / set similarity -------------------------------------------------

def cosine_batch(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Rowwise cosine similarity of two [N, D] float matrices (0.0 on zero norm)."""
    nu = np.sqrt(np.einsum("ij,ij->i", u, u))
    nv = np.sqrt(np.einsum("ij,ij->i", v, v))
    denom = nu * nv
    dots = np.einsum("ij,ij->i", u, v)
    with np.errstate(invalid="ignore", divide="ignore"):
        out = np.where(denom > 0, dots / denom, 0.0)
    return out


def ngram_set(s: str, n: int) -> set:
    if len(s) < n:
        return {s} if s else set()
    return {s[i: i + n] for i in range(len(s) - n + 1)}


def ngram_jaccard(a: str | None, b: str | None, n: int = 1) -> float:
    """Set Jaccard over char n-grams; n=1 matches DuckDB ``jaccard``."""
    if not a or not b:
        return 0.0
    sa, sb = ngram_set(a, n), ngram_set(b, n)
    if not sa and not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def ngram_jaccard_batch(a, b, n: int = 1) -> np.ndarray:
    return np.array([ngram_jaccard(x, y, n) for x, y in zip(a, b)], dtype=np.float64)


char_jaccard_batch = ngram_jaccard_batch
