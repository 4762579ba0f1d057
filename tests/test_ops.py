"""Tests for the training-data operators: dedup family, ANN search,
text analysis, media plumbing."""

import numpy as np
import pyarrow as pa
import pytest

from mdm_ray import media, textstats
from mdm_ray.dedup import (
    embedding_dedup,
    exact_dedup,
    jaccard_block_dedup,
    minhash_lsh_dedup,
    simhash_dedup,
)
from mdm_ray.similarity import ann_bruteforce, ann_ivf


@pytest.fixture(scope="module")
def text_ds(ray_session):
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    base = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "a completely different document about database query engines and joins",
        "neural networks learn hierarchical representations from large datasets",
        "weather patterns in coastal regions are influenced by ocean currents",
    ]
    texts, langs = [], []
    for i, t in enumerate(base):
        texts += [t, t, t + " tail"]  # exact dup + near dup
        langs += ["en"] * 3
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
            }
        )
    )


def test_exact_dedup(text_ds):
    out = exact_dedup(text_ds).take_all()
    # each base text has one exact-dup pair: 12 rows -> 8 survivors
    assert len(out) == 8
    dup_groups = [r for r in out if r["group_size"] == 2]
    assert len(dup_groups) == 4
    for r in dup_groups:
        assert r["doc_id"] % 3 == 0  # min id of the planted pair


def test_minhash_lsh_dedup(text_ds):
    pairs = minhash_lsh_dedup(text_ds, threshold=0.5, shingle_k=3,
                              num_perm=64, bands=16).take_all()
    found = {(r["id1"], r["id2"]) for r in pairs}
    # the exact dups must collide in every band
    for base in range(4):
        assert (3 * base, 3 * base + 1) in found
    # unrelated docs must not pair
    assert not any(abs(a - b) >= 3 for a, b in found)


def test_simhash_dedup(text_ds):
    pairs = simhash_dedup(text_ds, max_hamming=3).take_all()
    found = {(r["id1"], r["id2"]) for r in pairs}
    for base in range(4):
        assert (3 * base, 3 * base + 1) in found


def test_jaccard_block_dedup_matches_bruteforce(text_ds):
    from mdm_ray.simfuncs import ngram_jaccard

    pairs = jaccard_block_dedup(text_ds, "lang", threshold=0.9, ngram=1).take_all()
    rows = text_ds.take_all()
    texts = {r["doc_id"]: r["text"] for r in rows}
    expected = set()
    ids = sorted(texts)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if ngram_jaccard(texts[ids[i]], texts[ids[j]], 1) >= 0.9:
                expected.add((ids[i], ids[j]))
    assert {(r["id1"], r["id2"]) for r in pairs} == expected


@pytest.fixture(scope="module")
def vec_ds(ray_session):
    import ray.data

    rng = np.random.default_rng(7)
    base = rng.normal(size=(20, 16))
    vecs, labels = [], []
    for i, v in enumerate(base):
        vecs.append(v)
        vecs.append(v + rng.normal(scale=0.01, size=16))  # near-dup
        labels += [i % 3, i % 3]
    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(list(range(len(vecs))), pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        )
    )


def test_embedding_dedup(vec_ds):
    pairs = embedding_dedup(vec_ds, "label", threshold=0.999).take_all()
    found = {(r["id1"], r["id2"]) for r in pairs}
    for i in range(20):
        assert (2 * i, 2 * i + 1) in found


def test_ann_bruteforce_exact(vec_ds):
    rows = vec_ds.take_all()
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = [r["vec_id"] for r in rows]
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    queries = pa.table(
        {
            "vec_id": pa.array(ids[:3], pa.int64()),
            "embedding": pa.array([mat[i].tolist() for i in range(3)], pa.list_(pa.float32())),
        }
    )
    out = ann_bruteforce(vec_ds, queries, k=4).take_all()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    for qi in range(3):
        sims = unit[qi] @ unit.T
        sims[qi] = -np.inf
        expected = sorted(range(len(ids)), key=lambda j: (-sims[j], ids[j]))[:4]
        got = [n for _, n in sorted(by_q[ids[qi]])]
        assert got == [ids[j] for j in expected]


def test_ann_ivf_recall(vec_ds):
    queries_rows = vec_ds.take(5)
    queries = pa.table(
        {
            "vec_id": pa.array([r["vec_id"] for r in queries_rows], pa.int64()),
            "embedding": pa.array(
                [r["embedding"] for r in queries_rows], pa.list_(pa.float32())
            ),
        }
    )
    exact = ann_bruteforce(vec_ds, queries, k=5).take_all()
    approx = ann_ivf(vec_ds, queries, k=5, num_centroids=4, nprobe=2).take_all()
    e = {(r["query_id"], r["neighbor_id"]) for r in exact}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(e & a) / len(e)
    assert recall >= 0.6, recall


def test_ann_ivf_skewed_bucket_split(ray_session):
    """A hot centroid's inverted list must split across blocks (skew guard)
    without changing results: with nprobe = num_centroids the IVF answer is
    EXACT, so it must equal brute force even when the split path runs."""
    import ray.data

    from mdm_ray.similarity import ann_ivf_query, build_ivf_index

    rng = np.random.default_rng(3)
    # 90% of vectors in one tight cluster -> one hot centroid
    hot = rng.normal(0, 0.01, (900, 8)) + np.array([5.0] * 8)
    cold = rng.normal(0, 1.0, (100, 8))
    mat = np.concatenate([hot, cold]).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(list(range(len(mat))), pa.int64()),
            "embedding": pa.array([v.tolist() for v in mat], pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(8, shuffle=False)
    queries = tbl.slice(0, 4)
    # force the split: cap far below the hot bucket's ~900 rows
    index_ds, cents = build_ivf_index(
        ds, num_centroids=4, max_bucket_rows=100
    )
    assert "_bshard" in index_ds.schema().names  # split path exercised
    shard_count = len(set(
        r["_bshard"] for r in index_ds.select_columns(["_bshard"]).take_all()
    ))
    assert shard_count > 4, shard_count  # hot bucket really sharded
    exact = ann_bruteforce(ds, queries, k=5).take_all()
    approx = ann_ivf_query(index_ds, cents, queries, k=5, nprobe=4).take_all()
    key = lambda r: (r["query_id"], r["rank"])
    assert (
        [(r["query_id"], r["neighbor_id"]) for r in sorted(approx, key=key)]
        == [(r["query_id"], r["neighbor_id"]) for r in sorted(exact, key=key)]
    )


def test_census_tree_reduce_equivalence(ray_session):
    """The fan-in tree reduce must equal a flat driver merge, at a fan-in
    small enough to force >= 2 tree levels."""
    import ray

    from mdm_ray.blocking import _merge_exact, _merge_sketches, _tree_reduce

    rng = np.random.default_rng(0)
    sketch_parts = []
    for _ in range(19):  # 19 parts at fanin=4 -> levels of 5, 2, driver
        nz = np.unique(rng.integers(0, 1 << 20, 40))
        cnt = rng.integers(1, 9, len(nz)).astype(np.int64)
        sketch_parts.append((nz.astype(np.int64), cnt))
    flat_nz, flat_cnt = _merge_sketches(*sketch_parts)
    tree_nz, tree_cnt = _tree_reduce(
        [ray.put(p) for p in sketch_parts],
        ray.remote(_merge_sketches), _merge_sketches, fanin=4,
    )
    assert np.array_equal(flat_nz, tree_nz) and np.array_equal(flat_cnt, tree_cnt)

    exact_parts = [
        (["a", "b"], [1, 2]), (["b", "c"], [3, 4]), (["a"], [5]),
        (["d"], [1]), (["c", "d"], [2, 2]), (["e"], [7]), (["a", "e"], [1, 1]),
    ]
    flat = dict(zip(*_merge_exact(*exact_parts)))
    tk, tc = _tree_reduce(
        [ray.put(p) for p in exact_parts],
        ray.remote(_merge_exact), _merge_exact, fanin=3,
    )
    assert dict(zip(tk, tc)) == flat == {
        "a": 7, "b": 5, "c": 6, "d": 3, "e": 8
    }


# ---- textstats ---------------------------------------------------------------

def test_token_count():
    b = pa.table({"doc_id": [1, 2], "text": ["a bb  ccc", ""]})
    out = textstats.token_count_batch(b)
    # split(' ') keeps empty tokens: 'a','bb','','ccc'
    assert out["n_tokens"].to_pylist() == [4, 1]
    assert out["n_chars"].to_pylist() == [9, 0]


def test_quality_score():
    b = pa.table({"doc_id": [1, 2], "text": ["the cat sat on the mat", "@@@@ 1234 %%%%"]})
    out = textstats.quality_score_batch(b)
    good, bad = out["quality_score"].to_pylist()
    assert good > bad
    assert out["stopword_ratio"].to_pylist()[0] == pytest.approx(3 / 6)  # the, on, the


def test_lang_id():
    assert textstats.lang_id("the cat and the dog are in the house") == "en"
    assert textstats.lang_id("der hund und die katze schlafen schnell") == "de"
    assert textstats.lang_id("") == "und"


def test_fingerprint_stability():
    b = pa.table({"doc_id": [1], "text": ["one two three four five six seven eight nine ten"]})
    f1 = textstats.fingerprint_batch(b)["fingerprint_min"].to_pylist()
    f2 = textstats.fingerprint_batch(b)["fingerprint_min"].to_pylist()
    assert f1 == f2


# ---- media -------------------------------------------------------------------

def test_media_decode_fake(ray_session):
    import ray.data

    refs = [f"m://{i:08x}" for i in range(10)]
    ds = ray.data.from_arrow(media.media_table_from_refs(refs))
    out = media.decode_pipeline(ds, mode="fake").take_all()
    assert len(out) == 10
    for r in out:
        assert len(r["pixels"]) == 8 * 8 * 3
        assert len(r["media_embedding"]) == 3 + 8
    # deterministic across calls
    out2 = media.decode_pipeline(
        ray.data.from_arrow(media.media_table_from_refs(refs)), mode="fake"
    ).take_all()
    assert [r["media_embedding"] for r in out] == [r["media_embedding"] for r in out2]


def test_media_strict_raises():
    dec = media.ImageDecoder(mode="strict")
    with pytest.raises(NotImplementedError):
        dec.decode_one(b"xx")


def test_frame_sampler(ray_session):
    import ray.data

    refs = ["m://aa", "m://bb"]
    ds = ray.data.from_arrow(media.media_table_from_refs(refs))
    out = ds.map_batches(
        media.FrameSampler, fn_constructor_kwargs={"num_frames": 4},
        batch_format="pyarrow", concurrency=1,
    ).take_all()
    assert len(out) == 8
    assert all(len(r["payload"]) > 0 for r in out)


def _bruteforce_pairs(rows, sim_fn, threshold):
    ids = sorted(r["doc_id"] for r in rows)
    by_id = {r["doc_id"]: r["text"] for r in rows}
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if sim_fn(by_id[ids[i]], by_id[ids[j]]) >= threshold:
                out.add((ids[i], ids[j]))
    return out


def test_minhash_dedup_matches_bruteforce_and_salting(text_ds):
    """LSH output == brute-force true-Jaccard pairs (recall is exact at the
    fixture's similarity levels with 32×2 LSH), and a tiny bucket cap (heavy
    salting) must not change the pair set — no silent drops."""
    from mdm_ray.simfuncs import ngram_jaccard

    rows = text_ds.take_all()
    expected = _bruteforce_pairs(rows, lambda a, b: ngram_jaccard(a, b, 3), 0.5)
    base = {
        (r["id1"], r["id2"])
        for r in minhash_lsh_dedup(text_ds, threshold=0.5, shingle_k=3,
                                   num_perm=64, bands=32).take_all()
    }
    assert base == expected
    salted = {
        (r["id1"], r["id2"])
        for r in minhash_lsh_dedup(text_ds, threshold=0.5, shingle_k=3,
                                   num_perm=64, bands=32,
                                   max_bucket=2).take_all()
    }
    assert salted == expected
    # the copartition-join fallback (candidate set over the broadcast cap)
    # must produce the identical verified pair set
    joined = {
        (r["id1"], r["id2"])
        for r in minhash_lsh_dedup(text_ds, threshold=0.5, shingle_k=3,
                                   num_perm=64, bands=32,
                                   broadcast_pairs=0).take_all()
    }
    assert joined == expected


def test_simhash_dedup_matches_bruteforce(text_ds):
    """bands > max_hamming → pigeonhole-exact recall: LSH output equals the
    brute-force Hamming-distance pairs, with and without salting."""
    from mdm_ray.simhash import hamming64, simhash64

    rows = text_ds.take_all()
    expected = _bruteforce_pairs(
        rows, lambda a, b: 64 - hamming64(simhash64(a), simhash64(b)), 64 - 6
    )
    for cap in (2000, 2):
        got = {
            (r["id1"], r["id2"])
            for r in simhash_dedup(text_ds, max_hamming=6, bands=8,
                                   max_bucket=cap).take_all()
        }
        assert got == expected, f"cap={cap}"


def test_jaccard_block_dedup_salting_equivalence(text_ds):
    """Block cap salting must not change jaccard_block_dedup output."""
    plain = {
        (r["id1"], r["id2"])
        for r in jaccard_block_dedup(text_ds, "lang", threshold=0.9).take_all()
    }
    salted = {
        (r["id1"], r["id2"])
        for r in jaccard_block_dedup(text_ds, "lang", threshold=0.9,
                                     max_block=3).take_all()
    }
    assert plain == salted and plain


def test_embedding_dedup_salting_equivalence(vec_ds):
    plain = {
        (r["id1"], r["id2"])
        for r in embedding_dedup(vec_ds, "label", threshold=0.999).take_all()
    }
    salted = {
        (r["id1"], r["id2"])
        for r in embedding_dedup(vec_ds, "label", threshold=0.999,
                                 max_block=4).take_all()
    }
    assert plain == salted and plain


def test_embedder_actor_pool_form(ray_session):
    """The real-model plug point: map_batches(Cls, concurrency=(k, n)) actor
    pool must produce byte-identical embeddings to the stateless-task form."""
    import ray.data

    from mdm_ray.embed import add_embeddings

    tbl = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(64)], pa.string()),
            "full_name_clean": pa.array([f"PERSON {i}" for i in range(64)], pa.string()),
            "email_clean": pa.array([f"p{i}@x.com" for i in range(64)], pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl)
    task_form = add_embeddings(ds, dim=16).to_pandas().sort_values("doc_id")
    actor_form = add_embeddings(ds, dim=16, concurrency=(1, 2), batch_size=16) \
        .to_pandas().sort_values("doc_id")
    for a, b in zip(task_form["embedding"], actor_form["embedding"]):
        assert (np.asarray(a) == np.asarray(b)).all()


def test_zip_with_index_block_order(ray_session):
    """zip_with_index numbers rows in block order (post-sort = sorted order)
    without pulling block payloads to the driver."""
    import ray.data

    from mdm_ray.dsutil import zip_with_index

    tbl = pa.table({"k": pa.array(list(range(100, 0, -1)), pa.int64())})
    ds = ray.data.from_arrow(tbl).repartition(7).sort("k", descending=True)
    out = zip_with_index(ds, col="rank").to_pandas()
    assert len(out) == 100
    assert out["rank"].tolist() == sorted(out["rank"].tolist())
    ordered = out.sort_values("rank")
    assert ordered["k"].tolist() == list(range(100, 0, -1))


# ---------------------------------------------------------------------------
# event-stream operators (events.py)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def events_ds(ray_session):
    import ray.data

    MIN = 60_000_000  # µs
    rows = [
        # user 1: sessions [e0,e1], [e2], [e3] at 30-min gap
        (0, 0 * MIN, 1, "click", 1.00),
        (1, 10 * MIN, 1, "purchase", 2.50),
        (2, 50 * MIN, 1, "purchase", 0.75),
        (3, 200 * MIN, 1, "click", 4.00),
        # user 2: one event; purchase with NO prior click
        (4, 5 * MIN, 2, "purchase", 9.99),
        # user 3: click and purchase at the SAME ts (click id lower -> match)
        (5, 7 * MIN, 3, "click", 1.10),
        (6, 7 * MIN, 3, "purchase", 2.20),
    ]
    return ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
            }
        )
    )


def test_sessionize(events_ds):
    from mdm_ray.events import sessionize

    MIN = 60_000_000
    out = {
        (r["user_id"], r["session_seq"]): r
        for r in sessionize(events_ds, gap_minutes=30).take_all()
    }
    assert len(out) == 5  # 3 + 1 + 1 (same-ts user-3 pair is one session)
    s11 = out[(1, 1)]
    assert s11["n_events"] == 2
    assert (s11["start_us"], s11["end_us"]) == (0, 10 * MIN)
    assert s11["total_value"] == 3.5
    assert out[(1, 2)]["n_events"] == 1
    assert out[(1, 3)]["start_us"] == 200 * MIN
    assert out[(2, 1)]["total_value"] == 9.99
    assert out[(3, 1)]["n_events"] == 2


def test_window_agg(events_ds):
    from mdm_ray.events import window_agg

    HOUR = 3_600_000_000
    out = {
        (r["event_type"], r["window_start_us"]): r
        for r in window_agg(events_ds, window_minutes=60).take_all()
    }
    # hour 0: clicks e0,e5; purchases e1,e2,e4,e6; hour 3: click e3
    assert out[("click", 0)]["n_events"] == 2
    assert out[("click", 0)]["total_value"] == 2.1
    assert out[("purchase", 0)]["n_events"] == 4
    assert out[("purchase", 0)]["total_value"] == 15.44
    assert out[("click", 3 * HOUR)]["n_events"] == 1


def test_asof_join(events_ds):
    from mdm_ray.events import asof_join

    out = {r["purchase_id"]: r for r in asof_join(events_ds).take_all()}
    assert set(out) == {1, 2, 4, 6}
    assert out[1]["click_id"] == 0       # most recent prior click
    assert out[2]["click_id"] == 0       # still e0 (no newer click)
    assert out[4]["click_id"] is None    # user 2: no prior click
    assert out[6]["click_id"] == 5       # same-ts click, lower event_id wins


def test_sliding_window_agg(events_ds):
    from mdm_ray.events import sliding_window_agg

    M = 60_000_000
    out = {
        (r["event_type"], r["window_start_us"]): r
        for r in sliding_window_agg(
            events_ds, window_minutes=60, hop_minutes=15
        ).take_all()
    }
    assert len(out) == 9
    # clicks: e0(t=0), e5(t=7) -> only window 0 (negative starts clipped);
    # e3(t=200) -> windows 150/165/180/195
    assert out[("click", 0)]["n_events"] == 2
    assert out[("click", 0)]["total_value"] == 2.1
    for w in (150, 165, 180, 195):
        assert out[("click", w * M)]["total_value"] == 4.0
    # purchases: e1/e4/e6 (t<15) -> window 0 only; e2(t=50) -> 0/15/30/45
    assert out[("purchase", 0)]["n_events"] == 4
    assert out[("purchase", 0)]["total_value"] == 15.44
    for w in (15, 30, 45):
        assert out[("purchase", w * M)]["total_value"] == 0.75


def test_interval_join_sessions(events_ds):
    from mdm_ray.events import interval_join, sessionize

    sess = sessionize(events_ds, gap_minutes=30)
    out = {
        r["event_id"]: (r["user_id"], r["session_seq"])
        for r in interval_join(events_ds, sess).take_all()
    }
    assert out == {
        0: (1, 1), 1: (1, 1), 2: (1, 2), 3: (1, 3),
        4: (2, 1), 5: (3, 1), 6: (3, 1),
    }


def test_top_k_per_group(ray_session):
    import ray.data

    from mdm_ray.dsutil import top_k_per_group

    t = pa.table(
        {
            "g": pa.array(["a"] * 5 + ["b"] * 2 + ["c"] * 1),
            "v": pa.array([10, 30, 20, 30, 5, 7, 7, 9], pa.int64()),
            "id": pa.array([1, 2, 3, 4, 5, 6, 7, 8], pa.int64()),
        }
    )
    out = top_k_per_group(
        ray.data.from_arrow(t), ["g"], "v", 2, "id"
    ).to_pandas().sort_values(["g", "rank"]).reset_index(drop=True)
    # a: v=30 ids 2,4 -> ranks 1,2 (id tiebreak); b: 6 before 7; c: lone row
    assert list(zip(out["g"], out["id"], out["rank"])) == [
        ("a", 2, 1), ("a", 4, 2), ("b", 6, 1), ("b", 7, 2), ("c", 8, 1)
    ]


def test_group_percentiles_exact(ray_session):
    import ray.data

    from mdm_ray.quantiles import group_percentiles

    rng = np.random.default_rng(7)
    g = np.repeat(["a", "b"], [137, 41])
    v = np.round(rng.uniform(0, 100, size=len(g)), 2)
    ds = ray.data.from_arrow(
        pa.table({"g": pa.array(g), "v": pa.array(v, pa.float64())})
    ).repartition(7)  # multi-block: exercise cross-block target routing
    out = {r["g"]: r for r in group_percentiles(ds, "g", "v").take_all()}

    for grp in ("a", "b"):
        s = np.sort(v[g == grp])
        n = len(s)
        for q, name in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
            expect = s[min(n - 1, int(np.ceil(q * n)) - 1)]
            assert out[grp][name] == expect, (grp, name)


def test_event_ops_vs_bruteforce_random(ray_session):
    """Seeded random corpus (ts collisions included) vs O(n^2) references."""
    import ray.data

    from mdm_ray.events import asof_join, interval_join, sessionize

    rng = np.random.default_rng(42)
    n = 600
    MIN = 60_000_000
    rows = sorted(
        (int(rng.integers(0, 50)),                 # user
         int(rng.integers(0, 400)) * (MIN // 4),   # ts: quarter-min grid -> ties
         i,
         ["click", "purchase", "view"][int(rng.integers(0, 3))],
         float(rng.integers(0, 10000)) / 100.0)
        for i in range(n)
    )
    tbl = pa.table(
        {
            "event_id": pa.array([r[2] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(9)

    # brute-force sessionization per user, order (ts, event_id)
    by_user: dict = {}
    for u, ts, eid, et, v in rows:
        by_user.setdefault(u, []).append((ts, eid, et, v))
    GAP = 30 * MIN
    want_sessions = {}
    want_assign = {}
    for u, evs in by_user.items():
        evs.sort()
        seq, start = 0, None
        cur: list = []
        for ts, eid, et, v in evs:
            if start is None or ts - cur[-1][0] > GAP:
                if cur:
                    want_sessions[(u, seq)] = cur
                seq += 1
                cur = []
                start = ts
            cur.append((ts, eid, v))
            want_assign[eid] = (u, seq)
        want_sessions[(u, seq)] = cur

    got_sessions = {
        (r["user_id"], r["session_seq"]): r
        for r in sessionize(ds, gap_minutes=30).take_all()
    }
    assert set(got_sessions) == set(want_sessions)
    for k, evs in want_sessions.items():
        g = got_sessions[k]
        assert g["n_events"] == len(evs)
        assert g["start_us"] == evs[0][0] and g["end_us"] == evs[-1][0]
        assert g["total_value"] == round(sum(e[2] for e in evs), 6)

    # brute-force as-of: latest strictly-preceding click per purchase
    want_asof = {}
    for u, evs in by_user.items():
        evs_sorted = sorted((ts, eid, et) for ts, eid, et, _ in evs)
        for i, (ts, eid, et) in enumerate(evs_sorted):
            if et != "purchase":
                continue
            best = None
            for pts, peid, pet in evs_sorted[:i]:
                if pet == "click":
                    best = peid
            want_asof[eid] = best
    got_asof = {r["purchase_id"]: r["click_id"] for r in asof_join(ds).take_all()}
    assert got_asof == want_asof

    # brute-force interval join vs sessionize spans
    got_ij = {
        r["event_id"]: (r["user_id"], r["session_seq"])
        for r in interval_join(ds, sessionize(ds, gap_minutes=30)).take_all()
    }
    assert got_ij == want_assign


def test_sessionize_chunked_equivalent(ray_session):
    """Two-level (time-chunked) sessionize is bit-identical to single-level
    on a random corpus whose sessions straddle chunk boundaries."""
    import ray.data

    from mdm_ray.events import sessionize

    rng = np.random.default_rng(11)
    n = 800
    MIN = 60_000_000
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            # 0..40h on a 10-min grid: plenty of 1h-chunk boundary crossings
            "ts": pa.array(
                (rng.integers(0, 240, size=n) * 10 * MIN).astype("int64")
            ).cast(pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, 25, size=n), pa.int64()),
            "event_type": pa.array(["click"] * n),
            "value": pa.array(
                rng.integers(0, 5000, size=n).astype("float64") / 100.0),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(11)

    def canon(res):
        df = res.to_pandas().sort_values(["user_id", "session_seq"])
        return df.reset_index(drop=True)

    for min_events in (1, 2):
        a = canon(sessionize(ds, gap_minutes=30, min_events=min_events))
        b = canon(sessionize(ds, gap_minutes=30, min_events=min_events,
                             chunk_hours=1))
        assert a.equals(b), f"min_events={min_events}"
        assert len(a) > 0


def test_asof_chunked_equivalent(ray_session):
    """Two-level (time-chunked) as-of join is identical to single-level."""
    import ray.data

    from mdm_ray.events import asof_join

    rng = np.random.default_rng(13)
    n = 900
    MIN = 60_000_000
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(
                (rng.integers(0, 300, size=n) * 10 * MIN).astype("int64")
            ).cast(pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, 20, size=n), pa.int64()),
            "event_type": pa.array(
                np.where(rng.random(n) < 0.4, "click", "purchase")),
            "value": pa.array(np.ones(n)),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(13)

    def canon(res):
        return {
            r["purchase_id"]: (r["click_id"], r["click_us"])
            for r in res.take_all()
        }

    a = canon(asof_join(ds))
    b = canon(asof_join(ds, chunk_hours=1))
    assert a == b and len(a) > 0
    assert any(v[0] is None for v in a.values())  # some unmatched lefts exist


def test_interval_join_chunked_equivalent(ray_session):
    """Chunked range join (interval replication per overlapped chunk) is
    identical to the single-level path, including intervals spanning many
    chunks."""
    import ray.data

    from mdm_ray.events import interval_join, sessionize

    rng = np.random.default_rng(17)
    n = 700
    MIN = 60_000_000
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            # 5-min grid over 50h: sessions regularly span 1h chunks
            "ts": pa.array(
                (rng.integers(0, 600, size=n) * 5 * MIN).astype("int64")
            ).cast(pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, 15, size=n), pa.int64()),
            "event_type": pa.array(["click"] * n),
            "value": pa.array(np.ones(n)),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(7)
    sess = sessionize(ds, gap_minutes=120)  # long gap -> multi-chunk sessions

    def canon(res):
        return {r["event_id"]: r["session_seq"] for r in res.take_all()}

    a = canon(interval_join(ds, sess))
    b = canon(interval_join(ds, sess, chunk_hours=1))
    assert a == b and len(a) == n


def test_media_strict_decodes_bmp_pipeline(ray_session):
    import numpy as np
    import ray.data

    from mdm_ray import codecs

    refs = [f"m://{i}" for i in range(12)]
    ds = ray.data.from_arrow(media.media_table_from_refs(refs, kind="bmp"))
    out = media.decode_pipeline(ds, mode="strict", out_hw=(8, 8)).take_all()
    assert len(out) == 12
    by_ref = {r["media_ref"]: r for r in out}
    for ref in refs:
        expect = codecs.synth_rgb(ref, 16, 16)[::2, ::2]  # nearest 16->8
        got = np.array(by_ref[ref]["pixels"], dtype=np.uint8).reshape(8, 8, 3)
        assert (got == expect).all()
        assert len(by_ref[ref]["media_embedding"]) == 3 + 8


def test_media_strict_decodes_wav_pipeline(ray_session):
    import numpy as np
    import ray.data

    from mdm_ray import codecs

    refs = [f"m://{i}" for i in range(6)]
    ds = ray.data.from_arrow(
        media.media_table_from_refs(refs, kind="wav", wav_samples=400)
    )
    out = media.audio_pipeline(ds, mode="strict").take_all()
    assert len(out) == 6
    for r in out:
        pcm = codecs.synth_pcm(r["media_ref"], 400, 8000).astype(np.float64)
        assert r["n_samples"] == 400 and r["sample_rate"] == 8000
        assert r["duration_ms"] == 400 * 1000.0 / 8000
        assert abs(r["rms"] - float(np.sqrt(np.mean(pcm**2)))) < 1e-9


def test_hot_key_census_counts_and_exploded_rows(ray_session):
    """The census's (hot dict, exploded-row count) invariant: exploded rows =
    Σ per-doc key-list lengths + the salting re-emission Σ_{s>cap} s·(⌈s/cap⌉−1)
    over hot keys. This number sizes every pair exchange
    (``dsutil.exchange_fanout``), so pin it exactly."""
    import ray.data

    from mdm_ray.blocking import hot_key_census, key_hash

    # key 'h' appears 23 times (hot at cap=8), 'm' 5 times, 'c' twice
    key_lists = (
        [["h", "c"], ["h", "m", "c"]]
        + [["h", "m"]] * 4
        + [["h"]] * 17
    )
    t = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(len(key_lists))]),
            "block_keys": pa.array(key_lists, pa.list_(pa.string())),
            "key_hashes": pa.array(
                [sorted(key_hash(k) for k in ks) for ks in key_lists],
                pa.list_(pa.uint64()),
            ),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3, shuffle=False)
    cap = 8
    hot, exploded = hot_key_census(ds, cap)
    assert hot == {"h": 23}
    base = sum(len(ks) for ks in key_lists)
    resalt = 23 * (-(-23 // cap) - 1)  # 23 rows re-emitted (ceil(23/8)-1)=2 extra times
    assert exploded == base + resalt

    # floor below cap surfaces mid-size keys without changing the resalt term
    hot2, exploded2 = hot_key_census(ds, cap, floor=4)
    assert hot2 == {"h": 23, "m": 5}
    assert exploded2 == base + resalt


def test_ann_bruteforce_empty_blocks(ray_session):
    """A dataset with more partitions than rows (empty repartition
    remainders) must produce exact top-k. The brute kernel also carries an
    explicit zero-row guard (matching the IVF kernel's) for executors that
    do hand empty batches to UDFs — _normalize would AxisError on one."""
    import ray.data

    from mdm_ray.similarity import ann_bruteforce

    rng = np.random.default_rng(3)
    mat = rng.standard_normal((5, 8))
    tbl = pa.table(
        {
            "vec_id": pa.array(list(range(5)), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in mat], pa.list_(pa.float32())
            ),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(12, shuffle=False)  # >n empty blocks
    out = ann_bruteforce(ds, tbl.slice(0, 2), k=3).take_all()
    assert {r["query_id"] for r in out} == {0, 1}
    assert all(1 <= r["rank"] <= 3 for r in out)
    assert len(out) == 6
