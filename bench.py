"""Benchmark harness — one JSON line per run (driver contract).

Default: run the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) with ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and print
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...,
"num_cpus": N}``.

``--scaling``: run the ER pipeline in FRESH subprocesses at num_cpus=N and
4N (default 4 and 16) over the same input as interleaved N/4N rounds, each
round gated by a null-control job (a perfectly-parallel task fleet run FIRST
in the same process: if the host itself can't scale in that window, the
round can't evidence anything about the engine). Rounds accumulate until
``--min-qualified`` qualify (control efficiency >= ``--null-gate``), and the
headline number is the RAW ratio-of-median-arm-walls over qualified rounds —
the in-sandbox evidence for the two-cluster-size criterion (BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

DEFAULT_SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
ER_CUSTOMERS = int(os.environ.get("GRAFT_ER_CUSTOMERS", "20000"))


def null_control_tput(num_cpus: int, tasks_per_cpu: int = 12) -> float:
    """Host-ceiling control: a PERFECTLY parallel job (independent fixed-size
    numpy matmul tasks, no object-store traffic, no shuffle) timed at this
    width. On ideal hardware its 4x-width efficiency is 1.0 by construction,
    so whatever it measures on THIS host (oversubscribed vCPUs, ~1.7x
    per-core inflation at full width — BASELINE.md) is the ceiling any
    engine can reach; the engine's efficiency should be read against it.
    Returns tasks/sec."""
    import numpy as np
    import ray

    @ray.remote(num_cpus=1)
    def spin(seed: int) -> float:
        a = np.random.default_rng(seed).standard_normal((256, 256))
        s = 0.0
        for _ in range(150):
            a = a @ a
            n = float(np.abs(a).max())
            a /= n if n > 0 else 1.0
            s += n * 1e-12
        return s

    ray.get([spin.remote(i) for i in range(num_cpus)])  # warm workers
    k = num_cpus * tasks_per_cpu
    t0 = time.time()
    ray.get([spin.remote(i) for i in range(k)])
    return round(k / (time.time() - t0), 3)


def run_er_bench(num_cpus: int, customers: int) -> dict:
    from mdm_ray import pipeline, synth
    from mdm_ray.blocking import build_blocked
    from mdm_ray.config import EngineConfig

    from mdm_ray.dsutil import ensure_context

    ensure_context()
    cfg = EngineConfig()
    # warmup: start Ray workers and import the library in them BEFORE the
    # clock starts, so the measurement compares steady-state throughput, not
    # worker cold-start (which scales with CPU count and would understate
    # scaling efficiency)
    warm = synth.generate_documents_ray(200, parallelism=num_cpus).materialize()
    pipeline.run_er(warm, cfg)["golden"].materialize()
    out_extra = {}
    if os.environ.get("GRAFT_NULL_CONTROL"):
        # sample the host's parallel capacity FIRST, in the same process and
        # time window as the measurement it gates/calibrates (the --scaling
        # harness disqualifies rounds whose control shows a contended host)
        out_extra["null_tasks_per_sec"] = null_control_tput(num_cpus)
    t0 = time.time()
    # materialize the tiny generated fixture so the featurize chain fans out
    # over real-sized blocks instead of bundling the ~KB range inputs
    docs = synth.generate_documents_ray(customers, parallelism=num_cpus * 2).materialize()
    # featurize with the census sketch overlapping the materialize barrier —
    # the same fused path run_er executes (pipeline.featurize_and_census)
    feats, census, blocked_rows = pipeline.featurize_and_census(docs, cfg)
    n_docs = feats.count()
    t_feat = time.time()
    # block → pair → score in ONE streaming execution — the PRODUCTION path
    # (retain filter + cheap-leg bound prefilter active, exactly what run_er
    # executes): the wide pair table is never materialized; every candidate
    # pair is evaluated (bound test or full kernels — output-identical to
    # full scoring, see test_retain_prefilter_output_identical)
    from mdm_ray.pairs import build_scored

    scored = build_scored(
        build_blocked(feats, cfg, census=census), cfg, census=census,
        rows=blocked_rows,
    ).materialize()
    retained = scored.count()
    t_score = time.time()
    # cluster+survive via the driver-CC fast path when the thresholded edge
    # set fits (raw-task edge extract + numpy fixpoint + broadcast into the
    # survivorship execution), distributed fixpoint otherwise — run_er's path
    labels, golden = pipeline.cluster_and_survive(feats, scored, cfg)
    t_cc = time.time()
    golden = golden.materialize()
    clusters = golden.count()
    t_end = time.time()
    wall = t_end - t0
    # candidate count (UNtimed bookkeeping pass): emission only, no scoring —
    # the timed scoring stage evaluated every one of these pairs. The count is
    # deterministic per fixture size, so repeat invocations (--scaling rounds)
    # can pass it via GRAFT_CANDIDATES instead of re-running the pass.
    if os.environ.get("GRAFT_CANDIDATES"):
        candidates = int(os.environ["GRAFT_CANDIDATES"])
    else:
        import pyarrow as pa

        from mdm_ray.pairs import _partition_by_key, emit_pairs_block

        def count_pairs(b: pa.Table) -> pa.Table:
            total = sum(c.num_rows for c in emit_pairs_block(b))
            return pa.table({"n": pa.array([total], pa.int64())})

        from mdm_ray.dsutil import exchange_fanout

        candidates = int(
            _partition_by_key(
                build_blocked(feats, cfg, census=census),
                n=exchange_fanout(blocked_rows),
            )
            .map_batches(count_pairs, batch_size=None, batch_format="pyarrow")
            .sum("n")
        )
    from mdm_ray.dsutil import exchange_fanout as _fanout

    return {
        **out_extra,
        "docs": n_docs,
        "blocked_rows": blocked_rows,
        # the sort-exchange partition count the pair stage actually used —
        # published so fan-out calibration (EXCHANGE_ROWS_PER_TASK vs the
        # 8x-CPU cap) is auditable per fixture size (VERDICT r4 #8)
        "pair_exchange_fanout": _fanout(blocked_rows),
        "candidate_pairs": candidates,
        "retained_pairs": retained,
        "clusters": clusters,
        "seconds": {
            "featurize": round(t_feat - t0, 2),
            "block_pair_score": round(t_score - t_feat, 2),
            "cluster_and_survive": round(t_end - t_score, 2),
            "cc_serial": round(t_cc - t_score, 2),
            "total": round(wall, 2),
        },
        "docs_per_sec": round(n_docs / wall, 1),
        "pairs_scored_per_sec": round(candidates / max(1e-9, t_score - t_feat), 1),
        "pairs_per_sec_e2e": round(candidates / wall, 1),
    }


def run_incremental_bench(num_cpus: int, base_customers: int = 5000,
                          stream_records: int = 2000) -> dict:
    """Streaming-twin throughput: batch-resolve a base corpus, then time ONE
    incremental mini-batch merge (candidate gen + 4-way scoring + argmax +
    upsert survivorship + staging/match-result sinks — the full streaming
    path). Reference comparison: ~185 ms/record single-record loop
    (MDM_STREAMING_PROCESSING.md:203)."""
    import ray.data

    from mdm_ray import incremental, pipeline, synth
    from mdm_ray.dsutil import ensure_context

    ensure_context()
    docs = synth.generate_documents_ray(
        base_customers, parallelism=num_cpus).materialize()
    golden = pipeline.run_er(docs)["golden"].materialize()
    # warm the merge path (worker imports, actor startup) with a 50-doc batch
    warm = ray.data.from_arrow(
        synth.generate_stream_docs(base_customers, 50)).materialize()
    incremental.incremental_merge(warm, golden)["golden"].materialize()

    stream_ds = ray.data.from_arrow(
        synth.generate_stream_docs(base_customers, stream_records)).materialize()
    t0 = time.time()
    out = incremental.incremental_merge(stream_ds, golden)
    n_golden = out["golden"].materialize().count()
    n_results = out["match_results"].materialize().count()
    n_staged = out["staged"].materialize().count()
    wall = time.time() - t0
    return {
        "base_customers": base_customers,
        "stream_records": stream_records,
        "golden_after": n_golden,
        "match_results": n_results,
        "staged": n_staged,
        "seconds": round(wall, 2),
        "records_per_sec": round(stream_records / wall, 1),
        "ms_per_record": round(1000.0 * wall / stream_records, 2),
    }


LARGE_CUSTOMERS = int(os.environ.get("GRAFT_LARGE_CUSTOMERS", "60000"))


def run_ann_bench(sf_dir: str, expand_to: int = 200_000, num_queries: int = 512,
                  k: int = 10, num_centroids: int = 64, nprobe: int = 8) -> dict:
    """IVF-vs-brute-force QUERY-phase comparison at a size where compute,
    not orchestration, dominates: the sf embedding table (2k vectors) is
    deterministically expanded to ``expand_to`` vectors (seeded gaussian
    jitter per replica — bench fixture synthesis, not a pipeline stage).
    The index build is timed separately: it is the one-time cost queries
    amortize, exactly like the reference's managed vector index."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from mdm_ray.similarity import ann_bruteforce, ann_ivf_query, build_ivf_index

    base = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"]
    )
    bmat = np.array(base["embedding"].to_pylist(), dtype=np.float32)
    reps = -(-expand_to // len(bmat))
    rng = np.random.default_rng(7)
    mat = np.concatenate(
        [bmat + rng.normal(0, 0.05, bmat.shape).astype(np.float32) for _ in range(reps)]
    )[:expand_to]
    dim = mat.shape[1]
    flat = pa.array(mat.reshape(-1), pa.float32())
    emb = pa.FixedSizeListArray.from_arrays(flat, dim).cast(pa.list_(pa.float32()))
    tbl = pa.table({"vec_id": pa.array(np.arange(expand_to)), "embedding": emb})
    ds = ray.data.from_arrow(tbl).repartition(64, shuffle=False).materialize()
    queries = tbl.slice(0, num_queries)

    t0 = time.time()
    brute_rows = ann_bruteforce(ds, queries, k=k).count()
    t_brute = time.time() - t0
    t0 = time.time()
    index_ds, cents = build_ivf_index(ds, num_centroids=num_centroids)
    t_build = time.time() - t0
    t0 = time.time()
    ivf_rows = ann_ivf_query(index_ds, cents, queries, k=k, nprobe=nprobe).count()
    t_ivf = time.time() - t0
    return {
        "vectors": expand_to,
        "queries": num_queries,
        "k": k,
        "num_centroids": num_centroids,
        "nprobe": nprobe,
        "brute_seconds": round(t_brute, 2),
        "ivf_build_seconds": round(t_build, 2),
        "ivf_query_seconds": round(t_ivf, 2),
        "ivf_speedup": round(t_brute / max(t_ivf, 1e-9), 2),
        "brute_rows": brute_rows,
        "ivf_rows": ivf_rows,
    }


def run_full_bench(sf_dir: str, num_cpus: int, customers: int = ER_CUSTOMERS) -> dict:
    from mdm_ray import queries as Q

    timings: dict[str, float] = {}

    # ER benches: best of GRAFT_BENCH_ER_REPEAT runs (same variance guard as
    # --er-only --repeat). Measured 2026-08-18: the SAME binary on the SAME
    # 145k-doc fixture at 32 cpus spread 45.2 s vs 170.9 s fifteen minutes
    # apart (3.8x, host weather at full width) — a single draw is
    # uninterpretable, and the catalog queries below get medians already.
    er_repeat = max(1, int(os.environ.get("GRAFT_BENCH_ER_REPEAT", "2")))
    er_runs: dict[str, list[dict]] = {}

    def best_er(name: str, n_customers: int) -> dict:
        # best-of-N is upward-biased by construction (variance guard, see
        # above); EVERY draw is published in er_runs so the statistic stays
        # auditable the way query_runs keeps the raw per-round query timings
        draws = [run_er_bench(num_cpus, n_customers) for _ in range(er_repeat)]
        er_runs[name] = [
            {"total_s": d["seconds"]["total"],
             "pairs_per_sec_e2e": d["pairs_per_sec_e2e"],
             "stage_seconds": d["seconds"]} for d in draws
        ]
        return max(draws, key=lambda d: d["pairs_per_sec_e2e"])

    er = best_er("er_pipeline", customers)
    timings["er_pipeline"] = er["seconds"]["total"]
    # scale-headroom config tracked per round (regress-tests the claim that
    # per-pair throughput holds as the fixture grows 3x; the 10x 485k-doc
    # run is available via --large)
    er_large = best_er("er_pipeline_large", LARGE_CUSTOMERS)
    timings["er_pipeline_large"] = er_large["seconds"]["total"]

    # warm each query family once at the smallest sf (sub-second each):
    # worker-side UDF imports / regex compiles / Acero warmup happen before
    # the clock, so the timed numbers measure the operator, not cold start
    warm_sf = sf_dir.replace("sf0.1", "sf0.001")
    if warm_sf != sf_dir:
        for qn in ("q_dedup_jaccard", "q_dedup_minhash", "q_ann_topk",
                   "q_analytics_agg", "q_token_count", "q_fuzzy_pairs",
                   "q_cluster_cc", "q_sessionize", "q_range_join",
                   "q_percentiles", "q_distinct_count"):
            getattr(Q, qn)(warm_sf).count()

    # catalog queries: ≥3 INTERLEAVED rounds (A,B,…,A,B,… — adjacent rounds
    # see similar host weather, so a one-off contention spike cannot be
    # mistaken for a regression on this 1.8×-noise host). `queries` carries
    # the per-query MEDIAN; `query_runs` the raw per-round values.
    query_specs = [
        ("dedup_jaccard", lambda: Q.q_dedup_jaccard(sf_dir).count()),
        ("dedup_minhash", lambda: Q.q_dedup_minhash(sf_dir).count()),
        ("ann_topk", lambda: Q.q_ann_topk(sf_dir).count()),
        ("analytics_agg", lambda: Q.q_analytics_agg(sf_dir).count()),
        ("token_count", lambda: Q.q_token_count(sf_dir).count()),
        ("fuzzy_pairs", lambda: Q.q_fuzzy_pairs(sf_dir).count()),
        ("cluster_cc", lambda: Q.q_cluster_cc(sf_dir).count()),
        ("sessionize", lambda: Q.q_sessionize(sf_dir).count()),
        ("range_join", lambda: Q.q_range_join(sf_dir).count()),
        ("percentiles", lambda: Q.q_percentiles(sf_dir).count()),
        ("distinct_count", lambda: Q.q_distinct_count(sf_dir).count()),
        ("media_features", lambda: Q.q_media_features(sf_dir).count()),
    ]
    query_rounds = max(1, int(os.environ.get("GRAFT_QUERY_ROUNDS", "3")))
    query_runs: dict[str, list[float]] = {name: [] for name, _ in query_specs}
    for _ in range(query_rounds):
        for name, fn in query_specs:
            t = time.time()
            fn()
            query_runs[name].append(round(time.time() - t, 2))
    for name, runs in query_runs.items():
        s = sorted(runs)
        m = len(s) // 2
        timings[name] = s[m] if len(s) % 2 else round((s[m - 1] + s[m]) / 2, 2)
    ann = run_ann_bench(sf_dir)
    timings["ann_scale_brute"] = ann["brute_seconds"]
    timings["ann_scale_ivf"] = ann["ivf_query_seconds"]
    return {"er": er, "er_large": er_large, "queries": timings,
            "query_runs": query_runs, "er_runs": er_runs, "ann": ann}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--num-cpus", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--customers", type=int, default=ER_CUSTOMERS)
    ap.add_argument("--er-only", action="store_true")
    ap.add_argument("--incremental", action="store_true",
                    help="streaming-twin mini-batch merge throughput")
    ap.add_argument("--large", action="store_true",
                    help="10x scale-headroom config only (~485k docs)")
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--repeat", type=int, default=1,
                    help="repetitions per measurement; best kept (variance guard)")
    ap.add_argument("--scale-customers", type=int,
                    default=int(os.environ.get("GRAFT_SCALE_CUSTOMERS", "150000")),
                    help="--scaling: ER fixture size. Default 150k (~364k docs, "
                         "~183M candidate pairs): large enough that per-stage "
                         "compute dominates the fixed exchange/driver terms "
                         "(Amdahl) the way it would at production scale. "
                         "Recalibrated from 60k in round 4: the bit-parallel "
                         "scoring kernel cut parallel seconds 3.4x, so 145k-doc "
                         "arms no longer dominated the ~10-16 s serial core "
                         "(SCALING_r04.json vs SCALING_r04_large.json)")
    ap.add_argument("--scale-repeat", type=int, default=1,
                    help="--scaling: repetitions per cpu-count invocation; "
                         "best kept. Default 1 since the 150k-customer "
                         "recalibration: arms run 3-12 min and self-average, "
                         "and the cross-round statistic is the MEDIAN anyway "
                         "(2 was the guard for the old 60k short arms)")
    ap.add_argument("--rounds", type=int, default=3,
                    help="--scaling: MINIMUM number of interleaved lo/hi "
                         "rounds (all are published)")
    ap.add_argument("--min-qualified", type=int,
                    default=int(os.environ.get("GRAFT_MIN_QUALIFIED", "3")),
                    help="--scaling: keep adding rounds until this many "
                         "QUALIFY (round's null-control efficiency >= "
                         "--null-gate), up to --max-rounds. The headline "
                         "number is the qualified-rounds raw efficiency")
    ap.add_argument("--max-rounds", type=int,
                    default=int(os.environ.get("GRAFT_MAX_ROUNDS", "6")),
                    help="--scaling: hard cap on total rounds (wall-clock; "
                         "~13 min/round at the 150k default fixture)")
    ap.add_argument("--null-gate", type=float, default=0.9,
                    help="--scaling: a round qualifies iff its null-control "
                         "(perfectly-parallel job) efficiency is >= this — "
                         "i.e. the host itself could scale in that window")
    ap.add_argument("--scale-cpus", default="4,16",
                    help="N,4N pair for --scaling. Default 4,16: this host's 32 "
                         "vCPUs are oversubscribed (pure-spin test shows 1.67x "
                         "per-core slowdown at full width), so 8->32 measures "
                         "host contention, not the engine")
    args = ap.parse_args()

    if args.scaling:
        # Interleaved-median methodology: the shared host's per-core speed
        # drifts ~1.4x over minutes, so a single (lo, hi) pair measures host
        # weather as much as the engine. Run `--rounds` alternating lo/hi
        # pairs (adjacent runs see similar host conditions), compute the
        # efficiency per round, and report the MEDIAN round — not best-of-N.
        lo, hi = (int(x) for x in args.scale_cpus.split(","))
        assert hi == 4 * lo, "scaling criterion compares N and 4N"

        known_candidates: list[int] = []

        def run_one(cpus: int) -> dict:
            env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus),
                       GRAFT_ER_CUSTOMERS=str(args.scale_customers),
                       GRAFT_NULL_CONTROL="1")
            if known_candidates:
                env["GRAFT_CANDIDATES"] = str(known_candidates[0])
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--er-only",
                 "--num-cpus", str(cpus), "--sf-dir", args.sf_dir,
                 "--customers", str(args.scale_customers),
                 "--repeat", str(max(args.repeat, args.scale_repeat))],
                capture_output=True, text=True, env=env, check=True,
            )
            # raylet may interleave warnings on stdout: take the last JSON line
            json_lines = [
                ln for ln in out.stdout.strip().splitlines()
                if ln.startswith('{"metric"')
            ]
            er = json.loads(json_lines[-1])["er"]
            if not known_candidates:
                known_candidates.append(int(er["candidate_pairs"]))
            return er

        # Null-control gating: the host's own parallel capacity drifts (it is
        # an oversubscribed shared VM) and in bad windows a perfectly-parallel
        # job measures 4x-width efficiency well below 1.0 — in those windows
        # NO engine can evidence its scaling. Each round runs the control
        # first in both arm processes; the round QUALIFIES iff the control's
        # own efficiency >= --null-gate. Rounds are added until
        # --min-qualified qualify (capped at --max-rounds); every round is
        # published, and the headline is the qualified-rounds raw efficiency.
        rounds = []
        qualified = 0
        while len(rounds) < args.max_rounds and (
            qualified < args.min_qualified or len(rounds) < args.rounds
        ):
            r_lo = run_one(lo)
            r_hi = run_one(hi)
            eff_null = round(
                (r_hi["null_tasks_per_sec"] / r_lo["null_tasks_per_sec"]) / 4, 3)
            ok = eff_null >= args.null_gate
            qualified += ok
            rounds.append({
                "qualified": ok,
                "eff_e2e": round(
                    (r_hi["pairs_per_sec_e2e"] / r_lo["pairs_per_sec_e2e"]) / 4, 3),
                "eff_scoring": round(
                    (r_hi["pairs_scored_per_sec"] / r_lo["pairs_scored_per_sec"]) / 4, 3),
                "eff_null_control": eff_null,
                f"pairs_scored_per_sec_{lo}cpus": r_lo["pairs_scored_per_sec"],
                f"pairs_scored_per_sec_{hi}cpus": r_hi["pairs_scored_per_sec"],
                f"null_tasks_per_sec_{lo}cpus": r_lo["null_tasks_per_sec"],
                f"null_tasks_per_sec_{hi}cpus": r_hi["null_tasks_per_sec"],
                f"er_seconds_{lo}cpus": r_lo["seconds"]["total"],
                f"er_seconds_{hi}cpus": r_hi["seconds"]["total"],
                f"stage_seconds_{lo}cpus": r_lo["seconds"],
                f"stage_seconds_{hi}cpus": r_hi["seconds"],
            })

        def median(vals):
            s = sorted(vals)
            m = len(s) // 2
            return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2

        # Estimators, all published:
        # * qualified ratio-of-medians (HEADLINE) — per-arm median throughput
        #   over qualified rounds only, then one ratio. Qualification removes
        #   windows where the host itself could not scale; ratio-of-medians
        #   avoids injecting the arms' independent noise draws into every
        #   per-round ratio.
        # * all-rounds ratio-of-medians and median-of-round-ratios — for
        #   transparency/continuity with earlier rounds.
        def arm_stats(rs):
            return {
                "lo_s": median(r[f"er_seconds_{lo}cpus"] for r in rs),
                "hi_s": median(r[f"er_seconds_{hi}cpus"] for r in rs),
                "lo_pps": median(r[f"pairs_scored_per_sec_{lo}cpus"] for r in rs),
                "hi_pps": median(r[f"pairs_scored_per_sec_{hi}cpus"] for r in rs),
                "lo_null": median(r[f"null_tasks_per_sec_{lo}cpus"] for r in rs),
                "hi_null": median(r[f"null_tasks_per_sec_{hi}cpus"] for r in rs),
            }

        q_rounds = [r for r in rounds if r["qualified"]] or rounds
        q = arm_stats(q_rounds)
        a = arm_stats(rounds)
        eff_raw_q = round((q["lo_s"] / q["hi_s"]) / 4, 3)
        eff_raw_all = round((a["lo_s"] / a["hi_s"]) / 4, 3)
        # host ceiling: what a BY-CONSTRUCTION perfectly-parallel job measures
        # on this host at the same widths in the same time windows
        eff_null_all = round((a["hi_null"] / a["lo_null"]) / 4, 3)
        print(json.dumps({
            "metric": f"scaling_efficiency_{lo}_to_{hi}_cpus",
            "value": eff_raw_q,
            "qualified_rounds": qualified,
            "total_rounds": len(rounds),
            "null_gate": args.null_gate,
            "all_rounds_efficiency": eff_raw_all,
            "null_control_efficiency": eff_null_all,
            # explicitly ALL-rounds-based (raw and null from the same
            # estimator) — the headline above is qualified-rounds raw
            "all_rounds_host_normalized_efficiency": round(
                min(eff_raw_all / eff_null_all, 1.0), 3),
            "unit": "ratio",
            "methodology": (
                f"RAW ratio of median-arm wall times over the "
                f"{qualified} null-control-qualified rounds (control "
                f"efficiency >= {args.null_gate}) of {len(rounds)} "
                f"interleaved {lo}/{hi}-cpu rounds; all rounds published"
                + ("" if qualified else
                   " — NO round qualified, value falls back to all rounds")
            ),
            "scoring_stage_efficiency_qualified": round(
                (q["hi_pps"] / q["lo_pps"]) / 4, 3),
            "scoring_stage_efficiency": round((a["hi_pps"] / a["lo_pps"]) / 4, 3),
            "median_round_eff_e2e": round(median(r["eff_e2e"] for r in rounds), 3),
            "median_round_eff_scoring": round(
                median(r["eff_scoring"] for r in rounds), 3),
            "median_seconds_qualified": {
                f"{lo}cpus": q["lo_s"], f"{hi}cpus": q["hi_s"]},
            "median_seconds": {f"{lo}cpus": a["lo_s"], f"{hi}cpus": a["hi_s"]},
            "median_pairs_scored_per_sec": {
                f"{lo}cpus": a["lo_pps"], f"{hi}cpus": a["hi_pps"]},
            "median_null_tasks_per_sec": {
                f"{lo}cpus": a["lo_null"], f"{hi}cpus": a["hi_null"]},
            "rounds": rounds,
            "sf": args.sf_dir,
            "customers": args.scale_customers,
        }))
        return 0

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    t0 = time.time()
    if args.incremental:
        inc = run_incremental_bench(args.num_cpus)
        print(json.dumps({
            "metric": "incremental_ms_per_record",
            "value": inc["ms_per_record"],
            "unit": "ms",
            "incremental": inc,
            "num_cpus": args.num_cpus,
        }))
        ray.shutdown()
        return 0
    if args.er_only:
        er = run_er_bench(args.num_cpus, args.customers)
        for _ in range(args.repeat - 1):
            again = run_er_bench(args.num_cpus, args.customers)
            if again["pairs_per_sec_e2e"] > er["pairs_per_sec_e2e"]:
                er = again
        payload = {"er": er, "queries": {"er_pipeline": er["seconds"]["total"]}}
    elif args.large:
        er = run_er_bench(args.num_cpus, int(os.environ.get(
            "GRAFT_XLARGE_CUSTOMERS", "200000")))
        payload = {"er": er,
                   "queries": {"er_pipeline_10x": er["seconds"]["total"]}}
    else:
        payload = run_full_bench(args.sf_dir, args.num_cpus, args.customers)
    total = round(time.time() - t0, 2)
    out = {
        "metric": "bench_total_seconds",
        "value": total,
        "unit": "sec",
        "queries": payload["queries"],
        "sf": args.sf_dir,
        "num_cpus": args.num_cpus,
        "er": payload["er"],
    }
    if "er_large" in payload:
        out["er_large"] = payload["er_large"]
    if "ann" in payload:
        out["ann"] = payload["ann"]
    if "query_runs" in payload:
        out["query_runs"] = payload["query_runs"]
    if "er_runs" in payload:
        out["er_runs"] = payload["er_runs"]
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
