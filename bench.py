"""Benchmark harness — one JSON line per run (driver contract).

Default: run the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) with ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and print
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...,
"num_cpus": N}``.

``--scaling``: run the ER pipeline twice in FRESH subprocesses at
num_cpus=8 and num_cpus=32 over the same input and report both throughputs
plus scaling efficiency = (pps_32 / pps_8) / 4 — the in-sandbox evidence for
the two-cluster-size criterion (BASELINE.md).
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


def run_er_bench(num_cpus: int, customers: int) -> dict:
    from mdm_ray import pipeline, synth
    from mdm_ray.blocking import build_blocked
    from mdm_ray.config import EngineConfig
    from mdm_ray.pairs import build_pairs
    from mdm_ray.scoring import score_pairs

    from mdm_ray.dsutil import ensure_context

    ensure_context()
    cfg = EngineConfig()
    t0 = time.time()
    # materialize the tiny generated fixture so the featurize chain fans out
    # over real-sized blocks instead of bundling the ~KB range inputs
    docs = synth.generate_documents_ray(customers, parallelism=num_cpus * 2).materialize()
    feats = pipeline.build_features(docs, cfg).materialize()
    n_docs = feats.count()
    t_feat = time.time()
    pairs = build_pairs(build_blocked(feats, cfg)).materialize()
    candidates = pairs.count()
    t_pairs = time.time()
    scored = score_pairs(pairs, cfg).materialize()
    retained = scored.count()
    t_score = time.time()
    from mdm_ray.cluster import build_edges, connected_components, init_labels
    from mdm_ray.survivorship import build_golden

    labels = connected_components(build_edges(scored), init_labels(feats), cfg)
    golden = build_golden(feats, labels, num_partitions=cfg.cc_num_partitions).materialize()
    clusters = golden.count()
    t_end = time.time()
    wall = t_end - t0
    return {
        "docs": n_docs,
        "candidate_pairs": candidates,
        "retained_pairs": retained,
        "clusters": clusters,
        "seconds": {
            "featurize": round(t_feat - t0, 2),
            "block_and_pair": round(t_pairs - t_feat, 2),
            "score": round(t_score - t_pairs, 2),
            "cluster_and_survive": round(t_end - t_score, 2),
            "total": round(wall, 2),
        },
        "docs_per_sec": round(n_docs / wall, 1),
        "pairs_scored_per_sec": round(candidates / max(1e-9, t_score - t_feat), 1),
        "pairs_per_sec_e2e": round(candidates / wall, 1),
    }


def run_full_bench(sf_dir: str, num_cpus: int, customers: int = ER_CUSTOMERS) -> dict:
    from mdm_ray import queries as Q

    timings: dict[str, float] = {}

    def timed(name, fn):
        t = time.time()
        n = fn()
        timings[name] = round(time.time() - t, 2)
        return n

    er = run_er_bench(num_cpus, customers)
    timings["er_pipeline"] = er["seconds"]["total"]

    timed("dedup_jaccard", lambda: Q.q_dedup_jaccard(sf_dir).count())
    timed("dedup_minhash", lambda: Q.q_dedup_minhash(sf_dir).count())
    timed("ann_topk", lambda: Q.q_ann_topk(sf_dir).count())
    timed("analytics_agg", lambda: Q.q_analytics_agg(sf_dir).count())
    timed("token_count", lambda: Q.q_token_count(sf_dir).count())
    timed("fuzzy_pairs", lambda: Q.q_fuzzy_pairs(sf_dir).count())
    timed("cluster_cc", lambda: Q.q_cluster_cc(sf_dir).count())
    return {"er": er, "queries": timings}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--num-cpus", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--customers", type=int, default=ER_CUSTOMERS)
    ap.add_argument("--er-only", action="store_true")
    ap.add_argument("--scaling", action="store_true")
    args = ap.parse_args()

    if args.scaling:
        results = {}
        for cpus in (8, 32):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus),
                       GRAFT_ER_CUSTOMERS=str(args.customers))
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--er-only",
                 "--num-cpus", str(cpus), "--sf-dir", args.sf_dir],
                capture_output=True, text=True, env=env, check=True,
            )
            results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
        pps8 = results[8]["er"]["pairs_per_sec_e2e"]
        pps32 = results[32]["er"]["pairs_per_sec_e2e"]
        eff = (pps32 / pps8) / 4 if pps8 else 0.0
        print(json.dumps({
            "metric": "scaling_efficiency_8_to_32_cpus",
            "value": round(eff, 3),
            "unit": "ratio",
            "pairs_per_sec_8cpus": pps8,
            "pairs_per_sec_32cpus": pps32,
            "er_seconds_8cpus": results[8]["er"]["seconds"]["total"],
            "er_seconds_32cpus": results[32]["er"]["seconds"]["total"],
            "sf": args.sf_dir,
            "customers": args.customers,
        }))
        return 0

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    t0 = time.time()
    if args.er_only:
        er = run_er_bench(args.num_cpus, args.customers)
        payload = {"er": er, "queries": {"er_pipeline": er["seconds"]["total"]}}
    else:
        payload = run_full_bench(args.sf_dir, args.num_cpus, args.customers)
    total = round(time.time() - t0, 2)
    print(json.dumps({
        "metric": "bench_total_seconds",
        "value": total,
        "unit": "sec",
        "queries": payload["queries"],
        "sf": args.sf_dir,
        "num_cpus": args.num_cpus,
        "er": payload["er"],
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
