"""CLI entry point — usable standalone or via ``ray job submit``:

    ray job submit -- python -m mdm_ray.cli run --customers 5000 --ckpt /tmp/ckpt
    python -m mdm_ray.cli run --tier t1
    python -m mdm_ray.cli resume --ckpt /tmp/ckpt
"""

from __future__ import annotations

import argparse
import json
import sys
import time

TIERS = {"t1": 120, "t2": 5000, "bench": 200_000}


def _ray_init(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)


def cmd_run(args) -> int:
    _ray_init(args.num_cpus)
    import ray
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    from . import pipeline, synth
    from .config import EngineConfig

    n = args.customers or TIERS[args.tier]
    cfg = EngineConfig(weight_profile=args.profile)
    t0 = time.time()
    docs = synth.generate_documents_ray(n, parallelism=args.parallelism)
    out = pipeline.run_er_checkpointed(docs, args.ckpt, cfg)
    golden = out["golden"].materialize()
    clusters = golden.count()
    pairs = out["scored"].count()
    wall = time.time() - t0
    result = {
        "customers": n,
        "golden_clusters": clusters,
        "scored_pairs": pairs,
        "resumed_stages": [k for k, v in out["resumed"].items() if v],
        "wall_seconds": round(wall, 2),
        "pairs_per_second": round(pairs / wall, 1),
    }
    if args.f1:
        result["f1"] = pipeline.pairwise_f1(golden, synth.true_positive_pairs(n))
    if args.out:
        golden.write_parquet(args.out)
        result["out"] = args.out
    print(json.dumps(result))
    ray.shutdown()
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="mdm_ray", description="Ray-Data-native MDM/ER engine")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in ("run", "resume"):
        s = sub.add_parser(name, help="run the ER pipeline" + (" resuming from checkpoints" if name == "resume" else ""))
        s.add_argument("--tier", choices=list(TIERS), default="t1")
        s.add_argument("--customers", type=int, default=None)
        s.add_argument("--ckpt", default=None, help="checkpoint root dir (enables resume)")
        s.add_argument("--out", default=None, help="write golden records parquet here")
        s.add_argument("--num-cpus", type=int, default=None)
        s.add_argument("--parallelism", type=int, default=-1)
        s.add_argument("--profile", choices=["4way", "5way"], default="4way")
        s.add_argument("--f1", action="store_true", help="compute pairwise F1 vs fixture truth")
        s.set_defaults(func=cmd_run)
    args = p.parse_args(argv)
    if args.cmd == "resume" and not args.ckpt:
        p.error("resume requires --ckpt")
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
