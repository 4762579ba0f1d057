"""Serial-core probe: time every DRIVER-SIDE serial segment of one ER run at
the scaling-arm fixture (round-4 verdict asked for a published breakdown and
a < 5 s total at the 145k-doc fixture).

Segments measured:
* ``census_tail``     — census work AFTER the last feature block lands (the
                        sketch pass itself overlaps the featurize stream).
* ``edge_extract``    — raw-task thresholded-edge gather from scored blocks.
* ``driver_cc``       — the numpy min-label fixpoint on the driver.
* ``executor_startup``— one trivial Dataset execution, sampled 3×/median: the
                        fixed per-execution cost each of the pipeline's three
                        executions (featurize, scored, golden) pays.

Serial total = census_tail + edge_extract + driver_cc + 3 × executor_startup.
(The featurize/scored/golden barrier tails are straggler effects, not serial
driver work — they shrink with CPU count and are visible in the per-stage
bench walls instead.)

Usage: python tools/serial_probe.py [customers=60000] [num_cpus=32]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    customers = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from mdm_ray import pipeline, synth
    from mdm_ray.blocking import (
        _census_finish, _census_sketch_block, build_blocked,
    )
    from mdm_ray.cluster import driver_cc, _scored_edges_block
    from mdm_ray.config import EngineConfig
    from mdm_ray.dsutil import block_refs, ensure_context
    from mdm_ray.pairs import build_scored
    from mdm_ray.survivorship import build_golden
    import pyarrow as pa

    ensure_context()
    cfg = EngineConfig()
    # warm workers (same as bench.py)
    warm = synth.generate_documents_ray(200, parallelism=num_cpus).materialize()
    pipeline.run_er(warm, cfg)["golden"].materialize()

    t: dict[str, float] = {}

    def sample_executor_startup() -> float:
        samples = []
        for _ in range(3):
            s0 = time.time()
            ray.data.range(8).map_batches(lambda b: b).materialize()
            samples.append(time.time() - s0)
        return sorted(samples)[1]

    t["executor_startup"] = round(sample_executor_startup(), 3)

    docs = synth.generate_documents_ray(
        customers, parallelism=num_cpus * 2).materialize()

    t0 = time.time()
    feats_lazy = pipeline.build_features(docs, cfg)
    sketch_task = ray.remote(_census_sketch_block)
    refs, sketch_refs = [], []
    for bundle in feats_lazy.iter_internal_ref_bundles():
        for ref, _meta in bundle.blocks:
            refs.append(ref)
            sketch_refs.append(sketch_task.remote(ref))
    t_blocks = time.time()
    t["featurize_stream"] = round(t_blocks - t0, 2)
    census, blocked_rows = _census_finish(
        refs, sketch_refs, cfg.max_block_size,
        floor=max(2, cfg.max_block_size // 4),
    )
    t["census_tail"] = round(time.time() - t_blocks, 3)
    feats = ray.data.from_arrow_refs(refs)

    t1 = time.time()
    scored = build_scored(
        build_blocked(feats, cfg, census=census), cfg, census=census,
        rows=blocked_rows,
    ).materialize()
    t["score_wall"] = round(time.time() - t1, 2)

    t2 = time.time()
    task = ray.remote(num_returns=2)(_scored_edges_block)
    outs = [task.remote(r) for r in block_refs(scored)]
    counts = ray.get([o[0] for o in outs])
    tabs = ray.get([o[1] for o, c in zip(outs, counts) if c > 0])
    t3 = time.time()
    t["edge_extract"] = round(t3 - t2, 3)
    emap = driver_cc(pa.concat_tables(tabs, promote_options="default"))
    t4 = time.time()
    t["driver_cc"] = round(t4 - t3, 3)

    golden = build_golden(
        feats, num_partitions=cfg.cc_num_partitions, label_map=emap
    ).materialize()
    t["golden_wall"] = round(time.time() - t4, 2)

    serial = (
        t["census_tail"] + t["edge_extract"] + t["driver_cc"]
        + 3 * t["executor_startup"]
    )
    print(json.dumps({
        "metric": "er_serial_core_seconds",
        "value": round(serial, 2),
        "unit": "sec",
        "customers": customers,
        "docs": feats.count(),
        "edges": int(sum(counts)),
        "clusters": golden.count(),
        "segments": t,
        "num_cpus": num_cpus,
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
