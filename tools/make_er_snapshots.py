"""Generate committed snapshot oracles for the ER-fixture query trio.

``er_golden`` / ``er_resolved`` / ``er_incremental`` run on the synthesized
interleaved corpus, which the DuckDB oracle's pre-registered views cannot
see — but the corpus (and every pipeline stage) is deterministic by
construction, so the expected output is a fixed table. This tool runs the
three queries at the sf0.001 fixture scale, canonicalizes (columns sorted by
name, rows sorted by all columns), and writes parquet snapshots under
``tests/data/``; ``tests/test_pipeline.py::test_er_fixture_snapshots``
re-runs the queries and requires exact equality.

Usage: python tools/make_er_snapshots.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SNAP_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "tests", "data")
SF_DIR = "/root/testdata/sf0.001"
SNAP_QUERIES = ("er_golden", "er_resolved", "er_incremental")


def canonical(df):
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    from mdm_ray.queries import QUERIES

    os.makedirs(SNAP_DIR, exist_ok=True)
    for name in SNAP_QUERIES:
        df = canonical(QUERIES[name](SF_DIR).to_pandas())
        path = os.path.join(SNAP_DIR, f"{name}_sf0001.parquet")
        df.to_parquet(path, index=False)
        print(f"{name}: {len(df)} rows -> {path}")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
