"""Run every catalog query against its DuckDB oracle, mimicking the driver's
compare (row count + column names + order-insensitive value comparison).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if hasattr(res, "to_pandas") and not hasattr(res, "iter_rows"):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from mdm_ray.queries import ORACLES, QUERIES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            ours = canon(to_pandas(fn(sf_dir)))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: RAY-ERROR {type(e).__name__}: {str(e)[-200:]}")
            failures += 1
            continue
        sql = ORACLES.get(name)
        if sql is None:
            print(f"{name}: rows-only ({len(ours)} rows) OK")
            continue
        try:
            theirs = canon(con.execute(sql).fetchdf())
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SQL-ERROR {str(e)[-200:]}")
            failures += 1
            continue
        status = []
        if list(ours.columns) != list(theirs.columns):
            status.append(f"schema {list(ours.columns)} vs {list(theirs.columns)}")
        elif len(ours) != len(theirs):
            status.append(f"rows {len(ours)} vs {len(theirs)}")
        else:
            try:
                # exact compare — the driver hashes values, so any bit-level
                # difference (even float32-vs-float64 column dtype) fails there.
                pd.testing.assert_frame_equal(
                    ours, theirs, check_dtype=False, check_exact=True
                )
            except AssertionError as e:
                status.append("values differ: " + str(e).split("\n")[-2][:150])
        if status:
            print(f"{name}: MISMATCH {'; '.join(status)}")
            failures += 1
        else:
            print(f"{name}: OK ({len(ours)} rows)")
    ray.shutdown()
    return failures


if __name__ == "__main__":
    sys.exit(min(1, main()))
