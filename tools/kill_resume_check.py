"""Bench-scale kill/resume drill for the checkpointed ER pipeline.

Three fresh processes over the SAME synthesized fixture:

1. ``crash``  — run ``run_er_checkpointed`` on a fresh checkpoint dir, and
   the moment the ``scored`` stage's checkpoint + lineage sidecar land,
   SIGKILL the process (no cleanup, no ray.shutdown — a real mid-run death
   between ``scored`` and ``labels``).
2. ``resume`` — rerun the same invocation on the same checkpoint dir; the
   lineage sidecars must mark features+scored as resumed (skipped), and
   labels/golden compute fresh.
3. ``full``   — an independent uncrashed run on a separate checkpoint dir.

The check passes iff resume really skipped the completed stages AND the
resumed golden table is byte-identical (canonical sha256 over sorted
columns/rows) to the uncrashed run's.

Usage: python tools/kill_resume_check.py [--customers 20000]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import signal
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CKPT_CRASH = "/tmp/kill_resume_ckpt"
CKPT_FULL = "/tmp/kill_resume_ckpt_full"


def canonical_hash(ds) -> str:
    """Order-insensitive content hash: columns sorted by name, rows sorted by
    every column's string repr, floats via full repr (bit-faithful)."""
    t = ds.to_pandas()
    t = t[sorted(t.columns)]
    cols = {
        c: t[c].map(lambda v: repr(list(v)) if hasattr(v, "__len__")
                    and not isinstance(v, str) else repr(v))
        for c in t.columns
    }
    import pandas as pd

    s = pd.DataFrame(cols).sort_values(by=list(t.columns), kind="mergesort")
    h = hashlib.sha256()
    for c in t.columns:
        h.update(c.encode())
        h.update("\x00".join(s[c].tolist()).encode())
    return h.hexdigest()


def _init_ray(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False


def _docs(customers: int):
    from mdm_ray import synth

    return synth.generate_documents_ray(customers, parallelism=32).materialize()


def child(mode: str, customers: int, num_cpus: int) -> int:
    _init_ray(num_cpus)
    from mdm_ray import pipeline

    if mode == "crash":
        shutil.rmtree(CKPT_CRASH, ignore_errors=True)
        pipeline.run_er_checkpointed(_docs(customers), CKPT_CRASH,
                                     stop_after="scored")
        # checkpoint + sidecar are on disk; die like a preempted worker
        os.kill(os.getpid(), signal.SIGKILL)
        return 1  # unreachable
    if mode == "resume":
        out = pipeline.run_er_checkpointed(_docs(customers), CKPT_CRASH)
    else:  # full
        shutil.rmtree(CKPT_FULL, ignore_errors=True)
        out = pipeline.run_er_checkpointed(_docs(customers), CKPT_FULL)
    print(json.dumps({
        "mode": mode,
        "resumed": out["resumed"],
        "clusters": out["golden"].count(),
        "golden_hash": canonical_hash(out["golden"]),
    }))
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--customers", type=int, default=20000)
    ap.add_argument("--num-cpus", type=int, default=32)
    ap.add_argument("--mode", choices=["crash", "resume", "full"])
    args = ap.parse_args()
    if args.mode:
        return child(args.mode, args.customers, args.num_cpus)

    def run(mode: str):
        return subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--mode", mode,
             "--customers", str(args.customers),
             "--num-cpus", str(args.num_cpus)],
            capture_output=True, text=True,
        )

    crash = run("crash")
    assert crash.returncode == -signal.SIGKILL, (
        f"crash child should die by SIGKILL, got {crash.returncode}:\n"
        f"{crash.stderr[-2000:]}"
    )
    resume = run("resume")
    assert resume.returncode == 0, resume.stderr[-2000:]
    full = run("full")
    assert full.returncode == 0, full.stderr[-2000:]

    def parse(out):
        return json.loads(
            [ln for ln in out.stdout.splitlines() if ln.startswith('{"mode"')][-1]
        )

    r, f = parse(resume), parse(full)
    verdict = {
        "resumed_stages": r["resumed"],
        "resume_skipped_completed": bool(
            r["resumed"]["features"] and r["resumed"]["scored"]
            and not r["resumed"]["labels"] and not r["resumed"]["golden"]
        ),
        "clusters": r["clusters"],
        "golden_byte_identical": r["golden_hash"] == f["golden_hash"],
        "golden_hash": r["golden_hash"],
        "customers": args.customers,
    }
    print(json.dumps(verdict))
    ok = verdict["resume_skipped_completed"] and verdict["golden_byte_identical"]
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
