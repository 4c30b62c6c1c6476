#!/usr/bin/env python
"""Two-cluster-size scaling evidence (north rule: ≥0.8 throughput scaling
efficiency from N to 4N executors).

This sandbox has no real cluster, so the same jobs run at two parallelism
levels — local[8] (N) and local[32] (4N) — over the SAME input, each in a
fresh subprocess (its own JVM), and efficiency is

    eff = (throughput_4N / throughput_N) / 4.

Results are printed as JSON and appended to BENCH/BASELINE.md by
tools/write_baseline.py.

Usage: python tools/scaling_bench.py [--docs 20000] [--low 8] [--high 32]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def run_level(cpus: int, pages: str, docs: int, wh_root: str) -> dict:
    """Build + query-bench at one parallelism level in a fresh process."""
    env = {**os.environ, "SPARK_GRAFT_CPUS": str(cpus)}
    wh = f"{wh_root}/wh_c{cpus}"
    out = {}
    r = subprocess.run(
        [sys.executable, str(REPO / "jobs/build_index.py"),
         "--pages", pages, "--warehouse", wh, "--force",
         # enough doc buckets that the pack groups AND the query kernel
         # fan out past 4N cores
         "--salt-buckets", "128", "--merge-factor", "4"],
        env=env, capture_output=True, text=True, cwd=REPO, check=True,
    )
    out["build"] = json.loads(r.stdout.strip().splitlines()[-1])
    r = subprocess.run(
        [sys.executable, str(REPO / "jobs/query_bench.py"),
         "--warehouse", wh, "--engine", "packed",
         # big enough that the kernel CPU dominates the fixed per-job
         # costs (session + 3 shuffle barriers) at BOTH levels — the
         # scaling property being measured is sustained batch throughput
         "--batch", "--repeat", "400"],
        env=env, capture_output=True, text=True, cwd=REPO, check=True,
    )
    out["query"] = json.loads(r.stdout.strip().splitlines()[-1])
    r = subprocess.run(
        [sys.executable, str(REPO / "jobs/query_bench.py"),
         "--warehouse", wh, "--engine", "packed"],
        env=env, capture_output=True, text=True, cwd=REPO, check=True,
    )
    out["latency"] = json.loads(r.stdout.strip().splitlines()[-1])
    return out


def _cpu_burn(n):
    s = 0
    for i in range(n):
        s += i * i
    return s


def _mem_burn(seed):
    import numpy as np

    rng = np.random.default_rng(seed)
    a = rng.integers(0, 1000, 3_000_000)
    for _ in range(10):
        a = a + (np.cumsum(np.sort(a)) % 255)[: len(a)]
    return int(a[0])


def hardware_ceiling(low: int, high: int) -> dict:
    """This box's own scaling ceiling for the two workload classes that
    bound a Spark build: interpreter/compute-bound and memory-bandwidth-
    bound.  A single-host 'cluster' shares one memory bus — real cluster
    nodes do not — so engine efficiency must be read against this."""
    import multiprocessing as mp
    import time

    cpu_burn, mem_burn = _cpu_burn, _mem_burn

    out = {}
    for name, fn, arg, work in (
        ("cpu_bound", cpu_burn, 2_000_000, 96),
        ("membw_bound", mem_burn, None, 64),
    ):
        ts = {}
        for procs in (low, high):
            with mp.Pool(procs) as p:
                t0 = time.perf_counter()
                p.map(fn, [arg] * work if arg else range(work))
                ts[procs] = time.perf_counter() - t0
        out[name] = round((ts[low] / ts[high]) / (high / low), 3)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100000)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--skip-calibration", action="store_true")
    args = ap.parse_args()

    sys.path.insert(0, str(REPO))
    from search_engine_spark.sources.pages import cached_pages

    pages = str(cached_pages(args.docs))
    with tempfile.TemporaryDirectory(prefix="se_scale_") as wh_root:
        low = run_level(args.low, pages, args.docs, wh_root)
        high = run_level(args.high, pages, args.docs, wh_root)

    tp_low = low["build"]["docs_per_sec"]
    tp_high = high["build"]["docs_per_sec"]
    ratio = args.high / args.low
    eff_build = (tp_high / tp_low) / ratio
    qtp_low = low["query"]["qps"]
    qtp_high = high["query"]["qps"]
    eff_query = (qtp_high / qtp_low) / ratio

    print(json.dumps({
        "docs": args.docs,
        "levels": {"N": args.low, "4N": args.high},
        "build_docs_per_sec": {f"local[{args.low}]": tp_low,
                               f"local[{args.high}]": tp_high},
        "build_scaling_efficiency": round(eff_build, 3),
        "query_qps": {f"local[{args.low}]": round(qtp_low, 3),
                      f"local[{args.high}]": round(qtp_high, 3)},
        "query_scaling_efficiency": round(eff_query, 3),
        "query_p50_sec": {f"local[{args.low}]": low["latency"]["p50_sec"],
                          f"local[{args.high}]": high["latency"]["p50_sec"]},
        "phase_seconds": {
            f"local[{args.low}]": low["build"].get("phase_seconds"),
            f"local[{args.high}]": high["build"].get("phase_seconds"),
        },
        "hardware_ceiling_efficiency": (
            None if args.skip_calibration
            else hardware_ceiling(args.low, args.high)
        ),
    }, indent=2))


if __name__ == "__main__":
    main()
