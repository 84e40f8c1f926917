"""MG scaling-efficiency harness: edges/s (TTEPS convention) vs device count.

The TPU analog of the reference's graph500 MG benchmark
(cpp/tests/traversal/mg_graph500_bfs_test.cu:757-764,984-987: per-run TEPS
with arithmetic + harmonic means) plus the BASELINE.md scaling target
(≥75% edges/s efficiency 1→4 hosts).

Run on the CPU simulator (harness validation; absolute numbers meaningless,
all virtual devices share host cores):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/scaling.py --cpu --devices 1,2,4,8 --scale 14

(--cpu forces the CPU backend via jax.config — the JAX_PLATFORMS env var is
not honored when a TPU PJRT plugin is installed, and touching a dead TPU
tunnel hangs the process)

On a real pod the same command measures true scaling (drop XLA_FLAGS; the
mesh spans the slice jax.devices() reports).

Prints one JSON line per (algorithm, device-count) with arithmetic/harmonic
mean edges/s over the timed reps, plus a final efficiency summary line.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import numpy as np


def _rates(fn, reps=3, warmup=1):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return np.asarray(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=14)
    ap.add_argument("--edgefactor", type=int, default=16)
    ap.add_argument("--devices", type=str, default=None,
                    help="comma list of device counts (default: 1..all)")
    ap.add_argument("--iters", type=int, default=20,
                    help="forced pagerank iterations per run")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (virtual-device simulation)")
    ap.add_argument("--out", type=str, default=None,
                    help="also write the report to this JSON file")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if jax.default_backend() == "cpu" and jax.device_count() < 8:
        raise SystemExit("set XLA_FLAGS=--xla_force_host_platform_device_count=8")

    from cugraph_tpu.generators.rmat import _rmat_host
    from cugraph_tpu.parallel import (
        build_dist_graph,
        make_mesh_2d,
        mesh_shape_for,
        mg_bfs,
        mg_pagerank,
    )

    n = 1 << args.scale
    m = n * args.edgefactor
    src, dst = _rmat_host(args.scale, m, 0.57, 0.19, 0.19, 7, False)

    counts = ([int(x) for x in args.devices.split(",")] if args.devices
              else sorted({1, 2, 4, jax.device_count()}))
    counts = [c for c in counts if c <= jax.device_count()]
    report = {"scale": args.scale, "edgefactor": args.edgefactor,
              "backend": jax.default_backend(), "rows": []}

    base_rate = {}
    for d in counts:
        pmaj, pmin = mesh_shape_for(d)
        mesh = make_mesh_2d(pmaj, pmin, jax.devices()[:d])
        g = build_dist_graph(src, dst, None, n, pmaj, pmin, store_push=True)

        def run_pr():
            p, err, it = mg_pagerank(g, mesh, tol=0.0, max_iter=args.iters)
            jax.block_until_ready(p)

        ts = _rates(run_pr, reps=args.reps)
        rates = m * args.iters / ts
        row = {"algo": "pagerank", "devices": d,
               "edges_per_s_arith": float(rates.mean()),
               "edges_per_s_harm": float(len(rates) / np.sum(1.0 / rates)),
               "wall_s_min": float(ts.min())}
        print(json.dumps(row), flush=True)
        report["rows"].append(row)
        base_rate.setdefault("pagerank", {})[d] = float(rates.max())

        rng = np.random.default_rng(0)
        sources = rng.integers(0, n, args.reps + 1)

        def run_bfs(i=[0]):
            df = mg_bfs(g, mesh, int(sources[i[0] % len(sources)]))
            jax.block_until_ready(df[0] if isinstance(df, tuple) else df)
            i[0] += 1

        ts = _rates(run_bfs, reps=args.reps)
        rates = m / ts   # TEPS: edges traversed per BFS / wall
        row = {"algo": "bfs", "devices": d,
               "edges_per_s_arith": float(rates.mean()),
               "edges_per_s_harm": float(len(rates) / np.sum(1.0 / rates)),
               "wall_s_min": float(ts.min())}
        print(json.dumps(row), flush=True)
        report["rows"].append(row)
        base_rate.setdefault("bfs", {})[d] = float(rates.max())

    summary = {"summary": True, "efficiency_vs_1dev": {}}
    for algo, per_d in base_rate.items():
        d1 = per_d.get(1)
        if d1:
            summary["efficiency_vs_1dev"][algo] = {
                str(d): (r / d) / d1 for d, r in per_d.items()}
    summary["target"] = "BASELINE.md: >=0.75 efficiency at 4 devices"
    print(json.dumps(summary), flush=True)
    report["summary"] = summary
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
