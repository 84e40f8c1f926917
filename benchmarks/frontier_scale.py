"""Single-chip memory-frontier PageRank: RMAT-22/23/24 with parity check.

The reference demonstrates trillion-edge scale across 2,048 GPUs
(readme_pages/news.md:3-5) and spills oversized buffers to pinned host
memory (cpp/include/cugraph/large_buffer_manager.hpp:28-60).  This harness
drives ONE v5e chip to its memory frontier: the autotuned one-hot SpMV plan
rides device-resident while it fits HBM, and switches to the host-spill
streamed path (kernels/spill.py) past a budget.  Each recorded row carries

* edges/s from the tunnel-robust t(2N) - t(N) discipline (CLAUDE.md), and
* a PARITY check: ``--parity-iters`` power-iteration steps re-run on the
  host in float64 (bincount SpMV) and compared L1/Linf against the device
  vector pulled back once.

Usage:
    python benchmarks/frontier_scale.py --scale 22 [--iters 20] [--spill]
                                        [--prep-only] [--budget-gb 10]

--prep-only generates/caches the edge list and plan without touching the
TPU (host work can overlap another tunnel job; TPU jobs must serialize).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# one owner for the edge/plan cache format (benchcache.py); edge_cache is
# re-exported because bench_sampling_rmat20 / bench_wcc_hybrid import it here
from cugraph_tpu.utils.benchcache import edge_cache, plan_cache  # noqa: E402


def host_pagerank(src, dst, n, pad_v, iters, alpha=0.85):
    """float64 reference power iteration (bincount SpMV), same update rule
    as the device loop (algos/link_analysis.py)."""
    out_w = np.bincount(src, minlength=pad_v).astype(np.float64)
    inv_out = np.divide(1.0, out_w, out=np.zeros_like(out_w),
                        where=out_w > 0)
    is_dang = (np.arange(pad_v) < n) & (out_w <= 0)
    reset = np.zeros(pad_v, np.float64)
    reset[:n] = 1.0 / n
    p = reset.copy()
    for _ in range(iters):
        scaled = p * inv_out
        dang = p[is_dang].sum()
        pulled = np.bincount(dst, weights=scaled[src], minlength=pad_v)
        p = alpha * (pulled + dang * reset) + (1.0 - alpha) * reset
        p[n:] = 0.0
    return p


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=22)
    ap.add_argument("--edgefactor", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--parity-iters", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--budget-gb", type=float, default=10.0,
                    help="HBM budget for the device-resident plan; past it "
                         "the host-spill streamed path is used")
    ap.add_argument("--spill", action="store_true",
                    help="force the host-spill path")
    ap.add_argument("--chunk-mb", type=int, default=512)
    ap.add_argument("--tile-subs", type=int, default=None,
                    help="override the plan's subtiles-per-tile (ts=64 "
                         "halves in-kernel buffers; scale>=23 plans OOM "
                         "Mosaic scoped vmem at ts=128)")
    ap.add_argument("--prep-only", action="store_true")
    args = ap.parse_args()

    n = 1 << args.scale
    m = n * args.edgefactor
    t0 = time.perf_counter()
    src, dst = edge_cache(args.scale, args.edgefactor)
    print(f"# edges ready ({time.perf_counter()-t0:.0f}s)", file=sys.stderr,
          flush=True)

    from cugraph_tpu.kernels.spmv_onehot import estimate_plan_bytes, estimate_windows

    sw, dw = estimate_windows(src, dst, n)
    est = estimate_plan_bytes(src, dst, n, src_win=sw, dst_win=dw)
    spill = args.spill or est > args.budget_gb * (1 << 30)
    print(f"# est plan bytes = {est/2**30:.2f} GiB -> "
          f"{'SPILL' if spill else 'device-resident'}",
          file=sys.stderr, flush=True)

    if args.prep_only:
        plan_cache(src, dst, args.scale, args.edgefactor, n,
                   device_arrays=False, tile_subs=args.tile_subs)
        print(json.dumps({"prep": "ok", "scale": args.scale,
                          "est_plan_gib": est / 2**30, "spill": spill}))
        return 0

    import jax
    import jax.numpy as jnp

    from cugraph_tpu.kernels.spmv_onehot import spmv_onehot

    alpha = jnp.float32(0.85)

    if spill:
        from cugraph_tpu.kernels.spill import (build_spilled_spmv_plan,
                                               spmv_spilled)

        t0 = time.perf_counter()
        full = plan_cache(src, dst, args.scale, args.edgefactor, n,
                          device_arrays=False, tile_subs=args.tile_subs)
        splan = build_spilled_spmv_plan(
            src, dst, None, n, max_chunk_bytes=args.chunk_mb << 20,
            tile_subs=args.tile_subs, full_plan=full)
        print(f"# spilled plan: {splan.num_chunks} chunks x "
              f"{splan.chunk_bytes()/2**20:.0f} MiB "
              f"({time.perf_counter()-t0:.0f}s)", file=sys.stderr, flush=True)
        pad_v = splan.pad_v
    else:
        plan = plan_cache(src, dst, args.scale, args.edgefactor, n,
                          device_arrays=True, tile_subs=args.tile_subs)
        pad_v = plan.pad_v

    out_w = np.bincount(src, minlength=pad_v).astype(np.float32)
    inv_out_h = np.divide(1.0, out_w, out=np.zeros_like(out_w),
                          where=out_w > 0).astype(np.float32)
    is_dang_h = (np.arange(pad_v) < n) & (out_w <= 0)
    reset_h = np.zeros(pad_v, np.float32)
    reset_h[:n] = 1.0 / n
    inv_out = jnp.asarray(inv_out_h)
    is_dang = jnp.asarray(is_dang_h)
    reset_d = jnp.asarray(reset_h)
    live = jnp.asarray(np.arange(pad_v) < n)

    if spill:
        # python-loop iteration: tile arrays stream host->device per step;
        # timing is per-iteration wall clock (H2D is the cost being measured)
        @jax.jit
        def update(p, pulled):
            dang = jnp.sum(jnp.where(is_dang, p, 0.0))
            p_new = alpha * (pulled + dang * reset_d) + (1 - alpha) * reset_d
            return jnp.where(live, p_new, 0.0)

        def run_iters(k, p0):
            p = p0
            for _ in range(k):
                pulled = spmv_spilled(splan, p * inv_out, precision="split")
                p = update(p, pulled)
            return p

        p = run_iters(1, reset_d)  # warm/compile
        jax.block_until_ready(p)
        print("# warm ok (spill)", file=sys.stderr, flush=True)
        iters = args.iters
        times = []
        for r in range(args.reps):
            # alternate payloads (CLAUDE.md: never repeat identical timed
            # calls back-to-back through the tunnel)
            p0 = reset_d if r % 2 == 0 else p
            t0 = time.perf_counter()
            out = run_iters(iters, p0)
            _ = float(out[0])  # materialize to host inside timed region
            times.append((time.perf_counter() - t0) / iters)
            print(f"# rep {r}: {times[-1]*1e3:.0f} ms/iter",
                  file=sys.stderr, flush=True)
        per_iter = min(times)
        mode = f"spill[{splan.num_chunks}x{splan.chunk_bytes()>>20}MiB]"
        # parity vector
        pv = run_iters(args.parity_iters, reset_d)
        pv = np.asarray(pv, np.float64)
    else:
        @jax.jit
        def run(iters, plan, p0):
            def body(state):
                p, it = state
                scaled = p * inv_out
                dang = jnp.sum(jnp.where(is_dang, p, 0.0))
                pulled = spmv_onehot(plan, scaled, precision="split")
                p_new = (alpha * (pulled + dang * reset_d)
                         + (1 - alpha) * reset_d)
                return jnp.where(live, p_new, 0.0), it + 1

            p, _ = jax.lax.while_loop(
                lambda s: s[1] < iters, body,
                (p0, jnp.asarray(0, jnp.int32)))
            return p

        t0 = time.perf_counter()
        p = run(jnp.int32(1), plan, reset_d)
        _ = float(p[0])
        print(f"# warm ok ({time.perf_counter()-t0:.0f}s incl compile + "
              "plan H2D)", file=sys.stderr, flush=True)

        N = args.iters

        def timed(k, p0):
            t0 = time.perf_counter()
            out = run(jnp.int32(k), plan, p0)
            _ = float(out[0])
            return time.perf_counter() - t0

        diffs, walls = [], []
        for r in range(args.reps):
            t1 = timed(N, reset_d)
            t2 = timed(2 * N, p)
            diffs.append(t2 - t1)
            walls.extend([t1 / N, t2 / (2 * N)])
            print(f"# t({N})={t1:.2f}s t({2*N})={t2:.2f}s",
                  file=sys.stderr, flush=True)
        per_iter_wall = min(walls)
        good = [d for d in diffs if d > 0.25 * N * per_iter_wall]
        per_iter = (min(good) / N) if good else per_iter_wall
        mode = "device"
        pv = np.asarray(run(jnp.int32(args.parity_iters), plan, reset_d),
                        np.float64)

    # device memory stats if the plugin exposes them
    mem = None
    try:
        ms = jax.devices()[0].memory_stats()
        mem = {k: int(v) for k, v in ms.items()
               if "bytes" in k and isinstance(v, (int, np.integer))}
    except Exception:
        pass

    # parity: float64 host power iteration, same update rule
    print("# host parity run...", file=sys.stderr, flush=True)
    ph = host_pagerank(src, dst, n, pad_v, args.parity_iters)
    l1 = float(np.abs(pv - ph).sum())
    linf = float(np.abs(pv - ph).max())
    edges_per_s = m / per_iter
    print(json.dumps({
        "metric": f"pagerank_rmat{args.scale}_ef{args.edgefactor}_edges_per_s",
        "value": edges_per_s, "unit": "edges/s", "mode": mode,
        "ms_per_iter": per_iter * 1e3,
        "est_plan_gib": est / 2**30,
        "parity_iters": args.parity_iters,
        "parity_l1": l1, "parity_linf": linf,
        "parity_ok": bool(l1 < 1e-3),
        "memory_stats": mem,
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
