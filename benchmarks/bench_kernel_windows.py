"""Sweep (src_win, dst_win) kernel window configs on the real TPU.

Calibration harness for spmv_onehot.estimate_windows: measures the actual
per-iteration device time of the PageRank loop (tunnel-robust t(2N)-t(N)
differencing, same method as bench.py) for each candidate window pair on the
bench RMAT graph, alongside the cost model's prediction.  Run rarely (each
config is a fresh XLA compile, ~60-90 s on the tunneled chip):

    nohup python benchmarks/bench_kernel_windows.py > /tmp/winsweep.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SCALE = 20
EDGE_FACTOR = 16
ITERS = 50
CACHE_DIR = os.path.expanduser("~/.cache/cugraph_tpu/bench")

CONFIGS = [(16384, 8192), (16384, 4096), (16384, 2048), (32768, 4096),
           (8192, 4096)]


def main():
    import jax
    import jax.numpy as jnp

    from cugraph_tpu.kernels.spmv_onehot import (build_spmv_plan,
                                                 estimate_windows,
                                                 spmv_onehot)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from bench import _edge_cache

    n = 1 << SCALE
    m = n * EDGE_FACTOR
    src, dst = _edge_cache()

    t0 = time.perf_counter()
    pred = estimate_windows(src, dst, n)
    print(f"# estimate_windows -> {pred} in {time.perf_counter()-t0:.1f}s",
          flush=True)

    for sw, dw in CONFIGS:
        path = os.path.join(CACHE_DIR, f"plan{SCALE}_{sw}_{dw}.npz")
        t0 = time.perf_counter()
        if os.path.exists(path):
            z = np.load(path)
            from cugraph_tpu.kernels.spmv_onehot import SpmvPlan

            plan = SpmvPlan(
                src_rel=jnp.asarray(z["src_rel"]),
                dst_full=jnp.asarray(z["dst_full"]),
                weight=jnp.asarray(z["weight"]),
                xwin_blk=jnp.asarray(z["xwin_blk"]),
                yblk=jnp.asarray(z["yblk"]),
                num_vertices=int(z["num_vertices"]), n_rows=int(z["n_rows"]),
                yb_rows=int(z["yb_rows"]), n_yblocks=int(z["n_yblocks"]),
                num_tiles=int(z["num_tiles"]), src_win=sw, dst_win=dw)
        else:
            plan = build_spmv_plan(src, dst, None, n, src_win=sw, dst_win=dw)
            np.savez(path, src_rel=np.asarray(plan.src_rel),
                     dst_full=np.asarray(plan.dst_full),
                     weight=np.asarray(plan.weight),
                     xwin_blk=np.asarray(plan.xwin_blk),
                     yblk=np.asarray(plan.yblk),
                     num_vertices=plan.num_vertices, n_rows=plan.n_rows,
                     yb_rows=plan.yb_rows, n_yblocks=plan.n_yblocks,
                     num_tiles=plan.num_tiles)
        build_s = time.perf_counter() - t0
        pad_v = plan.pad_v

        out_w = np.bincount(src, minlength=pad_v).astype(np.float32)
        inv_out = jnp.asarray(np.divide(
            1.0, out_w, out=np.zeros_like(out_w),
            where=out_w > 0).astype(np.float32))
        reset = np.zeros(pad_v, np.float32)
        reset[:n] = 1.0 / n
        reset_d = jnp.asarray(reset)
        alpha = jnp.float32(0.85)

        @jax.jit
        def run(iters, plan, inv_out, reset_d):
            # plan rides as an ARGUMENT: closure-captured arrays get embedded
            # as HLO constants and the tunnel rejects >200 MB compile bodies
            def body(state):
                p, it = state
                pulled = spmv_onehot(plan, p * inv_out, precision="split")
                p_new = alpha * pulled + (1.0 - alpha) * reset_d
                return p_new, it + 1

            def cond(state):
                return state[1] < iters

            p, it = jax.lax.while_loop(
                cond, body, (reset_d, jnp.asarray(0, jnp.int32)))
            return it, p[0]

        t0 = time.perf_counter()
        jax.block_until_ready(run(jnp.int32(2), plan, inv_out, reset_d))
        compile_s = time.perf_counter() - t0

        def timed(k):
            t0 = time.perf_counter()
            jax.block_until_ready(run(jnp.int32(k), plan, inv_out, reset_d))
            return time.perf_counter() - t0

        diffs = []
        for _ in range(3):
            t1 = timed(ITERS)
            t2 = timed(2 * ITERS)
            diffs.append(t2 - t1)
        per_iter = min(d for d in diffs if d > 0) / ITERS
        print(json.dumps({
            "src_win": sw, "dst_win": dw, "tiles": plan.num_tiles,
            "per_iter_ms": per_iter * 1e3,
            "edges_per_s": m / per_iter,
            "build_s": round(build_s, 1), "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
