"""Ablate the non-SpMV work in the pagerank iteration (TPU, RMAT-20).

bench.py records ~9.7 ms/iter for the full pagerank body but ~8.2 ms for a
bare (sum,mul) SpMV loop — ~1.5 ms/iter of elementwise+reduce overhead that
at HBM bandwidth should cost ~50 us.  This harness times the loop with the
body's side computations added back one at a time to find where the time
goes.  Timing discipline per CLAUDE.md: t(2N)-t(N) of one jitted loop with a
traced iteration count.

Run from /root/repo with the default env (axon TPU):
    python benchmarks/bench_iter_overhead_tpu.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import ITERS, SCALE, _edge_cache, _plan_cache  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from cugraph_tpu.kernels.spmv_onehot import spmv_onehot

    n = 1 << SCALE
    src, dst = _edge_cache()
    m = len(src)
    plan = _plan_cache(src, dst, n)
    pad_v = plan.pad_v

    out_w = np.bincount(src, minlength=pad_v).astype(np.float32)
    inv_out = np.divide(1.0, out_w, out=np.zeros_like(out_w),
                        where=out_w > 0).astype(np.float32)
    is_dang = (np.arange(pad_v) < n) & (out_w <= 0)
    reset = np.zeros(pad_v, np.float32)
    reset[:n] = 1.0 / n
    inv_out = jnp.asarray(inv_out)
    is_dang_f = jnp.asarray(is_dang.astype(np.float32))
    reset_d = jnp.asarray(reset)
    valid_f = jnp.asarray((np.arange(pad_v) < n).astype(np.float32))
    alpha = jnp.float32(0.85)

    def make(body):
        @jax.jit
        def run(iters, plan, inv_out, is_dang_f, reset_d):
            def cond(state):
                return state[2] < iters

            def step(state):
                p, err, it = state
                p_new, err = body(p, err, plan, inv_out, is_dang_f, reset_d)
                return p_new, err, it + 1

            return jax.lax.while_loop(
                cond, step,
                (reset_d, jnp.asarray(jnp.inf, jnp.float32),
                 jnp.asarray(0, jnp.int32)))
        return run

    def body_bare(p, err, plan, inv_out, is_dang_f, reset_d):
        return spmv_onehot(plan, p, precision="split"), err

    def body_scaled(p, err, plan, inv_out, is_dang_f, reset_d):
        return spmv_onehot(plan, p * inv_out, precision="split"), err

    def body_dang(p, err, plan, inv_out, is_dang_f, reset_d):
        ds = jnp.sum(p * is_dang_f)
        pulled = spmv_onehot(plan, p * inv_out, precision="split")
        p_new = alpha * (pulled + ds * reset_d) + (1.0 - alpha) * reset_d
        return p_new, err

    def body_mask(p, err, plan, inv_out, is_dang_f, reset_d):
        ds = jnp.sum(p * is_dang_f)
        pulled = spmv_onehot(plan, p * inv_out, precision="split")
        p_new = alpha * (pulled + ds * reset_d) + (1.0 - alpha) * reset_d
        p_new = p_new * valid_f
        return p_new, err

    def body_full(p, err, plan, inv_out, is_dang_f, reset_d):
        # the bench.py body verbatim (iota mask + L1 err)
        ds = jnp.sum(jnp.where(is_dang_f > 0, p, 0.0))
        pulled = spmv_onehot(plan, p * inv_out, precision="split")
        p_new = alpha * (pulled + ds * reset_d) + (1.0 - alpha) * reset_d
        p_new = jnp.where(jnp.arange(pad_v) < n, p_new, 0.0)
        err = jnp.sum(jnp.abs(p_new - p))
        return p_new, err

    results = {}
    for name, body in [("bare", body_bare), ("scaled", body_scaled),
                       ("dang", body_dang), ("mask", body_mask),
                       ("full", body_full)]:
        run = make(body)
        jax.block_until_ready(run(jnp.int32(2), plan, inv_out, is_dang_f,
                                  reset_d))
        diffs = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(jnp.int32(ITERS), plan, inv_out,
                                      is_dang_f, reset_d))
            t1 = time.perf_counter()
            jax.block_until_ready(run(jnp.int32(2 * ITERS), plan, inv_out,
                                      is_dang_f, reset_d))
            t2 = time.perf_counter()
            diffs.append((t2 - t1) - (t1 - t0))
        per_iter = min(diffs) / ITERS
        results[name] = per_iter
        print(f"# {name}: {per_iter*1e3:.3f} ms/iter "
              f"({m/per_iter/1e9:.3f} G edges/s)", file=sys.stderr, flush=True)
    print(json.dumps({k: v for k, v in results.items()}), flush=True)


if __name__ == "__main__":
    main()
