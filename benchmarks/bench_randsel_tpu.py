"""TPU measurement: per_v_random_select 2-pass kernel at precision=highest
(6-pass matmuls) vs split3 (3 bf16 limbs, bit-exact for selections).

Run: nohup python benchmarks/bench_randsel_tpu.py > /tmp/randsel_tpu.log 2>&1 &
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SCALE = 18


def main():
    print(jax.devices(), flush=True)
    from cugraph_tpu.generators.rmat import rmat
    from cugraph_tpu.kernels.spmv_onehot import build_spmv_plan, spmv_onehot

    n = 1 << SCALE
    df = rmat(SCALE, n * 16, seed=3)
    src = df["src"].to_numpy()
    dst = df["dst"].to_numpy()
    plan = build_spmv_plan(dst, src, None, n)   # push plan (selection per src)
    key = jax.random.PRNGKey(0)
    pri = jax.random.uniform(key, plan.weight.shape, jnp.float32,
                             minval=1e-6, maxval=1.0)
    w_pri = jnp.where(jnp.isnan(plan.weight), jnp.nan, pri)
    p2 = dataclasses.replace(plan, weight=w_pri)
    zeros = jnp.zeros((p2.pad_v,), jnp.float32)

    results = {}
    for prec in ("highest", "split3"):
        @jax.jit
        def run(iters, p2, zeros, _prec=prec):
            def body(state):
                acc, it = state
                # iteration-dependent weights (numerically a no-op: +1e-30
                # underflows against ~0.5 priorities) so XLA cannot hoist
                # the loop-invariant passes out of the while_loop
                p_it = dataclasses.replace(
                    p2, weight=p2.weight + it.astype(jnp.float32) * 1e-30)
                y1 = spmv_onehot(p_it, zeros, reduce="max", combine="right",
                                 precision=_prec)
                y2 = spmv_onehot(p_it, y1, reduce="max", combine="eqsel",
                                 gather="dst", precision=_prec)
                return acc + y2[0] + y1[1], it + 1

            acc, it = jax.lax.while_loop(lambda s: s[1] < iters, body,
                                         (jnp.float32(0), jnp.int32(0)))
            return acc, it

        jax.block_until_ready(run(jnp.int32(1), p2, zeros))
        ids = np.asarray(spmv_onehot(p2, np.asarray(
            spmv_onehot(p2, zeros, reduce="max", combine="right",
                        precision=prec)), reduce="max", combine="eqsel",
            gather="dst", precision=prec))
        results.setdefault("ids", {})[prec] = ids

        def t(k):
            t0 = time.perf_counter()
            jax.block_until_ready(run(jnp.int32(k), p2, zeros))
            return time.perf_counter() - t0

        per = min((t(20) - t(10)) / 10 for _ in range(3))
        results[prec] = per
        print(f"{prec}: {per * 1e3:.2f} ms per 2-pass select", flush=True)

    a, b = results["ids"]["highest"], results["ids"]["split3"]
    print("id agreement highest vs split3:",
          float((a == b).mean()), flush=True)
    print(f"speedup: {results['highest'] / results['split3']:.2f}x")


if __name__ == "__main__":
    main()
