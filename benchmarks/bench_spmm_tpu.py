"""TPU measurement: multi-feature SpMM (GNN neighbor aggregation) throughput.

The GraphSAGE/GCN aggregation y[dst] += w·x[src] over a feature matrix
x:[V,F] runs the one-hot SpMM kernel (kernels/spmm_onehot.py) — the role of
`per_v_transform_reduce_incoming_e` with an SpMM payload in the reference
(pagerank_impl.cuh:262 and the cugraph-ops aggregators).  Times one jitted
fori_loop at N and 2N aggregation sweeps over an RMAT-18 graph at several
feature widths; reports edge-features/s (edges × F / s), the MXU-bound
metric.

Run: nohup python benchmarks/bench_spmm_tpu.py > /tmp/spmm_tpu.log 2>&1 &
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SCALE = 18
EDGE_FACTOR = 16
ITERS = 20
FEATS = (32, 128, 256)


def main():
    import jax
    import jax.numpy as jnp

    from cugraph_tpu.kernels.spmm_onehot import build_spmm_plan, spmm_onehot

    print(jax.devices(), flush=True)
    from cugraph_tpu.generators.rmat import _rmat_host

    n = 1 << SCALE
    m = n * EDGE_FACTOR
    src, dst = _rmat_host(SCALE, m, 0.57, 0.19, 0.19, 7, False)
    t0 = time.perf_counter()
    plan = build_spmm_plan(src, dst, None, n)
    print(f"# plan built in {time.perf_counter()-t0:.0f}s "
          f"tiles={plan.num_tiles}", flush=True)

    for F in FEATS:
        x0 = jnp.asarray(np.random.default_rng(0)
                         .random((plan.pad_v, F)).astype(np.float32))

        @jax.jit
        def run(iters, plan, x0):
            def body(state):
                x, it = state
                y = spmm_onehot(plan, x)
                x = jnp.clip(y, 0.0, 1e6) * 0.5 + x * 0.25
                return x, it + 1

            x, it = jax.lax.while_loop(lambda s: s[1] < iters, body,
                                       (x0, jnp.int32(0)))
            return x[0, 0], it

        jax.block_until_ready(run(jnp.int32(2), plan, x0))
        print(f"# F={F}: warm ok", flush=True)

        def timed(k):
            t0 = time.perf_counter()
            jax.block_until_ready(run(jnp.int32(k), plan, x0))
            return time.perf_counter() - t0

        diffs = []
        for _ in range(3):
            t1 = timed(ITERS)
            t2 = timed(2 * ITERS)
            diffs.append(t2 - t1)
            print(f"#   t({ITERS})={t1:.2f}s t({2*ITERS})={t2:.2f}s",
                  flush=True)
        per_iter = min(diffs) / ITERS
        print(json.dumps({
            "name": f"spmm_rmat{SCALE}_F{F}",
            "per_iter_s": per_iter,
            "edges_per_s": m / per_iter,
            "edge_feats_per_s": m * F / per_iter,
        }), flush=True)


if __name__ == "__main__":
    main()
