"""TPU measurement: per-iteration edges/s of each semiring kernel core.

The headline bench (bench.py) records the (sum,mul) pagerank SpMV; the
traversal/components algorithms run the SAME one-hot kernel under other
semirings — (max,left) BFS parent-select, (min,add) SSSP relaxation,
(min,left) WCC label propagation (reference reduce_op library,
cpp/include/cugraph/prims/reduce_op.cuh).  This sweep times one jitted
while_loop per semiring at N and 2N iterations (t(2N)−t(N) cancels the
tunnel's per-dispatch overhead, per CLAUDE.md rules) on the SAME RMAT-20
plan bench.py caches on disk.

Run: nohup python benchmarks/bench_semirings_tpu.py > /tmp/semiring_tpu.log 2>&1 &
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SCALE = 20
EDGE_FACTOR = 16
ITERS = 50

SEMIRINGS = {
    "pagerank_sum_mul": dict(reduce="sum", combine="mul"),
    "bfs_max_left": dict(reduce="max", combine="left"),
    "sssp_min_add": dict(reduce="min", combine="add"),
    "wcc_min_left": dict(reduce="min", combine="left"),
    # what BFS/WCC actually run past 2^16 vertices (bit-exact id selection;
    # see kernels/spmv_onehot._sel split3)
    "bfs_max_left_split3": dict(reduce="max", combine="left",
                                precision="split3"),
    "wcc_min_left_split3": dict(reduce="min", combine="left",
                                precision="split3"),
}


def main():
    import bench  # reuse the edge-list + plan disk caches
    import jax
    import jax.numpy as jnp

    from cugraph_tpu.kernels.spmv_onehot import SEMIRING_BIG, spmv_onehot

    print(jax.devices(), flush=True)
    n = 1 << SCALE
    m = n * EDGE_FACTOR
    src, dst = bench._edge_cache()
    plan = bench._plan_cache(src, dst, n)
    pad_v = plan.pad_v
    x0 = jnp.asarray((np.random.default_rng(0).random(pad_v) + 0.5)
                     .astype(np.float32))
    BIG = float(SEMIRING_BIG)

    results = {}
    for name, kw in SEMIRINGS.items():
        @jax.jit
        def run(iters, plan, x0, _kw=tuple(kw.items())):
            kw2 = dict(_kw)
            prec = kw2.pop("precision", "split")

            def body(state):
                x, it = state
                y = spmv_onehot(plan, x, precision=prec, **kw2)
                # keep iterates finite and data-flow alive; cost is
                # data-independent so the transform does not matter
                x = jnp.clip(y, 1e-6, BIG) * 0.5 + x * 0.25
                return x, it + 1

            x, it = jax.lax.while_loop(lambda s: s[1] < iters, body,
                                       (x0, jnp.int32(0)))
            return x[0], it

        v, it = jax.block_until_ready(run(jnp.int32(2), plan, x0))
        print(f"# {name}: warm ok it={int(it)} v={float(v):.3e}", flush=True)

        def timed(k):
            t0 = time.perf_counter()
            jax.block_until_ready(run(jnp.int32(k), plan, x0))
            return time.perf_counter() - t0

        diffs, walls = [], []
        for _ in range(3):
            t1 = timed(ITERS)
            t2 = timed(2 * ITERS)
            diffs.append(t2 - t1)
            walls.append(t1 / ITERS)
            print(f"#   t({ITERS})={t1:.3f}s t({2*ITERS})={t2:.3f}s", flush=True)
        per_wall = min(walls)
        good = [d for d in diffs if d > 0.25 * ITERS * per_wall]
        per_iter = (min(good) / ITERS) if good else per_wall
        results[name] = per_iter
        print(json.dumps({"name": name, "per_iter_s": per_iter,
                          "edges_per_s": m / per_iter}), flush=True)

    anchor = results.get("pagerank_sum_mul")
    for name, t in results.items():
        rel = t / anchor if anchor else float("nan")
        print(f"{name}: {t*1e3:.2f} ms/iter = {m/t/1e9:.2f} G edges/s "
              f"({rel:.2f}x pagerank iter time)", flush=True)


if __name__ == "__main__":
    main()
