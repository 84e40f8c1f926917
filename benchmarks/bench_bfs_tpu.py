"""TPU measurement: END-TO-END BFS TTEPS (Graph500 convention) on RMAT-20.

bench_semirings_tpu.py times the per-level kernel; this times the FULL
direction-optimizing BFS (`_bfs_kernel_diropt`: sparse top-down levels +
dense Pallas bottom-up sweeps, regime chosen on device) over a batch of
sources inside one jitted fori_loop, so level counts, regime switches, and
frontier bookkeeping are all included.  Throughput follows the reference's
Graph500 convention (cpp/tests/traversal/mg_graph500_bfs_test.cu:757-764):
traversed edges = out-degrees summed over reached vertices; arithmetic and
harmonic means reported over sources.  Timing is t(2K)−t(K) over the same
compiled function (traced source count) to cancel tunnel overhead.

Run: nohup python benchmarks/bench_bfs_tpu.py > /tmp/bfs_tpu.log 2>&1 &
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SCALE = 20
EDGE_FACTOR = 16
K = 8  # timed pairs run K and 2K sources


def main():
    import bench
    import jax
    import jax.numpy as jnp

    from cugraph_tpu.algos.traversal import INT32_INF, _bfs_kernel_diropt
    from cugraph_tpu.core.structure import build_structure_host

    print(jax.devices(), flush=True)
    n = 1 << SCALE
    src, dst = bench._edge_cache()
    plan = bench._plan_cache(src, dst, n)

    t0 = time.perf_counter()
    g = build_structure_host(src, dst, None, n)
    print(f"# structure built in {time.perf_counter()-t0:.0f}s", flush=True)

    # sources: high-degree vertices → giant component (graph500 picks
    # random non-isolated sources; high-degree is deterministic and
    # equivalent for throughput purposes)
    outdeg = np.bincount(src, minlength=n)
    sources = np.argsort(-outdeg)[: 2 * K].astype(np.int32)
    sources_d = jnp.asarray(sources)

    @jax.jit
    def run(k, g, plan, sources_d):
        def body(i, acc):
            dist, pred = _bfs_kernel_diropt(g, plan, sources_d[i], n, n, True)
            return acc + dist[1] + pred[1]

        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    v = jax.block_until_ready(run(jnp.int32(1), g, plan, sources_d))
    print(f"# warm ok v={int(v)}", flush=True)

    def timed(k):
        t0 = time.perf_counter()
        jax.block_until_ready(run(jnp.int32(k), g, plan, sources_d))
        return time.perf_counter() - t0

    diffs = []
    for _ in range(3):
        t1 = timed(K)
        t2 = timed(2 * K)
        diffs.append(t2 - t1)
        print(f"# t({K})={t1:.2f}s t({2*K})={t2:.2f}s", flush=True)
    per_bfs = min(d for d in diffs) / K
    print(f"# per-BFS {per_bfs*1e3:.1f} ms", flush=True)

    # traversed edges per source (host, once): sum of out-degrees over
    # vertices the BFS reached
    teps = []
    for s in sources[:K]:
        dist, _ = _bfs_kernel_diropt(g, plan, jnp.int32(int(s)), n, n, True)
        reached = np.asarray(dist)[:n] < INT32_INF
        m_trav = int(outdeg[reached].sum())
        teps.append(m_trav / per_bfs)
        print(f"# source {s}: reached {reached.sum():,} vertices, "
              f"{m_trav:,} edges", flush=True)
    teps = np.array(teps)
    print(json.dumps({
        "name": f"bfs_rmat{SCALE}_ef{EDGE_FACTOR}",
        "per_bfs_s": per_bfs,
        "teps_arith_mean": float(teps.mean()),
        "teps_harmonic_mean": float(len(teps) / (1.0 / teps).sum()),
    }), flush=True)


if __name__ == "__main__":
    main()
