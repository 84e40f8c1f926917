"""TPU measurement: batched multi-source Brandes betweenness throughput.

Times the PUBLIC path `betweenness_centrality(G, k=128)` on an RMAT-18
graph: one warm-up call (SpMM plan build + kernel compiles), then repeated
warm calls with fresh seeds (jit-cached; only the [pad_v,128] panel sweeps
run).  Reports wall per call, per-source cost, and amortized source-edge
traversals/s — the metric that compares against the per-source loop this
replaced (2 scalarized element-gather passes per level per source at
~0.12 G elem/s, i.e. ~70 ms per level per source at this scale).

Run: nohup python benchmarks/bench_betweenness_tpu.py > /tmp/bc_tpu.log 2>&1 &
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SCALE = 18
EDGE_FACTOR = 16
K = 128


def main():
    import jax

    import cugraph_tpu as ct
    from cugraph_tpu.generators.rmat import _rmat_host

    print(jax.devices(), flush=True)
    n = 1 << SCALE
    m = n * EDGE_FACTOR
    src, dst = _rmat_host(SCALE, m, 0.57, 0.19, 0.19, 7, False)

    G = ct.Graph(directed=True)
    G.from_edgelist(src, dst, None)

    t0 = time.perf_counter()
    ct.betweenness_centrality(G, k=K, seed=0)
    t_cold = time.perf_counter() - t0
    print(f"# cold (plans + compile + run): {t_cold:.0f}s", flush=True)

    walls = []
    for rep in range(1, 4):
        t0 = time.perf_counter()
        ct.betweenness_centrality(G, k=K, seed=rep)
        walls.append(time.perf_counter() - t0)
        print(f"# warm call {rep}: {walls[-1]:.2f}s", flush=True)

    wall = min(walls)
    print(json.dumps({
        "metric": "betweenness_rmat18_k128_wall_s",
        "value": wall,
        "unit": "s",
        "per_source_ms": wall / K * 1e3,
        "source_edge_traversals_per_s": K * m / wall,
        "edges": m,
    }), flush=True)


if __name__ == "__main__":
    main()
