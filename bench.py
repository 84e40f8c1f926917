"""Headline benchmark: PageRank traversed-edges/s on one chip (RMAT graph).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric definition matches the reference's TTEPS convention
(cpp/tests/traversal/mg_graph500_bfs_test.cu:757-764): edges × iterations /
wall-seconds over the jitted power-iteration kernel, warm cache, forced
iteration count (tol=0) so runs are comparable.  ``vs_baseline`` is the ratio
against a 1.0 GTEPS nominal single-GPU cuGraph PageRank figure (the reference
publishes no absolute numbers — BASELINE.md — so the anchor is fixed at
1e9 edges/s to keep round-over-round values comparable).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_EDGES_PER_S = 1.0e9
SCALE = 21
EDGE_FACTOR = 16
ITERS = 30


def main():
    import jax
    import jax.numpy as jnp

    from cugraph_tpu.algos.link_analysis import _pagerank_kernel
    from cugraph_tpu.core.structure import build_structure_host
    from cugraph_tpu.generators.rmat import rmat

    n = 1 << SCALE
    m = n * EDGE_FACTOR
    df = rmat(SCALE, m, seed=7)
    src, dst = df["src"].to_numpy(), df["dst"].to_numpy()
    g = build_structure_host(src, dst, None, n)

    pad_v = g.pad_v
    reset = np.zeros(pad_v, np.float32)
    reset[:n] = 1.0 / n
    reset = jnp.asarray(reset)
    args = (g, jnp.float32(0.85), jnp.float32(0.0), reset, reset, reset, ITERS)

    # warm-up / compile
    p, err, iters = _pagerank_kernel(*args)
    p.block_until_ready()

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        p, err, iters = _pagerank_kernel(*args)
        p.block_until_ready()
        times.append(time.perf_counter() - t0)
    t = min(times)
    assert int(iters) == ITERS, f"expected {ITERS} iterations, got {int(iters)}"

    edges_per_s = m * ITERS / t
    print(json.dumps({
        "metric": f"pagerank_rmat{SCALE}_ef{EDGE_FACTOR}_edges_per_s",
        "value": edges_per_s,
        "unit": "edges/s",
        "vs_baseline": edges_per_s / BASELINE_EDGES_PER_S,
    }))


if __name__ == "__main__":
    sys.exit(main())
