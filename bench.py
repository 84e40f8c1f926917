"""Headline benchmark: PageRank traversed-edges/s on one chip (RMAT graph).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric definition matches the reference's TTEPS convention
(cpp/tests/traversal/mg_graph500_bfs_test.cu:757-764): edges × iterations /
wall-seconds of the jitted power-iteration loop, warm cache, forced iteration
count (tol=0) so runs are comparable.  The compute path is the Pallas one-hot
MXU SpMV (cugraph_tpu/kernels/spmv_onehot.py) in split-bf16 exact-selection
mode.  ``vs_baseline`` anchors against a 1.0 GTEPS nominal single-GPU cuGraph
PageRank figure (the reference publishes no absolute numbers — BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_EDGES_PER_S = 1.0e9
SCALE = 20
EDGE_FACTOR = 16
ITERS = 100


def main():
    import jax
    import jax.numpy as jnp

    from cugraph_tpu.algos.link_analysis import _pagerank_kernel_pallas
    from cugraph_tpu.generators.rmat import _rmat_host
    from cugraph_tpu.kernels.spmv_onehot import build_spmv_plan

    n = 1 << SCALE
    m = n * EDGE_FACTOR
    src, dst = _rmat_host(SCALE, m, 0.57, 0.19, 0.19, 7, False)

    plan = build_spmv_plan(src, dst, None, n)
    pad_v = plan.pad_v
    out_w = np.bincount(src, minlength=pad_v).astype(np.float32)
    inv_out = np.divide(1.0, out_w, out=np.zeros_like(out_w),
                        where=out_w > 0).astype(np.float32)
    is_dang = (np.arange(pad_v) < n) & (out_w <= 0)
    reset = np.zeros(pad_v, np.float32)
    reset[:n] = 1.0 / n

    args = (plan, jnp.asarray(inv_out), jnp.asarray(is_dang),
            jnp.asarray(reset), jnp.asarray(reset), jnp.asarray(reset),
            jnp.float32(0.85), jnp.float32(0.0), ITERS, n)

    p, err, iters = _pagerank_kernel_pallas(*args)   # compile + warm
    np.asarray(p)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        p, err, iters = _pagerank_kernel_pallas(*args)
        np.asarray(p)  # force through the device tunnel
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
