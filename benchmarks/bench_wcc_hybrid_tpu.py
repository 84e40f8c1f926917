"""WCC on TPU: split3 label propagation vs the Afforest-style mask hybrid.

The round-3 verdict flagged WCC's 15.39 ms/iter (3-limb split3 selection) vs
BFS's 13.45 (2-limb mask) and asked for one mask-style reformulation attempt
(weak #2 / next #8).  This measures both end to end at RMAT-20:

* default — `_wcc_kernel_pallas` (min,left) split3 label propagation +
  pointer jumping to fixpoint;
* hybrid  — `_wcc_hybrid`: one (max,left) split 0/1-mask sweep claims the
  hub component, host min-label pass finishes the residual edges.

Wall clocks alternate between the two paths (CLAUDE.md: never repeat
identical timed calls back-to-back through the tunnel); labels are asserted
identical.  Result goes to docs/performance.md — as a win or as a recorded
dead end.

Run: nohup python benchmarks/bench_wcc_hybrid_tpu.py > /tmp/wcc_hybrid.log &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from frontier_scale import edge_cache  # noqa: E402

SCALE = int(os.environ.get("WCC_SCALE", "20"))


def main():
    import jax.numpy as jnp

    import cugraph_tpu as ct
    from cugraph_tpu.algos.components import (_wcc_hybrid,
                                              _wcc_kernel_pallas)
    from cugraph_tpu.kernels.dispatch import get_sym_pull_plan

    n = 1 << SCALE
    src, dst = edge_cache(SCALE, 16)
    t0 = time.perf_counter()
    G = ct.Graph(directed=True)
    G.from_edgelist(src, dst, None, renumber=False, vertices=np.arange(n))
    plan = get_sym_pull_plan(G)
    print(f"# graph+plan in {time.perf_counter()-t0:.0f}s", file=sys.stderr,
          flush=True)

    # warm both (compiles)
    lab_d = np.asarray(_wcc_kernel_pallas(plan, jnp.int32(n)))[:n]
    lab_h = _wcc_hybrid(G)[:n]
    np.testing.assert_array_equal(lab_d, lab_h)
    print("# labels identical", file=sys.stderr, flush=True)

    walls = {"default": [], "hybrid": []}
    for rep in range(4):
        t0 = time.perf_counter()
        out = np.asarray(_wcc_kernel_pallas(plan, jnp.int32(n)))
        assert out[0] >= 0
        walls["default"].append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        out = _wcc_hybrid(G)
        assert out[0] >= 0
        walls["hybrid"].append(time.perf_counter() - t0)
        print(f"# rep {rep}: default {walls['default'][-1]:.3f}s "
              f"hybrid {walls['hybrid'][-1]:.3f}s", file=sys.stderr,
              flush=True)
    print(json.dumps({
        "scale": SCALE,
        "default_s": min(walls["default"]),
        "hybrid_s": min(walls["hybrid"]),
        "speedup": min(walls["default"]) / min(walls["hybrid"]),
        "labels_identical": True,
    }))


if __name__ == "__main__":
    sys.exit(main())
