"""Running graphs bigger than device memory: the host-spill execution path.

Mirrors reference notebook demo/uvm.ipynb (CUDA unified-virtual-memory
oversubscription: pagerank on a graph whose edge data exceeds GPU memory).
The TPU-native analog is explicit, not page-faulted: when the SpMV plan
exceeds the HBM budget (``CUGRAPH_TPU_SPILL_BYTES``, default half of device
memory), `kernels/spill.py` splits it into uniform chunks that stream
through the device — one compiled kernel for all chunks, host→device copies
overlapped with compute (large_buffer_manager.hpp:28 analog).

This demo forces a tiny budget so the switch is visible on a small graph;
on real hardware the same code path activates automatically at
multi-billion-edge scale.

Run: python examples/17_oversubscription_spill.py
"""

import os

# Force the Pallas path in interpret mode (CPU demo) and a ~1 MB "HBM"
# budget so even this small plan must spill.  Must be set before import.
os.environ["CUGRAPH_TPU_PALLAS_INTERPRET"] = "1"
os.environ["CUGRAPH_TPU_SPILL_BYTES"] = str(1 << 20)
os.environ["CUGRAPH_TPU_PALLAS_MIN_EDGES"] = "0"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import cugraph_tpu as ctpu
from cugraph_tpu.kernels.dispatch import plan_needs_spill, spill_budget_bytes
from cugraph_tpu.kernels.spmv_onehot import estimate_plan_bytes

rng = np.random.default_rng(0)
n, m = 20_000, 120_000
src = rng.integers(0, n, m)
dst = rng.integers(0, n, m)

G = ctpu.Graph(directed=True)
G.from_edgelist(src, dst, None, renumber=False)

est = estimate_plan_bytes(src, dst, n)
print(f"plan estimate {est/1e6:.1f} MB vs budget "
      f"{spill_budget_bytes()/1e6:.1f} MB → spill={plan_needs_spill(G)}")
assert plan_needs_spill(G)

# pagerank transparently routes through the chunked spilled plan
df_spill, _ = ctpu.pagerank(G, max_iter=30, tol=0.0,
                            fail_on_nonconvergence=False)

# same graph, resident path (huge budget) — results must agree
os.environ["CUGRAPH_TPU_SPILL_BYTES"] = str(1 << 40)
G2 = ctpu.Graph(directed=True)
G2.from_edgelist(src, dst, None, renumber=False)
assert not plan_needs_spill(G2)
df_res, _ = ctpu.pagerank(G2, max_iter=30, tol=0.0,
                          fail_on_nonconvergence=False)

a = df_spill.sort_values("vertex")["pagerank"].to_numpy()
b = df_res.sort_values("vertex")["pagerank"].to_numpy()
np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)
print(f"spilled and resident pagerank agree (max |Δ| = "
      f"{np.abs(a-b).max():.2e})")
print("ok")
