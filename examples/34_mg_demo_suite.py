"""Multi-GPU demo suite on the simulated mesh (reference notebooks/demo/
{mg_pagerank,mg_louvain,mg_jaccard}.ipynb analog): the three classic MG
demos as one script over an 8-device 2D partition, each checked against
its single-graph twin.

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
          python examples/34_mg_demo_suite.py
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import cugraph_tpu as ct
from cugraph_tpu.parallel import (build_dist_graph, make_mesh_2d,
                                  mg_louvain, mg_pagerank)
from cugraph_tpu.parallel.algos import mg_jaccard_coefficients

devs = jax.devices()[:8]
mesh = make_mesh_2d(4, 2, devs)
print(f"mesh: {mesh.devices.shape} over {len(devs)} devices")

rng = np.random.default_rng(0)
n, m = 2000, 16000
src = rng.integers(0, n, m).astype(np.int64)
dst = rng.integers(0, n, m).astype(np.int64)
keep = src != dst
src, dst = src[keep], dst[keep]

# --- mg_pagerank vs SG --------------------------------------------------
# SG Graph always drops multi-edges; match it (partition.py docstring)
g = build_dist_graph(src, dst, None, n, 4, 2, drop_multi_edges=True)
p, err, iters = mg_pagerank(g, mesh, tol=1e-8, max_iter=200)
pr_mg = np.asarray(p)[:n]
G = ct.Graph(directed=True)
G.from_edgelist(src, dst, None, renumber=False, vertices=np.arange(n))
pr_sg = ct.pagerank(G, tol=1e-8, max_iter=200) \
    .sort_values("vertex")["pagerank"].to_numpy()
print(f"mg_pagerank L1 vs SG = {np.abs(pr_mg - pr_sg).sum():.2e}")
assert np.abs(pr_mg - pr_sg).sum() < 1e-3

# --- mg_louvain vs SG modularity ---------------------------------------
gs = build_dist_graph(src, dst, None, n, 4, 2, symmetrize=True,
                      drop_multi_edges=True)
labels, mod_mg = mg_louvain(gs, mesh)
Gu = ct.Graph(directed=False)
Gu.from_edgelist(src, dst, None, renumber=False, vertices=np.arange(n))
_, mod_sg = ct.louvain(Gu)
print(f"mg_louvain modularity {mod_mg:.4f} (SG {mod_sg:.4f})")
assert mod_mg > 0

# --- mg_jaccard on sampled pairs ---------------------------------------
pairs_src = src[:500]
pairs_dst = dst[:500]
import pandas as pd

jac = np.asarray(mg_jaccard_coefficients(gs, mesh, pairs_src, pairs_dst))
sg = ct.jaccard(Gu, pd.DataFrame({"first": pairs_src,
                                  "second": pairs_dst}))
gap = np.abs(jac - sg["jaccard_coeff"].to_numpy()).max()
print(f"mg_jaccard: {len(jac)} pairs, max |mg - sg| = {gap:.2e}")
assert gap < 1e-6
