"""Multi-chip (MG) algorithms on a device mesh: Louvain, Jaccard, BFS.

Mirrors reference notebooks demo/{mg_louvain,mg_jaccard,mg_pagerank}.ipynb
(dask-cudf multi-GPU walkthroughs) — here the mesh is jax.sharding over
TPU chips; this demo forces an 8-device CPU mesh so it runs anywhere.

Run: python examples/14_mg_algorithms.py
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from cugraph_tpu.generators.rmat import rmat
from cugraph_tpu.parallel.algos import (mg_bfs, mg_jaccard_coefficients,
                                        mg_pagerank)
from cugraph_tpu.parallel.louvain import mg_louvain
from cugraph_tpu.parallel.mesh import make_mesh_2d
from cugraph_tpu.parallel.partition import build_dist_graph

# generate an RMAT graph and distribute it over a 4x2 mesh
scale, ef = 10, 8
el = rmat(scale, (1 << scale) * ef, 0.57, 0.19, 0.19, seed=42)
src = el['src'].to_numpy(); dst = el['dst'].to_numpy()
sym_s = np.concatenate([src, dst])
sym_d = np.concatenate([dst, src])
n = 1 << scale
mesh = make_mesh_2d(4, 2)
g = build_dist_graph(sym_s, sym_d, np.ones(len(sym_s), np.float32), n, 4, 2,
                     store_push=True)
print(f"RMAT-{scale}: {n} vertices, {len(sym_s)} directed edges on a 4x2 mesh")

pr, err, iters = mg_pagerank(g, mesh, alpha=0.85, tol=1e-8)
print("mg_pagerank: converged in", int(iters), "iterations; top vertex:",
      int(np.argmax(np.asarray(pr)[:n])))

dist, _ = mg_bfs(g, mesh, source=0)
d = np.asarray(dist)[:n]
reach = d < np.iinfo(np.int32).max
print("mg_bfs: reached", int(reach.sum()), "vertices, max depth",
      int(d[reach].max()))

labels, q = mg_louvain(g, mesh)
print(f"mg_louvain: {len(np.unique(labels[:n]))} communities, q={q:.4f}")

jc = mg_jaccard_coefficients(g, mesh, src[:8], dst[:8])
print("mg_jaccard (first 8 edges):", np.round(jc, 3))
print("ok")
