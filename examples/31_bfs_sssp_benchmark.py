"""BFS / SSSP benchmark walkthrough (reference notebooks/cugraph_benchmarks/
{bfs,sssp}_benchmark.ipynb analog): RMAT synthetic graph, per-root traversal
timing, graph500-style TEPS, and the 6-rule parent-tree validation.

Run:  python examples/31_bfs_sssp_benchmark.py
"""

import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import cugraph_tpu as ct
from cugraph_tpu.testing import (teps_summary, validate_bfs_tree,
                                 validate_sssp_tree)

SCALE, EF = 12, 16
n, m = 1 << SCALE, (1 << SCALE) * EF
df = ct.generate_rmat_edgelist(scale=SCALE, num_edges=m, seed=42)
src, dst = df["src"].to_numpy(), df["dst"].to_numpy()
w = (1.0 - np.random.default_rng(11).random(m)).astype(np.float32)

G = ct.Graph(directed=False)
G.from_edgelist(src, dst, None)
print(f"RMAT-{SCALE}: {G.number_of_vertices()} vertices, "
      f"{G.number_of_edges()} edges")

rng = np.random.default_rng(7)
present = np.unique(np.concatenate([src, dst]))
keys = rng.choice(present, size=8, replace=False)

times, traversed = [], []
for root in keys:
    t0 = time.perf_counter()
    out = ct.bfs(G, int(root))
    d = out["distance"].to_numpy()
    dt = time.perf_counter() - t0
    verts = out["vertex"].to_numpy()
    reach = np.zeros(n, bool)
    reach[verts[d < 2**31 - 1]] = True
    te = int(np.count_nonzero(reach[src] & reach[dst]))
    validate_bfs_tree(src, dst, int(root), d,
                      out["predecessor"].to_numpy(), directed=False,
                      vertices=verts)
    times.append(dt)
    traversed.append(max(te, 1))
print("BFS  ", teps_summary(traversed, times))

# SSSP: min-weight-reduce parallel tuples (shortest paths only see the min)
lo, hi = np.minimum(src, dst), np.maximum(src, dst)
key = lo.astype(np.int64) * n + hi
order = np.argsort(key, kind="stable")
first = np.ones(m, bool)
first[1:] = key[order][1:] != key[order][:-1]
seg = np.cumsum(first) - 1
wmin = np.full(int(seg[-1]) + 1, np.inf, np.float32)
np.minimum.at(wmin, seg, w[order])
Gw = ct.Graph(directed=False)
Gw.from_edgelist(lo[order][first], hi[order][first], wmin)

times2 = []
for root in keys[:4]:
    t0 = time.perf_counter()
    out = ct.sssp(Gw, int(root))
    d = out["distance"].to_numpy()
    times2.append(time.perf_counter() - t0)
    validate_sssp_tree(src, dst, w, int(root), d,
                       out["predecessor"].to_numpy(), directed=False,
                       vertices=out["vertex"].to_numpy())
print("SSSP ", teps_summary(traversed[:4], times2))
print("all traversals validated (6-rule graph500 checks)")
