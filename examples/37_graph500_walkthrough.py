"""Graph500 benchmark walkthrough (reference
cpp/tests/traversal/mg_graph500_{bfs,sssp}_test.cu as a runnable script):
RMAT graph, 16 search keys, BFS + SSSP traversals, the 6-rule parent-tree
validation, and TEPS means — the spec-compliant methodology behind the
recorded device-rate rows (docs/performance.md).

Run:  python examples/37_graph500_walkthrough.py
"""

import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import cugraph_tpu as ct
from cugraph_tpu.testing import (teps_summary, validate_bfs_tree,
                                 validate_sssp_tree)

SCALE, EF, KEYS = 11, 16, 16
n, m = 1 << SCALE, (1 << SCALE) * EF
df = ct.generate_rmat_edgelist(scale=SCALE, num_edges=m, seed=42)
src, dst = df["src"].to_numpy(), df["dst"].to_numpy()
G = ct.Graph(directed=False)
G.from_edgelist(src, dst, None)
print(f"RMAT-{SCALE}: {G.number_of_vertices()} vertices, {m} edge tuples")

rng = np.random.default_rng(7)
present = np.unique(np.concatenate([src, dst]))
keys = rng.choice(present, size=KEYS, replace=False)

# --- BFS: one multi-source panel computes every key's levels at once ----
t0 = time.perf_counter()
ms = ct.multi_source_bfs(G, keys.tolist()).set_index("vertex")
panel_s = time.perf_counter() - t0
times, traversed = [], []
for k in keys:
    d = ms[f"distance_{int(k)}"].to_numpy()
    p = ms[f"predecessor_{int(k)}"].to_numpy()
    verts = ms.index.to_numpy()
    reach = np.zeros(n, bool)
    reach[verts[d < 2**31 - 1]] = True
    te = int(np.count_nonzero(reach[src] & reach[dst]))
    validate_bfs_tree(src, dst, int(k), d, p, directed=False, vertices=verts)
    traversed.append(max(te, 1))
    times.append(panel_s / KEYS)
print("BFS  (one panel,", f"{panel_s*1e3:.0f} ms for {KEYS} keys):",
      teps_summary(traversed, times))

# --- SSSP: uniform (0,1] weights, min-reduced over parallel tuples ------
w = (1.0 - np.random.default_rng(11).random(m)).astype(np.float32)
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
t2, tr2 = [], []
for k in keys[:4]:
    t0 = time.perf_counter()
    out = ct.sssp(Gw, int(k))
    d = out["distance"].to_numpy()
    t2.append(time.perf_counter() - t0)
    validate_sssp_tree(src, dst, w, int(k), d,
                       out["predecessor"].to_numpy(), directed=False,
                       vertices=out["vertex"].to_numpy())
    tr2.append(traversed[0])
print("SSSP (4 keys, validated):", teps_summary(tr2, t2))
print("all parent trees pass the 6-rule Graph500 validation")
