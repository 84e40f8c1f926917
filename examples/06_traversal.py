"""Traversal: BFS, SSSP, path extraction, k-hop neighborhoods.

Mirrors reference notebooks algorithms/traversal/{BFS,SSSP}.ipynb.

Run: python examples/06_traversal.py   (CPU-safe; on TPU large graphs route
through the Pallas semiring kernels automatically.)
"""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import cugraph_tpu as ctpu

# a small weighted road-like grid graph
rng = np.random.default_rng(0)
side = 12
ids = np.arange(side * side).reshape(side, side)
src = np.concatenate([ids[:, :-1].ravel(), ids[:-1, :].ravel()])
dst = np.concatenate([ids[:, 1:].ravel(), ids[1:, :].ravel()])
w = rng.uniform(1.0, 5.0, len(src)).astype(np.float32)

G = ctpu.Graph()
G.from_edgelist(np.concatenate([src, dst]), np.concatenate([dst, src]),
                np.concatenate([w, w]))

# --- BFS (hop distances + predecessors)
bfs = ctpu.bfs(G, start=0)
print("BFS: max hop distance", int(bfs["distance"].max()))

# --- SSSP (near/far delta-stepping under the hood)
sssp = ctpu.sssp(G, source=0)
far = sssp.loc[sssp["vertex"] == side * side - 1, "distance"].item()
print(f"SSSP: weighted distance to far corner = {far:.2f}")

# --- extract the actual shortest path to the far corner
pf, vertex_paths, _ = ctpu.extract_bfs_paths(G, sssp, np.array([side * side - 1]))
print("path length (vertices):", int((vertex_paths >= 0).sum()))

# --- k-hop neighborhood sizes
for k in (1, 2, 3):
    nbrs = ctpu.k_hop_neighbors(G, start=0, k=k)
    print(f"{k}-hop neighborhood size: {len(nbrs)}")

assert far > 0 and int(bfs["distance"].max()) == 2 * (side - 1)
print("ok")
