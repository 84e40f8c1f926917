"""ForceAtlas2 graph layout: exact MXU engine vs the particle-mesh
(Barnes-Hut analog) engine.

Mirrors the reference's layout surface (cugraph.force_atlas2,
cpp/src/layout/legacy/{exact_fa2.cuh,barnes_hut.cuh}).

Run: python examples/15_layout.py
"""

import jax

jax.config.update("jax_platforms", "cpu")

import time

import networkx as nx
import numpy as np

import cugraph_tpu as ctpu

Gnx = nx.connected_caveman_graph(8, 12)
src = np.array([u for u, v in Gnx.edges()])
dst = np.array([v for u, v in Gnx.edges()])
G = ctpu.Graph()
G.from_edgelist(np.concatenate([src, dst]), np.concatenate([dst, src]), None)

t0 = time.perf_counter()
exact = ctpu.force_atlas2(G, max_iter=200, random_state=3)
t_exact = time.perf_counter() - t0

t0 = time.perf_counter()
pm = ctpu.force_atlas2(G, max_iter=200, random_state=3,
                       barnes_hut_optimize=True, barnes_hut_theta=0.5)
t_pm = time.perf_counter() - t0

print(f"exact engine:         {t_exact:.2f}s")
print(f"particle-mesh engine: {t_pm:.2f}s "
      "(scales past the exact engine's [V,V] memory wall; auto-selected "
      "above 32k vertices)")


def cohesion(df):
    pos = df.sort_values("vertex")[["x", "y"]].to_numpy()
    intra = np.mean([np.linalg.norm(
        pos[c * 12:(c + 1) * 12] - pos[c * 12:(c + 1) * 12].mean(0),
        axis=1).mean() for c in range(8)])
    return intra / np.mean(np.linalg.norm(pos - pos.mean(0), axis=1))


print(f"cluster cohesion (lower=better): exact {cohesion(exact):.3f}, "
      f"pm {cohesion(pm):.3f}")
assert cohesion(pm) < 0.8
print("ok")
