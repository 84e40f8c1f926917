"""Cost matrix + assignment: batched shortest-path distances between two
vertex sets, solved as a linear assignment problem.

Mirrors reference notebook applications/CostMatrix.ipynb (multi-source SSSP
to build a cost matrix, then Hungarian assignment — the reference's
"vehicle routing" workflow).

Run: python examples/13_cost_matrix.py
"""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import cugraph_tpu as ctpu

# weighted grid "road network"
rng = np.random.default_rng(1)
side = 10
ids = np.arange(side * side).reshape(side, side)
src = np.concatenate([ids[:, :-1].ravel(), ids[:-1, :].ravel()])
dst = np.concatenate([ids[:, 1:].ravel(), ids[1:, :].ravel()])
w = rng.uniform(1.0, 3.0, len(src)).astype(np.float32)
G = ctpu.Graph()
G.from_edgelist(np.concatenate([src, dst]), np.concatenate([dst, src]),
                np.concatenate([w, w]))

workers = rng.choice(side * side, 6, replace=False)
jobs = rng.choice(side * side, 6, replace=False)

# od_shortest_distances: all worker→job shortest path costs in one call
od = ctpu.od_shortest_distances(G, origins=workers, destinations=jobs)
C = od["distance"].to_numpy().reshape(len(workers), len(jobs))
print("cost matrix:\n", np.round(C, 1))

cost, assign = ctpu.dense_hungarian(C)
print("assignment:", list(enumerate(assign)))
print(f"total cost: {cost:.2f}")

# optimality sanity: total <= any single greedy row choice
greedy = sum(C[i].min() for i in range(len(workers)))
assert cost >= greedy - 1e-6
assert np.isfinite(C).all()
print("ok")
