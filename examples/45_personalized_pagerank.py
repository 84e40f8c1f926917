"""Personalized PageRank study (the personalization half of reference
notebooks/algorithms/link_analysis/Pagerank.ipynb): global vs
topic-sensitive ranks, restart-set locality, nstart warm starts, and the
precomputed out-weight knob.

Run:  python examples/45_personalized_pagerank.py
"""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pandas as pd

import cugraph_tpu as ct

G = ct.datasets.email_Eu_core.get_graph()
n = G.number_of_vertices()
print(f"email-Eu-core: {n} vertices, {G.number_of_edges()} edges")

glob = ct.pagerank(G).set_index("vertex")["pagerank"]

# personalize on one vertex's neighborhood (topic-sensitive restart set)
seed = int(glob.idxmax())
nbrs = ct.bfs(G, seed, depth_limit=1)
near = nbrs[nbrs["distance"] <= 1]["vertex"].to_numpy()
pers = pd.DataFrame({"vertex": near,
                     "values": np.full(len(near), 1.0 / len(near))})
ppr = ct.pagerank(G, personalization=pers).set_index("vertex")["pagerank"]
print(f"personalized on {len(near)} vertices around {seed}")

# mass concentrates near the restart set
mass_near = float(ppr.loc[near].sum())
mass_near_glob = float(glob.loc[near].sum())
print(f"rank mass on the restart set: {mass_near_glob:.2%} global → "
      f"{mass_near:.2%} personalized")
assert mass_near > 2 * mass_near_glob

# warm start from the converged global vector: fewer iterations
base = ct.pagerank(G, tol=1e-10)
warm = ct.pagerank(G, tol=1e-10,
                   nstart=base.rename(columns={"pagerank": "values"}))
np.testing.assert_allclose(
    warm.set_index("vertex")["pagerank"].reindex(glob.index).to_numpy(),
    base.set_index("vertex")["pagerank"].reindex(glob.index).to_numpy(),
    atol=1e-6)
print("nstart warm start converges to the same vector")

# precomputed_vertex_out_weight: callers that already hold out-weights
ow = G.out_degree().rename(columns={"degree": "out_weight"})
pr2 = ct.pagerank(G, precomputed_vertex_out_weight=ow)
np.testing.assert_allclose(
    pr2.set_index("vertex")["pagerank"].reindex(glob.index).to_numpy(),
    glob.to_numpy(), atol=1e-6)
print("precomputed out-weights reproduce the default ranks")
