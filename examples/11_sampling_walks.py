"""Sampling: random walks (uniform / biased / node2vec), neighbor sampling
(the GNN mini-batch primitive), negative sampling.

Mirrors reference notebook algorithms/sampling/RandomWalk.ipynb plus the
uniform_neighbor_sample pyx surface (the 8-variant sampling matrix lives in
cugraph_tpu.algos.sampling).

Run: python examples/11_sampling_walks.py
"""

import jax

jax.config.update("jax_platforms", "cpu")

import networkx as nx
import numpy as np

import cugraph_tpu as ctpu

Gnx = nx.karate_club_graph()
src = np.array([u for u, v in Gnx.edges()])
dst = np.array([v for u, v in Gnx.edges()])
G = ctpu.Graph()
G.from_edgelist(np.concatenate([src, dst]), np.concatenate([dst, src]),
                np.random.default_rng(0).uniform(
                    0.5, 2.0, 2 * len(src)).astype(np.float32))

starts = np.array([0, 5, 33])

# --- uniform random walks: (vertex_paths, weights, path_length)
paths, wts, plen = ctpu.random_walks(G, starts, max_depth=5)
print("uniform walk paths:\n", np.asarray(paths).reshape(len(starts), -1))

# --- biased (edge-weight proportional) and node2vec walks
bp, _, _ = ctpu.biased_random_walks(G, starts, max_depth=5, random_state=1)
n2v, _, _ = ctpu.node2vec_random_walks(G, starts, max_depth=5, p=2.0, q=0.5,
                                       random_state=1)
print("node2vec paths:\n", np.asarray(n2v).reshape(len(starts), -1))

# --- fan-out constrained neighbor sampling (GNN mini-batch building block)
res = ctpu.uniform_neighbor_sample(G, starts, fanout_vals=[3, 2],
                                   with_replacement=False, random_state=7)
print("sampled edges:", len(res["sources"]))

# --- negative sampling (non-edges for link-prediction training)
neg = ctpu.negative_sampling(G, num_samples=10, random_state=3)
es = set(zip(src.tolist(), dst.tolist())) | set(zip(dst.tolist(), src.tolist()))
bad = sum((u, v) in es for u, v in zip(neg["src"], neg["dst"]))
print(f"negative samples drawn: {len(neg)}, colliding with real edges: {bad}")

assert np.asarray(paths).size > 0 and len(res["sources"]) > 0
print("ok")
