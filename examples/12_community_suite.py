"""Community detection suite: Louvain, Leiden, ECG, spectral clustering,
triangle counting, k-truss.

Mirrors reference notebooks algorithms/community/{Louvain,ECG,
Spectral-Clustering,Triangle-Counting,ktruss,Community-Clustering}.ipynb.

Run: python examples/12_community_suite.py
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
G.from_edgelist(np.concatenate([src, dst]), np.concatenate([dst, src]), None)

parts, q = ctpu.louvain(G)
print(f"louvain:  {parts['partition'].nunique()} communities, q={q:.4f}")

parts, q = ctpu.leiden(G, random_state=42)
print(f"leiden:   {parts['partition'].nunique()} communities, q={q:.4f} "
      "(randomized refinement + connectivity guarantee)")

parts, q = ctpu.ecg(G, random_state=42)
print(f"ecg:      {parts['partition'].nunique()} communities, q={q:.4f}")

sc = ctpu.spectralBalancedCutClustering(G, num_clusters=2)
print("spectral balanced-cut: 2-way split sizes",
      sc["cluster"].value_counts().tolist())

tc = ctpu.triangle_count(G)
print("triangles (total):", int(tc["counts"].sum()) // 3)

kt = ctpu.k_truss(G, k=5)
print("5-truss edges:", kt.number_of_edges())

ref_tri = sum(nx.triangles(Gnx).values()) // 3
assert int(tc["counts"].sum()) // 3 == ref_tri
assert q > 0.3
print("ok")
