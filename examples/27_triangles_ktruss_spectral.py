"""Triangles, k-truss, spectral clustering, induced subgraphs.

Mirrors reference notebooks algorithms/community/{Triangle-Counting,ktruss,
Spectral-Clustering,Induced-Subgraph}.ipynb on polbooks: count triangles
(degree-oriented wedge engine), peel to the k-truss, spectrally cluster, and
extract a community's induced subgraph.

Run: PYTHONPATH=. python examples/27_triangles_ktruss_spectral.py
"""

import jax

jax.config.update("jax_platforms", "cpu")

import networkx as nx
import numpy as np

import cugraph_tpu as ctpu
from cugraph_tpu.datasets import polbooks

G = polbooks.get_graph(download=True, create_using=ctpu.Graph(directed=False))
src, dst, _ = G.edgelist_arrays()

# triangle counting — total and per-vertex
counts = ctpu.triangle_count(G)
total = int(counts["counts"].sum()) // 3
Gx = nx.Graph()
Gx.add_edges_from(zip(np.asarray(src).tolist(), np.asarray(dst).tolist()))
assert total == sum(nx.triangles(Gx).values()) // 3
print(f"triangles: {total} (matches networkx)")

# k-truss: every surviving edge supports >= k-2 triangles
for k in (4, 6, 8):
    T = ctpu.ktruss_subgraph(G, k)
    print(f"  {k}-truss: {T.number_of_vertices()} vertices, "
          f"{T.number_of_edges()} edges")

# spectral clustering (balanced cut + modularity maximization)
parts = ctpu.spectralBalancedCutClustering(G, num_clusters=4)
score = ctpu.analyzeClustering_modularity(
    G, 4, parts, "vertex", "cluster")
print(f"spectral balanced-cut (4 clusters): modularity={score:.3f}")
parts_m = ctpu.spectralModularityMaximizationClustering(G, num_clusters=4)
score_m = ctpu.analyzeClustering_modularity(
    G, 4, parts_m, "vertex", "cluster")
print(f"spectral modularity-max (4 clusters): modularity={score_m:.3f}")
assert score_m > 0.3

# induced subgraph of the largest spectral cluster
top = parts_m["cluster"].value_counts().idxmax()
members = parts_m[parts_m.cluster == top]["vertex"].to_numpy()
sub_df, _ = ctpu.induced_subgraph(G, members)
print(f"largest cluster: {len(members)} vertices -> induced subgraph "
      f"{len(sub_df)} edges")
