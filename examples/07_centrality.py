"""Centrality family: degree, betweenness, edge betweenness, Katz,
eigenvector.

Mirrors reference notebooks algorithms/centrality/{Centrality,Betweenness,
Degree,Eigenvector,Katz}.ipynb (same karate-club walkthrough).

Run: python examples/07_centrality.py
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
G.from_edgelist(src, dst, None)

# each returns a DataFrame ['vertex', <score>]
dc = ctpu.degree_centrality(G)
bc = ctpu.betweenness_centrality(G)
ebc = ctpu.edge_betweenness_centrality(G)
kz = ctpu.katz_centrality(G)
ev = ctpu.eigenvector_centrality(G)

top = {}
for name, df in [("degree", dc), ("betweenness", bc), ("katz", kz),
                 ("eigenvector", ev)]:
    col = [c for c in df.columns if c != "vertex"][0]
    top[name] = int(df.sort_values(col, ascending=False)["vertex"].iloc[0])
    print(f"{name:>12}: top vertex = {top[name]}")

# the karate club's famous hubs are 0 and 33 — all measures agree
assert all(v in (0, 33) for v in top.values())
print("edge betweenness rows:", len(ebc))
print("ok")
