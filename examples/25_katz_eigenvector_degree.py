"""Katz / eigenvector / degree centrality comparison on a real dataset.

Mirrors reference notebooks algorithms/centrality/{Katz,Eigenvector,Degree,
Centrality}.ipynb: run the full centrality family on polbooks, rank-correlate
the measures, and show the Katz alpha-stability rule (alpha < 1/lambda_max).

Run: PYTHONPATH=. python examples/25_katz_eigenvector_degree.py
"""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import cugraph_tpu as ctpu
from cugraph_tpu.datasets import polbooks

G = polbooks.get_graph(download=True)
n = G.number_of_vertices()
print(f"polbooks: {n} vertices, {G.number_of_edges()} edges")

scores = {}
scores["degree"] = ctpu.degree_centrality(G)
scores["katz"] = ctpu.katz_centrality(G, alpha=0.05, max_iter=1000)
scores["eigenvector"] = ctpu.eigenvector_centrality(G, max_iter=1000)
scores["betweenness"] = ctpu.betweenness_centrality(G)
scores["pagerank"] = ctpu.pagerank(G)

# rank-correlation matrix (Spearman via rank vectors) — the notebook's
# "do the measures agree?" question
ranks = {}
for name, df in scores.items():
    col = [c for c in df.columns if c != "vertex"][0]
    s = df.sort_values("vertex")[col].to_numpy()
    ranks[name] = np.argsort(np.argsort(s))

names = list(ranks)
print("\nSpearman rank correlation:")
print("            " + " ".join(f"{m[:10]:>11}" for m in names))
for a in names:
    row = []
    for b in names:
        ra, rb = ranks[a] - ranks[a].mean(), ranks[b] - ranks[b].mean()
        row.append(float((ra * rb).sum()
                         / np.sqrt((ra * ra).sum() * (rb * rb).sum())))
    print(f"{a[:10]:>11} " + " ".join(f"{v:11.3f}" for v in row))

# every pair of centralities should correlate strongly on this graph
for a in names:
    for b in names:
        ra, rb = ranks[a] - ranks[a].mean(), ranks[b] - ranks[b].mean()
        rho = float((ra * rb).sum()
                    / np.sqrt((ra * ra).sum() * (rb * rb).sum()))
        assert rho > 0.3, (a, b, rho)

# Katz stability: alpha must stay below 1/lambda_max or the series diverges
from cugraph_tpu.api.exceptions import FailedToConvergeError

try:
    ctpu.katz_centrality(G, alpha=0.9, max_iter=50)
    print("\nunexpected: alpha=0.9 converged")
except FailedToConvergeError:
    print("\nalpha=0.9 > 1/lambda_max correctly fails to converge")
