"""Dataset-driven centrality study (reference notebooks/demo/
centrality_patentsview.ipynb + algorithms/centrality/Centrality.ipynb
analog): five centralities on a real network, top-k overlap and rank
agreement between them — the "which vertices matter, and do the measures
agree?" workflow.

Run:  python examples/40_centrality_dataset_study.py
"""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import cugraph_tpu as ct

G = ct.datasets.netscience.get_graph()
n = G.number_of_vertices()
print(f"netscience: {n} vertices, {G.number_of_edges()} edges")

measures = {
    "degree": ct.degree_centrality(G).set_index("vertex")[
        "degree_centrality"],
    "pagerank": ct.pagerank(G).set_index("vertex")["pagerank"],
    "katz": ct.katz_centrality(G, alpha=0.005).set_index("vertex")[
        "katz_centrality"],
    "eigenvector": ct.eigenvector_centrality(G, max_iter=500).set_index(
        "vertex")["eigenvector_centrality"],
    "betweenness": ct.betweenness_centrality(G, k=128, seed=0).set_index(
        "vertex")["betweenness_centrality"],
}

K = 20
tops = {m: set(s.nlargest(K).index) for m, s in measures.items()}
names = list(measures)
print(f"\ntop-{K} overlap between measures:")
print(" " * 13 + "".join(f"{m[:10]:>11s}" for m in names))
for a in names:
    row = "".join(f"{len(tops[a] & tops[b]):11d}" for b in names)
    print(f"{a[:12]:13s}{row}")

# Spearman rank agreement (no scipy needed: correlate the rank vectors)
def spearman(x, y):
    rx = np.argsort(np.argsort(-x))
    ry = np.argsort(np.argsort(-y))
    rx = rx - rx.mean()
    ry = ry - ry.mean()
    return float((rx * ry).sum() / np.sqrt((rx**2).sum() * (ry**2).sum()))

idx = measures["degree"].index
print("\nSpearman vs degree:")
for m in names[1:]:
    rho = spearman(measures["degree"].to_numpy(),
                   measures[m].reindex(idx).to_numpy())
    print(f"  {m:12s} rho = {rho:+.3f}")

assert len(tops["pagerank"] & tops["degree"]) >= K // 3
print("\ncentrality measures agree on a core of hub vertices")
