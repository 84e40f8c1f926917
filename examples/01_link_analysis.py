"""PageRank / HITS / Katz walkthrough (reference notebooks/algorithms/
link_analysis/Pagerank.ipynb analog, as a runnable script).

Run:  python examples/01_link_analysis.py
"""

import jax

jax.config.update("jax_platforms", "cpu")


import cugraph_tpu as ct

G = ct.datasets.karate.get_graph()
print(f"karate: {G.number_of_vertices()} vertices, {G.number_of_edges()} edges")

pr = ct.pagerank(G)
print("\ntop-5 PageRank:")
print(pr.nlargest(5, "pagerank").to_string(index=False))

hits = ct.hits(G)
print("\ntop-5 hubs:")
print(hits.nlargest(5, "hubs")[["vertex", "hubs"]].to_string(index=False))

# karate is weighted; alpha must stay below 1/λ_max of the weighted adjacency
katz = ct.katz_centrality(G, alpha=0.005)
print("\ntop-5 Katz:")
print(katz.nlargest(5, "katz_centrality").to_string(index=False))
