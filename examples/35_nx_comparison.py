"""NetworkX drop-in comparison (reference notebooks/cugraph_benchmarks/
nx_cugraph_bc_benchmarking.ipynb analog): the same analyses run through
networkx and through cugraph_tpu, numerically compared and timed — the
migration story for nx users.

Run:  python examples/35_nx_comparison.py
"""

import time

import jax

jax.config.update("jax_platforms", "cpu")

import networkx as nx
import numpy as np

import cugraph_tpu as ct

K = nx.karate_club_graph()
src = np.array([e[0] for e in K.edges()])
dst = np.array([e[1] for e in K.edges()])
G = ct.Graph(directed=False)
G.from_edgelist(src, dst, None)

# betweenness (the notebook's headline algorithm)
t0 = time.perf_counter()
bc = ct.betweenness_centrality(G).set_index("vertex")
t_ct = time.perf_counter() - t0
t0 = time.perf_counter()
nx_bc = nx.betweenness_centrality(K)
t_nx = time.perf_counter() - t0
diff = max(abs(bc.loc[v, "betweenness_centrality"] - nx_bc[v])
           for v in nx_bc)
print(f"betweenness: max |Δ| vs nx = {diff:.2e} "
      f"(ct {t_ct * 1e3:.0f} ms, nx {t_nx * 1e3:.0f} ms)")
assert diff < 1e-6

# pagerank
pr = ct.pagerank(G).set_index("vertex")
nx_pr = nx.pagerank(K, alpha=0.85, weight=None)
diff = max(abs(pr.loc[v, "pagerank"] - nx_pr[v]) for v in nx_pr)
print(f"pagerank:    max |Δ| vs nx = {diff:.2e}")
assert diff < 1e-4

# clustering-adjacent counts: triangles
tri_ct = int(ct.triangle_count(G)["counts"].sum()) // 3
tri_nx = sum(nx.triangles(K).values()) // 3
print(f"triangles:   ct {tri_ct} == nx {tri_nx}")
assert tri_ct == tri_nx

# connected components on a perturbed copy; pass the vertex set explicitly
# so isolated vertices count as singleton components like nx does
K2 = K.copy()
K2.remove_node(0)
s2 = np.array([e[0] for e in K2.edges()])
d2 = np.array([e[1] for e in K2.edges()])
G2 = ct.Graph(directed=False)
G2.from_edgelist(s2, d2, None, vertices=np.array(sorted(K2.nodes())))
cc = ct.connected_components(G2)
n_ct = cc["labels"].nunique()
n_nx = nx.number_connected_components(K2)
print(f"components:  ct {n_ct} == nx {n_nx}")
assert n_ct == n_nx
print("networkx parity checks passed")
