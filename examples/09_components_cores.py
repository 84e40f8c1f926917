"""Connected components (weak + strong) and core decomposition.

Mirrors reference notebooks algorithms/components/ConnectedComponents.ipynb
and algorithms/cores/{core-number,kcore}.ipynb.

Run: python examples/09_components_cores.py
"""

import jax

jax.config.update("jax_platforms", "cpu")

import networkx as nx
import numpy as np

import cugraph_tpu as ctpu

# three islands of different sizes + a directed cycle for SCC
Gnx = nx.disjoint_union_all([
    nx.karate_club_graph(), nx.cycle_graph(10), nx.path_graph(5)])
src = np.array([u for u, v in Gnx.edges()])
dst = np.array([v for u, v in Gnx.edges()])
G = ctpu.Graph()
G.from_edgelist(src, dst, None)

wcc = ctpu.weakly_connected_components(G)
print("weak components:", wcc["labels"].nunique()
      if "labels" in wcc else wcc.iloc[:, -1].nunique())

# strongly connected components need direction
Gd = ctpu.Graph(directed=True)
ds, dd = np.array([0, 1, 2, 3, 3]), np.array([1, 2, 0, 4, 3])
Gd.from_edgelist(ds, dd, None)
scc = ctpu.strongly_connected_components(Gd)
print("SCC labels:", sorted(scc.iloc[:, -1].unique().tolist()))

# core numbers and the k-core subgraph on karate
G2 = ctpu.Graph()
s2 = np.array([u for u, v in nx.karate_club_graph().edges()])
d2 = np.array([v for u, v in nx.karate_club_graph().edges()])
G2.from_edgelist(s2, d2, None)
cn = ctpu.core_number(G2)
print("max core number:", int(cn["core_number"].max()))
kc = ctpu.k_core(G2, k=4)
print("4-core vertices:", kc.number_of_vertices())

ref = nx.core_number(nx.karate_club_graph())
got = dict(zip(cn["vertex"], cn["core_number"]))
assert all(got[v] == c for v, c in ref.items())
print("ok")
