"""Community detection: Louvain, Leiden, triangle counting, k-truss
(reference notebooks/algorithms/community/ analog).

Run:  python examples/02_community.py
"""

import jax

jax.config.update("jax_platforms", "cpu")


import cugraph_tpu as ct

G = ct.datasets.karate.get_graph()

parts, modularity = ct.louvain(G)
print(f"Louvain: {parts['partition'].nunique()} communities, "
      f"modularity={float(modularity):.3f}")

parts_l, mod_l = ct.leiden(G)
print(f"Leiden:  {parts_l['partition'].nunique()} communities, "
      f"modularity={float(mod_l):.3f}")

tc = ct.triangle_count(G)
print(f"triangles (sum of per-vertex counts / 3): {tc['counts'].sum() // 3}")

H = ct.ktruss_subgraph(G, k=4)
print(f"4-truss subgraph: {H.number_of_vertices()} vertices, "
      f"{H.number_of_edges()} edges")
