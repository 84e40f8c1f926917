"""Community drill-down (reference notebooks/algorithms/community/
Induced-Subgraph.ipynb analog): find communities, extract the largest as
an induced subgraph, and re-analyze it in isolation — the zoom-in
workflow.

Run:  python examples/44_community_drilldown.py
"""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import cugraph_tpu as ct

G = ct.datasets.netscience.get_graph()
print(f"netscience: {G.number_of_vertices()} vertices, "
      f"{G.number_of_edges()} edges")

parts, mod = ct.louvain(G)
sizes = parts.groupby("partition").size().sort_values(ascending=False)
print(f"louvain: {len(sizes)} communities, modularity {mod:.3f}; "
      f"largest {int(sizes.iloc[0])} vertices")

big = parts[parts["partition"] == sizes.index[0]]["vertex"].to_numpy()
sub_df, _ = ct.induced_subgraph(G, big)
Gs = ct.Graph(directed=False)
Gs.from_edgelist(sub_df["src"].to_numpy(), sub_df["dst"].to_numpy(), None)
print(f"induced subgraph: {Gs.number_of_vertices()} vertices, "
      f"{Gs.number_of_edges()} edges")

# inside the community: density up, diameter-ish down
n_all, m_all = G.number_of_vertices(), G.number_of_edges()
dens_all = 2 * m_all / (n_all * (n_all - 1))
n_s, m_s = Gs.number_of_vertices(), Gs.number_of_edges()
dens_s = 2 * m_s / max(n_s * (n_s - 1), 1)
print(f"density: {dens_all:.4f} whole graph → {dens_s:.4f} community "
      f"({dens_s / dens_all:.1f}x)")
assert dens_s > dens_all

# who holds the community together: betweenness inside the subgraph
bc = ct.betweenness_centrality(Gs).nlargest(3, "betweenness_centrality")
print("community brokers:", bc["vertex"].tolist())

# its ego-net: one hop around the top broker
ego = ct.ego_graph(Gs, int(bc["vertex"].iloc[0]), radius=1)
print(f"top broker's ego net: {ego.number_of_vertices()} vertices")
