"""Degree analysis walkthrough (reference notebooks/algorithms/centrality/
Degree.ipynb analog): in/out/total degrees, degree distribution of a
power-law graph, hubs vs the long tail, and the degree-view methods of the
Graph surface.

Run:  python examples/42_degree_views.py
"""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import cugraph_tpu as ct

SCALE, EF = 13, 16
df = ct.generate_rmat_edgelist(scale=SCALE, num_edges=(1 << SCALE) * EF,
                               seed=4)
G = ct.Graph(directed=True)
G.from_edgelist(df["src"].to_numpy(), df["dst"].to_numpy(), None)
n = G.number_of_vertices()
print(f"RMAT-{SCALE}: {n} vertices, {G.number_of_edges()} edges")

deg = G.degrees()
ind = G.in_degree().set_index("vertex")["degree"]
outd = G.out_degree().set_index("vertex")["degree"]
assert (deg.set_index("vertex")["in_degree"] + 0).sum() == ind.sum()
tot = (ind + outd).sort_values(ascending=False)
print(f"max total degree {int(tot.iloc[0])}, "
      f"median {int(tot.median())} — power-law skew "
      f"{tot.iloc[0] / max(tot.median(), 1):.0f}x")

# log-binned degree histogram (the notebook's distribution plot, as text)
d = tot.to_numpy()
bins = np.unique(np.geomspace(1, d.max() + 1, 12).astype(int))
hist, _ = np.histogram(d, bins=bins)
print("\ndegree distribution (log bins):")
for lo, hi, c in zip(bins[:-1], bins[1:], hist):
    bar = "#" * max(1, int(np.log1p(c) * 4)) if c else ""
    print(f"  [{lo:6d}, {hi:6d})  {c:7d} {bar}")

# hubs carry a disproportionate share of edges
top1pct = int(np.ceil(0.01 * len(d)))
share = d[np.argsort(-d)][:top1pct].sum() / d.sum()
print(f"\ntop 1% of vertices touch {share:.0%} of edge endpoints")
assert share > 0.2
