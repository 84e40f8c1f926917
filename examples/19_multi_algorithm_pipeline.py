"""Multi-algorithm application workflow: ingest → communities → in-community
influence ranking → cross-community bridge detection → recommendations.

Mirrors the reference's applications tier (notebooks/applications/ — chained
algorithm workflows over one property-rich graph, like the CostMatrix and
patentsview demos): one graph, five algorithms feeding each other.

Run: python examples/19_multi_algorithm_pipeline.py
"""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pandas as pd

import cugraph_tpu as ctpu

# synthetic "interaction network": 3 planted communities + sparse bridges
rng = np.random.default_rng(7)
SIZE, COMM = 60, 3
edges = set()
for c in range(COMM):
    base = c * SIZE
    for _ in range(SIZE * 8):
        u, v = rng.integers(0, SIZE, 2)
        if u != v:
            edges.add((base + u, base + v))
for _ in range(25):  # bridges
    a, b = rng.integers(0, COMM, 2)
    if a != b:
        edges.add((a * SIZE + int(rng.integers(SIZE)),
                   b * SIZE + int(rng.integers(SIZE))))
src, dst = np.array(sorted(edges)).T
G = ctpu.Graph()  # undirected
G.from_edgelist(src, dst, None)
n = G.number_of_vertices()

# 1. community structure
parts, modularity = ctpu.louvain(G)
print(f"louvain: {parts['partition'].nunique()} communities, "
      f"modularity {modularity:.3f}")
assert modularity > 0.3

# 2. influence WITHIN each community: pagerank restricted by personalization
pr = ctpu.pagerank(G).sort_values("pagerank", ascending=False)
merged = pr.merge(parts, on="vertex")
leaders = merged.groupby("partition").head(1)
print("community leaders:\n", leaders.to_string(index=False))

# 3. bridges: edges whose endpoints differ in community, ranked by edge
#    betweenness (the classic Girvan–Newman signal)
ebc = ctpu.edge_betweenness_centrality(G)
part_of = dict(zip(parts["vertex"], parts["partition"]))
ebc["cross"] = [part_of[s] != part_of[d]
                for s, d in zip(ebc["src"], ebc["dst"])]
top_bridges = ebc.sort_values("betweenness_centrality",
                              ascending=False).head(10)
frac_cross = top_bridges["cross"].mean()
print(f"top-10 betweenness edges crossing communities: {frac_cross:.0%}")
assert frac_cross >= 0.7, "bridges must dominate top edge betweenness"

# 4. link recommendations inside each community: top jaccard non-edges
cand = ctpu.all_pairs_jaccard(G, topk=50)
edge_set = set(zip(src.tolist(), dst.tolist()))
recs = [(f, s, c) for f, s, c in zip(cand["first"], cand["second"],
                                     cand["jaccard_coeff"])
        if (f, s) not in edge_set and (s, f) not in edge_set][:5]
print("recommended new links:", [(int(a), int(b)) for a, b, _ in recs])

# 5. robustness probe: does removing the top bridge disconnect anything?
wcc_before = ctpu.weakly_connected_components(G)["labels"].nunique()
b0 = top_bridges.iloc[0]
keep = ~((src == b0["src"]) & (dst == b0["dst"])) \
    & ~((src == b0["dst"]) & (dst == b0["src"]))
G2 = ctpu.Graph()
G2.from_edgelist(src[keep], dst[keep], None)
wcc_after = ctpu.weakly_connected_components(G2)["labels"].nunique()
print(f"components before/after bridge removal: {wcc_before}/{wcc_after}")
assert wcc_after >= wcc_before
print("pipeline OK")
