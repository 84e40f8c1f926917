"""Structure operations: renumbering, symmetrization, induced subgraphs,
two-hop neighbors, decompression.

Mirrors reference notebooks algorithms/structure/{Renumber,Renumber-2,
Symmetrize}.ipynb and algorithms/community/Induced-Subgraph.ipynb.

Run: python examples/10_structure_ops.py
"""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import cugraph_tpu as ctpu

# --- external ids (sparse, arbitrary — e.g. IP-address-like ints): the
# NumberMap renumbers internally and answers queries in external ids
ext_src = np.array([91203, 17, 80051, 17, 500, 91203])
ext_dst = np.array([17, 80051, 500, 500, 91203, 500])
G = ctpu.Graph(directed=True)
G.from_edgelist(ext_src, ext_dst, None)
print("vertices:", G.number_of_vertices(), "edges:", G.number_of_edges())
df = ctpu.pagerank(G)
print("pagerank keeps external ids:", sorted(df["vertex"].tolist()))

# --- symmetrize a directed edge list (reference symmetrize.ipynb)
sym_s, sym_d, sym_w = ctpu.symmetrize(
    ext_src, ext_dst, np.ones(len(ext_src), np.float32))
print("symmetrized edges:", len(sym_s))  # both directions of every pair

# --- induced subgraph on a vertex subset
sub_df, _ = ctpu.induced_subgraph(G, np.array([17, 500, 91203]))
print("induced subgraph edges:", len(sub_df))

# --- two-hop neighbor pairs
th = ctpu.two_hop_neighbors(G)
print("two-hop pairs:", len(th))

# --- decompress back to an edge list (round-trip)
el = ctpu.decompress_to_edgelist(G)
assert len(el) == G.number_of_edges()
print("ok")
