"""Betweenness centrality walkthrough: exact, sampled-k, endpoints, edges.

Mirrors reference notebook algorithms/centrality/Betweenness.ipynb — exact
vs approximate (k-sample) betweenness on karate, endpoint inclusion, edge
betweenness, and the normalization knob.  The engine batches all sources
into one [pad_v, 128] Brandes panel per sweep (algos/centrality.py).

Run: PYTHONPATH=. python examples/24_betweenness_walkthrough.py
"""

import jax

jax.config.update("jax_platforms", "cpu")

import networkx as nx
import numpy as np

import cugraph_tpu as ctpu
from cugraph_tpu.datasets import karate

G = karate.get_graph(download=True)

# exact betweenness (all sources)
bc = ctpu.betweenness_centrality(G, normalized=True)
ref = nx.betweenness_centrality(nx.karate_club_graph())
got = bc.sort_values("vertex")["betweenness_centrality"].to_numpy()
assert np.allclose(got, [ref[v] for v in sorted(ref)], atol=1e-6)
print("exact betweenness matches networkx;"
      f" top = vertex {int(bc.loc[bc.betweenness_centrality.idxmax(), 'vertex'])}")

# approximate: k random sources (the notebook's speed knob)
bk = ctpu.betweenness_centrality(G, k=8, seed=42, normalized=True)
print("k=8 sample: top-3 =",
      bk.sort_values('betweenness_centrality', ascending=False)
      ['vertex'].head(3).tolist())

# endpoints included (endpoints=True counts path endpoints)
be = ctpu.betweenness_centrality(G, normalized=True, endpoints=True)
ref_e = nx.betweenness_centrality(nx.karate_club_graph(), endpoints=True)
assert np.allclose(
    be.sort_values("vertex")["betweenness_centrality"].to_numpy(),
    [ref_e[v] for v in sorted(ref_e)], atol=1e-6)
print("endpoints=True matches networkx")

# edge betweenness
eb = ctpu.edge_betweenness_centrality(G)
top_edge = eb.sort_values("betweenness_centrality", ascending=False).iloc[0]
print(f"top edge = ({int(top_edge.src)}, {int(top_edge.dst)})")
