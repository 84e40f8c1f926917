"""Link prediction: Jaccard / Sorensen / Overlap / Cosine coefficients,
weighted variants, and all-pairs top-k.

Mirrors reference notebooks algorithms/link_prediction/{Jaccard-Similarity,
Overlap-Similarity,Sorensen_coefficient,similarity_combined}.ipynb.

Run: python examples/08_link_prediction.py
"""

import jax

jax.config.update("jax_platforms", "cpu")

import networkx as nx
import numpy as np

import cugraph_tpu as ctpu

Gnx = nx.karate_club_graph()
src = np.array([u for u, v in Gnx.edges()])
dst = np.array([v for u, v in Gnx.edges()])
G = ctpu.Graph()
G.from_edgelist(np.concatenate([src, dst]), np.concatenate([dst, src]), None)

# coefficients for explicit pairs (cuGraph-style ['first','second'] frame)
import pandas as pd

pairs = pd.DataFrame({"first": [0, 0, 5, 2], "second": [33, 1, 6, 8]})
for fn in (ctpu.jaccard, ctpu.sorensen, ctpu.overlap, ctpu.cosine):
    df = fn(G, pairs)
    col = df.columns[-1]
    print(f"{col:>22}: " + "  ".join(
        f"({u},{v})={c:.3f}" for u, v, c in
        zip(df["first"], df["second"], df[col])))

# all-pairs top-k: the strongest predicted links overall
topk = ctpu.all_pairs_jaccard(G, topk=5)
print("\ntop-5 all-pairs jaccard:")
print(topk.to_string(index=False))

# sanity vs networkx
ref = dict(((u, v), j) for u, v, j in nx.jaccard_coefficient(
    Gnx, list(zip(pairs["first"], pairs["second"]))))
got = ctpu.jaccard(G, pairs)
for u, v, c in zip(got["first"], got["second"], got.iloc[:, -1]):
    assert abs(c - ref[(u, v)]) < 1e-6
print("ok")
