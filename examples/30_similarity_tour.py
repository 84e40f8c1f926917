"""Link-prediction similarity tour: Jaccard / Sørensen / Overlap / Cosine.

Mirrors reference notebooks algorithms/link_prediction/{Jaccard-Similarity,
Sorensen_coefficient,Overlap-Similarity,similarity_combined}.ipynb — pair
queries, weighted variants, all-pairs top-k, and two-hop candidate
generation, on karate.

Run: PYTHONPATH=. python examples/30_similarity_tour.py
"""

import jax

jax.config.update("jax_platforms", "cpu")

import networkx as nx
import numpy as np

import cugraph_tpu as ctpu
from cugraph_tpu.datasets import karate

G = karate.get_graph(download=True)

# default: all two-hop pairs (the reference's candidate set)
jc = ctpu.jaccard(G)
ref = {(u, v): c for u, v, c in
       nx.jaccard_coefficient(nx.karate_club_graph(),
                              list(zip(jc["first"], jc["second"])))}
got = jc.set_index(["first", "second"])["jaccard_coeff"]
for (u, v), c in list(ref.items())[:500]:
    assert abs(got.loc[(u, v)] - c) < 1e-6
print(f"jaccard over {len(jc)} two-hop pairs matches networkx")

# the four coefficients on explicit pairs
pairs = ([0, 0, 33], [1, 2, 32])
for name, fn in [("jaccard", ctpu.jaccard),
                 ("sorensen", ctpu.sorensen),
                 ("overlap", ctpu.overlap),
                 ("cosine", ctpu.cosine)]:
    import pandas as pd

    df = fn(G, pd.DataFrame({"first": pairs[0], "second": pairs[1]}))
    col = [c for c in df.columns if c.endswith("_coeff")][0]
    print(f"{name:>9}: " + "  ".join(
        f"({u},{v})={s:.3f}" for u, v, s in
        zip(df['first'], df['second'], df[col])))

# all-pairs with top-k filtering (all_pairs_*.pyx)
top = ctpu.all_pairs_jaccard(G, topk=5)
print("top-5 all-pairs jaccard:")
for _, r in top.iterrows():
    print(f"  ({int(r['first'])},{int(r['second'])}) = {r.jaccard_coeff:.3f}")
assert len(top) == 5 and top.jaccard_coeff.is_monotonic_decreasing

# weighted jaccard (use_weight=True; Hu et al. generalization)
rngw = np.random.default_rng(1)
src, dst, _ = G.edgelist_arrays()
Gw = ctpu.Graph()
half = np.asarray(src) < np.asarray(dst)
s, d = np.asarray(src)[half], np.asarray(dst)[half]
Gw.from_edgelist(s, d, rngw.uniform(0.5, 2.0, half.sum()).astype(np.float32))
import pandas as pd

jw = ctpu.jaccard(Gw, pd.DataFrame({"first": [0], "second": [1]}),
                  use_weight=True)
print(f"weighted jaccard(0,1) = {float(jw.jaccard_coeff.iloc[0]):.3f}")
