"""Louvain / Leiden / ECG community walkthrough on netscience.

Mirrors reference notebooks algorithms/community/{Louvain,ECG}.ipynb: run the
three modularity-family detectors on a real bundled dataset, compare
modularity scores and partition agreement, and show resolution sweeps.

Run: PYTHONPATH=. python examples/26_louvain_ecg_walkthrough.py
"""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import cugraph_tpu as ctpu
from cugraph_tpu.datasets import netscience

G = netscience.get_graph(download=True)
print(f"netscience: {G.number_of_vertices()} vertices, "
      f"{G.number_of_edges()} edges")

parts_l, mod_l = ctpu.louvain(G)
parts_e, mod_e = ctpu.leiden(G, random_state=7)
parts_c, mod_c = ctpu.ecg(G, ensemble_size=8, random_state=7)

for name, parts, mod in (("louvain", parts_l, mod_l),
                         ("leiden", parts_e, mod_e),
                         ("ecg", parts_c, mod_c)):
    k = parts["partition"].nunique()
    print(f"{name:>8}: modularity={mod:.4f}  communities={k}")
    assert mod > 0.8, (name, mod)  # netscience is strongly modular

# partition agreement (adjusted-Rand-free proxy: pairwise co-membership on a
# vertex sample)
rng = np.random.default_rng(0)
sample = rng.choice(G.number_of_vertices(), 400)
la = parts_l.sort_values("vertex")["partition"].to_numpy()
le = parts_e.sort_values("vertex")["partition"].to_numpy()
a = la[sample[:200]] == la[sample[200:]]
b = le[sample[:200]] == le[sample[200:]]
agree = float((a == b).mean())
print(f"louvain vs leiden co-membership agreement: {agree:.2%}")
assert agree > 0.9

# resolution sweep: higher resolution → more, smaller communities
ks = []
for res in (0.5, 1.0, 2.0):
    p, _ = ctpu.louvain(G, resolution=res)
    ks.append(p["partition"].nunique())
    print(f"resolution={res}: {ks[-1]} communities")
assert ks == sorted(ks)
