"""Full-graph GraphSAGE node classification (reference notebooks/gnn analog;
the BASELINE.json GNN config shape, on the karate club).

Run:  python examples/04_graphsage_training.py
"""

import jax

jax.config.update("jax_platforms", "cpu")


import jax.numpy as jnp
import numpy as np
import optax

import cugraph_tpu as ct
from cugraph_tpu.core.structure import build_structure_host
from cugraph_tpu.nn import (
    accuracy,
    graphsage_apply,
    graphsage_init,
    make_train_step,
)

import networkx as nx

Gx = nx.karate_club_graph()
src = np.array([u for u, v in Gx.edges()])
dst = np.array([v for u, v in Gx.edges()])
n = 34
g = build_structure_host(np.concatenate([src, dst]),
                         np.concatenate([dst, src]), None, n)

labels = np.zeros(g.pad_v, np.int32)
labels[:n] = [0 if Gx.nodes[i]["club"] == "Mr. Hi" else 1 for i in range(n)]
mask = np.zeros(g.pad_v, bool)
mask[:n] = True
x = np.zeros((g.pad_v, 8), np.float32)
x[:n] = np.random.default_rng(0).normal(size=(n, 8))

params = graphsage_init(jax.random.key(0), 8, 16, 2)
opt = optax.adam(1e-2)
opt_state = opt.init(params)
step = jax.jit(make_train_step(graphsage_apply, opt))

xs, lab, msk = jnp.asarray(x), jnp.asarray(labels), jnp.asarray(mask)
for epoch in range(80):
    params, opt_state, loss = step(params, opt_state, g, xs, lab, msk)
    if epoch % 20 == 0:
        acc = float(accuracy(graphsage_apply(params, g, xs), lab, msk))
        print(f"epoch {epoch:3d}  loss={float(loss):.4f}  acc={acc:.2f}")

acc = float(accuracy(graphsage_apply(params, g, xs), lab, msk))
print(f"final accuracy: {acc:.2f}")
