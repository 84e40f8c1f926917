"""End-to-end MULTI-CHIP GNN workflow: distributed graph → MG neighbor
sampling (with edge properties) → minibatch GraphSAGE training — the
"sampling→training end-to-end MG" application (the reference splits this
across cugraph + cugraph-pyg; SURVEY.md §3.5).

Run: python examples/20_mg_end_to_end_gnn.py
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

import cugraph_tpu as ctpu
from cugraph_tpu.nn import graphsage_init
from cugraph_tpu.nn.minibatch import batch_from_sampling
from cugraph_tpu.nn.models import masked_cross_entropy
from cugraph_tpu.nn.minibatch import sage_minibatch_forward
from cugraph_tpu.parallel import (build_dist_graph, make_mesh_2d,
                                  mg_uniform_neighbor_sample)

# two-community graph, label = community
rng = np.random.default_rng(3)
HALF = 50
edges = set()
for c in range(2):
    base = c * HALF
    for _ in range(450):
        u, v = rng.integers(0, HALF, 2)
        if u != v:
            edges.add((base + u, base + v))
src, dst = np.array(sorted(edges)).T
n = 2 * HALF
labels = (np.arange(n) >= HALF).astype(np.int32)
feats = rng.normal(size=(n, 8)).astype(np.float32)
feats[:, 0] += labels * 1.0

mesh = make_mesh_2d(4, 2, jax.devices()[:8])
g = build_dist_graph(np.concatenate([src, dst]), np.concatenate([dst, src]),
                     None, n, 4, 2, store_push=True)
print(f"DistGraph on {mesh.devices.size} devices: "
      f"{g.num_vertices} vertices / {g.num_edges} edges")

params = graphsage_init(jax.random.key(0), 8, 16, 2)
opt = optax.adam(1e-2)
opt_state = opt.init(params)


@jax.jit
def step(params, opt_state, batch, x, y, m):
    def loss_fn(p):
        return masked_cross_entropy(sage_minibatch_forward(p, batch, x), y, m)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state2 = opt.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state2, loss


BATCH, FANOUTS = 20, [6, 4]
pad_v_b, pad_e_b = 512, 1024
first = last = None
for epoch in range(8):
    order = np.random.default_rng(epoch).permutation(n)
    for lo in range(0, n, BATCH):
        seeds = order[lo: lo + BATCH]
        # MG sampler: every seed in ONE label so the batch shares a frontier
        df = mg_uniform_neighbor_sample(
            g, mesh, seeds, FANOUTS, with_replacement=False,
            seed=epoch * 1000 + lo, dedupe_sources=True,
            batch_id_list=np.zeros(len(seeds), np.int32),
            with_edge_properties=True)
        assert {"weight", "hop_id"} <= set(df.columns)
        packs = ctpu.sampling_results_to_batches(df)
        if 0 not in packs:
            continue
        pack = packs[0]
        vmap = list(pack["map"])
        seed_set = set(int(s) for s in seeds)
        lead = [v for v in vmap if v in seed_set]
        rest = [v for v in vmap if v not in seed_set]
        remap = {v: i for i, v in enumerate(lead + rest)}
        order_map = np.array([remap[v] for v in vmap])
        from cugraph_tpu.nn.minibatch import _remap_hop
        pack = {"map": np.array(lead + rest),
                "hops": [_remap_hop(h, order_map, len(vmap))
                         for h in pack["hops"]]}
        b = batch_from_sampling(pack, pad_vertices=pad_v_b,
                                pad_edges=pad_e_b, num_seeds=len(lead))
        gid = np.asarray(b.global_ids)
        valid = gid >= 0
        x = np.zeros((b.g.pad_v, 8), np.float32)
        x[valid] = feats[gid[valid]]
        y = np.zeros(b.g.pad_v, np.int32)
        y[valid] = labels[gid[valid]]
        m = np.asarray(b.seed_mask) & valid
        params, opt_state, loss = step(params, opt_state, b, jnp.asarray(x),
                                       jnp.asarray(y), jnp.asarray(m))
        if first is None:
            first = float(loss)
        last = float(loss)

print(f"loss {first:.3f} → {last:.3f}")
assert last < first * 0.6, "MG-sampled minibatch training must converge"
print("MG sampling → training end-to-end OK")
