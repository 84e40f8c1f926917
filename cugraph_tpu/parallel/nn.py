"""Distributed GNN training over the 2D-partitioned graph.

The flagship multi-chip compute path (BASELINE.json config: "edge-partitioned
PageRank + GraphSAGE on ogbn-papers100M across N≥2 hosts"): vertex features
are owner-sharded [pad_v, F] (rows over all P devices), the neighbor
aggregation is the shard_map pull-SpMM (gather along "minor" →
local segment-sum → psum_scatter along "major"), and the dense transforms are
plain jnp matmuls on the row-sharded activations with replicated weights —
GSPMD inserts the parameter-gradient psums.  One jax.grad differentiates
through the whole thing (shard_map collectives have transposes: the
all_gather transposes to exactly the psum_scatter the backward pass needs).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from cugraph_tpu.parallel import prims
from cugraph_tpu.parallel.mesh import edge_spec, vertex_spec
from cugraph_tpu.parallel.partition import DistGraph


@lru_cache(maxsize=32)
def _mg_spmm(mesh, pmaj, chunk):
    def kernel(src_loc, dst_loc, w, x_own):
        return prims.pull_spmm(src_loc[0, 0], dst_loc[0, 0], w[0, 0], x_own,
                               pmaj=pmaj, chunk=chunk)

    es, vs = edge_spec(), vertex_spec()
    return jax.jit(jax.shard_map(kernel, mesh=mesh,
                                 in_specs=(es, es, es, vs), out_specs=vs))


def mg_aggregate_mean(g: DistGraph, mesh, x: jax.Array) -> jax.Array:
    """Mean of in-neighbor features, owner-sharded [pad_v, F] → [pad_v, F]."""
    agg = _mg_spmm(mesh, g.pmaj, g.chunk)(
        g.pull.src_loc, g.pull.dst_loc, g.pull.weight, x)
    deg = jnp.maximum(g.in_degree, 1.0)
    return agg / deg[:, None]


def mg_sage_conv(params, g: DistGraph, mesh, x: jax.Array) -> jax.Array:
    h_nbr = mg_aggregate_mean(g, mesh, x)
    return (
        jnp.dot(x, params["w_self"], preferred_element_type=jnp.float32)
        + jnp.dot(h_nbr, params["w_nbr"], preferred_element_type=jnp.float32)
        + params["b"]
    )


def mg_graphsage_apply(params, g: DistGraph, mesh, x: jax.Array) -> jax.Array:
    h = x
    for i, p in enumerate(params):
        h = mg_sage_conv(p, g, mesh, h)
        if i + 1 < len(params):
            h = jax.nn.relu(h)
    return h


def mg_masked_cross_entropy(logits, labels, mask):
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    m = mask.astype(logits.dtype)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


def make_mg_train_step(g: DistGraph, mesh, optimizer: optax.GradientTransformation):
    """Jitted full training step: fwd + bwd + optimizer update, all sharded."""

    def loss_fn(params, x, labels, mask):
        logits = mg_graphsage_apply(params, g, mesh, x)
        return mg_masked_cross_entropy(logits, labels, mask)

    @jax.jit
    def train_step(params, opt_state, x, labels, mask):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, labels, mask)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def shard_vertex_data(mesh, *arrays):
    """device_put vertex-indexed arrays ([pad_v, ...]) with owner sharding."""
    sh = NamedSharding(mesh, vertex_spec())
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate(mesh, tree):
    """Replicate a parameter pytree across the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)


def mg_aggregate_sum(g: DistGraph, mesh, x: jax.Array) -> jax.Array:
    """Sum of in-neighbor features, owner-sharded [pad_v, F] → [pad_v, F]."""
    return _mg_spmm(mesh, g.pmaj, g.chunk)(
        g.pull.src_loc, g.pull.dst_loc, g.pull.weight, x)


def mg_gcn_conv(params, g: DistGraph, mesh, x: jax.Array) -> jax.Array:
    """Symmetric-normalized GCN propagation with implicit self loops
    (distributed mirror of nn.layers.gcn_conv): H' = D̂^-1/2 Â D̂^-1/2 H W."""
    deg = g.in_degree + 1.0  # +1: self loop
    inv_sqrt = jax.lax.rsqrt(deg)
    h = jnp.dot(x, params["w"], preferred_element_type=jnp.float32)
    h = h * inv_sqrt[:, None]
    agg = mg_aggregate_sum(g, mesh, h) + h  # Â = A + I
    return agg * inv_sqrt[:, None] + params["b"]


def mg_gcn_apply(params, g: DistGraph, mesh, x: jax.Array) -> jax.Array:
    h = x
    for i, p in enumerate(params):
        h = mg_gcn_conv(p, g, mesh, h)
        if i + 1 < len(params):
            h = jax.nn.relu(h)
    return h
