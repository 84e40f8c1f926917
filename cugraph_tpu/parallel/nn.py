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


def mg_spmm_pallas_fn(mesh, pmaj: int, pmin: int, chunk: int, fwd, bwd):
    """Differentiable MG SpMM through the one-hot Pallas kernel.

    ``fwd``/``bwd`` are CONCRETE StackedSpmmPlans (parallel.kernels) — the
    custom VJP closes over them outside any trace (custom_vjp forbids traced
    closures).  Forward: all_gather minor → local Pallas SpMM → psum_scatter
    major.  Backward = the exact transpose: all_gather major → local Pallas
    SpMM on the transpose plan → psum_scatter minor.
    """
    from cugraph_tpu.kernels.spmm_onehot import spmm_onehot

    es, vs = edge_spec(), vertex_spec()
    nseg = pmaj * chunk
    B = pmin * chunk

    def k_fwd(fp, x_own):
        lp = fp.local()
        x_blk = prims.gather_minor_block(x_own)            # [B, F]
        xp = jnp.pad(x_blk, ((0, lp.pad_v - B), (0, 0)))
        part = spmm_onehot(lp, xp)[:nseg]
        return prims.scatter_reduce_major_sum(part)

    def k_bwd(bp, gy_own):
        lp = bp.local()
        gy_blk = prims.gather_major_block(gy_own)          # [nseg, F]
        gp = jnp.pad(gy_blk, ((0, lp.pad_v - nseg), (0, 0)))
        part = spmm_onehot(lp, gp)[:B]
        return prims.scatter_reduce_minor_sum(part)

    sm_f = jax.jit(jax.shard_map(k_fwd, mesh=mesh, in_specs=(es, vs),
                                 out_specs=vs, check_vma=False))
    sm_b = jax.jit(jax.shard_map(k_bwd, mesh=mesh, in_specs=(es, vs),
                                 out_specs=vs, check_vma=False))

    @jax.custom_vjp
    def f(x):
        return sm_f(fwd, x)

    def f_fwd(x):
        return sm_f(fwd, x), None

    def f_bwd(_, gy):
        return (sm_b(bwd, gy),)

    f.defvjp(f_fwd, f_bwd)
    return f


def _spmm_call(g: DistGraph, mesh, x: jax.Array) -> jax.Array:
    from cugraph_tpu.parallel.kernels import (
        get_mg_spmm_fn,
        mg_use_pallas,
    )

    if mg_use_pallas(g) and not isinstance(g.pull.src_loc, jax.core.Tracer):
        return get_mg_spmm_fn(g, mesh)(x)
    return _mg_spmm(mesh, g.pmaj, g.chunk)(
        g.pull.src_loc, g.pull.dst_loc, g.pull.weight, x)


def mg_aggregate_mean(g: DistGraph, mesh, x: jax.Array) -> jax.Array:
    """Mean of in-neighbor features, owner-sharded [pad_v, F] → [pad_v, F]."""
    agg = _spmm_call(g, mesh, x)
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
    return _spmm_call(g, mesh, x)


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
