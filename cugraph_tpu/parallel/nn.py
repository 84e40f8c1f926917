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

    ``fwd``/``bwd`` are CONCRETE StackedSpmmPlans (parallel.kernels) bound
    outside any trace (custom_vjp forbids traced closures).  A thin binding
    over ``mg_spmm_pallas_arg_fn`` — one owner for the shard_map bodies
    (they were duplicated verbatim before; round-5 review finding).
    """
    arg_f = mg_spmm_pallas_arg_fn(mesh, pmaj, pmin, chunk)

    def f(x):
        return arg_f(fwd, bwd, x)

    return f


def mg_spmm_pallas_arg_fn(mesh, pmaj: int, pmin: int, chunk: int):
    """Like mg_spmm_pallas_fn, but the StackedSpmmPlans flow as ARGUMENTS
    of the returned f(fwd, bwd, x) — required when f is called inside an
    outer jit (a closure would embed the plan arrays as HLO constants,
    which the tunnel's ~200 MB compile-body limit rejects).  Plans get
    zero/float0 cotangents."""
    from cugraph_tpu.kernels.spmm_onehot import spmm_onehot

    es, vs = edge_spec(), vertex_spec()
    nseg = pmaj * chunk
    B = pmin * chunk

    def k_fwd(fp, x_own):
        lp = fp.local()
        x_blk = prims.gather_minor_block(x_own)
        xp = jnp.pad(x_blk, ((0, lp.pad_v - B), (0, 0)))
        part = spmm_onehot(lp, xp)[:nseg]
        return prims.scatter_reduce_major_sum(part)

    def k_bwd(bp, gy_own):
        lp = bp.local()
        gy_blk = prims.gather_major_block(gy_own)
        gp = jnp.pad(gy_blk, ((0, lp.pad_v - nseg), (0, 0)))
        part = spmm_onehot(lp, gp)[:B]
        return prims.scatter_reduce_minor_sum(part)

    sm_f = jax.jit(jax.shard_map(k_fwd, mesh=mesh, in_specs=(es, vs),
                                 out_specs=vs, check_vma=False))
    sm_b = jax.jit(jax.shard_map(k_bwd, mesh=mesh, in_specs=(es, vs),
                                 out_specs=vs, check_vma=False))

    def _zero_cot(tree):
        import numpy as _np

        return jax.tree.map(
            lambda a: (jnp.zeros_like(a)
                       if jnp.issubdtype(a.dtype, jnp.floating)
                       else _np.zeros(a.shape, jax.dtypes.float0)), tree)

    @jax.custom_vjp
    def f(fwd, bwd, x):
        return sm_f(fwd, x)

    def f_fwd(fwd, bwd, x):
        return sm_f(fwd, x), (fwd, bwd)

    def f_bwd(res, gy):
        fwd, bwd = res
        return _zero_cot(fwd), _zero_cot(bwd), sm_b(bwd, gy)

    f.defvjp(f_fwd, f_bwd)
    return f


def _spmm_call(g: DistGraph, mesh, x: jax.Array, plans=None) -> jax.Array:
    from cugraph_tpu.parallel.kernels import (
        get_mg_spmm_fn,
        mg_use_pallas,
    )

    if plans is not None:
        # plan-argument path (train steps: plans are jit arguments)
        f = _get_arg_fn(mesh, g.pmaj, g.pmin, g.chunk)
        return f(plans[0], plans[1], x)
    if mg_use_pallas(g) and not isinstance(g.pull.src_loc, jax.core.Tracer):
        return get_mg_spmm_fn(g, mesh)(x)
    return _mg_spmm(mesh, g.pmaj, g.chunk)(
        g.pull.src_loc, g.pull.dst_loc, g.pull.weight, x)


@lru_cache(maxsize=32)
def _get_arg_fn(mesh, pmaj, pmin, chunk):
    # keyed on the (hashable) mesh like every other kernel cache in this
    # file — the previous id(mesh) dict never evicted and pinned meshes +
    # compiled shard_maps for the process lifetime
    return mg_spmm_pallas_arg_fn(mesh, pmaj, pmin, chunk)


def mg_aggregate_mean(g: DistGraph, mesh, x: jax.Array,
                      plans=None) -> jax.Array:
    """Mean of in-neighbor features, owner-sharded [pad_v, F] → [pad_v, F].

    Clamp matches the SG layer's 1e-12 (nn/layers.py aggregate): the
    in-degree is the WEIGHTED sum, and a 1.0 clamp silently halved the
    aggregate wherever per-vertex in-weights summed below 1 — an MG↔SG
    divergence on weighted graphs (round-5 review finding)."""
    agg = _spmm_call(g, mesh, x, plans=plans)
    deg = jnp.maximum(g.in_degree, 1e-12)
    return agg / deg[:, None]


def mg_sage_conv(params, g: DistGraph, mesh, x: jax.Array,
                 plans=None) -> jax.Array:
    h_nbr = mg_aggregate_mean(g, mesh, x, plans=plans)
    return (
        jnp.dot(x, params["w_self"], preferred_element_type=jnp.float32)
        + jnp.dot(h_nbr, params["w_nbr"], preferred_element_type=jnp.float32)
        + params["b"]
    )


def mg_graphsage_apply(params, g: DistGraph, mesh, x: jax.Array,
                       plans=None) -> jax.Array:
    h = x
    for i, p in enumerate(params):
        h = mg_sage_conv(p, g, mesh, h, plans=plans)
        if i + 1 < len(params):
            h = jax.nn.relu(h)
    return h


def mg_masked_cross_entropy(logits, labels, mask):
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    m = mask.astype(logits.dtype)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


def make_mg_train_step(g: DistGraph, mesh, optimizer: optax.GradientTransformation):
    """Jitted full training step: fwd + bwd + optimizer update, all sharded.

    The DistGraph and (on the Pallas path) the stacked SpMM plans flow as
    JIT ARGUMENTS — closing over them would embed the edge partition as HLO
    constants and blow the tunnel's ~200 MB compile-body limit."""
    from cugraph_tpu.parallel.kernels import (get_stacked_spmm_plans,
                                              mg_use_pallas)

    plans = (get_stacked_spmm_plans(g, mesh, "pull")
             if mg_use_pallas(g) else None)

    def loss_fn(params, g_, plans_, x, labels, mask):
        logits = mg_graphsage_apply(params, g_, mesh, x, plans=plans_)
        return mg_masked_cross_entropy(logits, labels, mask)

    @jax.jit
    def _step(g_, plans_, params, opt_state, x, labels, mask):
        loss, grads = jax.value_and_grad(loss_fn)(params, g_, plans_, x,
                                                  labels, mask)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def train_step(params, opt_state, x, labels, mask):
        return _step(g, plans, params, opt_state, x, labels, mask)

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


# ---------------------------------------------------------------------------
# attention layers (GAT / GATv2) — distributed segment softmax
# ---------------------------------------------------------------------------
#
# The softmax denominator per dst is a cross-device reduce: every device in a
# mesh COLUMN holds a disjoint slice of dst's in-edges, and dst segments live
# in the major-gathered [nseg, ...] space — so the global per-dst max/sum is
# just pmax/psum along "major" of the local segment reduces, with NO owner
# round-trip.  (Reference analog: per-edge e_op + dst-keyed reduce of
# transform_reduce_e_by_dst_key, transform_reduce_e.cuh.)

@lru_cache(maxsize=32)
def _mg_gat_kernel(mesh, pmaj, chunk, negative_slope):
    def kernel(src_loc, dst_loc, valid, h_own, as_own, ad_own):
        sl, dl = src_loc[0, 0], dst_loc[0, 0]
        vv = valid[0, 0][:, None]
        nseg = pmaj * chunk
        h_blk = prims.gather_minor_block(h_own)        # [B, H, D]
        as_blk = prims.gather_minor_block(as_own)      # [B, H]
        ad_blk = prims.gather_major_block(ad_own)      # [nseg, H]
        logit = jax.nn.leaky_relu(
            jnp.take(as_blk, sl, axis=0) + jnp.take(ad_blk, dl, axis=0),
            negative_slope)
        neg = jnp.asarray(-1e30, logit.dtype)
        logit = jnp.where(vv, logit, neg)
        # global per-dst max via all_gather+max (pmax lacks a diff rule);
        # the softmax max-shift is a constant offset, so stop_gradient
        mx = jax.lax.stop_gradient(jnp.max(jax.lax.all_gather(
            prims.block_segment_reduce(logit, dl, nseg, "max"),
            prims.MAJOR, axis=0), axis=0))
        delta = jnp.where(vv, logit - jnp.take(mx, dl, axis=0), neg)
        ex = jnp.exp(delta)                            # 0 on invalid lanes
        denom = jax.lax.psum(
            prims.block_segment_reduce(ex, dl, nseg, "sum"), prims.MAJOR)
        coef = ex / jnp.maximum(jnp.take(denom, dl, axis=0), 1e-16)
        msgs = jnp.take(h_blk, sl, axis=0) * coef[:, :, None]
        part = prims.block_segment_reduce(msgs, dl, nseg, "sum")
        return prims.scatter_reduce_major_sum(part)    # [Vc, H, D]

    es, vs = edge_spec(), vertex_spec()
    return jax.jit(jax.shard_map(
        kernel, mesh=mesh, in_specs=(es, es, es, vs, vs, vs), out_specs=vs))


def mg_gat_conv(params, g: DistGraph, mesh, x: jax.Array, *,
                negative_slope: float = 0.2) -> jax.Array:
    """Distributed mirror of nn.layers.gat_conv (multi-head, unweighted
    attention): one [pad_v,F]→[pad_v,H·D] GEMM, per-vertex attention halves,
    then the shard_map edge kernel above."""
    H, D = params["a_src"].shape
    h = jnp.dot(x, params["w"], preferred_element_type=jnp.float32)
    hr = h.reshape(h.shape[0], H, D)
    a_s = jnp.einsum("vhd,hd->vh", hr, params["a_src"])
    a_d = jnp.einsum("vhd,hd->vh", hr, params["a_dst"])
    out = _mg_gat_kernel(mesh, g.pmaj, g.chunk, float(negative_slope))(
        g.pull.src_loc, g.pull.dst_loc, g.pull.valid, hr, a_s, a_d)
    return out.reshape(out.shape[0], H * D) + params["b"]


@lru_cache(maxsize=32)
def _mg_gatv2_kernel(mesh, pmaj, chunk, negative_slope):
    def kernel(src_loc, dst_loc, valid, hs_own, hd_own, a):
        sl, dl = src_loc[0, 0], dst_loc[0, 0]
        vv = valid[0, 0][:, None]
        nseg = pmaj * chunk
        hs_blk = prims.gather_minor_block(hs_own)      # [B, H, D]
        hd_blk = prims.gather_major_block(hd_own)      # [nseg, H, D]
        hs_e = jnp.take(hs_blk, sl, axis=0)            # [E, H, D]
        e = jax.nn.leaky_relu(hs_e + jnp.take(hd_blk, dl, axis=0),
                              negative_slope)
        logit = jnp.einsum("ehd,hd->eh", e, a)
        neg = jnp.asarray(-1e30, logit.dtype)
        logit = jnp.where(vv, logit, neg)
        # global per-dst max via all_gather+max (pmax lacks a diff rule);
        # the softmax max-shift is a constant offset, so stop_gradient
        mx = jax.lax.stop_gradient(jnp.max(jax.lax.all_gather(
            prims.block_segment_reduce(logit, dl, nseg, "max"),
            prims.MAJOR, axis=0), axis=0))
        delta = jnp.where(vv, logit - jnp.take(mx, dl, axis=0), neg)
        ex = jnp.exp(delta)
        denom = jax.lax.psum(
            prims.block_segment_reduce(ex, dl, nseg, "sum"), prims.MAJOR)
        coef = ex / jnp.maximum(jnp.take(denom, dl, axis=0), 1e-16)
        part = prims.block_segment_reduce(hs_e * coef[:, :, None], dl,
                                          nseg, "sum")
        return prims.scatter_reduce_major_sum(part)

    es, vs = edge_spec(), vertex_spec()
    return jax.jit(jax.shard_map(
        kernel, mesh=mesh,
        in_specs=(es, es, es, vs, vs, P()), out_specs=vs))


def mg_gatv2_conv(params, g: DistGraph, mesh, x: jax.Array, *,
                  negative_slope: float = 0.2) -> jax.Array:
    """Distributed mirror of nn.layers.gatv2_conv (dynamic attention; the
    "a" vector applies after the per-edge nonlinearity, so it rides into the
    edge kernel as a replicated parameter)."""
    H, D = params["a"].shape
    hs = jnp.dot(x, params["w_src"], preferred_element_type=jnp.float32)
    hd = jnp.dot(x, params["w_dst"], preferred_element_type=jnp.float32)
    out = _mg_gatv2_kernel(mesh, g.pmaj, g.chunk, float(negative_slope))(
        g.pull.src_loc, g.pull.dst_loc, g.pull.valid,
        hs.reshape(hs.shape[0], H, D), hd.reshape(hd.shape[0], H, D),
        params["a"])
    return out.reshape(out.shape[0], H * D) + params["b"]


# ---------------------------------------------------------------------------
# GIN / APPNP — direct reuses of the SpMM aggregation fast path
# ---------------------------------------------------------------------------

def mg_gin_conv(params, g: DistGraph, mesh, x: jax.Array) -> jax.Array:
    """Distributed mirror of nn.layers.gin_conv: sum aggregation + 2-layer
    MLP with learnable ε (all-dense transforms shard row-wise under GSPMD)."""
    agg = mg_aggregate_sum(g, mesh, x)
    h = (1.0 + params["eps"]) * x + agg
    h = jax.nn.relu(jnp.dot(h, params["w1"],
                            preferred_element_type=jnp.float32) + params["b1"])
    return jnp.dot(h, params["w2"],
                   preferred_element_type=jnp.float32) + params["b2"]


def mg_appnp_propagate(g: DistGraph, mesh, z: jax.Array, *,
                       alpha: float = 0.1, k: int = 10) -> jax.Array:
    """Distributed mirror of nn.layers.appnp_propagate: k unrolled rounds of
    Z ← α·Z₀ + (1−α)·D̂^{-1/2}ÂD̂^{-1/2}·Z through the MG SpMM."""
    deg = g.in_degree + 1.0
    inv_sqrt = jax.lax.rsqrt(deg)
    z0 = z
    for _ in range(k):
        hn = z * inv_sqrt[:, None]
        z = alpha * z0 + (1.0 - alpha) * (
            mg_aggregate_sum(g, mesh, hn) + hn) * inv_sqrt[:, None]
    return z
