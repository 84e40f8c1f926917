"""Message-passing neural-network layers over the graph primitives.

The reference keeps GNN layers out-of-repo (cugraph-pyg/cugraph-dgl consume its
sampling + lookup capabilities, readme_pages/gnn_support.md); this framework
ships a native JAX layer family so the GNN feed path (SURVEY.md §3.5,
BASELINE.json GraphSAGE/ogbn-arxiv config) is end-to-end runnable on TPU.

TPU mapping: neighbor aggregation lowers to the same sorted segment-reduce as
``per_v_transform_reduce_incoming_e`` (the SpMM), feature transforms are dense
[V, F] @ [F, H] matmuls that land on the MXU.  Aggregate-then-transform order
is chosen so the matmul operates on the [pad_v, F] matrix (one MXU-friendly
GEMM) instead of [pad_e, F].

All layers are pure functions: ``params`` pytrees in, arrays out.  No flax
module state — functional transforms (grad/jit/shard_map) compose directly.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from cugraph_tpu.core.structure import CsrMatrix, GraphStructure
from cugraph_tpu.prims.vertex_edge import (
    gather_major,
    gather_minor,
    segment_reduce_by_major,
)


def _glorot(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[-1]
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


# ---------------------------------------------------------------------------
# aggregation primitives (SpMM-shaped)
# ---------------------------------------------------------------------------

def _weighted_in_degree(g: GraphStructure) -> jax.Array:
    """Cached weighted in-degree [pad_v].  Computed HOST-side once per
    structure: the traced segment_sum alternative scalarizes on this TPU
    (~0.12 G elem/s — ~140 ms per forward at RMAT-20, dwarfing the SpMM
    kernel it normalizes).  Falls back to the traced reduce when the graph
    arrays are tracers (jitted XLA path)."""
    if isinstance(g.csc.majors, jax.core.Tracer):
        return g.in_weight_sums()
    cached = getattr(g, "_w_in_deg_cache", None)
    if cached is None:
        import numpy as np

        e = g.csc.num_edges
        d = np.bincount(np.asarray(g.csc.majors)[:e],
                        weights=np.asarray(g.csc.weights)[:e],
                        minlength=g.csc.pad_v).astype(np.float32)
        cached = jnp.asarray(d)
        object.__setattr__(g, "_w_in_deg_cache", cached)
    return cached


def _spmm_fast_path_ok(g: GraphStructure) -> bool:
    from cugraph_tpu.kernels.dispatch import pallas_enabled

    if isinstance(g.csc.indices, jax.core.Tracer):
        # under jit the host-side plan builder can't see the arrays; jitted
        # train steps use the XLA path (or the MG layers, which thread
        # precomputed plans as arguments).  Gradient tracers in x are FINE:
        # the aggregation goes through a custom-VJP pair.
        return False
    return pallas_enabled(g.num_edges)


def _aggregate_pallas(g: GraphStructure, x: jax.Array) -> jax.Array:
    """Weighted-sum in-neighbor aggregation via the one-hot SpMM kernel —
    the DIFFERENTIABLE custom-VJP pair (kernels/spmm_onehot.make_spmm_pair):
    a raw pallas_call has no differentiation rule, so eager value_and_grad
    through a 2-layer model would crash on the second layer otherwise."""
    from cugraph_tpu.kernels.spmm_onehot import get_structure_spmm_fn

    f = get_structure_spmm_fn(g)
    out = f(x)
    if out.shape[0] < x.shape[0]:
        out = jnp.pad(out, ((0, x.shape[0] - out.shape[0]), (0, 0)))
    return out[: x.shape[0]]


def aggregate_neighbors(
    g: GraphStructure, x: jax.Array, *, mode: str = "mean"
) -> jax.Array:
    """Per-vertex reduce of in-neighbor features: out[v] = op_{(u,v)∈E} w·x[u].

    x: [pad_v, F] → out: [pad_v, F].  Padding edges source from the sink row;
    we zero the sink row first so "sum"/"mean" stay exact without masks.
    "sum"/"mean" are EDGE-WEIGHTED (mean normalizes by the weighted in-degree)
    to match the distributed layers in parallel/nn.py; unweighted graphs carry
    1.0 weights so counts and weight sums coincide.  "max" ignores weights.
    """
    adj = g.csc  # major = dst, minor = src
    if mode in ("sum", "mean") and _spmm_fast_path_ok(g):
        agg = _aggregate_pallas(g, x)
        if mode == "mean":
            agg = agg / jnp.maximum(_weighted_in_degree(g),
                                    1e-12)[:, None].astype(x.dtype)
        return agg
    x = x.at[adj.sink].set(0.0)
    msgs = gather_minor(adj, x)  # [pad_e, F]
    if mode in ("sum", "mean"):
        agg = segment_reduce_by_major(adj, msgs * adj.weights[:, None], "sum")
        if mode == "mean":
            deg = _weighted_in_degree(g).astype(x.dtype)
            agg = agg / jnp.maximum(deg, 1e-12)[:, None]
        return agg
    if mode == "max":
        big = jnp.asarray(jnp.finfo(x.dtype).min, x.dtype)
        msgs = jnp.where((adj.majors < adj.num_vertices)[:, None], msgs, big)
        agg = segment_reduce_by_major(adj, msgs, "max")
        # empty segments come back -inf; masked padding edges as finfo.min
        return jnp.where(agg <= big, 0.0, agg)
    raise ValueError(f"unknown aggregation mode {mode!r}")


# ---------------------------------------------------------------------------
# GraphSAGE (mean aggregator, Hamilton et al. 2017)
# ---------------------------------------------------------------------------

def sage_init(key, in_dim: int, out_dim: int):
    k1, k2 = jax.random.split(key)
    return {
        "w_self": _glorot(k1, (in_dim, out_dim)),
        "w_nbr": _glorot(k2, (in_dim, out_dim)),
        "b": jnp.zeros((out_dim,), jnp.float32),
    }


def sage_conv(params, g: GraphStructure, x: jax.Array) -> jax.Array:
    """h[v] = W_self·x[v] + W_nbr·mean_{u→v} x[u] + b."""
    h_nbr = aggregate_neighbors(g, x, mode="mean")
    return (
        jnp.dot(x, params["w_self"], preferred_element_type=jnp.float32)
        + jnp.dot(h_nbr, params["w_nbr"], preferred_element_type=jnp.float32)
        + params["b"]
    )


# ---------------------------------------------------------------------------
# GCN (Kipf & Welling 2017): H' = D̂^{-1/2} Â D̂^{-1/2} H W
# ---------------------------------------------------------------------------

def gcn_init(key, in_dim: int, out_dim: int):
    return {
        "w": _glorot(key, (in_dim, out_dim)),
        "b": jnp.zeros((out_dim,), jnp.float32),
    }


def gcn_conv(params, g: GraphStructure, x: jax.Array) -> jax.Array:
    """Symmetric-normalized propagation with implicit self loops.
    Edge-weighted (deg = weighted in-degree), matching parallel/nn.mg_gcn_conv."""
    deg = (_weighted_in_degree(g) + 1).astype(x.dtype)  # +1: self loop
    inv_sqrt = jax.lax.rsqrt(deg)
    h = jnp.dot(x, params["w"], preferred_element_type=jnp.float32)
    h = h * inv_sqrt[:, None]
    agg = aggregate_neighbors(g, h, mode="sum") + h  # Â = A + I
    return agg * inv_sqrt[:, None] + params["b"]


# ---------------------------------------------------------------------------
# GAT (Veličković et al. 2018), single- or multi-head
# ---------------------------------------------------------------------------

def gat_init(key, in_dim: int, out_dim: int, num_heads: int = 1):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "w": _glorot(k1, (in_dim, num_heads * out_dim)),
        "a_src": _glorot(k2, (num_heads, out_dim)),
        "a_dst": _glorot(k3, (num_heads, out_dim)),
        "b": jnp.zeros((num_heads * out_dim,), jnp.float32),
    }


def gat_conv(params, g: GraphStructure, x: jax.Array, *, negative_slope=0.2):
    """Attention logits are SDDMM-shaped (per-edge transform_e analog:
    reference transform_e.cuh); the softmax over each vertex's in-edge set is
    a segment-max/segment-sum pair over the dst-sorted edge order."""
    adj = g.csc
    H, D = params["a_src"].shape
    h = jnp.dot(x, params["w"], preferred_element_type=jnp.float32)
    h = h.reshape(h.shape[0], H, D)  # [pad_v, H, D]
    alpha_src = jnp.einsum("vhd,hd->vh", h, params["a_src"])
    alpha_dst = jnp.einsum("vhd,hd->vh", h, params["a_dst"])
    logits = gather_minor(adj, alpha_src) + gather_major(adj, alpha_dst)
    logits = jax.nn.leaky_relu(logits, negative_slope)  # [pad_e, H]
    coef = _segment_softmax(adj, logits)
    msgs = gather_minor(adj, h) * coef[:, :, None]  # [pad_e, H, D]
    out = segment_reduce_by_major(adj, msgs, "sum")  # [pad_v, H, D]
    return out.reshape(out.shape[0], H * D) + params["b"]


def _segment_softmax(adj: CsrMatrix, logits: jax.Array) -> jax.Array:
    """Numerically-stable softmax of per-edge logits [pad_e, H] over each
    major vertex's edge segment (the dst-sorted edge order)."""
    valid = (adj.majors < adj.num_vertices)[:, None]
    neg = jnp.asarray(-1e30, logits.dtype)
    logits = jnp.where(valid, logits, neg)
    mx = segment_reduce_by_major(adj, logits, "max")  # [pad_v, H]
    ex = jnp.where(valid, jnp.exp(logits - gather_major(adj, mx)), 0.0)
    denom = segment_reduce_by_major(adj, ex, "sum")
    return ex / jnp.maximum(gather_major(adj, denom), 1e-16)


# ---------------------------------------------------------------------------
# GATv2 (Brody et al. 2022) — the "a" vector is applied AFTER the
# nonlinearity, giving dynamic (query-dependent) attention
# ---------------------------------------------------------------------------

def gatv2_init(key, in_dim: int, out_dim: int, num_heads: int = 1):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "w_src": _glorot(k1, (in_dim, num_heads * out_dim)),
        "w_dst": _glorot(k2, (in_dim, num_heads * out_dim)),
        "a": _glorot(k3, (num_heads, out_dim)),
        "b": jnp.zeros((num_heads * out_dim,), jnp.float32),
    }


def gatv2_conv(params, g: GraphStructure, x: jax.Array, *, negative_slope=0.2):
    """e(u→v) = aᵀ·LeakyReLU(W_src·x[u] + W_dst·x[v]); softmax over v's
    in-edges; output aggregates W_src-transformed neighbor features.

    The per-edge [pad_e, H, D] intermediate is the price of dynamic
    attention; both transforms stay [pad_v, F]→[pad_v, H·D] MXU GEMMs and the
    edge-level ops are elementwise (XLA fuses them into the gathers)."""
    adj = g.csc
    H, D = params["a"].shape
    hs = jnp.dot(x, params["w_src"], preferred_element_type=jnp.float32)
    hd = jnp.dot(x, params["w_dst"], preferred_element_type=jnp.float32)
    hs = hs.reshape(hs.shape[0], H, D)
    hd = hd.reshape(hd.shape[0], H, D)
    e = gather_minor(adj, hs) + gather_major(adj, hd)  # [pad_e, H, D]
    e = jax.nn.leaky_relu(e, negative_slope)
    logits = jnp.einsum("ehd,hd->eh", e, params["a"])  # [pad_e, H]
    coef = _segment_softmax(adj, logits)
    msgs = gather_minor(adj, hs) * coef[:, :, None]
    out = segment_reduce_by_major(adj, msgs, "sum")
    return out.reshape(out.shape[0], H * D) + params["b"]


# ---------------------------------------------------------------------------
# GIN (Xu et al. 2019): h' = MLP((1+ε)·h + Σ_{u→v} h[u])
# ---------------------------------------------------------------------------

def gin_init(key, in_dim: int, hidden_dim: int, out_dim: int):
    k1, k2 = jax.random.split(key)
    return {
        "eps": jnp.zeros((), jnp.float32),
        "w1": _glorot(k1, (in_dim, hidden_dim)),
        "b1": jnp.zeros((hidden_dim,), jnp.float32),
        "w2": _glorot(k2, (hidden_dim, out_dim)),
        "b2": jnp.zeros((out_dim,), jnp.float32),
    }


def gin_conv(params, g: GraphStructure, x: jax.Array) -> jax.Array:
    """Sum aggregation (maximally expressive per the WL argument) followed by
    a 2-layer MLP; ε is learnable.  The aggregation routes through the
    Pallas one-hot SpMM above the size threshold like every sum aggregate."""
    agg = aggregate_neighbors(g, x, mode="sum")
    h = (1.0 + params["eps"]) * x + agg
    h = jnp.dot(h, params["w1"], preferred_element_type=jnp.float32)
    h = jax.nn.relu(h + params["b1"])
    return jnp.dot(h, params["w2"],
                   preferred_element_type=jnp.float32) + params["b2"]


# ---------------------------------------------------------------------------
# APPNP (Gasteiger et al. 2019): predict-then-propagate with personalized-
# PageRank diffusion — the GNN face of the framework's PageRank engine
# ---------------------------------------------------------------------------

def appnp_propagate(g: GraphStructure, z: jax.Array, *, alpha: float = 0.1,
                    k: int = 10) -> jax.Array:
    """Z ← α·Z₀ + (1−α)·D̂^{-1/2}ÂD̂^{-1/2}·Z, iterated k times (Â = A + I).

    The inner product is the same symmetric-normalized SpMM as gcn_conv, so
    the TPU fast path (one-hot Pallas SpMM) applies; k is static so the loop
    unrolls into one fused XLA computation."""
    deg = (_weighted_in_degree(g) + 1).astype(z.dtype)
    inv_sqrt = jax.lax.rsqrt(deg)

    def prop(h):
        hn = h * inv_sqrt[:, None]
        return (aggregate_neighbors(g, hn, mode="sum") + hn) * inv_sqrt[:, None]

    z0 = z
    for _ in range(k):
        z = alpha * z0 + (1.0 - alpha) * prop(z)
    return z
