"""Per-vertex / per-edge transform-reduce primitives (single shard).

TPU-native re-design of the reference primitives
(cpp/include/cugraph/prims/per_v_transform_reduce_incoming_outgoing_e.cuh:402,
transform_reduce_e.cuh:670, transform_e.cuh, transform_reduce_v.cuh, …).

Where the reference dispatches degree-segmented CUDA kernels
(prims/detail/per_v_transform_reduce_e.cuh:252,389,500,688), we emit one
gather + one sorted segment-reduce and let XLA fuse the elementwise ``e_op``
into them.  Padding edges point at the sink row with weight 0 (see
core/structure.py), so sum-reductions are mask-free; min/max reductions only
dirty the sink row, which callers slice off.

All functions are jit-compatible and close over nothing dynamic.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from cugraph_tpu.core.structure import CsrMatrix, GraphStructure

_SEGMENT_OPS = {
    "sum": jax.ops.segment_sum,
    "min": jax.ops.segment_min,
    "max": jax.ops.segment_max,
    "prod": jax.ops.segment_prod,
}


def segment_reduce_by_major(adj: CsrMatrix, values: jax.Array, op: str = "sum") -> jax.Array:
    """Reduce per-edge values to per-major-vertex values, shape [pad_v, ...].

    The fundamental lowering of ``per_v_transform_reduce_*``: edges are stored
    sorted by major, so this is XLA's fast sorted-segment path.
    """
    return _SEGMENT_OPS[op](
        values, adj.majors, num_segments=adj.pad_v, indices_are_sorted=True
    )


def gather_minor(adj: CsrMatrix, vertex_values: jax.Array) -> jax.Array:
    """Per-edge gather of the minor endpoint's vertex value.

    SG analog of update_edge_src/dst_property
    (prims/update_edge_src_dst_property.cuh:163-224): on one shard the
    "replicated property cache" is just a gather.
    ``vertex_values`` must be [pad_v, ...].
    """
    return jnp.take(vertex_values, adj.indices, axis=0)


def gather_major(adj: CsrMatrix, vertex_values: jax.Array) -> jax.Array:
    return jnp.take(vertex_values, adj.majors, axis=0)


def _apply_e_op(adj: CsrMatrix, e_op, src_values, dst_values, incoming: bool):
    """Evaluate e_op(src_val, dst_val, weight) per edge for the given
    orientation.  For ``incoming`` the adj is a CSC (major=dst, minor=src)."""
    if incoming:
        s = None if src_values is None else gather_minor(adj, src_values)
        d = None if dst_values is None else gather_major(adj, dst_values)
    else:
        s = None if src_values is None else gather_major(adj, src_values)
        d = None if dst_values is None else gather_minor(adj, dst_values)
    return e_op(s, d, adj.weights)


def per_v_transform_reduce_incoming_e(
    g: GraphStructure,
    e_op,
    *,
    src_values: jax.Array | None = None,
    dst_values: jax.Array | None = None,
    reduce_op: str = "sum",
) -> jax.Array:
    """y[v] = reduce over in-edges (u,v) of e_op(src_val[u], dst_val[v], w).

    The SpMV/SpMM-shaped primitive (reference
    per_v_transform_reduce_incoming_outgoing_e.cuh:402) that PageRank, Katz,
    HITS and eigenvector centrality are written against.
    Returns [pad_v, ...]; entries >= num_vertices are garbage (sink/pad rows).
    """
    vals = _apply_e_op(g.csc, e_op, src_values, dst_values, incoming=True)
    return segment_reduce_by_major(g.csc, vals, reduce_op)


def per_v_transform_reduce_outgoing_e(
    g: GraphStructure,
    e_op,
    *,
    src_values: jax.Array | None = None,
    dst_values: jax.Array | None = None,
    reduce_op: str = "sum",
) -> jax.Array:
    vals = _apply_e_op(g.csr, e_op, src_values, dst_values, incoming=False)
    return segment_reduce_by_major(g.csr, vals, reduce_op)


def spmv_pull(g: GraphStructure, x: jax.Array) -> jax.Array:
    """y[v] = sum over in-edges (u,v) of w_uv * x[u];  x, y are [pad_v]."""
    return per_v_transform_reduce_incoming_e(
        g, lambda s, d, w: w * s, src_values=x
    )


def spmv_push(g: GraphStructure, x: jax.Array) -> jax.Array:
    """y[u] = sum over out-edges (u,v) of w_uv * x[v]."""
    return per_v_transform_reduce_outgoing_e(
        g, lambda s, d, w: w * d, dst_values=x
    )


def transform_reduce_e(
    g: GraphStructure,
    e_op,
    *,
    src_values=None,
    dst_values=None,
    init=0.0,
) -> jax.Array:
    """Scalar reduce over all edges (reference transform_reduce_e.cuh:670);
    used for modularity sums, edge counting, etc.  Padding edges see weight 0
    and sink endpoints — e_op must map them to the additive identity (any
    e_op of the form f(...)*w does)."""
    vals = _apply_e_op(g.csr, e_op, src_values, dst_values, incoming=False)
    return jnp.sum(vals) + init


def transform_e(
    g: GraphStructure,
    e_op,
    *,
    src_values=None,
    dst_values=None,
) -> jax.Array:
    """Per-edge map in csr (by-src) order — SDDMM-shaped (reference
    transform_e.cuh).  Returns [pad_e] in the csr edge order."""
    return _apply_e_op(g.csr, e_op, src_values, dst_values, incoming=False)


def count_if_e(g: GraphStructure, pred, *, src_values=None, dst_values=None) -> jax.Array:
    mask = _apply_e_op(g.csr, pred, src_values, dst_values, incoming=False)
    # exclude padding explicitly: padding rows are (sink, sink, 0.0)
    valid = g.csr.majors < g.csr.num_vertices
    return jnp.sum(jnp.where(valid, mask.astype(jnp.int32), 0))


def transform_reduce_v(g: GraphStructure, v_op, values: jax.Array, init=0.0) -> jax.Array:
    """Reduce v_op(value[v]) over real vertices only (reference
    transform_reduce_v.cuh); pad/sink rows masked out."""
    n = g.num_vertices
    idx = jnp.arange(values.shape[0])
    vals = jnp.where(idx < n, v_op(values), 0)
    return jnp.sum(vals) + init


def reduce_v(g: GraphStructure, values: jax.Array, init=0.0) -> jax.Array:
    return transform_reduce_v(g, lambda x: x, values, init)


def count_if_v(g: GraphStructure, pred, values: jax.Array) -> jax.Array:
    n = g.num_vertices
    idx = jnp.arange(values.shape[0])
    return jnp.sum(jnp.where(idx < n, pred(values).astype(jnp.int32), 0))


def vertex_mask(g: GraphStructure) -> jax.Array:
    """Boolean [pad_v] mask of real vertices."""
    return jnp.arange(g.pad_v) < g.num_vertices
