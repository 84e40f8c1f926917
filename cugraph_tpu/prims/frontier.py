"""Frontier primitives: dense-bitmap frontier expansion.

TPU-native re-design of the reference's vertex_frontier machinery
(cpp/include/cugraph/prims/vertex_frontier.cuh, and the BFS/SSSP/WCC engine
transform_reduce_v_frontier_outgoing_e_by_dst,
prims/transform_reduce_if_v_frontier_outgoing_e_by_dst.cuh:113-213,649-694).

Key design departure: the reference maintains *compressed* sorted-unique
frontier buckets and dedups candidates with priority allreduces + shuffles —
all data-dependent shapes.  XLA wants static shapes, so the frontier is a
dense boolean/[pad_v] mask and expansion is a full-edge pass with a masked
segment-reduce "by dst".  This is exactly the direction-optimizing bottom-up
regime the reference switches into for large frontiers (bfs_impl.cuh:291-300);
we simply run the dense regime always, which is the right trade on an MXU/VPU
machine (predictable dense sweeps beat data-dependent gathers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cugraph_tpu.core.structure import GraphStructure
from cugraph_tpu.prims.vertex_edge import segment_reduce_by_major, gather_minor


def bitmap_from_vertices(vertices: jax.Array, pad_v: int) -> jax.Array:
    """Dense bool [pad_v] mask from a list of vertex ids.  Out-of-range ids
    (negative sentinels like pred=-1, or ids >= pad_v) are DROPPED — the old
    clip sent negatives to vertex 0, silently injecting it into frontiers."""
    mask = jnp.zeros((pad_v,), dtype=jnp.bool_)
    ok = (vertices >= 0) & (vertices < pad_v)
    idx = jnp.where(ok, vertices, pad_v - 1)
    return mask.at[idx].max(ok)


def vertices_from_bitmap(mask: jax.Array, num_vertices: int) -> jax.Array:
    """Host-friendly decompression (not for use inside jit hot loops)."""
    return jnp.nonzero(mask[:num_vertices])[0]


def frontier_expand_by_dst(
    g: GraphStructure,
    frontier: jax.Array,          # bool [pad_v]
    eligible: jax.Array,          # bool [pad_v] — e.g. ~visited
):
    """One level of frontier expansion along out-edges, deduped by dst.

    Returns (next_frontier bool [pad_v], predecessor int32 [pad_v]) where
    predecessor[v] is a valid frontier in-neighbor for newly reached v, else
    -1.  Reference semantics: transform_reduce_v_frontier_outgoing_e_by_dst
    with reduce_op::any (bfs_impl.cuh:449-466) — "any" predecessor wins, so we
    use max which is deterministic.
    """
    csc = g.csc  # major = dst, minor = src: reduce-by-dst is a sorted segment op
    src_in_frontier = gather_minor(csc, frontier)
    cand_pred = jnp.where(src_in_frontier, csc.indices, -1)
    pred = segment_reduce_by_major(csc, cand_pred, "max")
    reached = pred >= 0
    next_frontier = reached & eligible
    pred = jnp.where(next_frontier, pred, -1)
    return next_frontier, pred
