"""Shard-level distributed primitives (called INSIDE jax.shard_map).

Each function body is what one device executes; collectives reference the mesh
axes ("major", "minor") established by cugraph_tpu.parallel.mesh.  These are
the TPU re-expression of the reference's MG primitive internals
(SURVEY.md §2.2): the update_edge_src_property broadcast becomes one tiled
all_gather along "minor", the per-vertex owner reduce becomes one tiled
psum_scatter along "major", and host-scalar allreduces become on-device psums.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MAJOR = "major"
MINOR = "minor"


def my_coords():
    return jax.lax.axis_index(MAJOR), jax.lax.axis_index(MINOR)


def global_vertex_ids(chunk: int) -> jax.Array:
    """Global ids of this device's owned vertex slots, [chunk]."""
    i, j = my_coords()
    pmin = jax.lax.axis_size(MINOR)
    base = (i * pmin + j) * chunk
    return base + jnp.arange(chunk, dtype=jnp.int32)


def gather_minor_block(x_own: jax.Array) -> jax.Array:
    """Owned slices [Vc, ...] → this mesh row's full row-block [B, ...].

    The reference's minor-comm property broadcast
    (update_edge_src_dst_property.cuh:163-224) as a single tiled all-gather.
    """
    return jax.lax.all_gather(x_own, MINOR, axis=0, tiled=True)


def gather_major_block(x_own: jax.Array) -> jax.Array:
    """Owned slices [Vc, ...] → the dst-segment space [pmaj·Vc, ...] for this
    mesh column (concat over the major axis — matches dst_loc slot order)."""
    return jax.lax.all_gather(x_own, MAJOR, axis=0, tiled=True)


def scatter_reduce_major_sum(part: jax.Array) -> jax.Array:
    """Per-dst partials [pmaj·Vc, ...] → summed owner slices [Vc, ...].

    The reference's device_reduce over minor_comm to the vertex owner
    (detail/per_v_transform_reduce_e.cuh:3397) as one tiled psum_scatter.
    """
    return jax.lax.psum_scatter(part, MAJOR, scatter_dimension=0, tiled=True)


def scatter_reduce_minor_sum(part: jax.Array) -> jax.Array:
    """Row-block partials [pmin·Vc, ...] → summed owner slices [Vc, ...]
    (the transpose of gather_minor_block — used by the SpMM backward pass)."""
    return jax.lax.psum_scatter(part, MINOR, scatter_dimension=0, tiled=True)


def _slice_own_major(red: jax.Array, chunk: int) -> jax.Array:
    i = jax.lax.axis_index(MAJOR)
    return jax.lax.dynamic_slice_in_dim(red, i * chunk, chunk, axis=0)


def scatter_reduce_major(part: jax.Array, chunk: int, op: str) -> jax.Array:
    """Like scatter_reduce_major_sum but for min/max/any semirings.

    XLA has no pmin/pmax-scatter, so reduce fully then slice the owned piece
    (2× the bytes of reduce-scatter — acceptable; revisit with a ppermute
    ring if it ever shows up in profiles).
    """
    if op == "sum":
        return scatter_reduce_major_sum(part)
    if op == "min":
        return _slice_own_major(jax.lax.pmin(part, MAJOR), chunk)
    if op == "max":
        return _slice_own_major(jax.lax.pmax(part, MAJOR), chunk)
    raise ValueError(op)


_SEG = {
    "sum": jax.ops.segment_sum,
    "min": jax.ops.segment_min,
    "max": jax.ops.segment_max,
}


def block_segment_reduce(vals: jax.Array, dst_loc: jax.Array, num_segments: int,
                         op: str = "sum") -> jax.Array:
    return _SEG[op](vals, dst_loc, num_segments=num_segments,
                    indices_are_sorted=True)


def psum_all(x):
    """Global scalar allreduce over the whole mesh (replaces the reference's
    host_scalar_allreduce, utilities/host_scalar_comm.hpp — stays on device)."""
    return jax.lax.psum(x, (MAJOR, MINOR))


def pull_spmv(src_loc, dst_loc, w, x_own, *, pmaj: int, chunk: int,
              plan=None) -> jax.Array:
    """y[dst] = Σ_{(src,dst)} w · x[src], all operands owner-sharded.

    One gather + one local reduce + one reduce-scatter: the distributed
    analog of per_v_transform_reduce_incoming_e (SpMV).  With ``plan`` (a
    per-device SpmvPlan from parallel.kernels, already .local()'d) the local
    reduce runs the one-hot MXU kernel instead of XLA take+segment_sum (which
    scalarizes on TPU); padding lanes carry w = 0 / NaN respectively, so no
    masks are needed either way.
    """
    x_blk = gather_minor_block(x_own)
    if plan is not None:
        from cugraph_tpu.kernels.spmv_onehot import spmv_onehot

        xp = jnp.pad(x_blk, (0, plan.pad_v - x_blk.shape[0]))
        part = spmv_onehot(plan, xp, precision="split")[: pmaj * chunk]
    else:
        vals = w * jnp.take(x_blk, src_loc, axis=0)
        part = block_segment_reduce(vals, dst_loc, pmaj * chunk, "sum")
    return scatter_reduce_major_sum(part)


def pull_spmv_systolic(src_loc, dst_loc, w, x_own, *, pmaj: int, pmin: int,
                       chunk: int) -> jax.Array:
    """Streamed pull SpMV: instead of materializing the pmin·chunk minor
    block (gather_minor_block), the owned slices ROTATE around the mesh row
    (`ppermute` ring), and each step processes the edges whose sources the
    arriving slice covers.  Gather memory is O(chunk) — the graph-size
    scaling escape hatch when minor-block replication exceeds HBM — and XLA
    overlaps each ppermute with the previous step's compute (the
    stream-overlap role of SURVEY §2.3; reference analog: the chunked
    update_edge_src_property staging of large_buffer_manager graphs).
    Semantics identical to pull_spmv (weights carry 0 on padding lanes)."""
    nseg = pmaj * chunk
    me = jax.lax.axis_index(MINOR)
    owner = src_loc // chunk
    rel = src_loc % chunk
    perm = [(i, (i - 1) % pmin) for i in range(pmin)]  # slice from j+s lands

    def step(s, state):
        part, x_rot = state
        src_dev = (me + s) % pmin           # whose slice x_rot currently is
        vals = jnp.where(owner == src_dev, w * jnp.take(x_rot, rel), 0.0)
        part = part + block_segment_reduce(vals, dst_loc, nseg, "sum")
        x_rot = jax.lax.ppermute(x_rot, MINOR, perm)
        return part, x_rot

    part0 = jax.lax.pcast(jnp.zeros((nseg,), x_own.dtype), (MAJOR, MINOR),
                          to="varying")
    part, _ = jax.lax.fori_loop(0, pmin, step, (part0, x_own))
    return scatter_reduce_major_sum(part)


def pull_spmm(src_loc, dst_loc, w, x_own, *, pmaj: int, chunk: int) -> jax.Array:
    """Feature-matrix version: x_own [Vc, F] → y_own [Vc, F] (the GNN
    aggregation SpMM; same collective structure, trailing dim rides along).
    The Pallas fast path lives in parallel.nn (mg_spmm_pallas_fn) because its
    custom VJP must close over concrete plans outside the shard_map trace."""
    x_blk = gather_minor_block(x_own)                      # [B, F]
    vals = jnp.take(x_blk, src_loc, axis=0) * w[:, None]   # [E, F]
    part = block_segment_reduce(vals, dst_loc, pmaj * chunk, "sum")
    return scatter_reduce_major_sum(part)


def pull_transform_reduce(src_loc, dst_loc, valid, x_own, e_op, *,
                          pmaj: int, chunk: int, op: str, identity) -> jax.Array:
    """General per-dst reduce of e_op(x[src], edge_slot) over in-edges.

    ``e_op(x_src_vals, slot)`` maps gathered source values (and the local edge
    slot index, for weight lookups) to per-edge values; invalid lanes are
    replaced by ``identity`` before reduction.
    """
    x_blk = gather_minor_block(x_own)
    vals = e_op(jnp.take(x_blk, src_loc, axis=0), jnp.arange(src_loc.shape[0]))
    vals = jnp.where(valid, vals, identity)
    part = block_segment_reduce(vals, dst_loc, pmaj * chunk, op)
    if op == "min":
        part = jnp.minimum(part, jnp.asarray(identity, part.dtype))  # empty segs
    elif op == "max":
        part = jnp.maximum(part, jnp.asarray(identity, part.dtype))
    return scatter_reduce_major(part, chunk, op)
