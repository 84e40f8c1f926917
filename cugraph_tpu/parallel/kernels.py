"""Per-device Pallas kernel plans for the 2D-partitioned graph.

The MG analog of kernels/dispatch.py: each device's pull (or push) edge block
is an independent bipartite SpMV/SpMM operator (x over the gathered row-block
[0, B), y over the reduced segment space [0, pmaj·Vc)), so each device gets
its own one-hot plan, built host-side at graph-build time and stacked
[pmaj, pmin, ...] so shard_map hands every device exactly its slice.  All
devices must run the same program, so per-device plans are padded to a common
tile count with empty (all-NaN-weight) trailing tiles that contribute the
reduce identity.

Reference analog: the multi_gpu=true instantiations of
per_v_transform_reduce_e (cpp/include/cugraph/prims/detail/
per_v_transform_reduce_e.cuh:3397-3489) — same kernels per edge partition,
collectives around them.
"""

from __future__ import annotations

import weakref
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from cugraph_tpu.kernels.spmm_onehot import SpmmPlan, build_spmm_plan, choose_windows
from cugraph_tpu.kernels.spmv_onehot import (SpmvPlan, auto_tile_subs,
                                             build_spmv_plan)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class StackedSpmvPlan:
    """Per-device SpmvPlans stacked on leading [pmaj, pmin] axes."""

    src_rel: jax.Array   # int32 [pmaj, pmin, T*8, 128]
    dst_full: jax.Array
    weight: jax.Array
    xwin_blk: jax.Array  # int32 [pmaj, pmin, T]
    yblk: jax.Array
    num_vertices: int = field(metadata=dict(static=True))
    n_rows: int = field(metadata=dict(static=True))
    yb_rows: int = field(metadata=dict(static=True))
    n_yblocks: int = field(metadata=dict(static=True))
    num_tiles: int = field(metadata=dict(static=True))
    tile_subs: int = field(default=8, metadata=dict(static=True))

    def local(self) -> SpmvPlan:
        """Inside shard_map: strip the [1, 1] device axes."""
        return SpmvPlan(
            src_rel=self.src_rel[0, 0], dst_full=self.dst_full[0, 0],
            weight=self.weight[0, 0], xwin_blk=self.xwin_blk[0, 0],
            yblk=self.yblk[0, 0], num_vertices=self.num_vertices,
            n_rows=self.n_rows, yb_rows=self.yb_rows,
            n_yblocks=self.n_yblocks, num_tiles=self.num_tiles,
            tile_subs=self.tile_subs)

    @property
    def meta(self):
        return (self.num_vertices, self.n_rows, self.yb_rows,
                self.n_yblocks, self.num_tiles, self.tile_subs)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class StackedSpmmPlan:
    """Per-device SpmmPlans stacked on leading [pmaj, pmin] axes."""

    src_rel: jax.Array
    dst_rel: jax.Array
    weight: jax.Array
    xwin: jax.Array
    yblk: jax.Array
    num_vertices: int = field(metadata=dict(static=True))
    pad_v: int = field(metadata=dict(static=True))
    w_src: int = field(metadata=dict(static=True))
    w_dst: int = field(metadata=dict(static=True))
    ybv: int = field(metadata=dict(static=True))
    n_yblocks: int = field(metadata=dict(static=True))
    num_tiles: int = field(metadata=dict(static=True))
    tile_subs: int = field(default=8, metadata=dict(static=True))
    split_safe: bool = field(default=False, metadata=dict(static=True))

    def local(self) -> SpmmPlan:
        return SpmmPlan(
            src_rel=self.src_rel[0, 0], dst_rel=self.dst_rel[0, 0],
            weight=self.weight[0, 0], xwin=self.xwin[0, 0],
            yblk=self.yblk[0, 0], num_vertices=self.num_vertices,
            pad_v=self.pad_v, w_src=self.w_src, w_dst=self.w_dst,
            ybv=self.ybv, n_yblocks=self.n_yblocks, num_tiles=self.num_tiles,
            tile_subs=self.tile_subs, split_safe=self.split_safe)

    @property
    def meta(self):
        return (self.num_vertices, self.pad_v, self.w_src, self.w_dst,
                self.ybv, self.n_yblocks, self.num_tiles, self.tile_subs)


def _pad_tiles(arrs, T, n_yblocks, tile_subs=8):
    """Pad (src, dst, w, xwin, yblk) to T tiles with empty trailing tiles.
    Trailing yblk repeats the last block so the kernel's first-visit
    zero-init never re-fires (which would wipe accumulated output)."""
    src, dst, w, xw, yb = arrs
    t = xw.shape[0]
    if t == T:
        return arrs
    p = T - t
    src = np.concatenate([src, np.zeros((p * tile_subs, 128), np.int32)])
    dst = np.concatenate([dst, np.zeros((p * tile_subs, 128), np.int32)])
    w = np.concatenate([w, np.full((p * tile_subs, 128), np.nan, np.float32)])
    xw = np.concatenate([xw, np.zeros(p, np.int32)])
    yb = np.concatenate([yb, np.full(p, n_yblocks - 1, np.int32)])
    return src, dst, w, xw, yb


def _valid_edges(blocks, i, j):
    # np.asarray BEFORE indexing: under a jit trace the blocks are concrete
    # closure constants, but jnp-style indexing would produce tracers
    v = np.asarray(blocks.valid)[i, j]
    return (np.asarray(blocks.src_loc)[i, j][v],
            np.asarray(blocks.dst_loc)[i, j][v],
            np.asarray(blocks.weight)[i, j][v])


def build_stacked_spmv_plan(g, orientation: str = "pull") -> StackedSpmvPlan:
    """One SpmvPlan per device over its local (src_loc → dst_loc) edges."""
    blocks = g.pull if orientation == "pull" else g.push
    if blocks is None:
        raise ValueError(f"graph stores no {orientation} blocks")
    pmaj, pmin, chunk = g.pmaj, g.pmin, g.chunk
    nv = max(pmin * chunk, pmaj * chunk)

    # ONE tile_subs across shards: stacking needs uniform tile shapes and
    # the shard_map kernel one static plan spec
    max_m = max(len(_valid_edges(blocks, i, j)[0])
                for i in range(pmaj) for j in range(pmin))
    ts = auto_tile_subs(max(max_m // 128, 1))
    plans = []
    for i in range(pmaj):
        for j in range(pmin):
            s, d, w = _valid_edges(blocks, i, j)
            plans.append(build_spmv_plan(s, d, w, nv, tile_subs=ts))
    T = max(p.num_tiles for p in plans)
    meta = plans[0]
    padded = [_pad_tiles((np.asarray(p.src_rel), np.asarray(p.dst_full),
                          np.asarray(p.weight), np.asarray(p.xwin_blk),
                          np.asarray(p.yblk)), T, meta.n_yblocks, ts)
              for p in plans]

    def stk(k):
        return jnp.asarray(np.stack([p[k] for p in padded]).reshape(
            (pmaj, pmin) + padded[0][k].shape))

    return StackedSpmvPlan(
        src_rel=stk(0), dst_full=stk(1), weight=stk(2), xwin_blk=stk(3),
        yblk=stk(4), num_vertices=nv, n_rows=meta.n_rows,
        yb_rows=meta.yb_rows, n_yblocks=meta.n_yblocks, num_tiles=T,
        tile_subs=ts)


def build_stacked_spmm_plan(g, orientation: str = "pull", *, transpose=False,
                            unit_weights=False) -> StackedSpmmPlan:
    """One SpmmPlan per device; transpose=True swaps src/dst locals (the
    VJP operator for y = A·x: dx = Aᵀ·dy).  unit_weights=True drops edge
    weights (path-counting sweeps like Brandes must not weight sigma)."""
    blocks = g.pull if orientation == "pull" else g.push
    if blocks is None:
        raise ValueError(f"graph stores no {orientation} blocks")
    pmaj, pmin, chunk = g.pmaj, g.pmin, g.chunk
    nv = max(pmin * chunk, pmaj * chunk)

    # uniform windows across devices (shapes must match under shard_map):
    # choose from the union of all local edges
    alls, alld = [], []
    for i in range(pmaj):
        for j in range(pmin):
            s, d, _ = _valid_edges(blocks, i, j)
            alls.append(s)
            alld.append(d)
    s_all = np.concatenate(alls) if alls else np.zeros(0, np.int64)
    d_all = np.concatenate(alld) if alld else np.zeros(0, np.int64)
    if transpose:
        s_all, d_all = d_all, s_all
    if len(s_all):
        from cugraph_tpu.kernels.spmm_onehot import DEFAULT_YBV, _round_up
        ybv = max(_round_up(min(DEFAULT_YBV, _round_up(nv, 512)), 512), 512)
        w_src, w_dst = choose_windows(s_all, d_all, nv, ybv)
    else:
        w_src = w_dst = 512

    # uniform tile_subs across shards (stacking needs one static shape);
    # SpMM caps at 64 (in-kernel buffers scale with ts×F)
    max_m = max(len(_valid_edges(blocks, i, j)[0])
                for i in range(pmaj) for j in range(pmin))
    ts = auto_tile_subs(max(max_m // 128, 1), cap=64)
    plans = []
    for i in range(pmaj):
        for j in range(pmin):
            s, d, w = _valid_edges(blocks, i, j)
            if transpose:
                s, d = d, s
            plans.append(build_spmm_plan(s, d, None if unit_weights else w,
                                         nv, w_src=w_src, w_dst=w_dst,
                                         tile_subs=ts))
    T = max(p.num_tiles for p in plans)
    meta = plans[0]
    padded = [_pad_tiles((np.asarray(p.src_rel), np.asarray(p.dst_rel),
                          np.asarray(p.weight), np.asarray(p.xwin),
                          np.asarray(p.yblk)), T, meta.n_yblocks, ts)
              for p in plans]

    def stk(k):
        return jnp.asarray(np.stack([p[k] for p in padded]).reshape(
            (pmaj, pmin) + padded[0][k].shape))

    return StackedSpmmPlan(
        src_rel=stk(0), dst_rel=stk(1), weight=stk(2), xwin=stk(3),
        yblk=stk(4), num_vertices=nv, pad_v=meta.pad_v, w_src=w_src,
        w_dst=w_dst, ybv=meta.ybv, n_yblocks=meta.n_yblocks, num_tiles=T,
        tile_subs=ts, split_safe=all(p.split_safe for p in plans))


# -- per-DistGraph cache (weakref'd, sharded at first use) -------------------

_cache: list = []


def _get(g, key, builder, mesh=None, shard=True):
    # cache rows hold WEAKREFS to both the graph and the mesh: a plan
    # device_put for one mesh must never serve another (id() can alias
    # after garbage collection; identity via weakref cannot)
    global _cache
    _cache = [(r, k, mr, p) for (r, k, mr, p) in _cache
              if r() is not None and (mr is None or mr() is not None)]
    for r, k, mr, p in _cache:
        if (r() is g and k == key
                and (mr() if mr is not None else None) is mesh):
            return p
    # plans may be requested lazily inside a jit trace (g closed over as a
    # constant); force eager evaluation so jnp ops build concrete arrays
    with jax.ensure_compile_time_eval():
        p = builder()
    if mesh is not None and shard:
        from jax.sharding import NamedSharding

        from cugraph_tpu.parallel.mesh import edge_spec

        sh = NamedSharding(mesh, edge_spec())
        p = jax.tree.map(lambda a: jax.device_put(a, sh), p)
    _cache.append((weakref.ref(g), key,
                   weakref.ref(mesh) if mesh is not None else None, p))
    return p


def mg_use_pallas(g) -> bool:
    import os

    from cugraph_tpu.kernels.dispatch import pallas_min_edges
    from cugraph_tpu.kernels.spmv_onehot import spmv_available

    if os.environ.get("CUGRAPH_TPU_DISABLE_PALLAS"):
        return False
    return spmv_available() and g.num_edges >= pallas_min_edges()


def get_stacked_spmv_plan(g, mesh, orientation="pull") -> StackedSpmvPlan:
    return _get(g, ("spmv", orientation),
                lambda: build_stacked_spmv_plan(g, orientation), mesh)


def get_stacked_spmm_plan_unit(g, mesh, orientation="pull") -> StackedSpmmPlan:
    """Unit-weight stacked SpMM plan (Brandes / multi-source BFS panels)."""
    return _get(g, ("spmm_unit", orientation),
                lambda: build_stacked_spmm_plan(g, orientation,
                                                unit_weights=True), mesh)


def get_stacked_spmm_plans(g, mesh, orientation="pull"):
    """(forward, transpose) SpmmPlan pair for differentiable MG SpMM."""
    fwd = _get(g, ("spmm", orientation, False),
               lambda: build_stacked_spmm_plan(g, orientation), mesh)
    bwd = _get(g, ("spmm", orientation, True),
               lambda: build_stacked_spmm_plan(g, orientation, transpose=True),
               mesh)
    return fwd, bwd


def get_mg_spmm_fn(g, mesh, orientation="pull"):
    """Cached differentiable MG Pallas SpMM callable for (g, mesh)."""

    def builder():
        from cugraph_tpu.parallel.nn import mg_spmm_pallas_fn

        fwd, bwd = get_stacked_spmm_plans(g, mesh, orientation)
        return mg_spmm_pallas_fn(mesh, g.pmaj, g.pmin, g.chunk, fwd, bwd)

    return _get(g, ("spmm_fn", orientation), builder, mesh, shard=False)
