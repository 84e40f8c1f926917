"""Dispatch helpers: choose the Pallas one-hot SpMV on TPU, XLA elsewhere.

Pull/push plans are built once per Graph and cached on the object (the same
lifecycle as the reference's lazily-built SGGraph, simpleGraph.py:1376).
"""

from __future__ import annotations

import os

import numpy as np

# edge count above which the Pallas kernel pays for its compile time
PALLAS_MIN_EDGES = 200_000


def pallas_min_edges() -> int:
    return int(os.environ.get("CUGRAPH_TPU_PALLAS_MIN_EDGES",
                              PALLAS_MIN_EDGES))


def pallas_enabled(num_edges: int) -> bool:
    """Single source of truth for the Pallas fast-path gate."""
    from cugraph_tpu.kernels.spmv_onehot import spmv_available

    if os.environ.get("CUGRAPH_TPU_DISABLE_PALLAS"):
        return False
    return spmv_available() and num_edges >= pallas_min_edges()


def use_pallas(G) -> bool:
    return pallas_enabled(G.number_of_edges())


def spill_budget_bytes():
    """Per-invocation HBM budget for edge-tile plans.  Above it the plan
    spills to host and streams (kernels/spill.py — the large_buffer_manager
    analog, reference large_buffer_manager.hpp:28-60).  Explicit via
    CUGRAPH_TPU_SPILL_BYTES; else half the device limit when known."""
    v = os.environ.get("CUGRAPH_TPU_SPILL_BYTES")
    if v:
        return int(v)
    from cugraph_tpu.utils.memory import device_memory_stats

    limit = device_memory_stats()["bytes_limit"]
    if limit and limit > 0:
        return int(limit * 0.5)
    return None


def plan_needs_spill(G) -> bool:
    budget = spill_budget_bytes()
    if budget is None:
        return False
    from cugraph_tpu.kernels.spmv_onehot import estimate_plan_bytes

    src, dst, _ = G.edgelist_arrays()
    return estimate_plan_bytes(src, dst, G.number_of_vertices()) > budget


def get_pull_plan_spilled(G):
    """Host-resident chunked pull plan (cached)."""
    plan = getattr(G, "_spmv_plan_pull_spilled", None)
    if plan is None:
        from cugraph_tpu.kernels.spill import build_spilled_spmv_plan

        budget = spill_budget_bytes() or (256 << 20)
        src, dst, w = G.edgelist_arrays()
        plan = build_spilled_spmv_plan(
            src, dst, w, G.number_of_vertices(),
            max_chunk_bytes=max(budget // 4, 1 << 20))
        G._spmv_plan_pull_spilled = plan
    return plan


AUTOTUNE_MIN_EDGES = 1_000_000  # below this the default windows are fine


def _plan_windows(src, dst, n):
    """Autotuned (src_win, dst_win) for big graphs (estimate_windows cost
    model); defaults otherwise.  CUGRAPH_TPU_AUTOTUNE=0 disables."""
    from cugraph_tpu.kernels.spmv_onehot import (DST_WIN, SRC_WIN,
                                                 estimate_windows)

    if (len(src) < AUTOTUNE_MIN_EDGES
            or os.environ.get("CUGRAPH_TPU_AUTOTUNE") == "0"):
        return SRC_WIN, DST_WIN
    return estimate_windows(src, dst, n)


def get_pull_plan(G):
    """Plan computing y[dst] = Σ w·x[src] (the pull SpMV)."""
    plan = getattr(G, "_spmv_plan_pull", None)
    if plan is None:
        from cugraph_tpu.kernels.spmv_onehot import build_spmv_plan

        src, dst, w = G.edgelist_arrays()
        n = G.number_of_vertices()
        sw, dw = _plan_windows(src, dst, n)
        plan = build_spmv_plan(src, dst, w, n, src_win=sw, dst_win=dw)
        G._spmv_plan_pull = plan
    return plan


def get_push_plan(G, max_tile_subs: int | None = None,
                  yb_rows: int | None = None):
    """Plan computing y[src] = Σ w·x[dst] (the push SpMV = pull on Aᵀ).

    ``max_tile_subs`` / ``yb_rows`` shrink the kernel's scoped-VMEM
    footprint for the gather="dst" kernels (eqsel argmax recovery): their
    x operand is Y-BLOCK shaped, so at the default yb_rows=8192 the
    x + y-in + y-out blocks alone hit Mosaic's 16 MB scoped limit on
    RMAT-20-sized plans (measured 16.19-16.38 MB, a clean compile error,
    nearly independent of tile_subs).  Constrained plans are cached
    separately; the default plan is reused when it already satisfies the
    constraints."""
    plan = getattr(G, "_spmv_plan_push", None)
    if plan is not None and \
            (max_tile_subs is None or plan.tile_subs <= max_tile_subs) and \
            (yb_rows is None or plan.yb_rows <= yb_rows):
        return plan
    if max_tile_subs is None and yb_rows is None:
        key = None
    else:
        # constrained variants live in a DICT that Graph.__init__/clear()
        # resets (a dynamic attribute would survive clear() → stale plan)
        key = ("push", max_tile_subs, yb_rows)
        aux = getattr(G, "_spmv_plan_aux", None)
        if aux is None:
            aux = {}
            try:
                G._spmv_plan_aux = aux
            except AttributeError:
                pass
        if key in aux:
            return aux[key]
    if plan is None or key is not None:
        from cugraph_tpu.kernels.spmv_onehot import (DEFAULT_YB_ROWS,
                                                     build_spmv_plan)

        src, dst, w = G.edgelist_arrays()
        n = G.number_of_vertices()
        sw, dw = _plan_windows(dst, src, n)
        plan = build_spmv_plan(dst, src, w, n, src_win=sw, dst_win=dw,
                               tile_subs=max_tile_subs,
                               yb_rows=(DEFAULT_YB_ROWS if yb_rows is None
                                        else yb_rows))
        if key is None:
            G._spmv_plan_push = plan
        else:
            aux[key] = plan
    return plan


def get_sym_pull_plan(G):
    """Pull plan over the symmetrized edge set (for WCC/undirected sweeps).
    Undirected graphs already store both directions, so this is the pull plan;
    directed graphs get a dedicated both-ways plan (cached separately)."""
    if not G.is_directed():
        return get_pull_plan(G)
    plan = getattr(G, "_spmv_plan_sym", None)
    if plan is None:
        import numpy as np

        from cugraph_tpu.kernels.spmv_onehot import build_spmv_plan

        src, dst, w = G.edgelist_arrays()
        s2 = np.concatenate([src, dst])
        d2 = np.concatenate([dst, src])
        w2 = None if w is None else np.concatenate([w, w])
        plan = build_spmv_plan(s2, d2, w2, G.number_of_vertices())
        G._spmv_plan_sym = plan
    return plan


def out_weight_vectors(G, pad_v: int):
    """(inv_out_weight, is_dangling) host vectors sized to the plan."""
    src, dst, w = G.edgelist_arrays()
    n = G.number_of_vertices()
    out_w = np.bincount(src, weights=w, minlength=pad_v)[:pad_v] \
        .astype(np.float32)
    inv_out = np.divide(1.0, out_w, out=np.zeros_like(out_w),
                        where=out_w > 0).astype(np.float32)
    is_dang = (np.arange(pad_v) < n) & (out_w <= 0)
    return inv_out, is_dang


def per_v_random_select(G, key, *, interpret: bool = False):
    """One uniformly-random OUT-neighbor per vertex (int32 [pad_v]; -1 where
    a vertex has no out-edges) — the TPU fast path for the reference's
    per_v_random_select_transform_outgoing_e sampling primitive
    (prims/per_v_random_select_transform_outgoing_e.cuh).

    Two semiring passes over the push plan, no gathers:
      1. reduce=max / combine="right" over per-edge random priorities
         (gather side skipped entirely — scatter-only cost);
      2. reduce=max / combine="eqsel" at precision="split3": where the
         gathered per-vertex maximum equals an edge's priority, the value is
         the neighbor's absolute id, reconstructed in-kernel.
    Exact-equality soundness needs BIT-exact selections: split3 (3 bf16
    limbs) provides them at 3 matmul passes vs "highest"'s 6 (see
    spmv_onehot._sel); ids stay exact in f32 below 2^24 vertices.
    """
    import dataclasses

    import jax
    import jax.numpy as jnp

    from cugraph_tpu.kernels.spmv_onehot import SEMIRING_BIG, spmv_onehot

    # kernel-src = graph-dst: selection per SOURCE.  yb_rows halved + ts
    # capped at 64: the eqsel gather="dst" pass blocks x BY Y BLOCKS, and
    # at yb_rows=8192 its x + y-in + y-out blocks alone hit the 16 MB
    # scoped-VMEM limit on RMAT-20 plans (measured 16.19 MB at ts=64).  At
    # 2 dispatches/call the extra grid steps cost ~0.3 ms.  NOTE: a graph
    # using both push SpMV (yb=8192) and selection therefore keeps TWO
    # O(E) device plans alive — a deliberate VMEM-for-HBM trade (2× plan
    # residency ≈ 4 GB at RMAT-20 of the 16 GB HBM); call
    # G._spmv_plan_aux.clear() to evict constraint variants if HBM-bound.
    plan = get_push_plan(G, max_tile_subs=64, yb_rows=4096)
    if plan.pad_v >= (1 << 24):
        raise ValueError("per_v_random_select requires < 2^24 vertices "
                         "(f32-exact id reconstruction)")
    pri = jax.random.uniform(key, plan.weight.shape, jnp.float32,
                             minval=1e-6, maxval=1.0)
    w_pri = jnp.where(jnp.isnan(plan.weight), jnp.nan, pri)
    p2 = dataclasses.replace(plan, weight=w_pri)
    zeros = jnp.zeros((p2.pad_v,), jnp.float32)
    y1 = spmv_onehot(p2, zeros, reduce="max", combine="right",
                     precision="split3", interpret=interpret)
    y2 = spmv_onehot(p2, y1, reduce="max", combine="eqsel", gather="dst",
                     precision="split3", interpret=interpret)
    has = y1 > -SEMIRING_BIG / 2
    return jnp.where(has, y2.astype(jnp.int32), -1)
