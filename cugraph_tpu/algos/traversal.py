"""Traversal: BFS, SSSP, k-hop neighborhoods.

Reference: cpp/src/traversal/{bfs_impl.cuh:133-875, sssp_impl.cuh:571,
k_hop_nbrs_impl.cuh:220}; Python wrappers python/cugraph/cugraph/traversal/.

TPU design: both BFS and SSSP pick a per-iteration regime ON DEVICE inside a
jitted ``lax.while_loop`` — a sparse frontier-packed expansion (static gather
budget) when the active set is small, a dense one-hot-MXU sweep otherwise.
BFS mirrors the reference's m_f/m_u direction-optimizing switch
(bfs_impl.cuh:291-300); SSSP mirrors the near/far delta-stepping buckets
(sssp_impl.cuh:75-153) with a pending-bitmap + moving threshold instead of
device-side bucket queues.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from cugraph_tpu.algos._utils import unrenumber_column, normalize_start
from cugraph_tpu.core.structure import GraphStructure
from cugraph_tpu.prims.frontier import frontier_expand_by_dst
from cugraph_tpu.prims.vertex_edge import (
    gather_minor,
    gather_major,
    segment_reduce_by_major,
)

INT32_INF = np.iinfo(np.int32).max
F32_INF = np.float32(np.finfo(np.float32).max)


@partial(jax.jit, static_argnames=("depth_limit",))
def _bfs_kernel(g: GraphStructure, source: jax.Array, depth_limit: int):
    pad_v = g.pad_v
    n = g.num_vertices
    real = jnp.arange(pad_v) < n
    ids = jnp.arange(pad_v)

    dist0 = jnp.where(ids == source, 0, INT32_INF).astype(jnp.int32)
    pred0 = jnp.full((pad_v,), -1, dtype=jnp.int32)
    frontier0 = ids == source

    def body(state):
        dist, pred, frontier, level = state
        nxt, p = frontier_expand_by_dst(g, frontier, (dist == INT32_INF) & real)
        dist = jnp.where(nxt, level + 1, dist)
        pred = jnp.where(nxt, p, pred)
        return dist, pred, nxt, level + 1

    def cond(state):
        _, _, frontier, level = state
        return jnp.any(frontier) & (level < depth_limit)

    dist, pred, _, _ = jax.lax.while_loop(
        cond, body, (dist0, pred0, frontier0, jnp.int32(0))
    )
    return dist, pred


# direction-optimizing regime caps: a level goes top-down when the frontier
# fits K vertices and its out-edge count fits E_TD slots — then the sparse
# expansion costs O(E_TD) gathers instead of the dense O(E) sweep (the
# reference's m_f/m_u switch, bfs_impl.cuh:291-300, host-free on TPU)
_TD_K = 4096
_TD_E = 65536


@partial(jax.jit, static_argnames=("depth_limit", "n", "use_plan",
                                   "interpret"))
def _bfs_kernel_diropt(g: GraphStructure, plan, source: jax.Array,
                       depth_limit: int, n: int, use_plan: bool,
                       interpret: bool = False):
    """Direction-optimizing BFS: lax.cond between a sparse top-down level
    (static-budget frontier expansion over CSR out-edges) and the dense
    bottom-up-shaped sweep (Pallas one-hot when use_plan, XLA otherwise).

    Reference: traversal/bfs_impl.cuh:291-300,490-602 — the same two regimes,
    chosen per level, with the heuristic evaluated on device (no host sync).
    """
    pad_v = g.pad_v if not use_plan else plan.pad_v
    ids = jnp.arange(pad_v)
    real = ids < n
    K = min(_TD_K, pad_v)
    E_TD = min(_TD_E, int(g.csr.pad_e))
    offsets = g.csr.offsets
    indices = g.csr.indices

    dist0 = jnp.where(ids == source, 0, INT32_INF).astype(jnp.int32)
    pred0 = jnp.full((pad_v,), -1, dtype=jnp.int32)
    mask0 = ids == source

    deg_all = (offsets[1:] - offsets[:-1]).astype(jnp.int32)
    if pad_v > g.pad_v:
        deg_all = jnp.pad(deg_all, (0, pad_v - g.pad_v))
    elif pad_v < g.pad_v:
        deg_all = deg_all[:pad_v]

    def sparse_level(state):
        dist, pred, mask, level = state
        flist = jnp.nonzero(mask, size=K, fill_value=pad_v - 1)[0]
        fvalid = jnp.arange(K) < jnp.sum(mask)
        fdeg = jnp.where(fvalid, jnp.take(deg_all, flist), 0)
        cum = jnp.cumsum(fdeg)
        total = cum[-1]
        e = jnp.arange(E_TD)
        i = jnp.searchsorted(cum, e, side="right")
        i_c = jnp.clip(i, 0, K - 1)
        srcv = jnp.take(flist, i_c)
        base = jnp.take(offsets, jnp.clip(srcv, 0, g.pad_v - 1))
        prev = jnp.take(cum, i_c) - jnp.take(fdeg, i_c)
        eidx = base + (e - prev)
        live = e < total
        dstv = jnp.take(indices, jnp.clip(eidx, 0, indices.shape[0] - 1))
        dstv = jnp.where(live, dstv, pad_v - 1).astype(jnp.int32)
        fresh = live & (jnp.take(dist, dstv) == INT32_INF) & \
            jnp.take(real, dstv)
        sink = pad_v - 1
        idx = jnp.where(fresh, dstv, sink)
        newmask = jnp.zeros(pad_v, jnp.bool_).at[idx].max(fresh)
        newmask = newmask & real & (dist == INT32_INF)
        pred = pred.at[idx].max(jnp.where(fresh, srcv, -1))
        pred = jnp.where(newmask, pred, jnp.where(dist == INT32_INF, -1, pred))
        dist = jnp.where(newmask, level + 1, dist)
        return dist, pred, newmask, level + 1

    if use_plan:
        from cugraph_tpu.kernels.spmv_onehot import spmv_onehot

        # The dense sweep propagates the 0/1 frontier MASK, not vertex-id
        # payloads: 0/1 values are exact in bf16, so the fast 2-limb split
        # stays sound at ANY vertex count.  (Selecting ids in-kernel needs
        # the 3-limb split past 2^16 vertices — measured 20.9 vs 13.2 ms/iter
        # at RMAT-20, bench_semirings_tpu.py — and the 2-limb id select
        # CORRUPTED predecessors by ±4 at 2^20.)  Predecessors for
        # dense-reached vertices stay -1 here and are recovered host-side
        # (_bfs_pred_host), the same split as SSSP's _sssp_pred_host.
        def dense_level(state):
            dist, pred, mask, level = state
            y = spmv_onehot(plan, mask.astype(jnp.float32),
                            reduce="max", combine="left", precision="split",
                            interpret=interpret)
            reached = (y > 0.5) & (dist == INT32_INF) & real
            dist = jnp.where(reached, level + 1, dist)
            return dist, pred, reached, level + 1
    else:
        def dense_level(state):
            dist, pred, mask, level = state
            nxt, p = frontier_expand_by_dst(g, mask,
                                            (dist == INT32_INF) & real)
            dist = jnp.where(nxt, level + 1, dist)
            pred = jnp.where(nxt, p, pred)
            return dist, pred, nxt, level + 1

    def body(state):
        dist, pred, mask, level = state
        fcount = jnp.sum(mask)
        m_f = jnp.sum(jnp.where(mask, deg_all, 0))
        top_down = (fcount <= K) & (m_f <= E_TD)
        return jax.lax.cond(top_down, sparse_level, dense_level, state)

    def cond(state):
        _, _, mask, level = state
        return jnp.any(mask) & (level < depth_limit)

    dist, pred, _, _ = jax.lax.while_loop(cond, body,
                                          (dist0, pred0, mask0, jnp.int32(0)))
    return dist, pred


@partial(jax.jit, static_argnames=("unit", "atol", "rtol", "interpret"))
def _pred_recover_device(plan, x, unit: bool, atol: float, rtol: float,
                         interpret: bool = False):
    """Device-side predecessor recovery: ONE eqsel_rel semiring pass gives
    pred[v] = max in-neighbor u with x[u] + w(u,v) ≈ x[v] (the same
    max-id-parent convention as the sparse path's .at[].max and the host
    engines).  Replaces the O(E) host pass (~0.7 s at RMAT-20) with a
    ~split3 SpMV (~tens of ms) — the parent-tree half of graph500's timed
    region.  ``unit=True`` rides unit weights (BFS: x[u] + 1 == x[v])."""
    import dataclasses

    from cugraph_tpu.kernels.spmv_onehot import spmv_onehot

    if unit:
        plan = dataclasses.replace(
            plan, weight=jnp.where(jnp.isnan(plan.weight), jnp.nan, 1.0))
    return spmv_onehot(plan, x.astype(jnp.float32), reduce="max",
                       combine="eqsel_rel", precision="split3",
                       eq_atol=atol, eq_rtol=rtol, interpret=interpret)


def _bfs_pred_host(G, dist: np.ndarray, pred: np.ndarray, source: int,
                   n: int) -> np.ndarray:
    """Fill predecessors the dense sweep left at -1: any in-neighbor u with
    dist[u] + 1 == dist[v] (max id, matching the sparse path's .at[].max).
    One vectorized host pass over the edge list — the BFS analog of
    _sssp_pred_host."""
    missing = (pred < 0) & (dist > 0) & (dist < INT32_INF)
    missing[source] = False
    if not missing.any():
        return pred
    src, dst, _ = G.edgelist_arrays()
    out = pred.astype(np.int64, copy=True)
    from cugraph_tpu.core.native import bfs_pred_from_dist_native

    if bfs_pred_from_dist_native(src, dst, np.asarray(dist, np.int32), out):
        return out  # engine fills exactly the missing slots
    ds = dist[src].astype(np.int64)  # int64: INT32_INF + 1 must not wrap
    match = (ds + 1 == dist[dst]) & missing[dst]
    # MAX-id parent, the documented convention (matches the native engine,
    # the device eqsel recovery, and the sparse .at[].max path — the
    # last-edge-wins assignment it replaces made cross-engine predecessor
    # trees differ on edge-order; round-5 review finding)
    np.maximum.at(out, dst[match], src[match])
    return out


def bfs(G, start=None, depth_limit=None, source=None, return_distances=True,
        i_start=None, directed=None, return_predecessors=True):
    """BFS from ``start``; returns ['distance', 'vertex', 'predecessor'].

    Unreachable vertices get distance 2**31-1 and predecessor -1, matching the
    reference C API convention (bfs_impl.cuh / bfs.pyx).
    """
    from cugraph_tpu.kernels.dispatch import get_pull_plan, use_pallas

    if directed is not None:
        raise TypeError(
            "'directed' cannot be specified for a Graph-type input")
    if start is None:
        start = source if source is not None else i_start
    if start is None:
        raise ValueError("bfs requires a start vertex")
    s = int(normalize_start(G, start)[0])
    n = G.number_of_vertices()
    dl = int(depth_limit) if depth_limit is not None else n
    from cugraph_tpu.kernels.spmv_onehot import SEMIRING_BIG, SpmvPlan

    device_pred = None
    if use_pallas(G):
        plan = get_pull_plan(G)
        dist, pred = _bfs_kernel_diropt(G.structure, plan, jnp.int32(s), dl,
                                        n, True)
        if (return_predecessors and isinstance(plan, SpmvPlan)
                and plan.pad_v < (1 << 24)):
            # unit-weight relaxation equality: dist[u] + 1 == dist[v]
            # (integer levels — exact in f32, atol only guards the split
            # reconstruction of the BIG unreached sentinel)
            device_pred = _pred_recover_device(plan, dist, True, 0.25, 0.0)
    else:
        dist, pred = _bfs_kernel_diropt(G.structure, None, jnp.int32(s), dl,
                                        n, False)
    dist = np.asarray(dist)[:n]
    if not return_predecessors:  # reference keeps the column, skips compute
        pred = np.full(n, -1, np.int64)
    elif device_pred is not None:
        y = np.asarray(device_pred)[:n]
        good = (dist > 0) & (dist < INT32_INF) & (y > -SEMIRING_BIG / 2)
        pred = np.where(good, y, -1).astype(np.int64)
    else:
        pred = np.asarray(pred)[:n]
        pred = _bfs_pred_host(G, dist, pred, s, n)
    return pd.DataFrame({
        "distance": dist,
        "vertex": G.number_map.to_external(np.arange(n)),
        "predecessor": unrenumber_column(G, pred, sentinel=-1),
    })


@partial(jax.jit, static_argnames=("n", "use_plan", "interpret"))
def _sssp_kernel_nearfar(g: GraphStructure, plan, source: jax.Array,
                         delta: jax.Array, n: int, use_plan: bool,
                         interpret: bool = False):
    """Near/far delta-stepping SSSP (reference sssp_impl.cuh:75-153,246-247).

    TPU adaptation: instead of device-side bucket queues, a ``pending``
    bitmap (vertices whose out-edges still need relaxing) and a moving
    threshold T.  Per iteration, the active set = pending ∩ {dist < T}:
    * empty       → advance T to min(pending dist) + delta (never an
                    empty bucket, unlike fixed-stride bucket walks);
    * small       → sparse relaxation of just the active vertices'
                    out-edges (frontier-packed CSR gather, static budget —
                    the same regime machinery as _bfs_kernel_diropt);
    * large       → dense masked (min,+) sweep: sources outside the
                    active set contribute the semiring identity.
    Each relaxation that improves a vertex re-marks it pending, so labels
    are corrected exactly; the bucket order only reduces wasted sweeps.
    """
    from cugraph_tpu.kernels.spmv_onehot import SEMIRING_BIG, spmv_onehot

    pad_v = plan.pad_v if use_plan else g.pad_v
    ids = jnp.arange(pad_v)
    real = ids < n
    BIG = jnp.float32(SEMIRING_BIG)
    K = min(_TD_K, pad_v)
    E_TD = min(_TD_E, int(g.csr.pad_e))
    offsets = g.csr.offsets
    indices = g.csr.indices
    weights = g.csr.weights

    deg_all = (offsets[1:] - offsets[:-1]).astype(jnp.int32)
    if pad_v > g.pad_v:
        deg_all = jnp.pad(deg_all, (0, pad_v - g.pad_v))
    elif pad_v < g.pad_v:
        deg_all = deg_all[:pad_v]

    dist0 = jnp.where(ids == source, 0.0, BIG).astype(jnp.float32)
    pending0 = ids == source
    T0 = jnp.maximum(delta, jnp.float32(1e-30))

    def advance(state):
        dist, pending, T, it = state
        lo = jnp.min(jnp.where(pending, dist, BIG))
        return dist, pending, lo + delta, it + 1

    def sparse_relax(state):
        dist, pending, T, it = state
        active = pending & (dist < T)
        flist = jnp.nonzero(active, size=K, fill_value=pad_v - 1)[0]
        fvalid = jnp.arange(K) < jnp.sum(active)
        fdeg = jnp.where(fvalid, jnp.take(deg_all, flist), 0)
        cum = jnp.cumsum(fdeg)
        total = cum[-1]
        e = jnp.arange(E_TD)
        i = jnp.searchsorted(cum, e, side="right")
        i_c = jnp.clip(i, 0, K - 1)
        srcv = jnp.take(flist, i_c)
        base = jnp.take(offsets, jnp.clip(srcv, 0, g.pad_v - 1))
        prev = jnp.take(cum, i_c) - jnp.take(fdeg, i_c)
        eidx = jnp.clip(base + (e - prev), 0, indices.shape[0] - 1)
        live = e < total
        dstv = jnp.where(live, jnp.take(indices, eidx), pad_v - 1)
        cand = jnp.where(live, jnp.take(dist, srcv) + jnp.take(weights, eidx),
                         BIG)
        new_dist = dist.at[jnp.clip(dstv, 0, pad_v - 1)].min(cand)
        new_dist = jnp.where(real, new_dist, BIG)
        improved = new_dist < dist
        pending = (pending & ~active) | improved
        return new_dist, pending, T, it + 1

    if use_plan:
        def dense_relax(state):
            dist, pending, T, it = state
            active = pending & (dist < T)
            x = jnp.where(active, dist, BIG)
            y = spmv_onehot(plan, x, reduce="min", combine="add",
                            precision="split", interpret=interpret)
            new_dist = jnp.minimum(dist, jnp.where(real, y, BIG))
            improved = new_dist < dist
            pending = (pending & ~active) | improved
            return new_dist, pending, T, it + 1
    else:
        csc = g.csc

        def dense_relax(state):
            dist, pending, T, it = state
            active = pending & (dist < T)
            x = jnp.where(active, dist, BIG)
            du = gather_minor(csc, x)
            cand = jnp.where(du < BIG, du + csc.weights, BIG)
            best = segment_reduce_by_major(csc, cand, "min")
            new_dist = jnp.minimum(dist, jnp.where(real, best, BIG))
            improved = new_dist < dist
            pending = (pending & ~active) | improved
            return new_dist, pending, T, it + 1

    def body(state):
        dist, pending, T, it = state
        active = pending & (dist < T)
        n_act = jnp.sum(active)
        m_f = jnp.sum(jnp.where(active, deg_all, 0))
        branch = jnp.where(n_act == 0, 0,
                           jnp.where((n_act <= K) & (m_f <= E_TD), 1, 2))
        return jax.lax.switch(branch, [advance, sparse_relax, dense_relax],
                              state)

    def cond(state):
        _, pending, _, it = state
        return jnp.any(pending) & (it < 4 * n + 16)

    dist, _, _, _ = jax.lax.while_loop(
        cond, body, (dist0, pending0, T0, jnp.int32(0)))
    return dist


def _sssp_delta(G) -> float:
    """Reference delta heuristic (sssp_impl.cuh:233-247):
    delta = 32 · average_edge_weight / average_vertex_degree."""
    src, _, w = G.edgelist_arrays()
    m = len(src)
    n = G.number_of_vertices()
    if m == 0 or n == 0:
        return 1.0
    avg_w = 1.0 if w is None else float(np.mean(w))
    avg_deg = m / n
    d = 32.0 * avg_w / max(avg_deg, 1e-30)
    return d if d > 0 else 1.0


def _sssp_pred_host(G, dist32: np.ndarray, source: int, n: int) -> np.ndarray:
    """Predecessors from converged f32 distances, vectorized on host: any
    in-neighbor u with dist[u] + w ≈ dist[v].  The kernel's split-bf16
    selection reconstructs values to ~2^-17 relative, so matching uses a
    small relative tolerance rather than exact equality — tight enough
    (2e-5 covers 2^-17 with ~2.5x margin) that every accepted parent also
    passes the graph500 validator's 1e-5/1e-4 rule-3 check."""
    src, dst, w = G.edgelist_arrays()
    w = np.ones(len(src), np.float32) if w is None else w.astype(np.float32)
    ds = dist32[src]
    dd = dist32[dst]
    reach_e = (ds < F32_INF / 2) & (dd < F32_INF / 2)
    tol = 1e-6 + 2e-5 * np.abs(dd)
    match = reach_e & (np.abs(ds + w - dd) <= tol)
    pred = np.full(n, -1, np.int64)
    np.maximum.at(pred, dst[match], src[match])
    pred[source] = -1
    pred[dist32[:n] >= F32_INF / 2] = -1
    return pred


def sssp(G, source=None, method=None, directed=None,
         return_predecessors=None, unweighted=None, overwrite=None,
         indices=None, cutoff=None):
    """Single-source shortest paths (nonnegative weights).
    Returns ['distance', 'vertex', 'predecessor']; unreachable = FLT_MAX.
    Reference: sssp_impl.cuh:571 (directed/unweighted/overwrite/indices are
    the reference wrapper's deprecated legacy-API params)."""
    from cugraph_tpu.kernels.dispatch import get_pull_plan, use_pallas

    if directed is not None:
        raise TypeError(
            "'directed' cannot be specified for a Graph-type input")
    if method not in (None, "auto", "delta-stepping", "dijkstra", "bf"):
        # also catches pre-rename positional callers: the old signature was
        # sssp(G, source, cutoff=...) with cutoff third
        raise ValueError(f"invalid sssp method: {method!r}")
    if source is None:
        source = indices  # legacy name
    if source is None:
        raise ValueError("sssp requires a source vertex")
    s = int(normalize_start(G, source)[0])
    n = G.number_of_vertices()
    if G.is_weighted():
        src_, dst_, w_ = G.edgelist_arrays()
        if w_ is not None and np.any(w_ < 0):
            raise ValueError("sssp requires non-negative weights")
    from cugraph_tpu.kernels.spmv_onehot import SEMIRING_BIG

    from cugraph_tpu.kernels.spmv_onehot import SpmvPlan

    delta = jnp.float32(_sssp_delta(G))
    device_pred = None
    if use_pallas(G):
        plan = get_pull_plan(G)
        ddev = _sssp_kernel_nearfar(G.structure, plan, jnp.int32(s),
                                    delta, n, True)
        if isinstance(plan, SpmvPlan) and plan.pad_v < (1 << 24):
            # dist[u] + w ≈ dist[v]: the converged fixpoint's residual is
            # only the forward sweep's split-gather error (~2^-17 relative),
            # so 2e-5 rtol finds the true parent with margin — and stays a
            # STRICT subset of the graph500 validator's 1e-5/1e-4 acceptance
            # (a looser recovery tol can argmax onto a near-parent that the
            # validator then rejects — observed at RMAT-18 with 1e-4/1e-4)
            device_pred = _pred_recover_device(plan, ddev, False, 1e-6, 2e-5)
        d32 = np.asarray(ddev)
    else:
        d32 = np.asarray(_sssp_kernel_nearfar(G.structure, None, jnp.int32(s),
                                              delta, n, False))
    dist32 = np.where(d32 >= SEMIRING_BIG / 2, F32_INF, d32).astype(np.float32)
    if device_pred is not None:
        y = np.asarray(device_pred)[:n]
        reached = dist32[:n] < F32_INF / 2
        good = reached & (np.arange(n) != s) & (y > -SEMIRING_BIG / 2)
        pred = np.where(good, y, -1).astype(np.int64)
        if np.any(reached & (np.arange(n) != s) & ~good):
            # rare tolerance stragglers: fall back to the host matcher
            pred = _sssp_pred_host(G, dist32, s, n)
    else:
        pred = _sssp_pred_host(G, dist32, s, n)
    dist = dist32[:n].astype(np.float64)
    if cutoff is not None:
        over = dist > cutoff
        dist[over] = np.float64(F32_INF)
        pred[over] = -1
    return pd.DataFrame({
        "distance": dist,
        "vertex": G.number_map.to_external(np.arange(n)),
        "predecessor": unrenumber_column(G, pred, sentinel=-1),
    })


def shortest_path_length(G, source, target=None):
    df = sssp(G, source) if G.is_weighted() else bfs(G, source)
    df = df.rename(columns={"distance": "distance"})
    if target is not None:
        row = df[df["vertex"] == target]
        if row.empty:
            raise ValueError(f"target {target!r} not in graph")
        return float(row["distance"].iloc[0])
    return df[["vertex", "distance"]]


def filter_unreachable(df: pd.DataFrame) -> pd.DataFrame:
    """Drop unreachable rows (reference: cugraph/traversal/traveral utils)."""
    d = df["distance"]
    if np.issubdtype(d.dtype, np.integer):
        return df[d != INT32_INF].reset_index(drop=True)
    return df[d < np.float64(F32_INF)].reset_index(drop=True)


@partial(jax.jit, static_argnames=("k",))
def _khop_kernel(g: GraphStructure, seed_mask: jax.Array, k: int):
    """Vertices within exactly <=k hops (excluding unreachable)."""
    reach = seed_mask

    def body(i, reach):
        src_r = gather_minor(g.csc, reach)
        hit = segment_reduce_by_major(g.csc, src_r.astype(jnp.int32), "max") > 0
        return reach | hit

    return jax.lax.fori_loop(0, k, body, reach)


def k_hop_neighbors(G, start, k: int):
    """k-hop neighborhood of start vertices.  Returns a DataFrame
    ['vertex'] of all OTHER vertices within k hops — the starts themselves
    are ALWAYS excluded (NetworkX ``cutoff`` convention minus the seeds;
    for undirected graphs any seed with an edge trivially "returns to
    itself" in 2 hops, so a cycle-inclusion rule would re-add every seed).
    The reference's C-level k_hop_nbrs (k_hop_nbrs_impl.cuh:220) returns
    the EXACTLY-k frontier per start instead — a per-start shape this
    within-k set deliberately diverges from (no python-level twin exists
    in the reference to match)."""
    g = G.structure
    n = G.number_of_vertices()
    seeds = normalize_start(G, start)
    mask0 = np.zeros(g.pad_v, dtype=bool)
    mask0[seeds] = True
    reach = np.array(_khop_kernel(g, jnp.asarray(mask0), int(k)))[:n]
    reach[seeds[seeds < n]] = False
    verts = np.nonzero(reach)[0]
    return pd.DataFrame({"vertex": G.number_map.to_external(verts)})


def extract_bfs_paths(G, distances_df: pd.DataFrame, destinations) -> pd.DataFrame:
    """Reconstruct root→destination paths from a BFS result frame.

    Reference: traversal/extract_bfs_paths_impl.cuh (kv-gather walk up the
    predecessor chain); python cugraph.utilities.path_retrieval.
    Returns a frame ['destination', 'path_offset'] plus a flat 'vertex_paths'
    array padded with -1 (the reference's max_path_length convention).
    """
    df = distances_df.sort_values("vertex")
    vertices = df["vertex"].to_numpy()
    pred = df["predecessor"].to_numpy()
    dist = df["distance"].to_numpy()
    lut_pred = dict(zip(vertices.tolist(), pred.tolist()))
    lut_dist = dict(zip(vertices.tolist(), dist.tolist()))

    def _reachable(dv):
        # BFS encodes unreachable as INT32_MAX, SSSP as FLT_MAX (the
        # reference C API conventions) — treat both like infinity
        return (dv is not None and np.isfinite(dv) and 0 <= dv < INT32_INF
                and dv < np.float64(F32_INF) / 2)

    destinations = np.asarray(destinations).reshape(-1)
    # walk every chain FIRST, then size the row width by the longest chain:
    # the hop count of a weighted (SSSP) frame is unrelated to the numeric
    # distance (dist 0.5 can be two hops), so sizing by int(max dist)+1
    # overflowed the row (round-5 review finding).  Chains are bounded by
    # the vertex count (acyclic predecessor trees ground out).
    chains = [None] * len(destinations)
    cap = len(vertices) + 1
    for r, d in enumerate(destinations):
        if not _reachable(lut_dist.get(d)):
            continue
        cur, chain = d, []
        while cur is not None and cur != -1 and len(chain) <= cap:
            chain.append(cur)
            nxt = lut_pred.get(cur, -1)
            cur = None if nxt == -1 or nxt is None else nxt
        chains[r] = chain
    max_len = max((len(c) for c in chains if c is not None), default=1)
    paths = np.full((len(destinations), max_len), -1, dtype=np.int64)
    for r, chain in enumerate(chains):
        if chain is not None:
            paths[r, : len(chain)] = chain[::-1]
    return pd.DataFrame({
        "destination": destinations,
        "path_offset": np.arange(len(destinations)) * max_len,
    }), paths.reshape(-1), max_len


@partial(jax.jit, static_argnames=("n",))
def _msbfs_dist_batched(g: GraphStructure, sources: jax.Array, n: int):
    """Hop distances from a PANEL of sources ([pad_v, B] int32, -1 =
    unreached / padding column): one masked sum-SpMM per level discovers
    every column's next ring simultaneously (same panel design as the
    batched Brandes forward sweep in algos/centrality.py)."""
    from cugraph_tpu.prims.vertex_edge import (gather_minor,
                                               segment_reduce_by_major)

    pad_v = g.pad_v
    varange = jnp.arange(pad_v)
    src1h = varange[:, None] == sources[None, :]
    real = (varange < n)[:, None]
    dist0 = jnp.where(src1h, jnp.int32(0), jnp.int32(-1))

    def body(state):
        dist, level, _ = state
        frontier = (dist == level).astype(jnp.float32)
        hit = segment_reduce_by_major(g.csc, gather_minor(g.csc, frontier),
                                      "sum")
        newly = (hit > 0) & (dist == -1) & real
        dist = jnp.where(newly, level + 1, dist)
        return dist, level + 1, jnp.any(newly)

    dist, _, _ = jax.lax.while_loop(
        lambda st: st[2] & (st[1] < n), body,
        (dist0, jnp.int32(0), jnp.bool_(True)))
    return dist


@partial(jax.jit, static_argnames=("n",))
def _msbfs_dist_batched_pallas(pull_plan, sources: jax.Array, n: int):
    """Panel BFS through the one-hot SpMM kernel (TPU fast path)."""
    from cugraph_tpu.kernels.spmm_onehot import spmm_onehot

    pad_v = pull_plan.pad_v
    varange = jnp.arange(pad_v)
    src1h = varange[:, None] == sources[None, :]
    real = (varange < n)[:, None]
    dist0 = jnp.where(src1h, jnp.int32(0), jnp.int32(-1))

    def body(state):
        dist, level, _ = state
        frontier = (dist == level).astype(jnp.float32)
        hit = spmm_onehot(pull_plan, frontier, precision="split")
        newly = (hit > 0) & (dist == -1) & real
        dist = jnp.where(newly, level + 1, dist)
        return dist, level + 1, jnp.any(newly)

    dist, _, _ = jax.lax.while_loop(
        lambda st: st[2] & (st[1] < n), body,
        (dist0, jnp.int32(0), jnp.bool_(True)))
    return dist


@partial(jax.jit, static_argnames=("n",))
def _msbfs_dist_serial_device(plan, sources: jax.Array, n: int):
    """Multi-source BFS as a DEVICE-RESIDENT serial loop: fori_loop over
    the sources, each a dense level-sweep through the one-hot SpMV kernel
    at bf16 ``precision="default"`` — exact for 0/1 frontier masks (unit
    one-hot products, f32 accumulation of small integers).  One dispatch,
    [pad_v, S] int32 out (−1 unreached).

    Why this exists next to the [pad_v, 128] panel (``_msbfs_dist_batched_
    pallas``): the panel SpMM's per-edge cost scales with the panel width
    and its plan fragments on large id spaces (padding factor 28.5 at
    RMAT-20 vs the SpMV plan's 1.07) — measured 3.2× FASTER serial at
    RMAT-20 (4.52 s vs 14.59 s for 64 sources, benchmarks/graph500_bfs.py
    --device), while the panel wins at RMAT-18 and below where its plan
    stays dense.  ``multi_source_bfs(strategy="auto")`` picks by the
    measured crossover."""
    from cugraph_tpu.kernels.spmv_onehot import spmv_onehot

    pad_v = plan.pad_v
    varange = jnp.arange(pad_v)
    real = varange < n
    S = sources.shape[0]

    def key_body(kidx, dist_all):
        root = sources[kidx]
        dist0 = jnp.where(varange == root, 0, -1).astype(jnp.int32)
        # padding slots (root == -1) never match a vertex: all-(-1) column

        def body(st):
            dist, level, _ = st
            frontier = (dist == level).astype(jnp.float32)
            hit = spmv_onehot(plan, frontier, precision="default")
            newly = (hit > 0) & (dist == -1) & real
            return (jnp.where(newly, level + 1, dist), level + 1,
                    jnp.any(newly))

        dist, _, _ = jax.lax.while_loop(
            lambda st: st[2] & (st[1] < n), body,
            (dist0, jnp.int32(0), jnp.bool_(root >= 0)))
        return dist_all.at[:, kidx].set(dist)

    return jax.lax.fori_loop(0, S, key_body,
                             jnp.full((pad_v, S), -1, jnp.int32))


@partial(jax.jit, static_argnames=("n",))
def _mssssp_dist_batched(g: GraphStructure, sources: jax.Array, n: int):
    """Weighted distances from a PANEL of sources: batched Bellman-Ford —
    each round relaxes every edge for all columns at once via a (min,+)
    segment reduce.  Returns [pad_v, B] f32 with F32_INF-scale BIG for
    unreached."""
    from cugraph_tpu.kernels.spmv_onehot import SEMIRING_BIG as BIG

    from cugraph_tpu.prims.vertex_edge import (gather_minor,
                                               segment_reduce_by_major)

    pad_v = g.pad_v
    varange = jnp.arange(pad_v)
    src1h = varange[:, None] == sources[None, :]
    dist0 = jnp.where(src1h, 0.0, BIG).astype(jnp.float32)

    def body(state):
        dist, it, _ = state
        val = gather_minor(g.csc, dist) + g.csc.weights[:, None]
        cand = segment_reduce_by_major(g.csc, jnp.minimum(val, BIG), "min")
        new = jnp.minimum(dist, cand)
        return new, it + 1, jnp.any(new < dist)

    dist, _, _ = jax.lax.while_loop(
        lambda st: st[2] & (st[1] < n), body,
        (dist0, jnp.int32(0), jnp.bool_(True)))
    return dist


@partial(jax.jit, static_argnames=("n",))
def _mssssp_dist_batched_pallas(pull_plan, sources: jax.Array, n: int):
    """Panel Bellman-Ford through the (min,+) one-hot SpMM kernel."""
    from cugraph_tpu.kernels.spmm_onehot import spmm_onehot
    from cugraph_tpu.kernels.spmv_onehot import SEMIRING_BIG as BIG

    pad_v = pull_plan.pad_v
    varange = jnp.arange(pad_v)
    src1h = varange[:, None] == sources[None, :]
    dist0 = jnp.where(src1h, 0.0, BIG).astype(jnp.float32)

    def body(state):
        dist, it, _ = state
        cand = spmm_onehot(pull_plan, dist, reduce="min", combine="add",
                           precision="split")
        new = jnp.minimum(dist, cand)
        # split precision: require a meaningful improvement to iterate
        return new, it + 1, jnp.any(new < dist - 1e-6 * jnp.abs(dist))

    dist, _, _ = jax.lax.while_loop(
        lambda st: st[2] & (st[1] < n), body,
        (dist0, jnp.int32(0), jnp.bool_(True)))
    return dist


def od_shortest_distances(G, origins, destinations) -> pd.DataFrame:
    """All origin→destination shortest distances (reference
    traversal/od_shortest_distances_impl.cuh:426).  Runs 128-origin panels
    through one batched multi-source sweep per panel: unweighted = level BFS
    (sum-SpMM), weighted = Bellman-Ford ((min,+) SpMM on TPU, batched
    segment-min elsewhere).  Returns ['origin', 'destination', 'distance']."""
    from cugraph_tpu.algos._utils import normalize_start, source_panels
    from cugraph_tpu.kernels.dispatch import use_pallas
    from cugraph_tpu.kernels.spmv_onehot import SEMIRING_BIG as BIG

    origins = np.asarray(origins).reshape(-1)
    destinations = np.asarray(destinations).reshape(-1)
    _, _, w = G.edgelist_arrays()
    o_int = normalize_start(G, origins)
    d_int = normalize_start(G, destinations)
    n = G.number_of_vertices()
    g = G.structure
    fast = use_pallas(G)
    # unweighted origins sweep serially on device past the panel-plan
    # fragmentation crossover (see multi_source_bfs strategy="auto")
    serial = False
    if fast:
        if w is None:
            from cugraph_tpu.api.convenience import _MSBFS_SERIAL_EDGES

            serial = g.csr.num_edges > _MSBFS_SERIAL_EDGES
            if serial:
                from cugraph_tpu.kernels.dispatch import get_pull_plan

                pull_plan = get_pull_plan(G)
            else:
                from cugraph_tpu.algos.centrality import \
                    _get_brandes_spmm_plan

                pull_plan = _get_brandes_spmm_plan(G, "pull")
        else:
            from cugraph_tpu.kernels.spmm_onehot import (
                get_structure_spmm_plan,
            )

            pull_plan = get_structure_spmm_plan(g)

    # [len(d_int), len(o_int)] distance matrix, assembled panel-by-panel
    cols = []
    for panel, _, count in source_panels(o_int):
        if w is None:
            if serial:
                dist = np.asarray(_msbfs_dist_serial_device(
                    pull_plan, jnp.asarray(panel), n))
            else:
                dist = np.asarray(
                    _msbfs_dist_batched_pallas(pull_plan,
                                               jnp.asarray(panel), n)
                    if fast else _msbfs_dist_batched(g, jnp.asarray(panel),
                                                     n))
            blk = dist[np.ix_(d_int, np.arange(count))].astype(np.float64)
            blk = np.where(blk >= 0, blk, F32_INF)
        else:
            dist = np.asarray(
                _mssssp_dist_batched_pallas(pull_plan, jnp.asarray(panel), n)
                if fast else _mssssp_dist_batched(g, jnp.asarray(panel), n))
            blk = dist[np.ix_(d_int, np.arange(count))].astype(np.float64)
            # unreachable = FLT_MAX (the sssp/C-API convention)
            blk = np.where(blk < BIG / 2, blk, F32_INF)
        cols.append(blk)
    dmat = (np.hstack(cols) if cols
            else np.zeros((len(d_int), 0), np.float64))
    return pd.DataFrame({
        "origin": np.repeat(origins, len(destinations)),
        "destination": np.tile(destinations, len(origins)),
        "distance": dmat.T.reshape(-1),
    })
