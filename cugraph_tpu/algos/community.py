"""Community detection: Louvain, Leiden, ECG, triangle count, k-truss,
egonet, spectral clustering + clustering quality metrics.

Reference: cpp/src/community/ — louvain_impl.cuh:138-339 (level loop:
local moves via per_v_transform_reduce_dst_key_aggregated_outgoing_e +
coarsen_graph), leiden_impl.cuh:694, ecg_impl.cuh:148,
triangle_count_impl.cuh:124, k_truss_impl.cuh:166, egonet_impl.cuh:212,
legacy/spectral_clustering.cu; shared kernels community/detail/
common_methods.cuh:205-462.

TPU design notes:
* The reference aggregates per-vertex edge weights by destination cluster
  with cuco GPU hash maps (common_methods.cuh:295,402).  Here the same
  aggregation is a 2-key ``lax.sort`` by (src, cluster[dst]) + run-boundary
  segment sums — sorting is the TPU-native grouping device (no hash tables).
* Oscillation control copies the reference's up/down alternation
  (update_by_delta_modularity's up_down flag): even sweeps only allow moves
  to lower cluster ids, odd sweeps to higher.
* Coarsening (graph contraction) happens host-side between levels — level
  count is tiny and shapes shrink, which would otherwise force recompiles.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from cugraph_tpu.algos._utils import vertex_frame
from cugraph_tpu.core.structure import padded_vertex_count, round_up


# ==========================================================================
# Louvain
# ==========================================================================

@partial(jax.jit, static_argnames=("pad_v",))
def _louvain_move_sweep(src, dst, w, cluster, up_down, resolution, pad_v: int):
    """One parallel local-moving sweep.  Arrays are padded COO (pad entries
    src=dst=pad_v-1, w=0).  Returns the updated cluster assignment."""
    m2 = jnp.sum(w)  # == 2m with the doubled-self-loop convention
    k = jax.ops.segment_sum(w, src, num_segments=pad_v)
    sigma = jax.ops.segment_sum(jnp.take(k, jnp.arange(pad_v)), cluster,
                                num_segments=pad_v)

    cd = jnp.take(cluster, dst)
    # group edges by (src, dst-cluster): 2-key sort + run detection
    s_s, cd_s, d_s, w_s = jax.lax.sort((src, cd, dst, w), num_keys=2)
    first = jnp.concatenate([
        jnp.ones((1,), jnp.bool_),
        (s_s[1:] != s_s[:-1]) | (cd_s[1:] != cd_s[:-1]),
    ])
    run = jnp.cumsum(first.astype(jnp.int32)) - 1
    E = src.shape[0]
    w_vc_edges = jnp.where(s_s == d_s, 0.0, w_s)  # exclude self-loops
    W = jax.ops.segment_sum(w_vc_edges, run, num_segments=E,
                            indices_are_sorted=True)
    run_v = jax.ops.segment_max(s_s, run, num_segments=E, indices_are_sorted=True)
    run_c = jax.ops.segment_max(cd_s, run, num_segments=E, indices_are_sorted=True)
    nruns = run[-1] + 1
    valid_run = (jnp.arange(E) < nruns) & (run_v < pad_v - 1)

    kv = jnp.take(k, jnp.clip(run_v, 0, pad_v - 1))
    cur = jnp.take(cluster, jnp.clip(run_v, 0, pad_v - 1))
    sig_c = jnp.take(sigma, jnp.clip(run_c, 0, pad_v - 1))
    sig_adj = sig_c - jnp.where(run_c == cur, kv, 0.0)
    gain = W - resolution * kv * sig_adj / jnp.maximum(m2, 1e-30)

    # stay value per vertex: gain of its own-cluster run (0 if none)
    W_stay = jax.ops.segment_sum(
        jnp.where(valid_run & (run_c == cur), W, 0.0),
        jnp.clip(run_v, 0, pad_v - 1), num_segments=pad_v)
    sig_cur = jnp.take(sigma, cluster)
    f_stay = W_stay - resolution * k * (sig_cur - k) / jnp.maximum(m2, 1e-30)

    # up/down alternation (reference common_methods.cuh update_by_delta_modularity)
    direction_ok = jnp.where(up_down, run_c > cur, run_c < cur)
    cand = valid_run & direction_ok & (run_c != cur)
    NEG = jnp.float32(-1e30)
    g_m = jnp.where(cand, gain, NEG)
    best_gain = jax.ops.segment_max(g_m, jnp.clip(run_v, 0, pad_v - 1),
                                    num_segments=pad_v)
    # pick the smallest cluster id achieving the best gain (deterministic)
    is_best = cand & (g_m >= jnp.take(best_gain, jnp.clip(run_v, 0, pad_v - 1)) - 0.0)
    BIG = jnp.int32(2 ** 30)
    best_c = jax.ops.segment_min(jnp.where(is_best, run_c, BIG),
                                 jnp.clip(run_v, 0, pad_v - 1),
                                 num_segments=pad_v)
    improve = (best_gain > f_stay + 1e-9) & (best_c < BIG)
    new_cluster = jnp.where(improve, best_c, cluster)
    # keep padding rows in their own cluster
    ids = jnp.arange(pad_v)
    new_cluster = jnp.where(ids >= pad_v - 1, ids, new_cluster)
    return new_cluster


@partial(jax.jit, static_argnames=("pad_v",))
def _modularity(src, dst, w, cluster, resolution, pad_v: int):
    # epsilon guard: an edgeless graph would otherwise yield NaN, which
    # also defeats the convergence break (NaN <= x is False) — round-5
    # review finding
    m2 = jnp.maximum(jnp.sum(w), 1e-30)
    intra = jnp.sum(jnp.where(jnp.take(cluster, src) == jnp.take(cluster, dst), w, 0.0))
    k = jax.ops.segment_sum(w, src, num_segments=pad_v)
    sigma = jax.ops.segment_sum(k, cluster, num_segments=pad_v)
    return intra / m2 - resolution * jnp.sum((sigma / m2) ** 2)


def _pad_coo(src, dst, w, n):
    pad_v = padded_vertex_count(n)
    sink = pad_v - 1
    pe = max(round_up(len(src), 128), 128)
    s = np.full(pe, sink, np.int32); s[:len(src)] = src
    d = np.full(pe, sink, np.int32); d[:len(dst)] = dst
    ww = np.zeros(pe, np.float32); ww[:len(w)] = w
    return jnp.asarray(s), jnp.asarray(d), jnp.asarray(ww), pad_v


def _louvain_one_level_native(src, dst, w, n, resolution, max_sweeps,
                              threshold, init):
    """Native threaded level loop: same sweep semantics as the jitted path
    (snapshot moves, up/down alternation, keep-if-modularity-improves), with
    the per-sweep (src, cluster[dst]) grouping done by the C++ engine and
    modularity in float64 NumPy."""
    from cugraph_tpu.core.native import (coarsen_edges_native,
                                         louvain_sweep_native)

    # identity-label contraction = one counting-sort pass that both sorts
    # by src AND merges parallel edges (all cluster-level sums, hence
    # modularity, are exactly preserved) — replaces an argsort of the COO
    agg = coarsen_edges_native(src.astype(np.int32), dst.astype(np.int32),
                               w, n)
    if agg is None:          # per-call native failure (nonzero rc): the
        return None, None    # caller falls back to the jitted level loop
    src, dst, w = agg
    ds = dst
    dw = w
    row_off = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(src, minlength=n), out=row_off[1:])

    w64 = w.astype(np.float64)
    m2 = max(w64.sum(), 1e-30)
    k = np.bincount(src, weights=w64, minlength=n)

    def modularity(cl):
        intra = w64[cl[src] == cl[dst]].sum()
        sigma = np.bincount(cl, weights=k, minlength=n)
        return intra / m2 - resolution * np.sum((sigma / m2) ** 2)

    cluster = (np.arange(n, dtype=np.int32) if init is None
               else np.asarray(init, np.int32).copy())
    best_q = modularity(cluster)
    up_down = True
    for sweep in range(max_sweeps):
        cluster2 = louvain_sweep_native(ds, dw, row_off, cluster, up_down,
                                        resolution)
        if cluster2 is None:
            break            # keep the best clustering found so far
        q2 = modularity(cluster2)
        up_down = not up_down
        if q2 > best_q + threshold:
            best_q, cluster = q2, cluster2
        elif sweep >= 1:
            break
    return cluster, float(best_q)


def _louvain_one_level(src, dst, w, n, resolution, max_sweeps=20, threshold=1e-7,
                       init=None):
    """Local-moving until the sweep stops improving modularity.
    Host-controlled sweep loop, jitted sweeps (native threaded C++ sweeps
    when the toolchain is available).  ``init`` optionally seeds the
    assignment (Leiden level loop: coarse vertices start in their parent
    communities, leiden_impl.cuh level state)."""
    from cugraph_tpu.core.native import get_lib

    if get_lib() is not None and n > 0 and len(src):
        cl, q = _louvain_one_level_native(np.asarray(src), np.asarray(dst),
                                          np.asarray(w, np.float32), n,
                                          resolution, max_sweeps, threshold,
                                          init)
        if cl is not None:     # None = per-call native failure → jit path
            return cl, q
    s, d, ww, pad_v = _pad_coo(src, dst, w, n)
    if init is None:
        cluster = jnp.arange(pad_v, dtype=jnp.int32)
    else:
        c0 = np.arange(pad_v, dtype=np.int32)
        c0[:n] = np.asarray(init, np.int32)
        cluster = jnp.asarray(c0)
    best_q = float(_modularity(s, d, ww, cluster, resolution, pad_v))
    up_down = True
    for sweep in range(max_sweeps):
        cluster2 = _louvain_move_sweep(s, d, ww, cluster, jnp.bool_(up_down),
                                       jnp.float32(resolution), pad_v)
        q2 = float(_modularity(s, d, ww, cluster2, resolution, pad_v))
        up_down = not up_down
        if q2 > best_q + threshold:
            best_q, cluster = q2, cluster2
        elif sweep >= 1:
            break
    return np.asarray(cluster)[:n], best_q


def _coarsen(src, dst, w, labels):
    """Contract clusters host-side (reference coarsen_graph,
    cpp/src/structure/coarsen_graph_impl.cuh).  Label compaction via
    bincount (labels are dense cluster ids — no sort needed); edge
    aggregation via native counting sorts, falling back to the NumPy
    key-sort path."""
    labels = np.asarray(labels)
    n_lab = int(labels.max()) + 1 if len(labels) else 0
    present = np.bincount(labels, minlength=n_lab) > 0
    remap = np.cumsum(present) - 1
    nc = int(remap[-1]) + 1 if n_lab else 0
    compact = remap[labels].astype(np.int32)
    cs = compact[src]
    cd = compact[dst]

    from cugraph_tpu.core.native import coarsen_edges_native

    nat = coarsen_edges_native(cs, cd, w, nc)
    if nat is not None:
        osrc, odst, ow = nat
        return osrc, odst, ow, nc, compact

    key = cs.astype(np.int64) * nc + cd
    order = np.argsort(key, kind="stable")
    key_s = key[order]; w_s = w[order]
    uk, start = np.unique(key_s, return_index=True)
    wagg = np.add.reduceat(w_s, start)
    return (uk // nc).astype(np.int32), (uk % nc).astype(np.int32), \
        wagg.astype(np.float32), nc, compact.astype(np.int32)


def _louvain_levels(G, max_level, resolution, threshold):
    src, dst, w = G.edgelist_arrays()
    n = G.number_of_vertices()
    w = np.ones(len(src), np.float32) if w is None else w.astype(np.float32)
    # doubled-self-loop convention so k_v = segment_sum(w by src) is exact
    w = np.where(src == dst, 2.0 * w, w)

    labels = np.arange(n, dtype=np.int32)   # fine-level assignment
    q_prev = -np.inf
    q = -np.inf
    for level in range(max_level):
        lab, q = _louvain_one_level(src, dst, w, n, resolution,
                                    threshold=threshold)
        src, dst, w, n, compact = _coarsen(src, dst, w, lab)
        # labels: original vertex -> current-level vertex; compact maps
        # current-level vertex -> coarse vertex
        labels = compact[labels]
        if q <= q_prev + threshold:
            break
        q_prev = q
    return labels, float(q)


def louvain(G, max_level: int = 100, max_iter=None, resolution: float = 1.0,
            threshold: float = 1e-7):
    """Louvain community detection (reference louvain_impl.cuh:339).
    Returns (DataFrame ['vertex','partition'], modularity)."""
    if G.is_directed():
        raise ValueError("louvain requires an undirected graph")
    if max_iter is not None:
        max_level = max_iter
    labels, q = _louvain_levels(G, max_level, resolution, threshold)
    # compact partition ids
    _, compact = np.unique(labels, return_inverse=True)
    df = vertex_frame(G, {"partition": compact.astype(np.int32)})
    return df, q


@partial(jax.jit, static_argnames=("pad_v",))
def _leiden_refine_sweep(src, dst, w, comm_v, refined, key, theta, resolution,
                         pad_v: int):
    """One parallel randomized-refinement sweep (reference refine_impl.cuh):
    singleton vertices merge into sub-communities WITHIN their community,
    targets sampled ∝ exp(gain/θ) via the Gumbel-max trick (stateless —
    jax.random per sweep), gated on the Leiden well-connectedness conditions
    for both the vertex and the target sub-community.  Moves go to smaller
    sub-community ids only, so concurrent merges form decreasing pointer
    chains the caller resolves by path compression."""
    m2 = jnp.sum(w)
    ids = jnp.arange(pad_v)
    k = jax.ops.segment_sum(w, src, num_segments=pad_v)
    K_C = jax.ops.segment_sum(k, comm_v, num_segments=pad_v)
    sigma_r = jax.ops.segment_sum(k, refined, num_segments=pad_v)
    cnt_r = jax.ops.segment_sum(jnp.ones_like(k), refined, num_segments=pad_v)

    same = (jnp.take(comm_v, src) == jnp.take(comm_v, dst)) & (src != dst)
    wi = jnp.where(same, w, 0.0)
    cut_v = jax.ops.segment_sum(wi, src, num_segments=pad_v)
    KC_v = jnp.take(K_C, comm_v)
    wc_v = cut_v >= resolution * k * (KC_v - k) / jnp.maximum(m2, 1e-30)

    # sub-community well-connectedness within its community
    cross = same & (jnp.take(refined, src) != jnp.take(refined, dst))
    cut_R = jax.ops.segment_sum(jnp.where(cross, w, 0.0),
                                jnp.take(refined, src), num_segments=pad_v)
    comm_R = jax.ops.segment_max(comm_v, refined, num_segments=pad_v)
    wc_R = cut_R >= resolution * sigma_r * \
        (jnp.take(K_C, jnp.clip(comm_R, 0, pad_v - 1)) - sigma_r) \
        / jnp.maximum(m2, 1e-30)

    singleton = (refined == ids) & (cnt_r <= 1.5)

    # group intra-community edges by (src, refined[dst])
    rd = jnp.where(same, jnp.take(refined, dst), pad_v - 1)
    s_s, rd_s, w_s = jax.lax.sort((src, rd, wi), num_keys=2)
    first = jnp.concatenate([
        jnp.ones((1,), jnp.bool_),
        (s_s[1:] != s_s[:-1]) | (rd_s[1:] != rd_s[:-1]),
    ])
    run = jnp.cumsum(first.astype(jnp.int32)) - 1
    E = src.shape[0]
    W = jax.ops.segment_sum(w_s, run, num_segments=E, indices_are_sorted=True)
    run_v = jax.ops.segment_max(s_s, run, num_segments=E,
                                indices_are_sorted=True)
    run_c = jax.ops.segment_max(rd_s, run, num_segments=E,
                                indices_are_sorted=True)
    nruns = run[-1] + 1
    run_v_c = jnp.clip(run_v, 0, pad_v - 1)
    run_c_c = jnp.clip(run_c, 0, pad_v - 1)
    valid = (jnp.arange(E) < nruns) & (run_v < pad_v - 1) & (run_c < pad_v - 1)

    kv = jnp.take(k, run_v_c)
    gain = W - resolution * kv * jnp.take(sigma_r, run_c_c) \
        / jnp.maximum(m2, 1e-30)
    cand = valid & (gain > 1e-12) \
        & jnp.take(singleton, run_v_c) & jnp.take(wc_v, run_v_c) \
        & jnp.take(wc_R, run_c_c) & (run_c < run_v)

    NEG = jnp.float32(-1e30)
    score = gain / jnp.maximum(theta, 1e-6) + jax.random.gumbel(key, (E,))
    sc = jnp.where(cand, score, NEG)
    best = jax.ops.segment_max(sc, run_v_c, num_segments=pad_v)
    is_best = cand & (sc >= jnp.take(best, run_v_c))
    BIG = jnp.int32(2 ** 30)
    best_c = jax.ops.segment_min(jnp.where(is_best, run_c, BIG), run_v_c,
                                 num_segments=pad_v)
    moved = (best > NEG / 2) & (best_c < BIG)
    out = jnp.where(moved, best_c, refined).astype(jnp.int32)

    # resolve decreasing pointer chains on device (moved-into-moved
    # targets): log-depth path compression, no host round-trip
    def _compress(state):
        r, _ = state
        r2 = jnp.take(r, r)
        return r2, jnp.any(r2 != r)

    out, _ = jax.lax.while_loop(lambda st: st[1], _compress,
                                (out, jnp.bool_(True)))
    return out


def _leiden_refine(src, dst, w, n, comm, resolution, theta, rng_key,
                   sweeps: int = 4):
    """Randomized refinement of `comm` (per-vertex community ids [n]).
    Returns refined sub-community labels [n] (each a vertex id root).
    Native threaded sweeps when the toolchain is available (counter-RNG
    Gumbel draws — distributionally equivalent to the jax stream)."""
    from cugraph_tpu.core.native import get_lib, leiden_refine_sweep_native

    if get_lib() is not None and n > 0 and len(src):
        order = np.argsort(src, kind="stable")
        ds = np.ascontiguousarray(np.asarray(dst)[order], np.int32)
        dw = np.ascontiguousarray(np.asarray(w, np.float32)[order])
        row_off = np.zeros(n + 1, np.int64)
        np.cumsum(np.bincount(src, minlength=n), out=row_off[1:])
        seed0 = int(np.asarray(jax.random.key_data(rng_key)).ravel()[-1])
        refined = np.arange(n, dtype=np.int32)
        comm32 = np.asarray(comm, np.int32)
        for i in range(sweeps):
            nxt = leiden_refine_sweep_native(
                ds, dw, row_off, comm32, refined, theta, resolution,
                seed0 * 0x9E3779B97F4A7C15 + i)
            if nxt is None:   # per-call native failure: keep what we have
                break
            refined = nxt
        return refined

    s, d, ww, pad_v = _pad_coo(src, dst, w, n)
    comm_full = np.arange(pad_v, dtype=np.int32)
    comm_full[:n] = comm
    comm_d = jnp.asarray(comm_full)
    refined = jnp.arange(pad_v, dtype=jnp.int32)
    for i in range(sweeps):
        key = jax.random.fold_in(rng_key, i)
        refined = _leiden_refine_sweep(s, d, ww, comm_d, refined, key,
                                       jnp.float32(theta),
                                       jnp.float32(resolution), pad_v)
    return np.asarray(refined)[:n]


def leiden(G, max_iter: int = 100, resolution: float = 1.0,
           random_state=None, theta: float = 1.0):
    """Leiden (reference leiden_impl.cuh:694): per level, Louvain local
    moving → randomized refinement (_leiden_refine_sweep — singleton merges
    sampled ∝ exp(gain/θ), well-connectedness gates) → coarsen by the REFINED
    partition with the next level seeded from parent communities.  A final
    connected-components split enforces the Leiden guarantee exactly.
    Returns (DataFrame ['vertex','partition'], modularity)."""
    if G.is_directed():
        raise ValueError("leiden requires an undirected graph")
    src0, dst0, w0 = G.edgelist_arrays()
    n0 = G.number_of_vertices()
    src, dst = src0, dst0
    w = np.ones(len(src), np.float32) if w0 is None else w0.astype(np.float32)
    w = np.where(src == dst, 2.0 * w, w)
    n = n0
    rng_key = jax.random.key(0 if random_state is None else int(random_state))

    vmap = np.arange(n0, dtype=np.int32)   # original -> current-level vertex
    comm_init = None
    best_labels = np.arange(n0, dtype=np.int64)
    q_prev = -np.inf
    for level in range(max_iter):
        lab, q = _louvain_one_level(src, dst, w, n, resolution,
                                    init=comm_init)
        if q <= q_prev + 1e-7 and level > 0:
            break
        q_prev = q
        best_labels = lab.astype(np.int64)[vmap]
        refined = _leiden_refine(src, dst, w, n, lab, resolution, theta,
                                 jax.random.fold_in(rng_key, level))
        src, dst, w, n, compact = _coarsen(src, dst, w, refined)
        # parent community of each coarse vertex (all members share lab)
        comm_coarse = np.zeros(n, np.int64)
        comm_coarse[compact] = lab
        _, comm_init = np.unique(comm_coarse, return_inverse=True)
        vmap = compact[vmap]
        if n <= 1:
            break

    # Leiden guarantee, enforced exactly: split disconnected communities
    import scipy.sparse as sp
    from scipy.sparse import csgraph
    keep = best_labels[src0] == best_labels[dst0]
    A = sp.csr_matrix((np.ones(int(keep.sum())), (src0[keep], dst0[keep])),
                      shape=(n0, n0))
    _, cc = csgraph.connected_components(A, directed=False)
    _, compact_f = np.unique(cc, return_inverse=True)
    df = vertex_frame(G, {"partition": compact_f.astype(np.int32)})
    wq = np.ones(len(src0), np.float32) if w0 is None \
        else np.asarray(w0, np.float32)
    # doubled-self-loop convention, matching louvain's level loop and
    # analyzeClustering_modularity (round-5 review: the final q diverged
    # from both on graphs with self-loops)
    wq = np.where(src0 == dst0, 2.0 * wq, wq)
    s, d, ww, pad_v = _pad_coo(src0, dst0, wq, n0)
    lab_full = np.zeros(pad_v, np.int32)
    lab_full[:n0] = compact_f
    q = float(_modularity(s, d, ww, jnp.asarray(lab_full),
                          jnp.float32(resolution), pad_v))
    return df, q


def ecg(G, min_weight: float = 0.05, ensemble_size: int = 16,
        max_level: int = 10, resolution: float = 1.0, threshold: float = 1e-7,
        random_state: int = 0):
    """Ensemble Clustering for Graphs (reference ecg_impl.cuh:148): run
    ``ensemble_size`` one-level Louvains with permuted vertex orders, reweight
    edges by co-cluster frequency, final full Louvain on the reweighted graph.
    Returns (DataFrame ['vertex','partition'], modularity)."""
    if G.is_directed():
        raise ValueError("ecg requires an undirected graph")
    src, dst, w0 = G.edgelist_arrays()
    n = G.number_of_vertices()
    w = np.ones(len(src), np.float32) if w0 is None else w0.astype(np.float32)
    rng = np.random.default_rng(random_state)
    votes = np.zeros(len(src), np.float64)

    from cugraph_tpu.core.native import (coarsen_edges_native,
                                         get_lib,
                                         louvain_sweep_native)

    if get_lib() is not None and len(src):
        # ensemble diversity = a random id RANK per member (exactly what
        # permuting vertex ids changes: direction filters + tie-breaks),
        # so every member reuses ONE sorted/aggregated graph
        agg_s, agg_d, agg_w = coarsen_edges_native(
            src.astype(np.int32), dst.astype(np.int32), w, n)
        row_off = np.zeros(n + 1, np.int64)
        np.cumsum(np.bincount(agg_s, minlength=n), out=row_off[1:])

        for e in range(ensemble_size):
            # the FORWARD permutation is the relabeling: sweep decisions on
            # perm-relabelled ids compare perm[c] (verified equal to the
            # fallback's permuted-graph run)
            rank = rng.permutation(n).astype(np.int32)
            cluster = np.arange(n, dtype=np.int32)
            # fixed 2-sweep schedule, no modularity gate: every accepted
            # move is individually gain-positive, so modularity is monotone
            # across sweeps and re-evaluating it (3 full-edge bincount
            # passes/member, ~0.9 s at RMAT-18) only implemented an
            # early-stop the reference doesn't have either (ecg_impl.cuh:148
            # runs fixed one-level members)
            for up_down in (True, False):
                nxt = louvain_sweep_native(agg_d, agg_w, row_off,
                                           cluster, up_down, resolution,
                                           rank=rank)
                if nxt is None:   # per-call native failure: partial member
                    break
                cluster = nxt
            votes += (cluster[src] == cluster[dst])
    else:
        for e in range(ensemble_size):
            perm = rng.permutation(n).astype(np.int32)
            lab, _ = _louvain_one_level(perm[src], perm[dst], w, n,
                                        resolution, max_sweeps=2,
                                        threshold=threshold)
            lab_orig = lab[perm]  # label of original v = lab[perm[v]]
            votes += (lab_orig[src] == lab_orig[dst])
    new_w = min_weight + (1.0 - min_weight) * (votes / ensemble_size)
    new_w = new_w.astype(np.float32)
    from cugraph_tpu.api.graph import Graph
    ext_s = G.number_map.to_external(src)
    ext_d = G.number_map.to_external(dst)
    G2 = Graph().from_edgelist(ext_s, ext_d, new_w)
    return louvain(G2, max_level=max_level, resolution=resolution,
                   threshold=threshold)


# ==========================================================================
# Triangles / k-truss
# ==========================================================================

def _edge_triangle_counts(G):
    """Per-directed-edge triangle support on the symmetrized adjacency,
    via the degree-oriented wedge engine (algos/_oriented_tri.py) — the
    reference's orientation trick that bounds every neighbor list by the
    max ORIENTED degree instead of the max raw (hub) degree."""
    from cugraph_tpu.algos._oriented_tri import directed_edge_support

    src, dst, _ = G.edgelist_arrays()
    n = G.number_of_vertices()
    _, counts = directed_edge_support(src, dst, n)
    return src, dst, counts


def triangle_count(G, start_list=None):
    """Per-vertex triangle counts (reference triangle_count_impl.cuh:124,
    degree-oriented wedge enumeration).  Returns ['vertex', 'counts']."""
    if G.is_directed():
        raise ValueError("triangle_count requires an undirected graph")
    from cugraph_tpu.algos._oriented_tri import directed_vertex_counts

    src, dst, _ = G.edgelist_arrays()
    n = G.number_of_vertices()
    per_v = directed_vertex_counts(src, dst, n)
    df = vertex_frame(G, {"counts": per_v[:n]})
    if start_list is not None:
        wanted = set(np.atleast_1d(np.asarray(start_list)).tolist())
        df = df[df["vertex"].isin(wanted)].reset_index(drop=True)
    return df


def ktruss_subgraph(G, k: int, use_weights=True):
    """Maximal subgraph where every edge is in >= k-2 triangles (reference
    k_truss_impl.cuh:166: iterative support peeling).  Returns a Graph."""
    if G.is_directed():
        raise ValueError("k_truss requires an undirected graph")
    from cugraph_tpu.algos._oriented_tri import oriented_wedge_counts
    from cugraph_tpu.api.graph import Graph

    # peel on host arrays (oriented engine per round); only the final
    # subgraph becomes a Graph — no per-iteration CSR rebuild.  Reduce to
    # unique undirected pairs ONCE (the symmetrized list holds each edge
    # twice); mirror kept weights back at the end.
    src, dst, w = G.edgelist_arrays()
    n = G.number_of_vertices()
    lo = np.minimum(src, dst).astype(np.int64)
    hi = np.maximum(src, dst).astype(np.int64)
    ukey, uidx = np.unique(lo * n + hi, return_index=True)
    noloop = (ukey // n) != (ukey % n)
    src = src[uidx][noloop]
    dst = dst[uidx][noloop]
    w = None if w is None else w[uidx][noloop]
    while True:
        _, cnt = oriented_wedge_counts(src, dst, n, need_edge_support=True)
        keep = cnt >= (k - 2)
        if keep.all() or not keep.any():
            break
        src, dst = src[keep], dst[keep]
        if w is not None:
            w = w[keep]
    if not keep.any():
        empty = np.array([], dtype=np.int64)
        return Graph().from_edgelist(empty, empty)
    return Graph().from_edgelist(G.number_map.to_external(src[keep]),
                                 G.number_map.to_external(dst[keep]),
                                 None if w is None else w[keep])


def k_truss(G, k: int):
    return ktruss_subgraph(G, k)


# ==========================================================================
# Egonet
# ==========================================================================

def batched_ego_graphs(G, seeds, radius: int = 1):
    """Induced subgraphs within ``radius`` hops of each seed (reference
    egonet_impl.cuh:212).  Returns (edge DataFrame
    ['src','dst','weight','seed'], seeds_offsets array)."""
    from cugraph_tpu.algos.traversal import _bfs_kernel
    g = G.structure
    seeds_arr = np.atleast_1d(np.asarray(seeds))
    internal = G.lookup_internal_vertex_id(seeds_arr)
    src, dst, w = G.edgelist_arrays()
    frames = []
    offsets = [0]
    total = 0
    for seed_ext, s in zip(seeds_arr, internal):
        dist, _ = _bfs_kernel(g, jnp.int32(int(s)), int(radius))
        dist = np.asarray(dist)[: G.number_of_vertices()]
        in_ego = dist <= radius
        keep = in_ego[src] & in_ego[dst]
        if not G.is_directed():
            keep &= src <= dst
        fr = pd.DataFrame({
            "src": G.number_map.to_external(src[keep]),
            "dst": G.number_map.to_external(dst[keep]),
            "weight": (w[keep] if w is not None else np.ones(keep.sum(), np.float32)),
            "seed": seed_ext,
        })
        frames.append(fr)
        total += len(fr)
        offsets.append(total)
    out = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
        columns=["src", "dst", "weight", "seed"])
    return out, np.asarray(offsets)


def egonet(G, seeds, radius: int = 1):
    return batched_ego_graphs(G, seeds, radius)


# ==========================================================================
# Spectral clustering + quality metrics
# ==========================================================================

def _adjacency_scipy(G):
    import scipy.sparse as sp
    src, dst, w = G.edgelist_arrays()
    n = G.number_of_vertices()
    vals = np.ones(len(src)) if w is None else w.astype(np.float64)
    return sp.csr_matrix((vals, (src, dst)), shape=(n, n))


def _kmeans(X, k, seed=0, iters=50):
    rng = np.random.default_rng(seed)
    # k-means++ init
    centers = [X[rng.integers(len(X))]]
    for _ in range(k - 1):
        d2 = np.min([((X - c) ** 2).sum(1) for c in centers], axis=0)
        if d2.sum() <= 0:  # fewer distinct rows than clusters: fall back
            centers.append(X[rng.integers(len(X))])
            continue
        p = d2 / d2.sum()
        centers.append(X[rng.choice(len(X), p=p)])
    C = np.stack(centers)
    for _ in range(iters):
        assign = np.argmin(((X[:, None, :] - C[None]) ** 2).sum(-1), axis=1)
        for j in range(k):
            pts = X[assign == j]
            if len(pts):
                C[j] = pts.mean(0)
    return assign


def spectralBalancedCutClustering(G, num_clusters: int, num_eigen_vects: int = 2,
                                  evs_tolerance=1e-5, evs_max_iter=1000,
                                  kmean_tolerance=1e-5, kmean_max_iter=100,
                                  seed: int = 0):
    """Balanced-cut spectral clustering on the normalized Laplacian
    (reference community/legacy/spectral_clustering.cu via raft::spectral —
    here scipy Lanczos + k-means; returns ['vertex','cluster'])."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spl
    A = _adjacency_scipy(G)
    A = (A + A.T) * 0.5
    n = A.shape[0]
    d = np.asarray(A.sum(axis=1)).ravel()
    dm = 1.0 / np.sqrt(np.maximum(d, 1e-12))
    L = sp.eye(n) - sp.diags(dm) @ A @ sp.diags(dm)
    k = max(num_eigen_vects, num_clusters)
    vals, vecs = spl.eigsh(L, k=min(k, n - 1), which="SM", tol=evs_tolerance,
                           maxiter=evs_max_iter * 10)
    X = vecs[:, :num_eigen_vects]
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    assign = _kmeans(X, num_clusters, seed=seed, iters=kmean_max_iter)
    return vertex_frame(G, {"cluster": assign.astype(np.int32)})


def spectralModularityMaximizationClustering(G, num_clusters: int,
                                             num_eigen_vects: int = 2,
                                             evs_tolerance=1e-5,
                                             evs_max_iter=1000,
                                             kmean_tolerance=1e-5,
                                             kmean_max_iter=100, seed: int = 0):
    """Modularity-maximization spectral clustering: leading eigenvectors of
    the modularity matrix B = A - k k^T / 2m (reference
    spectral_modularity_maximization.pyx)."""
    import scipy.sparse.linalg as spl
    A = _adjacency_scipy(G)
    A = (A + A.T) * 0.5
    n = A.shape[0]
    kdeg = np.asarray(A.sum(axis=1)).ravel()
    m2 = kdeg.sum()

    def matvec(x):
        return A @ x - kdeg * (kdeg @ x) / max(m2, 1e-30)

    import scipy.sparse as sp
    B = spl.LinearOperator((n, n), matvec=matvec, dtype=np.float64)
    vals, vecs = spl.eigsh(B, k=min(max(num_eigen_vects, num_clusters), n - 1),
                           which="LA", tol=evs_tolerance)
    X = vecs[:, :num_eigen_vects]
    assign = _kmeans(X, num_clusters, seed=seed, iters=kmean_max_iter)
    return vertex_frame(G, {"cluster": assign.astype(np.int32)})


def _cluster_arrays(G, df):
    n = G.number_of_vertices()
    internal = G.lookup_internal_vertex_id(df["vertex"].to_numpy())
    lab = np.zeros(n, np.int64)
    col = "cluster" if "cluster" in df.columns else "partition"
    lab[internal] = df[col].to_numpy()
    return lab


def analyzeClustering_modularity(G, n_clusters, df, vertex_col_name="vertex",
                                 cluster_col_name=None):
    """Modularity score of a clustering (reference analyze_clustering_modularity)."""
    src, dst, w = G.edgelist_arrays()
    n = G.number_of_vertices()
    w = np.ones(len(src), np.float32) if w is None else w
    lab = _cluster_arrays(G, df)
    s, d, ww, pad_v = _pad_coo(src, dst, np.where(src == dst, 2 * w, w), n)
    labp = np.zeros(pad_v, np.int32); labp[:n] = lab
    return float(_modularity(s, d, ww, jnp.asarray(labp), jnp.float32(1.0), pad_v))


def analyzeClustering_edge_cut(G, n_clusters, df, vertex_col_name="vertex",
                               cluster_col_name=None):
    src, dst, w = G.edgelist_arrays()
    w = np.ones(len(src)) if w is None else w
    lab = _cluster_arrays(G, df)
    cut = float(np.sum(np.where(lab[src] != lab[dst], w, 0.0))) / 2.0
    return cut


def analyzeClustering_ratio_cut(G, n_clusters, df, vertex_col_name="vertex",
                                cluster_col_name=None):
    src, dst, w = G.edgelist_arrays()
    w = np.ones(len(src)) if w is None else w
    lab = _cluster_arrays(G, df)
    total = 0.0
    for c in np.unique(lab):
        size = int((lab == c).sum())
        if size == 0:
            continue
        cut_c = float(np.sum(np.where((lab[src] == c) != (lab[dst] == c), w, 0.0))) / 2.0
        total += cut_c / size
    return total


def edge_triangle_count(G) -> pd.DataFrame:
    """Per-edge triangle counts (reference
    community/edge_triangle_count_impl.cuh).  Returns ['src','dst','counts']
    over the (symmetrized) edge list."""
    src, dst, counts = _edge_triangle_counts(G)
    nm = G.number_map
    return pd.DataFrame({
        "src": nm.to_external(src),
        "dst": nm.to_external(dst),
        "counts": np.asarray(counts).astype(np.int64),
    })


def approx_weighted_matching(G) -> pd.DataFrame:
    """Greedy half-approximation to maximum weight matching (reference
    community/approx_weighted_matching_impl.cuh:372 — locally-heaviest-edge
    rounds).  Returns ['vertex', 'partner'] (−1 when unmatched) and the
    matching weight."""
    src, dst, w = G.edgelist_arrays()
    n = G.number_of_vertices()
    if w is None:
        w = np.ones(len(src), np.float32)
    # locally-heaviest-edge rounds (Preis algorithm, host-side):
    order = np.argsort(-w, kind="stable")
    partner = np.full(n, -1, np.int64)
    total = 0.0
    for e in order:
        u, v = int(src[e]), int(dst[e])
        if u != v and partner[u] == -1 and partner[v] == -1:
            partner[u], partner[v] = v, u
            total += float(w[e])
    nm = G.number_map
    ext_partner = np.where(partner >= 0,
                           nm.to_external(np.maximum(partner, 0)), -1)
    return pd.DataFrame({"vertex": nm.to_external(np.arange(n)),
                         "partner": ext_partner}), total
