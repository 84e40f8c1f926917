"""Distributed Louvain over the 2D mesh.

Reference: community/louvain_impl.cuh:339 (per-level local moves via
per_v_transform_reduce_dst_key_aggregated_outgoing_e + cuco cluster→weight
maps, then coarsen_graph).  TPU decomposition:

* move phase (the scale bottleneck) fully distributed:
  1. per device: aggregate edge weights by (src, cluster[dst]) run —
     a LOCAL sort + segment-sum inside shard_map;
  2. route the partial (u, c, W) aggregates to u's owner with the
     fixed-capacity shuffle (parallel/shuffle.py — the kv_store/shuffle role);
  3. owner merges partials, computes modularity gains against replicated
     (k, σ) vectors, applies the up/down-alternating move rule
     (common_methods.cuh update_by_delta_modularity);
  4. σ recomputed with shuffle_reduce_by_key(cluster, k).
* coarsening: clusters shrink the graph by orders of magnitude after level 1,
  so contraction + deeper levels run on host/SG (the gathered coarse graph is
  tiny relative to the distributed edge set) — same observable behavior,
  distributed where it matters.

Two interchangeable engines for the per-device grouping work (the sweep's
cost center):

* ``engine="host"`` (default): each device's edge block is aggregated to
  (u, cluster[dst], ΣW) runs by the native counting-sort engine
  (core/_native/builder.cpp ``coarsen_edges``) on its OWNING host; only
  these aggregates — orders of magnitude fewer than edges — cross between
  owners.  This is the calibrated placement rule (COVERAGE.md): sort-shaped
  grouping belongs on the host, per-block and embarrassingly parallel
  across hosts on a pod.  Ids stay int32 end-to-end (no 2^24 float limit).
* ``engine="device"``: the original shard_map path (local lax.sort +
  segment-sum, fixed-capacity shuffle to owners, on-device move kernel).
  Kept because it is the zero-host-roundtrip variant; on current TPUs its
  sort/segment ops scalarize (~0.12 G elem/s), so it loses to the host
  engine — parity-tested against it.  Cluster ids ride its shuffle as
  float32 payloads → exact for |V| < 2^24.

Both engines implement the identical move rule (snapshot parallel sweep,
up/down direction filter, min-c tie break, gain > f_stay + 1e-9).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from cugraph_tpu.parallel import prims
from cugraph_tpu.parallel.mesh import edge_spec, vertex_spec
from cugraph_tpu.parallel.partition import DistGraph
from cugraph_tpu.parallel.shuffle import shuffle_reduce_by_key, shuffle_to_owners


@lru_cache(maxsize=16)
def _local_aggregate_kernel(mesh, pmaj, pmin, chunk):
    """Per-device (src, cluster[dst]) partial aggregation over push blocks.

    Emits (keys=u_global, payload=[cdst, W]) padded to the block's edge
    capacity, plus this device's intra-cluster weight partial."""
    B = pmin * chunk

    def kernel(gath, red, w, valid, cluster_full):
        gath_, red_, w_, valid_ = _s(gath), _s(red), _s(w), _s(valid)
        i = jax.lax.axis_index(prims.MAJOR)
        j = jax.lax.axis_index(prims.MINOR)
        E = gath_.shape[0]

        gdst = i * B + gath_                       # dst global id
        slot = red_                                 # src slot in [0, pmaj*chunk)
        u_global = ((slot // chunk) * pmin + j) * chunk + slot % chunk
        cdst = jnp.take(cluster_full, jnp.clip(gdst, 0, cluster_full.shape[0] - 1))
        csrc = jnp.take(cluster_full, jnp.clip(u_global, 0,
                                               cluster_full.shape[0] - 1))
        intra = prims.psum_all(jnp.sum(jnp.where(valid_ & (cdst == csrc), w_, 0.0)))

        # self-loops don't contribute to W(u→c) moves
        wmove = jnp.where(valid_ & (u_global != gdst), w_, 0.0)
        su, sc, sw = jax.lax.sort(
            (jnp.where(valid_, u_global, jnp.int32(2 ** 30)), cdst, wmove),
            num_keys=2)
        first = jnp.concatenate([
            jnp.ones((1,), jnp.bool_),
            (su[1:] != su[:-1]) | (sc[1:] != sc[:-1])])
        run = jnp.cumsum(first.astype(jnp.int32)) - 1
        W = jax.ops.segment_sum(sw, run, num_segments=E, indices_are_sorted=True)
        run_u = jax.ops.segment_max(su, run, num_segments=E,
                                    indices_are_sorted=True)
        run_c = jax.ops.segment_max(sc, run, num_segments=E,
                                    indices_are_sorted=True)
        nruns = run[-1] + 1
        is_run = (jnp.arange(E) < nruns) & (run_u < 2 ** 30)
        keys = jnp.where(is_run, run_u, -1)
        payload = jnp.stack([run_c.astype(jnp.float32), W], axis=1)
        payload = jnp.where(is_run[:, None], payload, 0.0)
        return keys, payload, intra

    def _s(a):
        return a[0, 0]

    es, vs = edge_spec(), vertex_spec()
    return jax.jit(jax.shard_map(
        kernel, mesh=mesh,
        in_specs=(es, es, es, es, P()),
        out_specs=(vs, vs, P())))


@lru_cache(maxsize=16)
def _merge_move_kernel(mesh, pmaj, pmin, chunk, n):
    """Owner-side merge of shuffled (u, c, W) partials + the move decision."""

    def kernel(keys, payload, cluster_full, k_full, sigma_full, up_down,
               resolution, m2):
        L = keys.shape[0]
        i, j = prims.my_coords()
        base = (i * pmin + j) * chunk

        c_in = payload[:, 0].astype(jnp.int32)
        w_in = payload[:, 1]
        valid = keys >= 0
        ku, kc, kw = jax.lax.sort(
            (jnp.where(valid, keys, jnp.int32(2 ** 30)), c_in, w_in),
            num_keys=2)
        first = jnp.concatenate([
            jnp.ones((1,), jnp.bool_), (ku[1:] != ku[:-1]) | (kc[1:] != kc[:-1])])
        run = jnp.cumsum(first.astype(jnp.int32)) - 1
        W = jax.ops.segment_sum(kw, run, num_segments=L, indices_are_sorted=True)
        run_u = jax.ops.segment_max(ku, run, num_segments=L,
                                    indices_are_sorted=True)
        run_c = jax.ops.segment_max(kc, run, num_segments=L,
                                    indices_are_sorted=True)
        nruns = run[-1] + 1
        is_run = (jnp.arange(L) < nruns) & (run_u < 2 ** 30)

        safe_u = jnp.clip(run_u, 0, cluster_full.shape[0] - 1)
        safe_c = jnp.clip(run_c, 0, cluster_full.shape[0] - 1)
        ku_deg = jnp.take(k_full, safe_u)
        cur = jnp.take(cluster_full, safe_u)
        sig_c = jnp.take(sigma_full, safe_c)
        sig_adj = sig_c - jnp.where(run_c == cur, ku_deg, 0.0)
        gain = W - resolution * ku_deg * sig_adj / jnp.maximum(m2, 1e-30)

        u_local = jnp.where(is_run, run_u - base, chunk)
        u_local = jnp.clip(u_local, 0, chunk)
        # stay term per local vertex
        W_stay = jax.ops.segment_sum(
            jnp.where(is_run & (run_c == cur), W, 0.0), u_local,
            num_segments=chunk + 1)[:chunk]
        gidx = base + jnp.arange(chunk)
        k_own = jnp.take(k_full, jnp.clip(gidx, 0, k_full.shape[0] - 1))
        c_own = jnp.take(cluster_full, jnp.clip(gidx, 0,
                                                cluster_full.shape[0] - 1))
        sig_cur = jnp.take(sigma_full, jnp.clip(c_own, 0,
                                                sigma_full.shape[0] - 1))
        f_stay = W_stay - resolution * k_own * (sig_cur - k_own) / \
            jnp.maximum(m2, 1e-30)

        direction_ok = jnp.where(up_down, run_c > cur, run_c < cur)
        cand = is_run & direction_ok & (run_c != cur)
        NEG = jnp.float32(-1e30)
        g_m = jnp.where(cand, gain, NEG)
        best_gain = jax.ops.segment_max(g_m, u_local,
                                        num_segments=chunk + 1)[:chunk]
        is_best = cand & (g_m >= jnp.take(
            jnp.concatenate([best_gain, jnp.full((1,), NEG)]), u_local))
        BIG = jnp.int32(2 ** 30)
        best_c = jax.ops.segment_min(
            jnp.where(is_best, run_c, BIG), u_local,
            num_segments=chunk + 1)[:chunk]
        improve = (best_gain > f_stay + 1e-9) & (best_c < BIG) & (gidx < n)
        new_cluster = jnp.where(improve, best_c, c_own)
        moved = prims.psum_all(jnp.sum(improve.astype(jnp.int32)))
        return new_cluster, moved

    return jax.jit(jax.shard_map(
        kernel, mesh=mesh,
        in_specs=(vertex_spec(), vertex_spec(), P(), P(), P(), P(), P(), P()),
        out_specs=(vertex_spec(), P())))


def _blocks_host(g: DistGraph, which: str):
    """Per-(i,j)-block host COO decompression, cached on the DistGraph.

    Returns a list (row-major over the mesh) of (gathered_global,
    reduced_global, w) int32/int32/float32 triples with the valid mask
    applied.  For push blocks the GATHERED endpoint is dst and the REDUCED
    endpoint is u (src); for pull blocks the roles swap (see CLAUDE.md's
    EdgeBlocks field-name warning)."""
    attr = f"_host_blocks_{which}"
    cached = getattr(g, attr, None)
    if cached is not None:
        return cached
    blocks_dev = g.push if which == "push" else g.pull
    pmaj, pmin, chunk = g.pmaj, g.pmin, g.chunk
    B = pmin * chunk
    gath = np.asarray(blocks_dev.src_loc)
    red = np.asarray(blocks_dev.dst_loc)
    w = np.asarray(blocks_dev.weight)
    valid = np.asarray(blocks_dev.valid)
    out = []
    for i in range(pmaj):
        for j in range(pmin):
            v = valid[i, j]
            gg = (i * B + gath[i, j][v].astype(np.int64)).astype(np.int32)
            slot = red[i, j][v].astype(np.int64)
            rg = (((slot // chunk) * pmin + j) * chunk
                  + slot % chunk).astype(np.int32)
            out.append((gg, rg, w[i, j][v].astype(np.float32)))
    object.__setattr__(g, attr, out)
    return out


def _agg_pairs(u, c, w, n_keys: int):
    """Aggregate (u, c) → ΣW; native counting sort with a numpy fallback.
    Returns (u, c, W) sorted by (u, c) — the kv_store/reduce-by-key role of
    the reference's cuco aggregation (per_v_transform_reduce_dst_key_
    aggregated_outgoing_e, louvain_impl.cuh:339)."""
    from cugraph_tpu.core.native import coarsen_edges_native

    if len(u) == 0:
        z = np.zeros(0, np.int32)
        return z, z.copy(), np.zeros(0, np.float32)
    out = coarsen_edges_native(u, c, w, n_keys)
    if out is not None:
        return out
    key = u.astype(np.int64) * n_keys + c.astype(np.int64)
    uniq, inv = np.unique(key, return_inverse=True)
    W = np.zeros(len(uniq), np.float64)
    np.add.at(W, inv, w)
    return ((uniq // n_keys).astype(np.int32),
            (uniq % n_keys).astype(np.int32), W.astype(np.float32))


def _move_phase_host(g: DistGraph, resolution: float, max_sweeps: int):
    """Host-engine distributed local-moving (see module docstring).

    Per sweep each block contributes per-device (u, cluster[dst], ΣW)
    aggregates via the native engine; owners merge their partials and apply
    the same snapshot move rule as the device kernel (up/down filter,
    min-c tie break, gain > f_stay + 1e-9)."""
    n, pad_v = g.num_vertices, g.pad_v
    blocks = _blocks_host(g, "push")      # (dst_global, u_global, w)
    k = np.asarray(g.out_degree, np.float64)
    m2 = max(float(k.sum()), 1e-30)
    cluster = np.arange(pad_v, dtype=np.int32)

    def sigma_of(cl):
        return np.bincount(cl[:n], weights=k[:n], minlength=pad_v)

    def intra_of(cl):
        return sum(float(w[cl[gdst] == cl[u]].sum())
                   for (gdst, u, w) in blocks)

    def modularity(cl):
        sig = sigma_of(cl)
        return intra_of(cl) / m2 - resolution * float(np.sum((sig / m2) ** 2))

    def move_once(cl, sigma, up_down):
        # per-device partial aggregation (each block = one device's work)
        parts = []
        for (gdst, u, w) in blocks:
            m = u != gdst                      # self-loops excluded from W
            parts.append(_agg_pairs(u[m], cl[gdst[m]], w[m], pad_v))
        # owner-side merge of the shuffled partials
        mu, mc, mW = _agg_pairs(
            np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
            np.concatenate([p[2] for p in parts]), pad_v)
        cur = cl[mu]
        ku = k[mu]
        stay = mc == cur
        W_stay = np.zeros(pad_v, np.float64)
        W_stay[mu[stay]] = mW[stay]            # unique per u post-merge
        dir_ok = (mc > cur) if up_down else (mc < cur)
        cand = dir_ok & ~stay
        if not cand.any():
            return cl, 0
        cu_, cc_, cg_ = mu[cand], mc[cand], (
            mW[cand] - resolution * ku[cand] * sigma[mc[cand]] / m2)
        order = np.lexsort((cc_, -cg_, cu_))   # by u, desc gain, asc c
        first = np.concatenate([[True], cu_[order][1:] != cu_[order][:-1]])
        sel = order[first]
        bu, bc, bg = cu_[sel], cc_[sel], cg_[sel]
        f_stay = W_stay[bu] - resolution * k[bu] * (sigma[cl[bu]] - k[bu]) / m2
        improve = (bg > f_stay + 1e-9) & (bu < n)
        new_cl = cl.copy()
        new_cl[bu[improve]] = bc[improve]
        return new_cl, int(improve.sum())

    best_q = modularity(cluster)
    up_down = True
    for sweep in range(max_sweeps):
        sigma = sigma_of(cluster)
        cand, moved = move_once(cluster, sigma, up_down)
        up_down = not up_down
        q = modularity(cand)
        if q > best_q + 1e-9:
            best_q, cluster = q, cand
        elif moved == 0 or sweep >= 1:
            break
    return cluster, best_q


def mg_louvain_move_phase(g: DistGraph, mesh, resolution: float = 1.0,
                          max_sweeps: int = 20, engine: str | None = None):
    """Distributed local-moving; returns (cluster [pad_v] np array, Q).

    ``engine``: "host" (default — native per-block aggregation, see module
    docstring) or "device" (shard_map sort/segment path); overridable via
    ``CUGRAPH_TPU_MG_SWEEP_ENGINE``."""
    assert g.push is not None, "mg_louvain needs push blocks"
    if engine is None:
        import os
        engine = os.environ.get("CUGRAPH_TPU_MG_SWEEP_ENGINE", "host")
    if engine == "host":
        return _move_phase_host(g, resolution, max_sweeps)
    if g.pad_v >= (1 << 24):
        # the device engine ships cluster ids as f32 payloads, exact only
        # below 2^24 — beyond that ids would round to wrong clusters with
        # no error (round-5 review); the host engine has no such limit
        return _move_phase_host(g, resolution, max_sweeps)
    part = g.part
    n, pad_v = g.num_vertices, g.pad_v
    k = np.asarray(g.out_degree) + 0.0   # weighted degree (out == in totals
    #                                       for symmetrized inputs)
    m2 = float(max(k.sum(), 1e-30))
    cluster = np.arange(pad_v, dtype=np.int32)
    agg = _local_aggregate_kernel(mesh, g.pmaj, g.pmin, g.chunk)
    move = _merge_move_kernel(mesh, g.pmaj, g.pmin, g.chunk, n)
    vsh = NamedSharding(mesh, vertex_spec())

    def sigma_of(cl):
        keys = jax.device_put(jnp.asarray(np.where(np.arange(pad_v) < n,
                                                   cl, -1), np.int32), vsh)
        vals = jax.device_put(jnp.asarray(k, np.float32), vsh)
        return np.asarray(shuffle_reduce_by_key(mesh, part, keys, vals, "sum"))

    def modularity(cl):
        cl_rep = jnp.asarray(cl)
        _, _, intra = agg(g.push.src_loc, g.push.dst_loc, g.push.weight,
                          g.push.valid, cl_rep)
        sig = sigma_of(cl)
        return float(intra) / m2 - resolution * float(np.sum((sig / m2) ** 2))

    best_q = modularity(cluster)
    up_down = True
    for sweep in range(max_sweeps):
        sigma = sigma_of(cluster)
        cl_rep = jnp.asarray(cluster)
        keys, payload, _ = agg(g.push.src_loc, g.push.dst_loc, g.push.weight,
                               g.push.valid, cl_rep)
        ko, po = shuffle_to_owners(mesh, part, np.asarray(keys),
                                   np.asarray(payload))
        new_cl, moved = move(ko, po, cl_rep, jnp.asarray(k, jnp.float32),
                             jnp.asarray(sigma, jnp.float32),
                             jnp.bool_(up_down), jnp.float32(resolution),
                             jnp.float32(m2))
        up_down = not up_down
        cand = np.array(new_cl)
        q = modularity(cand)
        if q > best_q + 1e-9:
            best_q, cluster = q, cand
        elif int(moved) == 0 or sweep >= 1:
            break
    return cluster, best_q


@lru_cache(maxsize=16)
def _coarsen_aggregate_kernel(mesh, pmaj, pmin, chunk):
    """Per-device (cluster[src], cluster[dst]) edge-weight aggregation over
    the pull blocks — the distributed contraction's compression step (the
    reference's coarsen_graph groupby, structure/coarsen_graph_impl.cuh).
    Output per device: distinct (c_src, c_dst) runs with summed weights;
    everything else is −1/0 padding."""
    B = pmin * chunk

    def kernel(gath, red, w, valid, labels_full):
        gath_, red_, w_, valid_ = (a[0, 0] for a in (gath, red, w, valid))
        i = jax.lax.axis_index(prims.MAJOR)
        j = jax.lax.axis_index(prims.MINOR)
        E = gath_.shape[0]

        src_glob = i * B + gath_
        dst_glob = ((red_ // chunk) * pmin + j) * chunk + red_ % chunk
        nl = labels_full.shape[0]
        cu = jnp.take(labels_full, jnp.clip(src_glob, 0, nl - 1))
        cd = jnp.take(labels_full, jnp.clip(dst_glob, 0, nl - 1))

        su, sc, sw = jax.lax.sort(
            (jnp.where(valid_, cu, jnp.int32(2 ** 30)), cd,
             jnp.where(valid_, w_, 0.0)), num_keys=2)
        first = jnp.concatenate([
            jnp.ones((1,), jnp.bool_),
            (su[1:] != su[:-1]) | (sc[1:] != sc[:-1])])
        run = jnp.cumsum(first.astype(jnp.int32)) - 1
        W = jax.ops.segment_sum(sw, run, num_segments=E, indices_are_sorted=True)
        run_u = jax.ops.segment_max(su, run, num_segments=E,
                                    indices_are_sorted=True)
        run_c = jax.ops.segment_max(sc, run, num_segments=E,
                                    indices_are_sorted=True)
        nruns = run[-1] + 1
        is_run = (jnp.arange(E) < nruns) & (run_u < 2 ** 30)
        keys = jnp.where(is_run, run_u, -1)
        payload = jnp.stack([run_c.astype(jnp.float32), W], axis=1)
        payload = jnp.where(is_run[:, None], payload, 0.0)
        return keys, payload

    es = edge_spec()
    return jax.jit(jax.shard_map(
        kernel, mesh=mesh,
        in_specs=(es, es, es, es, P()),
        out_specs=(vertex_spec(), vertex_spec())))


def mg_coarsen(g: DistGraph, mesh, labels_full: np.ndarray,
               engine: str | None = None):
    """Distributed graph contraction: labels (compact, [pad_v]) → coarse COO.

    Each device's edge block is compressed to distinct (c_src, c_dst, ΣW)
    runs FIRST — on its owning host via the native counting-sort engine
    (default), or on device (``engine="device"``) — so only these
    aggregates, orders of magnitude fewer than the edges, cross between
    owners for the final merge.  The full edge list is never materialized
    in one place (the reference coarsens distributed too,
    structure/coarsen_graph_impl.cuh)."""
    if engine is None:
        import os
        engine = os.environ.get("CUGRAPH_TPU_MG_SWEEP_ENGINE", "host")
    nc = int(labels_full.max()) + 1
    lab = np.asarray(labels_full, np.int32)
    if engine == "host":
        parts = [_agg_pairs(lab[sg], lab[rd], w, nc)
                 for (sg, rd, w) in _blocks_host(g, "pull")]
        cu, cd, cw = _agg_pairs(
            np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
            np.concatenate([p[2] for p in parts]), nc)
        return cu.astype(np.int64), cd.astype(np.int64), \
            cw.astype(np.float32), nc
    agg = _coarsen_aggregate_kernel(mesh, g.pmaj, g.pmin, g.chunk)
    keys, payload = agg(g.pull.src_loc, g.pull.dst_loc, g.pull.weight,
                        g.pull.valid, jnp.asarray(labels_full, jnp.int32))
    k = np.asarray(keys)
    p = np.asarray(payload)
    sel = k >= 0
    cu = k[sel].astype(np.int64)
    cd = p[sel, 0].astype(np.int64)
    w = p[sel, 1].astype(np.float64)
    pair = cu * nc + cd
    uniq, inv = np.unique(pair, return_inverse=True)
    cw = np.zeros(len(uniq), np.float64)
    np.add.at(cw, inv, w)
    return (uniq // nc).astype(np.int64), (uniq % nc).astype(np.int64), \
        cw.astype(np.float32), nc


# distributed levels below this edge count drop to the single-device cascade
_SG_CASCADE_EDGES = 2_000_000


def mg_louvain(g: DistGraph, mesh, max_level: int = 100,
               resolution: float = 1.0, threshold: float = 1e-7,
               sg_threshold_edges: int = _SG_CASCADE_EDGES):
    """Distributed Louvain.  Returns (labels [num_vertices], modularity).

    Every level runs the distributed move phase and the DISTRIBUTED
    contraction (mg_coarsen) while the coarse graph still has more than
    ``sg_threshold_edges`` edges; the final (small) cascade runs the
    single-device engine.  The full-resolution edge list never lands on one
    host (reference: louvain_impl.cuh:339 + coarsen_graph_impl.cuh)."""
    from cugraph_tpu.algos.community import _coarsen, _louvain_one_level
    from cugraph_tpu.parallel.partition import build_dist_graph

    n = g.num_vertices
    cluster, q_prev = mg_louvain_move_phase(g, mesh, resolution)
    _, compact = np.unique(np.asarray(cluster)[:n], return_inverse=True)
    cur = compact.astype(np.int32)

    g_cur, n_cur = g, n
    cur_full = np.zeros(g_cur.pad_v, np.int32)
    cur_full[:n] = cur
    level = 1
    # distributed cascade
    csrc, cdst, cw, nc = mg_coarsen(g_cur, mesh, cur_full)
    while level < max_level and len(csrc) > sg_threshold_edges and nc > 1:
        g_c = build_dist_graph(csrc, cdst, cw, nc, g.pmaj, g.pmin,
                               store_push=True)
        cl_c, q = mg_louvain_move_phase(g_c, mesh, resolution)
        if q <= q_prev + threshold:
            return cur, q_prev
        _, cc = np.unique(np.asarray(cl_c)[:nc], return_inverse=True)
        cur = cc.astype(np.int32)[cur]
        q_prev = q
        g_cur, n_cur = g_c, nc
        cur_full = np.zeros(g_cur.pad_v, np.int32)
        cur_full[:nc] = cc
        level += 1
        csrc, cdst, cw, nc = mg_coarsen(g_cur, mesh, cur_full)

    # small-graph cascade on one device (same machinery as the reference's
    # re-run on the shrunken graph)
    for _ in range(level, max_level):
        cl, q = _louvain_one_level(csrc, cdst, cw, nc, resolution)
        if q <= q_prev + threshold:
            break
        # _coarsen compacts cl; its `compact` maps current-level vertex →
        # coarse id, which is what `cur` must be composed with (raw cl values
        # are NOT contiguous — indexing the next level's labels with them
        # would go out of bounds, cf. algos/community._louvain_levels)
        csrc, cdst, cw, nc, compact = _coarsen(csrc, cdst, cw, cl)
        cur = compact[cur]
        q_prev = q
        if nc <= 1:
            break
    return cur, q_prev


def _gather_edges_host(g: DistGraph):
    """Decompress the distributed pull blocks back to a host COO list.
    Cached per DistGraph (frozen blocks) — several algorithms (triangle,
    k-truss, the intersection context) would otherwise pay the O(E) python
    block loop repeatedly."""
    cached = getattr(g, "_host_coo", None)
    if cached is not None:
        return cached
    # one owner for the per-block decompression (and its cache):
    # _blocks_host — this used to duplicate the loop AND hold a second
    # O(E) host copy next to _host_blocks_pull (round-5 review finding)
    blocks = _blocks_host(g, "pull")
    if blocks:
        out = (np.concatenate([b[0] for b in blocks]).astype(np.int64),
               np.concatenate([b[1] for b in blocks]).astype(np.int64),
               np.concatenate([b[2] for b in blocks]).astype(np.float32))
    else:
        out = (np.empty(0, np.int64), np.empty(0, np.int64),
               np.empty(0, np.float32))
    object.__setattr__(g, "_host_coo", out)
    return out


def _mask_blocks_intra(blocks, labels, pmaj, pmin, chunk):
    """EdgeBlocks copy whose valid mask keeps only intra-community edges."""
    from cugraph_tpu.parallel.partition import EdgeBlocks

    B = pmin * chunk
    gath = np.asarray(blocks.src_loc)
    red = np.asarray(blocks.dst_loc)
    valid = np.array(blocks.valid)
    for i in range(pmaj):
        for j in range(pmin):
            g_glob = i * B + gath[i, j]
            r_glob = (red[i, j] // chunk * pmin + j) * chunk + red[i, j] % chunk
            ok = labels[np.clip(g_glob, 0, len(labels) - 1)] == \
                labels[np.clip(r_glob, 0, len(labels) - 1)]
            valid[i, j] &= ok
    return EdgeBlocks(src_loc=blocks.src_loc, dst_loc=blocks.dst_loc,
                      weight=blocks.weight, valid=jnp.asarray(valid))


def mg_leiden(g: DistGraph, mesh, max_level: int = 100,
              resolution: float = 1.0, threshold: float = 1e-7):
    """Distributed Leiden = distributed Louvain + the refinement GUARANTEE:
    after clustering, communities are split into their weakly-connected
    components over intra-community edges (refine_impl.cuh's purpose — no
    disconnected community survives), with the split computed by the
    distributed WCC on community-masked blocks."""
    from cugraph_tpu.parallel.algos import mg_wcc
    from cugraph_tpu.parallel.partition import DistGraph as DG

    assert g.push is not None, "mg_leiden needs push blocks"
    labels, q = mg_louvain(g, mesh, max_level=max_level,
                           resolution=resolution, threshold=threshold)
    n, pad_v = g.num_vertices, g.pad_v
    lab_full = np.zeros(pad_v, np.int64)
    lab_full[:n] = labels

    masked = DG(
        pull=_mask_blocks_intra(g.pull, lab_full, g.pmaj, g.pmin, g.chunk),
        push=_mask_blocks_intra(g.push, lab_full, g.pmaj, g.pmin, g.chunk),
        out_degree=g.out_degree, in_degree=g.in_degree,
        num_vertices=g.num_vertices, num_edges=g.num_edges,
        pmaj=g.pmaj, pmin=g.pmin, chunk=g.chunk)
    cc = np.asarray(mg_wcc(masked, mesh))[:n]
    _, refined = np.unique(cc, return_inverse=True)
    refined = refined.astype(np.int32)

    # modularity of the refined partition: per-block intra-weight partials
    # (each block = one device's work on its owning host) + a σ bincount —
    # the full edge list never lands in one place
    k = np.asarray(g.out_degree, np.float64)
    m2 = max(float(k.sum()), 1e-30)
    ref_full = np.zeros(pad_v, np.int32)
    ref_full[:n] = refined
    intra = sum(float(w[ref_full[gdst] == ref_full[u]].sum())
                for (gdst, u, w) in _blocks_host(g, "push"))
    sigma = np.bincount(refined, weights=k[:n], minlength=n)
    q_ref = intra / m2 - resolution * float(np.sum((sigma / m2) ** 2))
    return refined, q_ref
