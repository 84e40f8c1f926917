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

Cluster ids ride the shuffle as float32 payloads → exact for |V| < 2^24
(single-level ids are vertex ids; fine for the current scale envelope).
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


def mg_louvain_move_phase(g: DistGraph, mesh, resolution: float = 1.0,
                          max_sweeps: int = 20):
    """Distributed local-moving; returns (cluster [pad_v] np array, Q)."""
    assert g.push is not None, "mg_louvain needs push blocks"
    part = g.part
    n, pad_v = g.num_vertices, g.pad_v
    k = np.asarray(g.out_degree) + 0.0   # weighted degree (out == in totals
    #                                       for symmetrized inputs)
    m2 = float(k.sum())
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


def mg_coarsen(g: DistGraph, mesh, labels_full: np.ndarray):
    """Distributed graph contraction: labels (compact, [pad_v]) → coarse COO.

    Each device compresses its edge block to distinct (c_src, c_dst, ΣW)
    runs on device; only these aggregates — orders of magnitude fewer than
    the edges — reach the host for the final cross-device merge.  The full
    edge list is never materialized on one host (the reference coarsens
    distributed too, structure/coarsen_graph_impl.cuh)."""
    agg = _coarsen_aggregate_kernel(mesh, g.pmaj, g.pmin, g.chunk)
    keys, payload = agg(g.pull.src_loc, g.pull.dst_loc, g.pull.weight,
                        g.pull.valid, jnp.asarray(labels_full, jnp.int32))
    k = np.asarray(keys)
    p = np.asarray(payload)
    sel = k >= 0
    cu = k[sel].astype(np.int64)
    cd = p[sel, 0].astype(np.int64)
    w = p[sel, 1].astype(np.float64)
    nc = int(labels_full.max()) + 1
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
    pmaj, pmin, chunk = g.pmaj, g.pmin, g.chunk
    B = pmin * chunk
    src_loc = np.asarray(g.pull.src_loc)
    dst_loc = np.asarray(g.pull.dst_loc)
    w = np.asarray(g.pull.weight)
    valid = np.asarray(g.pull.valid)
    srcs, dsts, ws = [], [], []
    for i in range(pmaj):
        for j in range(pmin):
            v = valid[i, j]
            s = i * B + src_loc[i, j][v]
            dl = dst_loc[i, j][v]
            d = (dl // chunk * pmin + j) * chunk + dl % chunk
            srcs.append(s)
            dsts.append(d)
            ws.append(w[i, j][v])
    out = (np.concatenate(srcs), np.concatenate(dsts),
           np.concatenate(ws).astype(np.float32))
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

    # modularity of the refined partition, computed DISTRIBUTED (intra-weight
    # from the per-device aggregate kernel, σ via the key shuffle) — the full
    # edge list never lands on one host
    part = g.part
    k = np.asarray(g.out_degree).astype(np.float64)
    m2 = float(k.sum())
    ref_full = np.zeros(pad_v, np.int32)
    ref_full[:n] = refined
    agg = _local_aggregate_kernel(mesh, g.pmaj, g.pmin, g.chunk)
    _, _, intra = agg(g.push.src_loc, g.push.dst_loc, g.push.weight,
                      g.push.valid, jnp.asarray(ref_full))
    keys = jax.device_put(
        jnp.asarray(np.where(np.arange(pad_v) < n, ref_full, -1), np.int32),
        NamedSharding(mesh, vertex_spec()))
    vals = jax.device_put(jnp.asarray(k, jnp.float32),
                          NamedSharding(mesh, vertex_spec()))
    sigma = np.asarray(shuffle_reduce_by_key(mesh, part, keys, vals, "sum"))
    q_ref = float(intra) / m2 - resolution * float(np.sum((sigma / m2) ** 2))
    return refined, q_ref
