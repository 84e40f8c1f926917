"""Sorted-adjacency membership tests and neighbor-list intersection.

TPU-native re-design of the reference's nbr_intersection machinery
(cpp/include/cugraph/prims/detail/nbr_intersection.cuh and
per_v_pair_transform_src_dst_nbr_intersection.cuh) that backs
Jaccard/Sorensen/Overlap/Cosine and triangle counting.

Design: adjacency lists are stored sorted (core/structure.py lexsorts by
(major, minor)), so membership is a vectorized 32-step branch-free binary
search — no hash maps (the reference uses cuco GPU hash tables; binary search
over VMEM-resident rows is the TPU answer).  Pair intersection enumerates the
first endpoint's neighbors into a [n_pairs, max_deg] tile and probes each
against the second endpoint's sorted row; the tile shape is static, which is
what XLA needs.  (A merge-path Pallas kernel can replace this for power-law
degree distributions; the contract stays the same.)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from cugraph_tpu.core.structure import CsrMatrix, GraphStructure


def lower_bound_rows(adj: CsrMatrix, rows: jax.Array, queries: jax.Array):
    """For each (row r, query q) find the insertion position of q in the
    sorted adjacency list of r.  rows/queries: any equal shape.
    Returns (found: bool, pos: int32 absolute index into adj.indices)."""
    shape = jnp.broadcast_shapes(rows.shape, queries.shape)
    lo = jnp.broadcast_to(jnp.take(adj.offsets, rows), shape)
    hi0 = jnp.broadcast_to(jnp.take(adj.offsets, rows + 1), shape)

    def body(_, state):
        lo, hi = state
        mid = (lo + hi) >> 1
        val = jnp.take(adj.indices, jnp.clip(mid, 0, adj.pad_e - 1))
        go_right = (val < queries) & (lo < hi)
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right | (lo >= hi), hi, mid)
        return lo, hi

    # 32 iterations cover any row length representable in int32
    lo, _ = jax.lax.fori_loop(0, 32, body, (lo, hi0))
    val = jnp.take(adj.indices, jnp.clip(lo, 0, adj.pad_e - 1))
    found = (lo < hi0) & (val == queries)
    return found, lo


def enumerate_neighbors(adj: CsrMatrix, verts: jax.Array, max_deg: int,
                        nbr_table: jax.Array | None = None):
    """[P] vertex ids -> ([P, max_deg] neighbor ids, [P, max_deg] valid mask,
    [P, max_deg] absolute edge index).  Rows shorter than max_deg are masked;
    longer rows MUST NOT occur (caller picks max_deg >= max degree).

    With ``nbr_table`` (a [pad_v, D≥max_deg] table from
    prims.neighbor_table.neighbor_table, fetched OUTSIDE any trace) the
    neighbor ids come from one row gather instead of a [P, max_deg] element
    gather that scalarizes on TPU; invalid lanes then hold sentinels ≥ pad_v
    (callers must mask via ``valid`` either way)."""
    base = jnp.take(adj.offsets, verts)
    deg = jnp.take(adj.offsets, verts + 1) - base
    k = jnp.arange(max_deg, dtype=jnp.int32)
    eidx = base[:, None] + k[None, :]
    valid = k[None, :] < deg[:, None]
    eidx_c = jnp.clip(eidx, 0, adj.pad_e - 1)
    if nbr_table is not None:
        if nbr_table.shape[1] < max_deg:  # defensive; D >= max degree normally
            nbr_table = jnp.pad(nbr_table,
                                ((0, 0), (0, max_deg - nbr_table.shape[1])),
                                constant_values=adj.pad_v)
        nbr = jnp.take(nbr_table, verts, axis=0)[:, :max_deg]
    else:
        nbr = jnp.take(adj.indices, eidx_c)
    return nbr, valid, eidx_c


# ---------------------------------------------------------------------------
# TPU fast path: padded-adjacency row gather + one dense sort per pair batch
# ---------------------------------------------------------------------------
#
# Measured on v5e (benchmarks/bench_isect_micro.py): element gathers run at
# ~0.075 G elem/s (scalarized) but ROW gathers (jnp.take axis=0 of a [V, D]
# table, D = lane-dim slices) run at ~1.5 G elem/s, and per-row sorts of
# [P, 128] run at ~42 M rows/s.  That turns the 32-step binary search
# (32·P·D element gathers) into 2 row gathers + 1 sort — ~200× on TPU.
#
# Key encoding: u-side neighbor x → 2x, v-side → 2x+1.  After sorting the
# concatenated row, x ∈ N(u)∩N(v) shows up as an adjacent (2x, 2x+1) pair:
# match[i] = (s[i+1]-s[i] == 1) & even(s[i]).  Padding slots bake in as
# pad_v+k (u side) / pad_v+D+k (v side) — distinct, larger than any real id,
# and never 1 apart across sides.  Weights co-sort as a payload for the
# weighted min/max sums.  Exact for graphs without parallel edges (the
# reference's similarity/triangle precondition, remove_multi_edges).

_ISECT_TABLE_MAX = 1 << 26  # table entries (per array) before falling back


def _padded_adj_tables(g: GraphStructure, weighted: bool):
    """Cached [pad_v, D] neighbor (+weight) tables for g.csr — shared with
    the sampling/walk row-gather paths (prims/neighbor_table.py).  Invalid
    cells hold pad_v + slot (distinct sentinels ≥ pad_v; the sort-merge
    adjacency trick below relies on both properties)."""
    from cugraph_tpu.prims.neighbor_table import (
        neighbor_table,
        table_width,
        weight_table,
    )

    adj = g.csr
    wtab = weight_table(adj) if weighted else None
    return neighbor_table(adj), wtab, table_width(adj)


def intersection_table_entries(g: GraphStructure) -> int:
    """Size (entries) the padded fast-path table would need; used by the
    dispatcher to bound memory."""
    from cugraph_tpu.prims.neighbor_table import table_entries

    if g.csr.num_vertices == 0:
        return 0
    return table_entries(g.csr)


@partial(jax.jit, static_argnames=("pad_v", "D", "weighted"))
def _pair_sorted_core(table, wtab, pu, pv, pad_v: int, D: int,
                      weighted: bool):
    """Sort-merge match core: pu/pv are ROW POSITIONS into ``table``
    (vertex ids for the full cached table, compact positions for bucketed
    tables).  int32 keys: 2·(pad_v + 2D) stays well under 2^31."""
    nu = jnp.take(table, pu, axis=0)  # [P, D] row gather (fast on TPU)
    nv = jnp.take(table, pv, axis=0)
    k_u = 2 * nu
    # shift v-side pad sentinels past the u-side ones so they never pair up
    nv = jnp.where(nv >= pad_v, nv + D, nv)
    k_v = 2 * nv + 1
    keys = jnp.concatenate([k_u, k_v], axis=1)  # [P, 2D]
    if weighted:
        wu = jnp.take(wtab, pu, axis=0)
        wv = jnp.take(wtab, pv, axis=0)
        wcat = jnp.concatenate([wu, wv], axis=1)
        keys, wsort = jax.lax.sort((keys, wcat), dimension=1, num_keys=1)
    else:
        keys = jnp.sort(keys, axis=1)
    match = (keys[:, 1:] - keys[:, :-1] == 1) & (keys[:, :-1] % 2 == 0)
    out = {"count": jnp.sum(match, axis=1).astype(jnp.int32)}
    if weighted:
        w_lo = wsort[:, :-1]
        w_hi = wsort[:, 1:]
        m = match.astype(w_lo.dtype)
        out["sum_min"] = jnp.sum(m * jnp.minimum(w_lo, w_hi), axis=1)
        out["sum_max"] = jnp.sum(m * jnp.maximum(w_lo, w_hi), axis=1)
    return out


@partial(jax.jit, static_argnames=("pad_v", "D", "weighted"))
def _pair_sorted_scan(table, wtab, pu_chunks, pv_chunks, pad_v: int, D: int,
                      weighted: bool):
    """lax.scan of the match core over fixed-size pair chunks — ONE dispatch
    covers a whole degree bucket with a bounded [Pc, 2D] sort buffer."""

    def step(_, pc):
        return None, _pair_sorted_core(table, wtab, pc[0], pc[1], pad_v, D,
                                       weighted)

    _, res = jax.lax.scan(step, None, (pu_chunks, pv_chunks))
    return res


def _host_csr(adj: CsrMatrix, weighted: bool):
    """Cached host copies of (offsets, indices, weights) — graph-constant,
    and each uncached pull re-crosses the device tunnel (~67 MB of indices
    at RMAT-18 per similarity call otherwise)."""
    cached = getattr(adj, "_host_csr_cache", None)
    if cached is None or (weighted and cached[2] is None):
        cached = (np.asarray(adj.offsets), np.asarray(adj.indices),
                  np.asarray(adj.weights) if weighted else None)
        object.__setattr__(adj, "_host_csr_cache", cached)
    return cached


def _host_degrees(adj: CsrMatrix, ids):
    offs = _host_csr(adj, False)[0]
    return (offs[ids + 1] - offs[ids]).astype(np.int32)


def _host_wsums(adj: CsrMatrix):
    cached = getattr(adj, "_host_wsums", None)
    if cached is None:
        cached = np.zeros(int(adj.pad_v), np.float32)
        np.add.at(cached, np.asarray(adj.majors), _host_csr(adj, True)[2])
        object.__setattr__(adj, "_host_wsums", cached)
    return cached


def _stat_tails(adj: CsrMatrix, out, us_np, vs_np, weighted):
    out["deg_u"] = jnp.asarray(_host_degrees(adj, us_np))
    out["deg_v"] = jnp.asarray(_host_degrees(adj, vs_np))
    if weighted:
        ws = _host_wsums(adj)
        out["wsum_u"] = jnp.asarray(ws[us_np])
        out["wsum_v"] = jnp.asarray(ws[vs_np])
    return out


def pair_intersection_sorted(g: GraphStructure, us, vs,
                             weighted: bool = False):
    """Sort-merge pair intersection (same contract as pair_intersection);
    requires the padded table to fit memory — see pair_intersection_auto."""
    import numpy as np

    adj = g.csr
    table, wtab, D = _padded_adj_tables(g, weighted)
    us_np = np.asarray(us, np.int64)
    vs_np = np.asarray(vs, np.int64)
    out = dict(_pair_sorted_core(table, wtab, jnp.asarray(us_np),
                                 jnp.asarray(vs_np), int(adj.pad_v), D,
                                 weighted))
    return _stat_tails(adj, out, us_np, vs_np, weighted)


_SORT_TILE = 1 << 24  # sort-buffer elements per scan step (≈ 64 MB int32)
_HOST_PROBE_DEG = 1024    # pairs whose MAX degree exceeds this go host-side
_PROBE_CHUNK = 1 << 25    # expanded membership queries per host step


def _host_edge_keys(adj: CsrMatrix):
    """Cached sorted (major·pad_v + minor) keys over the REAL edges — the
    CSR is lexsorted by (major, minor), so the key array is already globally
    ascending and edge existence is one np.searchsorted."""
    cached = getattr(adj, "_host_edge_keys_cache", None)
    if cached is None:
        offs, ind, _ = _host_csr(adj, False)
        majors = np.asarray(adj.majors)
        E = int(offs[int(adj.num_vertices)])
        cached = (majors[:E].astype(np.int64) * int(adj.pad_v)
                  + ind[:E].astype(np.int64))
        object.__setattr__(adj, "_host_edge_keys_cache", cached)
    return cached


def _pair_minprobe_host(adj: CsrMatrix, us: np.ndarray, vs: np.ndarray,
                        weighted: bool):
    """Intersection stats with cost ∝ the pair's MIN degree: probe every
    neighbor of the smaller endpoint for edge-existence against the larger
    endpoint via one vectorized searchsorted on the sorted edge keys.  This
    is how hub pairs stay cheap — |N(u)∩N(v)| for a (30, 25k)-degree pair
    costs 30 probes, not a 50k-wide sort.  Reference analog: the
    low-degree-side enumeration of nbr_intersection.cuh.
    Returns (count int32[P], sum_min, sum_max) host arrays."""
    offs, ind, w = _host_csr(adj, weighted)

    from cugraph_tpu.core.native import pair_probe_native

    nat = pair_probe_native(us, vs, offs, ind, w, weighted)
    if nat is not None:  # threaded C++ probes (semantics-identical)
        return nat

    keys = _host_edge_keys(adj)
    pad_v = int(adj.pad_v)
    deg = offs[1:] - offs[:-1]
    du, dv = deg[us], deg[vs]
    small = np.where(du <= dv, us, vs)
    large = np.where(du <= dv, vs, us)
    ds = deg[small].astype(np.int64)

    P = len(us)
    count = np.zeros(P, np.int32)
    smin = np.zeros(P, np.float32) if weighted else None
    smax = np.zeros(P, np.float32) if weighted else None
    csum = np.zeros(P + 1, np.int64)
    np.cumsum(ds, out=csum[1:])
    # chunk pairs so each expansion stays bounded
    lo = 0
    while lo < P:
        hi = min(max(int(np.searchsorted(csum, csum[lo] + _PROBE_CHUNK)),
                     lo + 1), P)
        sl = slice(lo, hi)
        dsl = ds[sl]
        tot = int(dsl.sum())
        if tot:
            pid = np.repeat(np.arange(lo, hi), dsl)
            base = np.repeat(offs[small[sl]].astype(np.int64), dsl)
            local = np.arange(tot) - np.repeat(csum[lo:hi] - csum[lo], dsl)
            flat = base + local
            nbr = ind[flat].astype(np.int64)
            qk = np.repeat(large[sl].astype(np.int64), dsl) * pad_v + nbr
            pos = np.searchsorted(keys, qk)
            pos_c = np.minimum(pos, len(keys) - 1)
            found = keys[pos_c] == qk
            np.add.at(count, pid[found], 1)
            if weighted:
                w_s = w[flat[found]]
                w_l = w[pos_c[found]]
                np.add.at(smin, pid[found], np.minimum(w_s, w_l))
                np.add.at(smax, pid[found], np.maximum(w_s, w_l))
        lo = hi
    return count, smin, smax


def pair_intersection_bucketed(g: GraphStructure, us, vs,
                               weighted: bool = False):
    """Scale-robust sort-merge intersection for graphs whose full padded
    table exceeds the budget (hub-dominated / huge graphs): pairs are
    grouped into power-of-two max-degree buckets, each bucket builds a
    COMPACT host table holding only its referenced vertices' rows (the
    power law makes big-degree buckets reference few vertices, so every
    bucket's table is small), and a lax.scan walks fixed-size pair chunks
    so no single dispatch sorts more than ``_SORT_TILE`` elements.  This
    replaces a [P, max_deg] binary-search fallback that scalarized — long
    enough at RMAT-18 to get the TPU worker killed.  Reference analog: the
    per-query remote adjacency gathers of nbr_intersection.cuh."""
    import numpy as np

    adj = g.csr
    pad_v = int(adj.pad_v)
    us_np = np.asarray(us, np.int64)
    vs_np = np.asarray(vs, np.int64)
    P = len(us_np)
    if P == 0:
        z = jnp.zeros(0, jnp.int32)
        out = {"count": z}
        if weighted:
            out["sum_min"] = out["sum_max"] = jnp.zeros(0, jnp.float32)
        return _stat_tails(adj, out, us_np, vs_np, weighted)
    offs, ind_np, w_np = _host_csr(adj, weighted)
    deg_all = offs[1:] - offs[:-1]
    dmax_pair = np.maximum(np.maximum(deg_all[us_np], deg_all[vs_np]), 1)
    Db_all = np.maximum(128, 2 ** np.ceil(np.log2(dmax_pair)).astype(np.int64))

    count = np.zeros(P, np.int32)
    smin = np.zeros(P, np.float32) if weighted else None
    smax = np.zeros(P, np.float32) if weighted else None

    # hub pairs (max degree past the threshold) cost min-degree host probes
    # instead of max-degree-wide sorts
    import os

    env_th = os.environ.get("CUGRAPH_TPU_ISECT_HOST_DEG")
    if env_th is not None:
        host_th = int(env_th)
    else:
        from cugraph_tpu.core.native import get_lib

        # with the threaded C++ probe engine available, min-degree probes
        # beat per-bucket device sorts at EVERY degree — route everything;
        # numpy-probe fallback only pays off past the hub threshold
        host_th = 0 if get_lib() is not None else _HOST_PROBE_DEG
    hub = dmax_pair > host_th
    if hub.any():
        c_h, mn_h, mx_h = _pair_minprobe_host(adj, us_np[hub], vs_np[hub],
                                              weighted)
        count[hub] = c_h
        if weighted:
            smin[hub] = mn_h
            smax[hub] = mx_h
        Db_all = Db_all[~hub]
        sel_keep = np.flatnonzero(~hub)
    else:
        sel_keep = np.arange(P)

    for Db in np.unique(Db_all):
        Db = int(Db)
        sel = sel_keep[np.flatnonzero(Db_all == Db)]
        u_b, v_b = us_np[sel], vs_np[sel]
        refs, inv = np.unique(np.concatenate([u_b, v_b]),
                              return_inverse=True)
        degs = deg_all[refs]
        idx = np.minimum(offs[refs][:, None] + np.arange(Db)[None, :],
                         len(ind_np) - 1)
        invalid = np.arange(Db)[None, :] >= degs[:, None]
        sent = (pad_v + np.arange(Db)).astype(np.int32)
        tab = np.where(invalid, sent[None, :], ind_np[idx].astype(np.int32))
        wtab = (jnp.asarray(np.where(invalid, 0.0, w_np[idx])
                            .astype(np.float32)) if weighted else None)
        Pb = len(sel)
        Pc = max(64, _SORT_TILE // (2 * Db))
        n_chunks = -(-Pb // Pc)
        n_chunks = 1 << max(0, (n_chunks - 1).bit_length())
        tot = n_chunks * Pc
        pu = np.zeros(tot, np.int32)
        pv_ = np.zeros(tot, np.int32)
        pu[:Pb] = inv[:Pb]
        pv_[:Pb] = inv[Pb:]
        res = _pair_sorted_scan(
            jnp.asarray(tab), wtab,
            jnp.asarray(pu.reshape(n_chunks, Pc)),
            jnp.asarray(pv_.reshape(n_chunks, Pc)),
            pad_v, Db, weighted)
        count[sel] = np.asarray(res["count"]).reshape(-1)[:Pb]
        if weighted:
            smin[sel] = np.asarray(res["sum_min"]).reshape(-1)[:Pb]
            smax[sel] = np.asarray(res["sum_max"]).reshape(-1)[:Pb]

    out = {"count": jnp.asarray(count)}
    if weighted:
        out["sum_min"] = jnp.asarray(smin)
        out["sum_max"] = jnp.asarray(smax)
    return _stat_tails(adj, out, us_np, vs_np, weighted)


def pair_intersection_auto(g: GraphStructure, us, vs, max_deg: int,
                           weighted: bool = False):
    """Dispatch: sorted fast path when the padded table fits the budget
    (env CUGRAPH_TPU_ISECT_TABLE_MAX entries, default 2^26 ≈ 256 MB int32),
    degree-bucketed compact tables / min-degree probes otherwise.
    ``max_deg`` is accepted for signature parity with pair_intersection but
    does not bound either dispatch target."""
    import os

    budget = int(os.environ.get("CUGRAPH_TPU_ISECT_TABLE_MAX",
                                _ISECT_TABLE_MAX))
    if intersection_table_entries(g) <= budget:
        return pair_intersection_sorted(g, us, vs, weighted)
    return pair_intersection_bucketed(g, us, vs, weighted)


@partial(jax.jit, static_argnames=("max_deg", "weighted"))
def pair_intersection(
    g: GraphStructure,
    us: jax.Array,
    vs: jax.Array,
    max_deg: int,
    weighted: bool = False,
):
    """Neighbor-set intersection statistics for vertex pairs (us[i], vs[i]),
    neighborhoods taken over out-edges (use on symmetrized graphs for the
    undirected semantics of the reference's similarity ops).

    Returns dict with:
      count     — |N(u) ∩ N(v)|                          [P] int32
      deg_u/deg_v — |N(u)|, |N(v)|                        [P] int32
    and when weighted:
      sum_min / sum_max — Σ min/max(w(u,x), w(v,x)) over x ∈ N(u)∩N(v)  [P]
      wsum_u / wsum_v   — Σ w(u,*) , Σ w(v,*)                           [P]
    matching the reference's weighted similarity formulas
    (cpp/src/link_prediction/detail/similarity_impl.cuh).
    """
    adj = g.csr
    nbr, valid, eidx = enumerate_neighbors(adj, us, max_deg)
    found, pos = lower_bound_rows(adj, vs[:, None], nbr)
    hit = valid & found
    out = {
        "count": jnp.sum(hit, axis=1).astype(jnp.int32),
        "deg_u": (jnp.take(adj.offsets, us + 1) - jnp.take(adj.offsets, us)),
        "deg_v": (jnp.take(adj.offsets, vs + 1) - jnp.take(adj.offsets, vs)),
    }
    if weighted:
        w_u = jnp.take(adj.weights, eidx)
        w_v = jnp.take(adj.weights, jnp.clip(pos, 0, adj.pad_e - 1))
        mn = jnp.where(hit, jnp.minimum(w_u, w_v), 0.0)
        mx = jnp.where(hit, jnp.maximum(w_u, w_v), 0.0)
        out["sum_min"] = jnp.sum(mn, axis=1)
        out["sum_max"] = jnp.sum(mx, axis=1)
        wsums = jax.ops.segment_sum(adj.weights, adj.majors,
                                    num_segments=adj.pad_v,
                                    indices_are_sorted=True)
        out["wsum_u"] = jnp.take(wsums, us)
        out["wsum_v"] = jnp.take(wsums, vs)
    return out
