"""Sampling: uniform/biased neighbor sampling, random walks (uniform /
biased / node2vec), negative sampling.

Reference: cpp/src/sampling/ (17,914 LoC) — neighbor_sampling_impl.cuh:166,
random_walks_impl.cuh:894-933, negative_sampling_impl.cuh:270, built on
per_v_random_select_transform_outgoing_e and
prims/detail/sample_and_compute_local_nbr_indices.cuh.

TPU design: all draws are stateless threefry (jax.random) keyed per
(hop|step, slot) — deterministic given a seed, reproducible across shardings
(the reference's cuRAND streams are stateful per GPU; tests there assert
distributional properties, same as ours — SURVEY.md §7 "RNG parity").
Uniform neighbor selection is `floor(u * degree)` into the CSR row; biased
selection binary-searches a per-row cumulative-weight table; without-
replacement sampling uses Gumbel top-k over a [frontier, max_deg] tile
(exact uniform/weighted sampling without replacement, no rejection loops —
rejection is hostile to static shapes).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from cugraph_tpu.algos._utils import normalize_start, unrenumber_column
from cugraph_tpu.core.structure import GraphStructure
from cugraph_tpu.prims.intersection import enumerate_neighbors, lower_bound_rows


# --------------------------------------------------------------------------
# per_v_random_select_outgoing_e — the sampling primitive
# --------------------------------------------------------------------------

# dense searchsorted tensor budget for the table-based inverse-CDF draw
_DENSE_CDF_MAX = 64_000_000


@partial(jax.jit, static_argnames=("k", "with_replacement", "biased", "max_deg"))
def _sample_neighbors(g: GraphStructure, frontier: jax.Array, key: jax.Array,
                      k: int, with_replacement: bool, biased: bool,
                      max_deg: int, cumw: jax.Array | None = None,
                      tables=None):
    """For each frontier vertex draw k out-neighbors.
    Returns (dst [F,k], edge_idx [F,k], valid [F,k]).
    TPU analog of per_v_random_select_transform_outgoing_e
    (prims/per_v_random_select_transform_outgoing_e.cuh).

    ``tables`` = (nbr_table, weight_table, cumweight_table) from
    prims.neighbor_table (fetched outside the trace): neighbor/weight lookups
    become row gathers + take_along_axis (dense, TPU-fast) instead of
    element gathers, and the biased inverse-CDF becomes one dense
    comparison count instead of a 32-step binary search."""
    adj = g.csr
    F = frontier.shape[0]
    nt, wt, ct = tables if tables is not None else (None, None, None)
    base = jnp.take(adj.offsets, frontier)
    deg = jnp.take(adj.offsets, frontier + 1) - base

    if with_replacement:
        u = jax.random.uniform(key, (F, k))
        if biased:
            if ct is not None and F * k * ct.shape[1] <= _DENSE_CDF_MAX:
                crow = jnp.take(ct, frontier, axis=0)              # [F, D]
                wtot = jnp.take_along_axis(
                    crow, jnp.maximum(deg, 1)[:, None] - 1, axis=1)  # [F, 1]
                tgt = u * wtot                                     # [F, k]
                # first slot with cum >= tgt  ==  count of (cum < tgt);
                # +inf fill past each row's degree never counts
                off = jnp.sum(crow[:, None, :] < tgt[:, :, None],
                              axis=2).astype(jnp.int32)
                off = jnp.minimum(off, jnp.maximum(deg[:, None] - 1, 0))
                # clip: a trailing zero-degree row has base == nnz, which is
                # out of bounds when pad_e == nnz (consumers index weights
                # with eidx before applying the valid mask)
                eidx = jnp.clip(base[:, None] + off, 0, adj.pad_e - 1)
                valid = (deg > 0)[:, None] & jnp.ones((F, k), bool)
                dst = jnp.take_along_axis(jnp.take(nt, frontier, axis=0),
                                          off, axis=1)
                return dst, eidx, valid
            # inverse-CDF draw on the row's cumulative weights
            wtot = jnp.take(cumw, base + jnp.maximum(deg, 1) - 1)
            tgt = u * wtot[:, None]
            # binary search within the row for the first cumw >= tgt
            lo = jnp.broadcast_to(base[:, None], (F, k))
            hi = jnp.broadcast_to((base + deg)[:, None], (F, k))

            def body(_, state):
                lo, hi = state
                mid = (lo + hi) >> 1
                val = jnp.take(cumw, jnp.clip(mid, 0, adj.pad_e - 1))
                right = (val < tgt) & (lo < hi)
                lo = jnp.where(right, mid + 1, lo)
                hi = jnp.where(right | (lo >= hi), hi, mid)
                return lo, hi

            pos, _ = jax.lax.fori_loop(0, 32, body, (lo, hi))
            eidx = jnp.clip(pos, 0, adj.pad_e - 1)
        else:
            off = jnp.floor(u * deg[:, None]).astype(jnp.int32)
            off = jnp.minimum(off, jnp.maximum(deg[:, None] - 1, 0))
            eidx = jnp.clip(base[:, None] + off, 0, adj.pad_e - 1)
            if nt is not None:
                valid = (deg > 0)[:, None] & jnp.ones((F, k), bool)
                dst = jnp.take_along_axis(
                    jnp.take(nt, frontier, axis=0),
                    jnp.minimum(off, nt.shape[1] - 1), axis=1)
                return dst, eidx, valid
        valid = (deg > 0)[:, None] & jnp.ones((F, k), bool)
        dst = jnp.take(adj.indices, jnp.clip(eidx, 0, adj.pad_e - 1))
        return dst, eidx, valid

    # without replacement: Gumbel top-k over the (masked) neighbor tile.
    # k is clamped to max_deg (the reference caps at the degree and returns
    # every neighbor when the fanout exceeds it).
    k = min(k, max_deg)
    nbr, tile_valid, eidx_tile = enumerate_neighbors(adj, frontier, max_deg,
                                                     nbr_table=nt)
    gumbel = -jnp.log(-jnp.log(
        jax.random.uniform(key, (F, max_deg), minval=1e-20, maxval=1.0)))
    if biased:
        if wt is not None:
            wts = jnp.take(wt, frontier, axis=0)[:, :max_deg]
        else:
            wts = jnp.take(adj.weights, eidx_tile)
        score = jnp.where(tile_valid & (wts > 0),
                          jnp.log(jnp.maximum(wts, 1e-30)) + gumbel, -jnp.inf)
    else:
        score = jnp.where(tile_valid, gumbel, -jnp.inf)
    _, top = jax.lax.top_k(score, k)
    picked_valid = jnp.take_along_axis(tile_valid, top, axis=1) & \
        (jnp.take_along_axis(score, top, axis=1) > -jnp.inf)
    eidx = jnp.take_along_axis(eidx_tile, top, axis=1)
    if nt is not None:
        dst = jnp.take_along_axis(nbr, top, axis=1)
    else:
        dst = jnp.take(adj.indices, jnp.clip(eidx, 0, adj.pad_e - 1))
    return dst, eidx, picked_valid


def _fetch_tables(g: GraphStructure, weights: bool = False,
                  cum: bool = False):
    """(nbr_table, weight_table, cumweight_table) for the row-gather fast
    paths, or None when the padded table exceeds the memory budget (cached
    per CsrMatrix; must be called OUTSIDE jit)."""
    from cugraph_tpu.prims.neighbor_table import (
        cumweight_table,
        neighbor_table,
        tables_fit,
        weight_table,
    )

    adj = g.csr
    if adj.num_vertices == 0 or not tables_fit(adj):
        return None
    return (neighbor_table(adj),
            weight_table(adj) if weights else None,
            cumweight_table(adj) if cum else None)


def _row_cumweights(g: GraphStructure):
    """Per-row cumulative edge weights (resets at row starts)."""
    adj = g.csr
    w = np.asarray(adj.weights, dtype=np.float64)
    offs = np.asarray(adj.offsets)
    c = np.cumsum(w)
    rowstart_cum = c[np.maximum(offs[:-1] - 1, 0)] * (offs[:-1] > 0)
    per_edge_rowstart = np.repeat(rowstart_cum, np.diff(offs))
    return jnp.asarray((c - per_edge_rowstart).astype(np.float32))


# --------------------------------------------------------------------------
# Neighbor sampling (cugraph uniform_neighbor_sample API)
# --------------------------------------------------------------------------

# bulk semiring route (per_v_random_select) kicks in when the enumerate-tile
# F × max_deg footprint would exceed this
_BULK_SAMPLE_TILE = 16_000_000

# With replacement the gather path needs NO [F, max_deg] tile — it draws
# floor(u·deg) offsets and element-gathers F·k indices — so past the tile
# budget the choice is gather (F·k element gathers at ~0.12 G elem/s) vs
# k whole-graph 2-pass selects (2·E MXU-bound edges/round at ~1.7 G/s);
# k cancels.  Select only wins for near-all-vertex frontiers
# (F > ~0.14·E).  Constants from the calibrated TPU rates
# (docs/performance.md); the k=-1 and without-replacement paths still tile.
_BULK_GATHER_COST = 1.0 / 0.12e9     # s per element gather
_BULK_SELECT_COST = 1.0 / 1.7e9      # s per traversed edge (split SpMV)


def _host_weights(g: GraphStructure) -> np.ndarray:
    """Cached host copy of CSR weights — per-hop np.asarray would pay a
    fresh device→host transfer (2-3 s tunnel overhead, ~67 MB at RMAT-20)
    every hop."""
    from cugraph_tpu.prims.intersection import _host_csr

    return _host_csr(g.csr, True)[2]


def _eidx_lookup(g: GraphStructure, srcs, dsts, rng=None):
    """CSR edge index of each (src, dst) pair — vectorized binary search
    within row spans (host NumPy, cached CSR copies).  Default: the FIRST
    parallel instance.  With ``rng`` (a numpy Generator): a UNIFORM draw
    among the parallel instances — the exact conditional law of the bulk
    with-replacement prim, whose per-edge iid priorities make the winning
    instance uniform given its endpoint (the reference returns the actual
    traversed instance, gather_one_hop_impl.cuh; the law is identical)."""
    from cugraph_tpu.prims.intersection import _host_csr

    off, ind, _ = _host_csr(g.csr, False)
    lo = off[srcs].astype(np.int64)
    hi = off[srcs + 1].astype(np.int64)
    last = max(len(ind) - 1, 0)
    up = None
    if rng is not None:
        up = hi.copy()          # upper_bound search runs alongside
    for _ in range(34):
        mid = (lo + hi) >> 1
        v = ind[np.clip(mid, 0, last)]
        go = (v < dsts) & (lo < hi)
        lo = np.where(go, mid + 1, lo)
        hi = np.where(go | (lo >= hi), hi, mid)
    if up is None:
        return lo
    lo2 = lo.copy()
    for _ in range(34):
        mid = (lo2 + up) >> 1
        v = ind[np.clip(mid, 0, last)]
        go = (v <= dsts) & (lo2 < up)
        lo2 = np.where(go, mid + 1, lo2)
        up = np.where(go | (lo2 >= up), up, mid)
    count = np.maximum(lo2 - lo, 1)
    return lo + (rng.random(len(lo)) * count).astype(np.int64)


# without replacement, when no neighbor table fits, the device path
# materializes a [F, max_deg] Gumbel tile via ELEMENT gathers — which
# scalarize on this TPU (~0.12 G elem/s; measured 19.5 s/call at
# RMAT-20's 4096×23K hop-0 tile) — and past ~1.5 GB it would OOM HBM
# outright.  The host engine below samples in O(Σ frontier degrees)
# (one lexsort), so it wins everywhere except tiny tiles where dispatch
# overhead dominates.
_TILE_FALLBACK_ENTRIES = 4_000_000


def _host_sample_without_replacement(g, frontier, key, k, biased):
    """Host Gumbel-top-k without replacement over the frontier's adjacency
    (cached CSR): per-edge keys + one lexsort by (row, -key) + rank-within-
    row < min(k, deg).  Cost ∝ Σ frontier degrees — independent of max_deg,
    where the device tile path needs F × max_deg entries (3.7 GB at
    RMAT-20's 40K-row hop-1 frontier; this is the repo's sort-shaped-work-
    on-host rule).  Same sampling law as the device tile: uniform Gumbel
    top-k over the neighbor multiset, log-weight shifted when biased."""
    import jax

    from cugraph_tpu.prims.intersection import _host_csr

    off, ind, w = _host_csr(g.csr, biased)
    F = len(frontier)
    deg = (off[frontier + 1] - off[frontier]).astype(np.int64)
    kk = int(k)
    dst = np.full((F, kk), -1, np.int64)
    eidx = np.zeros((F, kk), np.int64)
    valid = np.zeros((F, kk), bool)
    if kk == 0 or not len(frontier):
        return dst, eidx, valid
    seed0 = int(np.asarray(jax.random.key_data(key)).reshape(-1)[-1])

    # HIGH-DEGREE uniform rows skip the sort entirely: the first k DISTINCT
    # values of an iid uniform draw sequence have exactly the law of
    # sampling without replacement, and at deg ≥ 4k² the chance that 2k
    # draws contain < k distinct is negligible (rare leftovers fall back to
    # the sort path).  Hub rows dominate Σ frontier degrees on power-law
    # graphs — this bounds the sorted portion at F·4k² edges (measured:
    # RMAT-20 hop-1 frontiers went from ~20 s of lexsort to ~1 s).
    rows_idx = np.arange(F)
    if not biased and kk >= 1:
        big = deg >= max(4 * kk * kk, 2 * kk)
        B = int(big.sum())
        if B:
            m = 2 * kk
            rngb = np.random.default_rng((seed0, 1))
            u = rngb.random((B, m))
            db = deg[big][:, None]
            cand = np.minimum((u * db).astype(np.int64), db - 1)
            acc = np.full((B, kk), -1, np.int64)
            cnt = np.zeros(B, np.int64)
            for j in range(m):
                cj = cand[:, j]
                dup = (acc == cj[:, None]).any(axis=1)
                take = (~dup) & (cnt < kk)
                acc[take, cnt[take]] = cj[take]
                cnt = cnt + take
            done = cnt >= kk
            rb = rows_idx[big][done]
            e_acc = off[frontier[big][done]].astype(np.int64)[:, None] \
                + acc[done]
            eidx[rb] = e_acc
            dst[rb] = ind[e_acc]
            valid[rb] = True
            # under-filled big rows (astronomically rare) join the sort path
            sort_rows = ~big
            sort_rows[rows_idx[big][~done]] = True
        else:
            sort_rows = ~big
        if not sort_rows.any():
            return dst, eidx, valid
        d_s, e_s, v_s = _host_sample_wr_sorted(off, ind, w,
                                               frontier[sort_rows],
                                               kk, biased, seed0)
        dst[sort_rows] = d_s
        eidx[sort_rows] = e_s
        valid[sort_rows] = v_s
        return dst, eidx, valid
    d2, e2, v2 = _host_sample_wr_sorted(off, ind, w, frontier, kk, biased,
                                        seed0)
    return d2, e2, v2


def _host_sample_wr_sorted(off, ind, w, frontier, kk, biased, seed0):
    """Lexsort Gumbel-top-k core over the given rows (see caller)."""
    F = len(frontier)
    deg = (off[frontier + 1] - off[frontier]).astype(np.int64)
    total = int(deg.sum())
    dst = np.full((F, kk), -1, np.int64)
    eidx = np.zeros((F, kk), np.int64)
    valid = np.zeros((F, kk), bool)
    if total == 0:
        return dst, eidx, valid
    rowptr = np.concatenate([[0], np.cumsum(deg)])
    rows = np.repeat(np.arange(F), deg)
    pos = np.arange(total) - np.repeat(rowptr[:-1], deg)
    e = np.repeat(off[frontier].astype(np.int64), deg) + pos
    rng = np.random.default_rng((seed0, 2))
    keys = rng.gumbel(size=total)
    if biased:
        wf = w[e].astype(np.float64)
        keys = np.where(wf > 0, keys + np.log(np.maximum(wf, 1e-300)),
                        -np.inf)
    order = np.lexsort((-keys, rows))
    rank = pos          # post-lexsort index within each row == slot offset
    rs, es, ks = rows[order], e[order], keys[order]
    take = (rank < kk) & (ks > -np.inf)
    rr, cc = rs[take], rank[take]
    eidx[rr, cc] = es[take]
    dst[rr, cc] = ind[es[take]]
    valid[rr, cc] = True
    return dst, eidx, valid


def _bulk_sample_with_replacement(G, g, frontier, key, k):
    """Fanout-k uniform sampling WITH replacement via k rounds of the
    semiring per_v_random_select prim (kernels/dispatch.py) — the TPU fast
    path for huge frontiers, where the enumerate-neighbors tile
    [F, max_deg] would not fit.  For parallel (multi-)edges the sampled
    NEIGHBOR distribution is multiplicity-weighted like the gather path,
    and edge attribution draws UNIFORMLY among the parallel instances —
    the prim's exact conditional law (see _eidx_lookup).
    Returns (dst [F, k], eidx [F, k], valid [F, k])."""
    import jax

    from cugraph_tpu.kernels.dispatch import per_v_random_select

    cols = []
    for _ in range(int(k)):
        key, sub = jax.random.split(key)
        sel = np.asarray(per_v_random_select(G, sub))
        cols.append(sel[frontier])
    dst = np.stack(cols, axis=1)
    valid = dst >= 0
    srcs_rep = np.repeat(frontier, int(k)).reshape(len(frontier), int(k))
    eidx = np.zeros_like(dst, dtype=np.int64)
    if valid.any():
        seed0 = int(np.asarray(jax.random.key_data(key)).reshape(-1)[-1])
        eidx[valid] = _eidx_lookup(g, srcs_rep[valid], dst[valid],
                                   rng=np.random.default_rng(seed0))
    return dst, eidx, valid


def _neighbor_sample(G, start_list, fanout_vals, with_replacement, biased,
                     random_state, with_edge_properties=False, *,
                     prior_sources_behavior="default",
                     dedupe_sources=False, return_hops=True,
                     batch_id_list=None):
    """Multi-hop sampling core with the reference's ``sampling_flags_t``
    semantics (sampling_functions.hpp:36-76):

    * frontiers are PER BATCH (label) and carry multiplicity — a vertex
      reached twice in one batch is passed twice to the next hop unless
      ``dedupe_sources`` (reference: "passed once (for each label)");
      two batches reaching the same vertex each sample independently;
    * ``prior_sources_behavior``: "default" (next frontier = sampled
      destinations), "carry_over" (+ all prior sources of the batch),
      "exclude" (drop destinations already used as a source in the batch);
    * ``return_hops`` controls the hop_id column;
    * ``batch_id_list`` labels each seed (defaults to one batch per seed).
    """
    g = G.structure
    seeds = normalize_start(G, start_list).astype(np.int32)
    key = jax.random.PRNGKey(random_state if random_state is not None else 0)
    n = G.number_of_vertices()
    max_deg = max(int(np.asarray(g.out_degrees())[:n].max()), 1) if n else 1
    tables = _fetch_tables(g, weights=biased, cum=biased)
    # cumw kept even when tables exist: the dense-CDF path falls back to the
    # binary search when F*k*D exceeds its tensor budget.  CACHED on the
    # Graph: the O(E) host cumsum + device upload costs seconds per call at
    # RMAT-20 scale (measured round 4) and is invariant across calls.
    cumw = None
    if biased:
        cumw = getattr(G, "_cumw_cache", None)
        if cumw is None:
            cumw = _row_cumweights(g)
            try:
                G._cumw_cache = cumw
            except AttributeError:
                pass
    from cugraph_tpu.algos._frontier import FrontierState

    state = FrontierState(seeds, np.arange(len(seeds), dtype=np.int32), n,
                          prior_sources_behavior=prior_sources_behavior,
                          dedupe_sources=dedupe_sources,
                          batch_id_list=batch_id_list)

    frames = []
    for hop, k in enumerate(fanout_vals):
        if len(state) == 0:
            break
        frontier, batch_ids, _ = state.begin_hop()
        key, sub = jax.random.split(key)
        if int(k) < 0:
            # k == -1 means "all neighbors" in the reference API
            nbr, valid, eidx = enumerate_neighbors(
                g.csr, jnp.asarray(frontier), max_deg,
                nbr_table=tables[0] if tables is not None else None)
            dst, eidx, valid = np.asarray(nbr), np.asarray(eidx), np.asarray(valid)
        elif (with_replacement and not biased
              and len(frontier) * max_deg > _BULK_SAMPLE_TILE
              and len(frontier) * _BULK_GATHER_COST
                  > 2 * int(g.csr.num_edges) * _BULK_SELECT_COST):
            from cugraph_tpu.kernels.dispatch import use_pallas

            # The bulk prim draws ONE neighbor per graph vertex per round, so
            # duplicate frontier rows would receive identical (perfectly
            # correlated) samples — and its in-kernel f32 id reconstruction
            # needs pad_v < 2^24.  Outside those bounds use the gather path.
            bulk_ok = (g.pad_v < (1 << 24)
                       and len(np.unique(frontier)) == len(frontier))
            if bulk_ok and use_pallas(G):
                try:
                    dst, eidx, valid = _bulk_sample_with_replacement(
                        G, g, frontier, sub, int(k))
                except ValueError:
                    # plan padding pushed pad_v past the prim's 2^24 id
                    # limit — take the gather path instead
                    bulk_ok = False
            if not (bulk_ok and use_pallas(G)):
                dst, eidx, valid = _sample_neighbors(
                    g, jnp.asarray(frontier), sub, int(k),
                    bool(with_replacement), bool(biased), max_deg, cumw,
                    tables)
                dst = np.asarray(dst)
                eidx = np.asarray(eidx)
                valid = np.asarray(valid)
        elif (not with_replacement and tables is None
              and len(frontier) * max_deg > _TILE_FALLBACK_ENTRIES):
            # the device Gumbel tile would not fit HBM — host engine
            dst, eidx, valid = _host_sample_without_replacement(
                g, np.asarray(frontier), sub, int(k), bool(biased))
        else:
            dst, eidx, valid = _sample_neighbors(
                g, jnp.asarray(frontier), sub, int(k),
                bool(with_replacement), bool(biased), max_deg, cumw, tables)
            dst, eidx, valid = np.asarray(dst), np.asarray(eidx), np.asarray(valid)
        kk = dst.shape[1]
        srcs = np.repeat(frontier, kk)
        bats = np.repeat(batch_ids, kk)
        flat_dst = dst.reshape(-1)
        flat_val = valid.reshape(-1)
        flat_eidx = eidx.reshape(-1)
        w = _host_weights(g)[flat_eidx]
        fr = pd.DataFrame({
            "sources": srcs[flat_val],
            "destinations": flat_dst[flat_val],
            "weight": w[flat_val],
            "hop_id": np.int32(hop),
            "batch_id": bats[flat_val],
        })
        if with_edge_properties:
            fr = _attach_edge_props(G, fr, flat_eidx[flat_val])
        frames.append(fr)
        # next frontier (prepare_next_frontier_impl.cuh): per-batch sampled
        # destinations WITH multiplicity; prior-source handling per flag
        state.advance(fr["destinations"].to_numpy().astype(np.int32),
                      fr["batch_id"].to_numpy())

    cols = ["sources", "destinations", "weight", "hop_id", "batch_id"]
    if not frames:
        return pd.DataFrame(columns=[c for c in cols
                                     if return_hops or c != "hop_id"])
    out = pd.concat(frames, ignore_index=True)
    out["sources"] = unrenumber_column(G, out["sources"].to_numpy())
    out["destinations"] = unrenumber_column(G, out["destinations"].to_numpy())
    if not return_hops:
        out = out.drop(columns=["hop_id"])
    return out


def _sampling_flags(kwargs: dict) -> dict:
    """Extract the reference sampling_flags_t knobs from a kwargs dict
    (sampling_functions.hpp:36-76); other reference-parity kwargs are
    accepted and ignored, as before.  ``deduplicate_sources`` is the pyx
    spelling of dedupe_sources."""
    from cugraph_tpu.algos._frontier import pop_dedupe_sources

    out = {}
    kw2 = dict(kwargs)
    dedupe = pop_dedupe_sources(kw2)
    if dedupe or "dedupe_sources" in kwargs or \
            "deduplicate_sources" in kwargs:
        out["dedupe_sources"] = dedupe
    for name in ("prior_sources_behavior", "return_hops", "batch_id_list"):
        if name in kwargs and kwargs[name] is not None:
            out[name] = kwargs[name]
    return out


def _check_disjoint(kw, temporal: bool):
    """disjoint_sampling acceptance: our per-batch frontiers are disjoint by
    construction; temporal sampling REQUIRES it (the reference raises on
    False — heterogeneous_*_temporal pyx:214-217)."""
    v = kw.get("disjoint_sampling")
    if temporal and v is False:
        raise ValueError("temporal sampling requires disjoint sampling")


def uniform_neighbor_sample(G, start_list, fanout_vals,
                            with_replacement: bool = True,
                            with_edge_properties: bool = False,
                            random_state=None, **kwargs):
    """Multi-hop uniform neighbor sampling (reference
    homogeneous_uniform_neighbor_sample, sampling_functions.hpp:505).
    Returns ['sources','destinations','weight','hop_id','batch_id']."""
    return _neighbor_sample(G, start_list, fanout_vals, with_replacement,
                            biased=False, random_state=random_state,
                            with_edge_properties=with_edge_properties,
                            **_sampling_flags(kwargs))


def homogeneous_uniform_neighbor_sample(G, start_list, fanout_vals, **kw):
    return uniform_neighbor_sample(G, start_list, fanout_vals, **kw)


def homogeneous_biased_neighbor_sample(G, start_list, fanout_vals,
                                       with_replacement: bool = True,
                                       random_state=None, **kw):
    """Edge-weight-biased sampling (reference
    homogeneous_biased_neighbor_sample)."""
    if not G.is_weighted():
        raise ValueError("biased sampling requires edge weights")
    return _neighbor_sample(
        G, start_list, fanout_vals, with_replacement, biased=True,
        random_state=random_state,
        with_edge_properties=bool(kw.get("with_edge_properties", False)),
        **_sampling_flags(kw))


# --------------------------------------------------------------------------
# Random walks
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("depth", "biased"))
def _walk_kernel(g: GraphStructure, starts: jax.Array, key: jax.Array,
                 depth: int, biased: bool, cumw: jax.Array | None,
                 tables=None):
    """Uniform or weight-biased first-order walks.
    Returns (paths [W, depth+1], edge weights [W, depth]).

    With ``tables`` (prims.neighbor_table triple) each step is one row
    gather + take_along_axis; the biased draw is a dense per-row
    comparison count on the cumulative-weight table."""
    adj = g.csr
    W = starts.shape[0]
    SENT = jnp.int32(-1)
    nt, wt, ct = tables if tables is not None else (None, None, None)

    def step(carry, i):
        cur, k = carry
        k, sub = jax.random.split(k)
        safe = jnp.clip(cur, 0, adj.pad_v - 1)
        base = jnp.take(adj.offsets, safe)
        deg = jnp.take(adj.offsets, safe + 1) - base
        u = jax.random.uniform(sub, (W,))
        if biased:
            if ct is not None:
                crow = jnp.take(ct, safe, axis=0)                  # [W, D]
                wtot = jnp.take_along_axis(
                    crow, jnp.maximum(deg, 1)[:, None] - 1, axis=1)[:, 0]
                tgt = u * wtot
                off = jnp.sum(crow < tgt[:, None], axis=1).astype(jnp.int32)
                off = jnp.minimum(off, jnp.maximum(deg - 1, 0))
            else:
                wtot = jnp.take(cumw, base + jnp.maximum(deg, 1) - 1)
                tgt = u * wtot
                lo, hi = base, base + deg

                def body(_, st):
                    lo, hi = st
                    mid = (lo + hi) >> 1
                    val = jnp.take(cumw, jnp.clip(mid, 0, adj.pad_e - 1))
                    right = (val < tgt) & (lo < hi)
                    lo = jnp.where(right, mid + 1, lo)
                    hi = jnp.where(right | (lo >= hi), hi, mid)
                    return lo, hi

                pos, _ = jax.lax.fori_loop(0, 32, body, (lo, hi))
                off = jnp.clip(pos, 0, adj.pad_e - 1) - base
        else:
            off = jnp.minimum(jnp.floor(u * deg).astype(jnp.int32),
                              jnp.maximum(deg - 1, 0))
        if nt is not None:
            offc = jnp.minimum(off, nt.shape[1] - 1)[:, None]
            nxt = jnp.take_along_axis(jnp.take(nt, safe, axis=0),
                                      offc, axis=1)[:, 0]
            wnext = jnp.take_along_axis(jnp.take(wt, safe, axis=0),
                                        offc, axis=1)[:, 0] \
                if wt is not None else \
                jnp.take(adj.weights, jnp.clip(base + off, 0, adj.pad_e - 1))
        else:
            eidx = jnp.clip(base + off, 0, adj.pad_e - 1)
            nxt = jnp.take(adj.indices, eidx)
            wnext = jnp.take(adj.weights, eidx)
        dead = (deg <= 0) | (cur == SENT)
        nxt = jnp.where(dead, SENT, nxt)
        wstep = jnp.where(dead, 0.0, wnext)
        return (nxt, k), (nxt, wstep)

    (_, _), (path_tail, wsteps) = jax.lax.scan(step, (starts, key),
                                               jnp.arange(depth))
    paths = jnp.concatenate([starts[None, :], path_tail], axis=0).T
    return paths, wsteps.T


def random_walks(G, start_vertices, max_depth: int, use_padding: bool = True,
                 legacy_result_type=None, random_state=None):
    """Uniform random walks (reference uniform_random_walks,
    random_walks_impl.cuh:894).  Returns (vertex_paths, edge_weight_paths,
    max_path_length) in the reference's padded layout: -1 marks early
    termination at a sink vertex."""
    g = G.structure
    starts = normalize_start(G, start_vertices).astype(np.int32)
    key = jax.random.PRNGKey(random_state if random_state is not None else 0)
    paths, wsteps = _walk_kernel(g, jnp.asarray(starts), key, int(max_depth),
                                 False, None, _fetch_tables(g, weights=True))
    paths = np.asarray(paths)
    wsteps = np.asarray(wsteps)
    vp = unrenumber_column(G, paths.reshape(-1), sentinel=-1)
    return (pd.Series(vp), pd.Series(wsteps.reshape(-1)), int(max_depth))


def uniform_random_walks(G, start_vertices, max_depth: int, random_state=None):
    return random_walks(G, start_vertices, max_depth, random_state=random_state)


def biased_random_walks(G, start_vertices, max_depth: int, random_state=None):
    """Edge-weight-biased walks (reference biased_random_walks)."""
    if not G.is_weighted():
        raise ValueError("biased walks require edge weights")
    g = G.structure
    starts = normalize_start(G, start_vertices).astype(np.int32)
    key = jax.random.PRNGKey(random_state if random_state is not None else 0)
    cumw = _row_cumweights(g)
    paths, wsteps = _walk_kernel(g, jnp.asarray(starts), key, int(max_depth),
                                 True, cumw,
                                 _fetch_tables(g, weights=True, cum=True))
    vp = unrenumber_column(G, np.asarray(paths).reshape(-1), sentinel=-1)
    return (pd.Series(vp), pd.Series(np.asarray(wsteps).reshape(-1)),
            int(max_depth))


# per-step dense membership tensor budget ([W, max_deg, D] compares)
_N2V_DENSE_MAX = 64_000_000


@partial(jax.jit, static_argnames=("depth", "max_deg"))
def _node2vec_kernel(g: GraphStructure, starts: jax.Array, key: jax.Array,
                     depth: int, p: float, q: float, max_deg: int,
                     tables=None):
    """Second-order biased walks (Grover & Leskovec).  Per step, candidate
    neighbors of cur are re-weighted 1/p (back to prev), 1 (distance-1 from
    prev: candidate is a neighbor of prev), 1/q (distance-2); draw via
    categorical over the [W, max_deg] tile.

    With ``tables`` the neighbor/weight tiles come from row gathers, and the
    distance-1 membership test becomes one dense [W, max_deg, D] equality
    sweep against prev's table row (sentinel cells ≥ pad_v never equal a
    real candidate id) instead of a 32-step binary search."""
    adj = g.csr
    W = starts.shape[0]
    SENT = jnp.int32(-1)
    nt, wt, _ = tables if tables is not None else (None, None, None)
    dense_near = (nt is not None
                  and W * max_deg * nt.shape[1] <= _N2V_DENSE_MAX)

    def step(carry, i):
        cur, prev, k = carry
        k, sub = jax.random.split(k)
        safe_cur = jnp.clip(cur, 0, adj.pad_v - 1)
        nbr, valid, eidx = enumerate_neighbors(adj, safe_cur, max_deg,
                                               nbr_table=nt)
        if wt is not None:
            w = jnp.take(wt, safe_cur, axis=0)[:, :max_deg]
        else:
            w = jnp.take(adj.weights, eidx)
        has_prev = prev >= 0
        safe_prev = jnp.clip(prev, 0, adj.pad_v - 1)
        is_back = nbr == prev[:, None]
        if dense_near:
            prev_row = jnp.take(nt, safe_prev, axis=0)     # [W, D]
            # candidate sentinels (≥ pad_v) can equal prev-row sentinels,
            # but those lanes are valid=False → score-masked below
            near = jnp.any(nbr[:, :, None] == prev_row[:, None, :], axis=2)
        else:
            near, _ = lower_bound_rows(adj, safe_prev[:, None], nbr)
        factor = jnp.where(is_back, 1.0 / p,
                           jnp.where(near, 1.0, 1.0 / q))
        factor = jnp.where(has_prev[:, None], factor, 1.0)
        score = jnp.where(valid, w * factor, 0.0)
        tot = jnp.sum(score, axis=1)
        u = jax.random.uniform(sub, (W,)) * tot
        cdf = jnp.cumsum(score, axis=1)
        pick = jnp.sum((cdf < u[:, None]).astype(jnp.int32), axis=1)
        pick = jnp.minimum(pick, max_deg - 1)
        if nt is not None:
            nxt = jnp.take_along_axis(nbr, pick[:, None], axis=1)[:, 0]
            wnext = jnp.take_along_axis(w, pick[:, None], axis=1)[:, 0]
        else:
            e_pick = jnp.take_along_axis(eidx, pick[:, None], axis=1)[:, 0]
            nxt = jnp.take(adj.indices, e_pick)
            wnext = jnp.take(adj.weights, e_pick)
        dead = (tot <= 0) | (cur == SENT)
        nxt = jnp.where(dead, SENT, nxt)
        wstep = jnp.where(dead, 0.0, wnext)
        return (nxt, cur, k), (nxt, wstep)  # prev <- cur after the move

    (_, _, _), (tail, wsteps) = jax.lax.scan(
        step, (starts, jnp.full((W,), SENT), key), jnp.arange(depth))
    paths = jnp.concatenate([starts[None, :], tail], axis=0).T
    return paths, wsteps.T


def node2vec_random_walks(G, start_vertices, max_depth: int, p: float = 1.0,
                          q: float = 1.0, random_state=None):
    """node2vec walks (reference node2vec_random_walks,
    random_walks_impl.cuh:933)."""
    g = G.structure
    n = G.number_of_vertices()
    starts = normalize_start(G, start_vertices).astype(np.int32)
    key = jax.random.PRNGKey(random_state if random_state is not None else 0)
    max_deg = max(int(np.asarray(g.out_degrees())[:n].max()), 1)
    paths, wsteps = _node2vec_kernel(g, jnp.asarray(starts), key,
                                     int(max_depth), float(p), float(q),
                                     max_deg, _fetch_tables(g, weights=True))
    vp = unrenumber_column(G, np.asarray(paths).reshape(-1), sentinel=-1)
    return (pd.Series(vp), pd.Series(np.asarray(wsteps).reshape(-1)),
            int(max_depth))


def node2vec(G, start_vertices, max_depth: int, compress_result=False,
             p: float = 1.0, q: float = 1.0):
    return node2vec_random_walks(G, start_vertices, max_depth, p=p, q=q)


# --------------------------------------------------------------------------
# Negative sampling
# --------------------------------------------------------------------------

def negative_sampling(G, num_samples: int, vertices=None, src_bias=None,
                      dst_bias=None, remove_duplicates: bool = True,
                      remove_existing_edges: bool = True,
                      exact_number_of_samples: bool = False,
                      random_state=None):
    """Sample (src, dst) pairs that are NOT edges (reference
    negative_sampling_impl.cuh:270: biased draws + dedup + edge exclusion).
    Uniform endpoint draws when src_bias/dst_bias are None; biases pair
    with ``vertices`` when given, else with G.nodes() external order
    (reference negative_sampling_impl.cuh:270 degree-biased usage = pass
    the degree arrays)."""
    g = G.structure
    n = G.number_of_vertices()
    seed0 = int(random_state) if random_state is not None else 0
    rng_key = jax.random.PRNGKey(seed0)
    want = int(num_samples)
    out_s, out_d = [], []
    have = 0
    attempt = 0
    sb = None if src_bias is None else np.asarray(src_bias, np.float64)
    db = None if dst_bias is None else np.asarray(dst_bias, np.float64)
    cand = None if vertices is None else np.asarray(
        G.lookup_internal_vertex_id(np.asarray(vertices)), np.int32)
    # bias arrays pair with the CANDIDATE list when given (reference
    # negative_sampling contract), else with G.nodes() external order —
    # never raw internal ids (renumbering would scramble the pairing)
    for name, b in (("src_bias", sb), ("dst_bias", db)):
        if b is not None:
            expect = len(cand) if cand is not None else n
            if len(b) != expect:
                raise ValueError(
                    f"{name} must have length {expect} (one entry per "
                    f"{'candidate vertex' if cand is not None else 'vertex'})")
    if cand is None and (sb is not None or db is not None):
        # align external-node-order biases with internal ids
        order = np.asarray(G.lookup_internal_vertex_id(G.nodes()))
        if sb is not None:
            t = np.zeros(n); t[order] = sb; sb = t
        if db is not None:
            t = np.zeros(n); t[order] = db; db = t
    while have < want and attempt < 16:
        rng_key, k1, k2 = jax.random.split(rng_key, 3)
        m = max(2 * (want - have), 1024)
        if sb is None:
            if cand is None:
                s = np.asarray(jax.random.randint(k1, (m,), 0, n), np.int32)
            else:
                pick = np.asarray(jax.random.randint(k1, (m,), 0, len(cand)))
                s = cand[pick]
        elif cand is None:
            s = np.random.default_rng((seed0, attempt)).choice(
                n, m, p=sb / sb.sum()).astype(np.int32)
        else:
            pick = np.random.default_rng((seed0, attempt)).choice(
                len(cand), m, p=sb / sb.sum())
            s = cand[pick]
        if db is None:
            if cand is None:
                d = np.asarray(jax.random.randint(k2, (m,), 0, n), np.int32)
            else:
                pick = np.asarray(jax.random.randint(k2, (m,), 0, len(cand)))
                d = cand[pick]
        elif cand is None:
            d = np.random.default_rng((seed0, attempt, 99)).choice(
                n, m, p=db / db.sum()).astype(np.int32)
        else:
            pick = np.random.default_rng((seed0, attempt, 99)).choice(
                len(cand), m, p=db / db.sum())
            d = cand[pick]
        if remove_existing_edges:
            found, _ = lower_bound_rows(g.csr, jnp.asarray(s), jnp.asarray(d))
            mask = ~np.asarray(found)
        else:
            mask = np.ones(m, bool)
        mask &= s != d
        out_s.append(s[mask]); out_d.append(d[mask])
        have = sum(len(x) for x in out_s)
        attempt += 1
        if remove_duplicates:
            ss = np.concatenate(out_s); dd = np.concatenate(out_d)
            key64 = ss.astype(np.int64) * n + dd
            _, idx = np.unique(key64, return_index=True)
            out_s = [ss[np.sort(idx)]]; out_d = [dd[np.sort(idx)]]
            have = len(out_s[0])
    ss = np.concatenate(out_s)[:want]
    dd = np.concatenate(out_d)[:want]
    if exact_number_of_samples and len(ss) < want:
        raise RuntimeError(
            f"could not draw {want} negative samples (got {len(ss)}) — "
            "candidate space too small after dedup/exclusion")
    return pd.DataFrame({
        "src": G.number_map.to_external(ss),
        "dst": G.number_map.to_external(dd),
    })


# --------------------------------------------------------------------------
# Edge-property plumbing, heterogeneous + temporal sampling
# (reference: 8 neighbor-sample variants, sampling_functions.hpp:505+,
#  temporal_sampling_impl.cuh; fanouts per edge type for heterogeneous)
# --------------------------------------------------------------------------

def _csr_perm(G):
    """Permutation mapping original edge order → CSR (src-sorted) order,
    cached; used to align edge properties with structure edge indices."""
    perm = getattr(G, "_csr_perm_cache", None)
    if perm is None:
        src, dst, _ = G.edgelist_arrays()
        perm = np.lexsort((dst, src))
        G._csr_perm_cache = perm
    return perm


def _csr_prop(G, prop):
    """An edge-property array re-ordered to CSR edge positions, padded."""
    perm = _csr_perm(G)
    pad_e = G.structure.csr.pad_e
    out = np.zeros(pad_e, dtype=np.asarray(prop).dtype)
    out[: len(perm)] = np.asarray(prop)[perm]
    return out


@partial(jax.jit, static_argnames=("k", "max_deg", "comparison", "biased"))
def _sample_neighbors_masked(g: GraphStructure, frontier: jax.Array,
                             key: jax.Array, k: int, max_deg: int,
                             edge_ok: jax.Array,
                             seed_times: jax.Array | None,
                             edge_times: jax.Array | None,
                             comparison: str = "strictly_increasing",
                             biased: bool = False,
                             tables=None, ok_tab: jax.Array | None = None,
                             time_tab: jax.Array | None = None):
    """Gumbel top-k sampling restricted to an eligibility mask — the masked
    analog of per_v_random_select_transform_outgoing_e used by the
    heterogeneous (per-edge-type) and temporal variants.  ``biased`` adds
    log(edge weight) to the Gumbel scores (exact weighted sampling without
    replacement — the biased-variant semantics of
    temporal_sampling_impl.cuh).

    Table mode (``tables``/``ok_tab``/``time_tab`` — [pad_v, D] row views
    from prims.neighbor_table): all per-edge lookups become row gathers;
    ``edge_ok``/``edge_times`` are then unused and may be None."""
    adj = g.csr
    F = frontier.shape[0]
    nt, wt, _ = tables if tables is not None else (None, None, None)
    nbr, tile_valid, eidx_tile = enumerate_neighbors(adj, frontier, max_deg,
                                                     nbr_table=nt)
    safe = jnp.clip(eidx_tile, 0, adj.pad_e - 1)
    if ok_tab is not None:
        ok = tile_valid & jnp.take(ok_tab, frontier, axis=0)[:, :max_deg]
    else:
        ok = tile_valid & jnp.take(edge_ok, safe)
    if time_tab is not None or edge_times is not None:
        if time_tab is not None:
            t = jnp.take(time_tab, frontier, axis=0)[:, :max_deg]
        else:
            t = jnp.take(edge_times, safe)
        from cugraph_tpu.algos._frontier import temporal_eligible

        lim = seed_times[:, None]
        ok = ok & temporal_eligible(t, lim, comparison)
    else:
        t = None
    if comparison == "last" and t is not None:
        # recency sampling: the k MOST RECENT past edges, deterministic
        # (reference temporal_sampling_comparison_t::LAST)
        score = jnp.where(ok, t, -jnp.inf)
    else:
        gumbel = -jnp.log(-jnp.log(
            jax.random.uniform(key, (F, max_deg), minval=1e-20, maxval=1.0)))
        if biased:
            if wt is not None:
                wts = jnp.take(wt, frontier, axis=0)[:, :max_deg]
            else:
                wts = jnp.take(adj.weights, safe)
            ok = ok & (wts > 0)
            gumbel = gumbel + jnp.log(jnp.maximum(wts, 1e-30))
        score = jnp.where(ok, gumbel, -jnp.inf)
    _, top = jax.lax.top_k(score, min(k, max_deg))
    picked = jnp.take_along_axis(score, top, axis=1) > -jnp.inf
    eidx = jnp.take_along_axis(eidx_tile, top, axis=1)
    if nt is not None:
        dst = jnp.take_along_axis(nbr, top, axis=1)
    else:
        dst = jnp.take(adj.indices, jnp.clip(eidx, 0, adj.pad_e - 1))
    return dst, eidx, picked


def _attach_edge_props(G, frame, eidx):
    if G.edge_ids is not None:
        frame["edge_id"] = _csr_prop(G, G.edge_ids)[eidx]
    if G.edge_types is not None:
        frame["edge_type"] = _csr_prop(G, G.edge_types)[eidx]
    if G.edge_times is not None:
        frame["edge_time"] = _csr_prop(G, G.edge_times)[eidx]
    return frame


def _masked_neighbor_sample(G, start_list, fanouts_per_hop, *, masks_by_type,
                            random_state=None, seed_time=None, strict=True,
                            biased=False, prior_sources_behavior="default",
                            dedupe_sources=False, return_hops=True,
                            batch_id_list=None,
                            temporal_sampling_comparison=None):
    """Shared driver: per hop, per (type, fanout) masked sampling.

    fanouts_per_hop: list of lists [(type_key, k), ...] per hop.
    masks_by_type: type_key → bool [pad_e] eligibility in CSR edge order.
    Flag semantics match _neighbor_sample (sampling_functions.hpp:36-76).
    """
    g = G.structure
    seeds = normalize_start(G, start_list).astype(np.int32)
    key = jax.random.PRNGKey(random_state if random_state is not None else 0)
    n = G.number_of_vertices()
    max_deg = max(int(np.asarray(g.out_degrees())[:n].max()), 1) if n else 1
    from cugraph_tpu.algos._frontier import (FrontierState,
                                             resolve_temporal_comparison)

    comparison = resolve_temporal_comparison(temporal_sampling_comparison,
                                             strict)

    et_host = (_csr_prop(G, G.edge_times).astype(np.float32)
               if G.edge_times is not None and seed_time is not None else None)
    times = None
    if et_host is not None:
        t0 = np.broadcast_to(np.asarray(seed_time, np.float32),
                             (len(seeds),)).astype(np.float32)
        times = t0

    # row-gather fast path: [pad_v, D] table views of the per-edge mask /
    # time / weight arrays, built once per call (prims/neighbor_table.py)
    tables = _fetch_tables(g, weights=biased)
    ok_tabs = time_tab = None
    edge_times = None
    if tables is not None:
        from cugraph_tpu.prims.neighbor_table import edge_value_table

        ok_tabs = {tk: jnp.asarray(edge_value_table(
            g.csr, np.asarray(mask), False, np.bool_))
            for tk, mask in masks_by_type.items()}
        if et_host is not None:
            time_tab = jnp.asarray(edge_value_table(
                g.csr, et_host, np.float32(0.0), np.float32))
    elif et_host is not None:
        edge_times = jnp.asarray(et_host)

    frames = []
    state = FrontierState(seeds, np.arange(len(seeds), dtype=np.int32), n,
                          prior_sources_behavior=prior_sources_behavior,
                          dedupe_sources=dedupe_sources, times=times,
                          batch_id_list=batch_id_list)
    for hop, fanouts in enumerate(fanouts_per_hop):
        if len(state) == 0:
            break
        frontier, batch_ids, times = state.begin_hop()
        hop_frames = []
        for type_key, k in fanouts:
            if int(k) == 0:
                continue
            # k == -1 means "all eligible neighbors" (reference fanout
            # contract): the Gumbel top-max_deg pick returns every valid
            # lane, so it degrades to full enumeration
            kk = max_deg if int(k) < 0 else int(k)
            key, sub = jax.random.split(key)
            dst, eidx, valid = _sample_neighbors_masked(
                g, jnp.asarray(frontier), sub, kk, max_deg,
                masks_by_type[type_key] if tables is None else None,
                jnp.asarray(times) if times is not None else None,
                edge_times, comparison, biased, tables,
                ok_tabs[type_key] if ok_tabs is not None else None,
                time_tab)
            dst = np.asarray(dst); eidx = np.asarray(eidx)
            valid = np.asarray(valid)
            kk = dst.shape[1]
            srcs = np.repeat(frontier, kk)
            bats = np.repeat(batch_ids, kk)
            flat = valid.reshape(-1)
            fe = eidx.reshape(-1)[flat]
            fr = pd.DataFrame({
                "sources": srcs[flat],
                "destinations": dst.reshape(-1)[flat],
                "weight": _host_weights(g)[fe],
                "hop_id": np.int32(hop),
                "batch_id": bats[flat],
            })
            fr = _attach_edge_props(G, fr, fe)
            hop_frames.append(fr)
        if not hop_frames:
            break
        hf = pd.concat(hop_frames, ignore_index=True)
        frames.append(hf)
        # next frontier: per-batch destinations WITH multiplicity (each row
        # carries its traversed edge's time on the temporal path)
        state.advance(hf["destinations"].to_numpy().astype(np.int32),
                      hf["batch_id"].to_numpy(),
                      hf["edge_time"].to_numpy().astype(np.float32)
                      if times is not None else None)

    cols = ["sources", "destinations", "weight", "hop_id", "batch_id"]
    if not frames:
        return pd.DataFrame(columns=[c for c in cols
                                     if return_hops or c != "hop_id"])
    out = pd.concat(frames, ignore_index=True)
    out["sources"] = unrenumber_column(G, out["sources"].to_numpy())
    out["destinations"] = unrenumber_column(G, out["destinations"].to_numpy())
    if not return_hops:
        out = out.drop(columns=["hop_id"])
    return out


def _type_masks(G):
    """bool [pad_e] CSR-order eligibility mask per edge type."""
    if G.edge_types is None:
        raise ValueError("heterogeneous sampling requires edge_type on the graph")
    et = _csr_prop(G, G.edge_types)
    types = np.unique(np.asarray(G.edge_types))
    pad_e = G.structure.csr.pad_e
    m = G.structure.csr.num_edges  # INTERNAL count (symmetrized CSR slots)
    valid = np.zeros(pad_e, bool)
    valid[:m] = True
    return {int(t): jnp.asarray((et == t) & valid) for t in types}, types


def heterogeneous_uniform_neighbor_sample(G, start_list, fanout_vals,
                                          num_edge_types: int | None = None,
                                          random_state=None, **kw):
    """Per-edge-type fanouts (reference
    heterogeneous_uniform_neighbor_sample.pyx): ``fanout_vals`` is flattened
    [hop0_type0, hop0_type1, ..., hop1_type0, ...]."""
    masks, fanouts_per_hop = _het_fanouts(G, fanout_vals, num_edge_types)
    return _masked_neighbor_sample(G, start_list, fanouts_per_hop,
                                   masks_by_type=masks,
                                   random_state=random_state,
                                   **_sampling_flags(kw))


def _het_fanouts(G, fanout_vals, num_edge_types):
    masks, types = _type_masks(G)
    ntypes = num_edge_types or int(types.max()) + 1
    fv = list(fanout_vals)
    if len(fv) % ntypes != 0:
        raise ValueError("fanout_vals must be hops × num_edge_types "
                         f"(got {len(fv)} for {ntypes} edge types)")
    hops = [fv[i:i + ntypes] for i in range(0, len(fv), ntypes)]
    # fanout slot t applies to edge-TYPE-ID t (reference contract:
    # h_fanout[hop·num_edge_types + edge_type]); absent types are skipped
    return masks, [
        [(t, k) for t, k in enumerate(hop_fans) if t in masks]
        for hop_fans in hops
    ]


def heterogeneous_biased_neighbor_sample(G, start_list, fanout_vals,
                                         num_edge_types: int | None = None,
                                         random_state=None, **kw):
    """Per-edge-type fanouts with edge-weight-biased selection within each
    type (reference heterogeneous_biased_neighbor_sample.pyx — the weighted
    Gumbel top-k over the type-eligible edges)."""
    if not G.is_weighted():
        raise ValueError("biased sampling requires edge weights")
    masks, fanouts_per_hop = _het_fanouts(G, fanout_vals, num_edge_types)
    return _masked_neighbor_sample(G, start_list, fanouts_per_hop,
                                   masks_by_type=masks,
                                   random_state=random_state, biased=True,
                                   **_sampling_flags(kw))


def homogeneous_biased_temporal_neighbor_sample(
        G, start_list, fanout_vals, seed_time=0.0, strict: bool = True,
        random_state=None, **kw):
    """Weight-biased temporal sampling: eligibility by time monotonicity,
    selection ∝ edge weight (reference temporal_sampling_impl.cuh biased
    instantiation, sampling_functions.hpp:505+)."""
    if not G.is_weighted():
        raise ValueError("biased sampling requires edge weights")
    if G.edge_times is None:
        raise ValueError("temporal sampling requires edge_time on the graph")
    _check_disjoint(kw, temporal=True)
    pad_e = G.structure.csr.pad_e
    m = G.structure.csr.num_edges
    all_ok = np.zeros(pad_e, bool)
    all_ok[:m] = True
    masks = {0: jnp.asarray(all_ok)}
    fanouts_per_hop = [[(0, k)] for k in fanout_vals]
    return _masked_neighbor_sample(G, start_list, fanouts_per_hop,
                                   masks_by_type=masks,
                                   random_state=random_state,
                                   seed_time=seed_time, strict=strict,
                                   biased=True,
                                   temporal_sampling_comparison=kw.get(
                                       "temporal_sampling_comparison"),
                                   **_sampling_flags(kw))


def heterogeneous_biased_temporal_neighbor_sample(
        G, start_list, fanout_vals, num_edge_types: int | None = None,
        seed_time=0.0, strict: bool = True, random_state=None, **kw):
    """Per-type fanouts × weight bias × temporal eligibility — the 8th
    reference sampling variant (heterogeneous_biased_temporal pyx)."""
    if not G.is_weighted():
        raise ValueError("biased sampling requires edge weights")
    if G.edge_times is None:
        raise ValueError("temporal sampling requires edge_time on the graph")
    _check_disjoint(kw, temporal=True)
    masks, fanouts_per_hop = _het_fanouts(G, fanout_vals, num_edge_types)
    return _masked_neighbor_sample(G, start_list, fanouts_per_hop,
                                   masks_by_type=masks,
                                   random_state=random_state,
                                   seed_time=seed_time, strict=strict,
                                   biased=True,
                                   temporal_sampling_comparison=kw.get(
                                       "temporal_sampling_comparison"),
                                   **_sampling_flags(kw))


def homogeneous_uniform_temporal_neighbor_sample(
        G, start_list, fanout_vals, seed_time=0.0, strict: bool = True,
        random_state=None, **kw):
    """Temporal sampling: only edges with time > (≥ when strict=False) the
    seed's time are eligible; sampled vertices inherit the traversed edge's
    time (reference temporal_sampling_impl.cuh comparison semantics,
    sampling_functions.hpp:75)."""
    if G.edge_times is None:
        raise ValueError("temporal sampling requires edge_time on the graph")
    _check_disjoint(kw, temporal=True)
    pad_e = G.structure.csr.pad_e
    m = G.structure.csr.num_edges  # internal (symmetrized) edge count
    all_ok = np.zeros(pad_e, bool)
    all_ok[:m] = True
    masks = {0: jnp.asarray(all_ok)}
    fanouts_per_hop = [[(0, k)] for k in fanout_vals]
    return _masked_neighbor_sample(G, start_list, fanouts_per_hop,
                                   masks_by_type=masks,
                                   random_state=random_state,
                                   seed_time=seed_time, strict=strict,
                                   temporal_sampling_comparison=kw.get(
                                       "temporal_sampling_comparison"),
                                   **_sampling_flags(kw))


def heterogeneous_uniform_temporal_neighbor_sample(
        G, start_list, fanout_vals, num_edge_types: int | None = None,
        seed_time=0.0, strict: bool = True, random_state=None, **kw):
    if G.edge_times is None:
        raise ValueError("temporal sampling requires edge_time on the graph")
    _check_disjoint(kw, temporal=True)
    masks, fanouts_per_hop = _het_fanouts(G, fanout_vals, num_edge_types)
    return _masked_neighbor_sample(G, start_list, fanouts_per_hop,
                                   masks_by_type=masks,
                                   random_state=random_state,
                                   seed_time=seed_time, strict=strict,
                                   temporal_sampling_comparison=kw.get(
                                       "temporal_sampling_comparison"),
                                   **_sampling_flags(kw))
