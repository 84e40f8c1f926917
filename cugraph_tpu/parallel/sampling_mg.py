"""Distributed multi-hop neighbor sampling (the MG GNN feed path).

Reference: sampling/neighbor_sampling_impl.cuh:166 per-hop loop +
prepare_next_frontier_impl.cuh (frontier maintenance per label) +
sampling_functions.hpp:36-76 (``sampling_flags_t`` semantics), MG mechanics
in prims/detail/sample_and_compute_local_nbr_indices.cuh.

Design: the one-hop engine (``mg_sample_one_hop``, parallel/algos.py) draws k
out-neighbors per GRAPH VERTEX as owner-sharded [pad_v, k] panels.  The
reference samples per (vertex, label) KEY — a vertex in two batches (or twice
in one batch without ``dedupe_sources``) draws independently per occurrence.
We recover key semantics by OCCURRENCE LAYERING: frontier (vertex, batch)
pairs are ranked per vertex, and layer r (the r-th occurrence of every
vertex) runs one one-hop round with its own RNG stream.  GNN minibatch
frontiers have small multiplicity, so this costs ~1-2 rounds per hop.

Per-edge properties (weight / edge_type / edge_time) ride the sampled rows
via a sorted (src,dst)-key table decompressed once per DistGraph from the
pull blocks (multi-edges resolve to the first key match — exact whenever
parallel edges carry equal properties or the graph was built with
drop_multi_edges).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from cugraph_tpu.parallel.partition import DistGraph


def _host_eprop_table(g: DistGraph):
    """Sorted (src·pad_v + dst) key table with weight/etype/etime payloads
    (cached per DistGraph like _host_coo)."""
    cached = getattr(g, "_host_eprop_table", None)
    if cached is not None:
        return cached
    pmaj, pmin, chunk = g.pmaj, g.pmin, g.chunk
    B = pmin * chunk
    src_loc = np.asarray(g.pull.src_loc)
    dst_loc = np.asarray(g.pull.dst_loc)
    w = np.asarray(g.pull.weight)
    valid = np.asarray(g.pull.valid)
    et = None if g.pull.etype is None else np.asarray(g.pull.etype)
    tm = None if g.pull.etime is None else np.asarray(g.pull.etime)
    srcs, dsts, ws, ets, tms = [], [], [], [], []
    for i in range(pmaj):
        for j in range(pmin):
            v = valid[i, j]
            s = i * B + src_loc[i, j][v]
            dl = dst_loc[i, j][v]
            d = (dl // chunk * pmin + j) * chunk + dl % chunk
            srcs.append(s)
            dsts.append(d)
            ws.append(w[i, j][v])
            if et is not None:
                ets.append(et[i, j][v])
            if tm is not None:
                tms.append(tm[i, j][v])
    src = np.concatenate(srcs).astype(np.int64)
    dst = np.concatenate(dsts).astype(np.int64)
    key = src * g.pad_v + dst
    order = np.argsort(key, kind="stable")
    table = {
        "keys": key[order],
        "weight": np.concatenate(ws).astype(np.float32)[order],
        "etype": (np.concatenate(ets)[order] if et is not None else None),
        "etime": (np.concatenate(tms).astype(np.float32)[order]
                  if tm is not None else None),
    }
    object.__setattr__(g, "_host_eprop_table", table)
    return table


def _host_eprop_by_eid(g: DistGraph):
    """Edge-INSTANCE-indexed property arrays decompressed from the push
    blocks (cached per DistGraph).  weight[eid] / etype[eid] / etime[eid] —
    the exact attribution table for samplers that return the traversed
    instance id."""
    cached = getattr(g, "_host_eprop_by_eid", None)
    if cached is not None and not callable(cached):
        return cached
    eid = np.asarray(g.push.eid).reshape(-1)
    valid = np.asarray(g.push.valid).reshape(-1)
    live = valid & (eid >= 0)
    e = eid[live]
    n = int(e.max()) + 1 if len(e) else 0
    w = np.zeros(n, np.float32)
    w[e] = np.asarray(g.push.weight).reshape(-1)[live]
    et = None
    if g.push.etype is not None:
        et = np.zeros(n, np.int32)
        et[e] = np.asarray(g.push.etype).reshape(-1)[live]
    tm = None
    if g.push.etime is not None:
        tm = np.zeros(n, np.float32)
        tm[e] = np.asarray(g.push.etime).reshape(-1)[live]
    table = {"weight": w, "etype": et, "etime": tm}
    object.__setattr__(g, "_host_eprop_by_eid", table)
    return table


def _attach_props(g: DistGraph, frame: pd.DataFrame) -> pd.DataFrame:
    if "_eid" in frame and g.push is not None and g.push.eid is not None:
        # instance-exact: the sampler returned the traversed edge id
        tab = _host_eprop_by_eid(g)
        e = frame["_eid"].to_numpy()
        if (e < 0).any():
            raise RuntimeError("sampled row without an edge instance id")
        frame["weight"] = tab["weight"][e]
        if tab["etype"] is not None and "edge_type" not in frame:
            frame["edge_type"] = tab["etype"][e]
        if tab["etime"] is not None and "edge_time" not in frame:
            frame["edge_time"] = tab["etime"][e]
        return frame
    tab = _host_eprop_table(g)
    key = frame["sources"].to_numpy().astype(np.int64) * g.pad_v \
        + frame["destinations"].to_numpy().astype(np.int64)
    # first-match fallback (no eid blocks — store_eid=False builds and the
    # sharded-construction path): exact unless the SAMPLED pair has
    # parallel instances with distinct properties; REFUSE the silently
    # wrong answer for those (the reference gathers per instance,
    # gather_one_hop_impl.cuh).  The per-position ambiguity mask is
    # computed once and cached with the table.
    ks = tab["keys"]
    amb = tab.get("ambiguous")
    if amb is None:
        amb = np.zeros(len(ks), bool)
        if len(ks):
            same = ks[1:] == ks[:-1]
            for name in ("weight", "etype", "etime"):
                col = tab[name]
                if col is not None:
                    d = same & (col[1:] != col[:-1])
                    amb[1:] |= d
                    amb[:-1] |= d
            # propagate within equal-key runs (every slot of a run flags
            # when any adjacent pair differs): group-id = run index
            grp = np.concatenate([[0], np.cumsum(~same)])
            hit = np.bincount(grp, weights=amb.astype(np.float64),
                              minlength=int(grp[-1]) + 1) > 0
            amb = hit[grp]
        tab["ambiguous"] = amb
    pos = np.searchsorted(ks, key)
    pos = np.clip(pos, 0, max(len(ks) - 1, 0))
    ok = len(ks) > 0 and bool((ks[pos] == key).all())
    if not ok:
        raise RuntimeError("sampled edge missing from property table")
    if len(ks) and bool(amb[pos].any()):
        raise ValueError(
            "sampled a parallel edge whose instances carry distinct "
            "properties; rebuild with store_eid=True (build_dist_graph "
            "default when properties are given) for instance-exact "
            "sampled properties")
    frame["weight"] = tab["weight"][pos]
    if tab["etype"] is not None and "edge_type" not in frame:
        frame["edge_type"] = tab["etype"][pos]
    if tab["etime"] is not None and "edge_time" not in frame:
        frame["edge_time"] = tab["etime"][pos]
    return frame


def _occurrence_rank(v: np.ndarray, tiebreak: np.ndarray | None = None
                     ) -> np.ndarray:
    """occ[i] = rank of row i among rows with the same vertex.

    Default order within a vertex group is ARRIVAL order (stable sort) —
    the multiplicity semantics of repeated (vertex, batch) rows.  With
    ``tiebreak`` (the batch ids) the order is CANONICAL (sorted by batch):
    under dedupe_sources each (vertex, batch) is unique, so the canonical
    rank is a pure function of the frontier SET — which lets the fused
    device kernel reproduce the exact same RNG layer per row from its mask
    planes (cumulative count over the batch axis)."""
    order = (np.argsort(v, kind="stable") if tiebreak is None
             else np.lexsort((tiebreak, v)))
    vs = v[order]
    first = np.zeros(len(v), bool)
    if len(v):
        first[0] = True
        first[1:] = vs[1:] != vs[:-1]
    run_start = np.maximum.accumulate(np.where(first, np.arange(len(v)), 0))
    occ_sorted = np.arange(len(v)) - run_start
    occ = np.empty(len(v), np.int64)
    occ[order] = occ_sorted
    return occ


def _mg_neighbor_sample_core(
    g: DistGraph, mesh, start_list, hop_plans, *, seed: int,
    with_replacement: bool, biased: bool, masks=None,
    temporal: bool = False, seed_time: float = 0.0, strict: bool = True,
    temporal_sampling_comparison=None,
    prior_sources_behavior: str = "default", dedupe_sources: bool = False,
    return_hops: bool = True, with_edge_properties: bool = False,
    batch_id_list=None,
):
    """Shared MG multi-hop driver.  ``hop_plans``: per hop, a list of
    (type_key_or_None, fanout) pairs; ``masks``: type_key → edge_ok blocks."""
    from cugraph_tpu.algos._frontier import FrontierState
    from cugraph_tpu.parallel.algos import mg_sample_one_hop

    fv0 = np.asarray(start_list, np.int64)
    pad = g.pad_v
    state = FrontierState(
        fv0, np.arange(len(fv0), dtype=np.int32), pad,
        prior_sources_behavior=prior_sources_behavior,
        dedupe_sources=dedupe_sources, batch_id_list=batch_id_list,
        times=(np.broadcast_to(
            np.asarray(seed_time, np.float32), (len(fv0),)).copy()
               if temporal else None))

    frames = []
    for hop, fanouts in enumerate(hop_plans):
        if len(state) == 0:
            break
        fv, fb, ft = state.begin_hop()
        occ = _occurrence_rank(fv, tiebreak=fb if dedupe_sources else None)
        hop_frames = []
        n_layers = int(occ.max()) + 1 if len(fv) else 0
        for r in range(n_layers):
            sel = occ == r
            verts = fv[sel]
            bats = fb[sel]
            vt = None
            if temporal:
                vt = np.zeros(pad, np.float32)
                vt[verts] = ft[sel]
            for tk, k in fanouts:
                if int(k) < 0:
                    raise ValueError(
                        "fanout -1 (all neighbors) is not supported on the "
                        "MG sampler — the dense one-hop kernel needs a "
                        "static k; pass the max degree instead")
                if int(k) == 0 or (masks is not None and tk not in masks):
                    continue
                samp, st, sei = mg_sample_one_hop(
                    g, mesh, verts, int(k),
                    seed + hop * 1009 + r * 131 + (0 if tk is None else tk) * 7,
                    with_replacement, biased,
                    edge_ok=None if masks is None else masks[tk],
                    frontier_times=vt, strict=strict,
                    temporal_sampling_comparison=temporal_sampling_comparison)
                # device-side row gather: only the F frontier rows cross to
                # the host, not the dense [pad_v, k] panel
                from cugraph_tpu.parallel.algos import sample_panel_rows

                panels = [samp] + ([st] if temporal else []) \
                    + ([sei] if sei is not None else [])
                got = list(sample_panel_rows(mesh, tuple(panels), verts))
                sub = got.pop(0)                                 # [F, k]
                st_rows = got.pop(0) if temporal else None
                ei_rows = got.pop(0) if sei is not None else None
                ok = sub >= 0
                flat = ok.reshape(-1)
                kk = sub.shape[1]
                row = {
                    "sources": np.repeat(verts, kk)[flat],
                    "destinations": sub.reshape(-1)[flat],
                    "hop_id": np.int32(hop),
                    "batch_id": np.repeat(bats, kk)[flat],
                }
                if ei_rows is not None:
                    row["_eid"] = ei_rows.reshape(-1)[flat].astype(np.int64)
                if temporal:
                    row["edge_time"] = st_rows.reshape(-1)[flat]
                if tk is not None:
                    row["edge_type"] = np.int32(tk)
                hop_frames.append(pd.DataFrame(row))
        if not hop_frames:
            break
        hf = pd.concat(hop_frames, ignore_index=True)
        frames.append(hf)
        # next frontier: per-batch destinations WITH multiplicity
        # (prepare_next_frontier_impl.cuh)
        state.advance(hf["destinations"].to_numpy().astype(np.int64),
                      hf["batch_id"].to_numpy(),
                      hf["edge_time"].to_numpy().astype(np.float32)
                      if temporal else None)

    cols = ["sources", "destinations", "hop_id", "batch_id"]
    if temporal:
        cols.insert(2, "edge_time")
    if masks is not None:
        cols.insert(2, "edge_type")
    if not frames:
        return pd.DataFrame(columns=[c for c in cols
                                     if return_hops or c != "hop_id"])
    out = pd.concat(frames, ignore_index=True)
    if with_edge_properties:
        out = _attach_props(g, out)
    if "_eid" in out:
        out = out.drop(columns=["_eid"])
    if not return_hops:
        out = out.drop(columns=["hop_id"])
    return out


def _flag_kwargs(kw):
    from cugraph_tpu.algos._frontier import pop_dedupe_sources

    dedupe = pop_dedupe_sources(kw)
    return dict(
        prior_sources_behavior=kw.pop("prior_sources_behavior", "default"),
        dedupe_sources=bool(dedupe),
        return_hops=bool(kw.pop("return_hops", True)),
        with_edge_properties=bool(kw.pop("with_edge_properties", False)),
        batch_id_list=kw.pop("batch_id_list", None),
    )


def mg_uniform_neighbor_sample(g: DistGraph, mesh, start_list, fanout_vals,
                               with_replacement: bool = False, seed: int = 0,
                               biased: bool = False, **kw):
    """Multi-hop distributed uniform neighbor sampling (reference MG
    homogeneous_uniform_neighbor_sample).  Returns
    ['sources','destinations','hop_id','batch_id'] (+ 'weight'/'edge_type'/
    'edge_time' with ``with_edge_properties=True``); batches keep independent
    frontiers with multiplicity per sampling_flags_t semantics."""
    kw.pop("disjoint_sampling", None)  # per-batch frontiers are disjoint
    kw.pop("temporal_sampling_comparison", None)  # temporal-only knob
    flags = _flag_kwargs(kw)
    if kw:
        raise TypeError(f"unknown sampler kwargs: {sorted(kw)}")
    assert g.push is not None, "sampling needs push blocks"
    bl = flags["batch_id_list"]
    if bl is not None and len(np.asarray(bl).reshape(-1)) != \
            len(np.asarray(start_list).reshape(-1)):
        raise ValueError("batch_id_list must align with start_list")
    plan = _plan_fused(g, mesh, start_list, fanout_vals, flags)
    if plan is not None:
        return _mg_sample_device_path(g, mesh, plan, seed=seed,
                                      biased=biased,
                                      with_replacement=with_replacement,
                                      **flags)
    plans = [[(None, int(k))] for k in fanout_vals]
    return _mg_neighbor_sample_core(
        g, mesh, start_list, plans, seed=seed,
        with_replacement=with_replacement, biased=biased, **flags)


MAX_FUSED_BATCHES = 16          # static in-kernel layer unroll bound
MAX_FUSED_CAP = 1 << 22         # per-hop compacted-frontier capacity
MAX_FUSED_PANEL_BYTES = 256 << 20   # per-device [NB, pad_v/P, k] budget
# _compact_hop_fn's data-dependent row gather reshapes across the sharded
# panel axis, which GSPMD may lower by REPLICATING the operand — so the
# FULL panel must also fit comfortably on one device (HBM is 16 GB)
MAX_FUSED_PANEL_TOTAL = 2 << 30


def _plan_fused(g, mesh, start_list, fanout_vals, flags, temporal=False):
    """Gate + static plan for the fused device sampler.  Eligible configs:
    dedupe_sources (set semantics — mask planes can't carry multiplicity),
    homogeneous, any prior_sources_behavior, ANY batch count (>16 batches
    chunk into ≤16-plane hop-synchronized groups), pad_v ≤ 2^27,
    panel/caps within budget.  Temporal configs fuse too (round 5) under a
    tighter pad_v ≤ 2^22 gate: arrival times ride as dense f32 planes
    min-reduced across the mesh each hop (32× the packed-mask traffic).
    Returns None to route the occurrence-layered host path instead."""
    ks = [int(k) for k in fanout_vals]
    if not (flags["dedupe_sources"] and ks and min(ks) > 0):
        return None
    if g.pad_v > (1 << 27) or g.pad_v % 32:
        return None
    if temporal and (g.pad_v > (1 << 22) or g.push is None
                     or g.push.etime is None):
        return None
    behavior = (flags["prior_sources_behavior"] or "default").lower()
    if behavior == "carryover":
        behavior = "carry_over"
    if behavior not in ("default", "carry_over", "exclude"):
        return None
    sv = np.asarray(start_list, np.int64).reshape(-1)
    bl = flags["batch_id_list"]
    # bl=None means each seed is its OWN batch (FrontierState default /
    # np.arange in both SG drivers) — NOT one shared batch; zeros here
    # would merge frontiers and mislabel batch_id on the fused path.
    b = (np.asarray(bl, np.int32).reshape(-1) if bl is not None
         else np.arange(len(sv), dtype=np.int32))
    labels = np.unique(b)
    NB = max(len(labels), 1)
    # >16 batches chunk into ≤16-plane GROUPS run hop-synchronized with
    # cross-group layer offsets (round-5; RNG folds stay bit-identical to
    # the layered path at any batch count)
    P_ = max(mesh.devices.size, 1)
    gNB = min(NB, MAX_FUSED_BATCHES)
    panel_bytes = gNB * g.pad_v * max(ks) * 4
    if panel_bytes // P_ > MAX_FUSED_PANEL_BYTES \
            or panel_bytes > MAX_FUSED_PANEL_TOTAL:
        return None
    groups = []
    grow = 1 if behavior == "carry_over" else 0
    for lo in range(0, max(len(labels), 1), MAX_FUSED_BATCHES):
        labs = labels[lo:lo + MAX_FUSED_BATCHES]
        nbg = max(len(labs), 1)
        masks0 = np.zeros((nbg, g.pad_v), bool)
        fb = np.zeros(nbg, np.int64)
        for pi, lab in enumerate(labs):
            vs = np.unique(sv[b == lab])
            masks0[pi, vs] = True
            fb[pi] = len(vs)
        # static per-hop frontier capacity from the growth bound
        # (carry_over also keeps the current frontier)
        caps = []
        for k in ks:
            tot = int(min(fb.sum(), nbg * g.pad_v))
            caps.append(max(8, 1 << (max(tot, 1) - 1).bit_length()))
            fb = np.minimum(g.num_vertices, fb * (k + grow))
        if max(caps) > MAX_FUSED_CAP:
            return None
        groups.append({"masks0": masks0, "labels": labs, "caps": caps})
    return {"groups": groups, "ks": ks, "behavior": behavior}


def _mg_sample_device_path(g, mesh, plan, *, seed, biased, with_replacement,
                           prior_sources_behavior, dedupe_sources,
                           return_hops, with_edge_properties, batch_id_list,
                           temporal=False, seed_time=0.0,
                           comparison="strictly_increasing"):
    """Fused device-resident path (generalized round 4): batch-keyed mask
    planes, in-kernel occurrence layering, prior-source behaviors as mask
    algebra, bit-packed cross-device frontier unions — the whole multi-hop
    walk stays on device and ONE jax.device_get fetches every hop's
    compacted (frontier keys, sampled rows).  RNG folds match the layered
    path exactly (canonical batch-rank layers), so outputs are
    bit-identical row sets."""
    import jax

    from cugraph_tpu.parallel.algos import mg_sample_multihop_batched_device

    pad = g.pad_v
    ks = plan["ks"]
    groups = plan["groups"]
    outs = mg_sample_multihop_batched_device(
        g, mesh, [grp["masks0"] for grp in groups], ks,
        [grp["caps"] for grp in groups], seed=seed,
        with_replacement=with_replacement, biased=biased,
        behavior=plan["behavior"], temporal=temporal, seed_time=seed_time,
        comparison=comparison)
    host = jax.device_get(outs)     # the ONE device→host transfer
    frames = []
    for grp, ghost in zip(groups, host):
        labels = grp["labels"]
        for hop, (keys, rows, erows, trows) in enumerate(ghost):
            keys = np.asarray(keys)
            rows = np.asarray(rows)
            live = keys >= 0
            keys, rows = keys[live], rows[live]
            if not len(keys):
                continue
            v = (keys % pad).astype(np.int64)
            plane = (keys // pad).astype(np.int64)
            ridx, cidx = np.nonzero(rows >= 0)
            if not len(ridx):
                continue
            fr = pd.DataFrame({
                "sources": v[ridx],
                "destinations": rows[ridx, cidx].astype(np.int64),
                "hop_id": np.int32(hop),
                "batch_id": labels[plane[ridx]].astype(np.int32)
                if len(labels) else np.int32(0),
            })
            if erows is not None:
                fr["_eid"] = np.asarray(erows)[live][ridx, cidx].astype(
                    np.int64)
            if trows is not None:
                fr["edge_time"] = np.asarray(trows)[live][ridx, cidx] \
                    .astype(np.float32)
            frames.append(fr)
    cols_out = ["sources", "destinations", "hop_id", "batch_id"]
    if temporal:
        cols_out.insert(2, "edge_time")
    if not frames:
        return pd.DataFrame(columns=[c for c in cols_out
                                     if return_hops or c != "hop_id"])
    out = pd.concat(frames, ignore_index=True)
    if len(groups) > 1:
        # group-major assembly → restore the hop-major row order of the
        # single-group path (stable: batches stay in canonical order)
        out = out.sort_values("hop_id", kind="stable", ignore_index=True)
    if with_edge_properties:
        out = _attach_props(g, out)
    if "_eid" in out:
        out = out.drop(columns=["_eid"])
    if temporal:
        # match the layered path's column order (edge_time third)
        rest = [c for c in out.columns if c not in cols_out]
        out = out[cols_out + rest]
    if not return_hops:
        out = out.drop(columns=["hop_id"])
    return out


def mg_biased_neighbor_sample(g: DistGraph, mesh, start_list, fanout_vals,
                              with_replacement: bool = False, seed: int = 0,
                              **kw):
    """Weight-biased distributed neighbor sampling
    (homogeneous_biased_neighbor_sample's MG role)."""
    return mg_uniform_neighbor_sample(g, mesh, start_list, fanout_vals,
                                      with_replacement=with_replacement,
                                      seed=seed, biased=True, **kw)


def _het_masks_plans(g: DistGraph, fanout_vals, num_edge_types):
    import jax.numpy as jnp

    et = np.asarray(g.push.etype)
    valid = np.asarray(g.push.valid)
    types = np.unique(et[valid]) if valid.any() else np.array([], np.int32)
    ntypes = num_edge_types or (int(types.max()) + 1 if len(types) else 1)
    fvs = list(fanout_vals)
    assert len(fvs) % ntypes == 0, "fanout_vals must be hops × num_edge_types"
    hops = [fvs[i:i + ntypes] for i in range(0, len(fvs), ntypes)]
    masks = {int(t): jnp.asarray(valid & (et == t)) for t in types}
    plans = [[(t, int(k)) for t, k in enumerate(hop_fans)] for hop_fans in hops]
    return masks, plans


def mg_heterogeneous_neighbor_sample(g: DistGraph, mesh, start_list,
                                     fanout_vals, num_edge_types=None,
                                     seed: int = 0, biased: bool = False,
                                     with_replacement: bool = False, **kw):
    """Distributed per-edge-type neighbor sampling (reference MG
    heterogeneous_{uniform,biased}_neighbor_sample): ``fanout_vals`` is
    flattened [hop0_type0, hop0_type1, ...]."""
    kw.pop("disjoint_sampling", None)  # per-batch frontiers are disjoint
    kw.pop("temporal_sampling_comparison", None)  # temporal-only knob
    flags = _flag_kwargs(kw)
    if kw:
        raise TypeError(f"unknown sampler kwargs: {sorted(kw)}")
    if g.push is None or g.push.etype is None:
        raise ValueError("heterogeneous MG sampling requires push blocks "
                         "built with edge_type")
    masks, plans = _het_masks_plans(g, fanout_vals, num_edge_types)
    return _mg_neighbor_sample_core(
        g, mesh, start_list, plans, seed=seed,
        with_replacement=with_replacement, biased=biased, masks=masks,
        **flags)


def mg_temporal_neighbor_sample(g: DistGraph, mesh, start_list, fanout_vals,
                                seed_time: float = 0.0, strict: bool = True,
                                seed: int = 0, biased: bool = False,
                                with_replacement: bool = False, **kw):
    """Distributed temporal neighbor sampling (reference MG
    homogeneous_{uniform,biased}_temporal): eligible edges have time past the
    frontier vertex's arrival time; sampled vertices inherit the traversed
    edge's time (each (vertex, batch) frontier pair carries its own time)."""
    comparison = kw.pop("temporal_sampling_comparison", None)
    if kw.pop("disjoint_sampling", True) is False:
        raise ValueError("temporal sampling requires disjoint sampling "
                         "(reference contract, sampling_functions.hpp:80)")
    flags = _flag_kwargs(kw)
    if kw:
        raise TypeError(f"unknown sampler kwargs: {sorted(kw)}")
    if g.push is None or g.push.etime is None:
        raise ValueError("temporal MG sampling requires push blocks built "
                         "with edge_time")
    plan = (_plan_fused(g, mesh, start_list, fanout_vals, flags,
                        temporal=True)
            if np.ndim(seed_time) == 0 else None)
    if plan is not None:
        from cugraph_tpu.algos._frontier import resolve_temporal_comparison

        return _mg_sample_device_path(
            g, mesh, plan, seed=seed, biased=biased,
            with_replacement=with_replacement, temporal=True,
            seed_time=float(seed_time),
            comparison=resolve_temporal_comparison(comparison, strict),
            **flags)
    plans = [[(None, int(k))] for k in fanout_vals]
    return _mg_neighbor_sample_core(
        g, mesh, start_list, plans, seed=seed,
        with_replacement=with_replacement, biased=biased,
        temporal=True, seed_time=seed_time, strict=strict,
        temporal_sampling_comparison=comparison, **flags)


def mg_heterogeneous_temporal_neighbor_sample(
        g: DistGraph, mesh, start_list, fanout_vals, num_edge_types=None,
        seed_time: float = 0.0, strict: bool = True, seed: int = 0,
        biased: bool = False, with_replacement: bool = False, **kw):
    """Distributed per-edge-type TEMPORAL sampling (reference MG
    heterogeneous_{uniform,biased}_temporal_neighbor_sample.pyx): per-type
    eligibility masks AND the arrival-time regime in one one-hop kernel."""
    comparison = kw.pop("temporal_sampling_comparison", None)
    if kw.pop("disjoint_sampling", True) is False:
        raise ValueError("temporal sampling requires disjoint sampling "
                         "(reference contract, sampling_functions.hpp:80)")
    flags = _flag_kwargs(kw)
    if kw:
        raise TypeError(f"unknown sampler kwargs: {sorted(kw)}")
    if g.push is None or g.push.etype is None or g.push.etime is None:
        raise ValueError("heterogeneous temporal MG sampling requires push "
                         "blocks built with edge_type and edge_time")
    masks, plans = _het_masks_plans(g, fanout_vals, num_edge_types)
    return _mg_neighbor_sample_core(
        g, mesh, start_list, plans, seed=seed,
        with_replacement=with_replacement, biased=biased, masks=masks,
        temporal=True, seed_time=seed_time, strict=strict,
        temporal_sampling_comparison=comparison, **flags)
