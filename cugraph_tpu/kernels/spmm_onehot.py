"""One-hot-matmul SpMM: Y[dst, :] += w · X[src, :] without gathers.

The multi-feature companion of spmv_onehot (same motivation: XLA lowers
gather/segment ops to ~0.12 G elem/s scalar loops on this TPU).  Layout
differs from the SpMV kernel: FEATURES ride the lane axis and VERTICES the
sublane axis, so both gather and scatter are single direct one-hot products:

    gather:  XE[e, f]   = Σ_v  (w[e]·1[src[e]=v]) · Xwin[v, f]
    scatter: Y[d, f]   += Σ_e  1[dst[e]=d] · XE[e, f]

with one-hots built by comparing an index ROW [1, 128] against a sublane
iota (the cheap broadcast direction, same trick as spmv_onehot).  Per-edge
cost is (W_src + W_dst) MACs per feature, so windows are chosen per graph by
a host-side cost model trading MXU MACs against subtile padding.

This is the TPU replacement for the reference's per_v_transform_reduce_e SpMM
role in GNN aggregation (prims/detail/per_v_transform_reduce_e.cuh:252-688,
SpMM shape per pagerank_impl.cuh:262-275) — degree segmentation is
irrelevant because every edge costs identical dense work.
"""

from __future__ import annotations

import functools
import weakref
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

_WINDOW_CHOICES = (512, 1024, 2048, 4096)
DEFAULT_YBV = 8192          # vertices per VMEM-resident y block


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SpmmPlan:
    """Static tiling of one (graph, orientation) for the one-hot SpMM."""

    src_rel: jax.Array   # int32 [T*8, 128]  src − xwin·w_src   (0 padding)
    dst_rel: jax.Array   # int32 [T*8, 128]  dst − yblk·ybv
    weight: jax.Array    # f32   [T*8, 128]  NaN on padding lanes
    xwin: jax.Array      # int32 [T]   x window index (= src // w_src)
    yblk: jax.Array      # int32 [T]   y block index
    num_vertices: int = field(metadata=dict(static=True))
    pad_v: int = field(metadata=dict(static=True))
    w_src: int = field(metadata=dict(static=True))
    w_dst: int = field(metadata=dict(static=True))
    ybv: int = field(metadata=dict(static=True))
    n_yblocks: int = field(metadata=dict(static=True))
    num_tiles: int = field(metadata=dict(static=True))
    tile_subs: int = field(default=8, metadata=dict(static=True))
    # True iff every edge weight round-trips through bf16 exactly (always
    # true for unit weights) — the precondition for precision="split"
    split_safe: bool = field(default=False, metadata=dict(static=True))


def _round_up(x, m):
    return (x + m - 1) // m * m


def _count_tiles(src, dst, n, w_src, w_dst, ybv):
    """Host cost model: number of packed tiles for a window choice."""
    yb = dst // ybv
    grp = src // w_src
    dwin = dst // w_dst
    key = (yb.astype(np.int64) * (grp.max() + 1) + grp) * (dwin.max() + 1) + dwin
    _, counts = np.unique(key, return_counts=True)
    n_sub = int(np.sum((counts + 127) // 128))
    # subtiles grouped by (yb, grp) then packed 8 per tile
    key_rg = yb.astype(np.int64) * (grp.max() + 1) + grp
    order = np.argsort(key, kind="stable")
    # per-rg subtile counts: regroup unique (rg) over subtiles
    uk, idx = np.unique(key, return_index=True)
    rg_of_run = key_rg[order][np.searchsorted(key[order], uk)]
    sub_per_run = (counts + 127) // 128
    _, inv = np.unique(rg_of_run, return_inverse=True)
    per_rg = np.bincount(inv, weights=sub_per_run)
    tiles = int(np.sum((per_rg + 7) // 8))
    return max(tiles, 1), n_sub


def choose_windows(src, dst, n, ybv=DEFAULT_YBV):
    """Pick (w_src, w_dst) minimizing tiles·(w_src + w_dst).  Counts via the
    native tiler's counting-sort pass when available (the NumPy unique/sort
    fallback is ~20 s at RMAT-18; native ~0.1 s per candidate)."""
    from cugraph_tpu.core.native import spmv_plan_count_native

    best, best_cost = None, None
    for w in _WINDOW_CHOICES:
        if w > max(ybv, 512):
            continue
        tiles = None
        # mirror the builder's geometry for this candidate
        ybv_c = max(_round_up(min(ybv, _round_up(max(n, 1), 512)), 512), 512)
        ybv_c = _round_up(ybv_c, w)
        pad_c = _round_up(max(n, 1), max(ybv_c, w))
        T = spmv_plan_count_native(src, dst, pad_c // 128, ybv_c // 128,
                                   w, w, 8)
        if T is not None:
            # the native count includes one padding tile per edge-less y
            # block; remove them so candidates rank on real work
            n_yb = pad_c // ybv_c
            seen = np.zeros(n_yb, bool)
            seen[np.asarray(dst, np.int64) // ybv_c] = True
            tiles = T - (n_yb - int(seen.sum()))
        if tiles is None:
            tiles, _ = _count_tiles(src, dst, n, w, w, ybv)
        cost = tiles * 2 * w
        if best_cost is None or cost < best_cost:
            best, best_cost = (w, w), cost
    return best


def build_spmm_plan(src, dst, weight, num_vertices: int, *,
                    w_src: int | None = None, w_dst: int | None = None,
                    ybv: int = DEFAULT_YBV,
                    tile_subs: int | None = None) -> SpmmPlan:
    """Host-side tiling (vectorized NumPy, mirrors build_spmv_plan)."""
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    m = src.shape[0]
    w = np.ones(m, np.float32) if weight is None else np.asarray(weight, np.float32)
    if m and not np.isfinite(w).all():
        raise ValueError("spmm plan requires finite edge weights")
    import ml_dtypes

    split_safe = (weight is None
                  or bool(np.all(w == w.astype(ml_dtypes.bfloat16)
                                 .astype(np.float32))))

    ybv = max(_round_up(min(ybv, _round_up(num_vertices, 512)), 512), 512)
    if w_src is None or w_dst is None:
        if m:
            w_src, w_dst = choose_windows(src, dst, num_vertices, ybv)
        else:
            w_src = w_dst = 512
    ybv = _round_up(ybv, w_dst)
    pad_v = _round_up(max(num_vertices, 1), max(ybv, w_src))
    n_yblocks = pad_v // ybv
    if tile_subs is None:
        from cugraph_tpu.kernels.spmv_onehot import auto_tile_subs

        TS = auto_tile_subs(max(m // 128, 1), cap=64)  # ts×F VMEM
    else:
        TS = int(tile_subs)

    if m == 0:
        t = n_yblocks
        return SpmmPlan(
            src_rel=jnp.zeros((t * TS, 128), jnp.int32),
            dst_rel=jnp.zeros((t * TS, 128), jnp.int32),
            weight=jnp.full((t * TS, 128), np.nan, jnp.float32),
            xwin=jnp.zeros((t,), jnp.int32),
            yblk=jnp.arange(t, dtype=jnp.int32),
            num_vertices=num_vertices, pad_v=pad_v, w_src=w_src,
            w_dst=w_dst, ybv=ybv, n_yblocks=n_yblocks, num_tiles=t,
            tile_subs=TS, split_safe=True,
        )

    # native fast path: the SpMM tile layout is bit-identical to the SpMV
    # one (same sort order, subtile breaks, TS packing, padding-lane window
    # bases), so the C++ counting-sort tiler serves both — equality checked
    # by tests/test_native.py::test_spmm_plan_native_matches_numpy
    from cugraph_tpu.core.native import spmv_plan_native

    res = spmv_plan_native(src, dst, None if weight is None else w,
                           pad_v // 128, ybv // 128, w_src, w_dst, TS)
    if res is not None:
        src_rel_n, dst_rel_n, weight_n, xwin_n, yblk_n, T = res
        return SpmmPlan(
            src_rel=jnp.asarray(src_rel_n), dst_rel=jnp.asarray(dst_rel_n),
            weight=jnp.asarray(weight_n), xwin=jnp.asarray(xwin_n),
            yblk=jnp.asarray(yblk_n), num_vertices=num_vertices, pad_v=pad_v,
            w_src=w_src, w_dst=w_dst, ybv=ybv, n_yblocks=n_yblocks,
            num_tiles=T, tile_subs=TS, split_safe=split_safe,
        )

    yblock = dst // ybv
    group = src // w_src
    dwin = dst // w_dst
    n_groups = int(group.max()) + 1

    order = np.lexsort((dst, dwin, group, yblock))
    src, dst, w = src[order], dst[order], w[order]
    yblock, group, dwin = yblock[order], group[order], dwin[order]

    key = (yblock * n_groups + group) * (int(dwin.max()) + 1) + dwin
    run_start = np.empty(m, bool)
    run_start[0] = True
    np.not_equal(key[1:], key[:-1], out=run_start[1:])
    run_id = np.cumsum(run_start) - 1
    run_first = np.flatnonzero(run_start)
    pos_in_run = np.arange(m) - run_first[run_id]

    lane = pos_in_run & 127
    sub_start = run_start | (lane == 0)
    sub_id = np.cumsum(sub_start) - 1
    n_sub = int(sub_id[-1]) + 1

    sub_first = np.flatnonzero(sub_start)
    sub_yb = yblock[sub_first]
    sub_grp = group[sub_first]
    sub_rg = sub_yb * n_groups + sub_grp
    rg_start = np.empty(n_sub, bool)
    rg_start[0] = True
    np.not_equal(sub_rg[1:], sub_rg[:-1], out=rg_start[1:])
    rg_id = np.cumsum(rg_start) - 1
    rg_first_sub = np.flatnonzero(rg_start)
    sub_seq = np.arange(n_sub) - rg_first_sub[rg_id]
    tile_in_rg = sub_seq // TS
    slot = sub_seq % TS
    rg_sub_counts = np.diff(np.append(rg_first_sub, n_sub))
    rg_tiles = -(-rg_sub_counts // TS)
    rg_tile_off = np.concatenate([[0], np.cumsum(rg_tiles)])
    sub_tile = rg_tile_off[rg_id] + tile_in_rg
    T = int(rg_tile_off[-1])

    e_row = sub_tile[sub_id] * TS + slot[sub_id]
    src_rel = np.zeros((T * TS, 128), np.int32)
    dst_rel = np.zeros((T * TS, 128), np.int32)
    weight_a = np.full((T * TS, 128), np.nan, np.float32)
    src_rel[e_row, lane] = src - group * w_src
    dst_rel[e_row, lane] = dst - yblock * ybv
    weight_a[e_row, lane] = w

    # padding lanes carry the subtile's dst-window base (for in-kernel
    # window recovery via min), weight NaN (validity mask)
    sub_dwin_rel = (dwin[sub_first] - sub_yb * (ybv // w_dst)).astype(np.int64)
    row_base = np.zeros(T * TS, np.int64)
    row_of_sub = sub_tile * TS + slot
    row_base[row_of_sub] = sub_dwin_rel * w_dst
    dst_col = np.broadcast_to(row_base[:, None], (T * TS, 128)).copy()
    filled = np.zeros((T * TS, 128), bool)
    filled[e_row, lane] = True
    dst_rel = np.where(filled, dst_rel, dst_col).astype(np.int32)

    xwin = np.zeros(T, np.int32)
    yblk_arr = np.zeros(T, np.int32)
    tile_of_rg = np.repeat(np.arange(len(rg_tiles)), rg_tiles)
    rg_yb = sub_yb[rg_first_sub]
    rg_grp = sub_grp[rg_first_sub]
    xwin[:] = rg_grp[tile_of_rg]
    yblk_arr[:] = rg_yb[tile_of_rg]

    # every y block needs >= 1 tile (first-visit zero-init, as in spmv)
    missing = np.setdiff1d(np.arange(n_yblocks), np.unique(yblk_arr))
    if len(missing):
        pt = len(missing)
        src_rel = np.concatenate([src_rel, np.zeros((pt * TS, 128), np.int32)])
        dst_rel = np.concatenate([dst_rel, np.zeros((pt * TS, 128), np.int32)])
        weight_a = np.concatenate(
            [weight_a, np.full((pt * TS, 128), np.nan, np.float32)])
        xwin = np.concatenate([xwin, np.zeros(pt, np.int32)])
        yblk_arr = np.concatenate([yblk_arr, missing.astype(np.int32)])
        order_t = np.argsort(yblk_arr, kind="stable")
        yblk_arr, xwin = yblk_arr[order_t], xwin[order_t]
        rows = (order_t[:, None] * TS + np.arange(TS)).reshape(-1)
        src_rel, dst_rel, weight_a = src_rel[rows], dst_rel[rows], weight_a[rows]
        T += pt

    return SpmmPlan(
        src_rel=jnp.asarray(src_rel), dst_rel=jnp.asarray(dst_rel),
        weight=jnp.asarray(weight_a), xwin=jnp.asarray(xwin),
        yblk=jnp.asarray(yblk_arr), num_vertices=num_vertices, pad_v=pad_v,
        w_src=w_src, w_dst=w_dst, ybv=ybv, n_yblocks=n_yblocks, num_tiles=T,
        tile_subs=TS, split_safe=split_safe,
    )


def _kernel(xwin_ref, yblk_ref, src_ref, dst_ref, w_ref, x_ref, y_ref,
            *, w_src, w_dst, precision, tile_subs=8, reduce="sum",
            combine="mul", gather_batch=1):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from cugraph_tpu.kernels.spmv_onehot import SEMIRING_BIG as BIG

    i = pl.program_id(0)
    init = {"sum": 0.0, "min": BIG, "max": -BIG}[reduce]

    @pl.when(jnp.logical_or(i == 0,
                            yblk_ref[i] != yblk_ref[jnp.maximum(i - 1, 0)]))
    def _():
        y_ref[:] = jnp.full_like(y_ref, init)

    sub_s = jax.lax.broadcasted_iota(jnp.int32, (w_src, 128), 0)
    sub_d = jax.lax.broadcasted_iota(jnp.int32, (w_dst, 128), 0)
    split = precision == "split"
    odt = jnp.float32 if precision == "highest" else jnp.bfloat16
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)
    dn_vv = (((0,), (0,)), ((), ()))   # contract sublane (vertex) axes
    dn_ed = (((1,), (0,)), ((), ()))   # contract edge axes

    def _sel(onehot, data_f32, dims):
        """onehot @ data at MXU rate; "split" = exact-selection bf16 pair
        (spmv_onehot._sel trick: each product term selects one addend, so
        both bf16 matmuls are exact selections whose f32 sum recovers the
        value to ~2^-16 relative).  Requires the one-hot to carry pure
        0/1 entries — i.e. an UNWEIGHTED plan for the gather side."""
        if not split:
            return jax.lax.dot_general(onehot, data_f32.astype(odt), dims,
                                       preferred_element_type=jnp.float32,
                                       precision=prec)
        d_hi = data_f32.astype(jnp.bfloat16)
        d_lo = (data_f32 - d_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        ob = onehot.astype(jnp.bfloat16)
        return (jax.lax.dot_general(ob, d_hi, dims,
                                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(ob, d_lo, dims,
                                      preferred_element_type=jnp.float32))

    F = x_ref.shape[1]
    if reduce != "sum":
        # lane→sublane transport machinery: a diag(row) @ ones matmul turns
        # a [1,128] lane row into a [128e, F] sublane broadcast (the one
        # broadcast direction Mosaic can't do directly)
        I128 = (jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
                == jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
                ).astype(jnp.float32)
        ones_F = jnp.ones((128, F), jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def _to_sub(row_f32):
            return jax.lax.dot_general(
                I128 * row_f32, ones_F, dn_ed,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

    if reduce == "sum":
        # Batched-gather variant: every subtile of a tile shares the x
        # window, so ``gather_batch`` subtile one-hots concatenate along
        # lanes into ONE [w_src, G·128] matmul producing an XE panel
        # [G·128, F].  gather_batch is capped by the caller so the panel
        # plus one-hot stay inside the Mosaic scoped-VMEM budget (the
        # uncapped ts=64 × F=256 panel OOMed the worker).  gather_batch=1
        # reproduces the original per-subtile loop exactly.
        gb = max(1, min(int(gather_batch), tile_subs))
        for j0 in range(0, tile_subs, gb):
            g_n = min(gb, tile_subs - j0)
            ohs = []
            for j in range(j0, j0 + g_n):
                s_row = src_ref[j:j + 1, :]
                w_raw = w_ref[j:j + 1, :]
                w_clean = jnp.where(jnp.isnan(w_raw), 0.0, w_raw)
                # weight folded into the src one-hot: matmul = gather × w
                O_w = jnp.where(sub_s == s_row, w_clean, 0.0)
                if not split:
                    O_w = O_w.astype(odt)
                ohs.append(O_w)
            O_cat = ohs[0] if g_n == 1 else jnp.concatenate(ohs, axis=1)
            xe = _sel(O_cat, x_ref[:], dn_vv)               # [g·128e, F]
            for jj, j in enumerate(range(j0, j0 + g_n)):
                d_row = dst_ref[j:j + 1, :]
                base = jnp.min(d_row[0, :]) // w_dst * w_dst
                d_rel = d_row - base
                O_d = (sub_d == d_rel).astype(jnp.float32 if split else odt)
                xe_j = xe[jj * 128:(jj + 1) * 128, :]
                contrib = _sel(O_d, xe_j, dn_ed)            # [W_d, F]
                y_ref[pl.ds(base, w_dst), :] += contrib
        return

    for j in range(tile_subs):
        s_row = src_ref[j:j + 1, :]
        w_raw = w_ref[j:j + 1, :]
        w_clean = jnp.where(jnp.isnan(w_raw), 0.0, w_raw)
        d_row = dst_ref[j:j + 1, :]
        base = jnp.min(d_row[0, :]) // w_dst * w_dst
        d_rel = d_row - base

        # -- min/max semirings.  Values live sublane-oriented ([128e, F]);
        # edges within a subtile are dst-sorted, so each dst is a contiguous
        # SUBLANE run: a 7-step shifted scan (static slice+pad — probed OK on
        # this Mosaic) reduces each run to its head edge, and a head-masked
        # one-hot matmul is then an exact one-contributor-per-dst selection
        # (the SpMV kernel's trick rotated 90°; spmv_onehot.py:500-530).
        valid = jnp.logical_not(jnp.isnan(w_raw))
        red = jnp.minimum if reduce == "min" else jnp.maximum
        ident = BIG if reduce == "min" else -BIG

        O_pure = (sub_s == s_row).astype(jnp.float32 if split else odt)
        xe = _sel(O_pure, x_ref[:], dn_vv)                  # pure gather
        d_sub = _to_sub(d_rel.astype(jnp.float32))          # dst per edge row
        if combine == "add":
            W_sub = _to_sub(jnp.where(valid, w_clean, ident))
            v = xe + W_sub
        elif combine == "left":
            W_sub = _to_sub(jnp.where(valid, 0.0, ident))
            v = xe + W_sub
        elif combine == "mul":
            W_mul = _to_sub(jnp.where(valid, w_clean, 0.0))
            W_pad = _to_sub(jnp.where(valid, 0.0, ident))
            v = xe * W_mul + W_pad
        else:
            raise ValueError(f"combine={combine!r} unsupported for min/max")
        vv = jnp.clip(v, -BIG, BIG)
        dd = d_sub
        for s in (1, 2, 4, 8, 16, 32, 64):
            pad_v_ = jnp.full((s, F), ident, jnp.float32)
            pad_d_ = jnp.full((s, F), -1.0, jnp.float32)
            vv_sh = jnp.concatenate([vv[s:], pad_v_], axis=0)
            dd_sh = jnp.concatenate([dd[s:], pad_d_], axis=0)
            vv = red(vv, jnp.where(dd_sh == dd, vv_sh, ident))

        d_prev = pltpu.roll(d_row, 1, 1)
        head = ((lane == 0) | (d_prev != d_row)) & valid
        O_dh = jnp.where(head, (sub_d == d_rel).astype(jnp.float32), 0.0)
        contrib_v = _sel(O_dh if split else O_dh.astype(odt), vv, dn_ed)
        contrib_c = jax.lax.dot_general(
            O_dh.astype(odt), jnp.ones((128, F), odt), dn_ed,
            preferred_element_type=jnp.float32)
        win = y_ref[pl.ds(base, w_dst), :]
        y_ref[pl.ds(base, w_dst), :] = red(
            win, jnp.where(contrib_c > 0.5, contrib_v, ident))


_VMEM_BUDGET = 15 << 20      # of the 16 MB Mosaic scoped-VMEM limit


def _max_feature_chunk(ybv: int, w_src: int) -> int:
    """Widest feature chunk whose double-buffered y/x blocks leave room
    for per-subtile scratch.  The y block [ybv, F] f32 is double-buffered
    by the pipeline (measured: F=256 at ybv=8192 allocates 17.02 MB and
    is rejected at compile), so F must satisfy
    8·F·(ybv + w_src) + scratch ≤ budget."""
    fc = (_VMEM_BUDGET - (3 << 20)) // (8 * (ybv + w_src)) // 128 * 128
    return max(fc, 128)


def _auto_gather_batch(w_src: int, F: int, tile_subs: int, ybv: int) -> int:
    """Largest gather-batch group whose scratch (concatenated one-hot +
    XE panel, f32 worst case) fits the scoped-VMEM budget left after the
    double-buffered y/x blocks — the uncapped ts=64 × F=256 panel OOMed
    and wedged the TPU worker (CLAUDE.md environment facts)."""
    avail = _VMEM_BUDGET - 8 * F * (ybv + w_src) - (1 << 20)
    per_g = 512 * (w_src + F)          # bytes per batched subtile
    return max(1, min(tile_subs, avail // max(per_g, 1)))


@functools.partial(jax.jit, static_argnames=("interpret", "precision",
                                             "reduce", "combine",
                                             "gather_batch"))
def spmm_onehot(plan: SpmmPlan, x: jax.Array, *, interpret: bool = False,
                precision: str = "default", reduce: str = "sum",
                combine: str = "mul", gather_batch: int = 0):
    """Y[dst, :] = reduce_e combine(w, X[src, :]) per the plan's edge set.

    x: [pad_v, F] f32 (pad_v = plan.pad_v, F a multiple of 128 — or the
    exact array width).  Returns y of the same shape.  precision="default"
    runs bf16 matmuls with f32 accumulation (GNN-grade, ~1e-3); "highest"
    keeps f32 operands (6-pass, exact); "split" runs the exact-selection
    bf16-pair trick (~2^-16 relative at bf16 speed) — for reduce="sum" it
    requires bf16-exact plan weights (unweighted plans; Brandes betweenness
    path), while the min/max path keeps weights on exact f32 transports so
    split is always valid there.

    reduce ∈ {"sum","min","max"}; combine ∈ {"mul","add","left"} (min/max
    only — sum is always w·x).  (min,add) is the batched-SSSP relaxation,
    (max,left)/(min,left) the parent-select/label semirings of the SpMV
    kernel widened to [V, F] panels.  min/max return ±SEMIRING_BIG for
    untouched destinations (mask like the SpMV callers do).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from cugraph_tpu.kernels.spmv_onehot import _interpret_forced

    interpret = interpret or _interpret_forced()
    F = x.shape[1]
    if x.shape[0] != plan.pad_v:
        raise ValueError(f"x rows {x.shape[0]} != plan pad_v {plan.pad_v}")
    if reduce == "sum" and combine != "mul":
        raise ValueError("reduce='sum' supports combine='mul' only")
    if precision == "split" and reduce == "sum" and not plan.split_safe:
        # the split trick casts the weight-carrying one-hot to bf16; weights
        # that don't round-trip bf16 would silently lose the ~2^-16 contract
        raise ValueError('precision="split" requires bf16-exact edge weights '
                         "(plan.split_safe); use \"highest\" instead")

    ts = plan.tile_subs

    def _call(xc):
        fc = xc.shape[1]
        gb = (gather_batch if gather_batch > 0
              else _auto_gather_batch(plan.w_src, fc, ts, plan.ybv))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(plan.num_tiles,),
            in_specs=[
                pl.BlockSpec((ts, 128), lambda i, xw, yb: (i, 0)),
                pl.BlockSpec((ts, 128), lambda i, xw, yb: (i, 0)),
                pl.BlockSpec((ts, 128), lambda i, xw, yb: (i, 0)),
                pl.BlockSpec((plan.w_src, fc), lambda i, xw, yb: (xw[i], 0)),
            ],
            out_specs=pl.BlockSpec((plan.ybv, fc),
                                   lambda i, xw, yb: (yb[i], 0)),
        )
        return pl.pallas_call(
            functools.partial(_kernel, w_src=plan.w_src, w_dst=plan.w_dst,
                              precision=precision, tile_subs=ts,
                              reduce=reduce, combine=combine,
                              gather_batch=gb),
            out_shape=jax.ShapeDtypeStruct((plan.n_yblocks * plan.ybv, fc),
                                           jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(plan.xwin, plan.yblk, plan.src_rel, plan.dst_rel, plan.weight, xc)

    # feature chunking: double-buffered [ybv, F] y blocks exceed the 16 MB
    # scoped-VMEM limit past F≈180 at the default ybv — wide feature
    # matrices (GNN hidden layers) run one plan sweep per VMEM-sized chunk
    fc_max = _max_feature_chunk(plan.ybv, plan.w_src)
    if F <= fc_max:
        y = _call(x)
    else:
        y = jnp.concatenate(
            [_call(x[:, i:i + fc_max]) for i in range(0, F, fc_max)], axis=1)
    return y[: plan.pad_v]


def _fit_rows(a: jax.Array, rows: int) -> jax.Array:
    if a.shape[0] < rows:
        return jnp.pad(a, ((0, rows - a.shape[0]), (0, 0)))
    return a[:rows]


def make_spmm_pair(plan_fwd: SpmmPlan, plan_bwd: SpmmPlan):
    """Differentiable SpMM: forward = plan_fwd, VJP = plan_bwd (the transpose
    orientation — for y = A·x, dx = Aᵀ·dy).  Plans are closed over (pallas
    calls are not auto-differentiable); pad_v mismatches between the two
    plans' window-aligned paddings are reconciled by row fit."""

    @jax.custom_vjp
    def f(x):
        return spmm_onehot(plan_fwd, _fit_rows(x, plan_fwd.pad_v))

    def fwd(x):
        return f(x), x.shape[0]

    def bwd(rows, gy):
        gx = spmm_onehot(plan_bwd, _fit_rows(gy, plan_bwd.pad_v))
        return (_fit_rows(gx, rows),)

    f.defvjp(fwd, bwd)
    return f


# -- plan cache keyed by GraphStructure identity (weakref'd) -----------------

_plan_cache: list = []


def get_structure_spmm_plan(g) -> SpmmPlan:
    """Cached pull-orientation SpMM plan for a GraphStructure (csc: in-edge
    aggregation, the GNN direction).  Entries die with the structure."""
    global _plan_cache
    _plan_cache = [(r, p) for (r, p) in _plan_cache if r() is not None]
    for r, p in _plan_cache:
        if r() is g:
            return p
    e = g.csc.num_edges
    src = np.asarray(g.csc.indices)[:e]
    dst = np.asarray(g.csc.majors)[:e]
    w = np.asarray(g.csc.weights)[:e]
    plan = build_spmm_plan(src, dst, w, g.num_vertices)
    _plan_cache.append((weakref.ref(g), plan))
    return plan


_fn_cache: list = []


def get_structure_spmm_fn(g):
    """Cached DIFFERENTIABLE pull SpMM callable for a GraphStructure —
    make_spmm_pair over (pull, transpose) plans, so gradient tracers flow
    through the custom VJP instead of hitting the raw pallas_call (which
    has no differentiation rule)."""
    global _fn_cache
    _fn_cache = [(r, f) for (r, f) in _fn_cache if r() is not None]
    for r, f in _fn_cache:
        if r() is g:
            return f
    from cugraph_tpu.prims.intersection import _host_csr

    fwd = get_structure_spmm_plan(g)
    # transpose plan from the CACHED host copies (a fresh np.asarray per
    # array would repeat the device->host tunnel transfers)
    offs, ind, w = _host_csr(g.csc, True)
    e = g.csc.num_edges
    bwd = build_spmm_plan(np.asarray(g.csc.majors)[:e], ind[:e], w[:e],
                          g.num_vertices)
    f = make_spmm_pair(fwd, bwd)
    _fn_cache.append((weakref.ref(g), f))
    return f
