"""One-hot-matmul SpMV: y[dst] = Σ_{(src,dst)} w · x[src] without gathers.

Why: on TPU, XLA lowers both `jnp.take` and `segment_sum` to scalar loops
(~0.12 G elem/s measured on v5e), two orders of magnitude under HBM speed of
light.  There is no vector gather on this hardware generation (Mosaic's
`dynamic_gather` also scalarizes), so the only fast paths are dense VPU/MXU
ops.  This kernel re-expresses gather AND scatter as exact one-hot matrix
products:

    gather:  xe[e]    = Σ_h Σ_l O_hi[e,h] · X[h,l] · O_lo[e,l]
    scatter: y[h2,l] += Σ_e D_hi[e,h2] · v[e] · D_lo[e,l]

with all one-hots built by broadcasting an index ROW against a sublane iota
(the cheap broadcast direction) and consumed via `dot_general` in transposed
orientation, so no vector transposes are emitted.  f32 one-hot products are
EXACT (each output is a sum of selected inputs — no rounding beyond the adds).

Tiling (host-side "plan", all static per graph):
* vertices padded to rows of 128 lanes; x windows of 16384 vertices
  (= one [128,128] VMEM block), y blocks of `yb_rows`·128 vertices resident
  in VMEM, per-subtile dst windows of 8192 vertices (64 y rows).
* edges sorted by (y block, x window, dst); subtiles of 128 edges never cross
  a dst window; 8 subtiles per tile share one x window.
* per tile scalar-prefetch: x-window block index + y-block index (drives the
  BlockSpec index maps); the per-subtile dst-window offset is recovered
  in-kernel from the dst values themselves (all lanes of a subtile carry the
  same dst>>13).

This replaces the reference's degree-segmented per_v_transform_reduce_e
kernels (cpp/include/cugraph/prims/detail/per_v_transform_reduce_e.cuh:252-688)
— degree segmentation is irrelevant here because every edge costs the same
dense work; load balance is inherent.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

SRC_WIN = 16384        # default vertices per x window (= 128 rows of 128 lanes)
DST_WIN = 8192         # default vertices per dst window (= 64 y rows)
DEFAULT_YB_ROWS = 8192  # y rows per VMEM-resident block (= 1M vertices, 4 MB)

# autotune candidates: (src_win, dst_win) pairs the cost model may pick from.
# Smaller windows cut MACs/edge linearly but fragment tiles (padding); the
# sweet spot depends on the graph's degree structure.
AUTOTUNE_WINDOWS = [(32768, 8192), (16384, 8192), (16384, 4096),
                    (8192, 8192), (8192, 4096), (4096, 4096), (4096, 2048)]

# finite "infinity" for the min/max semirings: large enough to dominate any
# real distance, small enough that the split-bf16 trick stays exact-ish
# (true ±inf would make d_lo = inf - inf = NaN in the split)
SEMIRING_BIG = np.float32(1e30)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SpmvPlan:
    """Static tiling of one (graph, orientation) for the one-hot SpMV."""

    src_rel: jax.Array   # int32 [T*8, 128]  src − xwin·src_win   (0 padding)
    dst_full: jax.Array  # int32 [T*8, 128]  dst − yblk·yb_rows·128
    weight: jax.Array    # f32   [T*8, 128]  0 on padding lanes
    xwin_blk: jax.Array  # int32 [T]   x block index (= src // src_win)
    yblk: jax.Array      # int32 [T]   y block index
    num_vertices: int = field(metadata=dict(static=True))
    n_rows: int = field(metadata=dict(static=True))      # padded x rows
    yb_rows: int = field(metadata=dict(static=True))     # y rows per block
    n_yblocks: int = field(metadata=dict(static=True))
    num_tiles: int = field(metadata=dict(static=True))
    src_win: int = field(default=SRC_WIN, metadata=dict(static=True))
    dst_win: int = field(default=DST_WIN, metadata=dict(static=True))
    tile_subs: int = field(default=8, metadata=dict(static=True))

    @property
    def pad_v(self) -> int:
        return self.n_rows * 128


def _round_up(x, m):
    return (x + m - 1) // m * m


def auto_tile_subs(est_subs, cap: int = 128) -> int:
    """Subtiles packed per grid step: amortize the ~0.25 µs per-grid-step
    overhead by growing tiles until ~2k remain.  `est_subs` is the
    (estimated) 128-edge subtile count.  SINGLE source of truth —
    build_spmv_plan / estimate_windows / estimate_plan_bytes /
    build_spmm_plan / the stacked MG builders all take their tile_subs from
    here.

    Packs until ~1k tiles remain, cap=128 for SpMV (TPU-measured round 3:
    RMAT-20 at ts=128/T=1089 runs 9.36 vs 9.69 ms/iter = 1.793 GTEPS;
    ts=256 would push the batched gather one-hots past the 16 MB VMEM
    limit).  SpMM passes cap=64 — its in-kernel buffers scale with ts×F
    and OOMed at ts=64, F=256 already."""
    return int(min(cap, max(8, 2 ** int(np.ceil(np.log2(
        max(est_subs / 1024, 1)))))))


def estimate_windows(src, dst, num_vertices: int,
                     yb_rows: int = DEFAULT_YB_ROWS,
                     candidates=None):
    """Pick (src_win, dst_win) minimizing a MAC+tile cost model.

    One finest-granularity bucket count (a single np.unique sort) yields the
    tile counts of EVERY candidate window pair by aggregation — no device
    work, no per-candidate edge sorts.  The cost model charges each tile its
    split-precision MXU MACs (gather ∝ src_win rows, scatter ∝ dst_win rows)
    plus a VPU term for the one-hot builds; constants calibrated on v5e
    (see benchmarks/bench_kernel_windows.py).
    """
    candidates = candidates or AUTOTUNE_WINDOWS
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    m = src.shape[0]
    if m == 0:
        return SRC_WIN, DST_WIN
    fine_s = min(c[0] for c in candidates)
    fine_d = min(c[1] for c in candidates)
    n_rows = max(_round_up(num_vertices, 128) // 128, 1)
    # y-block span is identical across candidates in practice (yb_rows is a
    # multiple of every dw//128); compute it from the coarsest dst window
    dwr_max = max(c[1] for c in candidates) // 128
    ybr = min(_round_up(n_rows, dwr_max), _round_up(yb_rows, dwr_max))
    ybv = ybr * 128

    # ONE sort at finest granularity; every candidate aggregates these buckets
    fine_key = ((dst // ybv) << 42) | ((src // fine_s) << 21) | (dst // fine_d)
    fkey, fcnt = np.unique(fine_key, return_counts=True)
    f_yb = fkey >> 42
    f_sg = (fkey >> 21) & ((1 << 21) - 1)
    f_dw = fkey & ((1 << 21) - 1)

    best, best_cost = None, np.inf
    for sw, dw in candidates:
        dwr = dw // 128
        ck = ((f_yb << 42) | ((f_sg // (sw // fine_s)) << 21)
              | (f_dw // (dw // fine_d)))
        bk, pos = np.unique(ck, return_inverse=True)
        bc = np.zeros(len(bk), np.int64)
        np.add.at(bc, pos, fcnt)
        b_subs = -(-bc // 128)
        S = int(b_subs.sum())
        b_rg = bk >> 21
        rg_ids, rg_pos = np.unique(b_rg, return_inverse=True)
        rg_subs = np.zeros(len(rg_ids), np.int64)
        np.add.at(rg_subs, rg_pos, b_subs)
        ts = auto_tile_subs(S)
        T = int(np.sum(-(-rg_subs // ts)))
        xw_rows = sw // 128
        # two-term model CALIBRATED on v5e RMAT-20 at tile_subs=64 (within
        # 3% on 8 measured configs — tsweep logs in git history):
        # A — per-grid-step overhead; s — per-subtile one-hot/elementwise
        # work; g — each extra 128-deep gather matmul pass (the systolic
        # array contracts ≤128 deep per pass, so x windows ≤ 16384 are free)
        A, s_sub, g = 0.25e-6, 66e-9, 39e-9
        cost = T * A + S * (s_sub + g * (-(-xw_rows // 128) - 1))
        if cost < best_cost:
            best, best_cost = (sw, dw), cost
    return best


def estimate_plan_bytes(src, dst, num_vertices: int,
                        yb_rows: int = DEFAULT_YB_ROWS,
                        src_win: int = SRC_WIN, dst_win: int = DST_WIN,
                        tile_subs: int | None = None) -> int:
    """Exact tile-array byte count of the plan build_spmv_plan would produce
    (src_rel + dst_full + weight), via the same run/packing math — used by
    the spill dispatcher; a per-edge heuristic badly underestimates plans
    fragmented by window tiling.  tile_subs=None mirrors build_spmv_plan's
    auto pick (fragmented plans pack at up to 64 subtiles/tile; packing at a
    fixed 8 underestimated such plans by up to 8x)."""
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    if src.shape[0] == 0:
        return 8 * 128 * 12
    TS = (auto_tile_subs(max(src.shape[0] // 128, 1))
          if tile_subs is None else int(tile_subs))
    n_rows = max(_round_up(num_vertices, 128) // 128, 1)
    dwr = dst_win // 128
    ybr = min(_round_up(n_rows, dwr), _round_up(yb_rows, dwr))
    ybv = ybr * 128
    key = ((dst // ybv) << 42) | ((src // src_win) << 21) | (dst // dst_win)
    bk, bc = np.unique(key, return_counts=True)
    b_subs = -(-bc // 128)
    b_rg = bk >> 21
    rg_ids, rg_pos = np.unique(b_rg, return_inverse=True)
    rg_subs = np.zeros(len(rg_ids), np.int64)
    np.add.at(rg_subs, rg_pos, b_subs)
    T = int(np.sum(-(-rg_subs // TS)))
    return T * TS * 128 * 12


def build_spmv_plan(src, dst, weight, num_vertices: int,
                    yb_rows: int = DEFAULT_YB_ROWS,
                    device_arrays: bool = True,
                    src_win: int = SRC_WIN,
                    dst_win: int = DST_WIN,
                    tile_subs: int | None = None) -> SpmvPlan:
    """Host-side tiling.  src/dst int arrays, weight float or None.

    Pure vectorized NumPy; the analog of the reference's one-time CSR
    compression + segment bookkeeping (create_graph_from_edgelist_impl.cuh).
    ``device_arrays=False`` keeps the tile arrays as host NumPy (for the
    spill path, kernels/spill.py, where the plan exceeds HBM).
    ``src_win``/``dst_win`` set the gather/scatter window sizes (powers of
    two; see estimate_windows for the autotuned choice).
    """
    SRC_WIN_, DST_WIN_ = int(src_win), int(dst_win)
    if SRC_WIN_ & (SRC_WIN_ - 1) or DST_WIN_ & (DST_WIN_ - 1):
        raise ValueError("src_win/dst_win must be powers of two")
    if SRC_WIN_ % 128 or DST_WIN_ % 128:
        raise ValueError("src_win/dst_win must be multiples of 128")
    dw_rows = DST_WIN_ // 128
    if tile_subs is None:
        TS = auto_tile_subs(max(len(np.asarray(src)) // 128, 1))
    else:
        TS = int(tile_subs)
    if TS & (TS - 1) or TS < 1:
        raise ValueError("tile_subs must be a power of two")
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    m = src.shape[0]
    w = np.ones(m, np.float32) if weight is None else np.asarray(weight, np.float32)
    if m and not np.isfinite(w).all():
        raise ValueError("spmv plan requires finite edge weights "
                         "(NaN marks padding lanes)")

    n_rows = max(_round_up(num_vertices, 128) // 128, 1)
    # y blocks must hold whole dst windows: a non-multiple would let the
    # in-kernel dst-window scatter straddle y-block boundaries
    yb_rows = _round_up(yb_rows, dw_rows)
    yb_rows = min(_round_up(n_rows, dw_rows), yb_rows)
    ybv = yb_rows * 128                      # vertices per y block
    n_yblocks = max(_round_up(n_rows, yb_rows) // yb_rows, 1)

    conv = jnp.asarray if device_arrays else np.asarray

    if m == 0:
        # one empty tile PER y block so every output block gets zero-inited
        t = n_yblocks
        return SpmvPlan(
            src_rel=conv(np.zeros((t * TS, 128), np.int32)),
            dst_full=conv(np.zeros((t * TS, 128), np.int32)),
            weight=conv(np.full((t * TS, 128), np.nan, np.float32)),
            xwin_blk=conv(np.zeros((t,), np.int32)),
            yblk=conv(np.arange(t, dtype=np.int32)),
            num_vertices=num_vertices, n_rows=n_rows, yb_rows=yb_rows,
            n_yblocks=n_yblocks, num_tiles=t,
            src_win=SRC_WIN_, dst_win=DST_WIN_, tile_subs=TS,
        )

    # native C++ tiler (counting sorts, core/_native/builder.cpp) — ~4×
    # numpy's int64 lexsort + fancy-index scatter at RMAT-20 scale; produces
    # bit-identical arrays (tests/test_native.py::test_native_spmv_plan)
    if m >= 100_000 and not os.environ.get("CUGRAPH_TPU_NO_NATIVE"):
        from cugraph_tpu.core.native import spmv_plan_native

        res = spmv_plan_native(src, dst, None if weight is None else w,
                               n_rows, yb_rows, SRC_WIN_, DST_WIN_, TS)
        if res is not None:
            sr, df, wa, xb, yb_arr, T = res
            return SpmvPlan(
                src_rel=conv(sr), dst_full=conv(df), weight=conv(wa),
                xwin_blk=conv(xb), yblk=conv(yb_arr),
                num_vertices=num_vertices, n_rows=n_rows, yb_rows=yb_rows,
                n_yblocks=n_yblocks, num_tiles=T,
                src_win=SRC_WIN_, dst_win=DST_WIN_, tile_subs=TS)

    yblock = dst // ybv
    group = src // SRC_WIN_
    dwin = dst // DST_WIN_
    n_groups = int(group.max()) + 1

    # sort by (yblock, group, dst) → dst windows form contiguous runs
    order = np.lexsort((dst, group, yblock))
    src, dst, w = src[order], dst[order], w[order]
    yblock, group, dwin = yblock[order], group[order], dwin[order]

    # run = maximal stretch with constant (yblock, group, dwin)
    key = (yblock * n_groups + group) * (dwin.max() + 1) + dwin
    run_start = np.empty(m, bool)
    run_start[0] = True
    np.not_equal(key[1:], key[:-1], out=run_start[1:])
    run_id = np.cumsum(run_start) - 1
    run_first = np.flatnonzero(run_start)
    pos_in_run = np.arange(m) - run_first[run_id]

    sub_in_run = pos_in_run >> 7
    lane = pos_in_run & 127
    # subtile enumeration in stream order
    sub_start = run_start | (lane == 0)
    sub_id = np.cumsum(sub_start) - 1
    n_sub = int(sub_id[-1]) + 1

    # per-subtile (yblock, group) for tile packing
    sub_first = np.flatnonzero(sub_start)
    sub_yb = yblock[sub_first]
    sub_grp = group[sub_first]
    sub_rg = sub_yb * n_groups + sub_grp
    # subtiles are already grouped by rg (stream order); pack 8 per tile
    rg_start = np.empty(n_sub, bool)
    rg_start[0] = True
    np.not_equal(sub_rg[1:], sub_rg[:-1], out=rg_start[1:])
    rg_id = np.cumsum(rg_start) - 1
    rg_first_sub = np.flatnonzero(rg_start)
    sub_seq = np.arange(n_sub) - rg_first_sub[rg_id]
    tile_in_rg = sub_seq // TS
    slot = sub_seq % TS
    # tiles per rg and tile offsets
    rg_sub_counts = np.diff(np.append(rg_first_sub, n_sub))
    rg_tiles = -(-rg_sub_counts // TS)
    rg_tile_off = np.concatenate([[0], np.cumsum(rg_tiles)])
    sub_tile = rg_tile_off[rg_id] + tile_in_rg
    T = int(rg_tile_off[-1])

    # per-edge placement.  Padding lanes carry weight = NaN: the in-kernel
    # validity mask is ~isnan(w), letting min/max semirings exclude padding
    # exactly (the sum path maps NaN → 0, same effect as before).
    e_row = sub_tile[sub_id] * TS + slot[sub_id]
    src_rel = np.zeros((T * TS, 128), np.int32)
    dst_full = np.zeros((T * TS, 128), np.int32)
    weight_a = np.full((T * TS, 128), np.nan, np.float32)
    src_rel[e_row, lane] = src - group * SRC_WIN_
    dst_full[e_row, lane] = dst - yblock * ybv
    weight_a[e_row, lane] = w

    # padding lanes must carry the subtile's dst window (for >>13 recovery):
    # fill each used row's padding lanes with the row's window base.
    sub_dwin_rel = (dwin[sub_first] - sub_yb * (ybv // DST_WIN_)).astype(np.int64)
    row_base = np.zeros(T * TS, np.int64)  # unused rows → window 0 (harmless)
    row_of_sub = sub_tile * TS + slot
    row_base[row_of_sub] = sub_dwin_rel * DST_WIN_
    dst_col = np.broadcast_to(row_base[:, None], (T * TS, 128)).copy()
    filled = np.zeros((T * TS, 128), bool)
    filled[e_row, lane] = True
    dst_full = np.where(filled, dst_full, dst_col).astype(np.int32)
    src_rel = np.where(filled, src_rel, 0).astype(np.int32)

    # per-tile scalars
    xwin_blk = np.zeros(T, np.int32)
    yblk_arr = np.zeros(T, np.int32)
    tile_of_rg = np.repeat(np.arange(len(rg_tiles)), rg_tiles)
    rg_yb = sub_yb[rg_first_sub]
    rg_grp = sub_grp[rg_first_sub]
    xwin_blk[:] = rg_grp[tile_of_rg]
    yblk_arr[:] = rg_yb[tile_of_rg]

    # every y block MUST receive at least one tile: the kernel zero-inits a
    # block on its first visiting grid step, and pallas output buffers are
    # NOT zero-initialized — an edge-less block would otherwise return
    # uninitialized memory.  Append one empty (all-padding) tile per missing
    # block and keep tiles sorted by y block.
    missing = np.setdiff1d(np.arange(n_yblocks), np.unique(yblk_arr))
    if len(missing):
        pad_tiles = len(missing)
        src_rel = np.concatenate([src_rel,
                                  np.zeros((pad_tiles * TS, 128), np.int32)])
        dst_full = np.concatenate([dst_full,
                                   np.zeros((pad_tiles * TS, 128), np.int32)])
        weight_a = np.concatenate([weight_a,
                                   np.full((pad_tiles * TS, 128), np.nan,
                                           np.float32)])
        xwin_blk = np.concatenate([xwin_blk, np.zeros(pad_tiles, np.int32)])
        yblk_arr = np.concatenate([yblk_arr, missing.astype(np.int32)])
        order_t = np.argsort(yblk_arr, kind="stable")
        yblk_arr = yblk_arr[order_t]
        xwin_blk = xwin_blk[order_t]
        rows = (order_t[:, None] * TS + np.arange(TS)).reshape(-1)
        src_rel = src_rel[rows]
        dst_full = dst_full[rows]
        weight_a = weight_a[rows]
        T += pad_tiles

    return SpmvPlan(
        src_rel=conv(src_rel),
        dst_full=conv(dst_full),
        weight=conv(weight_a),
        xwin_blk=conv(xwin_blk),
        yblk=conv(yblk_arr),
        num_vertices=num_vertices,
        n_rows=n_rows,
        yb_rows=yb_rows,
        n_yblocks=n_yblocks,
        num_tiles=T,
        src_win=SRC_WIN_,
        dst_win=DST_WIN_,
        tile_subs=TS,
    )


def _kernel(xwin_ref, yblk_ref, src_ref, dst_ref, w_ref, x_ref, *refs,
            precision, reduce, combine, src_win=SRC_WIN, dst_win=DST_WIN,
            gather="src", tile_subs=8, eq_atol=0.0, eq_rtol=0.0):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # combine="eqsel_rel" takes a SECOND x operand blocked like y (the
    # reduce-endpoint view); everything else has just the y_ref tail
    y_ref = refs[-1]
    xd_ref = refs[0] if len(refs) > 1 else None

    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)
    split = precision in ("split", "split3")
    limbs = 3 if precision == "split3" else 2
    i = pl.program_id(0)
    BIG = SEMIRING_BIG
    init = {"sum": 0.0, "min": BIG, "max": -BIG}[reduce]
    xw_rows = src_win // 128
    dw_rows = dst_win // 128
    log2dw = dst_win.bit_length() - 1

    @pl.when(jnp.logical_or(i == 0,
                            yblk_ref[i] != yblk_ref[jnp.maximum(i - 1, 0)]))
    def _():
        y_ref[:] = jnp.full_like(y_ref, init)

    sub128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    subX = jax.lax.broadcasted_iota(jnp.int32, (xw_rows, 128), 0)
    subD = jax.lax.broadcasted_iota(jnp.int32, (dw_rows, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    dn_hh = (((0,), (0,)), ((), ()))
    dn_ee = (((1,), (1,)), ((), ()))
    odt = jnp.bfloat16 if split else jnp.float32

    def _sel(data_f32, onehot, dims):
        """data @ onehot at full MXU rate, exactly (split/split3) or `prec`.

        "split": f32 → 2 bf16 limbs; each one-hot product selects one addend,
        so both bf16 matmuls are exact selections and their f32 sum recovers
        the value to ~2^-16 RELATIVE — NOT enough for integer vertex ids
        ≥ 2^16 (measured ±4 at 2^20: tests/test_kernels.py::
        test_split3_id_selection_exact).  "split3" adds the third limb
        (8+8+8 = 24 significand bits): BIT-exact for every normal f32 at 3
        passes instead of "highest"'s 6 — use it whenever the selected
        payloads are vertex ids and the graph may exceed 2^16 vertices.
        """
        if not split:
            return jax.lax.dot_general(data_f32, onehot, dims,
                                       preferred_element_type=jnp.float32,
                                       precision=prec)
        out, rem = None, data_f32
        for _ in range(limbs):
            limb = rem.astype(jnp.bfloat16)
            rem = rem - limb.astype(jnp.float32)
            term = jax.lax.dot_general(limb, onehot, dims,
                                       preferred_element_type=jnp.float32)
            out = term if out is None else out + term
        return out

    # -- gather, batched across the tile's subtiles: wide one-hot matmuls
    # keep the MXU pipelined instead of per-subtile narrow dispatches.
    # The batch is VMEM-BUDGETED: live buffers are O_hiT [xw_rows, GB·128]
    # (odt) + O_loT/R_T [128, GB·128] f32, plus ~50% split-limb temporaries;
    # GB=64 at the RMAT-20 config (xw_rows=128, split) measures right at
    # the 16 MB scoped limit (model bytes = 10 MB), so the model budget is
    # 10 MB — plans with LARGER x windows (RMAT-23 autotunes src_win=32768)
    # halve the batch instead of OOMing the Mosaic compiler.
    # combine="right" never reads x, and gather="dst" reads x inside the
    # scatter loop (dst-side one-hots) — both skip the src-side gather.
    if combine != "right" and gather == "src":
        odt_b = 2 if split else 4
        # split pays ~50% limb temporaries on top of the model bytes, so its
        # budget is 10 MB (GB=64 at the RMAT-20 config sits exactly there);
        # the non-split path has no temporaries and its measured RMAT-20
        # config (xw_rows=128, GB=64 → 12.58 MB model) fits the 16 MB
        # scoped limit — don't shrink a proven configuration.
        budget = (10 << 20) if split else (13 << 20)
        GB = min(tile_subs, 64)
        while GB > 8 and GB * 128 * (xw_rows * odt_b + 1024) > budget:
            GB //= 2
        xe_parts = []
        for c0 in range(0, tile_subs, GB):
            O_hi_cols, O_lo_cols = [], []
            for j in range(c0, c0 + GB):
                s_row = src_ref[j:j + 1, :]
                O_hi_cols.append((subX == (s_row >> 7)).astype(odt))
                O_lo_cols.append((sub128 == (s_row & 127)).astype(jnp.float32))
            O_hiT = jnp.concatenate(O_hi_cols, axis=1)   # [h, GB·128]
            O_loT = jnp.concatenate(O_lo_cols, axis=1)
            R_T = _sel(x_ref[:], O_hiT, dn_hh)           # [l, GB·128]
            xe_parts.append(jnp.sum(R_T * O_loT, axis=0, keepdims=True))
        xe_all = (xe_parts[0] if len(xe_parts) == 1
                  else jnp.concatenate(xe_parts, axis=1))

    # NOTE (measured, do not repeat): batching the min/max 7-step run scan
    # across all tile_subs as one [ts,128] block made the semiring kernels
    # SLOWER (13.2 → 14.7 ms/iter at RMAT-20) — the [1,128]-lane-slice →
    # sublane-row relayout (64 concat copies per tile) costs more than the
    # narrow per-subtile scan it replaces.  bench logs: /tmp/semiring_*.log,
    # benchmarks/bench_semirings_tpu.py.

    # -- scatter per subtile (each has its own dst window)
    for j in range(tile_subs):
        w_raw = w_ref[j:j + 1, :]
        valid = jnp.logical_not(jnp.isnan(w_raw))    # NaN marks padding lanes
        d_row = dst_ref[j:j + 1, :]
        d13 = jnp.min(d_row[0, :]) >> log2dw     # subtile dst-window id
        d_rel = d_row - (d13 << log2dw)
        D_hiT = (subD == (d_rel >> 7)).astype(jnp.float32)
        D_loT = (sub128 == (d_rel & 127)).astype(odt)
        off = d13 * dw_rows

        if gather == "dst":
            # gather x at the REDUCE endpoint (x is y-block shaped): reuse
            # the dst one-hots — R_D[l, e] = Σ_r x[off+r, l]·D_hiT[r, e].
            # _sel keeps the selection BIT-exact under "highest" (6-pass)
            # or "split3" (3 bf16 limbs, ~2x cheaper) — eqsel's equality
            # test needs exactness, so plain "split" is rejected below.
            x_slice = x_ref[pl.ds(off, dw_rows), :]
            R_D = _sel(x_slice, D_hiT if not split
                       else D_hiT.astype(odt), dn_hh)
            xe = jnp.sum(R_D * D_loT.astype(jnp.float32), axis=0,
                         keepdims=True)
        elif combine != "right":
            xe = xe_all[:, j * 128:(j + 1) * 128]

        if combine == "mul":
            v_row = xe * jnp.where(valid, w_raw, 0.0)
        elif combine == "add":
            v_row = xe + jnp.where(valid, w_raw, 0.0)
        elif combine == "right":  # edge value is just the edge weight
            v_row = jnp.where(valid, w_raw, 0.0)
        elif combine == "eqsel":
            # argmax-recovery pass (per_v_random_select, gather="dst"): where
            # the reduce-side maximum equals this edge's priority, the value
            # becomes the edge's ABSOLUTE source id (reconstructed in-kernel
            # from the window base + relative id; exact in f32 below 2^24
            # vertices).  Exact equality holds because the dst-side gather is
            # a single-term selection at HIGHEST precision.
            src_abs = (xwin_ref[i] * src_win
                       + src_ref[j:j + 1, :]).astype(jnp.float32)
            v_row = jnp.where(valid & (xe == w_raw), src_abs, -BIG)
        elif combine == "eqsel_rel":
            # relaxation-equality parent recovery (BFS/SSSP predecessors):
            # where x[src] + w (within eq_atol + eq_rtol·|x[dst]| — the
            # forward sweeps run split precision, ~2^-17 relative) meets the
            # reduce-endpoint x[dst], the value is the edge's absolute source
            # id.  Both gathers are exact selections under split3/highest.
            xds = xd_ref[pl.ds(off, dw_rows), :]
            R_Dx = _sel(xds, D_hiT if not split else D_hiT.astype(odt), dn_hh)
            xd = jnp.sum(R_Dx * D_loT.astype(jnp.float32), axis=0,
                         keepdims=True)
            src_abs = (xwin_ref[i] * src_win
                       + src_ref[j:j + 1, :]).astype(jnp.float32)
            diff = jnp.abs(xe + jnp.where(valid, w_raw, 0.0) - xd)
            tol = jnp.float32(eq_atol) + jnp.float32(eq_rtol) * jnp.abs(xd)
            v_row = jnp.where(valid & (diff <= tol), src_abs, -BIG)
        else:  # "left": edge value is just the gathered src value
            v_row = xe

        if reduce == "sum":
            A = D_hiT * jnp.where(valid, v_row, 0.0)
            contrib = _sel(A, D_loT, dn_ee)
            y_ref[pl.ds(off, dw_rows), :] += contrib
            continue

        # -- min/max scatter.  Edges within a subtile are dst-sorted, so each
        # dst forms one contiguous lane run; a 7-step shifted scan reduces the
        # run to its head lane, and the one-contributor-per-dst sum matmul is
        # then an EXACT selection.  A 0/1 indicator matmul flags touched dsts
        # (untouched ones must keep the reduce identity, not pick up the 0 the
        # value matmul produces).  This replaces the reference's atomic-min
        # scatter (prims/detail/per_v_transform_reduce_e.cuh reduce_op::min).
        if reduce == "min":
            red, ident = jnp.minimum, BIG
        else:
            red, ident = jnp.maximum, -BIG
        vv = jnp.where(valid, jnp.clip(v_row, -BIG, BIG), ident)
        for s in (1, 2, 4, 8, 16, 32, 64):
            d_sh = pltpu.roll(d_row, 128 - s, 1)   # lane l ← lane l+s (cyclic)
            v_sh = pltpu.roll(vv, 128 - s, 1)
            ok = (lane < 128 - s) & (d_sh == d_row)
            vv = red(vv, jnp.where(ok, v_sh, ident))
        d_prev = pltpu.roll(d_row, 1, 1)
        head = ((lane == 0) | (d_prev != d_row)) & valid
        A_val = D_hiT * jnp.where(head, vv, 0.0)
        A_ind = D_hiT * jnp.where(head, 1.0, 0.0)
        contrib_v = _sel(A_val, D_loT, dn_ee)
        contrib_c = jax.lax.dot_general(
            A_ind.astype(odt), D_loT, dn_ee,
            preferred_element_type=jnp.float32)
        win = y_ref[pl.ds(off, dw_rows), :]
        y_ref[pl.ds(off, dw_rows), :] = red(
            win, jnp.where(contrib_c > 0.5, contrib_v, ident))


@functools.partial(jax.jit, static_argnames=("interpret", "precision",
                                             "reduce", "combine", "gather",
                                             "eq_atol", "eq_rtol"))
def spmv_onehot(plan: SpmvPlan, x: jax.Array, *, interpret: bool = False,
                precision: str = "highest", reduce: str = "sum",
                combine: str = "mul", gather: str = "src",
                eq_atol: float = 0.0, eq_rtol: float = 0.0):
    """Semiring SpMV: y[dst] = REDUCE_{(src,dst)} COMBINE(x[src], w).

    x: [pad_v] f32 (pad_v = plan.n_rows·128).  Returns y with the same shape.

    reduce ∈ {"sum","min","max"}, combine ∈ {"mul","add","left","right",
    "eqsel"} ("left" ignores the weight, "right" ignores x — and skips the
    gather entirely; "eqsel" selects the edge whose weight equals the
    reduce-side x and returns its absolute source id — see
    dispatch.per_v_random_select).  gather ∈ {"src","dst"}: where x is read
    ("dst" = the reduce endpoint, required by eqsel).  Untouched destinations get the reduce identity
    (0 / SEMIRING_BIG / −SEMIRING_BIG).  The (min,add) pair is the SSSP
    relaxation, (max,left) the BFS parent-select, (min,left) WCC label
    propagation — the reference's reduce_op library (prims/reduce_op.cuh:285)
    realized as MXU one-hot products.  For min/max with combine="mul", x must
    be finite (0·±inf = NaN would poison the scan).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if combine in ("eqsel", "eqsel_rel") and precision not in ("highest",
                                                               "split3"):
        raise ValueError("eqsel needs a BIT-exact selection precision "
                         "('highest' or 'split3'); 'split' is ~16-bit")
    if combine == "eqsel_rel" and gather != "src":
        raise ValueError("eqsel_rel gathers x at BOTH endpoints and "
                         "requires gather='src' (the dst view is implicit)")
    interpret = interpret or _interpret_forced()
    n_rows, yb = plan.n_rows, plan.yb_rows
    yb_pad_rows = plan.n_yblocks * yb
    x2 = x.reshape(-1, 128)
    if gather == "dst":
        # x is read at the REDUCE endpoint (per_v_random_select eqsel pass):
        # shape and indexing follow the y blocks, not the x windows
        if x2.shape[0] < yb_pad_rows:
            x2 = jnp.pad(x2, ((0, yb_pad_rows - x2.shape[0]), (0, 0)))
        x_spec = pl.BlockSpec((yb, 128), lambda i, xw, yb_: (yb_[i], 0))
    else:
        xwin_rows = plan.src_win // 128
        # x rows come from x itself (≥ plan.n_rows·128): a spilled/chunked
        # plan (kernels/spill.py) writes only its own y-block span but reads
        # the FULL x, so the two row counts are deliberately decoupled
        # pad x rows to full windows so the x BlockSpec never over-reads
        xw_rows = _round_up(x2.shape[0], xwin_rows)
        if xw_rows != x2.shape[0]:
            x2 = jnp.pad(x2, ((0, xw_rows - x2.shape[0]), (0, 0)))
        x_spec = pl.BlockSpec((xwin_rows, 128),
                              lambda i, xw, yb_: (xw[i], 0))

    ts = plan.tile_subs
    in_specs = [
        pl.BlockSpec((ts, 128), lambda i, xw, yb_: (i, 0)),
        pl.BlockSpec((ts, 128), lambda i, xw, yb_: (i, 0)),
        pl.BlockSpec((ts, 128), lambda i, xw, yb_: (i, 0)),
        x_spec,
    ]
    operands = [plan.src_rel, plan.dst_full, plan.weight, x2]
    if combine == "eqsel_rel":
        # second view of x, blocked like y (the reduce-endpoint side)
        xd2 = x.reshape(-1, 128)
        if xd2.shape[0] < yb_pad_rows:
            xd2 = jnp.pad(xd2, ((0, yb_pad_rows - xd2.shape[0]), (0, 0)))
        in_specs.append(pl.BlockSpec((yb, 128), lambda i, xw, yb_: (yb_[i], 0)))
        operands.append(xd2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(plan.num_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((yb, 128), lambda i, xw, yb_: (yb_[i], 0)),
    )
    y = pl.pallas_call(
        functools.partial(_kernel, precision=precision, reduce=reduce,
                          combine=combine, src_win=plan.src_win,
                          dst_win=plan.dst_win, gather=gather,
                          tile_subs=ts, eq_atol=eq_atol, eq_rtol=eq_rtol),
        out_shape=jax.ShapeDtypeStruct((yb_pad_rows, 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(plan.xwin_blk, plan.yblk, *operands)
    return y.reshape(-1)[: n_rows * 128]


def spmv_available() -> bool:
    """True when running on a real TPU backend (the kernel needs Mosaic).
    CUGRAPH_TPU_PALLAS_INTERPRET=1 forces availability with the interpreter
    (CPU test path for the Pallas algorithm routes)."""
    import os

    if os.environ.get("CUGRAPH_TPU_PALLAS_INTERPRET"):
        return True
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _interpret_forced() -> bool:
    import os

    return bool(os.environ.get("CUGRAPH_TPU_PALLAS_INTERPRET"))
