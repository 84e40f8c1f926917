"""RMAT-18-scale invariants of the one-hot SpMV plan builder.

The small interpret-mode tests (test_kernels.py) exercise tiling logic on toy
graphs; this validates the plan's *arrays* at real scale — multi-y-block,
yb_rows boundaries, 4M+ edges — by reconstructing the edge multiset from the
plan and checking the kernel's row-window invariant, without running Pallas
(interpret mode at this scale is infeasible).  Analog of the reference's
large-graph construction tests (cpp/tests/structure/).
"""

import numpy as np
import pytest

from cugraph_tpu.generators.rmat import rmat
from cugraph_tpu.kernels.spmv_onehot import (
    build_spmv_plan, SRC_WIN, DST_WIN)


def _check_plan_invariants(plan, src, dst, w, n):
    ybv = plan.yb_rows * 128
    W = np.asarray(plan.weight)          # [T*8, 128]
    SR = np.asarray(plan.src_rel)
    DF = np.asarray(plan.dst_full)
    XB = np.asarray(plan.xwin_blk)       # [T]
    YB = np.asarray(plan.yblk)

    valid = ~np.isnan(W)

    # 1. bounds
    assert SR.min() >= 0 and SR.max() < plan.src_win
    assert DF.min() >= 0 and DF.max() < ybv

    # 2. row-window invariant: every lane of a row (incl. padding) shares one
    #    64-row dst window — the kernel scatters the whole row into
    #    y[d13*64 : d13*64+64] based on lane 0's window
    d13 = DF // plan.dst_win
    assert (d13 == d13[:, :1]).all(), "dst window must be constant per row"

    # 3. y blocks all covered, sorted
    assert np.array_equal(np.unique(YB), np.arange(plan.n_yblocks))
    assert (np.diff(YB) >= 0).all()

    # 4. edge multiset reconstruction == input multiset
    tile = np.repeat(np.arange(plan.num_tiles), plan.tile_subs)
    g_src = SR + (XB[tile] * plan.src_win)[:, None]
    g_dst = DF + (YB[tile].astype(np.int64) * ybv)[:, None]
    rs, rd, rw = g_src[valid], g_dst[valid], W[valid]
    assert rs.shape[0] == len(src)

    def key(a, b, c):
        k = a.astype(np.int64) * n + b.astype(np.int64)
        order = np.lexsort((c, k))
        return k[order], c[order]

    k1, w1 = key(rs, rd, rw)
    k2, w2 = key(src, dst, w)
    np.testing.assert_array_equal(k1, k2)
    np.testing.assert_array_equal(w1, w2)


def _rmat_arrays(scale, seed):
    n = 1 << scale
    df = rmat(scale, n * 16, seed=seed, include_edge_weights=True)
    wcol = "weights" if "weights" in df else "weight"
    return (df["src"].to_numpy().astype(np.int64),
            df["dst"].to_numpy().astype(np.int64),
            df[wcol].to_numpy().astype(np.float32), n)


@pytest.mark.slow
def test_plan_rmat18_multi_yblock_invariants():
    src, dst, w, n = _rmat_arrays(18, seed=7)
    # yb_rows=512 → ybv=65536 vertices/block → 4 y blocks at scale 18
    plan = build_spmv_plan(src, dst, w, n, yb_rows=512)
    assert plan.n_yblocks >= 4
    assert plan.yb_rows % 64 == 0
    _check_plan_invariants(plan, src, dst, w, n)


def test_plan_rmat14_multi_yblock_invariants():
    """Default-run midscale coverage: CI sees a multi-y-block plan every run
    (the RMAT-18 variants above only run under CUGRAPH_TPU_RUN_SLOW)."""
    src, dst, w, n = _rmat_arrays(14, seed=11)
    plan = build_spmv_plan(src, dst, w, n, yb_rows=64)  # ybv=8192 → 2 blocks
    assert plan.n_yblocks >= 2
    _check_plan_invariants(plan, src, dst, w, n)
    # autotuned non-default windows at midscale too
    plan2 = build_spmv_plan(src, dst, w, n, yb_rows=64,
                            src_win=4096, dst_win=2048)
    assert plan2.n_yblocks >= 2
    _check_plan_invariants(plan2, src, dst, w, n)


@pytest.mark.slow
def test_plan_yb_boundary_dsts():
    # edges landing exactly on y-block and dst-window boundaries
    n = 1 << 17
    yb_rows = 64                      # smallest legal block: ybv = 8192
    ybv = yb_rows * 128
    boundary = np.arange(0, n, ybv // 2, dtype=np.int64)  # block edges + mid
    dst = np.concatenate([boundary, boundary - 1, boundary + 1])
    dst = dst[(dst >= 0) & (dst < n)]
    src = (dst * 7919) % n
    plan = build_spmv_plan(src, dst, None, n, yb_rows=yb_rows)
    import jax.numpy as jnp
    from cugraph_tpu.kernels.spmv_onehot import spmv_onehot

    x = np.random.default_rng(0).random(plan.pad_v).astype(np.float32)
    y = np.asarray(spmv_onehot(plan, jnp.asarray(x), interpret=True))
    expect = np.zeros(plan.pad_v, np.float64)
    np.add.at(expect, dst, x[src].astype(np.float64))
    np.testing.assert_allclose(y, expect, rtol=1e-4, atol=1e-4)
