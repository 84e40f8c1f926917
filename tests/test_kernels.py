"""One-hot SpMV kernel: interpret-mode correctness vs a NumPy oracle.

On-TPU speed is covered by bench.py; here the Pallas kernel runs in
interpreter mode on CPU so the tiling/plan logic is exercised everywhere.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cugraph_tpu.kernels.spmv_onehot import build_spmv_plan, spmv_onehot


@pytest.mark.parametrize("n,m,yb_rows", [
    (300, 2000, 8192),       # single y block
    (40_000, 120_000, 128),  # multiple y blocks + multiple x windows
    (7, 5, 8192),            # tiny
    (1, 0, 8192),            # empty
])
def test_spmv_onehot_matches_numpy(n, m, yb_rows):
    rng = np.random.default_rng(n + m)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = rng.random(m).astype(np.float32)
    plan = build_spmv_plan(src, dst, w, n, yb_rows=yb_rows)
    x = rng.random(plan.pad_v).astype(np.float32)

    y = np.asarray(spmv_onehot(plan, jnp.asarray(x), interpret=True))
    expect = np.zeros(plan.pad_v, np.float64)
    np.add.at(expect, dst, w.astype(np.float64) * x[src])
    np.testing.assert_allclose(y, expect, rtol=1e-4, atol=1e-4)


def test_spmv_plan_padding_overhead_is_bounded():
    rng = np.random.default_rng(0)
    n, m = 1 << 14, 1 << 18
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    plan = build_spmv_plan(src, dst, None, n)
    # tiles ≥ ideal, but padding should stay modest on a uniform graph
    ideal = m // 1024
    assert plan.num_tiles <= ideal * 1.5 + 16


def test_spmv_self_loops_and_multi_edges():
    src = np.array([0, 0, 0, 2, 2, 1])
    dst = np.array([1, 1, 0, 2, 2, 1])
    w = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0], np.float32)
    plan = build_spmv_plan(src, dst, w, 3)
    x = np.zeros(plan.pad_v, np.float32)
    x[:3] = [10.0, 20.0, 30.0]
    y = np.asarray(spmv_onehot(plan, jnp.asarray(x), interpret=True))
    assert y[0] == pytest.approx(3 * 10)           # 0→0 w3
    assert y[1] == pytest.approx(1 * 10 + 2 * 10 + 6 * 20)
    assert y[2] == pytest.approx((4 + 5) * 30)


def test_spmv_empty_y_block_is_zeroed():
    # vertices span 2 y blocks (yb_rows=128 → 16384 vertices/block) but ALL
    # edges land in block 0: block 1 must come back zero, not garbage
    n = 40_000
    rng = np.random.default_rng(0)
    src = rng.integers(0, n, 5000)
    dst = rng.integers(0, 10_000, 5000)  # only low ids are destinations
    plan = build_spmv_plan(src, dst, None, n, yb_rows=128)
    assert plan.n_yblocks >= 2
    # the plan must give EVERY y block at least one tile — on real hardware
    # an unvisited output block would return uninitialized memory (the
    # interpreter zero-fills, so this structural check is the load-bearing one)
    assert set(np.asarray(plan.yblk).tolist()) == set(range(plan.n_yblocks))
    x = rng.random(plan.pad_v).astype(np.float32)
    y = np.asarray(spmv_onehot(plan, jnp.asarray(x), interpret=True))
    expect = np.zeros(plan.pad_v, np.float64)
    np.add.at(expect, dst, x[src].astype(np.float64))
    np.testing.assert_allclose(y, expect, rtol=1e-4, atol=1e-4)
    assert np.all(y[16384:] == 0)  # blocks past the edge range stay zero


@pytest.mark.parametrize("reduce,combine", [
    ("min", "add"),    # SSSP relaxation
    ("min", "left"),   # WCC label propagation
    ("max", "left"),   # BFS parent select
    ("max", "mul"),
    ("sum", "add"),
    ("sum", "left"),
])
@pytest.mark.parametrize("n,m", [(300, 2000), (40_000, 120_000), (9, 4)])
def test_spmv_semirings_match_numpy(reduce, combine, n, m):
    from cugraph_tpu.kernels.spmv_onehot import SEMIRING_BIG

    rng = np.random.default_rng(n + m + len(reduce))
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = rng.random(m).astype(np.float32)
    plan = build_spmv_plan(src, dst, w, n,
                           yb_rows=128 if n > 20_000 else 8192)
    x = (rng.random(plan.pad_v) * 10).astype(np.float32)

    y = np.asarray(spmv_onehot(plan, jnp.asarray(x), interpret=True,
                               reduce=reduce, combine=combine))
    v = {"mul": x[src] * w, "add": x[src] + w, "left": x[src]}[combine]
    ident = {"sum": 0.0, "min": SEMIRING_BIG, "max": -SEMIRING_BIG}[reduce]
    expect = np.full(plan.pad_v, ident, np.float64)
    op = {"sum": np.add, "min": np.minimum, "max": np.maximum}[reduce]
    op.at(expect, dst, v.astype(np.float64))
    np.testing.assert_allclose(y, expect, rtol=1e-4, atol=1e-4)


def test_spmv_min_add_with_big_distances():
    """Unreached sources carry SEMIRING_BIG; they must never win the min."""
    from cugraph_tpu.kernels.spmv_onehot import SEMIRING_BIG

    src = np.array([0, 1, 2, 2])
    dst = np.array([3, 3, 3, 4])
    w = np.array([1.0, 2.0, 5.0, 1.5], np.float32)
    plan = build_spmv_plan(src, dst, w, 5)
    x = np.full(plan.pad_v, SEMIRING_BIG, np.float32)
    x[0] = 4.0  # only vertex 0 reached
    y = np.asarray(spmv_onehot(plan, jnp.asarray(x), interpret=True,
                               reduce="min", combine="add"))
    assert y[3] == pytest.approx(5.0)          # 4.0 + 1.0 via src 0
    assert y[4] >= SEMIRING_BIG / 2            # only unreached src 2
    assert y[0] >= SEMIRING_BIG / 2            # untouched dst
