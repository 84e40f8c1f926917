"""One-hot SpMM kernel: interpret-mode correctness vs a NumPy oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cugraph_tpu.kernels.spmm_onehot import (
    build_spmm_plan,
    choose_windows,
    make_spmm_pair,
    spmm_onehot,
)


@pytest.mark.parametrize("n,m,F", [
    (300, 2000, 16),
    (300, 2000, 128),
    (5000, 20000, 8),
    (7, 5, 4),
    (1, 0, 8),
])
def test_spmm_onehot_matches_numpy(n, m, F):
    rng = np.random.default_rng(n + m + F)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = rng.random(m).astype(np.float32)
    plan = build_spmm_plan(src, dst, w, n)
    x = rng.normal(size=(plan.pad_v, F)).astype(np.float32)

    y = np.asarray(spmm_onehot(plan, jnp.asarray(x), interpret=True,
                               precision="highest"))
    expect = np.zeros((plan.pad_v, F), np.float64)
    np.add.at(expect, dst, w[:, None].astype(np.float64) * x[src])
    np.testing.assert_allclose(y, expect, rtol=1e-4, atol=1e-4)


def test_spmm_multi_yblock():
    rng = np.random.default_rng(0)
    n, m, F = 40_000, 60_000, 8
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    plan = build_spmm_plan(src, dst, None, n, ybv=8192)
    assert plan.n_yblocks >= 2
    x = rng.normal(size=(plan.pad_v, F)).astype(np.float32)
    y = np.asarray(spmm_onehot(plan, jnp.asarray(x), interpret=True,
                               precision="highest"))
    expect = np.zeros((plan.pad_v, F), np.float64)
    np.add.at(expect, dst, x[src].astype(np.float64))
    np.testing.assert_allclose(y, expect, rtol=1e-4, atol=1e-4)


def test_choose_windows_returns_valid():
    rng = np.random.default_rng(1)
    src = rng.integers(0, 10_000, 50_000)
    dst = rng.integers(0, 10_000, 50_000)
    ws, wd = choose_windows(src, dst, 10_000)
    assert ws in (512, 1024, 2048, 4096) and wd in (512, 1024, 2048, 4096)


def test_spmm_vjp_is_transpose():
    rng = np.random.default_rng(2)
    n, m, F = 200, 1200, 8
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = rng.random(m).astype(np.float32)
    fwd_plan = build_spmm_plan(src, dst, w, n)
    bwd_plan = build_spmm_plan(dst, src, w, n)

    # interpret-mode closures (CPU)
    import functools
    from cugraph_tpu.kernels import spmm_onehot as mod
    orig = mod.spmm_onehot
    mod_spmm = functools.partial(orig, interpret=True, precision="highest")
    mod.spmm_onehot, real = mod_spmm, orig
    try:
        f = make_spmm_pair(fwd_plan, bwd_plan)
        x = rng.normal(size=(fwd_plan.pad_v, F)).astype(np.float32)
        gy = rng.normal(size=(fwd_plan.pad_v, F)).astype(np.float32)
        y, vjp = jax.vjp(f, jnp.asarray(x))
        (gx,) = vjp(jnp.asarray(gy))
    finally:
        mod.spmm_onehot = real

    expect_y = np.zeros((fwd_plan.pad_v, F), np.float64)
    np.add.at(expect_y, dst, w[:, None].astype(np.float64) * x[src])
    np.testing.assert_allclose(np.asarray(y), expect_y, rtol=1e-4, atol=1e-4)

    expect_gx = np.zeros((fwd_plan.pad_v, F), np.float64)
    np.add.at(expect_gx, src, w[:, None].astype(np.float64) * gy[dst])
    np.testing.assert_allclose(np.asarray(gx)[:n], expect_gx[:n],
                               rtol=1e-4, atol=1e-4)


def test_structure_plan_cache():
    from cugraph_tpu.core.structure import build_structure_host
    from cugraph_tpu.kernels.spmm_onehot import get_structure_spmm_plan

    rng = np.random.default_rng(3)
    src = rng.integers(0, 50, 200)
    dst = rng.integers(0, 50, 200)
    g = build_structure_host(src, dst, None, 50)
    p1 = get_structure_spmm_plan(g)
    p2 = get_structure_spmm_plan(g)
    assert p1 is p2
    g2 = build_structure_host(src, dst, None, 50)
    assert get_structure_spmm_plan(g2) is not p1


def test_spmm_split_precision_near_exact():
    """"split" runs the exact-selection bf16-pair trick: with an unweighted
    plan (0/1 one-hots are bf16-exact) the result must match the f64 oracle
    to ~2^-16 relative — far tighter than plain bf16 (~1e-3)."""
    rng = np.random.default_rng(7)
    n, m, F = 500, 4000, 16
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    plan = build_spmm_plan(src, dst, None, n)
    x = rng.normal(size=(plan.pad_v, F)).astype(np.float32)

    y = np.asarray(spmm_onehot(plan, jnp.asarray(x), interpret=True,
                               precision="split"))
    expect = np.zeros((plan.pad_v, F), np.float64)
    np.add.at(expect, dst, x[src].astype(np.float64))
    np.testing.assert_allclose(y, expect, rtol=3e-5, atol=3e-5)


def test_spmm_split_requires_bf16_exact_weights():
    rng = np.random.default_rng(11)
    n, m = 200, 1500
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = rng.random(m).astype(np.float32)  # generic f32: not bf16-exact
    plan_w = build_spmm_plan(src, dst, w, n)
    assert not plan_w.split_safe
    x = jnp.ones((plan_w.pad_v, 8), jnp.float32)
    with pytest.raises(ValueError, match="split"):
        spmm_onehot(plan_w, x, interpret=True, precision="split")
    # bf16-exact weights (small integers) pass the guard
    wi = rng.integers(1, 5, m).astype(np.float32)
    plan_i = build_spmm_plan(src, dst, wi, n)
    assert plan_i.split_safe
    y = np.asarray(spmm_onehot(plan_i, x, interpret=True, precision="split"))
    expect = np.zeros((plan_i.pad_v, 8))
    np.add.at(expect, dst, wi[:, None] * np.ones((m, 8)))
    np.testing.assert_allclose(y, expect, rtol=3e-5, atol=3e-5)


def test_spmm_min_max_semirings_interpret():
    """(min/max, add/left/mul) SpMM panels vs a NumPy oracle — the sublane
    run-scan + head-selection scatter (TPU-validated; see docs/performance)."""
    from cugraph_tpu.kernels.spmm_onehot import build_spmm_plan, spmm_onehot
    from cugraph_tpu.kernels.spmv_onehot import SEMIRING_BIG

    rng = np.random.default_rng(3)
    n, m, F = 500, 2500, 16
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = rng.random(m).astype(np.float32) * 2 + 0.1
    plan = build_spmm_plan(src, dst, w, n)
    X = rng.random((plan.pad_v, F)).astype(np.float32) * 3 + 0.1
    for reduce, combine in [("min", "add"), ("max", "add"), ("min", "left"),
                            ("max", "left"), ("min", "mul"), ("max", "mul")]:
        y = np.asarray(spmm_onehot(plan, jnp.asarray(X), interpret=True,
                                   precision="highest", reduce=reduce,
                                   combine=combine))
        ident = SEMIRING_BIG if reduce == "min" else -SEMIRING_BIG
        ref = np.full((plan.pad_v, F), ident, np.float32)
        vals = {"add": X[src] + w[:, None], "left": X[src],
                "mul": X[src] * w[:, None]}[combine]
        (np.minimum if reduce == "min" else np.maximum).at(ref, dst, vals)
        np.testing.assert_allclose(y, ref, atol=1e-4,
                                   err_msg=f"{reduce},{combine}")
    # split stays within its ~2^-16 contract even with non-bf16 weights
    # (min/max transports weights at f32, unlike the sum path)
    y_s = np.asarray(spmm_onehot(plan, jnp.asarray(X), interpret=True,
                                 precision="split", reduce="min",
                                 combine="add"))
    ref = np.full((plan.pad_v, F), SEMIRING_BIG, np.float32)
    np.minimum.at(ref, dst, X[src] + w[:, None])
    mask = ref < SEMIRING_BIG / 2
    rel = np.abs(y_s[mask] - ref[mask]) / np.maximum(ref[mask], 1e-6)
    assert rel.max() < 1e-3


def test_spmm_sum_rejects_bad_combine():
    from cugraph_tpu.kernels.spmm_onehot import build_spmm_plan, spmm_onehot

    plan = build_spmm_plan(np.array([0, 1]), np.array([1, 0]), None, 2)
    with pytest.raises(ValueError, match="combine"):
        spmm_onehot(plan, jnp.zeros((plan.pad_v, 8)), interpret=True,
                    reduce="sum", combine="add")


@pytest.mark.parametrize("prec", ["highest", "split", "default"])
def test_spmm_gather_batch_parity(prec):
    """Batched-gather grouping is bit-identical to the per-subtile loop in
    every precision mode, and the auto cap respects the VMEM budget."""
    from cugraph_tpu.kernels.spmm_onehot import _auto_gather_batch

    rng = np.random.default_rng(7)
    n, m, F = 700, 4000, 128
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = None if prec == "split" else rng.random(m).astype(np.float32)
    plan = build_spmm_plan(src, dst, w, n, tile_subs=16)
    x = jnp.asarray(rng.random((plan.pad_v, F)).astype(np.float32))
    y1 = np.asarray(spmm_onehot(plan, x, interpret=True, precision=prec,
                                gather_batch=1))
    for gb in (4, 16, 0):        # 0 = auto
        yb = np.asarray(spmm_onehot(plan, x, interpret=True, precision=prec,
                                    gather_batch=gb))
        assert np.array_equal(y1, yb)
    # the auto choice keeps (one-hot + XE panel) inside the VMEM budget
    # left after the double-buffered y/x blocks
    from cugraph_tpu.kernels.spmm_onehot import _VMEM_BUDGET

    gb = _auto_gather_batch(plan.w_src, F, plan.tile_subs, plan.ybv)
    assert 1 <= gb <= plan.tile_subs
    assert (8 * F * (plan.ybv + plan.w_src)
            + 512 * (plan.w_src + F) * gb) <= _VMEM_BUDGET


def test_spmm_feature_chunking_parity():
    """Wide feature matrices split into VMEM-sized chunks (the
    double-buffered [ybv, F] y block exceeds the 16 MB scoped-VMEM limit
    past F≈180 at the default ybv); chunked == whole bit-exactly,
    including non-multiple-of-128 widths and the min semiring."""
    import cugraph_tpu.kernels.spmm_onehot as so

    rng = np.random.default_rng(0)
    n, m = 700, 4000
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = rng.random(m).astype(np.float32)
    plan = so.build_spmm_plan(src, dst, w, n, tile_subs=16)
    orig = so._VMEM_BUDGET
    try:
        for F in (256, 250):
            x = jnp.asarray(rng.random((plan.pad_v, F)).astype(np.float32))
            so._VMEM_BUDGET = orig
            so.spmm_onehot.clear_cache()
            y_w = np.asarray(so.spmm_onehot(plan, x, interpret=True,
                                            precision="highest"))
            m_w = np.asarray(so.spmm_onehot(plan, x, interpret=True,
                                            precision="highest",
                                            reduce="min", combine="add"))
            # shrink the budget so fc_max drops to 128 -> forced chunking
            so._VMEM_BUDGET = (3 << 20) + 8 * (plan.ybv + plan.w_src) * 128
            so.spmm_onehot.clear_cache()
            assert so._max_feature_chunk(plan.ybv, plan.w_src) == 128
            y_c = np.asarray(so.spmm_onehot(plan, x, interpret=True,
                                            precision="highest"))
            m_c = np.asarray(so.spmm_onehot(plan, x, interpret=True,
                                            precision="highest",
                                            reduce="min", combine="add"))
            assert np.array_equal(y_w, y_c)
            assert np.array_equal(m_w, m_c)
    finally:
        so._VMEM_BUDGET = orig
        so.spmm_onehot.clear_cache()
