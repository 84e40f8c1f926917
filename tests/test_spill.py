"""Host-spill (chunked) SpMV execution vs the resident kernel.

The spill path (kernels/spill.py) must be bit-compatible with spmv_onehot;
pagerank through a spilled plan must match the resident Pallas path and the
XLA oracle (large_buffer_manager spill analog, SURVEY.md N30).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cugraph_tpu.kernels.spmv_onehot import build_spmv_plan, spmv_onehot
from cugraph_tpu.kernels.spill import build_spilled_spmv_plan, spmv_spilled


def _graph(n, m, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = rng.random(m).astype(np.float32)
    return src, dst, w


@pytest.mark.parametrize("reduce,combine", [("sum", "mul"), ("min", "add"),
                                            ("max", "left")])
def test_spilled_matches_resident(reduce, combine):
    n, m = 60_000, 150_000
    src, dst, w = _graph(n, m, seed=3)
    full = build_spmv_plan(src, dst, w, n, yb_rows=64)
    # tiny budget → many chunks
    sp = build_spilled_spmv_plan(src, dst, w, n, yb_rows=64,
                                 max_chunk_bytes=1 << 19)
    assert sp.num_chunks > 2
    assert sp.pad_v == full.pad_v

    rng = np.random.default_rng(0)
    x = (rng.random(full.pad_v).astype(np.float32) + 0.5)
    a = np.asarray(spmv_onehot(full, jnp.asarray(x), interpret=True,
                               reduce=reduce, combine=combine))
    b = np.asarray(spmv_spilled(sp, x, interpret=True,
                                reduce=reduce, combine=combine))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_spilled_uniform_chunk_shapes():
    n, m = 60_000, 120_000
    src, dst, w = _graph(n, m, seed=4)
    sp = build_spilled_spmv_plan(src, dst, w, n, yb_rows=64,
                                 max_chunk_bytes=1 << 19)
    shapes = {(c.num_tiles, c.n_yblocks, c.n_rows) for c in sp.chunks}
    assert len(shapes) == 1, "chunks must share one compiled shape"
    # every chunk's arrays are host numpy, not device
    assert all(isinstance(np.asarray(c.src_rel), np.ndarray)
               for c in sp.chunks)


def test_pagerank_spilled_matches_resident(monkeypatch):
    import cugraph_tpu

    monkeypatch.setenv("CUGRAPH_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("CUGRAPH_TPU_PALLAS_MIN_EDGES", "1")

    n, m = 3000, 12_000
    src, dst, w = _graph(n, m, seed=5)
    G = cugraph_tpu.Graph(directed=True)
    G.from_edgelist(src, dst, w)
    base = cugraph_tpu.pagerank(G, tol=1e-6)

    monkeypatch.setenv("CUGRAPH_TPU_SPILL_BYTES", "4096")  # force spill
    G2 = cugraph_tpu.Graph(directed=True)
    G2.from_edgelist(src, dst, w)
    sp = cugraph_tpu.pagerank(G2, tol=1e-6)
    assert G2._spmv_plan_pull_spilled is not None, "spill path not taken"

    a = base.sort_values("vertex")["pagerank"].to_numpy()
    b = sp.sort_values("vertex")["pagerank"].to_numpy()
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-7)


def test_estimate_plan_bytes_matches_auto_tile_subs_build():
    """The spill dispatcher's estimate must track build_spmv_plan's ACTUAL
    allocation — including the auto tile_subs pick (regression: packing at a
    fixed 8 subtiles/tile underestimated ts=64 plans up to 8x)."""
    from cugraph_tpu.kernels.spmv_onehot import (auto_tile_subs,
                                                 build_spmv_plan,
                                                 estimate_plan_bytes)

    rng = np.random.default_rng(5)
    n, m = 300_000, 600_000   # fragmented: m/128 ≈ 4.7k subtiles → ts 8..64
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    est = estimate_plan_bytes(src, dst, n)
    plan = build_spmv_plan(src, dst, None, n, device_arrays=False)
    actual = (plan.src_rel.size * 4 + plan.dst_full.size * 4
              + plan.weight.size * 4)
    assert plan.tile_subs == auto_tile_subs(max(m // 128, 1))
    assert est == actual
