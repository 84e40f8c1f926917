"""MG Pallas kernel integration: per-device one-hot plans under shard_map,
run in interpreter mode on the virtual 8-device CPU mesh and compared to the
XLA MG path / SG results."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import cugraph_tpu as ct
from cugraph_tpu.parallel import build_dist_graph, make_mesh_2d, mg_pagerank


def _random_coo(n=150, m=900, seed=0, weighted=True):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    uniq = np.unique(src * n + dst)
    src, dst = (uniq // n).astype(np.int64), (uniq % n).astype(np.int64)
    w = rng.uniform(0.5, 2.0, len(src)).astype(np.float32) if weighted else None
    return src, dst, w


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8
    return make_mesh_2d(4, 2, jax.devices()[:8])


@pytest.fixture()
def force_pallas(monkeypatch):
    monkeypatch.setenv("CUGRAPH_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("CUGRAPH_TPU_PALLAS_MIN_EDGES", "1")


def test_stacked_spmv_plan_matches_xla_pull(mesh, force_pallas):
    from cugraph_tpu.parallel.kernels import mg_use_pallas

    src, dst, w = _random_coo(seed=11)
    n = 150
    g = build_dist_graph(src, dst, w, n, 4, 2, store_push=False)
    assert mg_use_pallas(g)
    p, err, iters = mg_pagerank(g, mesh, tol=1e-8, max_iter=200)
    p = np.asarray(p)[:n]

    G = ct.Graph(directed=True)
    G.from_edgelist(src, dst, w, vertices=np.arange(n), renumber=False)
    import os
    os.environ.pop("CUGRAPH_TPU_PALLAS_INTERPRET", None)  # SG on XLA path
    sg = ct.pagerank(G, tol=1e-8, max_iter=200).sort_values("vertex")
    np.testing.assert_allclose(p, sg["pagerank"].to_numpy(),
                               rtol=2e-4, atol=1e-6)


def test_mg_spmm_pallas_matches_xla(mesh, force_pallas):
    from cugraph_tpu.parallel.kernels import get_mg_spmm_fn
    from cugraph_tpu.parallel.mesh import shard_dist_graph
    from cugraph_tpu.parallel.nn import _mg_spmm, shard_vertex_data

    src, dst, w = _random_coo(n=120, m=700, seed=12)
    n = 120
    g = shard_dist_graph(
        build_dist_graph(src, dst, w, n, 4, 2, store_push=False), mesh)
    rng = np.random.default_rng(0)
    F = 8
    x = rng.normal(size=(g.pad_v, F)).astype(np.float32)
    xd = shard_vertex_data(mesh, jnp.asarray(x))

    y_pl = np.asarray(get_mg_spmm_fn(g, mesh)(xd))
    y_xla = np.asarray(_mg_spmm(mesh, g.pmaj, g.chunk)(
        g.pull.src_loc, g.pull.dst_loc, g.pull.weight, xd))
    np.testing.assert_allclose(y_pl[:n], y_xla[:n], rtol=3e-2, atol=3e-2)  # bf16 matmuls

    # oracle check too
    expect = np.zeros((g.pad_v, F), np.float64)
    np.add.at(expect, dst, w[:, None].astype(np.float64) * x[src])
    np.testing.assert_allclose(y_pl[:n], expect[:n], rtol=3e-2, atol=3e-2)


def test_mg_spmm_pallas_grad_flows(mesh, force_pallas):
    """jax.grad through the MG Pallas SpMM (custom VJP = transpose plan)."""
    from cugraph_tpu.parallel.kernels import get_mg_spmm_fn
    from cugraph_tpu.parallel.nn import shard_vertex_data

    src, dst, w = _random_coo(n=80, m=400, seed=13)
    n = 80
    from cugraph_tpu.parallel.mesh import shard_dist_graph
    g = shard_dist_graph(
        build_dist_graph(src, dst, w, n, 4, 2, store_push=False), mesh)
    rng = np.random.default_rng(1)
    F = 4
    x = rng.normal(size=(g.pad_v, F)).astype(np.float32)
    xd = shard_vertex_data(mesh, jnp.asarray(x))
    f = get_mg_spmm_fn(g, mesh)

    def loss(xx):
        return jnp.sum(f(xx) ** 2)

    gx = np.asarray(jax.grad(loss)(xd))

    # oracle: d/dx sum((A x)^2) = 2 Aᵀ (A x)
    A = np.zeros((g.pad_v, g.pad_v), np.float64)
    for s, d, ww in zip(src, dst, w):
        A[d, s] += ww
    expect = 2.0 * A.T @ (A @ x.astype(np.float64))
    np.testing.assert_allclose(gx[:n], expect[:n], rtol=1e-1, atol=2e-1)  # bf16 fwd+bwd compounding


def test_mg_gnn_train_uses_pallas_path(mesh, force_pallas):
    """End-to-end MG GraphSAGE train step with the Pallas aggregation."""
    import optax

    from cugraph_tpu.nn import graphsage_init
    from cugraph_tpu.parallel.mesh import shard_dist_graph
    from cugraph_tpu.parallel.nn import (
        make_mg_train_step,
        replicate,
        shard_vertex_data,
    )

    src, dst, _ = _random_coo(n=100, m=500, seed=14, weighted=False)
    n = 100
    g = shard_dist_graph(
        build_dist_graph(src, dst, None, n, 4, 2, store_push=False), mesh)
    rng = np.random.default_rng(0)
    F, H, C = 8, 16, 3
    x = rng.normal(size=(g.pad_v, F)).astype(np.float32)
    labels = rng.integers(0, C, g.pad_v).astype(np.int32)
    mask = np.zeros(g.pad_v, bool)
    mask[:n] = True
    x, labels, mask = shard_vertex_data(mesh, x, jnp.asarray(labels),
                                        jnp.asarray(mask))
    params = replicate(mesh, graphsage_init(jax.random.key(0), F, H, C))
    opt = optax.adam(1e-2)
    opt_state = replicate(mesh, opt.init(params))
    step = make_mg_train_step(g, mesh, opt)
    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state, x, labels, mask)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_mg_louvain_distributed_coarsening(mesh):
    """Force the distributed contraction cascade (sg_threshold_edges=0) and
    check it matches the host-cascade result quality-wise."""
    from cugraph_tpu.parallel.louvain import mg_coarsen, mg_louvain

    # two dense blobs + sparse bridge: clear community structure
    rng = np.random.default_rng(5)
    n = 60
    a = rng.integers(0, 30, 400)
    b = rng.integers(0, 30, 400)
    src = np.concatenate([a, a + 30, [0]])
    dst = np.concatenate([b, b + 30, [30]])
    keep = src != dst
    src, dst = src[keep], dst[keep]
    uniq = np.unique(src * n + dst)
    src, dst = uniq // n, uniq % n
    g = build_dist_graph(src, dst, None, n, 4, 2, store_push=True,
                         symmetrize=True)

    labels, q = mg_louvain(g, mesh, sg_threshold_edges=0)
    assert q > 0.3
    # the blobs must separate
    assert len(set(labels[:30]) & set(labels[30:])) <= 1

    # mg_coarsen oracle: contraction preserves total edge weight
    lab_full = np.zeros(g.pad_v, np.int32)
    lab_full[:n] = labels % (labels.max() + 1)
    cs, cd, cw, nc = mg_coarsen(g, mesh, lab_full)
    assert cw.sum() == pytest.approx(2 * len(src), rel=1e-6)  # symmetrized


def test_mg_brandes_pallas_matches_sg(mesh, force_pallas):
    """Batched MG Brandes through per-device unit-weight SpMM plans (128-
    source panels) matches the SG XLA result exactly."""
    import os

    from cugraph_tpu.parallel import mg_betweenness_centrality
    from cugraph_tpu.parallel.kernels import mg_use_pallas

    src, dst, _ = _random_coo(n=90, m=500, seed=13, weighted=False)
    n = 90
    g = build_dist_graph(src, dst, None, n, 4, 2, store_push=True)
    assert mg_use_pallas(g)
    bc = mg_betweenness_centrality(g, mesh, normalized=True)[:n]

    os.environ.pop("CUGRAPH_TPU_PALLAS_INTERPRET", None)
    os.environ.pop("CUGRAPH_TPU_PALLAS_MIN_EDGES", None)
    G = ct.Graph(directed=True)
    G.from_edgelist(src, dst, None, vertices=np.arange(n), renumber=False)
    sg = ct.betweenness_centrality(G, normalized=True).sort_values("vertex")
    np.testing.assert_allclose(bc, sg["betweenness_centrality"].to_numpy(),
                               rtol=1e-4, atol=1e-6)


def test_mg_louvain_sweep_engines_agree(mesh):
    """Host-engine (native per-block aggregation) and device-engine
    (shard_map sort/segment) move phases implement the same move rule:
    same modularity trajectory on a structured graph, and mg_coarsen's two
    engines produce identical coarse COOs."""
    from cugraph_tpu.parallel.louvain import (mg_coarsen,
                                              mg_louvain_move_phase)

    rng = np.random.default_rng(17)
    n = 48
    # three blobs of 16 + noise
    blocks = [rng.integers(0, 16, (2, 220)) + 16 * c for c in range(3)]
    noise = rng.integers(0, n, (2, 30))
    src = np.concatenate([b[0] for b in blocks] + [noise[0]])
    dst = np.concatenate([b[1] for b in blocks] + [noise[1]])
    keep = src != dst
    uniq = np.unique(src[keep] * n + dst[keep])
    src, dst = uniq // n, uniq % n
    g = build_dist_graph(src, dst, None, n, 4, 2, store_push=True,
                         symmetrize=True)

    cl_h, q_h = mg_louvain_move_phase(g, mesh, engine="host")
    cl_d, q_d = mg_louvain_move_phase(g, mesh, engine="device")
    # identical rule, different arithmetic precision: quality must agree
    assert q_h == pytest.approx(q_d, abs=5e-4)
    assert q_h > 0.3

    lab_full = np.zeros(g.pad_v, np.int32)
    _, lab_full[:n] = np.unique(cl_h[:n], return_inverse=True)
    ch = mg_coarsen(g, mesh, lab_full, engine="host")
    cd_ = mg_coarsen(g, mesh, lab_full, engine="device")
    assert ch[3] == cd_[3]
    np.testing.assert_array_equal(ch[0], cd_[0])
    np.testing.assert_array_equal(ch[1], cd_[1])
    np.testing.assert_allclose(ch[2], cd_[2], rtol=1e-5)
