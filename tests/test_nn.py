"""GNN layer/model tests: aggregation vs a NumPy oracle; training converges.

Modeled on the reference test strategy (SURVEY.md §4): every primitive gets a
serial-oracle comparison; end-to-end paths get behavioral asserts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cugraph_tpu.core.structure import build_structure_host
from cugraph_tpu.nn import (
    aggregate_neighbors,
    graphsage_init,
    graphsage_apply,
    gcn_model_init,
    gcn_apply,
    gat_model_init,
    gat_apply,
    make_train_step,
    masked_cross_entropy,
    accuracy,
)


def _random_graph(n=23, m=80, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m).astype(np.int32)
    dst = rng.integers(0, n, m).astype(np.int32)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    g = build_structure_host(src, dst, None, n)
    return g, src, dst


@pytest.mark.parametrize("mode", ["sum", "mean", "max"])
def test_aggregate_matches_numpy(mode):
    g, src, dst = _random_graph()
    n, F = g.num_vertices, 5
    rng = np.random.default_rng(1)
    x = rng.normal(size=(g.pad_v, F)).astype(np.float32)

    out = aggregate_neighbors(g, jnp.asarray(x), mode=mode)
    out = np.asarray(out)[:n]

    expect = np.zeros((n, F), np.float32)
    for v in range(n):
        nbrs = src[dst == v]
        if len(nbrs) == 0:
            continue
        if mode == "sum":
            expect[v] = x[nbrs].sum(axis=0)
        elif mode == "mean":
            expect[v] = x[nbrs].mean(axis=0)
        else:
            expect[v] = x[nbrs].max(axis=0)
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "init,apply",
    [
        (graphsage_init, graphsage_apply),
        (gcn_model_init, gcn_apply),
        (gat_model_init, gat_apply),
    ],
)
def test_model_forward_shape_and_jit(init, apply):
    g, _, _ = _random_graph()
    F, H, C = 7, 16, 3
    params = init(jax.random.key(0), F, H, C)
    x = jnp.ones((g.pad_v, F), jnp.float32)
    logits = jax.jit(apply)(params, g, x)
    assert logits.shape == (g.pad_v, C)
    assert bool(jnp.all(jnp.isfinite(logits[: g.num_vertices])))


def test_graphsage_training_learns_communities():
    # two dense clusters; the model should separate them from structure alone
    rng = np.random.default_rng(3)
    n_half = 16
    edges = []
    for c in range(2):
        base = c * n_half
        for _ in range(120):
            u, v = rng.integers(0, n_half, 2)
            if u != v:
                edges.append((base + u, base + v))
    src, dst = np.array(edges, np.int32).T
    n = 2 * n_half
    g = build_structure_host(src, dst, None, n)

    labels = np.zeros(g.pad_v, np.int32)
    labels[n_half:n] = 1
    mask = np.zeros(g.pad_v, bool)
    mask[:n] = True
    x = rng.normal(size=(g.pad_v, 8)).astype(np.float32)

    params = graphsage_init(jax.random.key(0), 8, 16, 2)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    step = jax.jit(make_train_step(graphsage_apply, opt))

    xs = jnp.asarray(x)
    lab, msk = jnp.asarray(labels), jnp.asarray(mask)
    losses = []
    for _ in range(60):
        params, opt_state, loss = step(params, opt_state, g, xs, lab, msk)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5
    acc = float(accuracy(graphsage_apply(params, g, xs), lab, msk))
    assert acc > 0.9


def test_masked_ce_ignores_padding():
    logits = jnp.array([[10.0, 0.0], [0.0, 10.0], [100.0, -100.0]])
    labels = jnp.array([0, 1, 1])
    mask = jnp.array([True, True, False])
    loss = masked_cross_entropy(logits, labels, mask)
    assert float(loss) < 1e-3  # the bad (masked) row contributes nothing


# ---------------------------------------------------------------------------
# round-3 layer family: GATv2 / GIN / APPNP
# ---------------------------------------------------------------------------

def test_new_model_forward_shape_and_jit():
    from cugraph_tpu.nn import (
        gatv2_model_init, gatv2_apply, gin_model_init, gin_apply,
        appnp_init, appnp_apply,
    )
    g, _, _ = _random_graph()
    F, H, C = 7, 16, 3
    for init, apply in [
        (gatv2_model_init, gatv2_apply),
        (gin_model_init, gin_apply),
        (appnp_init, appnp_apply),
    ]:
        params = init(jax.random.key(0), F, H, C)
        x = jnp.ones((g.pad_v, F), jnp.float32)
        logits = jax.jit(apply)(params, g, x)
        assert logits.shape == (g.pad_v, C)
        assert bool(jnp.all(jnp.isfinite(logits[: g.num_vertices])))


def test_gin_matches_numpy_oracle():
    from cugraph_tpu.nn import gin_init, gin_conv

    g, src, dst = _random_graph(seed=5)
    n, F = g.num_vertices, 6
    rng = np.random.default_rng(2)
    x = rng.normal(size=(g.pad_v, F)).astype(np.float32)
    params = gin_init(jax.random.key(1), F, 8, 4)
    out = np.asarray(gin_conv(params, g, jnp.asarray(x)))[:n]

    w1, b1 = np.asarray(params["w1"]), np.asarray(params["b1"])
    w2, b2 = np.asarray(params["w2"]), np.asarray(params["b2"])
    agg = np.zeros((n, F), np.float32)
    for s, d in zip(src, dst):
        agg[d] += x[s]
    h = x[:n] + agg  # eps initialized to 0
    h = np.maximum(h @ w1 + b1, 0.0)
    expect = h @ w2 + b2
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)


def test_gatv2_attention_is_softmax_normalized():
    """With the 'a' vector zeroed, GATv2 attention is uniform → the layer
    reduces to a mean aggregation of W_src-transformed features."""
    from cugraph_tpu.nn import gatv2_init, gatv2_conv

    g, src, dst = _random_graph(seed=7)
    n, F, D = g.num_vertices, 5, 4
    rng = np.random.default_rng(3)
    x = rng.normal(size=(g.pad_v, F)).astype(np.float32)
    params = gatv2_init(jax.random.key(2), F, D, num_heads=1)
    params = dict(params, a=jnp.zeros_like(params["a"]))
    out = np.asarray(gatv2_conv(params, g, jnp.asarray(x)))[:n]

    hs = x @ np.asarray(params["w_src"])
    expect = np.zeros((n, D), np.float32)
    for v in range(n):
        nbrs = src[dst == v]
        if len(nbrs):
            expect[v] = hs[nbrs].mean(axis=0)
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)


def test_appnp_propagate_fixpoint_oracle():
    """k iterations of Z ← αZ₀ + (1-α)ÂZ against a dense NumPy recurrence."""
    from cugraph_tpu.nn import appnp_propagate

    g, src, dst = _random_graph(seed=11)
    n, F = g.num_vertices, 3
    rng = np.random.default_rng(4)
    z0 = rng.normal(size=(g.pad_v, F)).astype(np.float32)
    out = np.asarray(appnp_propagate(g, jnp.asarray(z0), alpha=0.2, k=6))[:n]

    A = np.zeros((n, n), np.float32)
    for s, d in zip(src, dst):
        A[d, s] += 1.0
    deg = A.sum(axis=1) + 1.0
    dinv = 1.0 / np.sqrt(deg)
    A_hat = (A + np.eye(n)) * dinv[:, None] * dinv[None, :]
    z = z0[:n].copy()
    for _ in range(6):
        z = 0.2 * z0[:n] + 0.8 * (A_hat @ z)
    np.testing.assert_allclose(out, z, rtol=1e-4, atol=1e-4)


def test_mg_aggregate_mean_matches_sg_on_weighted_graph():
    """MG mean aggregation must use the SG layer's 1e-12 clamp: vertices
    whose in-edge WEIGHTS sum below 1 diverged by the weight-sum factor
    under the old max(deg, 1.0) (round-5 review finding)."""
    import jax
    import numpy as np

    from cugraph_tpu.core.structure import build_structure_host
    from cugraph_tpu.nn.layers import aggregate_neighbors
    from cugraph_tpu.parallel import build_dist_graph, make_mesh_2d
    from cugraph_tpu.parallel.nn import mg_aggregate_mean, shard_vertex_data

    mesh = make_mesh_2d(4, 2, jax.devices()[:8])
    rng = np.random.default_rng(3)
    src = rng.integers(0, 30, 150)
    dst = rng.integers(0, 30, 150)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.uniform(0.01, 0.4, len(src)).astype(np.float32)  # sums < 1 exist
    F = 8
    x = rng.normal(size=(30, F)).astype(np.float32)

    g = build_dist_graph(src, dst, w, 32, 4, 2)
    xp = np.zeros((g.pad_v, F), np.float32)
    xp[:30] = x
    agg_mg = np.asarray(mg_aggregate_mean(
        g, mesh, shard_vertex_data(mesh, xp)))[:30]

    gs = build_structure_host(src, dst, w, 30)
    import jax.numpy as jnp

    xs = np.zeros((gs.pad_v, F), np.float32)
    xs[:30] = x
    agg_sg = np.asarray(aggregate_neighbors(gs, jnp.asarray(xs),
                                            mode="mean"))[:30]
    np.testing.assert_allclose(agg_mg, agg_sg, rtol=2e-4, atol=2e-5)
