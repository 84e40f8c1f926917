"""Link-prediction heads: decoder shapes/oracles, metric exactness,
end-to-end training lifts AUC above chance."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import cugraph_tpu as ct
from cugraph_tpu.core.structure import build_structure_host
from cugraph_tpu.nn import (
    dot_decoder,
    mlp_decoder_init,
    mlp_decoder,
    distmult_decoder_init,
    distmult_decoder,
    link_prediction_loss,
    roc_auc,
    hits_at_k,
    make_linkpred_train_step,
    sample_negatives,
    graphsage_init,
    graphsage_apply,
)


def test_dot_decoder_oracle():
    rng = np.random.default_rng(0)
    z = rng.normal(size=(10, 4)).astype(np.float32)
    src = np.array([0, 3, 7], np.int32)
    dst = np.array([1, 2, 9], np.int32)
    out = np.asarray(dot_decoder(jnp.asarray(z), jnp.asarray(src),
                                 jnp.asarray(dst)))
    expect = (z[src] * z[dst]).sum(axis=1)
    np.testing.assert_allclose(out, expect, rtol=1e-6)


def test_mlp_and_distmult_decoders_shape_grad():
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.normal(size=(12, 6)).astype(np.float32))
    src = jnp.asarray(np.array([0, 5], np.int32))
    dst = jnp.asarray(np.array([2, 11], np.int32))
    pm = mlp_decoder_init(jax.random.key(0), 6)
    out = mlp_decoder(pm, z, src, dst)
    assert out.shape == (2,)
    g = jax.grad(lambda p: jnp.sum(mlp_decoder(p, z, src, dst)))(pm)
    assert all(bool(jnp.all(jnp.isfinite(v))) for v in jax.tree.leaves(g))

    pd = distmult_decoder_init(jax.random.key(1), 6, num_relations=3)
    out = distmult_decoder(pd, z, src, dst,
                           rel=jnp.asarray(np.array([0, 2], np.int32)))
    assert out.shape == (2,)


def test_roc_auc_matches_rank_oracle():
    rng = np.random.default_rng(2)
    pos = rng.normal(loc=0.5, size=40).astype(np.float32)
    neg = rng.normal(loc=-0.5, size=60).astype(np.float32)
    # brute-force AUC: P(pos > neg) + 0.5 P(tie)
    gt = np.mean((pos[:, None] > neg[None, :]) +
                 0.5 * (pos[:, None] == neg[None, :]))
    auc = float(roc_auc(jnp.asarray(pos), jnp.asarray(neg)))
    assert abs(auc - gt) < 1e-5


def test_roc_auc_handles_ties():
    pos = jnp.asarray(np.array([1.0, 0.0, 0.0], np.float32))
    neg = jnp.asarray(np.array([0.0, -1.0], np.float32))
    # oracle: pairs (1,0)+ (1,-1)+ (0,0)=0.5 x2 (0,-1)+ x2 → (2+2+1)/6
    assert abs(float(roc_auc(pos, neg)) - 5.0 / 6.0) < 1e-6


def test_hits_at_k():
    pos = jnp.asarray(np.array([3.0, 1.0, -2.0], np.float32))
    neg = jnp.asarray(np.arange(10, dtype=np.float32) / 10.0)  # max 0.9
    # k=1 threshold 0.9: pos above → 2/3
    assert abs(float(hits_at_k(pos, neg, 1)) - 2.0 / 3.0) < 1e-6
    # k=10 threshold 0.0: strictly above → 2/3
    assert abs(float(hits_at_k(pos, neg, 10)) - 2.0 / 3.0) < 1e-6


def _two_cluster_graph(seed=3, n_half=16, m=140):
    rng = np.random.default_rng(seed)
    edges = set()
    for c in range(2):
        base = c * n_half
        while len(edges) < (c + 1) * m:
            u, v = rng.integers(0, n_half, 2)
            if u != v:
                edges.add((base + u, base + v))
    src, dst = np.array(sorted(edges), np.int64).T
    return src, dst, 2 * n_half


def test_linkpred_training_lifts_auc():
    """GraphSAGE encoder + dot decoder on a 2-cluster graph: held-out
    intra-cluster pairs should outscore cross-cluster pairs after training."""
    src, dst, n = _two_cluster_graph()
    G = ct.Graph(directed=False)
    import pandas as pd
    G.from_pandas_edgelist(pd.DataFrame({"src": src, "dst": dst}),
                           source="src", destination="dst")
    g = G.structure

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(g.pad_v, 8)).astype(np.float32))
    params = {"encoder": graphsage_init(jax.random.key(0), 8, 16, 8),
              "decoder": {}}
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    step = jax.jit(make_linkpred_train_step(graphsage_apply, dot_decoder, opt))

    isrc = jnp.asarray(np.asarray(
        G.lookup_internal_vertex_id(src), np.int32))
    idst = jnp.asarray(np.asarray(
        G.lookup_internal_vertex_id(dst), np.int32))
    nsrc, ndst = sample_negatives(G, 256, random_state=7)
    first_loss = last_loss = None
    for i in range(120):
        params, opt_state, loss = step(params, opt_state, g, x,
                                       isrc, idst, nsrc, ndst)
        if first_loss is None:
            first_loss = float(loss)
        last_loss = float(loss)
    assert last_loss < first_loss * 0.8

    # evaluate on cross-cluster negatives vs training positives
    z = graphsage_apply(params["encoder"], g, x)
    half = n // 2
    cs = jnp.asarray(rng.integers(0, half, 64).astype(np.int32))
    cd = jnp.asarray((half + rng.integers(0, half, 64)).astype(np.int32))
    pos = dot_decoder(z, isrc, idst)
    neg = dot_decoder(z, cs, cd)
    # clusters are dense (most intra pairs ARE edges), so training negatives
    # include irreducible intra-cluster conflicts; well above chance is the
    # honest bar for a 32-vertex dot-decoder setup
    assert float(roc_auc(pos, neg)) > 0.65
