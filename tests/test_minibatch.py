"""Mini-batch GNN pipeline: sampling → padded batch → training convergence."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

import cugraph_tpu as ct
from cugraph_tpu.nn import graphsage_init
from cugraph_tpu.nn.minibatch import make_batches, sage_minibatch_forward
from cugraph_tpu.nn.models import masked_cross_entropy


def _community_graph(n_half=30, seed=0):
    rng = np.random.default_rng(seed)
    edges = set()
    for c in range(2):
        base = c * n_half
        for _ in range(240):
            u, v = rng.integers(0, n_half, 2)
            if u != v:
                edges.add((base + u, base + v))
    src, dst = np.array(sorted(edges)).T
    G = ct.Graph()  # undirected
    G.from_edgelist(src, dst, None, renumber=False)
    n = 2 * n_half
    labels = np.zeros(n, np.int32)
    labels[n_half:] = 1
    return G, n, labels


def test_batches_are_static_shaped_and_consistent():
    G, n, labels = _community_graph()
    feats = np.random.default_rng(1).normal(size=(n, 8)).astype(np.float32)
    shapes = set()
    count = 0
    for batch, x in make_batches(G, np.arange(n), [4, 3], batch_size=16,
                                 features=feats):
        shapes.add((batch.g.pad_v, batch.g.csr.pad_e, x.shape))
        gid = np.asarray(batch.global_ids)
        # features placed at the right rows
        for i in np.nonzero(gid >= 0)[0][:5]:
            np.testing.assert_allclose(np.asarray(x)[i], feats[gid[i]])
        # seed rows lead the map
        assert int(np.asarray(batch.seed_mask).sum()) == batch.num_seeds
        count += 1
    assert count == (n + 15) // 16
    assert len(shapes) == 1  # one compiled step serves every batch


def test_minibatch_matches_full_graph_accuracy():
    """BASELINE.md "downstream GNN accuracy match" on a FIXED synthetic
    split: a GraphSAGE trained from sampler+post outputs alone must reach
    the full-graph loop's validation accuracy (within 5 points, both ≥ 85%).
    Reference role: the cugraph-pyg/DGL feed path (SURVEY §3.5)."""
    from cugraph_tpu.nn.models import graphsage_apply, make_train_step

    G, n, labels = _community_graph(n_half=60, seed=7)
    rng = np.random.default_rng(13)
    feats = rng.normal(size=(n, 8)).astype(np.float32)
    feats[:, 0] += labels * 1.0
    feats[:, 1] -= labels * 0.4
    # fixed split: 60% train / 40% val (deterministic permutation)
    perm = np.random.default_rng(99).permutation(n)
    train_ids, val_ids = perm[: int(0.6 * n)], perm[int(0.6 * n):]

    g_full = G.structure
    pad_v = g_full.pad_v
    y_full = np.zeros(pad_v, np.int32)
    y_full[:n] = labels
    x_full = np.zeros((pad_v, 8), np.float32)
    x_full[:n] = feats
    train_mask = np.zeros(pad_v, bool)
    train_mask[train_ids] = True

    def val_acc(params):
        logits = np.asarray(graphsage_apply(params, g_full,
                                            jnp.asarray(x_full)))
        return float((logits[val_ids].argmax(1) == labels[val_ids]).mean())

    # -- full-graph training --------------------------------------------
    params_f = graphsage_init(jax.random.key(0), 8, 16, 2)
    opt = optax.adam(1e-2)
    step = jax.jit(make_train_step(graphsage_apply, opt))
    st = opt.init(params_f)
    for _ in range(60):
        params_f, st, _ = step(params_f, st, g_full, jnp.asarray(x_full),
                               jnp.asarray(y_full), jnp.asarray(train_mask))
    acc_full = val_acc(params_f)

    # -- minibatch training from sampler + post-processing outputs -------
    params_m = graphsage_init(jax.random.key(0), 8, 16, 2)
    st_m = opt.init(params_m)

    @jax.jit
    def mb_step(params, opt_state, batch, x, y, m):
        def loss_fn(p):
            return masked_cross_entropy(
                sage_minibatch_forward(p, batch, x), y, m)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    for epoch in range(20):
        for batch, x in make_batches(G, train_ids, [8, 5], batch_size=24,
                                     features=feats, random_state=epoch):
            gid = np.asarray(batch.global_ids)
            valid = gid >= 0
            y = np.zeros(batch.g.pad_v, np.int32)
            y[valid] = labels[gid[valid]]
            m = np.asarray(batch.seed_mask) & valid
            params_m, st_m, _ = mb_step(params_m, st_m, batch, x,
                                        jnp.asarray(y), jnp.asarray(m))
    acc_mb = val_acc(params_m)

    assert acc_full >= 0.85, acc_full
    assert acc_mb >= 0.85, acc_mb
    assert acc_mb >= acc_full - 0.05, (acc_mb, acc_full)


def test_minibatch_training_learns():
    G, n, labels = _community_graph()
    feats = np.random.default_rng(2).normal(size=(n, 8)).astype(np.float32)
    # weak label-correlated signal: the sampled aggregation must amplify it
    feats[:, 0] += labels * 0.5
    params = graphsage_init(jax.random.key(0), 8, 16, 2)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, batch, x, y, m):
        def loss_fn(p):
            logits = sage_minibatch_forward(p, batch, x)
            return masked_cross_entropy(logits, y, m)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    first = last = None
    for epoch in range(6):
        for batch, x in make_batches(G, np.arange(n), [5, 3], batch_size=20,
                                     features=feats, random_state=epoch):
            gid = np.asarray(batch.global_ids)
            y = np.zeros(batch.g.pad_v, np.int32)
            valid = gid >= 0
            y[valid] = labels[gid[valid]]
            m = np.asarray(batch.seed_mask) & valid
            params, opt_state, loss = step(params, opt_state, batch,
                                           x, jnp.asarray(y), jnp.asarray(m))
            if first is None:
                first = float(loss)
            last = float(loss)
    assert last < first * 0.7


def test_graphsage_real_dataset_golden_accuracy():
    """Stored-golden accuracy on a REAL bundled dataset (round-4 weak #5:
    the ogbn-arxiv BASELINE row is egress-blocked, so this freezes a
    committed target on Zachary's karate club instead): GraphSAGE over
    UNSUPERVISED structural features computed by the library itself
    (personalized PageRank from the two faction leaders + degree), trained
    on 5 labeled nodes per faction, must recover the documented club split
    at >= 90% test accuracy with fixed seeds — a regression trip-wire for
    the renumber->structure->train feed path on real data."""
    import networkx as nx
    import pandas as pd

    from cugraph_tpu.datasets import karate
    from cugraph_tpu.nn.models import graphsage_apply, make_train_step

    G = karate.get_graph(download=True)
    n = G.number_of_vertices()
    Gx = nx.karate_club_graph()  # ground-truth 'club' labels (the split)
    labels_ext = np.array([0 if Gx.nodes[v]["club"] == "Mr. Hi" else 1
                           for v in range(n)], np.int32)

    def ppr(seed):
        pers = pd.DataFrame({"vertex": [seed], "values": [1.0]})
        df = ct.pagerank(G, personalization=pers).sort_values("vertex")
        return df["pagerank"].to_numpy()

    deg = ct.degree_centrality(G).sort_values(
        "vertex")["degree_centrality"].to_numpy()
    feats_ext = np.stack([ppr(0), ppr(33), deg], 1).astype(np.float32)
    feats_ext = (feats_ext - feats_ext.mean(0)) / (feats_ext.std(0) + 1e-9)

    # datasets renumber: place external-id features/labels at INTERNAL rows
    nm = G.number_map
    i2e = nm.to_external(np.arange(n))
    g_full = G.structure
    pad_v = g_full.pad_v
    x = np.zeros((pad_v, 3), np.float32)
    x[:n] = feats_ext[i2e]
    y = np.zeros(pad_v, np.int32)
    y[:n] = labels_ext[i2e]
    train_int = nm.to_internal(np.array([0, 1, 2, 3, 4, 33, 32, 31, 30, 29]))
    mask = np.zeros(pad_v, bool)
    mask[train_int] = True

    params = graphsage_init(jax.random.key(0), 3, 16, 2)
    opt = optax.adam(2e-2)
    step = jax.jit(make_train_step(graphsage_apply, opt))
    st = opt.init(params)
    for _ in range(150):
        params, st, _ = step(params, st, g_full, jnp.asarray(x),
                             jnp.asarray(y), jnp.asarray(mask))
    logits = np.asarray(graphsage_apply(params, g_full, jnp.asarray(x)))
    test_int = np.setdiff1d(np.arange(n), np.asarray(train_int))
    acc = float((logits[test_int].argmax(1) == y[test_int]).mean())
    assert acc >= 0.90, acc   # frozen golden (measured 0.958)
