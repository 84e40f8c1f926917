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
