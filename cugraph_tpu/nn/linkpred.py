"""Link-prediction heads and training utilities.

The reference feeds external GNN stacks through its sampling + negative-
sampling capabilities (cpp/src/sampling/negative_sampling_impl.cuh:270,
readme_pages/gnn_support.md); this module closes the loop in-framework: a GNN
encoder produces vertex embeddings, a decoder scores (src, dst) pairs, and the
loss contrasts observed edges against sampled non-edges.

TPU mapping: decoders are elementwise/matmul over [P, F] pair batches (the
embedding row gathers are the only sparse op); the AUC/hits@k metrics are
sort/rank based — dense `lax.sort`, no scalarizing segment ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cugraph_tpu.nn.layers import _glorot


# ---------------------------------------------------------------------------
# decoders: embeddings [V, F] + pair (src, dst) → score logits [P]
# ---------------------------------------------------------------------------

def dot_decoder(z: jax.Array, src: jax.Array, dst: jax.Array) -> jax.Array:
    """score = ⟨z[src], z[dst]⟩ (parameter-free)."""
    return jnp.sum(jnp.take(z, src, axis=0) * jnp.take(z, dst, axis=0),
                   axis=-1)


def mlp_decoder_init(key, in_dim: int, hidden_dim: int = 64):
    k1, k2 = jax.random.split(key)
    return {
        "w1": _glorot(k1, (2 * in_dim, hidden_dim)),
        "b1": jnp.zeros((hidden_dim,), jnp.float32),
        "w2": _glorot(k2, (hidden_dim, 1)),
        "b2": jnp.zeros((1,), jnp.float32),
    }


def mlp_decoder(params, z: jax.Array, src: jax.Array,
                dst: jax.Array) -> jax.Array:
    """2-layer MLP over concatenated endpoint embeddings."""
    h = jnp.concatenate(
        [jnp.take(z, src, axis=0), jnp.take(z, dst, axis=0)], axis=-1)
    h = jax.nn.relu(jnp.dot(h, params["w1"],
                            preferred_element_type=jnp.float32) + params["b1"])
    return (jnp.dot(h, params["w2"],
                    preferred_element_type=jnp.float32) + params["b2"])[:, 0]


def distmult_decoder_init(key, in_dim: int, num_relations: int = 1):
    return {"rel": jax.random.normal(key, (num_relations, in_dim)) * 0.1}


def distmult_decoder(params, z: jax.Array, src: jax.Array, dst: jax.Array,
                     rel: jax.Array | None = None) -> jax.Array:
    """score = ⟨z[src], r ⊙ z[dst]⟩ with a per-relation diagonal r (DistMult);
    rel defaults to relation 0 for homogeneous graphs."""
    r = params["rel"][jnp.zeros_like(src) if rel is None else rel]
    return jnp.sum(jnp.take(z, src, axis=0) * r * jnp.take(z, dst, axis=0),
                   axis=-1)


# ---------------------------------------------------------------------------
# loss + metrics
# ---------------------------------------------------------------------------

def link_prediction_loss(pos_logits: jax.Array,
                         neg_logits: jax.Array) -> jax.Array:
    """Binary cross-entropy with logits: positives → 1, negatives → 0."""
    pos = jnp.mean(jax.nn.softplus(-pos_logits))
    neg = jnp.mean(jax.nn.softplus(neg_logits))
    return 0.5 * (pos + neg)


def roc_auc(pos_logits: jax.Array, neg_logits: jax.Array) -> jax.Array:
    """Exact AUC via the rank-sum (Mann-Whitney U) statistic, computed with
    one dense sort — ties get average rank (midrank), matching
    sklearn.metrics.roc_auc_score."""
    n_pos, n_neg = pos_logits.shape[0], neg_logits.shape[0]
    scores = jnp.concatenate([pos_logits, neg_logits])
    labels = jnp.concatenate(
        [jnp.ones(n_pos, jnp.float32), jnp.zeros(n_neg, jnp.float32)])
    order = jnp.argsort(scores)
    s_sorted = scores[order]
    l_sorted = labels[order]
    n = n_pos + n_neg
    ranks = jnp.arange(1, n + 1, dtype=jnp.float32)
    # midranks for ties: average rank within each equal-score run
    new_run = jnp.concatenate(
        [jnp.ones(1, bool), s_sorted[1:] != s_sorted[:-1]])
    run_id = jnp.cumsum(new_run.astype(jnp.int32)) - 1
    run_sum = jax.ops.segment_sum(ranks, run_id, num_segments=n)
    run_cnt = jax.ops.segment_sum(jnp.ones_like(ranks), run_id,
                                  num_segments=n)
    midrank = run_sum[run_id] / jnp.maximum(run_cnt[run_id], 1.0)
    rank_sum_pos = jnp.sum(midrank * l_sorted)
    u = rank_sum_pos - n_pos * (n_pos + 1) / 2.0
    return u / jnp.maximum(n_pos * n_neg, 1)


def hits_at_k(pos_logits: jax.Array, neg_logits: jax.Array,
              k: int) -> jax.Array:
    """Fraction of positives scoring above the k-th best negative (the OGB
    linkproppred convention)."""
    kk = min(int(k), int(neg_logits.shape[0]))
    thresh = jax.lax.top_k(neg_logits, kk)[0][-1]
    return jnp.mean((pos_logits > thresh).astype(jnp.float32))


# ---------------------------------------------------------------------------
# end-to-end training
# ---------------------------------------------------------------------------

def make_linkpred_train_step(encoder_apply, decoder, optimizer):
    """Build a jittable step over (params, opt_state, g, x, pos/neg pairs).

    ``params`` = {"encoder": ..., "decoder": ...} (decoder may be {} for the
    dot decoder); negatives come from cugraph_tpu.negative_sampling outside
    the jit (variable-size rejection loops stay on host)."""
    import optax

    def score(dec_params, z, src, dst):
        if decoder is dot_decoder:
            return dot_decoder(z, src, dst)
        return decoder(dec_params, z, src, dst)

    def loss_fn(params, g, x, pos_src, pos_dst, neg_src, neg_dst):
        z = encoder_apply(params["encoder"], g, x)
        pos = score(params.get("decoder", {}), z, pos_src, pos_dst)
        neg = score(params.get("decoder", {}), z, neg_src, neg_dst)
        return link_prediction_loss(pos, neg)

    def train_step(params, opt_state, g, x, pos_src, pos_dst,
                   neg_src, neg_dst):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, g, x, pos_src, pos_dst, neg_src, neg_dst)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def sample_negatives(G, num_samples: int, random_state: int = 0,
                     degree_biased: bool = False):
    """Host-side negative pair sampling for training loops; returns
    (src, dst) int32 device arrays.  Routes through negative_sampling
    (reference negative_sampling_impl.cuh:270) — uniform endpoint draws by
    default; ``degree_biased=True`` weights endpoints by degree like the
    reference's typical GNN usage."""
    import cugraph_tpu as ct

    kw = {}
    if degree_biased:
        deg = G.degree().sort_values("vertex")["degree"].to_numpy(np.float64)
        kw = dict(src_bias=deg, dst_bias=deg)
    df = ct.negative_sampling(G, num_samples=num_samples,
                              random_state=random_state, **kw)
    src = np.asarray(G.lookup_internal_vertex_id(np.asarray(df["src"])),
                     np.int32)
    dst = np.asarray(G.lookup_internal_vertex_id(np.asarray(df["dst"])),
                     np.int32)
    return jnp.asarray(src), jnp.asarray(dst)
