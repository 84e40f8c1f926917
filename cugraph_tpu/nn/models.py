"""Full GNN models + training steps (the framework's flagship compute path).

Mirrors the BASELINE.json GNN config ("2-layer GraphSAGE on ogbn-arxiv"):
full-graph semi-supervised node classification.  Everything here is pure
functional JAX so the same ``train_step`` jits single-chip or shard_maps over
the 2D device mesh (see cugraph_tpu.parallel).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from cugraph_tpu.core.structure import GraphStructure
from cugraph_tpu.nn import layers


def graphsage_init(key, in_dim: int, hidden_dim: int, out_dim: int,
                   num_layers: int = 2):
    """Parameter pytree for an ``num_layers``-layer GraphSAGE."""
    dims = [in_dim] + [hidden_dim] * (num_layers - 1) + [out_dim]
    keys = jax.random.split(key, num_layers)
    return [layers.sage_init(k, a, b) for k, a, b in zip(keys, dims, dims[1:])]


def graphsage_apply(params, g: GraphStructure, x: jax.Array) -> jax.Array:
    """Forward pass; ReLU between layers, raw logits out."""
    h = x
    for i, p in enumerate(params):
        h = layers.sage_conv(p, g, h)
        if i + 1 < len(params):
            h = jax.nn.relu(h)
    return h


def gcn_init(key, in_dim: int, hidden_dim: int, out_dim: int,
             num_layers: int = 2):
    dims = [in_dim] + [hidden_dim] * (num_layers - 1) + [out_dim]
    keys = jax.random.split(key, num_layers)
    return [layers.gcn_init(k, a, b) for k, a, b in zip(keys, dims, dims[1:])]


def gcn_apply(params, g: GraphStructure, x: jax.Array) -> jax.Array:
    h = x
    for i, p in enumerate(params):
        h = layers.gcn_conv(p, g, h)
        if i + 1 < len(params):
            h = jax.nn.relu(h)
    return h


def gat_init(key, in_dim: int, hidden_dim: int, out_dim: int,
             num_layers: int = 2, num_heads: int = 4):
    keys = jax.random.split(key, num_layers)
    params = []
    d = in_dim
    for i, k in enumerate(keys):
        if i + 1 < num_layers:
            params.append(layers.gat_init(k, d, hidden_dim, num_heads))
            d = hidden_dim * num_heads
        else:
            params.append(layers.gat_init(k, d, out_dim, 1))
    return params


def gat_apply(params, g: GraphStructure, x: jax.Array) -> jax.Array:
    h = x
    for i, p in enumerate(params):
        h = layers.gat_conv(p, g, h)
        if i + 1 < len(params):
            h = jax.nn.elu(h)
    return h


def gatv2_model_init(key, in_dim: int, hidden_dim: int, out_dim: int,
                     num_layers: int = 2, num_heads: int = 4):
    keys = jax.random.split(key, num_layers)
    params = []
    d = in_dim
    for i, k in enumerate(keys):
        if i + 1 < num_layers:
            params.append(layers.gatv2_init(k, d, hidden_dim, num_heads))
            d = hidden_dim * num_heads
        else:
            params.append(layers.gatv2_init(k, d, out_dim, 1))
    return params


def gatv2_apply(params, g: GraphStructure, x: jax.Array) -> jax.Array:
    h = x
    for i, p in enumerate(params):
        h = layers.gatv2_conv(p, g, h)
        if i + 1 < len(params):
            h = jax.nn.elu(h)
    return h


def gin_model_init(key, in_dim: int, hidden_dim: int, out_dim: int,
                   num_layers: int = 2):
    dims = [in_dim] + [hidden_dim] * (num_layers - 1) + [out_dim]
    keys = jax.random.split(key, num_layers)
    return [layers.gin_init(k, a, max(a, b), b)
            for k, a, b in zip(keys, dims, dims[1:])]


def gin_apply(params, g: GraphStructure, x: jax.Array) -> jax.Array:
    h = x
    for i, p in enumerate(params):
        h = layers.gin_conv(p, g, h)
        if i + 1 < len(params):
            h = jax.nn.relu(h)
    return h


def appnp_init(key, in_dim: int, hidden_dim: int, out_dim: int):
    """Predict-then-propagate: a 2-layer MLP predictor (propagation has no
    parameters)."""
    k1, k2 = jax.random.split(key)
    from cugraph_tpu.nn.layers import _glorot

    return {
        "w1": _glorot(k1, (in_dim, hidden_dim)),
        "b1": jnp.zeros((hidden_dim,), jnp.float32),
        "w2": _glorot(k2, (hidden_dim, out_dim)),
        "b2": jnp.zeros((out_dim,), jnp.float32),
    }


def appnp_apply(params, g: GraphStructure, x: jax.Array, *,
                alpha: float = 0.1, k: int = 10) -> jax.Array:
    h = jax.nn.relu(jnp.dot(x, params["w1"],
                            preferred_element_type=jnp.float32) + params["b1"])
    z = jnp.dot(h, params["w2"],
                preferred_element_type=jnp.float32) + params["b2"]
    return layers.appnp_propagate(g, z, alpha=alpha, k=k)


def masked_cross_entropy(logits: jax.Array, labels: jax.Array,
                         mask: jax.Array) -> jax.Array:
    """Mean softmax cross-entropy over vertices where ``mask`` is true.

    ``labels``: int32 [pad_v]; ``mask``: bool [pad_v] (false on pad/sink rows).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    m = mask.astype(logits.dtype)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


def make_train_step(apply_fn, optimizer: optax.GradientTransformation):
    """Build a jittable (params, opt_state, g, x, labels, mask) → ... step."""

    def loss_fn(params, g, x, labels, mask):
        logits = apply_fn(params, g, x)
        return masked_cross_entropy(logits, labels, mask)

    def train_step(params, opt_state, g, x, labels, mask):
        loss, grads = jax.value_and_grad(loss_fn)(params, g, x, labels, mask)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def accuracy(logits: jax.Array, labels: jax.Array, mask: jax.Array):
    pred = jnp.argmax(logits, axis=-1)
    m = mask.astype(jnp.float32)
    return jnp.sum((pred == labels) * m) / jnp.maximum(jnp.sum(m), 1.0)
