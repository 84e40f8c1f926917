"""ForceAtlas2 graph layout.

Reference: legacy cpp/src/layout/legacy/{force_atlas2.cu, barnes_hut.cuh,
exact_fa2.cuh} (Jacomy et al. 2014).

TPU design: the reference needs Barnes-Hut trees because O(V^2) repulsion is
infeasible on GPU SMs for large V; on TPU the *dense pairwise* formulation is
a [V, V] distance computation that lowers straight onto the MXU (x @ x^T),
so we run exact FA2 in blocks — faster than tree walks for the V this serves
and embarrassingly shardable (row-block per device later)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from cugraph_tpu.core.structure import GraphStructure


@partial(jax.jit, static_argnames=("max_iter", "outbound_attraction_distribution",
                                   "lin_log_mode", "strong_gravity_mode"))
def _fa2_kernel(g: GraphStructure, pos0, max_iter: int, jitter_tolerance,
                scaling_ratio, gravity, outbound_attraction_distribution: bool,
                lin_log_mode: bool, strong_gravity_mode: bool):
    pad_v = g.pad_v
    n = g.num_vertices
    real = (jnp.arange(pad_v) < n).astype(jnp.float32)
    deg = (g.csr.degrees() + 1).astype(jnp.float32) * real  # mass = deg + 1
    src, dst, w = g.csr.majors, g.csr.indices, g.csr.weights

    def step(i, state):
        pos, speed, speed_eff = state
        # --- repulsion: exact pairwise, MXU-shaped
        sq = jnp.sum(pos * pos, axis=1)
        d2 = sq[:, None] + sq[None, :] - 2.0 * (pos @ pos.T)
        d2 = jnp.maximum(d2, 1e-9)
        mass = deg[:, None] * deg[None, :]
        f = scaling_ratio * mass / d2  # kr * m_i * m_j / d^2 ; force along diff
        f = f * real[:, None] * real[None, :]
        f = f - jnp.diag(jnp.diag(f))
        # F_rep_i = sum_j f_ij * (pos_i - pos_j)/|d| * |d| → use (pos_i-pos_j):
        # sum_j f_ij * (pos_i - pos_j) = pos_i * rowsum(f) - f @ pos
        rep = pos * jnp.sum(f, axis=1, keepdims=True) - f @ pos

        # --- attraction along edges
        pd_ = jnp.take(pos, src, axis=0) - jnp.take(pos, dst, axis=0)
        dist = jnp.sqrt(jnp.maximum(jnp.sum(pd_ * pd_, axis=1), 1e-18))
        if lin_log_mode:
            fa = jnp.log1p(dist) / dist
        else:
            fa = jnp.ones_like(dist)
        if outbound_attraction_distribution:
            fa = fa / jnp.take(deg, src).clip(1.0)
        fa = fa * w
        contrib = -fa[:, None] * pd_
        att = jax.ops.segment_sum(contrib, src, num_segments=pad_v,
                                  indices_are_sorted=True)

        # --- gravity
        pnorm = jnp.sqrt(jnp.maximum(jnp.sum(pos * pos, axis=1), 1e-18))
        if strong_gravity_mode:
            grav = -gravity * deg[:, None] * pos
        else:
            grav = -gravity * deg[:, None] * pos / pnorm[:, None]

        force = (rep + att + grav) * real[:, None]
        # adaptive speed (swing/traction) — simplified global speed schedule
        swing = jnp.sum(deg * jnp.sqrt(jnp.sum((force - speed) ** 2, axis=1)))
        traction = jnp.sum(deg * 0.5 * jnp.sqrt(jnp.sum((force + speed) ** 2, axis=1)))
        new_speed_eff = jitter_tolerance * jitter_tolerance * traction / \
            jnp.maximum(swing, 1e-9)
        new_speed_eff = jnp.minimum(new_speed_eff, 10.0)
        fnorm = jnp.sqrt(jnp.maximum(jnp.sum(force * force, axis=1), 1e-18))
        factor = new_speed_eff / (1.0 + jnp.sqrt(new_speed_eff * fnorm))
        pos = pos + force * factor[:, None] * real[:, None]
        return pos, force, new_speed_eff

    pos, _, _ = jax.lax.fori_loop(
        0, max_iter, step,
        (pos0, jnp.zeros_like(pos0), jnp.float32(1.0)))
    return pos


def force_atlas2(G, max_iter: int = 500, pos_list=None,
                 outbound_attraction_distribution: bool = True,
                 lin_log_mode: bool = False, prevent_overlapping: bool = False,
                 edge_weight_influence: float = 1.0,
                 jitter_tolerance: float = 1.0, barnes_hut_optimize: bool = False,
                 barnes_hut_theta: float = 0.5, scaling_ratio: float = 2.0,
                 strong_gravity_mode: bool = False, gravity: float = 1.0,
                 verbose: bool = False, callback=None, random_state: int = 42):
    """ForceAtlas2 layout; returns ['vertex', 'x', 'y'] (reference
    force_atlas2.pyx / layout/legacy/force_atlas2.cu).  barnes_hut_optimize
    is accepted for parity and ignored — the dense MXU path is exact."""
    g = G.structure
    n = G.number_of_vertices()
    if pos_list is not None:
        ids = G.lookup_internal_vertex_id(pos_list["vertex"].to_numpy())
        pos = np.zeros((g.pad_v, 2), np.float32)
        pos[ids, 0] = pos_list["x"].to_numpy()
        pos[ids, 1] = pos_list["y"].to_numpy()
    else:
        rng = np.random.default_rng(random_state)
        pos = np.zeros((g.pad_v, 2), np.float32)
        pos[:n] = rng.uniform(-100, 100, (n, 2)).astype(np.float32)
    out = _fa2_kernel(g, jnp.asarray(pos), int(max_iter),
                      jnp.float32(jitter_tolerance), jnp.float32(scaling_ratio),
                      jnp.float32(gravity),
                      bool(outbound_attraction_distribution),
                      bool(lin_log_mode), bool(strong_gravity_mode))
    out = np.asarray(out)[:n]
    return pd.DataFrame({
        "vertex": G.number_map.to_external(np.arange(n)),
        "x": out[:, 0], "y": out[:, 1],
    })
