"""ForceAtlas2 graph layout.

Reference: legacy cpp/src/layout/legacy/{force_atlas2.cu, barnes_hut.cuh,
exact_fa2.cuh} (Jacomy et al. 2014).

TPU design: two repulsion engines.

* exact — the [V, V] pairwise formulation lowers straight onto the MXU
  (x @ x^T); for small/medium V this beats tree walks outright.
* particle-mesh (``barnes_hut_optimize=True``, auto above ``_PM_AUTO_V``) —
  the Barnes-Hut analog, redesigned for the hardware.  A pointer-chasing
  quadtree walk (barnes_hut.cuh:45-240) is the worst possible TPU program:
  data-dependent traversal, scalar gathers.  Instead we bin vertices into a
  2^k x 2^k grid, accumulate per-cell mass/centroid with chunked one-hot
  matmuls (MXU, no scatter), and evaluate each vertex against ALL cell
  centroids as dense [chunk, C] tiles — with an exact leave-one-out
  adjustment for the vertex's own cell (mass and centroid recomputed without
  the vertex itself, elementwise inside the tile).  O(V*C) dense work
  replaces O(V log V) scalar tree work; every op is a matmul or an
  elementwise tile, so the MXU/VPU stay busy.  ``barnes_hut_theta`` maps to
  grid resolution (smaller theta -> finer grid), mirroring the accuracy knob
  of the reference's opening criterion (barnes_hut.cuh theta)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from cugraph_tpu.core.structure import GraphStructure


def _exact_repulsion(pos, deg, real, scaling_ratio):
    """Exact pairwise repulsion — [V, V] on the MXU (exact_fa2.cuh analog)."""
    sq = jnp.sum(pos * pos, axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (pos @ pos.T)
    d2 = jnp.maximum(d2, 1e-9)
    mass = deg[:, None] * deg[None, :]
    f = scaling_ratio * mass / d2  # kr * m_i * m_j / d^2 ; force along diff
    f = f * real[:, None] * real[None, :]
    f = f - jnp.diag(jnp.diag(f))
    # F_rep_i = sum_j f_ij * (pos_i - pos_j)/|d| * |d| → use (pos_i-pos_j):
    # sum_j f_ij * (pos_i - pos_j) = pos_i * rowsum(f) - f @ pos
    return pos * jnp.sum(f, axis=1, keepdims=True) - f @ pos


_PM_CHUNK = 1024  # vertices per dense tile in the particle-mesh passes
_PM_AUTO_V = 32768  # above this the exact [V, V] pass auto-switches to PM


def _pm_grid_dim(n: int, theta: float) -> int:
    """Grid resolution from vertex count + theta.  Target ~16 vertices per
    cell at theta=0.5 (comparable leaf granularity to the reference's
    quadtree), doubled for each halving of theta; power of two in [16, 256].
    """
    import math

    target = math.sqrt(max(n, 1) / 16.0) * (0.5 / max(theta, 0.05))
    # cap at 128 (C = 16384 cells): the force pass materializes [chunk, C]
    # tiles, and the 9-offset residual bookkeeping makes ~8 of them live at
    # once — 256^2 cells would be multi-GB per chunk
    return int(min(128, max(16, 2 ** round(math.log2(max(target, 1))))))


_PM_HALO = 512  # Morton-window halo on each side of a chunk (near-field)


def _morton16(cx, cy):
    """Interleave two 8-bit coords into a 16-bit Z-order key (elementwise)."""
    def spread(v):
        v = (v | (v << 4)) & 0x0F0F
        v = (v | (v << 2)) & 0x3333
        v = (v | (v << 1)) & 0x5555
        return v

    return spread(cx) | (spread(cy) << 1)


def _pm_repulsion(pos, deg, real, grid_dim: int, scaling_ratio):
    """Particle-mesh repulsion, the Barnes-Hut analog (barnes_hut.cuh).

    A quadtree walk is the worst possible TPU program; this is the same
    near/far decomposition rebuilt from dense tiles:

    1. binning — per-cell [mass, mass*x, mass*y] accumulated by one-hot
       matmul tiles [chunk, C] @ [chunk, 3] (no scatter — XLA scatter
       scalarizes on this TPU);
    2. near-field EXACT — vertices are sorted by the Morton code of their
       cell (lax.sort carrying positions/masses, so no gathers), making
       spatial neighbors contiguous; each chunk then computes exact pairwise
       forces against a [chunk + 2*halo] window, masked to pairs whose cells
       are adjacent (Chebyshev distance <= 1);
    3. far-field — each chunk against ALL C cell centroids as a dense
       [chunk, C] tile.  Adjacent cells enter not by centroid but by their
       *residual* mass (total minus what the window already handled exactly,
       tracked per 3x3 neighbor offset), so nothing is double-counted and
       window overflow degrades gracefully to the centroid approximation.

    Far-field is evaluated at full grid resolution — finer than a
    theta-opened quadtree — and the near field is exact up to window
    overflow, so accuracy is comparable to or better than the reference's
    theta=0.5 opening criterion (see
    tests/test_misc_algos.py::test_pm_repulsion_matches_exact).
    """
    pad_v = pos.shape[0]
    G = grid_dim
    C = G * G
    m = deg
    big = jnp.float32(3e38)
    xy_min = jnp.min(jnp.where(real[:, None] > 0, pos, big), axis=0)
    xy_max = jnp.max(jnp.where(real[:, None] > 0, pos, -big), axis=0)
    h = jnp.maximum((xy_max - xy_min) / G, 1e-6)
    cxy = jnp.clip(jnp.floor((pos - xy_min[None, :]) / h[None, :]),
                   0, G - 1).astype(jnp.int32)
    cx, cy = cxy[:, 0], cxy[:, 1]
    # padding vertices: zero mass, cell coords far outside every window
    cx = jnp.where(real > 0, cx, -1000)
    cy = jnp.where(real > 0, cy, -1000)
    key = jnp.where(real > 0, _morton16(cxy[:, 0], cxy[:, 1]),
                    jnp.int32(1 << 24))

    idx = jnp.arange(pad_v, dtype=jnp.int32)
    _, sx_, sy_, sm, scx, scy, sidx = jax.lax.sort(
        (key, pos[:, 0], pos[:, 1], m, cx, cy, idx), num_keys=1)

    # bound live [chunk, C] tile memory: chunk·C ≤ 2^22 (16 MB f32 per tile)
    chunk = min(_PM_CHUNK, pad_v, max(256, (1 << 22) // C))
    n_chunks = -(-pad_v // chunk)
    pad_to = n_chunks * chunk
    halo = _PM_HALO
    ext = pad_to - pad_v + halo  # right pad: chunk padding + halo

    def padv(a, fill):
        return jnp.pad(a, (halo, ext), constant_values=fill)

    wx = padv(sx_, 0.0)
    wy = padv(sy_, 0.0)
    wm = padv(sm, 0.0)
    wcx = padv(scx, -1000)
    wcy = padv(scy, -1000)

    # --- binning (one-hot matmul, bf16 one-hot / f32 accumulate)
    iota_c = jnp.arange(C, dtype=jnp.int32)
    cid = jnp.where(real > 0, cy * G + cx, C + 1)
    vals = jnp.stack([m, m * pos[:, 0], m * pos[:, 1]], axis=1)
    cid_ch = jnp.pad(cid, (0, pad_to - pad_v),
                     constant_values=C + 1).reshape(n_chunks, chunk)
    vals_ch = jnp.pad(vals, ((0, pad_to - pad_v), (0, 0))).reshape(
        n_chunks, chunk, 3)

    def accum(acc, inp):
        cid_b, vals_b = inp
        onehot = (cid_b[:, None] == iota_c[None, :]).astype(jnp.float32)
        return acc + jax.lax.dot_general(
            onehot, vals_b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32), None

    cell, _ = jax.lax.scan(accum, jnp.zeros((C, 3), jnp.float32),
                           (cid_ch, vals_ch))
    Mc, Sx, Sy = cell[:, 0], cell[:, 1], cell[:, 2]
    ccx = (iota_c % G)[None, :]
    ccy = (iota_c // G)[None, :]

    W = chunk + 2 * halo

    def force_chunk(i):
        s = i * chunk
        px = jax.lax.dynamic_slice(wx, (s + halo,), (chunk,))
        py = jax.lax.dynamic_slice(wy, (s + halo,), (chunk,))
        pm_ = jax.lax.dynamic_slice(wm, (s + halo,), (chunk,))
        pcx = jax.lax.dynamic_slice(wcx, (s + halo,), (chunk,))
        pcy = jax.lax.dynamic_slice(wcy, (s + halo,), (chunk,))
        nx = jax.lax.dynamic_slice(wx, (s,), (W,))
        ny = jax.lax.dynamic_slice(wy, (s,), (W,))
        nm = jax.lax.dynamic_slice(wm, (s,), (W,))
        ncx = jax.lax.dynamic_slice(wcx, (s,), (W,))
        ncy = jax.lax.dynamic_slice(wcy, (s,), (W,))

        # --- exact near-field over the Morton window
        # offsets are (v - u) to match the far tile's (cell - u) buckets
        du = ncx[None, :] - pcx[:, None]
        dv = ncy[None, :] - pcy[:, None]
        near = (jnp.abs(du) <= 1) & (jnp.abs(dv) <= 1)
        notself = (jnp.arange(W)[None, :] - halo) != jnp.arange(chunk)[:, None]
        pair = near & notself
        dx = px[:, None] - nx[None, :]
        dy = py[:, None] - ny[None, :]
        d2 = jnp.maximum(dx * dx + dy * dy, 1e-9)
        f = jnp.where(pair, scaling_ratio * pm_[:, None] * nm[None, :] / d2,
                      0.0)
        fx = jnp.sum(f * dx, axis=1)
        fy = jnp.sum(f * dy, axis=1)

        # captured mass per 3x3 neighbor offset o = (dv+1)*3 + (du+1)
        omap = jnp.where(pair, (dv + 1) * 3 + (du + 1), -1)
        capt = jnp.stack(
            [jnp.sum(jnp.where(omap == o, nm[None, :], 0.0), axis=1)
             for o in range(9)], axis=1)  # [chunk, 9]

        # --- far-field tile vs all cells; near cells use residual mass
        cdu = ccx - pcx[:, None]
        cdv = ccy - pcy[:, None]
        cnear = (jnp.abs(cdu) <= 1) & (jnp.abs(cdv) <= 1)
        comap = (cdv + 1) * 3 + (cdu + 1)
        capt_c = jnp.zeros((chunk, C), jnp.float32)
        for o in range(9):
            capt_c = capt_c + jnp.where(cnear & (comap == o),
                                        capt[:, o:o + 1], 0.0)
        own = cnear & (comap == 4)
        Meff = Mc[None, :] - capt_c - jnp.where(own, pm_[:, None], 0.0)
        Meff = jnp.maximum(Meff, 0.0)  # f32 cancellation guard
        ok = Mc[None, :] > 1e-9
        inv = jnp.where(ok, 1.0 / jnp.maximum(Mc[None, :], 1e-9), 0.0)
        gx = px[:, None] - Sx[None, :] * inv
        gy = py[:, None] - Sy[None, :] * inv
        g2 = jnp.maximum(gx * gx + gy * gy, 1e-9)
        fc = jnp.where(ok, scaling_ratio * pm_[:, None] * Meff / g2, 0.0)
        fx = fx + jnp.sum(fc * gx, axis=1)
        fy = fy + jnp.sum(fc * gy, axis=1)
        return jnp.stack([fx, fy], axis=1)

    rep_sorted = jax.lax.map(force_chunk,
                             jnp.arange(n_chunks, dtype=jnp.int32))
    rep_sorted = rep_sorted.reshape(pad_to, 2)[:pad_v]
    # unsort without gather: sort (original index, force) by index
    _, rx, ry = jax.lax.sort(
        (sidx, rep_sorted[:, 0], rep_sorted[:, 1]), num_keys=1)
    return jnp.stack([rx, ry], axis=1)


@partial(jax.jit, static_argnames=("max_iter", "outbound_attraction_distribution",
                                   "lin_log_mode", "strong_gravity_mode",
                                   "pm_grid_dim", "edge_weight_influence",
                                   "both_endpoints"))
def _fa2_kernel(g: GraphStructure, pos0, max_iter: int, jitter_tolerance,
                scaling_ratio, gravity, outbound_attraction_distribution: bool,
                lin_log_mode: bool, strong_gravity_mode: bool,
                pm_grid_dim: int = 0, state0=None,
                edge_weight_influence: float = 1.0,
                both_endpoints: bool = False):
    """Runs ``max_iter`` FA2 steps; returns the full loop carry
    (pos, force, speed_eff) so callback mode can re-enter per epoch.
    ``edge_weight_influence`` scales attraction by w**influence (reference
    force_atlas2.cu knob); ``both_endpoints`` applies attraction to BOTH
    edge endpoints (directed storage holds each edge once — undirected
    symmetric storage supplies the reverse edge itself)."""
    pad_v = g.pad_v
    n = g.num_vertices
    real = (jnp.arange(pad_v) < n).astype(jnp.float32)
    deg = (g.csr.degrees() + 1).astype(jnp.float32) * real  # mass = deg + 1
    src, dst, w = g.csr.majors, g.csr.indices, g.csr.weights
    # padding edges carry w=0 and must stay force-free even at influence=0
    w = jnp.where(w > 0, w ** jnp.float32(edge_weight_influence), 0.0)

    def step(i, state):
        pos, speed, speed_eff = state
        if pm_grid_dim:
            rep = _pm_repulsion(pos, deg, real, pm_grid_dim, scaling_ratio)
        else:
            rep = _exact_repulsion(pos, deg, real, scaling_ratio)

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
        if both_endpoints:
            att = att + jax.ops.segment_sum(-contrib, dst,
                                            num_segments=pad_v)

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

    init = state0 if state0 is not None else (
        pos0, jnp.zeros_like(pos0), jnp.float32(1.0))
    return jax.lax.fori_loop(0, max_iter, step, init)


def force_atlas2(G, max_iter: int = 500, pos_list=None,
                 outbound_attraction_distribution: bool = True,
                 lin_log_mode: bool = False, prevent_overlapping: bool = False,
                 edge_weight_influence: float = 1.0,
                 jitter_tolerance: float = 1.0, barnes_hut_optimize: bool = False,
                 barnes_hut_theta: float = 0.5, scaling_ratio: float = 2.0,
                 strong_gravity_mode: bool = False, gravity: float = 1.0,
                 verbose: bool = False, callback=None, random_state: int = 42):
    """ForceAtlas2 layout; returns ['vertex', 'x', 'y'] (reference
    force_atlas2.pyx / layout/legacy/force_atlas2.cu).

    ``barnes_hut_optimize=True`` selects the particle-mesh far-field engine
    (the Barnes-Hut analog, see _pm_repulsion); it is auto-enabled above
    ``_PM_AUTO_V`` vertices where the exact [V, V] pass no longer fits.
    ``barnes_hut_theta`` tunes grid resolution: smaller theta -> finer grid
    -> better far-field accuracy (reference opening criterion)."""
    g = G.structure
    n = G.number_of_vertices()
    use_pm = bool(barnes_hut_optimize) or n > _PM_AUTO_V
    pm_grid_dim = _pm_grid_dim(n, barnes_hut_theta) if use_pm else 0
    if pos_list is not None:
        ids = G.lookup_internal_vertex_id(pos_list["vertex"].to_numpy())
        pos = np.zeros((g.pad_v, 2), np.float32)
        pos[ids, 0] = pos_list["x"].to_numpy()
        pos[ids, 1] = pos_list["y"].to_numpy()
    else:
        rng = np.random.default_rng(random_state)
        pos = np.zeros((g.pad_v, 2), np.float32)
        pos[:n] = rng.uniform(-100, 100, (n, 2)).astype(np.float32)
    kernel_kw = dict(edge_weight_influence=float(edge_weight_influence),
                     both_endpoints=G.is_directed())
    args = (jnp.float32(jitter_tolerance), jnp.float32(scaling_ratio),
            jnp.float32(gravity), bool(outbound_attraction_distribution),
            bool(lin_log_mode), bool(strong_gravity_mode), pm_grid_dim)
    if callback is None:
        out, _, _ = _fa2_kernel(g, jnp.asarray(pos), int(max_iter), *args,
                                **kernel_kw)
    else:
        # epoch-stepped so the reference's GraphBasedDimRedCallback protocol
        # (internals.pyx) sees positions every epoch
        callback.on_preprocess_end(pos[:n])
        state = None
        p0 = jnp.asarray(pos)
        for _ in range(int(max_iter)):
            state = _fa2_kernel(g, p0, 1, *args, state0=state, **kernel_kw)
            callback.on_epoch_end(np.asarray(state[0])[:n])
        out = state[0] if state is not None else p0
        callback.on_train_end(np.asarray(out)[:n])
    out = np.asarray(out)[:n]
    return pd.DataFrame({
        "vertex": G.number_map.to_external(np.arange(n)),
        "x": out[:, 0], "y": out[:, 1],
    })
