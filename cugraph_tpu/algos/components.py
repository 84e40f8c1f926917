"""Components: WCC, SCC, maximal independent set, vertex coloring.

Reference: cpp/src/components/{weakly_connected_components_impl.cuh:682-1037,
strongly_connected_components_impl.cuh:2370, mis_impl.cuh:315,
vertex_coloring_impl.cuh:151}.

TPU design:
* WCC — min-label propagation with pointer jumping (label[label] compression),
  converging in O(log D) dense sweeps; replaces the reference's multi-root
  frontier expansion (data-dependent worklists don't pay on TPU).
* SCC — Orzan-coloring rounds: forward max-color propagation to a fixpoint,
  then one joint backward confirmation sweep restricted to equal colors (the
  dense analog of the reference's FW-BW reachability,
  strongly_connected_components_impl.cuh:1113-1150).
* MIS — Luby random-priority rounds (mis_impl.cuh uses the same scheme);
  coloring = iterated MIS like vertex_coloring_impl.cuh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from cugraph_tpu.algos._utils import vertex_frame
from cugraph_tpu.core.structure import GraphStructure
from cugraph_tpu.prims.vertex_edge import gather_minor, segment_reduce_by_major


@jax.jit
def _wcc_kernel(g: GraphStructure):
    pad_v = g.pad_v
    n = g.num_vertices
    ids = jnp.arange(pad_v)
    real = ids < n
    label0 = jnp.where(real, ids, pad_v - 1).astype(jnp.int32)

    def body(state):
        label, _ = state
        # min over in- and out-neighborhoods (directed edges treated both ways)
        lin = segment_reduce_by_major(g.csc, gather_minor(g.csc, label), "min")
        lout = segment_reduce_by_major(g.csr, gather_minor(g.csr, label), "min")
        new = jnp.minimum(label, jnp.minimum(lin, lout))
        # pointer jumping: compress toward the root
        new = jnp.minimum(new, new[new])
        new = jnp.minimum(new, new[new])
        new = jnp.where(real, new, pad_v - 1)
        changed = jnp.any(new != label)
        return new, changed

    label, _ = jax.lax.while_loop(lambda s: s[1], body, (label0, jnp.bool_(True)))
    return label


@partial(jax.jit, static_argnames=("interpret",))
def _wcc_kernel_pallas(plan, n: jax.Array, interpret: bool = False):
    """Min-label propagation over (min, left) one-hot sweeps + pointer
    jumping; labels ride f32 (ids < 2^24 stay f32-exact, and the selection
    matmuls run bit-exact via split3 past 2^16 vertices)."""
    from cugraph_tpu.kernels.spmv_onehot import SEMIRING_BIG, spmv_onehot

    pad_v = plan.pad_v
    ids = jnp.arange(pad_v)
    real = ids < n
    label0 = jnp.where(real, ids, pad_v - 1).astype(jnp.float32)
    # labels are vertex ids: 2-limb split is only ~16-bit exact and can merge
    # or split components past 2^16 vertices; split3 is bit-exact (see
    # kernels/spmv_onehot._sel)
    idprec = "split" if pad_v <= (1 << 16) else "split3"

    def body(state):
        label, _ = state
        y = spmv_onehot(plan, label, reduce="min", combine="left",
                        precision=idprec, interpret=interpret)
        new = jnp.minimum(label, jnp.where(real, y, SEMIRING_BIG))
        new = jnp.minimum(new, jnp.take(new, new.astype(jnp.int32)))
        new = jnp.where(real, new, pad_v - 1)
        return new, jnp.any(new != label)

    label, _ = jax.lax.while_loop(lambda s: s[1], body,
                                  (label0, jnp.bool_(True)))
    return label.astype(jnp.int32)


@partial(jax.jit, static_argnames=("interpret",))
def _wcc_mask_kernel(plan, seed: jax.Array, n: jax.Array,
                     interpret: bool = False):
    """Single-component reachability as 0/1 mask sweeps (max, left) at
    2-limb split — the mask is exact at ANY vertex count (the BFS lesson),
    so no third limb pass is needed.  One piece of the Afforest-style
    hybrid WCC below."""
    from cugraph_tpu.kernels.spmv_onehot import spmv_onehot

    pad_v = plan.pad_v
    ids = jnp.arange(pad_v)
    real = ids < n
    mask0 = ids == seed

    def body(state):
        reach, frontier = state
        y = spmv_onehot(plan, frontier.astype(jnp.float32), reduce="max",
                        combine="left", precision="split",
                        interpret=interpret) > 0.5
        new = y & real & ~reach
        return reach | new, new

    reach, _ = jax.lax.while_loop(lambda s: jnp.any(s[1]), body,
                                  (mask0, mask0))
    return reach


def _wcc_hybrid(G, interpret: bool = False):
    """Afforest-style WCC (Bader/Sutton trick; the mask-style reformulation
    VERDICT r3 asked to attempt): one exact-by-construction 0/1-mask BFS
    claims the hub's (usually giant) component at the cheap 2-limb split
    rate, then a host min-label pass finishes the residual edges (tiny on
    power-law graphs).  Labels identical to the split3 label-propagation
    path (smallest internal id per component)."""
    from cugraph_tpu.kernels.dispatch import get_sym_pull_plan

    n = G.number_of_vertices()
    plan = get_sym_pull_plan(G)
    src, dst, _ = G.edgelist_arrays()
    src = np.asarray(src)
    dst = np.asarray(dst)
    deg = np.bincount(src, minlength=n) + np.bincount(dst, minlength=n)
    seed = int(deg.argmax())
    reached = np.asarray(_wcc_mask_kernel(plan, jnp.int32(seed),
                                          jnp.int32(n),
                                          interpret=interpret))[:n]
    label = np.arange(n, dtype=np.int64)
    hit = np.flatnonzero(reached)
    if len(hit):
        label[reached] = hit.min()
    # residual: edges with neither endpoint in the claimed component (a
    # component is closed, so mixed edges cannot exist)
    resid = ~reached[src]
    rs, rd = src[resid], dst[resid]
    while True:
        before = label
        label = label.copy()
        np.minimum.at(label, rd, label[rs])
        np.minimum.at(label, rs, label[rd])
        label = np.minimum(label, label[label])   # pointer jumping
        if np.array_equal(label, before):
            break
    return label.astype(np.int32)


def weakly_connected_components(G, directed=None, connection=None, return_labels=None):
    """WCC; returns ['vertex', 'labels'] — label = smallest internal vertex id
    in the component, mapped back to its external id (the reference returns
    arbitrary roots, weakly_connected_components_impl.cuh:1037).

    CUGRAPH_TPU_WCC_HYBRID=1 selects the Afforest-style mask hybrid
    (measured in benchmarks/bench_wcc_hybrid_tpu.py; label-identical)."""
    import os

    from cugraph_tpu.kernels.dispatch import get_sym_pull_plan, use_pallas

    n = G.number_of_vertices()
    if use_pallas(G) and n < (1 << 24):
        if os.environ.get("CUGRAPH_TPU_WCC_HYBRID") == "1":
            label = _wcc_hybrid(G)[:n]
        else:
            label = np.asarray(
                _wcc_kernel_pallas(get_sym_pull_plan(G), jnp.int32(n)))[:n]
    else:
        label = np.asarray(_wcc_kernel(G.structure))[:n]
    return vertex_frame(G, {"labels": G.number_map.to_external(label)})


def connected_components(G, directed=None, connection="weak", return_labels=None):
    if connection == "weak":
        return weakly_connected_components(G)
    if connection == "strong":
        return strongly_connected_components(G)
    raise ValueError(f"unknown connection type {connection!r}")


@jax.jit
def _scc_round(g: GraphStructure, active: jax.Array):
    """One Orzan round: returns (confirmed mask, color array)."""
    pad_v = g.pad_v
    ids = jnp.arange(pad_v)
    color0 = jnp.where(active, ids, -1).astype(jnp.int32)

    def fwd_body(state):
        c, _ = state
        src_c = gather_minor(g.csc, jnp.where(active, c, -1))
        m = segment_reduce_by_major(g.csc, src_c, "max")
        new = jnp.where(active, jnp.maximum(c, m), c)
        return new, jnp.any(new != c)

    color, _ = jax.lax.while_loop(lambda s: s[1], fwd_body,
                                  (color0, jnp.bool_(True)))

    roots = (color == ids) & active
    # joint backward sweep restricted to same-color endpoints: reached u means
    # u ->* (its color root) forward, and color[u] == root means root ->* u,
    # so reached == SCC membership for this round's roots.
    edge_same = gather_minor(g.csr, color) == jnp.take(color, g.csr.majors)

    def bwd_body(state):
        r, _ = state
        dst_r = gather_minor(g.csr, r)
        hit = segment_reduce_by_major(
            g.csr, (dst_r & edge_same).astype(jnp.int32), "max") > 0
        new = r | (hit & active)
        return new, jnp.any(new != r)

    reach, _ = jax.lax.while_loop(lambda s: s[1], bwd_body,
                                  (roots, jnp.bool_(True)))
    return reach, color


def strongly_connected_components(G):
    """SCC labels; returns ['vertex', 'labels']."""
    g = G.structure
    n = G.number_of_vertices()
    pad_v = g.pad_v

    active = np.zeros(pad_v, dtype=bool)
    active[:n] = True
    scc = np.full(pad_v, -1, dtype=np.int32)

    while active[:n].any():
        confirmed, color = _scc_round(g, jnp.asarray(active))
        confirmed = np.asarray(confirmed) & active
        color = np.asarray(color)
        scc[confirmed] = color[confirmed]
        active &= ~confirmed

    return vertex_frame(G, {"labels": G.number_map.to_external(scc[:n])})


# --------------------------------------------------------------------------
# MIS and vertex coloring
# --------------------------------------------------------------------------

@jax.jit
def _mis_kernel(g: GraphStructure, key: jax.Array, eligible0: jax.Array):
    """Luby's algorithm on the undirected closure (reference mis_impl.cuh:315)."""
    pad_v = g.pad_v

    def nbr_max(vals, neutral):
        # self-loops must NOT count as neighbors: a loop vertex comparing
        # against its own priority could never win and the loop would spin
        # forever
        ga = gather_minor(g.csc, vals)
        ga = jnp.where(g.csc.indices == g.csc.majors, neutral, ga)
        a = segment_reduce_by_major(g.csc, ga, "max")
        gb = gather_minor(g.csr, vals)
        gb = jnp.where(g.csr.indices == g.csr.majors, neutral, gb)
        b = segment_reduce_by_major(g.csr, gb, "max")
        return jnp.maximum(a, b)

    def body(state):
        in_set, eligible, k = state
        k, sub = jax.random.split(k)
        # a random PERMUTATION gives strictly distinct int priorities —
        # no float ties (an f32 epsilon tie-break is below ulp for small
        # ids), so every round makes progress
        pri = jax.random.permutation(sub, pad_v).astype(jnp.int32)
        pri = jnp.where(eligible, pri, -1)
        winner = eligible & (pri > nbr_max(pri, jnp.int32(-1)))
        in_set = in_set | winner
        nbr_win = nbr_max(winner.astype(jnp.int32), jnp.int32(0)) > 0
        eligible = eligible & ~winner & ~nbr_win
        return in_set, eligible, k

    def cond(state):
        _, eligible, _ = state
        return jnp.any(eligible)

    in_set, _, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros(pad_v, dtype=bool), eligible0, key)
    )
    return in_set


def maximal_independent_set(G, seed: int = 0):
    """Returns ['vertex'] rows forming a maximal independent set."""
    g = G.structure
    n = G.number_of_vertices()
    eligible = np.zeros(g.pad_v, dtype=bool)
    eligible[:n] = True
    mis = np.asarray(_mis_kernel(g, jax.random.PRNGKey(seed), jnp.asarray(eligible)))
    verts = np.nonzero(mis[:n])[0]
    return pd.DataFrame({"vertex": G.number_map.to_external(verts)})


def vertex_coloring(G, seed: int = 0, max_colors: int | None = None):
    """Greedy coloring by iterated MIS (reference vertex_coloring_impl.cuh:151).
    Returns ['vertex', 'color'].  When ``max_colors`` caps the MIS loop
    before every vertex is colored, the leftovers carry the sentinel
    color −1 — check for it before using the result as a proper
    coloring (without a cap every vertex gets a color)."""
    g = G.structure
    n = G.number_of_vertices()
    eligible = np.zeros(g.pad_v, dtype=bool)
    eligible[:n] = True
    colors = np.full(g.pad_v, -1, dtype=np.int32)
    key = jax.random.PRNGKey(seed)
    c = 0
    limit = max_colors if max_colors is not None else n
    while eligible[:n].any() and c < limit:
        key, sub = jax.random.split(key)
        mis = np.asarray(_mis_kernel(g, sub, jnp.asarray(eligible)))
        colors[mis & eligible] = c
        eligible &= ~mis
        c += 1
    return vertex_frame(G, {"color": colors[:n]})
