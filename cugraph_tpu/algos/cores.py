"""Cores: core number (k-core decomposition) and k-core subgraph extraction.

Reference: cpp/src/cores/{core_number_impl.cuh:59, k_core_impl.cuh:23}.

TPU design: the reference peels vertices bucket-by-bucket with frontier
machinery (data-dependent worklists).  Here core numbers come from the
h-index fixpoint iteration (Lü et al., "The H-index of a network node",
Nature Physics 2016): c0 = degree; c_{t+1}[v] = H({c_t[u] : u ∈ N(v)})
converges exactly to coreness.  Each H evaluation is a per-vertex binary
search on h answered by dense masked edge sweeps — O(E·log(dmax)) per round,
all static shapes, no sorting.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from cugraph_tpu.algos._utils import vertex_frame
from cugraph_tpu.core.structure import GraphStructure
from cugraph_tpu.prims.vertex_edge import gather_minor, segment_reduce_by_major


@partial(jax.jit, static_argnames=("use_out", "use_in"))
def _core_number_kernel(g: GraphStructure, use_out: bool = True,
                        use_in: bool = False):
    """Core numbers over the selected adjacency direction(s): out (csr),
    in (csc), or both ("bidirectional" counts in+out like the reference)."""
    pad_v = g.pad_v
    n = g.num_vertices
    real = jnp.arange(pad_v) < n
    deg = jnp.zeros(pad_v, jnp.int32)
    if use_out:
        deg = deg + (g.csr.offsets[1:] - g.csr.offsets[:-1]).astype(jnp.int32)
    if use_in:
        deg = deg + (g.csc.offsets[1:] - g.csc.offsets[:-1]).astype(jnp.int32)
    c0 = jnp.where(real, deg, 0)

    def count_ge(adj, c, h):
        ge = (gather_minor(adj, c) >= jnp.take(h, adj.majors)).astype(jnp.int32)
        valid = adj.majors < n
        return segment_reduce_by_major(adj, jnp.where(valid, ge, 0))

    def h_index(c):
        lo = jnp.zeros(pad_v, jnp.int32)
        hi = deg

        def body(_, state):
            lo, hi = state
            mid = (lo + hi + 1) >> 1
            cnt = jnp.zeros(pad_v, jnp.int32)
            if use_out:
                cnt = cnt + count_ge(g.csr, c, mid)
            if use_in:
                cnt = cnt + count_ge(g.csc, c, mid)
            ok = cnt >= mid
            active = lo < hi
            lo = jnp.where(active & ok, mid, lo)
            hi = jnp.where(active & ~ok, mid - 1, hi)
            return lo, hi

        lo, _ = jax.lax.fori_loop(0, 32, body, (lo, hi))
        return lo

    def step(state):
        c, _ = state
        new = jnp.minimum(c, h_index(c))
        return new, jnp.any(new != c)

    c, _ = jax.lax.while_loop(lambda s: s[1], step, (c0, jnp.bool_(True)))
    return jnp.where(real, c, 0)


@partial(jax.jit, static_argnames=("interpret",))
def _core_number_kernel_pallas(plan, n: jax.Array, interpret: bool = False):
    """k-core peeling with one counting SpMV per removal sweep (the classic
    peel, reference core_number_impl.cuh:59, but each "count alive
    neighbors" pass is a dense one-hot MXU product).  0/1 values are exact
    in bf16 and the matmuls accumulate in f32, so counts are exact."""
    from cugraph_tpu.kernels.spmv_onehot import spmv_onehot

    pad_v = plan.pad_v
    ids = jnp.arange(pad_v)
    real = ids < n

    def count_alive(alive):
        y = spmv_onehot(plan, alive.astype(jnp.float32), reduce="sum",
                        combine="left", interpret=interpret)
        return jnp.where(real, y, 0.0)

    def inner(state):
        alive, core, k, _ = state
        cnt = count_alive(alive)
        drop = alive & (cnt < k.astype(jnp.float32) - 0.5)
        core = jnp.where(drop, k - 1, core)
        return alive & ~drop, core, k, jnp.any(drop)

    def outer(state):
        alive, core, k = state
        alive, core, _, _ = jax.lax.while_loop(
            lambda s: s[3], inner, (alive, core, k, jnp.bool_(True)))
        return alive, core, k + 1

    alive, core, _ = jax.lax.while_loop(
        lambda s: jnp.any(s[0]), outer,
        (real, jnp.zeros(pad_v, jnp.int32), jnp.int32(1)))
    return core


def _core_number_native(G, degree_type: str):
    """Native exact peel over host CSR copies.  Adjacency choice per
    degree_type: removing v must decrement the chosen degree of the right
    neighbors — for "incoming" that's v's OUT-neighbors, for "outgoing" its
    IN-neighbors, for bidirectional both (undirected storage already holds
    both directions).  Returns core int32[pad] or None (no toolchain /
    multigraph)."""
    from cugraph_tpu.core.native import core_number_peel_native, get_lib

    if get_lib() is None or getattr(G, "_multi", False):
        return None
    g = G.structure
    csr_off = np.asarray(g.csr.offsets).astype(np.int64)
    csr_adj = np.asarray(g.csr.indices)
    n = g.num_vertices
    E = int(csr_off[n])
    if not G.is_directed():
        row_off = csr_off[: n + 1]
        adj = csr_adj[:E]
        deg = np.diff(row_off)
        return core_number_peel_native(row_off, adj, deg)
    csc_off = np.asarray(g.csc.offsets).astype(np.int64)
    csc_adj = np.asarray(g.csc.indices)
    out_deg = np.diff(csr_off[: n + 1])
    in_deg = np.diff(csc_off[: n + 1])
    if degree_type == "incoming":
        return core_number_peel_native(csr_off[: n + 1], csr_adj[:E], in_deg)
    if degree_type == "outgoing":
        return core_number_peel_native(csc_off[: n + 1], csc_adj[:E],
                                       out_deg)
    # bidirectional: interleave out- and in-adjacency per vertex (entries
    # may repeat for reciprocated pairs — the reference's doubling)
    deg = out_deg + in_deg
    row_off = np.zeros(n + 1, np.int64)
    np.cumsum(deg, out=row_off[1:])
    adj = np.empty(int(row_off[-1]), np.int32)
    for_src = csr_adj[:E]
    for_dst = csc_adj[:E]
    # vectorized interleave: out-entries first within each row, then in
    pos_out = row_off[:-1]
    idx_out = np.repeat(pos_out, out_deg) + (
        np.arange(E) - np.repeat(csr_off[:n], out_deg))
    adj[idx_out] = for_src
    pos_in = row_off[:-1] + out_deg
    idx_in = np.repeat(pos_in, in_deg) + (
        np.arange(E) - np.repeat(csc_off[:n], in_deg))
    adj[idx_in] = for_dst
    return core_number_peel_native(row_off, adj, deg)


def core_number(G, degree_type: str = "bidirectional"):
    """Core number per vertex; returns ['vertex', 'core_number'].

    Like the reference (core_number_impl.cuh), the graph is expected to be
    undirected (symmetric); ``degree_type`` is accepted for API parity.
    """
    if degree_type not in ("bidirectional", "incoming", "outgoing"):
        raise ValueError(f"invalid degree_type {degree_type!r}")
    from cugraph_tpu.kernels.dispatch import (get_pull_plan, get_push_plan,
                                              get_sym_pull_plan, use_pallas)

    n = G.number_of_vertices()

    # exact O(V+E) host peel (Batagelj–Zaversnik) — beats both the XLA
    # h-index fixpoint and the Pallas peel (RMAT-18: ~1 s vs 11.5 s)
    c = _core_number_native(G, degree_type)
    if c is not None:
        return vertex_frame(G, {"core_number": c[:n]})
    if use_pallas(G):
        # the peel counts ALIVE NEIGHBORS in the selected direction(s) with
        # one combine="left" SpMV per sweep; the plan picks the direction:
        # undirected storage already holds both directions (pull plan);
        # directed bidirectional peels the symmetrized plan (in+out counts,
        # doubling on symmetric inputs exactly like the reference)
        if not G.is_directed():
            plan = get_pull_plan(G)
        elif degree_type == "bidirectional":
            plan = get_sym_pull_plan(G)
        elif degree_type == "incoming":
            plan = get_pull_plan(G)
        else:
            plan = get_push_plan(G)
        c = np.asarray(_core_number_kernel_pallas(plan, jnp.int32(n)))[:n]
        return vertex_frame(G, {"core_number": c})
    g = G.structure
    if not G.is_directed():
        # symmetrized storage already holds both directions: every
        # degree_type reduces to the classic undirected core number
        # (networkx semantics; note the reference's bidirectional doubles
        # counts on symmetric inputs instead)
        use_out, use_in = True, False
    else:
        use_out = degree_type in ("outgoing", "bidirectional")
        use_in = degree_type in ("incoming", "bidirectional")
    c = np.asarray(_core_number_kernel(g, use_out, use_in))[
        : G.number_of_vertices()]
    return vertex_frame(G, {"core_number": c})


def k_core(G, k=None, core_number_df=None, degree_type: str = "bidirectional"):
    """Extract the k-core subgraph (reference k_core_impl.cuh:23).
    Returns a new Graph on the vertices with core_number >= k.

    Every qualifying VERTEX is part of the result even when none of its
    edges survive the filter (the reference rebuilds from the edge list
    alone, k_core.py:127-138, silently dropping such vertices; by the
    k-core definition they belong — e.g. every isolated vertex at k=0)."""
    df = core_number_df if core_number_df is not None else core_number(G, degree_type)
    if k is None:
        k = int(df["core_number"].max())
    # core values indexed by INTERNAL id for vectorized edge filtering
    core_arr = np.zeros(G.number_of_vertices(), np.int64)
    core_arr[G.lookup_internal_vertex_id(df["vertex"].to_numpy())] = \
        df["core_number"].to_numpy()
    src, dst, w = G.edgelist_arrays()
    keep = (core_arr[src] >= k) & (core_arr[dst] >= k)
    verts = df["vertex"].to_numpy()[df["core_number"].to_numpy() >= k]
    from cugraph_tpu.api.graph import Graph
    out = Graph(directed=G.is_directed())
    out.from_edgelist(G.number_map.to_external(src[keep]),
                      G.number_map.to_external(dst[keep]),
                      None if w is None else w[keep],
                      vertices=np.sort(verts))
    return out
