"""Minimum / maximum spanning tree (forest).

Reference: legacy cpp/src/tree/legacy/mst.cu (raft MST).

TPU design: Borůvka's algorithm — every component picks its cheapest
outgoing edge, components merge by pointer-jumped label union; O(log V)
rounds of dense segment-min sweeps.  This is the classic parallel-friendly
MST and maps cleanly to segment reductions (no priority queues)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from cugraph_tpu.core.structure import GraphStructure


@jax.jit
def _boruvka(g: GraphStructure):
    """Returns per-edge bool (csr order) marking MST edges."""
    adj = g.csr
    pad_v = g.pad_v
    pad_e = adj.pad_e
    n = g.num_vertices
    ids = jnp.arange(pad_v)
    real_e = adj.majors < n

    comp0 = ids.astype(jnp.int32)
    in_mst0 = jnp.zeros(pad_e, bool)
    BIGW = jnp.float32(3e38)

    # canonical undirected edge key (lo, hi) — the tie-break must be
    # direction-agnostic so that equal-weight hook cycles can only be
    # 2-cycles (Borůvka correctness with consistent tie-breaking); two-level
    # int32 keys avoid int64 (disabled by default in jax)
    lo = jnp.minimum(adj.majors, adj.indices)
    hi = jnp.maximum(adj.majors, adj.indices)

    def body(state):
        comp, in_mst, _ = state
        cs = jnp.take(comp, adj.majors)
        cd = jnp.take(comp, adj.indices)
        cross = (cs != cd) & real_e
        keyw = jnp.where(cross, adj.weights, BIGW)
        BIG = jnp.int32(2 ** 30)
        # per-component cheapest outgoing edge: min weight, then min (lo, hi)
        best_w = jax.ops.segment_min(keyw, cs, num_segments=pad_v)
        is_min_w = cross & (keyw <= jnp.take(best_w, cs))
        best_lo = jax.ops.segment_min(jnp.where(is_min_w, lo, BIG), cs,
                                      num_segments=pad_v)
        is_min_lo = is_min_w & (lo == jnp.take(best_lo, cs))
        best_hi = jax.ops.segment_min(jnp.where(is_min_lo, hi, BIG), cs,
                                      num_segments=pad_v)
        chosen = is_min_lo & (hi == jnp.take(best_hi, cs))
        has = jnp.take(best_hi, ids) < BIG
        in_mst = in_mst | chosen
        # hook: component -> other endpoint's component along its chosen edge
        BIG = jnp.int32(2 ** 30)
        other = jax.ops.segment_min(jnp.where(chosen, cd, BIG), cs,
                                    num_segments=pad_v)
        parent = jnp.where(has, jnp.minimum(other, BIG - 1), ids)
        # break 2-cycles: keep the smaller id as root
        parent2 = jnp.take(parent, parent)
        parent = jnp.where((parent2 == ids) & (parent < ids), ids, parent)
        # pointer jump to full compression
        def jump(_, p):
            return jnp.take(p, p)
        parent = jax.lax.fori_loop(0, 32, jump, parent)
        new_comp = jnp.take(parent, comp)
        changed = jnp.any(new_comp != comp)
        return new_comp, in_mst, changed

    comp, in_mst, _ = jax.lax.while_loop(
        lambda s: s[2], body, (comp0, in_mst0, jnp.bool_(True)))
    return in_mst


def minimum_spanning_tree(G, weight=None, algorithm="boruvka", ignore_nan=False):
    """MST / minimum spanning forest; returns a Graph (reference
    minimum_spanning_tree.pyx → legacy/mst.cu)."""
    if G.is_directed():
        raise ValueError("MST requires an undirected graph")
    g = G.structure
    mask = np.asarray(_boruvka(g))
    E = g.num_edges
    src = np.asarray(g.csr.majors)[:E][mask[:E]]
    dst = np.asarray(g.csr.indices)[:E][mask[:E]]
    w = np.asarray(g.csr.weights)[:E][mask[:E]]
    # each undirected edge may be chosen from either side; dedupe
    lo = np.minimum(src, dst); hi = np.maximum(src, dst)
    key = lo.astype(np.int64) * g.pad_v + hi
    _, idx = np.unique(key, return_index=True)
    from cugraph_tpu.api.graph import Graph
    out = Graph()
    return out.from_edgelist(G.number_map.to_external(lo[idx]),
                             G.number_map.to_external(hi[idx]), w[idx],
                             vertices=G.nodes())


def maximum_spanning_tree(G, weight=None, algorithm="boruvka", ignore_nan=False):
    """Max spanning tree = MST on negated weights."""
    from cugraph_tpu.api.graph import Graph
    if G.is_directed():
        raise ValueError("MST requires an undirected graph")
    src, dst, w = G.edgelist_arrays()
    if w is None:
        w = np.ones(len(src), np.float32)
    neg = Graph().from_edgelist(G.number_map.to_external(src),
                                G.number_map.to_external(dst), -w)
    mst = minimum_spanning_tree(neg)
    el = mst.view_edge_list()
    el["weight"] = -el["weight"].to_numpy()
    out = Graph()
    return out.from_edgelist(el["src"].to_numpy(), el["dst"].to_numpy(),
                             el["weight"].to_numpy(), vertices=G.nodes())
