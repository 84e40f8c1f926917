"""DAG: topological sort.

Reference: cpp/src/dag/topological_sort_impl.cuh:39.

TPU design: Kahn levels by dense in-degree peeling — each sweep removes all
current zero-in-degree vertices at once (the reference uses the frontier
prim; the level structure is identical)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from cugraph_tpu.core.structure import GraphStructure
from cugraph_tpu.prims.vertex_edge import gather_minor, segment_reduce_by_major


@jax.jit
def _topo_levels(g: GraphStructure):
    """Per-vertex Kahn level, or -1 if on/behind a cycle."""
    pad_v = g.pad_v
    n = g.num_vertices
    real = jnp.arange(pad_v) < n
    indeg = jnp.where(real, g.csc.degrees(), -1)
    level = jnp.full(pad_v, -1, jnp.int32)

    def body(state):
        indeg, level, lvl = state
        zero = (indeg == 0)
        level = jnp.where(zero, lvl, level)
        # remove: subtract out-edge contributions of removed vertices
        removed_src = gather_minor(g.csc, zero)  # per in-edge: src removed now?
        dec = segment_reduce_by_major(g.csc, removed_src.astype(jnp.int32), "sum")
        indeg = jnp.where(zero, -1, indeg - dec)
        return indeg, level, lvl + 1

    def cond(state):
        indeg, _, lvl = state
        return jnp.any(indeg == 0) & (lvl <= n)

    _, level, _ = jax.lax.while_loop(cond, body, (indeg, level,
                                                  jnp.int32(0)))
    return level


def topological_sort(G):
    """Topological ordering of a DAG; returns DataFrame ['vertex'] in order.
    Raises if the graph has a cycle."""
    if not G.is_directed():
        raise ValueError("topological_sort requires a directed graph")
    n = G.number_of_vertices()
    level = np.asarray(_topo_levels(G.structure))[:n]
    if (level < 0).any():
        raise ValueError("graph contains a cycle")
    order = np.lexsort((np.arange(n), level))
    return pd.DataFrame({"vertex": G.number_map.to_external(order),
                         "level": level[order]})
