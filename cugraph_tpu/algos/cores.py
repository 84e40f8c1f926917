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

import jax
import jax.numpy as jnp
import numpy as np

from cugraph_tpu.algos._utils import vertex_frame
from cugraph_tpu.core.structure import GraphStructure
from cugraph_tpu.prims.vertex_edge import gather_minor, segment_reduce_by_major


@jax.jit
def _core_number_kernel(g: GraphStructure):
    """Undirected ("bidirectional" in reference terms) core numbers over the
    out-adjacency of the symmetrized graph."""
    adj = g.csr
    pad_v = g.pad_v
    n = g.num_vertices
    real = jnp.arange(pad_v) < n
    deg = (adj.offsets[1:] - adj.offsets[:-1]).astype(jnp.int32)
    c0 = jnp.where(real, deg, 0)

    def h_index(c):
        """H({c[u] : u in N(v)}) per v, via binary search on h:
        largest h with |{u in N(v): c[u] >= h}| >= h."""
        lo = jnp.zeros(pad_v, jnp.int32)
        hi = deg  # h can never exceed degree

        def body(_, state):
            lo, hi = state
            mid = (lo + hi + 1) >> 1  # upper-mid so lo strictly increases
            ge = (gather_minor(adj, c) >= jnp.take(mid, adj.majors)).astype(jnp.int32)
            cnt = segment_reduce_by_major(adj, ge, "sum")
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


def core_number(G, degree_type: str = "bidirectional"):
    """Core number per vertex; returns ['vertex', 'core_number'].

    Like the reference (core_number_impl.cuh), the graph is expected to be
    undirected (symmetric); ``degree_type`` is accepted for API parity.
    """
    if degree_type not in ("bidirectional", "incoming", "outgoing"):
        raise ValueError(f"invalid degree_type {degree_type!r}")
    g = G.structure
    c = np.asarray(_core_number_kernel(g))[: G.number_of_vertices()]
    return vertex_frame(G, {"core_number": c})


def k_core(G, k=None, core_number_df=None, degree_type: str = "bidirectional"):
    """Extract the k-core subgraph (reference k_core_impl.cuh:23).
    Returns a new Graph on the vertices with core_number >= k."""
    df = core_number_df if core_number_df is not None else core_number(G, degree_type)
    cn = dict(zip(df["vertex"], df["core_number"]))
    if k is None:
        k = int(df["core_number"].max())
    src, dst, w = G.edgelist_arrays()
    ext_src = G.number_map.to_external(src)
    ext_dst = G.number_map.to_external(dst)
    keep = np.array([cn[s] >= k and cn[d] >= k for s, d in zip(ext_src, ext_dst)])
    from cugraph_tpu.api.graph import Graph
    out = Graph(directed=G.is_directed())
    if keep.any():
        out.from_edgelist(ext_src[keep], ext_dst[keep],
                          None if w is None else w[keep])
    else:
        out.from_edgelist(np.array([], dtype=ext_src.dtype),
                          np.array([], dtype=ext_dst.dtype), None,
                          vertices=np.array([v for v in cn if cn[v] >= k]))
    return out
