"""Structure transforms: symmetrize, induced subgraph, two-hop neighbors, etc.

Reference: cpp/include/cugraph/graph_functions.hpp:366-1144 and
cpp/src/structure/{induced_subgraph_impl.cuh, ...}; python wrappers in
python/cugraph/cugraph/structure/.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def symmetrize(df_or_src, dst=None, weight=None, src_name="src", dst_name="dst"):
    """Symmetrize an edge list (reference symmetrize.py /
    symmetrize_graph_impl.cuh).  Accepts arrays or a DataFrame."""
    from cugraph_tpu.core.preprocess import symmetrize_edgelist
    if isinstance(df_or_src, pd.DataFrame):
        src = df_or_src[src_name].to_numpy()
        d = df_or_src[dst_name].to_numpy()
        wcols = [c for c in df_or_src.columns if c not in (src_name, dst_name)]
        w = df_or_src[wcols[0]].to_numpy() if wcols else None
    else:
        src, d, w = np.asarray(df_or_src), np.asarray(dst), weight
    # external ids may be non-dense: renumber through factorize
    uniq, inv = np.unique(np.concatenate([src, d]), return_inverse=True)
    e = len(src)
    s2, d2, w2 = symmetrize_edgelist(inv[:e].astype(np.int64),
                                     inv[e:].astype(np.int64),
                                     None if w is None else np.asarray(w))
    out = {src_name: uniq[s2], dst_name: uniq[d2]}
    if w2 is not None:
        out["weight"] = w2
    return pd.DataFrame(out)


def induced_subgraph(G, vertices):
    """Edges of the subgraph induced by ``vertices`` (reference
    induced_subgraph_impl.cuh).  Returns (DataFrame ['src','dst','weight'],
    offsets)."""
    ids = set(G.lookup_internal_vertex_id(np.asarray(vertices)).tolist())
    src, dst, w = G.edgelist_arrays()
    keep = np.array([s in ids and d in ids for s, d in zip(src, dst)])
    if not G.is_directed():
        keep &= src <= dst
    out = pd.DataFrame({
        "src": G.number_map.to_external(src[keep]),
        "dst": G.number_map.to_external(dst[keep]),
        "weight": (w[keep] if w is not None
                   else np.ones(int(keep.sum()), np.float32)),
    })
    return out, np.array([0, len(out)])


def subgraph(G, vertices):
    """Induced subgraph as a new Graph (reference cugraph.subgraph)."""
    from cugraph_tpu.api.graph import Graph
    df, _ = induced_subgraph(G, vertices)
    out = Graph(directed=G.is_directed())
    return out.from_edgelist(df["src"].to_numpy(), df["dst"].to_numpy(),
                             df["weight"].to_numpy(),
                             vertices=np.asarray(vertices))


def two_hop_neighbors(G):
    """All (first, second) pairs connected by a path of length two
    (reference c_api/graph_functions.cpp:85 get_two_hop_neighbors).
    Returns DataFrame ['first', 'second']."""
    import scipy.sparse as sp
    src, dst, _ = G.edgelist_arrays()
    n = G.number_of_vertices()
    A = sp.csr_matrix((np.ones(len(src)), (src, dst)), shape=(n, n))
    P = (A @ A).tocoo()
    mask = P.row != P.col
    first, second = P.row[mask], P.col[mask]
    if not G.is_directed():
        keep = first < second
        first, second = first[keep], second[keep]
    return pd.DataFrame({
        "first": G.number_map.to_external(first.astype(np.int64)),
        "second": G.number_map.to_external(second.astype(np.int64)),
    })


def k_hop_neighbors(G, start, k):
    from cugraph_tpu.algos.traversal import k_hop_neighbors as _khop
    return _khop(G, start, k)
