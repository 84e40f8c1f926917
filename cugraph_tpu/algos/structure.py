"""Structure transforms: symmetrize, induced subgraph, two-hop neighbors, etc.

Reference: cpp/include/cugraph/graph_functions.hpp:366-1144 and
cpp/src/structure/{induced_subgraph_impl.cuh, ...}; python wrappers in
python/cugraph/cugraph/structure/.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def symmetrize(df_or_src, dst=None, weight=None, src_name="src", dst_name="dst", value_col=None):
    """Symmetrize an edge list (reference symmetrize.py /
    symmetrize_graph_impl.cuh).  Accepts arrays or a DataFrame."""
    from cugraph_tpu.core.preprocess import symmetrize_edgelist
    if isinstance(df_or_src, pd.DataFrame):
        from cugraph_tpu.api.graph import Graph

        src = df_or_src[src_name].to_numpy()
        d = df_or_src[dst_name].to_numpy()
        if value_col is not None:
            w = df_or_src[value_col].to_numpy()
        else:
            # only a CONVENTIONALLY-named column is a weight — consuming an
            # arbitrary leftover column (edge types, timestamps) would
            # silently min-coalesce it as weights (same rule as
            # Graph.from_edgelist)
            wcols = [c for c in df_or_src.columns
                     if c not in (src_name, dst_name)
                     and str(c).lower() in Graph._WEIGHT_COL_NAMES]
            w = df_or_src[wcols[0]].to_numpy() if len(wcols) == 1 else None
    else:
        src, d, w = np.asarray(df_or_src), np.asarray(dst), weight
    # external ids may be non-dense: renumber through factorize
    uniq, inv = np.unique(np.concatenate([src, d]), return_inverse=True)
    e = len(src)
    s2, d2, w2 = symmetrize_edgelist(inv[:e].astype(np.int64),
                                     inv[e:].astype(np.int64),
                                     None if w is None else np.asarray(w))
    if not isinstance(df_or_src, pd.DataFrame):
        # column input → column tuple, the reference symmetrize() contract
        # (symmetrize.py:262 returns (src, dst[, value]); the DataFrame
        # branch above mirrors symmetrize_df)
        if w2 is not None:
            return uniq[s2], uniq[d2], w2
        return uniq[s2], uniq[d2]
    out = {src_name: uniq[s2], dst_name: uniq[d2]}
    if w2 is not None:
        out["weight"] = w2
    return pd.DataFrame(out)


def induced_subgraph(G, vertices):
    """Edges of the subgraph induced by ``vertices`` (reference
    induced_subgraph_impl.cuh).  Returns (DataFrame ['src','dst','weight'],
    offsets)."""
    ids = G.lookup_internal_vertex_id(np.asarray(vertices))
    src, dst, w = G.edgelist_arrays()
    keep = np.isin(src, ids) & np.isin(dst, ids)  # vectorized, dtype-safe
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


# --------------------------------------------------------------------------
# Structure utilities rounding out the reference surface
# (graph_functions.hpp:366-1144; pylibcugraph decompress_to_edgelist.pyx,
#  replicate_edgelist.pyx, select_random_vertices.pyx, extract_vertex_list.pyx,
#  count_multi_edges.pyx, renumber_arbitrary_edgelist.pyx)
# --------------------------------------------------------------------------

def decompress_to_edgelist(G) -> pd.DataFrame:
    """Graph → COO edge frame in external ids (graph_functions.hpp:366)."""
    src, dst, w = G.edgelist_arrays()
    nm = G.number_map
    out = {"src": nm.to_external(src), "dst": nm.to_external(dst)}
    if w is not None:
        out["weight"] = w
    if G.edge_ids is not None:
        out["edge_id"] = G.edge_ids
    if G.edge_types is not None:
        out["edge_type"] = G.edge_types
    return pd.DataFrame(out)


def replicate_edgelist(G) -> pd.DataFrame:
    """SG no-op copy of the edge list (the MG version allgathers it —
    c_api/allgather.cpp; on a mesh use parallel.mesh.shard_dist_graph's
    gathered arrays)."""
    return decompress_to_edgelist(G)


def select_random_vertices(G, num_vertices: int, random_state=None) -> np.ndarray:
    """Uniform sample of distinct vertices (select_random_vertices_impl.hpp)."""
    n = G.number_of_vertices()
    if num_vertices > n:
        raise ValueError("cannot select more vertices than the graph has")
    rng = np.random.default_rng(random_state)
    ids = rng.choice(n, size=num_vertices, replace=False).astype(np.int32)
    return G.number_map.to_external(ids)


def extract_vertex_list(G) -> np.ndarray:
    """All vertex ids, external (extract_vertex_list.pyx)."""
    return G.nodes()


def count_multi_edges(G) -> int:
    """Number of edges beyond the first of each parallel group
    (graph_view count_multi_edges / count_multi_edges.pyx)."""
    src, dst, _ = G.edgelist_arrays()
    key = src.astype(np.int64) << 32 | dst.astype(np.uint32).astype(np.int64)
    return int(len(key) - len(np.unique(key)))


def renumber_arbitrary_edgelist(src, dst):
    """Renumber an edge list with arbitrary (possibly 64-bit) ids to dense
    int32 (renumber_arbitrary_edgelist.pyx).  Returns (src32, dst32, map)."""
    from cugraph_tpu.core import native

    res = native.renumber_native(np.asarray(src, np.int64),
                                 np.asarray(dst, np.int64))
    if res is not None:
        uniq, s32, d32 = res
        return s32, d32, uniq
    from cugraph_tpu.core.renumber import renumber_edgelist

    s32, d32, nmap = renumber_edgelist(np.asarray(src), np.asarray(dst),
                                       sort_by_degree=False)
    return s32, d32, nmap._i2e


# -- weight utilities (structure/graph_weight_utils_impl.cuh) ----------------

def out_weight_sums(G) -> np.ndarray:
    # host bincount over the COO: the device path would force a structure
    # build + a scalarizing segment_sum + a tunnel transfer for a quantity
    # that is one O(E) host pass
    src, _, w = G.edgelist_arrays()
    n = G.number_of_vertices()
    if w is None:
        w = np.ones(len(src), np.float32)
    return np.bincount(src, weights=w, minlength=n)[:n].astype(np.float32)


def in_weight_sums(G) -> np.ndarray:
    _, dst, w = G.edgelist_arrays()
    n = G.number_of_vertices()
    if w is None:
        w = np.ones(len(dst), np.float32)
    return np.bincount(dst, weights=w, minlength=n)[:n].astype(np.float32)


def total_edge_weight(G) -> float:
    _, _, w = G.edgelist_arrays()
    if w is None:
        return float(G.number_of_edges())
    return float(np.sum(w))


# -- hypergraph construction (python-only in the reference:
#    python/cugraph/cugraph/structure/hypergraph.py) -------------------------

def hypergraph(df: pd.DataFrame, columns=None, *, categorical_metadata=True,
               drop_edge_attrs=False, direct: bool = False):
    """Build a bipartite (entity, row-node) — or direct entity–entity — graph
    from a DataFrame's categorical columns.  Returns (nodes_df, edges_df, G).
    """
    from cugraph_tpu.api.graph import Graph

    if columns is None:
        columns = [c for c in df.columns]
    ents = []
    for c in columns:
        vals = df[c].astype(str)
        ents.append(c + "::" + vals)
    if direct:
        if len(columns) < 2:
            raise ValueError("direct hypergraph needs at least two columns")
        # clique among the entity nodes of each row
        srcs, dsts = [], []
        for i in range(len(columns)):
            for j in range(i + 1, len(columns)):
                srcs.append(ents[i]); dsts.append(ents[j])
        edges = pd.DataFrame({"src": pd.concat(srcs, ignore_index=True),
                              "dst": pd.concat(dsts, ignore_index=True)})
    else:
        row_nodes = pd.Series([f"rownode::{i}" for i in range(len(df))])
        srcs = [pd.Series(row_nodes) for _ in columns]
        edges = pd.DataFrame({"src": pd.concat(srcs, ignore_index=True),
                              "dst": pd.concat(ents, ignore_index=True)})
    nodes = pd.DataFrame({"node": pd.unique(
        pd.concat([edges["src"], edges["dst"]], ignore_index=True))})
    G = Graph()
    G.from_edgelist(edges["src"].to_numpy(), edges["dst"].to_numpy(), None)
    return nodes, edges, G
