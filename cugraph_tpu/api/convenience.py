"""Top-level convenience surface mirroring cugraph's module-level helpers.

Reference: python/cugraph/cugraph/__init__.py exports — matrix/DataFrame
constructors (structure/convert_matrix.py), NetworkX-compatible aliases
(traversal/bfs.py:199 bfs_edges, traversal/sssp.py:263 shortest_path,
community/egonet.py:30 ego_graph), multi-source BFS
(traversal/ms_bfs.py:97,172), predicate helpers, and the unified
{homogeneous,heterogeneous}_neighbor_sample entry points
(sampling/homogeneous_neighbor_sample.py:44).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


# --------------------------------------------------------------------------
# constructors (structure/convert_matrix.py)
# --------------------------------------------------------------------------

def _new(create_using):
    from cugraph_tpu.api.graph import Graph

    if create_using is None:
        return Graph()
    if isinstance(create_using, type):
        return create_using()
    if hasattr(create_using, "number_of_vertices"):
        # an instance: use a fresh graph of the same directedness
        return type(create_using)(directed=create_using.is_directed())
    return Graph()


def from_edgelist(df, source="source", destination="destination",
                  edge_attr=None, create_using=None, renumber=True):
    """cugraph.from_edgelist (convert_matrix.py:20)."""
    G = _new(create_using)
    w = df[edge_attr].to_numpy(np.float32) if edge_attr else None
    G.from_edgelist(df[source].to_numpy(), df[destination].to_numpy(), w,
                    renumber=renumber)
    return G


def from_pandas_edgelist(df, source="source", destination="destination",
                         edge_attr=None, create_using=None, renumber=True):
    return from_edgelist(df, source, destination, edge_attr, create_using,
                         renumber)


def from_cudf_edgelist(df, source="source", destination="destination",
                       edge_attr=None, create_using=None, renumber=True):
    """cudf frames do not exist here; accepts any DataFrame-like."""
    return from_edgelist(df, source, destination, edge_attr, create_using,
                         renumber)


def from_adjlist(offsets, indices, values=None, create_using=None):
    """cugraph.from_adjlist (convert_matrix.py:111): CSR arrays → Graph."""
    offsets = np.asarray(offsets)
    indices = np.asarray(indices)
    deg = np.diff(offsets)
    src = np.repeat(np.arange(len(deg)), deg)
    G = _new(create_using)
    # the CSR names every row as a vertex — zero-degree rows must survive
    # (renumbering from edges alone dropped them; round-5 review finding)
    G.from_edgelist(src, indices,
                    None if values is None else np.asarray(values, np.float32),
                    vertices=np.arange(len(deg)))
    return G


def from_numpy_array(A, create_using=None, vertices=None):
    """cugraph.from_numpy_array (convert_matrix.py:435) — matrix values
    always become edge weights, matching Graph.from_numpy_array
    (graph_classes.py:518-528)."""
    G = _new(create_using)
    G.from_numpy_array(np.asarray(A), nodes=vertices)
    return G


def from_numpy_matrix(A, create_using=None):
    return from_numpy_array(A, create_using)


def from_pandas_adjacency(df, create_using=None):
    """cugraph.from_pandas_adjacency: labeled dense adjacency → Graph."""
    return from_numpy_array(df.to_numpy(), create_using,
                            vertices=np.asarray(df.columns))


# --------------------------------------------------------------------------
# exporters
# --------------------------------------------------------------------------

def to_pandas_edgelist(G, source="src", destination="dst",
                       weight="weights"):
    """cugraph.to_pandas_edgelist."""
    el = G.view_edge_list()
    out = pd.DataFrame({source: el["src"], destination: el["dst"]})
    if "weight" in el.columns:
        out[weight] = el["weight"]
    return out


def to_numpy_array(G, nodelist=None, dtype=np.float32):
    """cugraph.to_numpy_array: dense adjacency in nodelist order."""
    el = G.view_edge_list()
    if nodelist is None:
        nodelist = np.unique(np.concatenate([el["src"], el["dst"]]))
    pos = {int(v): i for i, v in enumerate(nodelist)}
    n = len(nodelist)
    A = np.zeros((n, n), dtype)
    w = el["weight"].to_numpy() if "weight" in el.columns else \
        np.ones(len(el), dtype)
    for s, d, ww in zip(el["src"], el["dst"], w):
        A[pos[int(s)], pos[int(d)]] = ww
        if not G.is_directed():
            A[pos[int(d)], pos[int(s)]] = ww
    return A


def to_numpy_matrix(G, nodelist=None, dtype=np.float32):
    return np.asmatrix(to_numpy_array(G, nodelist, dtype))


def to_pandas_adjacency(G, nodelist=None, dtype=np.float32):
    el = G.view_edge_list()
    if nodelist is None:
        nodelist = np.unique(np.concatenate([el["src"], el["dst"]]))
    A = to_numpy_array(G, nodelist, dtype)
    return pd.DataFrame(A, index=nodelist, columns=nodelist)


# --------------------------------------------------------------------------
# predicates (module-level, NetworkX style)
# --------------------------------------------------------------------------

def is_directed(G):
    return G.is_directed()


def is_weighted(G):
    return G.is_weighted()


def is_multigraph(G):
    return getattr(G, "is_multigraph", lambda: False)()


def is_bipartite(G):
    return getattr(G, "is_bipartite", lambda: False)()


def is_multipartite(G):
    return getattr(G, "is_multipartite", lambda: False)()


# --------------------------------------------------------------------------
# traversal aliases + multi-source BFS (traversal/{bfs,ms_bfs,sssp}.py)
# --------------------------------------------------------------------------

def bfs_edges(G, source, reverse=False, depth_limit=None,
              sort_neighbors=None):
    """cugraph.bfs_edges (bfs.py:199) — BFS alias; `reverse` and
    `sort_neighbors` are unimplemented in the reference too."""
    if reverse or sort_neighbors is not None:
        raise NotImplementedError("reverse/sort_neighbors not supported "
                                  "(matching the reference)")
    from cugraph_tpu.algos.traversal import bfs

    return bfs(G, source, depth_limit=depth_limit)


# above this many directed edges the [·,128] panel SpMM plan fragments
# (RMAT-20: 4.5%-full subtiles, padding factor 28.5 vs the SpMV plan's
# 1.07) and the serial-keys device loop is faster — measured 3.2× at
# RMAT-20, while the panel wins ~10× at RMAT-18; threshold = the geometric
# midpoint of those anchors (benchmarks/graph500_bfs.py --device/--batched)
_MSBFS_SERIAL_EDGES = 16_000_000


def multi_source_bfs(G, sources, components=None, depth_limit=None,
                     offload=False, strategy: str = "auto"):
    """cugraph.multi_source_bfs (ms_bfs.py:172 — a placeholder raising
    NotImplementedError in the reference; implemented here).  Sources run
    in ONE device dispatch per 128-wide group, either as a batched SpMM
    panel (one masked SpMM per level for the whole panel, the
    Brandes-forward design in algos/centrality.py) or as a device-resident
    serial loop of SpMV level sweeps (faster on large graphs, where the
    panel plan fragments — see ``strategy``); predecessors are recovered
    host-side from the distance panels (any in-neighbor one level up — the
    BFS convention).  ``strategy``: "auto" (measured-crossover dispatch),
    "panel", or "serial".  Returns ['vertex', 'distance_<s>',
    'predecessor_<s>', ...]."""
    if offload:
        raise NotImplementedError("offload not supported")
    import jax.numpy as jnp
    import pandas as pd

    from cugraph_tpu.algos._utils import (normalize_start, source_panels,
                                          unrenumber_column)
    from cugraph_tpu.algos.traversal import (INT32_INF, _msbfs_dist_batched,
                                             _msbfs_dist_batched_pallas,
                                             _msbfs_dist_serial_device)
    from cugraph_tpu.kernels.dispatch import get_pull_plan, use_pallas

    if strategy not in ("auto", "panel", "serial"):
        raise ValueError(f"unknown multi_source_bfs strategy {strategy!r}")
    sources = np.asarray(sources).reshape(-1)
    s_int = normalize_start(G, sources)
    n = G.number_of_vertices()
    g = G.structure
    src_i, dst_i, _ = G.edgelist_arrays()
    fast = use_pallas(G)
    serial = fast and (strategy == "serial" or (
        strategy == "auto" and g.csr.num_edges > _MSBFS_SERIAL_EDGES))
    if fast:
        if serial:
            pull_plan = get_pull_plan(G)
        else:
            from cugraph_tpu.algos.centrality import _get_brandes_spmm_plan

            pull_plan = _get_brandes_spmm_plan(G, "pull")
    dl = None if depth_limit is None else int(depth_limit)
    out = {"vertex": G.number_map.to_external(np.arange(n))}
    for panel, i, count in source_panels(s_int):
        if serial:
            dist = np.asarray(_msbfs_dist_serial_device(
                pull_plan, jnp.asarray(panel), n))
        elif fast:
            dist = np.asarray(_msbfs_dist_batched_pallas(
                pull_plan, jnp.asarray(panel), n))
        else:
            dist = np.asarray(_msbfs_dist_batched(g, jnp.asarray(panel), n))
        for b in range(count):
            db = dist[:, b].astype(np.int64)
            if dl is not None:
                db = np.where(db > dl, -1, db)
            ok = (db[src_i] >= 0) & (db[src_i] + 1 == db[dst_i])
            pred = np.full(n, -1, np.int64)
            pred[dst_i[ok]] = src_i[ok]
            s_ext = int(sources[i + b])
            out[f"distance_{s_ext}"] = np.where(
                db[:n] < 0, INT32_INF, db[:n]).astype(np.int32)
            out[f"predecessor_{s_ext}"] = unrenumber_column(G, pred)
    return pd.DataFrame(out)


def concurrent_bfs(Graphs, sources, depth_limit=None, offload=False):
    """cugraph.concurrent_bfs (ms_bfs.py:97): multi_source_bfs over a list
    of graphs.  Returns a list of frames, one per graph."""
    if len(Graphs) != len(sources):
        raise ValueError("Graphs and sources must have the same length")
    return [multi_source_bfs(g, s, depth_limit=depth_limit, offload=offload)
            for g, s in zip(Graphs, sources)]


def shortest_path(G, source=None, method=None, directed=None,
                  return_predecessors=None, unweighted=None, overwrite=None,
                  indices=None):
    """Alias for sssp() (sssp.py:263, NetworkX compatibility)."""
    from cugraph_tpu.algos.traversal import sssp

    if source is None and indices is not None:
        source = indices
    return sssp(G, source)


def ego_graph(G, n, radius=1, center=True, undirected=None, distance=None):
    """cugraph.ego_graph (community/egonet.py:30): the induced subgraph of
    vertices within `radius` of n, returned as a Graph."""
    from cugraph_tpu.algos.community import batched_ego_graphs

    df, offsets = batched_ego_graphs(G, np.asarray([n]), radius)
    out = _new(G)   # instance form: preserves the source graph's directedness
    if len(df) == 0:
        # isolated center: a graph holding just the vertex, no edges
        out.from_edgelist(np.asarray([], dtype=np.int64),
                          np.asarray([], dtype=np.int64), None,
                          vertices=np.asarray([n]))
        return out
    w = df["weight"].to_numpy(np.float32) if "weight" in df else None
    out.from_edgelist(df["src"].to_numpy(), df["dst"].to_numpy(), w)
    return out


# --------------------------------------------------------------------------
# unified sampling entry points (sampling/homogeneous_neighbor_sample.py:44)
# --------------------------------------------------------------------------

def homogeneous_neighbor_sample(G, start_list, starting_vertex_label_offsets=None,
                                fanout_vals=None, *, with_replacement=True,
                                with_biases=False, random_state=None, **kw):
    from cugraph_tpu.algos import sampling as S

    fn = (S.homogeneous_biased_neighbor_sample if with_biases
          else S.homogeneous_uniform_neighbor_sample)
    return fn(G, start_list, fanout_vals,
              with_replacement=with_replacement, random_state=random_state,
              **kw)


def heterogeneous_neighbor_sample(G, start_list, starting_vertex_label_offsets=None,
                                  fanout_vals=None, *, num_edge_types=1,
                                  with_replacement=True, with_biases=False,
                                  random_state=None, **kw):
    from cugraph_tpu.algos import sampling as S

    fn = (S.heterogeneous_biased_neighbor_sample if with_biases
          else S.heterogeneous_uniform_neighbor_sample)
    return fn(G, start_list, fanout_vals, num_edge_types=num_edge_types,
              with_replacement=with_replacement, random_state=random_state,
              **kw)


def symmetrize_df(df, src_name="src", dst_name="dst", weight_name=None,
                  multi=False, symmetrize=True):
    """cugraph.symmetrize_df (structure/symmetrize.py)."""
    from cugraph_tpu.algos.structure import symmetrize as _sym

    if not symmetrize:
        return df
    return _sym(df, src_name=src_name, dst_name=dst_name,
                value_col=weight_name)


def symmetrize_ddf(df, src_name="src", dst_name="dst", weight_name=None,
                   multi=False, symmetrize=True):
    """dask-frame variant — no dask here; same as symmetrize_df."""
    return symmetrize_df(df, src_name, dst_name, weight_name, multi,
                         symmetrize)


# --------------------------------------------------------------------------
# coefficient aliases (reference exports both names)
# --------------------------------------------------------------------------

def sorensen_coefficient(G, vertex_pair=None, use_weight=False):
    from cugraph_tpu.algos.link_prediction import sorensen

    return sorensen(G, vertex_pair, use_weight)


def overlap_coefficient(G, vertex_pair=None, use_weight=False):
    from cugraph_tpu.algos.link_prediction import overlap

    return overlap(G, vertex_pair, use_weight)


def cosine_coefficient(G, vertex_pair=None, use_weight=False):
    from cugraph_tpu.algos.link_prediction import cosine

    return cosine(G, vertex_pair, use_weight)
