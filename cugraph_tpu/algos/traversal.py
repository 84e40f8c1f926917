"""Traversal: BFS, SSSP, k-hop neighborhoods.

Reference: cpp/src/traversal/{bfs_impl.cuh:133-875, sssp_impl.cuh:571,
k_hop_nbrs_impl.cuh:220}; Python wrappers python/cugraph/cugraph/traversal/.

TPU design: dense bitmap frontiers (see prims/frontier.py) inside a jitted
``lax.while_loop`` — the equivalent of the reference's bottom-up
direction-optimizing regime (bfs_impl.cuh:291-300) run unconditionally.  SSSP
is Bellman-Ford-style full-edge relaxation to a fixpoint (the TPU analog of
the reference's near/far delta-stepping buckets, sssp_impl.cuh:75-153:
data-dependent bucketing buys nothing when a full dense sweep saturates HBM
bandwidth).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from cugraph_tpu.algos._utils import unrenumber_column, normalize_start
from cugraph_tpu.core.structure import GraphStructure
from cugraph_tpu.prims.frontier import frontier_expand_by_dst
from cugraph_tpu.prims.vertex_edge import (
    gather_minor,
    gather_major,
    segment_reduce_by_major,
)

INT32_INF = np.iinfo(np.int32).max
F32_INF = np.float32(np.finfo(np.float32).max)


@partial(jax.jit, static_argnames=("depth_limit",))
def _bfs_kernel(g: GraphStructure, source: jax.Array, depth_limit: int):
    pad_v = g.pad_v
    n = g.num_vertices
    real = jnp.arange(pad_v) < n
    ids = jnp.arange(pad_v)

    dist0 = jnp.where(ids == source, 0, INT32_INF).astype(jnp.int32)
    pred0 = jnp.full((pad_v,), -1, dtype=jnp.int32)
    frontier0 = ids == source

    def body(state):
        dist, pred, frontier, level = state
        nxt, p = frontier_expand_by_dst(g, frontier, (dist == INT32_INF) & real)
        dist = jnp.where(nxt, level + 1, dist)
        pred = jnp.where(nxt, p, pred)
        return dist, pred, nxt, level + 1

    def cond(state):
        _, _, frontier, level = state
        return jnp.any(frontier) & (level < depth_limit)

    dist, pred, _, _ = jax.lax.while_loop(
        cond, body, (dist0, pred0, frontier0, jnp.int32(0))
    )
    return dist, pred


def bfs(G, start=None, depth_limit=None, source=None, return_distances=True,
        i_start=None):
    """BFS from ``start``; returns ['distance', 'vertex', 'predecessor'].

    Unreachable vertices get distance 2**31-1 and predecessor -1, matching the
    reference C API convention (bfs_impl.cuh / bfs.pyx).
    """
    if start is None:
        start = source if source is not None else i_start
    if start is None:
        raise ValueError("bfs requires a start vertex")
    s = int(normalize_start(G, start)[0])
    g = G.structure
    n = G.number_of_vertices()
    dl = int(depth_limit) if depth_limit is not None else n
    dist, pred = _bfs_kernel(g, jnp.int32(s), dl)
    dist = np.asarray(dist)[:n]
    pred = np.asarray(pred)[:n]
    return pd.DataFrame({
        "distance": dist,
        "vertex": G.number_map.to_external(np.arange(n)),
        "predecessor": unrenumber_column(G, pred, sentinel=-1),
    })


@jax.jit
def _sssp_kernel(g: GraphStructure, source: jax.Array):
    """Fixpoint edge relaxation; converges in <= n-1 sweeps.
    Predecessors recovered with a second masked pass per sweep."""
    pad_v = g.pad_v
    n = g.num_vertices
    real = jnp.arange(pad_v) < n
    ids = jnp.arange(pad_v)
    csc = g.csc

    dist0 = jnp.where(ids == source, 0.0, F32_INF).astype(jnp.float32)

    def body(state):
        dist, _, it = state
        du = gather_minor(csc, dist)                       # src distances per in-edge
        cand = jnp.where(du < F32_INF, du + csc.weights, F32_INF)
        best = segment_reduce_by_major(csc, cand, "min")
        new_dist = jnp.minimum(dist, jnp.where(real, best, F32_INF))
        changed = jnp.any(new_dist < dist)
        return new_dist, changed, it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < n)

    dist, _, _ = jax.lax.while_loop(
        cond, body, (dist0, jnp.bool_(True), jnp.int32(0))
    )

    # predecessor: any in-neighbor u with dist[u] + w == dist[v]
    du = gather_minor(csc, dist)
    match = (du + csc.weights == gather_major(csc, dist)) & (du < F32_INF)
    cand_pred = jnp.where(match, csc.indices, -1)
    pred = segment_reduce_by_major(csc, cand_pred, "max")
    pred = jnp.where((dist < F32_INF) & (ids != source) & real, pred, -1)
    return dist, pred


def sssp(G, source, cutoff=None, method=None):
    """Single-source shortest paths (nonnegative weights).
    Returns ['distance', 'vertex', 'predecessor']; unreachable = FLT_MAX.
    Reference: sssp_impl.cuh:571."""
    s = int(normalize_start(G, source)[0])
    g = G.structure
    n = G.number_of_vertices()
    if G.is_weighted():
        w = np.asarray(g.csr.weights)[: g.num_edges]
        if np.any(w < 0):
            raise ValueError("sssp requires non-negative weights")
    dist, pred = _sssp_kernel(g, jnp.int32(s))
    dist = np.asarray(dist)[:n].astype(np.float64)
    pred = np.array(pred)[:n]  # writable copy (np.asarray of a jax array is readonly)
    if cutoff is not None:
        over = dist > cutoff
        dist[over] = np.float64(F32_INF)
        pred[over] = -1
    return pd.DataFrame({
        "distance": dist,
        "vertex": G.number_map.to_external(np.arange(n)),
        "predecessor": unrenumber_column(G, pred, sentinel=-1),
    })


def shortest_path_length(G, source, target=None):
    df = sssp(G, source) if G.is_weighted() else bfs(G, source)
    df = df.rename(columns={"distance": "distance"})
    if target is not None:
        row = df[df["vertex"] == target]
        if row.empty:
            raise ValueError(f"target {target!r} not in graph")
        return float(row["distance"].iloc[0])
    return df[["vertex", "distance"]]


def filter_unreachable(df: pd.DataFrame) -> pd.DataFrame:
    """Drop unreachable rows (reference: cugraph/traversal/traveral utils)."""
    d = df["distance"]
    if np.issubdtype(d.dtype, np.integer):
        return df[d != INT32_INF].reset_index(drop=True)
    return df[d < np.float64(F32_INF)].reset_index(drop=True)


@partial(jax.jit, static_argnames=("k",))
def _khop_kernel(g: GraphStructure, seed_mask: jax.Array, k: int):
    """Vertices within exactly <=k hops (excluding unreachable)."""
    reach = seed_mask

    def body(i, reach):
        src_r = gather_minor(g.csc, reach)
        hit = segment_reduce_by_major(g.csc, src_r.astype(jnp.int32), "max") > 0
        return reach | hit

    return jax.lax.fori_loop(0, k, body, reach)


def k_hop_neighbors(G, start, k: int):
    """k-hop neighborhood of start vertices (reference k_hop_nbrs_impl.cuh:220).
    Returns a DataFrame ['vertex'] of all vertices within k hops (excluding
    the starts themselves unless reachable in <=k hops by a cycle)."""
    g = G.structure
    n = G.number_of_vertices()
    seeds = normalize_start(G, start)
    mask0 = np.zeros(g.pad_v, dtype=bool)
    mask0[seeds] = True
    reach = np.array(_khop_kernel(g, jnp.asarray(mask0), int(k)))[:n]
    reach[seeds[seeds < n]] = False
    verts = np.nonzero(reach)[0]
    return pd.DataFrame({"vertex": G.number_map.to_external(verts)})


def extract_bfs_paths(G, distances_df: pd.DataFrame, destinations) -> pd.DataFrame:
    """Reconstruct root→destination paths from a BFS result frame.

    Reference: traversal/extract_bfs_paths_impl.cuh (kv-gather walk up the
    predecessor chain); python cugraph.utilities.path_retrieval.
    Returns a frame ['destination', 'path_offset'] plus a flat 'vertex_paths'
    array padded with -1 (the reference's max_path_length convention).
    """
    df = distances_df.sort_values("vertex")
    vertices = df["vertex"].to_numpy()
    pred = df["predecessor"].to_numpy()
    dist = df["distance"].to_numpy()
    lut_pred = dict(zip(vertices.tolist(), pred.tolist()))
    lut_dist = dict(zip(vertices.tolist(), dist.tolist()))

    def _reachable(dv):
        # BFS encodes unreachable as INT32_MAX, SSSP as FLT_MAX (the
        # reference C API conventions) — treat both like infinity
        return (dv is not None and np.isfinite(dv) and 0 <= dv < INT32_INF
                and dv < np.float64(F32_INF) / 2)

    destinations = np.asarray(destinations).reshape(-1)
    finite = [d for d in destinations if _reachable(lut_dist.get(d))]
    max_len = int(max((lut_dist[d] for d in finite), default=0)) + 1
    paths = np.full((len(destinations), max_len), -1, dtype=np.int64)
    for r, d in enumerate(destinations):
        if not _reachable(lut_dist.get(d)):
            continue
        cur, chain = d, []
        while cur is not None and cur != -1 and len(chain) <= max_len:
            chain.append(cur)
            nxt = lut_pred.get(cur, -1)
            cur = None if nxt == -1 or nxt is None else nxt
        paths[r, : len(chain)] = chain[::-1]
    return pd.DataFrame({
        "destination": destinations,
        "path_offset": np.arange(len(destinations)) * max_len,
    }), paths.reshape(-1), max_len


def od_shortest_distances(G, origins, destinations) -> pd.DataFrame:
    """All origin→destination shortest distances (reference
    traversal/od_shortest_distances_impl.cuh:426).  Runs one SSSP per origin
    (vectorizable later via multi-source batching); returns
    ['origin', 'destination', 'distance']."""
    from cugraph_tpu.algos._utils import normalize_start

    origins = np.asarray(origins).reshape(-1)
    destinations = np.asarray(destinations).reshape(-1)
    rows = []
    for o in origins:
        df = sssp(G, source=o)
        sel = df[df["vertex"].isin(destinations)]
        for _, r in sel.iterrows():
            rows.append((o, r["vertex"], r["distance"]))
    return pd.DataFrame(rows, columns=["origin", "destination", "distance"])
