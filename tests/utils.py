"""Shared fixtures/helpers: graphs with NetworkX twins.

Datasets mirror the reference's test matrix (datasets/karate.csv etc.,
cpp/tests parameterized over file datasets × RMAT) using networkx's bundled
generators instead of downloads.
"""

from __future__ import annotations

import numpy as np
import networkx as nx

from cugraph_tpu.api.graph import Graph


def nx_to_arrays(Gnx, weight=None):
    src = np.array([u for u, v in Gnx.edges()])
    dst = np.array([v for u, v in Gnx.edges()])
    if weight is None:
        return src, dst, None
    w = np.array([Gnx[u][v].get(weight, 1.0) for u, v in Gnx.edges()],
                 dtype=np.float32)
    return src, dst, w


def build_pair(Gnx, weighted=False, directed=None):
    """Returns (our Graph, the same nx graph)."""
    if directed is None:
        directed = Gnx.is_directed()
    src, dst, w = nx_to_arrays(Gnx, "weight" if weighted else None)
    import numpy as _np
    G = Graph(directed=directed).from_edgelist(
        src, dst, w, vertices=_np.array(list(Gnx.nodes())))
    return G, Gnx


def karate(weighted=False):
    Gnx = nx.karate_club_graph()
    if not weighted:
        H = nx.Graph()
        H.add_nodes_from(Gnx.nodes())
        H.add_edges_from(Gnx.edges())
        Gnx = H
    return build_pair(Gnx, weighted=weighted)


def les_mis():
    return build_pair(nx.les_miserables_graph(), weighted=True)


def random_directed(n=60, m=240, seed=7, weighted=False):
    Gnx = nx.gnm_random_graph(n, m, seed=seed, directed=True)
    if weighted:
        rng = np.random.default_rng(seed)
        for u, v in Gnx.edges():
            Gnx[u][v]["weight"] = float(rng.uniform(0.05, 2.0))
    return build_pair(Gnx, weighted=weighted)


def random_undirected(n=80, m=300, seed=11, weighted=False):
    Gnx = nx.gnm_random_graph(n, m, seed=seed, directed=False)
    if weighted:
        rng = np.random.default_rng(seed)
        for u, v in Gnx.edges():
            Gnx[u][v]["weight"] = float(rng.uniform(0.05, 2.0))
    return build_pair(Gnx, weighted=weighted)


def disconnected(seed=5):
    Gnx = nx.disjoint_union(nx.cycle_graph(7), nx.path_graph(5))
    Gnx = nx.disjoint_union(Gnx, nx.complete_graph(4))
    return build_pair(Gnx)


def compare_vertex_values(df, col, nx_dict, atol=1e-5, rtol=0.0):
    got = dict(zip(df["vertex"], df[col]))
    assert set(got) == set(nx_dict), "vertex set mismatch"
    errs = {v: abs(got[v] - nx_dict[v]) - (atol + rtol * abs(nx_dict[v]))
            for v in nx_dict}
    bad = {v: e for v, e in errs.items() if e > 0}
    assert not bad, f"value mismatch beyond tolerance: {dict(list(bad.items())[:5])}"
