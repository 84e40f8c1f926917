"""Aux subsystems: profiling timer, validation checks, testing resultsets,
ensure_cugraph_obj adapters, new traversal/community additions."""

import numpy as np
import pandas as pd
import pytest

import cugraph_tpu as ct
from cugraph_tpu.utils import HighResTimer, validate_edgelist, validate_structure
from cugraph_tpu.api.exceptions import InvalidInputError


def _karate():
    import networkx as nx

    Gx = nx.karate_club_graph()
    src = np.array([u for u, v in Gx.edges()])
    dst = np.array([v for u, v in Gx.edges()])
    G = ct.Graph()
    G.from_edgelist(src, dst, None)
    return G, Gx


def test_high_res_timer():
    t = HighResTimer()
    with t.range("region"):
        sum(range(1000))
    tot = t.totals()
    assert "region" in tot and tot["region"][1] == 1
    t.display()


def test_validation_catches_bad_edges():
    with pytest.raises(InvalidInputError):
        validate_edgelist(np.array([0, 1]), np.array([1, -2]))
    with pytest.raises(InvalidInputError):
        validate_edgelist(np.array([0, 5]), np.array([1, 1]), num_vertices=3)
    validate_edgelist(np.array([0, 1]), np.array([1, 2]), num_vertices=3)


def test_validate_structure_ok():
    G, _ = _karate()
    validate_structure(G.structure)


def test_resultset_oracle_cache(tmp_path, monkeypatch):
    import cugraph_tpu.testing as tst

    monkeypatch.setattr(tst, "_CACHE_DIR", str(tmp_path))
    r1 = tst.get_resultset("pagerank", dataset="karate")
    r2 = tst.get_resultset("pagerank", dataset="karate")  # cache hit
    assert r1 == r2 and len(r1) == 34


def test_ensure_cugraph_obj():
    import networkx as nx
    import scipy.sparse as sp

    G, _ = _karate()
    g2, t = ct.ensure_cugraph_obj(G)
    assert g2 is G

    g3, t3 = ct.ensure_cugraph_obj(nx.karate_club_graph())
    assert g3.number_of_vertices() == 34

    A = sp.random(20, 20, density=0.2, random_state=0, format="csr")
    g4, _ = ct.ensure_cugraph_obj(A, directed=True)
    assert g4.number_of_vertices() == 20


def test_extract_bfs_paths():
    G, Gx = _karate()
    df = ct.bfs(G, 0)
    offsets_df, paths, max_len = ct.extract_bfs_paths(G, df, [33, 15])
    p33 = paths[:max_len]
    p33 = p33[p33 >= 0]
    assert p33[0] == 0 and p33[-1] == 33
    # consecutive path vertices are connected
    for a, b in zip(p33, p33[1:]):
        assert Gx.has_edge(int(a), int(b))


def test_od_shortest_distances():
    G, Gx = _karate()
    import networkx as nx

    df = ct.od_shortest_distances(G, [0, 1], [32, 33])
    for _, r in df.iterrows():
        expect = nx.shortest_path_length(Gx, int(r["origin"]),
                                         int(r["destination"]))
        assert r["distance"] == expect


def test_edge_triangle_count():
    G, Gx = _karate()
    import networkx as nx

    df = ct.edge_triangle_count(G)
    # sum of per-edge counts = 6 × number of triangles on symmetrized list
    n_tri = sum(nx.triangles(Gx).values()) // 3
    assert df["counts"].sum() == 6 * n_tri


def test_approx_weighted_matching():
    G, _ = _karate()
    m, total = ct.approx_weighted_matching(G)
    p = m.set_index("vertex")["partner"]
    for v, u in p.items():
        if u != -1:
            assert p[u] == v  # symmetric matching
    assert total > 0


def test_od_shortest_distances_batched(monkeypatch):
    """Unweighted OD matrices run 128-origin panels (incl. the interpreted
    SpMM kernel path); unreachable pairs report FLT_MAX like sssp; weighted
    graphs run batched Bellman-Ford panels and must match per-origin
    Dijkstra (networkx) exactly."""
    import networkx as nx
    import numpy as np

    rng = np.random.default_rng(12)
    src = rng.integers(0, 40, 150)
    dst = rng.integers(0, 40, 150)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    G = ct.Graph(directed=True)
    G.from_edgelist(src, dst, None)
    Gx = nx.DiGraph(list(zip(src.tolist(), dst.tolist())))
    origins = list(range(0, 20))
    dests = list(range(20, 40))
    df = ct.od_shortest_distances(G, origins, dests)
    assert len(df) == len(origins) * len(dests)
    FMAX = np.float32(np.finfo(np.float32).max)
    for _, r in df.iterrows():
        o, d = int(r["origin"]), int(r["destination"])
        if nx.has_path(Gx, o, d):
            assert r["distance"] == nx.shortest_path_length(Gx, o, d)
        else:
            assert r["distance"] == FMAX

    monkeypatch.setenv("CUGRAPH_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("CUGRAPH_TPU_PALLAS_MIN_EDGES", "1")
    G2 = ct.Graph(directed=True)
    G2.from_edgelist(src, dst, None)
    df2 = ct.od_shortest_distances(G2, origins, dests)
    assert (df.sort_values(["origin", "destination"])["distance"].to_numpy()
            == df2.sort_values(["origin", "destination"])["distance"]
            .to_numpy()).all()

    # weighted keeps SSSP semantics
    w = rng.random(len(src)).astype(np.float32) + 0.5
    Gw = ct.Graph(directed=True)
    Gw.from_edgelist(src, dst, w)
    Gxw = nx.DiGraph()
    for s, d, ww in zip(src.tolist(), dst.tolist(), w.tolist()):
        Gxw.add_edge(s, d, weight=ww)
    dfw = ct.od_shortest_distances(Gw, [0, 1], [30, 31])
    for _, r in dfw.iterrows():
        o, d = int(r["origin"]), int(r["destination"])
        if nx.has_path(Gxw, o, d):
            assert abs(r["distance"]
                       - nx.dijkstra_path_length(Gxw, o, d)) < 1e-4


def test_od_weighted_batched_pallas(monkeypatch):
    """Weighted OD panels through the interpreted (min,+) SpMM kernel match
    dijkstra."""
    import networkx as nx
    import numpy as np

    monkeypatch.setenv("CUGRAPH_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("CUGRAPH_TPU_PALLAS_MIN_EDGES", "1")
    rng = np.random.default_rng(7)
    src = rng.integers(0, 30, 120)
    dst = rng.integers(0, 30, 120)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    # dedupe up front (Graph keeps the FIRST duplicate; make the oracle agree)
    _, idx = np.unique(src.astype(np.int64) * 1000 + dst, return_index=True)
    src, dst = src[idx], dst[idx]
    w = rng.random(len(src)).astype(np.float32) + 0.2
    G = ct.Graph(directed=True)
    G.from_edgelist(src, dst, w)
    Gx = nx.DiGraph()
    for s, d, ww in zip(src.tolist(), dst.tolist(), w.tolist()):
        Gx.add_edge(s, d, weight=ww)
    df = ct.od_shortest_distances(G, list(range(10)), list(range(10, 30)))
    assert len(df) == 200
    for _, r in df.iterrows():
        o, d = int(r["origin"]), int(r["destination"])
        if nx.has_path(Gx, o, d):
            assert abs(r["distance"]
                       - nx.dijkstra_path_length(Gx, o, d)) < 1e-3


def test_utilities_long_tail():
    """Reference utils.py:46-458 helpers: traversed paths, matrix-type
    predicates, vertex-pair renumbering, random bipartite factory, group
    sampling."""
    import pandas as pd
    import scipy.sparse as sp

    import cugraph_tpu as ct
    from cugraph_tpu.utils import (create_random_bipartite,
                                   get_traversed_path,
                                   get_traversed_path_list,
                                   is_cugraph_graph_type, is_matrix_type,
                                   renumber_vertex_pair, sample_groups)

    G = ct.Graph(directed=True)
    G.from_edgelist(np.array([0, 1, 2]), np.array([1, 2, 3]), None)
    r = ct.bfs(G, 0)
    assert get_traversed_path_list(r, 3) == [3, 2, 1, 0]
    pdf = get_traversed_path(r, 2)
    assert list(pdf["vertex"]) == [2, 1, 0]

    assert is_matrix_type(sp.csr_matrix) and not is_matrix_type(int)
    assert is_cugraph_graph_type(ct.Graph)

    vp = pd.DataFrame({"first": [10], "second": [30]})
    G2 = ct.Graph(directed=True)
    G2.from_edgelist(np.array([10, 20]), np.array([20, 30]), None)
    rp = renumber_vertex_pair(G2, vp)
    assert rp["first"].iloc[0] == int(G2.lookup_internal_vertex_id([10])[0])

    left, bg, a = create_random_bipartite(3, 4, 10, np.int32)
    assert bg.number_of_edges() == 12 and a.shape == (3, 4)

    df = pd.DataFrame({"g": [0, 0, 0, 1, 1], "x": range(5)})
    s = sample_groups(df, "g", 1)
    assert len(s) == 2 and set(s["g"]) == {0, 1}
