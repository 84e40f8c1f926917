"""Graph construction / renumbering / degrees tests.

Mirrors the reference's structure tests (python/cugraph/cugraph/tests/structure/).
"""

import numpy as np
import networkx as nx
import pytest

from cugraph_tpu.api.graph import Graph, MultiGraph
from cugraph_tpu.api.exceptions import InvalidInputError
from tests.utils import karate, build_pair


def test_counts_karate():
    G, Gnx = karate()
    assert G.number_of_vertices() == Gnx.number_of_nodes()
    assert G.number_of_edges() == Gnx.number_of_edges()


def test_degrees_match_networkx():
    G, Gnx = karate()
    df = G.degree()
    deg = dict(zip(df["vertex"], df["degree"]))
    for v, d in Gnx.degree():
        assert deg[v] == d


def test_directed_degrees():
    Gnx = nx.gnm_random_graph(30, 90, seed=2, directed=True)
    G, _ = build_pair(Gnx)
    df = G.degrees()
    ind = dict(zip(df["vertex"], df["in_degree"]))
    outd = dict(zip(df["vertex"], df["out_degree"]))
    for v in Gnx.nodes():
        assert ind[v] == Gnx.in_degree(v)
        assert outd[v] == Gnx.out_degree(v)


def test_renumbering_string_ids():
    src = np.array(["apple", "banana", "cherry", "apple"])
    dst = np.array(["banana", "cherry", "apple", "cherry"])
    G = Graph(directed=True).from_edgelist(src, dst)
    assert G.number_of_vertices() == 3
    assert G.has_vertex("apple")
    assert not G.has_vertex("durian")
    el = G.view_edge_list()
    assert set(zip(el["src"], el["dst"])) == {
        ("apple", "banana"), ("banana", "cherry"),
        ("cherry", "apple"), ("apple", "cherry")}


def test_multigraph_keeps_parallel_edges():
    src = np.array([0, 0, 1]); dst = np.array([1, 1, 2])
    Gm = MultiGraph(directed=True).from_edgelist(src, dst)
    Gs = Graph(directed=True).from_edgelist(src, dst)
    assert Gm.number_of_edges() == 3
    assert Gs.number_of_edges() == 2


def test_view_edge_list_roundtrip():
    G, Gnx = karate()
    el = G.view_edge_list()
    pairs = {tuple(sorted(p)) for p in zip(el["src"], el["dst"])}
    ref = {tuple(sorted(e)) for e in Gnx.edges()}
    assert pairs == ref


def test_errors():
    G = Graph()
    with pytest.raises(InvalidInputError):
        G.number_of_vertices()
    with pytest.raises(InvalidInputError):
        G.from_edgelist(np.array([1, 2]), np.array([1]))


def test_padding_invariants():
    G, _ = karate()
    g = G.structure
    assert g.csr.pad_e % 128 == 0
    assert (g.csr.pad_v) % 8 == 0
    assert g.csr.pad_v > g.num_vertices  # sink row exists
    # padded edges all live in the sink row
    majors = np.asarray(g.csr.majors)
    assert (majors[g.num_edges:] == g.csr.sink).all()
    # adjacency lists sorted within rows
    offs = np.asarray(g.csr.offsets)
    idx = np.asarray(g.csr.indices)
    for v in range(g.num_vertices):
        row = idx[offs[v]:offs[v + 1]]
        assert (np.diff(row) >= 0).all()
