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


def test_multigraph_undirected_keeps_parallel_edges():
    import cugraph_tpu as ct

    G = ct.MultiGraph(directed=False)
    G.from_edgelist(np.array([0, 0]), np.array([1, 1]), None, renumber=False)
    # two parallel undirected edges → 4 stored directed slots → count 2
    src, dst, _ = G.edgelist_arrays()
    assert len(src) == 4


def test_undirected_extras_no_double_store():
    import cugraph_tpu as ct

    G = ct.Graph(directed=False)
    G.from_edgelist(np.array([0, 1]), np.array([1, 0]), None,
                    edge_id=np.array([10, 11]), renumber=False)
    src, dst, _ = G.edgelist_arrays()
    # (0,1) and (1,0) are ONE undirected edge → 2 stored directions
    assert len(src) == 2


def test_weight_column_not_inferred_from_arbitrary_name():
    import cugraph_tpu as ct
    import pandas as pd

    df = pd.DataFrame({"src": [0, 1], "dst": [1, 2], "timestamp": [5.0, 6.0]})
    G = ct.Graph(directed=True)
    G.from_edgelist(df, "src", "dst")
    assert not G.is_weighted()  # timestamps must NOT become weights
    G2 = ct.Graph(directed=True)
    G2.from_edgelist(df, "src", "dst", weight_col="timestamp")
    assert G2.is_weighted()  # but an explicit column name works


def test_digraph_clear():
    import cugraph_tpu as ct

    g = ct.DiGraph()
    g.from_edgelist(np.array([0]), np.array([1]), None)
    g.clear()
    assert g._src is None


def test_clear_resets_derived_caches():
    """clear() + from_edgelist must not serve caches for the OLD graph
    (stale SpMV plans / CSR permutations silently corrupt results)."""
    import cugraph_tpu as ct
    from cugraph_tpu.algos.sampling import _csr_perm

    g = ct.Graph(directed=True)
    g.from_edgelist(np.array([0, 2, 1]), np.array([1, 0, 2]), None)
    p1 = _csr_perm(g)
    g.clear()
    g.from_edgelist(np.array([5, 3, 4, 3]), np.array([3, 4, 5, 5]), None)
    assert g._spmv_plan_pull is None and g._spmm_plans_brandes is None
    p2 = _csr_perm(g)
    assert len(p2) == 4 and p2 is not p1


def test_renumber_false_rejects_negative_ids():
    import cugraph_tpu as ct
    import pytest
    from cugraph_tpu.api.exceptions import InvalidInputError

    G = ct.Graph(directed=True)
    with pytest.raises(InvalidInputError):
        G.from_edgelist(np.array([-1]), np.array([0]), None, renumber=False)


def test_review_fixes_pending_nodes_and_unrenumber():
    """Round-2 review regressions: add_nodes_from accumulates and is
    consumed by ONE build (clear() + rebuild has no phantom vertices);
    unrenumber handles string-labeled graphs; from_numpy_array always
    attaches matrix values as weights; positional sssp misuse raises."""
    import pandas as pd
    import pytest

    import cugraph_tpu as ct

    g = ct.Graph()
    g.add_nodes_from([100])
    g.add_nodes_from([200])  # accumulates, not replaces
    g.from_edgelist(np.array([1, 2]), np.array([2, 3]), None)
    assert g.number_of_vertices() == 5
    g.clear()
    g.from_edgelist(np.array([7, 8]), np.array([8, 9]), None)
    assert g.number_of_vertices() == 3  # no resurrected pending nodes

    gs = ct.Graph(directed=True)
    gs.from_edgelist(np.array(["a", "b"]), np.array(["b", "c"]), None)
    df = pd.DataFrame({"v": gs.lookup_internal_vertex_id(
        np.array(["a", "c"]))})
    back = gs.unrenumber(df, "v")
    assert list(back["v"]) == ["a", "c"]

    gw = ct.Graph(directed=True)
    gw.from_numpy_array(np.array([[0, 1], [1, 0]], np.float32))
    assert gw.is_weighted()  # reference always attaches matrix values

    gd = ct.Graph(directed=True)
    gd.from_edgelist(np.array([0, 1]), np.array([1, 2]),
                     np.array([1.0, 2.0], np.float32))
    with pytest.raises(ValueError, match="method"):
        ct.sssp(gd, 0, 1.0)  # old positional cutoff must not pass silently


def test_numbermap_reference_method_parity():
    """Reference NumberMap method names (number_map.py:310-599):
    renumber/unrenumber/to_internal_vertex_id/add_internal_vertex_id."""
    import pandas as pd

    from cugraph_tpu.structure import NumberMap

    df = pd.DataFrame({"s": [100, 300], "d": [300, 500], "w": [1.0, 2.0]})
    rdf, nm = NumberMap.renumber(df, "s", "d")
    assert {"src", "dst", "w"} <= set(rdf.columns)
    back = nm.unrenumber(rdf[["src"]].copy(), "src")
    assert set(back["src"]) == {100, 300}
    ids = nm.to_internal_vertex_id(pd.DataFrame({"v": [500]}), "v")
    assert nm.to_external(ids)[0] == 500
    added = nm.add_internal_vertex_id(pd.DataFrame({"v": [100]}), "iv", "v",
                                      drop=True)
    assert list(added.columns) == ["iv"]
    assert nm.vertex_column_size() == 1
