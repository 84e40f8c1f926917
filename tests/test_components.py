"""Components vs NetworkX — mirrors reference
python/cugraph/cugraph/tests/components/."""

import networkx as nx
import numpy as np

import cugraph_tpu as ctpu
from tests.utils import karate, disconnected, random_directed, build_pair


def _partition(df, label_col="labels"):
    out = {}
    for v, l in zip(df["vertex"], df[label_col]):
        out.setdefault(l, set()).add(v)
    return {frozenset(s) for s in out.values()}


def test_wcc_connected():
    G, Gnx = karate()
    df = ctpu.weakly_connected_components(G)
    assert df["labels"].nunique() == 1


def test_wcc_disconnected():
    G, Gnx = disconnected()
    df = ctpu.weakly_connected_components(G)
    assert _partition(df) == {frozenset(c) for c in nx.connected_components(Gnx)}


def test_wcc_directed():
    G, Gnx = random_directed(n=60, m=70, seed=23)
    df = ctpu.weakly_connected_components(G)
    assert _partition(df) == {
        frozenset(c) for c in nx.weakly_connected_components(Gnx)}


def test_scc_random():
    G, Gnx = random_directed(n=60, m=150, seed=1)
    df = ctpu.strongly_connected_components(G)
    assert _partition(df) == {
        frozenset(c) for c in nx.strongly_connected_components(Gnx)}


def test_scc_cycle_plus_tail():
    Gnx = nx.DiGraph()
    Gnx.add_edges_from([(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)])
    G, _ = build_pair(Gnx)
    df = ctpu.strongly_connected_components(G)
    assert _partition(df) == {frozenset({0, 1, 2}), frozenset({3}), frozenset({4})}


def test_connected_components_dispatch():
    G, Gnx = disconnected()
    dfw = ctpu.connected_components(G, connection="weak")
    assert _partition(dfw) == {frozenset(c) for c in nx.connected_components(Gnx)}


def test_mis_is_independent_and_maximal():
    G, Gnx = karate()
    df = ctpu.maximal_independent_set(G, seed=3)
    mis = set(df["vertex"])
    for u, v in Gnx.edges():
        assert not (u in mis and v in mis)
    for v in Gnx.nodes():
        assert v in mis or any(nb in mis for nb in Gnx[v])


def test_vertex_coloring_proper():
    G, Gnx = karate()
    df = ctpu.vertex_coloring(G, seed=0)
    color = dict(zip(df["vertex"], df["color"]))
    assert all(c >= 0 for c in color.values())
    for u, v in Gnx.edges():
        if u != v:
            assert color[u] != color[v]


def test_wcc_hybrid_matches_label_propagation():
    """The Afforest-style mask hybrid (round-4 WCC experiment) must produce
    the exact labels of the default path — including graphs where the
    max-degree seed's component is NOT giant, many small components, and
    isolated vertices."""
    import numpy as np

    import cugraph_tpu as ct
    from cugraph_tpu.algos.components import _wcc_hybrid

    rng = np.random.default_rng(10)
    cases = []
    # power-law-ish: giant component + fringe
    s = rng.integers(0, 300, 1500)
    d = rng.integers(0, 300, 1500)
    cases.append((np.concatenate([s, [500]]), np.concatenate([d, [501]]),
                  520))
    # many small components: disjoint 4-cliques
    ss, dd = [], []
    for c in range(30):
        base = c * 5
        for i in range(4):
            for j in range(i + 1, 4):
                ss.append(base + i)
                dd.append(base + j)
    cases.append((np.array(ss), np.array(dd), 160))
    for src, dst, n in cases:
        keep = src != dst
        src, dst = src[keep], dst[keep]
        G = ct.Graph(directed=True)
        G.from_edgelist(src, dst, None, renumber=False,
                        vertices=np.arange(n))
        want = ct.weakly_connected_components(G).sort_values("vertex")
        got = _wcc_hybrid(G, interpret=True)[:n]
        ext = G.number_map.to_external(got)
        np.testing.assert_array_equal(ext, want["labels"].to_numpy())
