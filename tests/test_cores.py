"""Core number / k-core vs NetworkX."""

import networkx as nx
import numpy as np

import cugraph_tpu as ctpu
from tests.utils import karate, random_undirected, disconnected


def test_core_number_karate():
    G, Gnx = karate()
    df = ctpu.core_number(G)
    ref = nx.core_number(Gnx)
    got = dict(zip(df["vertex"], df["core_number"]))
    assert all(got[v] == ref[v] for v in ref)


def test_core_number_random():
    G, Gnx = random_undirected(n=100, m=400, seed=8)
    df = ctpu.core_number(G)
    ref = nx.core_number(Gnx)
    got = dict(zip(df["vertex"], df["core_number"]))
    assert all(got[v] == ref[v] for v in ref)


def test_core_number_disconnected():
    G, Gnx = disconnected()
    df = ctpu.core_number(G)
    ref = nx.core_number(Gnx)
    got = dict(zip(df["vertex"], df["core_number"]))
    assert all(got[v] == ref[v] for v in ref)


def test_k_core_subgraph():
    G, Gnx = karate()
    sub = ctpu.k_core(G, k=3)
    ref = nx.k_core(Gnx, k=3)
    el = sub.view_edge_list()
    got = {tuple(sorted(e)) for e in zip(el["src"], el["dst"])}
    assert got == {tuple(sorted(e)) for e in ref.edges()}


def test_core_number_directed_pallas_matches_xla(monkeypatch):
    """Directed core_number now routes through the Pallas peel for every
    degree_type (bidirectional = symmetrized plan); interpret-mode results
    match the XLA h-index kernel."""
    import os

    rng = np.random.default_rng(6)
    src = rng.integers(0, 60, 300)
    dst = rng.integers(0, 60, 300)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    ref = {}
    for dt in ("bidirectional", "incoming", "outgoing"):
        G = ctpu.Graph(directed=True)
        G.from_edgelist(src, dst, None)
        ref[dt] = ctpu.core_number(G, degree_type=dt)["core_number"].to_numpy()
    monkeypatch.setenv("CUGRAPH_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("CUGRAPH_TPU_PALLAS_MIN_EDGES", "1")
    for dt in ("bidirectional", "incoming", "outgoing"):
        G = ctpu.Graph(directed=True)
        G.from_edgelist(src, dst, None)
        got = ctpu.core_number(G, degree_type=dt)["core_number"].to_numpy()
        assert (got == ref[dt]).all(), dt


def test_core_number_native_matches_xla_all_degree_types():
    """Native B-Z peel vs the XLA h-index fixpoint on random directed and
    undirected graphs, every degree_type (incl. the bidirectional doubling
    semantics on reciprocated pairs)."""
    import cugraph_tpu.core.native as nat
    import cugraph_tpu as ct

    rng = np.random.default_rng(13)
    src = rng.integers(0, 120, 900)
    dst = rng.integers(0, 120, 900)
    keep = src != dst
    pairs = np.unique(np.stack([src[keep], dst[keep]], 1), axis=0)
    src, dst = pairs[:, 0], pairs[:, 1]

    for directed in (False, True):
        G = ct.Graph(directed=directed)
        G.from_edgelist(src, dst, None)
        for dt in (("bidirectional", "incoming", "outgoing") if directed
                   else ("bidirectional",)):
            a = ct.core_number(G, degree_type=dt).sort_values("vertex")
            saved = nat._lib, nat._tried
            nat._lib, nat._tried = None, True
            try:
                b = ct.core_number(G, degree_type=dt).sort_values("vertex")
            finally:
                nat._lib, nat._tried = saved
            np.testing.assert_array_equal(
                a["core_number"].to_numpy(), b["core_number"].to_numpy(),
                err_msg=f"directed={directed} dt={dt}")


def test_k_core_keeps_edgeless_qualifying_vertices():
    """k_core must include every vertex with core >= k, including those
    none of whose edges survive (round-5 review repro: isolated vertex 2
    at k=0 was dropped whenever any edge was kept)."""
    G = ctpu.Graph(directed=False)
    G.from_edgelist(np.array([0]), np.array([1]), None,
                    vertices=np.array([0, 1, 2]))
    out = ctpu.k_core(G, k=0)
    assert out.number_of_vertices() == 3
    assert out.number_of_edges() == 1
    # and the max core still extracts correctly
    out1 = ctpu.k_core(G, k=1)
    assert out1.number_of_vertices() == 2
