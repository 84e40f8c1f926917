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
