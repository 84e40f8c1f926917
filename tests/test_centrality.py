"""Centrality vs NetworkX — mirrors reference
python/cugraph/cugraph/tests/centrality/."""

import networkx as nx
import numpy as np

import cugraph_tpu as ctpu
from tests.utils import karate, random_directed, compare_vertex_values


def test_katz_karate():
    G, Gnx = karate()
    df = ctpu.katz_centrality(G, alpha=0.05, tol=1e-8, max_iter=1000)
    ref = nx.katz_centrality(Gnx, alpha=0.05, tol=1e-10, max_iter=2000)
    compare_vertex_values(df, "katz_centrality", ref, atol=1e-5)


def test_katz_directed():
    G, Gnx = random_directed(n=50, m=150, seed=5)
    df = ctpu.katz_centrality(G, alpha=0.05, tol=1e-8, max_iter=2000)
    ref = nx.katz_centrality(Gnx, alpha=0.05, tol=1e-10, max_iter=4000)
    compare_vertex_values(df, "katz_centrality", ref, atol=1e-5)


def test_eigenvector_karate():
    G, Gnx = karate()
    df = ctpu.eigenvector_centrality(G, max_iter=2000, tol=1e-7)
    ref = nx.eigenvector_centrality(Gnx, max_iter=2000, tol=1e-10)
    compare_vertex_values(df, "eigenvector_centrality", ref, atol=1e-4)


def test_degree_centrality():
    G, Gnx = karate()
    df = ctpu.degree_centrality(G)
    ref = nx.degree_centrality(Gnx)
    compare_vertex_values(df, "degree_centrality", ref, atol=1e-9)


def test_betweenness_karate_normalized():
    G, Gnx = karate()
    df = ctpu.betweenness_centrality(G)
    ref = nx.betweenness_centrality(Gnx)
    compare_vertex_values(df, "betweenness_centrality", ref, atol=1e-5)


def test_betweenness_directed_unnormalized():
    G, Gnx = random_directed(n=40, m=160, seed=3)
    df = ctpu.betweenness_centrality(G, normalized=False)
    ref = nx.betweenness_centrality(Gnx, normalized=False)
    compare_vertex_values(df, "betweenness_centrality", ref, atol=1e-3)


def test_betweenness_endpoints_karate():
    G, Gnx = karate()
    df = ctpu.betweenness_centrality(G, endpoints=True)
    ref = nx.betweenness_centrality(Gnx, endpoints=True)
    compare_vertex_values(df, "betweenness_centrality", ref, atol=1e-5)


def test_betweenness_endpoints_directed_unnormalized():
    G, Gnx = random_directed(n=40, m=160, seed=3)
    df = ctpu.betweenness_centrality(G, normalized=False, endpoints=True)
    ref = nx.betweenness_centrality(Gnx, normalized=False, endpoints=True)
    compare_vertex_values(df, "betweenness_centrality", ref, atol=1e-3)


def test_betweenness_endpoints_disconnected():
    # reachable-count term must respect components, not use n-1
    G = ctpu.Graph(directed=True)
    src = np.array([0, 1, 3, 4])
    dst = np.array([1, 2, 4, 5])
    G.from_edgelist(src, dst, None)
    Gnx = nx.DiGraph()
    Gnx.add_edges_from(zip(src.tolist(), dst.tolist()))
    df = ctpu.betweenness_centrality(G, normalized=False, endpoints=True)
    ref = nx.betweenness_centrality(Gnx, normalized=False, endpoints=True)
    compare_vertex_values(df, "betweenness_centrality", ref, atol=1e-6)


def test_betweenness_sampled_k():
    G, Gnx = karate()
    df = ctpu.betweenness_centrality(G, k=10, seed=42)
    # sampled values approximate the exact ones
    ref = nx.betweenness_centrality(Gnx)
    got = dict(zip(df["vertex"], df["betweenness_centrality"]))
    # top vertex should still rank near the top
    top_ref = max(ref, key=ref.get)
    top_rank = sorted(got, key=got.get, reverse=True)[:5]
    assert top_ref in top_rank


def test_edge_betweenness_karate():
    G, Gnx = karate()
    df = ctpu.edge_betweenness_centrality(G)
    ref = nx.edge_betweenness_centrality(Gnx)
    got = {(r.src, r.dst): r.betweenness_centrality for r in df.itertuples()}
    for (u, v), val in ref.items():
        key = (min(u, v), max(u, v))
        assert abs(got[key] - val) < 1e-5


def test_edge_betweenness_directed():
    G, Gnx = random_directed(n=35, m=120, seed=19)
    df = ctpu.edge_betweenness_centrality(G)
    ref = nx.edge_betweenness_centrality(Gnx)
    got = {(r.src, r.dst): r.betweenness_centrality for r in df.itertuples()}
    for (u, v), val in ref.items():
        assert abs(got[(u, v)] - val) < 1e-5


def test_edge_betweenness_unnormalized_matches_networkx():
    G, Gnx = karate()
    df = ctpu.edge_betweenness_centrality(G, normalized=False)
    ref = nx.edge_betweenness_centrality(Gnx, normalized=False)
    got = {(r.src, r.dst): r.betweenness_centrality for r in df.itertuples()}
    for (u, v), val in ref.items():
        key = (min(u, v), max(u, v))
        assert abs(got[key] - val) < 1e-3, (key, got[key], val)


def test_betweenness_list_k_extrapolates():
    G, Gnx = karate()
    full = ctpu.betweenness_centrality(G, normalized=False)
    sub = ctpu.betweenness_centrality(G, k=[0, 1, 2], normalized=False)
    # extrapolated magnitudes should be the same order as the full run,
    # not n/k times smaller
    assert sub["betweenness_centrality"].sum() > \
        0.2 * full["betweenness_centrality"].sum()


def test_betweenness_batched_pallas_path(monkeypatch):
    """The batched multi-source Brandes through the (interpreted) SpMM
    kernel matches networkx exactly — covers batch padding columns, the
    split-precision sigma sums, and plan pad_v reconciliation."""
    monkeypatch.setenv("CUGRAPH_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("CUGRAPH_TPU_PALLAS_MIN_EDGES", "1")
    G, Gnx = random_directed(n=60, m=240, seed=11)
    df = ctpu.betweenness_centrality(G, normalized=True)
    ref = nx.betweenness_centrality(Gnx, normalized=True)
    compare_vertex_values(df, "betweenness_centrality", ref, atol=1e-4)


def test_betweenness_multi_batch():
    """>128 sources exercises multiple source batches (and -1 padding in
    the final one)."""
    G, Gnx = random_directed(n=150, m=600, seed=9)
    df = ctpu.betweenness_centrality(G, normalized=True)
    ref = nx.betweenness_centrality(Gnx, normalized=True)
    compare_vertex_values(df, "betweenness_centrality", ref, atol=1e-4)


def test_edge_betweenness_batched_pallas_path(monkeypatch):
    """Edge-dependency accumulation (row-gather panels) through the
    interpreted SpMM kernel matches networkx."""
    monkeypatch.setenv("CUGRAPH_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("CUGRAPH_TPU_PALLAS_MIN_EDGES", "1")
    G, Gnx = random_directed(n=50, m=200, seed=4)
    df = ctpu.edge_betweenness_centrality(G, normalized=True)
    ref = nx.edge_betweenness_centrality(Gnx, normalized=True)
    got = {(s, d): v for s, d, v in
           zip(df["src"], df["dst"], df["betweenness_centrality"])}
    for e, v in ref.items():
        assert abs(got[e] - v) < 1e-4, (e, got[e], v)
