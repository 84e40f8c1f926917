"""PageRank / HITS vs NetworkX — mirrors reference
python/cugraph/cugraph/tests/link_analysis/test_pagerank.py:77-196."""

import numpy as np
import networkx as nx
import pytest

import cugraph_tpu as ctpu
from tests.utils import karate, random_directed, compare_vertex_values


def test_pagerank_karate_unweighted():
    G, Gnx = karate()
    df = ctpu.pagerank(G, tol=1e-8, max_iter=300)
    ref = nx.pagerank(Gnx, alpha=0.85, tol=1e-10, max_iter=500)
    compare_vertex_values(df, "pagerank", ref, atol=1e-5)


def test_pagerank_karate_weighted():
    G, Gnx = karate(weighted=True)
    df = ctpu.pagerank(G, tol=1e-8, max_iter=300)
    ref = nx.pagerank(Gnx, alpha=0.85, tol=1e-10, max_iter=500)
    compare_vertex_values(df, "pagerank", ref, atol=1e-5)


def test_pagerank_directed_with_dangling():
    G, Gnx = random_directed(n=50, m=120, seed=9)
    df = ctpu.pagerank(G, tol=1e-9, max_iter=500)
    ref = nx.pagerank(Gnx, tol=1e-11, max_iter=1000)
    compare_vertex_values(df, "pagerank", ref, atol=1e-5)


def test_personalized_pagerank():
    G, Gnx = karate()
    pers = {0: 1.0, 33: 2.0}
    df = ctpu.pagerank(G, personalization=pers, tol=1e-9, max_iter=500)
    ref = nx.pagerank(Gnx, personalization=pers, tol=1e-11, max_iter=1000)
    compare_vertex_values(df, "pagerank", ref, atol=1e-5)


def test_pagerank_nstart_converges_same():
    G, Gnx = karate()
    nstart = {v: (1.0 if v < 5 else 0.1) for v in Gnx.nodes()}
    df = ctpu.pagerank(G, nstart=nstart, tol=1e-9, max_iter=500)
    ref = nx.pagerank(Gnx, tol=1e-11, max_iter=1000)
    compare_vertex_values(df, "pagerank", ref, atol=1e-5)


def test_pagerank_nonconvergence_raises():
    G, _ = karate()
    with pytest.raises(ctpu.FailedToConvergeError):
        ctpu.pagerank(G, tol=1e-12, max_iter=2)


def test_pagerank_sums_to_one():
    G, _ = random_directed(n=40, m=100, seed=4)
    df = ctpu.pagerank(G, tol=1e-8, max_iter=300)
    assert abs(df["pagerank"].sum() - 1.0) < 1e-4


def test_hits_karate():
    G, Gnx = karate()
    df = ctpu.hits(G, max_iter=1000, tol=1e-8)
    refh, refa = nx.hits(Gnx, max_iter=1000, tol=1e-12)
    compare_vertex_values(df, "hubs", refh, atol=1e-4)
    compare_vertex_values(df, "authorities", refa, atol=1e-4)


def test_hits_directed():
    G, Gnx = random_directed(n=40, m=160, seed=3)
    df = ctpu.hits(G, max_iter=2000, tol=1e-9)
    refh, refa = nx.hits(Gnx, max_iter=2000, tol=1e-13)
    compare_vertex_values(df, "hubs", refh, atol=1e-4)
    compare_vertex_values(df, "authorities", refa, atol=1e-4)


def test_pagerank_precision_knob(monkeypatch):
    """TPU extension: precision="fast" (bf16 kernels) tracks "exact" to
    ~1e-3; bad values raise on every path."""
    monkeypatch.setenv("CUGRAPH_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("CUGRAPH_TPU_PALLAS_MIN_EDGES", "1")
    rng = np.random.default_rng(0)
    src = rng.integers(0, 60, 500)
    dst = rng.integers(0, 60, 500)
    G = ctpu.Graph(directed=True)
    G.from_edgelist(src, dst, None)
    exact = ctpu.pagerank(G, tol=1e-8).sort_values("vertex")["pagerank"]
    fast = ctpu.pagerank(G, tol=1e-8, precision="fast").sort_values(
        "vertex")["pagerank"]
    np.testing.assert_allclose(fast.to_numpy(), exact.to_numpy(),
                               rtol=5e-3, atol=1e-5)
    k_f = ctpu.katz_centrality(G, precision="fast").sort_values(
        "vertex")["katz_centrality"].to_numpy()
    k_e = ctpu.katz_centrality(G).sort_values(
        "vertex")["katz_centrality"].to_numpy()
    np.testing.assert_allclose(k_f, k_e, rtol=5e-3, atol=1e-5)
    with pytest.raises(ValueError, match="precision"):
        ctpu.pagerank(G, precision="bogus")
    with pytest.raises(ValueError, match="precision"):
        ctpu.eigenvector_centrality(G, precision="bogus")
    with pytest.raises(ValueError, match="precision"):
        ctpu.hits(G, precision="bogus")


def test_pagerank_precomputed_out_weight():
    """precomputed_vertex_out_weight (reference pagerank.py:73): supplying
    the graph's true out-weight sums must reproduce the default result;
    zeroed sums mark vertices dangling."""
    import pandas as pd

    G, Gnx = karate()
    base = ctpu.pagerank(G).sort_values("vertex")
    src, dst, w = G.edgelist_arrays()
    ow = np.zeros(G.number_of_vertices())
    np.add.at(ow, src, 1.0 if w is None else w)
    pre = pd.DataFrame({"vertex": G.number_map.to_external(
        np.arange(G.number_of_vertices())), "sums": ow})
    got = ctpu.pagerank(G, precomputed_vertex_out_weight=pre) \
        .sort_values("vertex")
    np.testing.assert_allclose(got["pagerank"].to_numpy(),
                               base["pagerank"].to_numpy(), rtol=1e-5,
                               atol=1e-7)
