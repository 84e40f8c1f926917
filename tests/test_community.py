"""Community algorithms vs NetworkX — mirrors reference
python/cugraph/cugraph/tests/community/."""

import networkx as nx
import networkx.algorithms.community as nxc
import numpy as np
import pytest

import cugraph_tpu as ctpu
from tests.utils import karate, les_mis, random_undirected


def _as_partition(df):
    out = {}
    for v, p in zip(df["vertex"], df["partition"]):
        out.setdefault(p, set()).add(v)
    return list(out.values())


def test_louvain_karate_quality():
    G, Gnx = karate()
    df, q = ctpu.louvain(G)
    # our reported modularity must equal nx's evaluation of our partition
    q_nx = nxc.modularity(Gnx, _as_partition(df))
    assert abs(q - q_nx) < 1e-4
    # and be close to nx louvain's quality (within 5%)
    q_ref = nxc.modularity(Gnx, nxc.louvain_communities(Gnx, seed=1))
    assert q >= q_ref - 0.05


def test_louvain_les_mis_weighted():
    G, Gnx = les_mis()
    df, q = ctpu.louvain(G)
    q_nx = nxc.modularity(Gnx, _as_partition(df), weight="weight")
    assert abs(q - q_nx) < 1e-3
    q_ref = nxc.modularity(Gnx, nxc.louvain_communities(Gnx, seed=1),
                           weight="weight")
    assert q >= q_ref - 0.07


def test_louvain_resolution():
    G, Gnx = karate()
    _, q1 = ctpu.louvain(G, resolution=1.0)
    df2, _ = ctpu.louvain(G, resolution=3.0)
    # higher resolution → more communities
    df1, _ = ctpu.louvain(G, resolution=1.0)
    assert df2["partition"].nunique() >= df1["partition"].nunique()


def test_leiden_communities_connected():
    G, Gnx = karate()
    df, q = ctpu.leiden(G)
    for comm in _as_partition(df):
        assert nx.is_connected(Gnx.subgraph(comm))
    assert q > 0.3


def test_ecg_reasonable():
    G, Gnx = karate()
    df, q = ctpu.ecg(G, ensemble_size=8)
    q_nx = nxc.modularity(Gnx, _as_partition(df))
    assert q_nx > 0.3


def test_triangle_count():
    G, Gnx = karate()
    df = ctpu.triangle_count(G)
    ref = nx.triangles(Gnx)
    got = dict(zip(df["vertex"], df["counts"]))
    assert all(got[v] == ref[v] for v in ref)


def test_triangle_count_random():
    G, Gnx = random_undirected(n=60, m=300, seed=3)
    df = ctpu.triangle_count(G)
    ref = nx.triangles(Gnx)
    got = dict(zip(df["vertex"], df["counts"]))
    assert all(got[v] == ref[v] for v in ref)


@pytest.mark.parametrize("k", [3, 4, 5])
def test_ktruss(k):
    G, Gnx = karate()
    sub = ctpu.ktruss_subgraph(G, k)
    ref = nx.k_truss(Gnx, k)
    el = sub.view_edge_list()
    got = {tuple(sorted(e)) for e in zip(el["src"], el["dst"])}
    assert got == {tuple(sorted(e)) for e in ref.edges()}


def test_egonet():
    G, Gnx = karate()
    df, offsets = ctpu.batched_ego_graphs(G, [0, 33], radius=1)
    ego0 = nx.ego_graph(Gnx, 0, radius=1)
    part0 = df[df["seed"] == 0]
    got = {tuple(sorted(e)) for e in zip(part0["src"], part0["dst"])}
    assert got == {tuple(sorted(e)) for e in ego0.edges()}
    assert len(offsets) == 3


def test_spectral_balanced_cut():
    G, Gnx = karate()
    df = ctpu.spectralBalancedCutClustering(G, 2, num_eigen_vects=2)
    assert df["cluster"].nunique() == 2
    score = ctpu.analyzeClustering_edge_cut(G, 2, df)
    assert score < G.number_of_edges() * 0.5  # cuts far fewer than half


def test_spectral_modularity_clustering():
    G, Gnx = karate()
    df = ctpu.spectralModularityMaximizationClustering(G, 2)
    df = df.rename(columns={"cluster": "partition"})
    q = nxc.modularity(Gnx, _as_partition(df))
    assert q > 0.25


def test_analyze_clustering_modularity():
    G, Gnx = karate()
    df, q = ctpu.louvain(G)
    df2 = df.rename(columns={"partition": "cluster"})
    q2 = ctpu.analyzeClustering_modularity(G, df["partition"].nunique(), df2)
    assert abs(q - q2) < 1e-4
