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


def test_leiden_refine_splits_disconnected_and_respects_communities():
    """Randomized refinement invariants (refine_impl.cuh semantics): a
    community containing two disconnected cliques must split; merges never
    cross community boundaries."""
    import jax.random as jr

    from cugraph_tpu.algos.community import _leiden_refine

    Gnx = nx.disjoint_union(nx.complete_graph(6), nx.complete_graph(6))
    src = np.array([u for u, v in Gnx.edges()])
    dst = np.array([v for u, v in Gnx.edges()])
    ss = np.concatenate([src, dst]); dd = np.concatenate([dst, src])
    w = np.ones(len(ss), np.float32)
    ref = _leiden_refine(ss, dd, w, 12, np.zeros(12, np.int32), 1.0, 1.0,
                         jr.key(0))
    assert set(ref[:6]).isdisjoint(set(ref[6:]))

    comm2 = np.array([0] * 6 + [1] * 6, np.int32)
    ref2 = _leiden_refine(ss, dd, w, 12, comm2, 1.0, 1.0, jr.key(1))
    assert set(ref2[:6]).isdisjoint(set(ref2[6:]))


def test_leiden_deterministic_per_seed_and_quality():
    Gnx = nx.planted_partition_graph(6, 25, 0.4, 0.03, seed=3)
    src = np.array([u for u, v in Gnx.edges()])
    dst = np.array([v for u, v in Gnx.edges()])
    G = ctpu.Graph()
    G.from_edgelist(np.concatenate([src, dst]), np.concatenate([dst, src]),
                    None)
    df1, q1 = ctpu.leiden(G, random_state=7)
    df2, q2 = ctpu.leiden(G, random_state=7)
    assert q1 == q2
    assert (df1.sort_values("vertex")["partition"].to_numpy()
            == df2.sort_values("vertex")["partition"].to_numpy()).all()
    _, ql = ctpu.louvain(G)
    assert q1 > ql - 0.02  # refinement must not cost meaningful modularity


def test_oriented_engine_edge_support_matches_nx():
    """The degree-oriented wedge engine's per-edge support must equal the
    number of triangles containing each edge (nx common-neighbor oracle),
    and per-vertex counts must match nx.triangles — including on graphs
    with multi-edges in the input list (deduped internally)."""
    import networkx as nx

    from cugraph_tpu.algos._oriented_tri import directed_edge_support

    rng = np.random.default_rng(5)
    src = rng.integers(0, 60, 500)
    dst = rng.integers(0, 60, 500)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    # symmetrize with duplicates left in
    s2 = np.concatenate([src, dst])
    d2 = np.concatenate([dst, src])
    n = 60
    tri, counts = directed_edge_support(s2, d2, n)
    Gx = nx.Graph(list(zip(src.tolist(), dst.tolist())))
    ref = nx.triangles(Gx)
    for v_ in range(n):
        assert tri[v_] == ref.get(v_, 0), v_
    for i in range(len(s2)):
        a_, b_ = int(s2[i]), int(d2[i])
        exp = len(set(Gx[a_]) & set(Gx[b_]))
        assert counts[i] == exp, (a_, b_)
