"""MG long-tail parity tests: ECG, all-pairs similarity + topk, negative
sampling, biased/node2vec walks, edge betweenness — each vs the SG result
on the gathered graph (the reference's MG test recipe)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import cugraph_tpu as ct
from cugraph_tpu.parallel import build_dist_graph, make_mesh_2d


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8
    return make_mesh_2d(4, 2, jax.devices()[:8])


def _coo(n=100, m=600, seed=0, weighted=True):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    uniq = np.unique(src * n + dst)
    src, dst = (uniq // n).astype(np.int64), (uniq % n).astype(np.int64)
    w = rng.uniform(0.5, 2.0, len(src)).astype(np.float32) if weighted else None
    return src, dst, w


def test_mg_all_pairs_similarity_matches_sg(mesh):
    from cugraph_tpu.parallel import mg_all_pairs_similarity

    src, dst, _ = _coo(n=60, m=400, seed=1, weighted=False)
    n = 60
    g = build_dist_graph(src, dst, None, n, 4, 2, store_push=True)
    mg = mg_all_pairs_similarity(g, mesh, "jaccard", topk=20)

    G = ct.Graph(directed=True)
    G.from_edgelist(src, dst, None, vertices=np.arange(n), renumber=False)
    sg = ct.all_pairs_jaccard(G, topk=20)
    # same top coefficient multiset (order within ties may differ)
    np.testing.assert_allclose(
        np.sort(mg["jaccard_coeff"].to_numpy())[::-1],
        np.sort(sg["jaccard_coeff"].to_numpy())[::-1], rtol=1e-6)


def test_mg_negative_sampling_excludes_edges(mesh):
    from cugraph_tpu.parallel import mg_negative_sampling

    src, dst, _ = _coo(n=50, m=500, seed=2, weighted=False)
    n = 50
    g = build_dist_graph(src, dst, None, n, 4, 2, store_push=False)
    df = mg_negative_sampling(g, mesh, 80, seed=3)
    assert len(df) == 80
    eset = set(zip(src.tolist(), dst.tolist()))
    for s, d in zip(df["src"], df["dst"]):
        assert (int(s), int(d)) not in eset
        assert s != d
    # dedup
    assert len(set(zip(df["src"], df["dst"]))) == len(df)


def test_mg_ecg_produces_communities(mesh):
    from cugraph_tpu.parallel import mg_ecg

    rng = np.random.default_rng(4)
    n = 60
    a = rng.integers(0, 30, 350)
    b = rng.integers(0, 30, 350)
    src = np.concatenate([a, a + 30, [0]])
    dst = np.concatenate([b, b + 30, [30]])
    keep = src != dst
    src, dst = src[keep], dst[keep]
    uniq = np.unique(src * n + dst)
    src, dst = uniq // n, uniq % n
    g = build_dist_graph(src, dst, None, n, 4, 2, store_push=True,
                         symmetrize=True)
    labels, q = mg_ecg(g, mesh, ensemble_size=4)
    assert q > 0.3
    assert len(set(labels[:30]) & set(labels[30:])) <= 1


def test_mg_biased_walks_follow_edges(mesh):
    from cugraph_tpu.parallel import mg_biased_random_walks

    src, dst, w = _coo(n=40, m=300, seed=5)
    n = 40
    g = build_dist_graph(src, dst, w, n, 4, 2, store_push=True)
    paths = mg_biased_random_walks(g, mesh, [int(src[0]), int(src[3])], 5,
                                   seed=0)
    eset = set(zip(src.tolist(), dst.tolist()))
    for row in paths:
        for a, b in zip(row[:-1], row[1:]):
            if a >= 0 and b >= 0:
                assert (int(a), int(b)) in eset


def test_mg_node2vec_walks_follow_edges(mesh):
    from cugraph_tpu.parallel import mg_node2vec_random_walks

    src, dst, w = _coo(n=40, m=300, seed=6)
    n = 40
    g = build_dist_graph(src, dst, w, n, 4, 2, store_push=True)
    paths = mg_node2vec_random_walks(g, mesh, [int(src[0]), int(src[2])], 4,
                                     p=2.0, q=0.5, seed=0)
    eset = set(zip(src.tolist(), dst.tolist()))
    for row in paths:
        for a, b in zip(row[:-1], row[1:]):
            if a >= 0 and b >= 0:
                assert (int(a), int(b)) in eset


def test_mg_edge_betweenness_matches_sg(mesh):
    from cugraph_tpu.parallel import mg_edge_betweenness_centrality

    src, dst, _ = _coo(n=40, m=200, seed=7, weighted=False)
    n = 40
    g = build_dist_graph(src, dst, None, n, 4, 2, store_push=True)
    mg = mg_edge_betweenness_centrality(g, mesh, normalized=True,
                                        directed=True)
    G = ct.Graph(directed=True)
    G.from_edgelist(src, dst, None, vertices=np.arange(n), renumber=False)
    sg = ct.edge_betweenness_centrality(G, normalized=True)
    mg_s = mg.sort_values(["src", "dst"]).reset_index(drop=True)
    sg_s = sg.sort_values(["src", "dst"]).reset_index(drop=True)
    assert len(mg_s) == len(sg_s)
    np.testing.assert_array_equal(mg_s["src"], sg_s["src"])
    np.testing.assert_allclose(
        mg_s["betweenness_centrality"].to_numpy(),
        sg_s["betweenness_centrality"].to_numpy(), rtol=1e-4, atol=1e-7)
