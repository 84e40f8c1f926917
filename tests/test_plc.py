"""Stable-layer (pylibcugraph-style) API smoke + numeric tests."""

import numpy as np
import pytest

import cugraph_tpu.plc as plc


@pytest.fixture(scope="module")
def rh():
    return plc.ResourceHandle()


@pytest.fixture(scope="module")
def karate(rh):
    import networkx as nx

    Gx = nx.karate_club_graph()
    src = np.array([u for u, v in Gx.edges()], np.int32)
    dst = np.array([v for u, v in Gx.edges()], np.int32)
    return plc.SGGraph(
        rh, plc.GraphProperties(is_symmetric=True),
        src, dst, None, renumber=False, symmetrize=True), Gx


def test_sg_graph_basics(karate, rh):
    g, Gx = karate
    assert g.number_of_vertices() == 34
    # undirected edge count matches networkx (symmetrized pairs counted once)
    assert g.number_of_edges() == Gx.number_of_edges()


def test_plc_pagerank(karate, rh):
    import networkx as nx

    g, Gx = karate
    verts, pr = plc.pagerank(rh, g)
    nxpr = np.array([v for _, v in sorted(nx.pagerank(Gx, weight=None).items())])
    np.testing.assert_allclose(pr, nxpr, atol=1e-4)


def test_plc_bfs_sssp(karate, rh):
    g, Gx = karate
    dist, pred, verts = plc.bfs(rh, g, np.array([0]))
    assert dist[0] == 0 and dist.max() <= 5
    v, d, p = plc.sssp(rh, g, 0)
    np.testing.assert_array_equal(np.sort(v), np.arange(34))


def test_plc_community(karate, rh):
    g, _ = karate
    v, part, mod = plc.louvain(rh, g)
    assert mod > 0.3
    v2, cnt = plc.triangle_count(rh, g)
    assert cnt.sum() > 0
    v3, cn = plc.core_number(rh, g)
    assert cn.max() >= 4


def test_plc_components_similarity(karate, rh):
    g, _ = karate
    v, lab = plc.weakly_connected_components(rh, g)
    assert len(np.unique(lab)) == 1
    f, s, c = plc.jaccard_coefficients(rh, g, np.array([0, 1]), np.array([1, 2]))
    assert np.all((0 <= c) & (c <= 1))


def test_plc_degrees_misc(karate, rh):
    g, _ = karate
    v, ind, outd = plc.degrees(rh, g)
    assert ind.sum() == outd.sum() == 2 * g.number_of_edges()
    assert plc.count_multi_edges(rh, g) == 0
    assert plc.has_vertex(rh, g, [0, 33]).all()
    vs = plc.select_random_vertices(rh, g, 0, 5)
    assert len(vs) == 5


def test_plc_sampling(karate, rh):
    g, _ = karate
    df = plc.uniform_neighbor_sample(rh, g, [0, 1], [2, 2], random_state=0)
    assert len(df) > 0
    s, d = plc.negative_sampling(rh, g, 20, random_state=0)
    assert len(s) == 20


def test_plc_rmat(rh):
    s, d = plc.generate_rmat_edgelist(rh, 7, 8, 1024)
    assert len(s) == 1024 and s.max() < 256


def test_plc_mg_graph_pagerank(rh):
    import jax

    from cugraph_tpu.parallel.mesh import make_mesh_2d

    mesh = make_mesh_2d(4, 2, jax.devices()[:8])
    h = plc.ResourceHandle(mesh=mesh)
    rng = np.random.default_rng(0)
    src = rng.integers(0, 60, 400)
    dst = rng.integers(0, 60, 400)
    g = plc.MGGraph(h, plc.GraphProperties(), src, dst, None)
    v, pr = plc.pagerank(h, g, max_iterations=100, epsilon=1e-7)
    assert pr.sum() == pytest.approx(1.0, abs=1e-3)
    v2, lab = plc.weakly_connected_components(h, g)
    assert len(lab) == 60


def test_plc_mg_routing_extended(rh):
    import jax

    from cugraph_tpu.parallel.mesh import make_mesh_2d

    mesh = make_mesh_2d(4, 2, jax.devices()[:8])
    h = plc.ResourceHandle(mesh=mesh)
    rng = np.random.default_rng(1)
    src = rng.integers(0, 40, 300)
    dst = rng.integers(0, 40, 300)
    g = plc.MGGraph(h, plc.GraphProperties(), src, dst, None)

    v, core = plc.core_number(h, g, degree_type="incoming")
    assert len(core) == 40 and core.max() >= 1

    f, s, c = plc.jaccard_coefficients(h, g, np.array([0, 1]), np.array([2, 3]))
    assert np.all((0 <= c) & (c <= 1))

    paths = plc.uniform_random_walks(h, g, [0, 1], 4, random_state=1)
    assert paths.shape == (2, 5)

    df = plc.uniform_neighbor_sample(h, g, [0, 1], [2, 2], random_state=0)
    assert {"sources", "destinations", "hop_id"} <= set(df.columns)


def test_plc_review_fixes():
    """plc review regressions: induced_subgraph returns arrays, multi-source
    bfs uses every seed, renumber_arbitrary_edgelist maps to positions in
    the caller's map, CuGraphRandomState produces distinct streams."""
    import numpy as np

    from cugraph_tpu import plc

    h = plc.ResourceHandle()
    src = np.array([0, 1, 2, 3, 4])
    dst = np.array([1, 2, 3, 4, 0])
    g = plc.SGGraph(h, plc.GraphProperties(is_symmetric=False),
                    src, dst, np.ones(5, np.float32))

    s_, d_, w_, offs = plc.induced_subgraph(h, g, np.array([0, 1, 2]))
    assert len(s_) == len(d_) == len(w_) == 2  # edges 0-1, 1-2
    assert offs[-1] == len(s_)

    dist, pred, verts = plc.bfs(h, g, np.array([0, 3]))
    dd = dict(zip(verts, dist))
    assert dd[3] == 0 and dd[0] == 0 and dd[4] == 1 and dd[1] == 1

    s32, d32 = plc.renumber_arbitrary_edgelist(
        h, np.array([10, 20, 30, 40]), np.array([20, 30, 40]),
        np.array([30, 40, 10]))
    assert list(s32) == [1, 2, 3] and list(d32) == [2, 3, 0]

    r1 = plc.CuGraphRandomState(h, 1)
    r2 = plc.CuGraphRandomState(h, 2)
    e1 = plc.generate_rmat_edgelist(h, r1, scale=6, num_edges=100)
    e2 = plc.generate_rmat_edgelist(h, r2, scale=6, num_edges=100)
    assert not np.array_equal(np.asarray(e1[0]), np.asarray(e2[0]))
