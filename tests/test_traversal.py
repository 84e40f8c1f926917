"""BFS / SSSP vs NetworkX — mirrors reference
python/cugraph/cugraph/tests/traversal/."""

import numpy as np
import networkx as nx

import cugraph_tpu as ctpu
from cugraph_tpu.algos.traversal import INT32_INF
from tests.utils import karate, random_directed, random_undirected, disconnected


def _check_bfs(G, Gnx, start):
    df = ctpu.bfs(G, start)
    ref = nx.single_source_shortest_path_length(Gnx, start)
    got = dict(zip(df["vertex"], df["distance"]))
    pred = dict(zip(df["vertex"], df["predecessor"]))
    for v in Gnx.nodes():
        if v in ref:
            assert got[v] == ref[v], (v, got[v], ref[v])
            if v != start:
                p = pred[v]
                assert p is not None and p != -1
                assert Gnx.has_edge(p, v)
                assert got[p] == got[v] - 1
        else:
            assert got[v] == INT32_INF
            assert pred[v] == -1 or pred[v] is None


def test_bfs_karate():
    G, Gnx = karate()
    _check_bfs(G, Gnx, 0)
    _check_bfs(G, Gnx, 33)


def test_bfs_directed():
    G, Gnx = random_directed(n=70, m=180, seed=13)
    _check_bfs(G, Gnx, 0)


def test_bfs_disconnected():
    G, Gnx = disconnected()
    _check_bfs(G, Gnx, 0)


def test_bfs_depth_limit():
    G, Gnx = karate()
    df = ctpu.bfs(G, 0, depth_limit=1)
    got = dict(zip(df["vertex"], df["distance"]))
    ref = nx.single_source_shortest_path_length(Gnx, 0, cutoff=1)
    for v in Gnx.nodes():
        if v in ref:
            assert got[v] == ref[v]
        else:
            assert got[v] == INT32_INF


def _check_sssp(G, Gnx, start):
    df = ctpu.sssp(G, start)
    ref = nx.single_source_dijkstra_path_length(Gnx, start)
    got = dict(zip(df["vertex"], df["distance"]))
    for v in Gnx.nodes():
        if v in ref:
            assert abs(got[v] - ref[v]) < 1e-4, (v, got[v], ref[v])
        else:
            assert got[v] > 1e30


def test_sssp_weighted_directed():
    G, Gnx = random_directed(n=60, m=240, seed=7, weighted=True)
    _check_sssp(G, Gnx, 0)


def test_sssp_weighted_undirected():
    G, Gnx = random_undirected(n=50, m=160, seed=21, weighted=True)
    _check_sssp(G, Gnx, 5)


def test_sssp_predecessor_validity():
    G, Gnx = random_directed(n=40, m=160, seed=17, weighted=True)
    df = ctpu.sssp(G, 0)
    got = dict(zip(df["vertex"], df["distance"]))
    for row in df.itertuples():
        if row.predecessor not in (None, -1) and row.vertex != 0:
            p = row.predecessor
            assert Gnx.has_edge(p, row.vertex)
            w = Gnx[p][row.vertex]["weight"]
            assert abs(got[p] + w - row.distance) < 1e-4


def test_filter_unreachable():
    G, Gnx = disconnected()
    df = ctpu.filter_unreachable(ctpu.bfs(G, 0))
    reach = set(nx.single_source_shortest_path_length(Gnx, 0))
    assert set(df["vertex"]) == reach


def test_k_hop_neighbors():
    G, Gnx = karate()
    df = ctpu.algos.traversal.k_hop_neighbors(G, [0], 2)
    ref = set(nx.single_source_shortest_path_length(Gnx, 0, cutoff=2)) - {0}
    assert set(df["vertex"]) == ref


def test_extract_bfs_paths_unreachable_destination():
    import cugraph_tpu as ct

    G = ct.Graph(directed=True)
    G.from_edgelist(np.array([0, 3]), np.array([1, 4]), None,
                    vertices=np.arange(5), renumber=False)
    df = ct.bfs(G, 0)
    # vertex 4 is unreachable from 0: must not blow up max_len
    offs, paths, max_len = ct.extract_bfs_paths(G, df, [1, 4])
    assert max_len <= 3
    row4 = paths[max_len: 2 * max_len]
    assert np.all(row4 == -1)


def test_bfs_sssp_legacy_params():
    """Reference wrapper compat: directed= raises TypeError on Graph input,
    return_predecessors=False keeps the column but skips compute, sssp
    accepts the legacy indices= source name."""
    import pytest

    G, _ = karate()
    with pytest.raises(TypeError, match="directed"):
        ctpu.bfs(G, 0, directed=True)
    with pytest.raises(TypeError, match="directed"):
        ctpu.sssp(G, 0, directed=True)
    r = ctpu.bfs(G, 0, return_predecessors=False)
    assert (r["predecessor"] == -1).all() and (r["distance"] >= 0).any()
    a = ctpu.sssp(G, indices=0).sort_values("vertex")
    b = ctpu.sssp(G, 0).sort_values("vertex")
    assert (a["distance"].to_numpy() == b["distance"].to_numpy()).all()
    with pytest.raises(ValueError):
        ctpu.sssp(G)


def test_device_pred_recovery_interpret(monkeypatch):
    """bfs/sssp on the Pallas route recover predecessors with ONE device
    eqsel_rel pass (traversal._pred_recover_device) instead of the host
    O(E) matcher — distances must match the XLA route exactly and the
    parent trees must pass the graph500 validators."""
    from cugraph_tpu.testing import validate_bfs_tree, validate_sssp_tree

    rng = np.random.default_rng(17)
    n, m = 500, 3500
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    key = np.unique(src[keep] * n + dst[keep])
    src, dst = (key // n).astype(np.int64), (key % n).astype(np.int64)
    w = (0.25 + rng.random(len(src))).astype(np.float32)

    G = ctpu.Graph(directed=True)
    G.from_edgelist(src, dst, w)
    root = int(src[0])
    bfs_xla = ctpu.bfs(G, root).sort_values("vertex")
    sssp_xla = ctpu.sssp(G, root).sort_values("vertex")

    monkeypatch.setenv("CUGRAPH_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("CUGRAPH_TPU_PALLAS_MIN_EDGES", "1")
    G2 = ctpu.Graph(directed=True)
    G2.from_edgelist(src, dst, w)
    bfs_dev = ctpu.bfs(G2, root).sort_values("vertex")
    sssp_dev = ctpu.sssp(G2, root).sort_values("vertex")

    np.testing.assert_array_equal(bfs_dev["distance"].to_numpy(),
                                  bfs_xla["distance"].to_numpy())
    np.testing.assert_allclose(sssp_dev["distance"].to_numpy(),
                               sssp_xla["distance"].to_numpy(), rtol=1e-5)
    validate_bfs_tree(src, dst, root, bfs_dev["distance"].to_numpy(),
                      bfs_dev["predecessor"].to_numpy(), directed=True,
                      vertices=bfs_dev["vertex"].to_numpy())
    validate_sssp_tree(src, dst, w, root, sssp_dev["distance"].to_numpy(),
                       sssp_dev["predecessor"].to_numpy(), directed=True,
                       vertices=sssp_dev["vertex"].to_numpy())
    # same max-id-parent convention as the host matcher on the BFS side
    np.testing.assert_array_equal(bfs_dev["predecessor"].to_numpy(),
                                  bfs_xla["predecessor"].to_numpy())
