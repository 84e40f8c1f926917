"""Graph500-style BFS parent-tree validation (testing/graph500.py).

Reference: cpp/tests/traversal/mg_graph500_bfs_test.cu:768-983 runs the same
rule set after every BFS; here the validator is exercised positively (real
bfs/mg_bfs outputs pass) and negatively (corrupted trees are caught with the
right rule named).
"""

import numpy as np
import pytest

import cugraph_tpu
from cugraph_tpu.testing import (teps_summary, validate_bfs_tree,
                                 validate_sssp_tree)


def _random_graph(n, m, seed, directed):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    key = np.unique(src[keep] * n + dst[keep])
    return (key // n).astype(np.int64), (key % n).astype(np.int64)


@pytest.mark.parametrize("directed", [False, True])
def test_bfs_output_validates(directed):
    n = 300
    src, dst = _random_graph(n, 1500, 11, directed)
    G = cugraph_tpu.Graph(directed=directed)
    G.from_edgelist(src, dst, None)
    root = int(src[0])
    df = cugraph_tpu.bfs(G, root).sort_values("vertex")
    assert validate_bfs_tree(src, dst, root, df["distance"].to_numpy(),
                             df["predecessor"].to_numpy(), directed=directed)


def test_disconnected_component_validates():
    # two components; BFS from one must leave the other untouched
    src = np.array([0, 1, 2, 5, 6], np.int64)
    dst = np.array([1, 2, 3, 6, 7], np.int64)
    G = cugraph_tpu.Graph()
    G.from_edgelist(src, dst, None)
    df = cugraph_tpu.bfs(G, 0).sort_values("vertex")
    dist, pred = df["distance"].to_numpy(), df["predecessor"].to_numpy()
    verts = df["vertex"].to_numpy()
    assert validate_bfs_tree(src, dst, 0, dist, pred, directed=False,
                             vertices=verts)
    at5 = int(np.flatnonzero(verts == 5)[0])
    assert dist[at5] == 2**31 - 1 and pred[at5] == -1


def test_validator_catches_corruptions():
    n = 200
    src, dst = _random_graph(n, 1200, 3, False)
    G = cugraph_tpu.Graph()
    G.from_edgelist(src, dst, None)
    root = int(src[0])
    df = cugraph_tpu.bfs(G, root).sort_values("vertex")
    dist = df["distance"].to_numpy().copy()
    pred = df["predecessor"].to_numpy().copy()
    reached = np.flatnonzero((dist < 2**31 - 1)
                             & (np.arange(n) != root))

    # rule 3: distance(v) != distance(parent) + 1
    bad = dist.copy()
    bad[reached[0]] += 5
    with pytest.raises(AssertionError,
                       match="distance|distances differ"):
        validate_bfs_tree(src, dst, root, bad, pred)

    # rule 6: fabricated parent that is not an edge
    v = int(reached[0])
    nbrs = set(dst[src == v]) | set(src[dst == v])
    non_nbr = next(u for u in range(n) if u not in nbrs and u != v)
    bad_pred = pred.copy()
    bad_pred[v] = non_nbr
    with pytest.raises(AssertionError):
        validate_bfs_tree(src, dst, root, dist, bad_pred)

    # rule 5: chopping off a reached vertex breaks component coverage
    bad = dist.copy()
    bad_pred = pred.copy()
    bad[v] = 2**31 - 1
    bad_pred[v] = -1
    with pytest.raises(AssertionError, match="component|predecessor"):
        validate_bfs_tree(src, dst, root, bad, bad_pred)

    # rule 1: root distance must be zero
    bad = dist.copy()
    bad[root] = 1
    with pytest.raises(AssertionError, match="root"):
        validate_bfs_tree(src, dst, root, bad, pred)


def test_mg_bfs_output_validates():
    import jax

    from cugraph_tpu.parallel import (build_dist_graph, make_mesh_2d,
                                      mesh_shape_for, mg_bfs)
    from cugraph_tpu.parallel.mesh import shard_dist_graph

    n = 240
    src, dst = _random_graph(n, 1600, 5, True)
    pmaj, pmin = mesh_shape_for(len(jax.devices()))
    g = build_dist_graph(src, dst, None, n, pmaj, pmin, store_push=True)
    mesh = make_mesh_2d(pmaj, pmin)
    g = shard_dist_graph(g, mesh)
    root = int(src[0])
    d, p = mg_bfs(g, mesh, root)
    d = np.asarray(d)[:n].astype(np.int64)
    p = np.asarray(p)[:n].astype(np.int64)
    d = np.where(d >= np.iinfo(np.int32).max, 2**31 - 1, d)
    assert validate_bfs_tree(src, dst, root, d, p, directed=True)


@pytest.mark.parametrize("directed", [False, True])
def test_sssp_output_validates(directed):
    n = 300
    src, dst = _random_graph(n, 1500, 13, directed)
    w = (1.0 - np.random.default_rng(4).random(len(src))).astype(np.float32)
    G = cugraph_tpu.Graph(directed=directed)
    G.from_edgelist(src, dst, w)
    root = int(src[0])
    df = cugraph_tpu.sssp(G, root).sort_values("vertex")
    assert validate_sssp_tree(src, dst, w, root, df["distance"].to_numpy(),
                              df["predecessor"].to_numpy(), directed=directed,
                              vertices=df["vertex"].to_numpy())


def test_sssp_validator_catches_corruptions():
    n = 200
    src, dst = _random_graph(n, 1200, 9, False)
    w = (1.0 - np.random.default_rng(6).random(len(src))).astype(np.float32)
    G = cugraph_tpu.Graph()
    G.from_edgelist(src, dst, w)
    root = int(src[0])
    df = cugraph_tpu.sssp(G, root).sort_values("vertex")
    verts = df["vertex"].to_numpy()
    dist = df["distance"].to_numpy().copy()
    pred = df["predecessor"].to_numpy().copy()
    fmax = np.finfo(np.float32).max
    reached = np.flatnonzero((dist < fmax) & (verts != root))

    # rule 3: distance(v) != distance(parent) + w
    bad = dist.copy()
    bad[reached[0]] += 5.0
    with pytest.raises(AssertionError, match="distance"):
        validate_sssp_tree(src, dst, w, root, bad, pred, vertices=verts)

    # rule 6: fabricated parent that is not an edge
    i = int(reached[0])
    v = int(verts[i])
    nbrs = set(dst[src == v]) | set(src[dst == v])
    non_nbr = next(u for u in range(n) if u not in nbrs and u != v)
    bad_pred = pred.copy()
    bad_pred[i] = non_nbr
    with pytest.raises(AssertionError):
        validate_sssp_tree(src, dst, w, root, dist, bad_pred, vertices=verts)

    # rule 2: a 2-cycle in the parent pointers backtraces nowhere
    a, b = None, None
    pos = {int(vv): k for k, vv in enumerate(verts)}
    for k in reached[1:]:
        pk = int(pred[k])
        if pk != root and pred[pos[pk]] != -1:
            a, b = int(k), pos[pk]
            break
    if a is not None:
        bad_pred = pred.copy()
        bad_dist = dist.copy()
        bad_pred[b] = int(verts[a])
        bad_dist[a] = bad_dist[b]  # keep rule-3 plausible for zero-w chains
        with pytest.raises(AssertionError):
            validate_sssp_tree(src, dst, w, root, bad_dist, bad_pred,
                               vertices=verts)

    # rule 4: an edge that would relax further
    bad = dist.copy()
    bad[reached[-1]] = dist.max() * 3 + 7
    with pytest.raises(AssertionError):
        validate_sssp_tree(src, dst, w, root, bad, pred, vertices=verts)


def test_teps_summary():
    s = teps_summary([100.0, 100.0], [1.0, 2.0])
    assert s["num_search_keys"] == 2
    assert s["teps_arithmetic_mean"] == pytest.approx(75.0)
    assert s["teps_harmonic_mean"] == pytest.approx(200.0 / 3.0)
