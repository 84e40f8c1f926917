"""MG↔SG parity tests on the virtual 8-device CPU mesh.

The reference validates every MG algorithm by aggregating the distributed
graph to one GPU and re-running SG (tests/link_analysis/mg_pagerank_test.cpp:169-232);
here the distributed result (owner-sharded, gathered to host) is compared
against the single-shard implementation on the same edge list.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cugraph_tpu as ct
from cugraph_tpu.core.structure import build_structure_host
from cugraph_tpu.parallel import (
    build_dist_graph,
    mg_induced_subgraph,
    make_mesh_2d,
    mesh_shape_for,
    mg_bfs,
    mg_katz_centrality,
    mg_pagerank,
    mg_sssp,
    mg_wcc,
)
from cugraph_tpu.parallel.partition import Partition2D


def _random_coo(n=150, m=900, seed=0, weighted=True):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    # dedupe multi-edges so SG/MG accumulate identically
    uniq = np.unique(src * n + dst)
    src, dst = (uniq // n).astype(np.int64), (uniq % n).astype(np.int64)
    w = rng.uniform(0.5, 2.0, len(src)).astype(np.float32) if weighted else None
    return src, dst, w


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must force 8 CPU devices"
    return make_mesh_2d(4, 2, jax.devices()[:8])


def _sg_graph(src, dst, w, n, directed=True):
    G = ct.Graph(directed=directed)
    G.from_edgelist(src, dst, w, vertices=np.arange(n), renumber=False)
    return G


def test_mesh_shape_for():
    assert mesh_shape_for(8) == (4, 2)
    assert mesh_shape_for(4) == (2, 2)
    assert mesh_shape_for(1) == (1, 1)
    assert mesh_shape_for(6) == (3, 2)


def test_partition_roundtrip():
    part = Partition2D.create(100, 4, 2)
    v = np.arange(part.pad_v)
    i, j = part.owner(v)
    # ownership ranges are exactly the row-major (i, j) contiguous chunks
    for ii in range(4):
        for jj in range(2):
            lo, hi = part.owned_range(ii, jj)
            assert np.all(i[lo:hi] == ii) and np.all(j[lo:hi] == jj)
    # dst_local is the position inside concat_{i'} V_own(i', j)
    d = part.dst_local(v)
    assert d.min() >= 0 and d.max() < part.pmaj * part.chunk


def test_mg_pagerank_matches_sg(mesh):
    src, dst, w, n = *_random_coo(seed=1), 150
    g = build_dist_graph(src, dst, w, n, 4, 2, store_push=False)
    p, err, iters = mg_pagerank(g, mesh, tol=1e-8, max_iter=200)
    p = np.asarray(p)[:n]

    G = _sg_graph(src, dst, w, n)
    sg = ct.pagerank(G, tol=1e-8, max_iter=200).sort_values("vertex")
    np.testing.assert_allclose(p, sg["pagerank"].to_numpy(), rtol=2e-4, atol=1e-7)
    assert int(iters) > 1


def test_mg_pagerank_dangling_and_unweighted(mesh):
    # star + isolated chain: exercises dangling redistribution
    src = np.array([0, 0, 0, 1, 2, 5], np.int64)
    dst = np.array([1, 2, 3, 4, 4, 6], np.int64)
    n = 8  # vertex 7 isolated
    g = build_dist_graph(src, dst, None, n, 4, 2, store_push=False)
    p, err, _ = mg_pagerank(g, mesh, tol=1e-10, max_iter=300)
    G = _sg_graph(src, dst, None, n)
    sg = ct.pagerank(G, tol=1e-10, max_iter=300).sort_values("vertex")
    np.testing.assert_allclose(np.asarray(p)[:n], sg["pagerank"].to_numpy(),
                               rtol=2e-4, atol=1e-7)


def test_mg_bfs_matches_sg(mesh):
    src, dst, w = _random_coo(seed=2, weighted=False)
    n = 150
    g = build_dist_graph(src, dst, None, n, 4, 2, store_push=False)
    dist, pred = mg_bfs(g, mesh, source=3)
    dist, pred = np.asarray(dist)[:n], np.asarray(pred)[:n]

    G = _sg_graph(src, dst, None, n)
    sg = ct.bfs(G, start=3).sort_values("vertex")
    sg_dist = sg["distance"].to_numpy()
    mg_dist = np.where(dist == np.iinfo(np.int32).max, sg_dist.max() + 10, dist)
    sg_dist = np.where(sg_dist < 0, sg_dist.max() + 10, sg_dist)  # normalize inf codes
    reach = sg_dist <= n
    np.testing.assert_array_equal(mg_dist[reach], sg_dist[reach])
    # predecessor validity: pred's distance must be dist-1 and edge must exist
    edge_set = set(zip(src.tolist(), dst.tolist()))
    for v in range(n):
        if dist[v] not in (0, np.iinfo(np.int32).max):
            assert (int(pred[v]), v) in edge_set
            assert dist[pred[v]] == dist[v] - 1


def test_mg_sssp_matches_sg(mesh):
    src, dst, w, n = *_random_coo(seed=3), 150
    g = build_dist_graph(src, dst, w, n, 4, 2, store_push=False)
    dist, pred = mg_sssp(g, mesh, source=7)
    dist = np.asarray(dist)[:n]

    G = _sg_graph(src, dst, w, n)
    sg = ct.sssp(G, source=7).sort_values("vertex")
    sg_dist = sg["distance"].to_numpy()
    # SG encodes unreachable as float32 max (the reference's convention)
    sg_dist = np.where(sg_dist >= np.finfo(np.float32).max / 2, np.inf, sg_dist)
    np.testing.assert_allclose(dist, sg_dist, rtol=1e-5, atol=1e-5)


def test_mg_wcc_matches_sg(mesh):
    src, dst, _ = _random_coo(n=80, m=120, seed=4, weighted=False)
    n = 80
    g = build_dist_graph(src, dst, None, n, 4, 2, store_push=True)
    lab = np.asarray(mg_wcc(g, mesh))[:n]

    G = _sg_graph(src, dst, None, n, directed=False)
    sg = ct.weakly_connected_components(G).sort_values("vertex")
    sg_lab = sg["labels"].to_numpy()
    # same partition: vertices share an MG label iff they share an SG label
    from collections import defaultdict

    mg_groups, sg_groups = defaultdict(set), defaultdict(set)
    for v in range(n):
        mg_groups[lab[v]].add(v)
        sg_groups[sg_lab[v]].add(v)
    assert sorted(map(sorted, mg_groups.values())) == sorted(
        map(sorted, sg_groups.values()))


def test_mg_katz_matches_sg(mesh):
    src, dst, w, n = *_random_coo(seed=5), 150
    g = build_dist_graph(src, dst, w, n, 4, 2, store_push=False)
    alpha = 0.05
    c, err, _ = mg_katz_centrality(g, mesh, alpha=alpha, tol=1e-9, max_iter=500)
    c = np.asarray(c)[:n]
    G = _sg_graph(src, dst, w, n)
    sg = ct.katz_centrality(G, alpha=alpha, tol=1e-9, max_iter=500).sort_values("vertex")
    np.testing.assert_allclose(c, sg["katz_centrality"].to_numpy(),
                               rtol=1e-3, atol=1e-6)


def test_mg_graphsage_train_step(mesh):
    import optax

    from cugraph_tpu.nn import graphsage_init
    from cugraph_tpu.parallel.nn import (
        make_mg_train_step,
        mg_graphsage_apply,
        replicate,
        shard_vertex_data,
    )

    src, dst, _ = _random_coo(n=100, m=500, seed=6, weighted=False)
    n = 100
    g = build_dist_graph(src, dst, None, n, 4, 2, store_push=False)
    from cugraph_tpu.parallel.mesh import shard_dist_graph

    g = shard_dist_graph(g, mesh)

    rng = np.random.default_rng(0)
    F, H, C = 8, 16, 3
    x = rng.normal(size=(g.pad_v, F)).astype(np.float32)
    labels = rng.integers(0, C, g.pad_v).astype(np.int32)
    mask = np.zeros(g.pad_v, bool)
    mask[:n] = True
    x, labels, mask = shard_vertex_data(mesh, x, jnp.asarray(labels),
                                        jnp.asarray(mask))

    params = replicate(mesh, graphsage_init(jax.random.key(0), F, H, C))
    opt = optax.adam(1e-2)
    opt_state = replicate(mesh, opt.init(params))
    step = make_mg_train_step(g, mesh, opt)

    losses = []
    for _ in range(15):
        params, opt_state, loss = step(params, opt_state, x, labels, mask)
        losses.append(float(loss))
    assert losses[-1] < losses[0]  # it learns

    # MG forward == SG forward on the same graph/params
    sg_struct = build_structure_host(src, dst, None, n)
    from cugraph_tpu.nn import graphsage_apply

    params_host = jax.tree.map(np.asarray, params)
    x_host = np.asarray(x)
    pad_sg = sg_struct.pad_v
    x_sg = np.zeros((pad_sg, F), np.float32)
    x_sg[:n] = x_host[:n]
    sg_logits = np.asarray(graphsage_apply(params_host, sg_struct,
                                           jnp.asarray(x_sg)))[:n]
    mg_logits = np.asarray(mg_graphsage_apply(params, g, mesh, x))[:n]
    np.testing.assert_allclose(mg_logits, sg_logits, rtol=2e-4, atol=2e-4)


def test_mg_hits_matches_sg(mesh):
    src, dst, _ = _random_coo(n=100, m=600, seed=8, weighted=False)
    n = 100
    g = build_dist_graph(src, dst, None, n, 4, 2, store_push=True)
    from cugraph_tpu.parallel import mg_hits

    h, a, err, iters = mg_hits(g, mesh, tol=1e-8, max_iter=300)
    h, a = np.asarray(h)[:n], np.asarray(a)[:n]

    G = _sg_graph(src, dst, None, n)
    sg = ct.hits(G, tol=1e-8, max_iter=300).sort_values("vertex")
    np.testing.assert_allclose(h, sg["hubs"].to_numpy(), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(a, sg["authorities"].to_numpy(), rtol=1e-3,
                               atol=1e-5)


def test_mg_eigenvector_matches_sg(mesh):
    # symmetric graph for a well-defined principal eigenvector
    src, dst, _ = _random_coo(n=80, m=500, seed=9, weighted=False)
    n = 80
    # symmetrize with dedupe (MG symmetrize=True keeps reciprocal duplicates,
    # while the undirected SG Graph dedupes — build identical edge sets)
    key = np.unique(np.concatenate([src * n + dst, dst * n + src]))
    src, dst = key // n, key % n
    g = build_dist_graph(src, dst, None, n, 4, 2, store_push=False)
    from cugraph_tpu.parallel import mg_eigenvector_centrality

    c, err, iters = mg_eigenvector_centrality(g, mesh, tol=1e-8, max_iter=500)
    c = np.asarray(c)[:n]

    G = _sg_graph(src, dst, None, n, directed=False)
    sg = ct.eigenvector_centrality(G, tol=1e-8, max_iter=500).sort_values("vertex")
    np.testing.assert_allclose(c, sg["eigenvector_centrality"].to_numpy(),
                               rtol=1e-3, atol=1e-4)


def test_mg_uniform_neighbor_sample(mesh):
    src, dst, _ = _random_coo(n=60, m=500, seed=10, weighted=False)
    n = 60
    g = build_dist_graph(src, dst, None, n, 4, 2, store_push=True)
    from cugraph_tpu.parallel import mg_uniform_neighbor_sample

    df = mg_uniform_neighbor_sample(g, mesh, [0, 1, 2], [3, 2], seed=5)
    assert len(df) > 0
    edge_set = set(zip(src.tolist(), dst.tolist()))
    for _, r in df.iterrows():
        assert (int(r["sources"]), int(r["destinations"])) in edge_set
    # hop-0 sources are exactly (a subset of) the seeds
    assert set(df[df.hop_id == 0]["sources"]) <= {0, 1, 2}
    # no more than k samples per (source, hop)
    cnt = df.groupby(["hop_id", "sources"]).size()
    assert cnt[0].max() <= 3 if 0 in cnt.index.get_level_values(0) else True
    # without replacement: samples per source are distinct
    for (h, s), grp in df.groupby(["hop_id", "sources"]):
        assert grp["destinations"].is_unique


def test_mg_core_number_matches_sg(mesh):
    src, dst, _ = _random_coo(n=60, m=300, seed=11, weighted=False)
    n = 60
    key = np.unique(np.concatenate([src * n + dst, dst * n + src]))
    src, dst = key // n, key % n
    g = build_dist_graph(src, dst, None, n, 4, 2, store_push=True)
    from cugraph_tpu.parallel import mg_core_number

    core = np.asarray(mg_core_number(g, mesh, degree_type="incoming"))[:n]

    import networkx as nx

    Gx = nx.Graph()
    Gx.add_nodes_from(range(n))
    Gx.add_edges_from(zip(src.tolist(), dst.tolist()))
    Gx.remove_edges_from(nx.selfloop_edges(Gx))
    expect = nx.core_number(Gx)
    np.testing.assert_array_equal(core, [expect[v] for v in range(n)])


def test_mg_random_walks(mesh):
    src, dst, _ = _random_coo(n=60, m=600, seed=12, weighted=False)
    n = 60
    g = build_dist_graph(src, dst, None, n, 4, 2, store_push=True)
    from cugraph_tpu.parallel import mg_uniform_random_walks

    paths = mg_uniform_random_walks(g, mesh, [0, 1, 2, 3], 5, seed=3)
    assert paths.shape == (4, 6)
    edge_set = set(zip(src.tolist(), dst.tolist()))
    for row in paths:
        for a, b in zip(row, row[1:]):
            if b == -1:
                break
            assert (int(a), int(b)) in edge_set


def test_mg_similarity_matches_sg(mesh):
    src, dst, _ = _random_coo(n=60, m=600, seed=13, weighted=False)
    n = 60
    g = build_dist_graph(src, dst, None, n, 4, 2, store_push=False)
    from cugraph_tpu.parallel import mg_jaccard_coefficients

    rng = np.random.default_rng(0)
    firsts = rng.integers(0, n, 20)
    seconds = rng.integers(0, n, 20)
    mg = mg_jaccard_coefficients(g, mesh, firsts, seconds)

    # oracle: out-neighbor jaccard
    from collections import defaultdict

    out_nbrs = defaultdict(set)
    for s, d in zip(src, dst):
        out_nbrs[s].add(d)
    for p, (u, v) in enumerate(zip(firsts, seconds)):
        a, b = out_nbrs[u], out_nbrs[v]
        expect = len(a & b) / len(a | b) if (a | b) else 0.0
        np.testing.assert_allclose(mg[p], expect, atol=1e-6)


def test_mg_louvain_quality(mesh):
    # planted 4-community graph: MG louvain must recover high modularity
    rng = np.random.default_rng(5)
    n_half, n_comm = 20, 4
    n = n_half * n_comm
    edges = set()
    for c in range(n_comm):
        base = c * n_half
        for _ in range(150):
            u, v = rng.integers(0, n_half, 2)
            if u != v:
                edges.add((base + u, base + v))
    for _ in range(20):  # sparse inter-community noise
        u, v = rng.integers(0, n, 2)
        if u != v:
            edges.add((u, v))
    src, dst = np.array(sorted(edges)).T
    key = np.unique(np.concatenate([src * n + dst, dst * n + src]))
    src, dst = key // n, key % n

    g = build_dist_graph(src, dst, None, n, 4, 2, store_push=True)
    from cugraph_tpu.parallel.louvain import mg_louvain

    labels, q = mg_louvain(g, mesh)
    assert len(labels) == n

    G = _sg_graph(src, dst, None, n, directed=False)
    _, q_sg = ct.louvain(G)
    # distributed quality within 10% of the single-device result
    assert q > 0.5 * float(q_sg) and q > 0.3
    # communities mostly align with the planted structure
    from collections import Counter

    majority = 0
    for c in range(n_comm):
        blk = labels[c * n_half:(c + 1) * n_half]
        majority += Counter(blk.tolist()).most_common(1)[0][1]
    assert majority / n > 0.8


def test_mg_k_core(mesh):
    src, dst, _ = _random_coo(n=50, m=260, seed=14, weighted=False)
    n = 50
    key = np.unique(np.concatenate([src * n + dst, dst * n + src]))
    src, dst = key // n, key % n
    g = build_dist_graph(src, dst, None, n, 4, 2, store_push=True)
    from cugraph_tpu.parallel import mg_k_core

    ks, kd, kw, core = mg_k_core(g, mesh, k=2, degree_type="incoming")
    assert np.all(core[ks] >= 2) and np.all(core[kd] >= 2)
    # oracle: networkx k_core edge set
    import networkx as nx

    Gx = nx.Graph(); Gx.add_nodes_from(range(n))
    Gx.add_edges_from(zip(src.tolist(), dst.tolist()))
    Gx.remove_edges_from(nx.selfloop_edges(Gx))
    H = nx.k_core(Gx, 2)
    got = set(map(tuple, np.sort(np.stack([ks, kd], 1), axis=1).tolist()))
    got = {e for e in got if e[0] != e[1]}
    expect = {tuple(sorted(e)) for e in H.edges()}
    assert got == expect


def test_mg_betweenness_matches_networkx(mesh):
    src, dst, _ = _random_coo(n=40, m=200, seed=15, weighted=False)
    n = 40
    g = build_dist_graph(src, dst, None, n, 4, 2, store_push=True)
    from cugraph_tpu.parallel import mg_betweenness_centrality

    bc = mg_betweenness_centrality(g, mesh, normalized=True)[:n]

    import networkx as nx

    Gx = nx.DiGraph()
    Gx.add_nodes_from(range(n))
    Gx.add_edges_from(zip(src.tolist(), dst.tolist()))
    expect = nx.betweenness_centrality(Gx, normalized=True)
    np.testing.assert_allclose(bc, [expect[v] for v in range(n)],
                               rtol=1e-4, atol=1e-6)


def test_mg_bfs_multi_root_matches_networkx(mesh):
    src, dst, _ = _random_coo(n=80, m=400, seed=21, weighted=False)
    g = build_dist_graph(src, dst, None, 80, 4, 2, store_push=True)
    roots = [3, 40, 77]
    dist, pred = mg_bfs(g, mesh, roots)
    dist = np.asarray(dist)[:80]
    pred = np.asarray(pred)[:80]

    import networkx as nx

    Gx = nx.DiGraph()
    Gx.add_nodes_from(range(80))
    Gx.add_edges_from(zip(src.tolist(), dst.tolist()))
    INT_INF = np.iinfo(np.int32).max
    expect = np.full(80, INT_INF, np.int64)
    for r in roots:
        for v, d in nx.single_source_shortest_path_length(Gx, r).items():
            expect[v] = min(expect[v], d)
    np.testing.assert_array_equal(np.where(dist >= INT_INF, INT_INF, dist),
                                  expect)
    # predecessors: any in-neighbor one level closer
    edge_set = set(zip(src.tolist(), dst.tolist()))
    for v in range(80):
        if expect[v] not in (0, INT_INF):
            assert (int(pred[v]), v) in edge_set
            assert expect[pred[v]] + 1 == expect[v]


def test_mg_betweenness_endpoints_matches_networkx(mesh):
    src, dst, _ = _random_coo(n=40, m=200, seed=15, weighted=False)
    n = 40
    g = build_dist_graph(src, dst, None, n, 4, 2, store_push=True)
    from cugraph_tpu.parallel import mg_betweenness_centrality

    bc = mg_betweenness_centrality(g, mesh, normalized=True,
                                   endpoints=True)[:n]

    import networkx as nx

    Gx = nx.DiGraph()
    Gx.add_nodes_from(range(n))
    Gx.add_edges_from(zip(src.tolist(), dst.tolist()))
    expect = nx.betweenness_centrality(Gx, normalized=True, endpoints=True)
    np.testing.assert_allclose(bc, [expect[v] for v in range(n)],
                               rtol=1e-4, atol=1e-6)


def test_mg_biased_sampling_prefers_heavy_edges(mesh):
    # vertex 0 → {1..9}: edge to 5 has weight 100, others 0.01
    src = np.zeros(9, np.int64)
    dst = np.arange(1, 10)
    w = np.full(9, 0.01, np.float32)
    w[4] = 100.0  # edge 0→5
    n = 10
    g = build_dist_graph(src, dst, w, n, 4, 2, store_push=True)
    from cugraph_tpu.parallel import mg_biased_neighbor_sample

    hits5 = 0
    for s in range(20):
        df = mg_biased_neighbor_sample(g, mesh, [0], [1], seed=s,
                                       with_replacement=True)
        if len(df) and int(df["destinations"].iloc[0]) == 5:
            hits5 += 1
    assert hits5 >= 18  # weight 100 vs 0.08 total → nearly always picked


def test_mg_scc_matches_networkx(mesh):
    src, dst, _ = _random_coo(n=40, m=160, seed=16, weighted=False)
    n = 40
    g = build_dist_graph(src, dst, None, n, 4, 2, store_push=True)
    from cugraph_tpu.parallel import mg_strongly_connected_components

    lab = mg_strongly_connected_components(g, mesh)[:n]

    import networkx as nx

    Gx = nx.DiGraph()
    Gx.add_nodes_from(range(n))
    Gx.add_edges_from(zip(src.tolist(), dst.tolist()))
    expect_groups = sorted(sorted(c) for c in
                           nx.strongly_connected_components(Gx))
    from collections import defaultdict

    got = defaultdict(list)
    for v in range(n):
        got[lab[v]].append(v)
    got_groups = sorted(sorted(g_) for g_ in got.values())
    assert got_groups == expect_groups


def test_mg_triangle_count_matches_networkx(mesh):
    src, dst, _ = _random_coo(n=30, m=160, seed=17, weighted=False)
    n = 30
    key = np.unique(np.concatenate([src * n + dst, dst * n + src]))
    src, dst = key // n, key % n
    keep = src != dst
    src, dst = src[keep], dst[keep]
    g = build_dist_graph(src, dst, None, n, 4, 2, store_push=False)
    from cugraph_tpu.parallel import mg_triangle_count

    t = mg_triangle_count(g, mesh)[:n]

    import networkx as nx

    Gx = nx.Graph()
    Gx.add_nodes_from(range(n))
    Gx.add_edges_from(zip(src.tolist(), dst.tolist()))
    expect = nx.triangles(Gx)
    np.testing.assert_array_equal(t, [expect[v] for v in range(n)])


def test_mg_leiden_no_disconnected_communities(mesh):
    rng = np.random.default_rng(6)
    n = 64
    edges = set()
    for c in range(4):
        base = c * 16
        for _ in range(100):
            u, v = rng.integers(0, 16, 2)
            if u != v:
                edges.add((base + u, base + v))
    for _ in range(12):
        u, v = rng.integers(0, n, 2)
        if u != v:
            edges.add((u, v))
    src, dst = np.array(sorted(edges)).T
    key = np.unique(np.concatenate([src * n + dst, dst * n + src]))
    src, dst = key // n, key % n
    g = build_dist_graph(src, dst, None, n, 4, 2, store_push=True)
    from cugraph_tpu.parallel import mg_leiden

    labels, q = mg_leiden(g, mesh)
    assert q > 0.3
    # Leiden guarantee: every community is connected over intra edges
    import networkx as nx

    Gx = nx.Graph()
    Gx.add_nodes_from(range(n))
    Gx.add_edges_from(zip(src.tolist(), dst.tolist()))
    for c in np.unique(labels):
        members = np.nonzero(labels == c)[0]
        sub = Gx.subgraph(members.tolist())
        assert nx.is_connected(sub), f"community {c} disconnected"


def test_mg_k_truss_matches_networkx(mesh):
    src, dst, _ = _random_coo(n=25, m=140, seed=18, weighted=False)
    n = 25
    key = np.unique(np.concatenate([src * n + dst, dst * n + src]))
    src, dst = key // n, key % n
    keep = src != dst
    src, dst = src[keep], dst[keep]
    g = build_dist_graph(src, dst, None, n, 4, 2, store_push=False)
    from cugraph_tpu.parallel import mg_k_truss

    ks, kd, kw = mg_k_truss(g, mesh, k=3)

    import networkx as nx

    Gx = nx.Graph()
    Gx.add_nodes_from(range(n))
    Gx.add_edges_from(zip(src.tolist(), dst.tolist()))
    H = nx.k_truss(Gx, 3)
    got = set(zip(ks.tolist(), kd.tolist()))
    expect = {tuple(sorted(e)) for e in H.edges()}
    assert got == expect


def test_mg_core_number_weighted_graph(mesh):
    # small weights must not shrink the h-index threshold cap
    src = np.array([0, 1, 2, 0, 1, 2])
    dst = np.array([1, 2, 0, 2, 0, 1])  # triangle, both directions
    w = np.full(6, 0.1, np.float32)
    g = build_dist_graph(src, dst, w, 3, 4, 2, store_push=True)
    from cugraph_tpu.parallel import mg_core_number

    core = np.asarray(mg_core_number(g, mesh, degree_type="incoming"))[:3]
    np.testing.assert_array_equal(core, [2, 2, 2])


def test_mg_similarity_weighted_graph_counts(mesh):
    # jaccard must use neighbor-SET sizes even when weights != 1
    src = np.array([0, 1])
    dst = np.array([2, 2])
    w = np.array([2.0, 3.0], np.float32)
    g = build_dist_graph(src, dst, w, 3, 4, 2, store_push=False)
    from cugraph_tpu.parallel import mg_jaccard_coefficients

    c = mg_jaccard_coefficients(g, mesh, [0], [1])
    np.testing.assert_allclose(c, [1.0])  # N(0)=N(1)={2}


def test_mg_random_walks_independent_duplicates(mesh):
    # duplicate walkers at the same start must not move in lockstep
    src = np.zeros(8, np.int64)
    dst = np.arange(1, 9)
    n = 9
    g = build_dist_graph(src, dst, None, n, 4, 2, store_push=True)
    from cugraph_tpu.parallel import mg_uniform_random_walks

    paths = mg_uniform_random_walks(g, mesh, [0] * 12, 1, seed=1)
    firsts = paths[:, 1]
    assert len(np.unique(firsts[firsts >= 0])) > 1


def test_mg_betweenness_unnormalized_matches_networkx(mesh):
    src, dst, _ = _random_coo(n=30, m=120, seed=19, weighted=False)
    n = 30
    g = build_dist_graph(src, dst, None, n, 4, 2, store_push=True)
    from cugraph_tpu.parallel import mg_betweenness_centrality

    bc = mg_betweenness_centrality(g, mesh, normalized=False)[:n]

    import networkx as nx

    Gx = nx.DiGraph()
    Gx.add_nodes_from(range(n))
    Gx.add_edges_from(zip(src.tolist(), dst.tolist()))
    expect = nx.betweenness_centrality(Gx, normalized=False)
    np.testing.assert_allclose(bc, [expect[v] for v in range(n)],
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("weighted", [False, True])
def test_mg_gcn_matches_sg(mesh, weighted):
    from cugraph_tpu.nn import gcn_model_init, gcn_apply
    from cugraph_tpu.parallel.nn import mg_gcn_apply, replicate, \
        shard_vertex_data
    from cugraph_tpu.parallel.mesh import shard_dist_graph

    src, dst, w = _random_coo(n=60, m=400, seed=20, weighted=weighted)
    n = 60
    g = shard_dist_graph(
        build_dist_graph(src, dst, w, n, 4, 2, store_push=False), mesh)

    rng = np.random.default_rng(0)
    F, H, C = 6, 12, 3
    params = replicate(mesh, gcn_model_init(jax.random.key(1), F, H, C))
    x = rng.normal(size=(g.pad_v, F)).astype(np.float32)
    xd = shard_vertex_data(mesh, jnp.asarray(x))
    mg_out = np.asarray(mg_gcn_apply(params, g, mesh, xd))[:n]

    sg_struct = build_structure_host(src, dst, w, n)
    x_sg = np.zeros((sg_struct.pad_v, F), np.float32)
    x_sg[:n] = x[:n]
    params_host = jax.tree.map(np.asarray, params)
    sg_out = np.asarray(gcn_apply(params_host, sg_struct,
                                  jnp.asarray(x_sg)))[:n]
    np.testing.assert_allclose(mg_out, sg_out, rtol=2e-4, atol=2e-4)


def test_mg_k_hop_and_egonet(mesh):
    src = np.array([0, 1, 2, 3], np.int64)
    dst = np.array([1, 2, 3, 4], np.int64)
    n = 6
    g = build_dist_graph(src, dst, None, n, 4, 2, store_push=False)
    from cugraph_tpu.parallel import mg_egonet, mg_k_hop_nbrs

    nbrs = mg_k_hop_nbrs(g, mesh, 0, 2)
    np.testing.assert_array_equal(nbrs, [1, 2])

    es, ed, ew, offs = mg_egonet(g, mesh, [0], radius=2)
    assert set(zip(es.tolist(), ed.tolist())) == {(0, 1), (1, 2)}
    assert list(offs) == [0, 2]


def test_mg_induced_subgraph(mesh):
    rng = np.random.default_rng(8)
    n, m = 150, 900
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    g = build_dist_graph(src, dst, np.ones(m, np.float32), n, 4, 2,
                         store_push=False)
    verts = np.arange(0, n, 3)
    s, d, w = mg_induced_subgraph(g, mesh, verts)
    vset = set(verts.tolist())
    ref = sum(1 for a, b in zip(src, dst) if a in vset and b in vset)
    assert len(s) == ref
    assert all(int(a) in vset and int(b) in vset for a, b in zip(s, d))


@pytest.mark.parametrize("layer", ["gat", "gatv2"])
def test_mg_attention_matches_sg(mesh, layer):
    from cugraph_tpu.nn import (gat_conv, gat_init, gatv2_conv, gatv2_init)
    from cugraph_tpu.parallel.nn import (mg_gat_conv, mg_gatv2_conv,
                                         replicate, shard_vertex_data)
    from cugraph_tpu.parallel.mesh import shard_dist_graph

    src, dst, _ = _random_coo(n=60, m=400, seed=21, weighted=False)
    n = 60
    g = shard_dist_graph(
        build_dist_graph(src, dst, None, n, 4, 2, store_push=False), mesh)

    rng = np.random.default_rng(1)
    F, D, H = 6, 5, 3
    init, sg_fn, mg_fn = {
        "gat": (gat_init, gat_conv, mg_gat_conv),
        "gatv2": (gatv2_init, gatv2_conv, mg_gatv2_conv),
    }[layer]
    params = replicate(mesh, init(jax.random.key(2), F, D, num_heads=H))
    x = rng.normal(size=(g.pad_v, F)).astype(np.float32)
    xd = shard_vertex_data(mesh, jnp.asarray(x))
    mg_out = np.asarray(mg_fn(params, g, mesh, xd))[:n]

    sg_struct = build_structure_host(src, dst, None, n)
    x_sg = np.zeros((sg_struct.pad_v, F), np.float32)
    x_sg[:n] = x[:n]
    params_host = jax.tree.map(np.asarray, params)
    sg_out = np.asarray(sg_fn(params_host, sg_struct, jnp.asarray(x_sg)))[:n]
    np.testing.assert_allclose(mg_out, sg_out, rtol=2e-4, atol=2e-4)


def test_mg_gin_appnp_match_sg(mesh):
    from cugraph_tpu.nn import appnp_propagate, gin_conv, gin_init
    from cugraph_tpu.parallel.nn import (mg_appnp_propagate, mg_gin_conv,
                                         replicate, shard_vertex_data)
    from cugraph_tpu.parallel.mesh import shard_dist_graph

    src, dst, w = _random_coo(n=60, m=400, seed=22, weighted=True)
    n = 60
    g = shard_dist_graph(
        build_dist_graph(src, dst, w, n, 4, 2, store_push=False), mesh)

    rng = np.random.default_rng(3)
    F = 6
    params = replicate(mesh, gin_init(jax.random.key(4), F, 10, 4))
    x = rng.normal(size=(g.pad_v, F)).astype(np.float32)
    xd = shard_vertex_data(mesh, jnp.asarray(x))
    sg_struct = build_structure_host(src, dst, w, n)
    x_sg = np.zeros((sg_struct.pad_v, F), np.float32)
    x_sg[:n] = x[:n]
    params_host = jax.tree.map(np.asarray, params)

    mg_out = np.asarray(mg_gin_conv(params, g, mesh, xd))[:n]
    sg_out = np.asarray(gin_conv(params_host, sg_struct, jnp.asarray(x_sg)))[:n]
    np.testing.assert_allclose(mg_out, sg_out, rtol=2e-4, atol=2e-4)

    mg_z = np.asarray(mg_appnp_propagate(g, mesh, xd, alpha=0.15, k=4))[:n]
    sg_z = np.asarray(appnp_propagate(sg_struct, jnp.asarray(x_sg),
                                      alpha=0.15, k=4))[:n]
    np.testing.assert_allclose(mg_z, sg_z, rtol=2e-4, atol=2e-4)


def test_dask_parity_alias_surface(tmp_path):
    """cugraph.dask export names resolve to the mg_* implementations
    (reference python/cugraph/cugraph/dask/__init__.py:6-38)."""
    import cugraph_tpu.parallel as dcg

    assert dcg.pagerank is dcg.mg_pagerank
    assert dcg.weakly_connected_components is dcg.mg_wcc
    assert dcg.ktruss_subgraph is dcg.mg_k_truss
    assert dcg.ego_graph is dcg.mg_egonet
    assert dcg.random_walks is dcg.mg_uniform_random_walks
    assert dcg.jaccard is dcg.mg_jaccard_coefficients
    for kind in ("jaccard", "sorensen", "overlap", "cosine"):
        assert callable(getattr(dcg, f"all_pairs_{kind}"))

    assert dcg.get_n_workers() >= 1
    p = tmp_path / "edges.csv"
    p.write_text("a,b\n" * 100)
    assert dcg.get_chunksize(p) >= 1

    import cugraph_tpu as ctpu
    assert isinstance(ctpu.__git_commit__, str)


def test_build_dist_graph_drop_flags(mesh):
    """drop_self_loops / drop_multi_edges (MGGraph graphs.pyx:167-168
    parity): duplicates and loops removed before partitioning, so MG matches
    SG (which always drops both for non-multigraphs) on dirty input."""
    rng = np.random.default_rng(21)
    src = rng.integers(0, 30, 250)
    dst = rng.integers(0, 30, 250)
    g = build_dist_graph(src, dst, None, 30, 4, 2, store_push=True,
                         drop_self_loops=True, drop_multi_edges=True)
    import cugraph_tpu as ct
    from cugraph_tpu.parallel import mg_betweenness_centrality

    bc = mg_betweenness_centrality(g, mesh, normalized=True)[:30]
    keep = src != dst
    G = ct.Graph(directed=True)
    G.from_edgelist(src[keep], dst[keep], None)
    sg = ct.betweenness_centrality(G, normalized=True)
    sgv = sg.sort_values("vertex")["betweenness_centrality"].to_numpy()
    np.testing.assert_allclose(bc, sgv, atol=1e-6)
