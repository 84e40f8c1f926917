"""MG smoke sweep: every MG-capable plc wrapper exercised against an MGGraph.

Round-2's lesson was that the plc wrapper layer holds the bugs, and VERDICT
round 2 flagged that the 64-wrapper sweep ran SG-only while ~24 wrappers
raised NotImplementedError on MGGraph despite having parallel.mg_* engines.
This sweep builds one MGGraph (with weights/types/times) on the 8-virtual-
device 4×2 mesh and calls every wrapper that has an MG path in the reference
(each algorithm .pyx accepts the MGGraph from graphs.pyx:357); wrappers the
reference itself keeps SG-only (legacy spectral/MST/FA2) must RAISE.

SG↔MG value parity is asserted where the algorithm is deterministic.
"""

import numpy as np
import pytest

from cugraph_tpu import plc


@pytest.fixture(scope="module")
def setup():
    import jax

    from cugraph_tpu.parallel.mesh import make_mesh_2d

    assert jax.device_count() >= 8, "conftest must force 8 CPU devices"
    mesh = make_mesh_2d(4, 2, jax.devices()[:8])
    rng = np.random.default_rng(6)
    src = rng.integers(0, 40, 260)
    dst = rng.integers(0, 40, 260)
    keep = src != dst
    pairs = np.unique(np.stack([src[keep], dst[keep]], 1), axis=0)
    src, dst = pairs[:, 0], pairs[:, 1]
    w = rng.uniform(0.5, 2.0, len(src)).astype(np.float32)
    et = rng.uniform(0, 10, len(src)).astype(np.float32)
    h = plc.ResourceHandle(mesh=mesh)
    g = plc.MGGraph(
        h, plc.GraphProperties(is_symmetric=False, is_multigraph=False),
        src, dst, w,
        edge_id_array=np.arange(len(src)),
        edge_type_array=np.zeros(len(src), np.int32),
        edge_start_time_array=et,
    )
    # drop_multi_edges: reciprocal input pairs would otherwise duplicate
    # under concatenation (the SG Graph class always dedupes non-multigraphs)
    gu = plc.MGGraph(
        h, plc.GraphProperties(is_symmetric=True, is_multigraph=False),
        np.concatenate([src, dst]), np.concatenate([dst, src]),
        np.concatenate([w, w]), drop_multi_edges=True)
    # SG twins for parity checks
    hs = plc.ResourceHandle()
    sg = plc.SGGraph(
        hs, plc.GraphProperties(is_symmetric=False, is_multigraph=False),
        src, dst, w, renumber=False, vertices_array=np.arange(40))
    sgu = plc.SGGraph(
        hs, plc.GraphProperties(is_symmetric=True, is_multigraph=False),
        np.concatenate([src, dst]), np.concatenate([dst, src]),
        np.concatenate([w, w]), renumber=False,
        vertices_array=np.arange(40))
    return h, g, gu, src, dst, w, hs, sg, sgu


def _nonempty(out):
    if out is None:
        return False
    if isinstance(out, tuple):
        return all(_nonempty(o) for o in out if o is not None)
    if np.isscalar(out) or isinstance(out, (int, float, bool, np.number)):
        return True
    try:
        return len(out) >= 0
    except TypeError:
        return True


MG_CALLS = [
    ("pagerank", lambda h, g, gu: plc.pagerank(h, g)),
    ("personalized_pagerank", lambda h, g, gu:
        plc.personalized_pagerank(h, g, np.array([0]), np.array([1.0]))),
    ("hits", lambda h, g, gu: plc.hits(h, g)),
    ("hits_with_guess", lambda h, g, gu:
        plc.hits(h, g, 1e-5, 60, np.arange(40), np.ones(40))),
    ("katz_centrality", lambda h, g, gu:
        plc.katz_centrality(h, g, None, alpha=0.005, beta=1.0,
                            epsilon=1e-4, max_iterations=200)),
    ("eigenvector_centrality", lambda h, g, gu:
        plc.eigenvector_centrality(h, gu, 1e-4, 200)),
    ("betweenness_centrality", lambda h, g, gu:
        plc.betweenness_centrality(h, g, 8, None, True, False)),
    ("edge_betweenness_centrality", lambda h, g, gu:
        plc.edge_betweenness_centrality(h, g, 8, None, True)),
    ("bfs", lambda h, g, gu: plc.bfs(h, g, np.array([0]))),
    ("bfs_multisource", lambda h, g, gu: plc.bfs(h, g, np.array([0, 3, 5]))),
    ("sssp", lambda h, g, gu: plc.sssp(h, g, 0, 1e9, True, False)),
    ("core_number", lambda h, g, gu:
        plc.core_number(h, gu, "bidirectional")),
    ("k_core", lambda h, g, gu: plc.k_core(h, gu, 2)),
    ("louvain", lambda h, g, gu: plc.louvain(h, gu, 10, 1e-7, 1.0)),
    ("leiden", lambda h, g, gu: plc.leiden(h, None, gu, 10, 1e-7, 1.0, 1.0)),
    ("ecg", lambda h, g, gu: plc.ecg(h, None, gu, ensemble_size=4)),
    ("triangle_count", lambda h, g, gu:
        plc.triangle_count(h, gu, start_list=np.array([0, 1]))),
    ("k_truss_subgraph", lambda h, g, gu: plc.k_truss_subgraph(h, gu, 3)),
    ("egonet", lambda h, g, gu: plc.egonet(h, gu, np.array([0]), 1)),
    ("ego_graph", lambda h, g, gu: plc.ego_graph(h, gu, np.array([0]), 1)),
    ("weakly_connected_components", lambda h, g, gu:
        plc.weakly_connected_components(h, g, None, None, None, False)),
    ("strongly_connected_components", lambda h, g, gu:
        plc.strongly_connected_components(h, g)),
    ("jaccard_coefficients", lambda h, g, gu:
        plc.jaccard_coefficients(h, gu, np.array([0, 1]), np.array([2, 3]),
                                 False, False)),
    ("sorensen_coefficients", lambda h, g, gu:
        plc.sorensen_coefficients(h, gu, np.array([0]), np.array([2]),
                                  False, False)),
    ("overlap_coefficients", lambda h, g, gu:
        plc.overlap_coefficients(h, gu, np.array([0]), np.array([2]),
                                 False, False)),
    ("cosine_coefficients", lambda h, g, gu:
        plc.cosine_coefficients(h, gu, np.array([0]), np.array([2]),
                                False, False)),
    ("all_pairs_jaccard_coefficients", lambda h, g, gu:
        plc.all_pairs_jaccard_coefficients(h, gu, topk=5)),
    ("all_pairs_sorensen_coefficients", lambda h, g, gu:
        plc.all_pairs_sorensen_coefficients(h, gu, topk=5)),
    ("all_pairs_overlap_coefficients", lambda h, g, gu:
        plc.all_pairs_overlap_coefficients(h, gu, topk=5)),
    ("all_pairs_cosine_coefficients", lambda h, g, gu:
        plc.all_pairs_cosine_coefficients(h, gu, topk=5)),
    ("uniform_neighbor_sample", lambda h, g, gu:
        plc.uniform_neighbor_sample(h, g, np.array([0, 1]), [3, 2])),
    ("homogeneous_uniform_neighbor_sample", lambda h, g, gu:
        plc.homogeneous_uniform_neighbor_sample(
            h, g, np.array([0, 1]), None, np.array([2], np.int32))),
    ("homogeneous_biased_neighbor_sample", lambda h, g, gu:
        plc.homogeneous_biased_neighbor_sample(
            h, g, np.array([0, 1]), None, np.array([2], np.int32))),
    ("heterogeneous_uniform_neighbor_sample", lambda h, g, gu:
        plc.heterogeneous_uniform_neighbor_sample(
            h, g, np.array([0, 1]), None, None, np.array([2], np.int32),
            num_edge_types=1)),
    ("heterogeneous_biased_neighbor_sample", lambda h, g, gu:
        plc.heterogeneous_biased_neighbor_sample(
            h, g, np.array([0, 1]), None, None, np.array([2], np.int32),
            num_edge_types=1)),
    ("homogeneous_uniform_temporal_neighbor_sample", lambda h, g, gu:
        plc.homogeneous_uniform_temporal_neighbor_sample(
            h, g, "edge_time", np.array([0, 1]), None, None,
            np.array([2], np.int32))),
    ("homogeneous_biased_temporal_neighbor_sample", lambda h, g, gu:
        plc.homogeneous_biased_temporal_neighbor_sample(
            h, g, np.array([0, 1]), np.array([2], np.int32))),
    ("heterogeneous_uniform_temporal_neighbor_sample", lambda h, g, gu:
        plc.heterogeneous_uniform_temporal_neighbor_sample(
            h, g, np.array([0, 1]), np.array([2], np.int32), 1)),
    ("heterogeneous_biased_temporal_neighbor_sample", lambda h, g, gu:
        plc.heterogeneous_biased_temporal_neighbor_sample(
            h, g, np.array([0, 1]), np.array([2], np.int32), 1)),
    ("negative_sampling", lambda h, g, gu:
        plc.negative_sampling(h, g, 10, plc.CuGraphRandomState(h, 3))),
    ("uniform_random_walks", lambda h, g, gu:
        plc.uniform_random_walks(h, g, np.array([0, 1]), 3)),
    ("biased_random_walks", lambda h, g, gu:
        plc.biased_random_walks(h, g, np.array([0, 1]), 3)),
    ("node2vec_random_walks", lambda h, g, gu:
        plc.node2vec_random_walks(h, g, np.array([0, 1]), 3, 1.0, 1.0)),
    ("induced_subgraph", lambda h, g, gu:
        plc.induced_subgraph(h, g, np.arange(10))),
    ("decompress_to_edgelist", lambda h, g, gu:
        plc.decompress_to_edgelist(h, g)),
    ("replicate_edgelist", lambda h, g, gu:
        plc.replicate_edgelist(h, graph=g)),
    ("extract_vertex_list", lambda h, g, gu:
        plc.extract_vertex_list(h, g)),
    ("select_random_vertices", lambda h, g, gu:
        plc.select_random_vertices(h, g, 7, 5)),
    ("two_hop_neighbors", lambda h, g, gu:
        plc.two_hop_neighbors(h, g, None)),
    ("get_two_hop_neighbors", lambda h, g, gu:
        plc.get_two_hop_neighbors(h, g, np.array([0, 1]))),
    ("degrees", lambda h, g, gu: plc.degrees(h, g, None, False)),
    ("in_degrees", lambda h, g, gu: plc.in_degrees(h, g, None)),
    ("out_degrees", lambda h, g, gu: plc.out_degrees(h, g, None)),
    ("has_vertex", lambda h, g, gu:
        plc.has_vertex(h, g, np.array([0, 10**6]))),
    ("count_multi_edges", lambda h, g, gu: plc.count_multi_edges(h, g)),
    ("edge_id_lookup_table", lambda h, g, gu:
        plc.edge_id_lookup_table(h, g).lookup_vertex_ids(
            np.array([0, 5, 10**6]))),
]


@pytest.mark.parametrize("name,call", MG_CALLS, ids=[c[0] for c in MG_CALLS])
def test_plc_mg_wrapper_smoke(setup, name, call):
    h, g, gu, src, dst, w, hs, sg, sgu = setup
    out = call(h, g, gu)
    assert _nonempty(out), name


# Wrappers the reference keeps SG-only (legacy spectral / MST / FA2:
# python/cugraph/cugraph/community/spectral_clustering.py, tree/
# minimum_spanning_tree.py, layout/force_atlas2.py have no dask variants)
# must refuse MGGraph rather than silently compute on the wrong engine.
SG_ONLY = [
    ("balanced_cut_clustering", lambda h, g:
        plc.balanced_cut_clustering(h, g, 3)),
    ("spectral_modularity_maximization", lambda h, g:
        plc.spectral_modularity_maximization(h, g, 3)),
    ("minimum_spanning_tree", lambda h, g:
        plc.minimum_spanning_tree(h, g)),
    ("force_atlas2", lambda h, g: plc.force_atlas2(h, g, max_iter=3)),
]


@pytest.mark.parametrize("name,call", SG_ONLY, ids=[c[0] for c in SG_ONLY])
def test_plc_sg_only_raises_on_mg(setup, name, call):
    h, g, gu, *_ = setup
    with pytest.raises(NotImplementedError):
        call(h, gu)


# ---- SG ↔ MG value parity where deterministic ------------------------------

def test_parity_pagerank(setup):
    h, g, gu, src, dst, w, hs, sg, sgu = setup
    vm, pm = plc.pagerank(h, g, epsilon=1e-10, max_iterations=300)
    vs, ps = plc.pagerank(hs, sg, epsilon=1e-10, max_iterations=300)
    np.testing.assert_allclose(pm, ps, atol=2e-4)


def test_parity_degrees(setup):
    h, g, gu, src, dst, w, hs, sg, sgu = setup
    vm, im, om = plc.degrees(h, g, None, False)
    vs, is_, os_ = plc.degrees(hs, sg, None, False)
    np.testing.assert_array_equal(im, is_)
    np.testing.assert_array_equal(om, os_)


def test_parity_wcc(setup):
    h, g, gu, src, dst, w, hs, sg, sgu = setup
    _, lm = plc.weakly_connected_components(h, g, None, None, None, False)
    _, ls = plc.weakly_connected_components(hs, sg, None, None, None, False)
    # same partition structure (labels may differ)
    import pandas as pd

    dfm = pd.Series(lm).groupby(lm).ngroup()
    dfs = pd.Series(ls).groupby(ls).ngroup()
    assert (pd.crosstab(dfm, dfs).astype(bool).sum(axis=1) == 1).all()


def test_parity_core_number(setup):
    # "incoming" on a symmetric COO = classic core numbers on BOTH engines
    # (SG undirected storage collapses every degree_type to classic —
    # algos/cores.py:198 — while MG "bidirectional" doubles like the
    # reference, so bidirectional is not comparable across the two here)
    h, g, gu, src, dst, w, hs, sg, sgu = setup
    _, cm = plc.core_number(h, gu, "incoming")
    _, cs = plc.core_number(hs, sgu, "incoming")
    np.testing.assert_array_equal(np.asarray(cm), np.asarray(cs))


def test_parity_triangle_count(setup):
    h, g, gu, src, dst, w, hs, sg, sgu = setup
    _, tm = plc.triangle_count(h, gu)
    _, ts = plc.triangle_count(hs, sgu)
    np.testing.assert_array_equal(np.asarray(tm), np.asarray(ts))


def test_parity_two_hop(setup):
    h, g, gu, src, dst, w, hs, sg, sgu = setup
    fm, sm = plc.two_hop_neighbors(h, g, None)
    fs, ss = plc.two_hop_neighbors(hs, sg, None)
    pm = set(zip(fm.tolist(), sm.tolist()))
    ps = set(zip(fs.tolist(), ss.tolist()))
    assert pm == ps


def test_parity_edge_id_lookup(setup):
    """SG↔MG edge-id lookup parity (lookup_src_dst_mg.cu vs _sg.cu): the
    distributed id-hash-sharded container resolves the same endpoints as
    the SG sorted table, including typed keys and missing ids."""
    h, g, gu, src, dst, w, hs, sg, sgu = setup
    sg_ids = plc.SGGraph(
        hs, plc.GraphProperties(is_symmetric=False, is_multigraph=False),
        src, dst, w, renumber=False, vertices_array=np.arange(40),
        edge_id_array=np.arange(len(src)),
        edge_type_array=np.zeros(len(src), np.int32))
    tm = plc.edge_id_lookup_table(h, g)
    ts = plc.edge_id_lookup_table(hs, sg_ids)
    q = np.array([0, 1, 5, len(src) - 1, len(src), -3, 10**9])
    fm = tm.lookup_vertex_ids(q, edge_type=0)
    fs = ts.lookup_vertex_ids(q, edge_type=0)
    np.testing.assert_array_equal(fm["src"].to_numpy(), fs["src"].to_numpy())
    np.testing.assert_array_equal(fm["dst"].to_numpy(), fs["dst"].to_numpy())
    # a type that doesn't exist: everything missing, both layers
    fm2 = tm.lookup_vertex_ids(q, edge_type=7)
    fs2 = ts.lookup_vertex_ids(q, edge_type=7)
    assert (fm2["src"].to_numpy() == -1).all()
    np.testing.assert_array_equal(fm2["src"].to_numpy(),
                                  fs2["src"].to_numpy())


def test_edge_id_lookup_64bit_keys_and_endpoints():
    """Edge ids past 2^31 and 64-bit external vertex ids must survive the
    router exchanges bit-exactly (round-5 review finding: int64 payloads
    were device_put directly and jax under x64-off silently truncates to
    int32 — keys now ride as two int32 limbs like construct.py's
    renumber)."""
    import jax

    from cugraph_tpu.parallel.mesh import make_mesh_2d

    mesh = make_mesh_2d(4, 2, jax.devices()[:8])
    rng = np.random.default_rng(9)
    base_v = np.int64(3) << 32          # external ids ≥ 2^33
    src = base_v + rng.integers(0, 30, 120)
    dst = base_v + rng.integers(30, 60, 120)
    w = rng.uniform(0.5, 2.0, 120).astype(np.float32)
    eid = (np.int64(5) << 31) + np.arange(120, dtype=np.int64)  # ≥ 2^31
    h = plc.ResourceHandle(mesh=mesh)
    # 64-bit external ids need the hash-renumbered sharded ingest (the
    # host build takes dense internal ids and now REFUSES sparse spaces)
    with pytest.raises(ValueError, match="sparse"):
        plc.MGGraph(h, plc.GraphProperties(is_symmetric=False,
                                           is_multigraph=True),
                    src, dst, w, edge_id_array=eid,
                    edge_type_array=np.zeros(120, np.int32))
    g = plc.MGGraph(
        h, plc.GraphProperties(is_symmetric=False, is_multigraph=True),
        src, dst, w, edge_id_array=eid,
        edge_type_array=np.zeros(120, np.int32), build="sharded")
    t = plc.edge_id_lookup_table(h, g)
    q = eid[[0, 7, 63, 119]]
    out = t.lookup_vertex_ids(q, edge_type=0)
    np.testing.assert_array_equal(out["src"].to_numpy(),
                                  src[[0, 7, 63, 119]])
    np.testing.assert_array_equal(out["dst"].to_numpy(),
                                  dst[[0, 7, 63, 119]])
    missing = t.lookup_vertex_ids(np.array([1, (np.int64(9) << 31)]))
    assert (missing["src"].to_numpy() == -1).all()
