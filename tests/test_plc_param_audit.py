"""Round-3 plc parameter audit: every previously accepted-and-dropped kwarg
is now plumbed (this file) or documented reference-parity-N/A (COVERAGE.md).

Reference: the .pyx signatures under python/pylibcugraph/pylibcugraph/.
"""

import numpy as np
import pytest

import cugraph_tpu as ct
from cugraph_tpu.plc import SGGraph, ResourceHandle
from cugraph_tpu.plc import algorithms as plc


def _graph(n=40, m=240, seed=0, weighted=True):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    k = np.unique(src * n + dst)
    src, dst = k // n, k % n
    w = rng.uniform(0.5, 2.0, len(src)).astype(np.float32) if weighted \
        else None
    g = SGGraph(ResourceHandle(), None, src, dst, w)
    return g, src, dst, w


def test_bfs_compute_predecessors_false():
    g, src, *_ = _graph()
    d, p, v = plc.bfs(None, g, np.array([int(src[0])]),
                      compute_predecessors=False)
    assert (p == -1).all()
    d2, p2, _ = plc.bfs(None, g, np.array([int(src[0])]))
    np.testing.assert_array_equal(d, d2)
    assert (p2 >= 0).any()


def test_sssp_compute_predecessors_false():
    g, src, *_ = _graph()
    v, d, p = plc.sssp(None, g, int(src[0]), compute_predecessors=False)
    assert (p == -1).all()


def test_katz_betas_vector():
    g, *_ = _graph(weighted=False)
    n = g.number_of_vertices()
    betas = np.full(n, 2.0, np.float32)
    v1, c1 = plc.katz_centrality(None, g, betas=betas, alpha=0.02,
                                 max_iterations=500)
    v2, c2 = plc.katz_centrality(None, g, beta=2.0, alpha=0.02,
                                 max_iterations=500)
    np.testing.assert_allclose(c1, c2, rtol=1e-5)
    # a non-uniform betas vector changes the result
    betas[0] = 50.0
    _, c3 = plc.katz_centrality(None, g, betas=betas, alpha=0.02,
                                max_iterations=500)
    assert not np.allclose(c1, c3)


def test_k_core_core_result_reused():
    g, *_ = _graph(seed=3)
    v, core = plc.core_number(None, g)
    s1, d1, w1 = plc.k_core(None, g, k=2, core_result=(v, core))
    s2, d2, w2 = plc.k_core(None, g, k=2)
    key = lambda a, b: np.sort(a * 10**6 + b)
    np.testing.assert_array_equal(key(s1, d1), key(s2, d2))
    # a FAKE core_result changes the extraction (proves it is used)
    s3, d3, _ = plc.k_core(None, g, k=2,
                           core_result=(v, np.zeros_like(core)))
    assert len(s3) == 0


def test_wcc_legacy_csr_input():
    # two components: 0-1-2 and 3-4
    offsets = np.array([0, 1, 2, 2, 3, 3])
    indices = np.array([1, 2, 4])
    v, labels = plc.weakly_connected_components(
        None, None, offsets=offsets, indices=indices, weights=None,
        labels=None)
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == labels[4]
    assert labels[0] != labels[3]


def test_similarity_use_weight():
    g, src, dst, w = _graph(seed=5)
    pairs = (np.array([int(src[0])]), np.array([int(dst[0])]))
    f1, s1, c_unw = plc.jaccard_coefficients(None, g, *pairs)
    f2, s2, c_w = plc.jaccard_coefficients(None, g, *pairs, use_weight=True)
    # weighted coefficient generally differs from the unweighted one
    assert c_unw.shape == c_w.shape


def test_negative_sampling_exact_count():
    g, *_ = _graph(n=30, m=120, seed=7)
    s, d = plc.negative_sampling(None, g, 57, random_state=1,
                                 exact_number_of_samples=True)
    assert len(s) == 57


def test_rmat_edge_ids_and_types():
    out = plc.generate_rmat_edgelist(None, 0, 8, 1000,
                                     include_edge_weights=True,
                                     include_edge_ids=True,
                                     include_edge_types=True,
                                     min_edge_type_value=2,
                                     max_edge_type_value=5)
    src, dst, w, eid, et = out
    assert len(eid) == 1000 and (eid == np.arange(1000)).all()
    assert et.min() >= 2 and et.max() <= 5


def test_rmat_edgelists_random_state_varies():
    a = plc.generate_rmat_edgelists(None, 0, 2, 6, 7)
    b = plc.generate_rmat_edgelists(None, 123, 2, 6, 7)
    assert len(a) == len(b) == 2
    same = all(len(x) == len(y) and (x["src"].to_numpy()
                                     == y["src"].to_numpy()).all()
               for x, y in zip(a, b) if len(x) == len(y))
    assert not same


def test_replicate_edgelist_weight_passthrough():
    src = np.array([0, 1]); dst = np.array([1, 2])
    w = np.array([0.5, 2.5], np.float32)
    out = plc.replicate_edgelist(None, src_array=src, dst_array=dst,
                                 weight_array=w)
    assert len(out) == 3
    np.testing.assert_array_equal(out[2], w)


def test_induced_subgraph_offsets_multiple():
    g, src, dst, w = _graph(seed=9)
    verts = np.concatenate([np.arange(10), np.arange(10, 25)])
    offs = np.array([0, 10, 25])
    s, d, ww, eoff = plc.induced_subgraph(None, g, verts,
                                          subgraph_offsets=offs)
    assert len(eoff) == 3 and eoff[-1] == len(s)
    # group 0 edges stay within [0, 10)
    assert (s[: eoff[1]] < 10).all() and (d[: eoff[1]] < 10).all()
    assert (s[eoff[1]:] >= 10).all() and (s[eoff[1]:] < 25).all()


def test_sg_degrees_and_two_hop_honor_subsets():
    """SG paths of degrees/in/out_degrees and two_hop_neighbors must honor
    source/start vertices like their MG twins (round-5 review: silently
    ignored)."""
    h = ResourceHandle()
    src = np.array([0, 0, 1, 2, 3])
    dst = np.array([1, 2, 2, 3, 0])
    from cugraph_tpu.plc import GraphProperties
    g = SGGraph(h, GraphProperties(is_symmetric=False), src, dst,
                None, renumber=False, vertices_array=np.arange(5))
    v, din, dout = plc.degrees(h, g, source_vertices=[1, 3])
    assert list(v) == [1, 3] and len(din) == 2 == len(dout)
    v2, d2 = plc.in_degrees(h, g, source_vertices=[2])
    assert list(v2) == [2] and d2[0] == 2
    f, s = plc.two_hop_neighbors(h, g, start_vertices=[0])
    assert set(f.tolist()) <= {0}


def test_label_offsets_become_batches():
    """starting_vertex_label_offsets groups seeds into batches (round-5
    review: the wrappers silently dropped the offsets)."""
    h = ResourceHandle()
    src = np.array([0, 0, 1, 1, 2, 2, 3, 3])
    dst = np.array([1, 2, 2, 3, 3, 0, 0, 1])
    from cugraph_tpu.plc import GraphProperties
    g = SGGraph(h, GraphProperties(is_symmetric=False), src, dst,
                None, renumber=False, vertices_array=np.arange(4))
    df = plc.homogeneous_uniform_neighbor_sample(
        h, g, np.array([0, 1, 2, 3]),
        starting_vertex_label_offsets=np.array([0, 2, 4]),
        h_fan_out=np.array([2]), random_state=0)
    bids = set(np.asarray(df["batch_id"]).tolist())
    assert bids == {0, 1}, bids
    with pytest.raises(ValueError, match="label_offsets"):
        plc.homogeneous_uniform_neighbor_sample(
            h, g, np.array([0, 1]),
            starting_vertex_label_offsets=np.array([0, 5]),
            h_fan_out=np.array([2]))


def test_temporal_per_seed_start_times():
    """Per-seed starting_vertex_start_times must flow through whole —
    collapsing to the first element gave every seed the first seed's
    eligibility window (round-5 review).  Seed 0 (t=0) can traverse the
    t=5 edge; seed 1 (t=99) must find nothing."""
    h = ResourceHandle()
    src = np.array([0, 1])
    dst = np.array([1, 2])
    tm = np.array([5.0, 6.0], np.float32)
    from cugraph_tpu.plc import GraphProperties
    g = SGGraph(h, GraphProperties(is_symmetric=False), src, dst,
                None, renumber=False, vertices_array=np.arange(3),
                edge_start_time_array=tm)
    df = plc.homogeneous_uniform_temporal_neighbor_sample(
        h, g, "t", np.array([0, 1]), np.array([0.0, 99.0]), None,
        np.array([2]), random_state=0)
    rows = list(zip(np.asarray(df["sources"]).tolist(),
                    np.asarray(df["destinations"]).tolist()))
    assert (0, 1) in rows          # seed 0 at t=0 sees the t=5 edge
    assert (1, 2) not in rows      # seed 1 at t=99 must see NOTHING
