"""Every plc wrapper gets exercised at least once.

The round-2 review campaign found that most surviving bugs lived in the plc
wrapper layer (argument plumbing, return-shape mismatches) precisely where
no test called the PUBLIC entry point — `plc.induced_subgraph` crashed on
every call and nothing noticed.  This smoke sweep calls all 64 wrappers on
a small weighted graph (with edge ids/types/times so property paths run)
and asserts a sane, non-empty return; it is a tripwire, not an oracle
(numeric parity lives in the per-algorithm tests)."""

import numpy as np
import pytest

from cugraph_tpu import plc


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(6)
    src = rng.integers(0, 40, 260)
    dst = rng.integers(0, 40, 260)
    keep = src != dst
    pairs = np.unique(np.stack([src[keep], dst[keep]], 1), axis=0)
    src, dst = pairs[:, 0], pairs[:, 1]
    w = rng.uniform(0.5, 2.0, len(src)).astype(np.float32)
    h = plc.ResourceHandle()
    g = plc.SGGraph(
        h, plc.GraphProperties(is_symmetric=False, is_multigraph=False),
        src, dst, w,
        edge_id_array=np.arange(len(src)),
        edge_type_array=np.zeros(len(src), np.int32),
        edge_start_time_array=rng.uniform(0, 10, len(src))
        .astype(np.float32),
    )
    # undirected view for community/similarity entry points
    gu = plc.SGGraph(
        h, plc.GraphProperties(is_symmetric=True, is_multigraph=False),
        np.concatenate([src, dst]), np.concatenate([dst, src]),
        np.concatenate([w, w]))
    return h, g, gu, src, dst, w


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


CALLS = [
    ("pagerank", lambda h, g, gu, s, d, w: plc.pagerank(h, g)),
    ("personalized_pagerank", lambda h, g, gu, s, d, w:
        plc.personalized_pagerank(h, g, np.array([0]), np.array([1.0]))),
    ("hits", lambda h, g, gu, s, d, w: plc.hits(h, g)),
    ("katz_centrality", lambda h, g, gu, s, d, w:
        plc.katz_centrality(h, g, None, alpha=0.005, beta=1.0,
                            epsilon=1e-4, max_iterations=200)),
    ("eigenvector_centrality", lambda h, g, gu, s, d, w:
        plc.eigenvector_centrality(h, gu, 1e-4, 200)),
    ("betweenness_centrality", lambda h, g, gu, s, d, w:
        plc.betweenness_centrality(h, g, 8, None, True, False)),
    ("edge_betweenness_centrality", lambda h, g, gu, s, d, w:
        plc.edge_betweenness_centrality(h, g, 8, None, True)),
    ("bfs", lambda h, g, gu, s, d, w:
        plc.bfs(h, g, np.array([int(s[0])]))),
    ("sssp", lambda h, g, gu, s, d, w:
        plc.sssp(h, g, int(s[0]), 1e9, True, False)),
    ("core_number", lambda h, g, gu, s, d, w:
        plc.core_number(h, gu, "bidirectional")),
    ("k_core", lambda h, g, gu, s, d, w: plc.k_core(h, gu, 2)),
    ("louvain", lambda h, g, gu, s, d, w: plc.louvain(h, gu, 10, 1e-7, 1.0)),
    ("leiden", lambda h, g, gu, s, d, w:
        plc.leiden(h, None, gu, 10, 1e-7, 1.0, 1.0)),
    ("ecg", lambda h, g, gu, s, d, w: plc.ecg(h, None, gu)),
    ("triangle_count", lambda h, g, gu, s, d, w:
        plc.triangle_count(h, gu, start_list=np.array([0, 1]))),
    ("k_truss_subgraph", lambda h, g, gu, s, d, w:
        plc.k_truss_subgraph(h, gu, 3)),
    ("egonet", lambda h, g, gu, s, d, w:
        plc.egonet(h, gu, np.array([0]), 1)),
    ("ego_graph", lambda h, g, gu, s, d, w:
        plc.ego_graph(h, gu, np.array([0]), 1)),
    ("weakly_connected_components", lambda h, g, gu, s, d, w:
        plc.weakly_connected_components(h, g, None, None, None, False)),
    ("strongly_connected_components", lambda h, g, gu, s, d, w:
        plc.strongly_connected_components(h, g)),
    ("balanced_cut_clustering", lambda h, g, gu, s, d, w:
        plc.balanced_cut_clustering(h, gu, 3)),
    ("spectral_modularity_maximization", lambda h, g, gu, s, d, w:
        plc.spectral_modularity_maximization(h, gu, 3)),
    ("analyze_clustering_modularity", lambda h, g, gu, s, d, w:
        plc.analyze_clustering_modularity(
            h, gu, 3, *plc.balanced_cut_clustering(h, gu, 3))),
    ("analyze_clustering_edge_cut", lambda h, g, gu, s, d, w:
        plc.analyze_clustering_edge_cut(
            h, gu, 3, *plc.balanced_cut_clustering(h, gu, 3))),
    ("analyze_clustering_ratio_cut", lambda h, g, gu, s, d, w:
        plc.analyze_clustering_ratio_cut(
            h, gu, 3, *plc.balanced_cut_clustering(h, gu, 3))),
    ("jaccard_coefficients", lambda h, g, gu, s, d, w:
        plc.jaccard_coefficients(h, gu, np.array([0, 1]), np.array([2, 3]),
                                 False, False)),
    ("sorensen_coefficients", lambda h, g, gu, s, d, w:
        plc.sorensen_coefficients(h, gu, np.array([0]), np.array([2]),
                                  False, False)),
    ("overlap_coefficients", lambda h, g, gu, s, d, w:
        plc.overlap_coefficients(h, gu, np.array([0]), np.array([2]),
                                 False, False)),
    ("cosine_coefficients", lambda h, g, gu, s, d, w:
        plc.cosine_coefficients(h, gu, np.array([0]), np.array([2]),
                                False, False)),
    ("all_pairs_jaccard_coefficients", lambda h, g, gu, s, d, w:
        plc.all_pairs_jaccard_coefficients(h, gu, topk=5)),
    ("all_pairs_sorensen_coefficients", lambda h, g, gu, s, d, w:
        plc.all_pairs_sorensen_coefficients(h, gu, topk=5)),
    ("all_pairs_overlap_coefficients", lambda h, g, gu, s, d, w:
        plc.all_pairs_overlap_coefficients(h, gu, topk=5)),
    ("all_pairs_cosine_coefficients", lambda h, g, gu, s, d, w:
        plc.all_pairs_cosine_coefficients(h, gu, topk=5)),
    ("uniform_neighbor_sample", lambda h, g, gu, s, d, w:
        plc.uniform_neighbor_sample(h, g, np.array([0, 1]), [3, 2])),
    ("homogeneous_uniform_neighbor_sample", lambda h, g, gu, s, d, w:
        plc.homogeneous_uniform_neighbor_sample(
            h, g, np.array([0, 1]), None, np.array([2], np.int32))),
    ("homogeneous_biased_neighbor_sample", lambda h, g, gu, s, d, w:
        plc.homogeneous_biased_neighbor_sample(
            h, g, np.array([0, 1]), None, np.array([2], np.int32))),
    ("heterogeneous_uniform_neighbor_sample", lambda h, g, gu, s, d, w:
        plc.heterogeneous_uniform_neighbor_sample(
            h, g, np.array([0, 1]), None, None, np.array([2], np.int32),
            num_edge_types=1)),
    ("heterogeneous_biased_neighbor_sample", lambda h, g, gu, s, d, w:
        plc.heterogeneous_biased_neighbor_sample(
            h, g, np.array([0, 1]), None, None, np.array([2], np.int32),
            num_edge_types=1)),
    ("homogeneous_uniform_temporal_neighbor_sample",
     lambda h, g, gu, s, d, w:
        plc.homogeneous_uniform_temporal_neighbor_sample(
            h, g, "edge_time", np.array([0, 1]), None, None,
            np.array([2], np.int32))),
    ("homogeneous_biased_temporal_neighbor_sample",
     lambda h, g, gu, s, d, w:
        plc.homogeneous_biased_temporal_neighbor_sample(
            h, g, np.array([0, 1]), np.array([2], np.int32))),
    ("heterogeneous_uniform_temporal_neighbor_sample",
     lambda h, g, gu, s, d, w:
        plc.heterogeneous_uniform_temporal_neighbor_sample(
            h, g, np.array([0, 1]), np.array([2], np.int32), 1)),
    ("heterogeneous_biased_temporal_neighbor_sample",
     lambda h, g, gu, s, d, w:
        plc.heterogeneous_biased_temporal_neighbor_sample(
            h, g, np.array([0, 1]), np.array([2], np.int32), 1)),
    ("negative_sampling", lambda h, g, gu, s, d, w:
        plc.negative_sampling(h, g, 10,
                              plc.CuGraphRandomState(h, 3))),
    ("uniform_random_walks", lambda h, g, gu, s, d, w:
        plc.uniform_random_walks(h, g, np.array([0, 1]), 3)),
    ("biased_random_walks", lambda h, g, gu, s, d, w:
        plc.biased_random_walks(h, g, np.array([0, 1]), 3)),
    ("node2vec_random_walks", lambda h, g, gu, s, d, w:
        plc.node2vec_random_walks(h, g, np.array([0, 1]), 3, 1.0, 1.0)),
    ("generate_rmat_edgelist", lambda h, g, gu, s, d, w:
        plc.generate_rmat_edgelist(h, 7, scale=6, num_edges=64)),
    ("generate_rmat_edgelists", lambda h, g, gu, s, d, w:
        plc.generate_rmat_edgelists(h, 7, n_edgelists=2, min_scale=4,
                                    max_scale=5, edge_factor=4)),
    ("minimum_spanning_tree", lambda h, g, gu, s, d, w:
        plc.minimum_spanning_tree(h, gu)),
    ("force_atlas2", lambda h, g, gu, s, d, w:
        plc.force_atlas2(h, gu, max_iter=5)),
    ("induced_subgraph", lambda h, g, gu, s, d, w:
        plc.induced_subgraph(h, g, np.arange(10))),
    ("decompress_to_edgelist", lambda h, g, gu, s, d, w:
        plc.decompress_to_edgelist(h, g)),
    ("replicate_edgelist", lambda h, g, gu, s, d, w:
        plc.replicate_edgelist(h, graph=g)),
    ("extract_vertex_list", lambda h, g, gu, s, d, w:
        plc.extract_vertex_list(h, g)),
    ("select_random_vertices", lambda h, g, gu, s, d, w:
        plc.select_random_vertices(h, g, 7, 5)),
    ("renumber_arbitrary_edgelist", lambda h, g, gu, s, d, w:
        plc.renumber_arbitrary_edgelist(
            h, np.array([5, 6, 7]), np.array([5, 6]), np.array([6, 7]))),
    ("two_hop_neighbors", lambda h, g, gu, s, d, w:
        plc.two_hop_neighbors(h, g, None)),
    ("get_two_hop_neighbors", lambda h, g, gu, s, d, w:
        plc.get_two_hop_neighbors(h, g, None)),
    ("degrees", lambda h, g, gu, s, d, w:
        plc.degrees(h, g, None, False)),
    ("in_degrees", lambda h, g, gu, s, d, w: plc.in_degrees(h, g, None)),
    ("out_degrees", lambda h, g, gu, s, d, w: plc.out_degrees(h, g, None)),
    ("has_vertex", lambda h, g, gu, s, d, w:
        plc.has_vertex(h, g, np.array([0, 10**6]))),
    ("count_multi_edges", lambda h, g, gu, s, d, w:
        plc.count_multi_edges(h, g)),
    ("edge_id_lookup_table", lambda h, g, gu, s, d, w:
        plc.edge_id_lookup_table(h, g)),
]


@pytest.mark.parametrize("name,call", CALLS, ids=[c[0] for c in CALLS])
def test_plc_wrapper_smoke(setup, name, call):
    h, g, gu, src, dst, w = setup
    out = call(h, g, gu, src, dst, w)
    assert _nonempty(out), name
