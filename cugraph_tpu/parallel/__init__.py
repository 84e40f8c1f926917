"""Multi-chip (MG) execution: 2D edge partition over a jax.sharding.Mesh.

TPU-native replacement for the reference's multi-GPU stack (RAFT/NCCL comms +
partition_manager + MG primitives; SURVEY.md §2.3, §5 "Distributed
communication backend").  The taxonomy is preserved:

  reference                         → here
  ---------------------------------- ------------------------------------------
  major_comm / minor_comm 2D grid    → Mesh axes ("major", "minor")
  update_edge_src_property (bcast)   → jax.lax.all_gather along "minor"
  per-vertex partial reduce          → sorted segment_sum per edge block
  device_reduce to vertex owner      → jax.lax.psum_scatter along "major"
  host_scalar_allreduce              → jax.lax.psum over both axes (on device!)
  partition_manager rank math        → Partition2D (pure NumPy)

Everything runs as ONE jitted shard_map program per algorithm — whole power
iterations / BFS level loops stay on device (lax.while_loop), unlike the
reference which syncs a host scalar every iteration (pagerank_impl.cuh:209).
"""

from cugraph_tpu.parallel.partition import Partition2D, DistGraph, build_dist_graph
from cugraph_tpu.parallel.mesh import make_mesh_2d, mesh_shape_for
from cugraph_tpu.parallel import prims
from cugraph_tpu.parallel.shuffle import shuffle_to_owners, shuffle_reduce_by_key
from cugraph_tpu.parallel.louvain import mg_louvain, mg_louvain_move_phase, mg_leiden
from cugraph_tpu.parallel.algos import (
    mg_pagerank,
    mg_bfs,
    mg_sssp,
    mg_wcc,
    mg_katz_centrality,
    mg_degrees,
    mg_hits,
    mg_eigenvector_centrality,
    mg_sample_one_hop,
    mg_uniform_neighbor_sample,
    mg_biased_neighbor_sample,
    mg_heterogeneous_neighbor_sample,
    mg_temporal_neighbor_sample,
    mg_all_pairs_similarity,
    mg_negative_sampling,
    mg_ecg,
    mg_biased_random_walks,
    mg_node2vec_random_walks,
    mg_edge_betweenness_centrality,
    mg_uniform_random_walks,
    mg_jaccard_coefficients,
    mg_sorensen_coefficients,
    mg_overlap_coefficients,
    mg_cosine_coefficients,
    mg_core_number,
    mg_k_core,
    mg_betweenness_centrality,
    mg_strongly_connected_components,
    mg_triangle_count,
    mg_k_truss,
    mg_k_hop_nbrs,
    mg_egonet,
    mg_induced_subgraph,
)
