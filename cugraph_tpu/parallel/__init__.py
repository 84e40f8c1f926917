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
from cugraph_tpu.parallel.construct import (
    DistNumberMap,
    build_dist_graph_from_chunks,
    build_dist_graph_sharded,
    renumber_edgelist_sharded,
)
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
    mg_sample_multihop_device,
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
    mg_two_hop_neighbors,
)
from cugraph_tpu.parallel.sampling_mg import (
    mg_uniform_neighbor_sample,
    mg_biased_neighbor_sample,
    mg_heterogeneous_neighbor_sample,
    mg_temporal_neighbor_sample,
    mg_heterogeneous_temporal_neighbor_sample,
)

# ---------------------------------------------------------------------------
# Reference-named aliases: cugraph.dask exposes each MG algorithm under the
# SAME name as the SG API (python/cugraph/cugraph/dask/__init__.py:6-38), so
# migrating code can keep `import cugraph_tpu.parallel as dcg; dcg.pagerank(...)`
# spellings.  Signatures take (g: DistGraph, mesh, ...) in place of the
# reference's dask graphs.
pagerank = mg_pagerank
hits = mg_hits
bfs = mg_bfs
sssp = mg_sssp
louvain = mg_louvain
leiden = mg_leiden
ecg = mg_ecg
triangle_count = mg_triangle_count
ego_graph = mg_egonet
induced_subgraph = mg_induced_subgraph
ktruss_subgraph = mg_k_truss
katz_centrality = mg_katz_centrality
eigenvector_centrality = mg_eigenvector_centrality
betweenness_centrality = mg_betweenness_centrality
edge_betweenness_centrality = mg_edge_betweenness_centrality
core_number = mg_core_number
k_core = mg_k_core
weakly_connected_components = mg_wcc
strongly_connected_components = mg_strongly_connected_components
uniform_random_walks = mg_uniform_random_walks
random_walks = mg_uniform_random_walks
biased_random_walks = mg_biased_random_walks
node2vec_random_walks = mg_node2vec_random_walks
jaccard = mg_jaccard_coefficients
sorensen = mg_sorensen_coefficients
overlap = mg_overlap_coefficients
cosine = mg_cosine_coefficients


def _make_all_pairs(kind):
    def all_pairs(g, mesh, vertices=None, topk=None, batch=128):
        return mg_all_pairs_similarity(g, mesh, kind=kind, vertices=vertices,
                                       topk=topk, batch=batch)
    all_pairs.__name__ = f"all_pairs_{kind}"
    all_pairs.__doc__ = (
        f"All-pairs {kind} similarity with optional global top-k "
        "(reference dask/link_prediction/*.py all_pairs_* entry points).")
    return all_pairs


all_pairs_jaccard = _make_all_pairs("jaccard")
all_pairs_sorensen = _make_all_pairs("sorensen")
all_pairs_overlap = _make_all_pairs("overlap")
all_pairs_cosine = _make_all_pairs("cosine")


def get_n_workers(mesh=None):
    """Device count of the mesh (the reference's dask
    common/read_utils.py:5 counts dask workers — here a worker is a chip)."""
    import jax

    return mesh.size if mesh is not None else len(jax.devices())


def get_chunksize(input_path, mesh=None):
    """Bytes per partition so a CSV read splits into one chunk per device
    (reference common/read_utils.py:12)."""
    import math
    import os
    from glob import glob

    files = sorted(glob(str(input_path)))
    if len(files) == 1:
        return math.ceil(os.path.getsize(files[0]) / get_n_workers(mesh))
    return max(os.path.getsize(f) for f in files)
