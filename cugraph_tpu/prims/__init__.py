"""Graph message-passing primitives — the contract every algorithm is written
against.

This is the TPU-native re-design of the reference's primitive layer
(cpp/include/cugraph/prims/*.cuh, ~30k LoC of CUDA; inventory in SURVEY.md
§2.2).  Same contract, different physics: instead of degree-segmented CUDA
kernels + NCCL collectives, each primitive is a pure function over the padded
CSR containers in core/structure.py that XLA can fuse, and the multi-chip
variants (prims/distributed.py) wrap the same math in shard_map with mesh
collectives.
"""

from cugraph_tpu.prims.vertex_edge import (
    per_v_transform_reduce_incoming_e,
    per_v_transform_reduce_outgoing_e,
    transform_reduce_e,
    transform_e,
    count_if_e,
    transform_reduce_v,
    count_if_v,
    reduce_v,
    spmv_pull,
    spmv_push,
    segment_reduce_by_major,
    gather_minor,
)
from cugraph_tpu.prims.frontier import (
    frontier_expand_by_dst,
    bitmap_from_vertices,
    vertices_from_bitmap,
)
