"""Static-shaped, device-resident graph containers.

TPU-native replacement for the reference's owning graph store and views
(cuGraph ``graph_t``: cpp/include/cugraph/graph.hpp:68-269; ``graph_view_t``:
cpp/include/cugraph/graph_view.hpp:373; edge partition accessor:
cpp/include/cugraph/edge_partition_device_view.cuh:46-158).

Design notes (TPU-first, not a port):

* XLA demands static shapes, so every array is padded: the vertex axis to a
  multiple of ``V_ALIGN`` **plus one trailing "sink" row**, the edge axis to a
  multiple of ``E_ALIGN``.  Padding edges point at the sink on both endpoints
  and carry weight 0, so sum-reductions need no masks and min/max reductions
  only pollute the sink row, which is sliced off before results leave the
  device.  This plays the role of cuGraph's hypersparse/DCSR bookkeeping
  (graph.hpp:228-231) — on TPU the win is mask-free dense kernels rather than
  memory savings.
* We keep BOTH sort orders resident when an algorithm needs them: edges sorted
  by destination ("csc", the pull orientation used by PageRank/Katz/HITS —
  reference pagerank_impl.cuh:336 takes the transposed view) and by source
  ("csr", the push orientation used by BFS/SSSP/sampling).  This mirrors the
  reference's ``store_transposed`` template flag as data instead of types.
* The segment-id array ``majors`` (sorted ascending) is stored explicitly so
  per-vertex reductions lower to ``jax.ops.segment_sum(indices_are_sorted=True)``
  — XLA's fast path — and so Pallas kernels can tile edges without re-deriving
  row ids from offsets.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

V_ALIGN = 8
E_ALIGN = 128


def round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def padded_vertex_count(num_vertices: int, v_align: int = V_ALIGN) -> int:
    """Vertex arrays get one extra sink row, then round up."""
    return round_up(num_vertices + 1, v_align)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class CsrMatrix:
    """One sort order of the edge list plus its compressed offsets.

    ``majors[e]`` is the segment id of edge ``e`` (ascending); ``indices[e]``
    the opposite endpoint; ``weights[e]`` the edge weight (1.0 for unweighted
    graphs, 0.0 for padding).  ``offsets`` has length ``pad_v + 1`` with the
    usual CSR meaning; rows in ``[num_vertices, sink)`` are empty and the sink
    row holds all padding edges.
    """

    offsets: jax.Array  # int32 [pad_v + 1]
    indices: jax.Array  # int32 [pad_e]
    weights: jax.Array  # float32 [pad_e]
    majors: jax.Array   # int32 [pad_e], sorted ascending
    num_vertices: int = field(metadata=dict(static=True))
    num_edges: int = field(metadata=dict(static=True))

    @property
    def pad_v(self) -> int:
        return self.offsets.shape[0] - 1

    @property
    def pad_e(self) -> int:
        return self.indices.shape[0]

    @property
    def sink(self) -> int:
        return self.pad_v - 1

    def degrees(self) -> jax.Array:
        """Per-major-vertex edge counts, [pad_v].  NOTE: the SINK row
        (pad_v − 1) holds the padding-edge count (pad_e − num_edges), and
        rows in [num_vertices, sink) are zero — mask with
        ``arange(pad_v) < num_vertices`` before trusting the tail (every
        in-repo caller does)."""
        return self.offsets[1:] - self.offsets[:-1]


def build_csr_host(
    major: np.ndarray,
    minor: np.ndarray,
    weight: np.ndarray | None,
    num_vertices: int,
    *,
    v_align: int = V_ALIGN,
    e_align: int = E_ALIGN,
    dtype=np.float32,
) -> CsrMatrix:
    """Host-side (NumPy) CSR compression of a COO edge list.

    TPU-native analog of the reference's per-edge-partition CSR build inside
    create_graph_from_edgelist (cpp/src/structure/create_graph_from_edgelist_impl.cuh).
    """
    major = np.asarray(major, dtype=np.int32)
    minor = np.asarray(minor, dtype=np.int32)
    num_edges = int(major.shape[0])

    pad_v = padded_vertex_count(num_vertices, v_align)
    sink = pad_v - 1
    pad_e = max(round_up(num_edges, e_align), e_align)
    if pad_e >= (1 << 31):
        # int32 offsets are a design bound of this CSR (and the one-hot
        # plan formats downstream); a silent cumsum wrap past 2^31 would
        # yield negative offsets — fail loudly instead (largest exercised
        # single-structure scale: RMAT-26, ~1.07B edges)
        raise ValueError(
            f"edge count {num_edges} exceeds the int32 CSR offset bound "
            "(2^31-1 padded edges per structure); shard the graph "
            "(parallel.build_dist_graph) instead")

    # native C++ counting-sort path (core/_native/builder.cpp), ~10× numpy's
    # lexsort; silently falls back to numpy when no toolchain is present
    if dtype == np.float32:
        from cugraph_tpu.core import native

        res = native.coo_to_csr_native(major, minor, weight, num_vertices,
                                       pad_v, pad_e, sink)
        if res is not None:
            offsets, maj_s, min_s, w_s = res
            return CsrMatrix(
                offsets=jnp.asarray(offsets),
                indices=jnp.asarray(min_s),
                weights=jnp.asarray(w_s),
                majors=jnp.asarray(maj_s),
                num_vertices=num_vertices,
                num_edges=num_edges,
            )

    if weight is None:
        weight = np.ones(num_edges, dtype=dtype)
    else:
        weight = np.asarray(weight, dtype=dtype)

    # lexicographic (major, minor) order: adjacency lists come out sorted,
    # enabling O(log d) vectorized membership tests (nbr_intersection analog,
    # reference prims/detail/nbr_intersection.cuh uses sorted lists too)
    order = np.lexsort((minor, major))
    maj_s = np.full(pad_e, sink, dtype=np.int32)
    min_s = np.full(pad_e, sink, dtype=np.int32)
    w_s = np.zeros(pad_e, dtype=dtype)
    maj_s[:num_edges] = major[order]
    min_s[:num_edges] = minor[order]
    w_s[:num_edges] = weight[order]

    counts = np.bincount(maj_s, minlength=pad_v).astype(np.int64)
    offsets = np.zeros(pad_v + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])

    return CsrMatrix(
        offsets=jnp.asarray(offsets),
        indices=jnp.asarray(min_s),
        weights=jnp.asarray(w_s),
        majors=jnp.asarray(maj_s),
        num_vertices=num_vertices,
        num_edges=num_edges,
    )


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class GraphStructure:
    """Device-side view bundle for one graph: both orientations + degrees.

    Plays the role of the reference's ``graph_view_t`` handed to algorithms
    (graph_view.hpp:373): algorithms pick the orientation they need.
    """

    csr: CsrMatrix  # edges sorted by src  (push; out-edges contiguous)
    csc: CsrMatrix  # edges sorted by dst  (pull; in-edges contiguous)

    @property
    def num_vertices(self) -> int:
        return self.csr.num_vertices

    @property
    def num_edges(self) -> int:
        return self.csr.num_edges

    @property
    def pad_v(self) -> int:
        return self.csr.pad_v

    def out_degrees(self) -> jax.Array:
        return self.csr.degrees()

    def in_degrees(self) -> jax.Array:
        return self.csc.degrees()

    def out_weight_sums(self) -> jax.Array:
        return jax.ops.segment_sum(
            self.csr.weights, self.csr.majors, num_segments=self.csr.pad_v,
            indices_are_sorted=True,
        )

    def in_weight_sums(self) -> jax.Array:
        return jax.ops.segment_sum(
            self.csc.weights, self.csc.majors, num_segments=self.csc.pad_v,
            indices_are_sorted=True,
        )


def build_structure_host(
    src: np.ndarray,
    dst: np.ndarray,
    weight: np.ndarray | None,
    num_vertices: int,
) -> GraphStructure:
    csr = build_csr_host(src, dst, weight, num_vertices)
    csc = build_csr_host(dst, src, weight, num_vertices)
    return GraphStructure(csr=csr, csc=csc)
