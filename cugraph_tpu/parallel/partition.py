"""2D edge partition math + distributed graph construction (host side).

TPU-native analog of the reference's ``partition_t``/``partition_manager``
(cpp/include/cugraph/graph_view.hpp:64-230, partition_manager.hpp:22-180) and
``create_graph_from_edgelist`` (cpp/src/structure/create_graph_from_edgelist_impl.cuh).

Layout (P = pmaj × pmin devices on a Mesh with axes ("major", "minor")):

* The padded vertex space [0, P·Vc) is split into P contiguous ranges of size
  ``Vc``; device (i, j) owns range ``[(i·pmin + j)·Vc, +Vc)`` — row-major over
  mesh coordinates, so a global vertex vector sharded with
  ``PartitionSpec(("major", "minor"))`` lands each owner's slice on its device.
* "Row-block" i = the union of ranges owned by devices (i, *) = the contiguous
  span ``[i·B, (i+1)·B)`` with ``B = pmin·Vc``.  ``all_gather`` along "minor"
  of owned slices therefore reconstructs exactly row-block i on every device
  of mesh row i — this is the reference's ``update_edge_src_property`` minor-
  comm broadcast (update_edge_src_dst_property.cuh:163-224) as one collective.
* Pull-oriented edge (src, dst) is stored on device (i, j) with
  ``i = src // B`` (so the gathered row-block i covers all its sources) and
  ``j = (dst // Vc) % pmin`` (so ``psum_scatter`` along "major" delivers each
  per-destination partial straight to the destination's owner — the
  reference's minor-comm ``device_reduce``, detail/per_v_transform_reduce_e.cuh:3397).
* Local indices: ``src_loc = src − i·B`` ∈ [0, B);
  ``dst_loc = (dst // B)·Vc + dst % Vc`` ∈ [0, pmaj·Vc) — dst's position in
  the concatenation, over i', of V_own(i', j), which is precisely the tiled
  ``psum_scatter`` piece order.

Communication per device per SpMV: B values gathered + pmaj·Vc partials
scattered ⇒ O(V/pmaj + V/pmin) — the classic 2D √P scaling (Boman et al.,
cited at graph_view.hpp:58-59).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from cugraph_tpu.core.structure import round_up

E_ALIGN = 128
V_ALIGN = 8


@dataclass(frozen=True)
class Partition2D:
    """Pure rank/range math for the 2D partition (no device data)."""

    num_vertices: int
    pmaj: int
    pmin: int
    chunk: int  # Vc: vertices per device

    @staticmethod
    def create(num_vertices: int, pmaj: int, pmin: int) -> "Partition2D":
        p = pmaj * pmin
        chunk = round_up(max(round_up(num_vertices, p) // p, 1), V_ALIGN)
        return Partition2D(num_vertices, pmaj, pmin, chunk)

    @property
    def num_devices(self) -> int:
        return self.pmaj * self.pmin

    @property
    def pad_v(self) -> int:
        """Global padded vertex count (= P · Vc)."""
        return self.num_devices * self.chunk

    @property
    def row_block(self) -> int:
        """B: vertices per mesh row (gather span along "minor")."""
        return self.pmin * self.chunk

    def owner(self, v: np.ndarray):
        """(i, j) mesh coordinates of the device owning each vertex."""
        r = np.asarray(v) // self.chunk
        return r // self.pmin, r % self.pmin

    def owned_range(self, i: int, j: int):
        lo = (i * self.pmin + j) * self.chunk
        return lo, lo + self.chunk

    # -- pull-edge placement (src gathered, dst reduced) ---------------------
    def edge_device(self, src: np.ndarray, dst: np.ndarray):
        i = np.asarray(src) // self.row_block
        j = (np.asarray(dst) // self.chunk) % self.pmin
        return i, j

    def src_local(self, src: np.ndarray, i: np.ndarray):
        return np.asarray(src) - i * self.row_block

    def dst_local(self, dst: np.ndarray):
        d = np.asarray(dst)
        return (d // self.row_block) * self.chunk + d % self.chunk


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class EdgeBlocks:
    """One orientation's per-device edge blocks, stacked [pmaj, pmin, E_loc].

    ``dst_loc`` is sorted ascending within each block (sorted-segment fast
    path); invalid (padding) lanes have ``valid`` False, weight 0, and both
    endpoints parked on in-range slots so gathers stay in bounds.
    """

    src_loc: jax.Array  # int32 [pmaj, pmin, E_loc], ∈ [0, B)
    dst_loc: jax.Array  # int32 [pmaj, pmin, E_loc], ∈ [0, pmaj·Vc), sorted
    weight: jax.Array   # float32 [pmaj, pmin, E_loc]
    valid: jax.Array    # bool  [pmaj, pmin, E_loc]
    etype: jax.Array | None = None  # int32, per-edge type (het sampling)
    etime: jax.Array | None = None  # float32, per-edge time (temporal)
    eid: jax.Array | None = None    # int32, input-edge INSTANCE index
    # (−1 pad) — lets samplers return the traversed instance so parallel
    # edges resolve to their OWN properties (gather_one_hop_impl.cuh)

    @property
    def e_local(self) -> int:
        return self.src_loc.shape[-1]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DistGraph:
    """2D-partitioned graph: pull blocks (+ optional push blocks) + degrees.

    Distributed analog of ``graph_t``/``graph_view_t`` (graph.hpp:68-269).
    Vertex-indexed members (degrees) are global [pad_v] vectors intended to be
    sharded ``PartitionSpec(("major", "minor"))``.
    """

    pull: EdgeBlocks            # src gathered / dst reduced (CSC-like)
    push: EdgeBlocks | None     # dst gathered / src reduced (CSR-like)
    out_degree: jax.Array       # float32 [pad_v] (weighted out-degree)
    in_degree: jax.Array        # float32 [pad_v]
    num_vertices: int = field(metadata=dict(static=True))
    num_edges: int = field(metadata=dict(static=True))
    pmaj: int = field(metadata=dict(static=True))
    pmin: int = field(metadata=dict(static=True))
    chunk: int = field(metadata=dict(static=True))

    @property
    def part(self) -> Partition2D:
        return Partition2D(self.num_vertices, self.pmaj, self.pmin, self.chunk)

    @property
    def pad_v(self) -> int:
        return self.pmaj * self.pmin * self.chunk


def _build_blocks(part: Partition2D, major_end: np.ndarray, minor_end: np.ndarray,
                  weight: np.ndarray, etype: np.ndarray | None = None,
                  etime: np.ndarray | None = None,
                  eid: np.ndarray | None = None) -> EdgeBlocks:
    """Bucket edges to devices and build padded, dst-sorted local blocks.

    ``minor_end`` plays the gathered role (cuGraph "src"), ``major_end`` the
    reduced role ("dst").  Host-side NumPy: this is the construction path, the
    analog of the reference's shuffle + CSR compression (all-to-all #1 in
    SURVEY.md §3.2) executed as one pass over the COO list.  ``etype``/
    ``etime`` (heterogeneous/temporal sampling properties) ride along when
    given (the numpy path; the native builder covers the property-free case).
    """
    pmaj, pmin = part.pmaj, part.pmin
    i, j = part.edge_device(minor_end, major_end)

    # native C++ path (core/_native/builder.cpp build_blocks_2d)
    counts_native = np.bincount(i * pmin + j, minlength=part.num_devices)
    e_local_n = max(int(round_up(max(counts_native.max(initial=0), 1), E_ALIGN)),
                    E_ALIGN)
    from cugraph_tpu.core import native

    res = None
    if etype is None and etime is None:
        res = native.build_blocks_2d_native(minor_end, major_end, weight,
                                            pmaj, pmin, part.chunk, e_local_n,
                                            eid=eid)
    if res is not None:
        sl, dl, ww, vv, ei = res
        shape = (pmaj, pmin, e_local_n)
        return EdgeBlocks(
            src_loc=jnp.asarray(sl.reshape(shape)),
            dst_loc=jnp.asarray(dl.reshape(shape)),
            weight=jnp.asarray(ww.reshape(shape)),
            valid=jnp.asarray(vv.reshape(shape)),
            eid=None if ei is None else jnp.asarray(ei.reshape(shape)),
        )
    src_loc = part.src_local(minor_end, i).astype(np.int64)
    dst_loc = part.dst_local(major_end).astype(np.int64)

    dev = i * pmin + j
    # group by device, then by dst_loc within the device (sorted segments)
    order = np.lexsort((src_loc, dst_loc, dev))
    dev, src_loc, dst_loc = dev[order], src_loc[order], dst_loc[order]
    w = weight[order]
    et = None if etype is None else np.asarray(etype, np.int32)[order]
    tm = None if etime is None else np.asarray(etime, np.float32)[order]
    ei = None if eid is None else np.asarray(eid, np.int32)[order]

    counts = np.bincount(dev, minlength=part.num_devices)
    e_local = max(int(round_up(max(counts.max(), 1), E_ALIGN)), E_ALIGN)

    n_dev = part.num_devices
    sl = np.zeros((n_dev, e_local), np.int32)
    dl = np.full((n_dev, e_local), part.pmaj * part.chunk - 1, np.int32)
    ww = np.zeros((n_dev, e_local), np.float32)
    vv = np.zeros((n_dev, e_local), bool)
    ee = np.zeros((n_dev, e_local), np.int32) if et is not None else None
    tt = np.zeros((n_dev, e_local), np.float32) if tm is not None else None
    ii = np.full((n_dev, e_local), -1, np.int32) if ei is not None else None
    starts = np.concatenate([[0], np.cumsum(counts)])
    for d in range(n_dev):
        c = counts[d]
        if c:
            s = starts[d]
            sl[d, :c] = src_loc[s : s + c]
            dl[d, :c] = dst_loc[s : s + c]
            ww[d, :c] = w[s : s + c]
            vv[d, :c] = True
            if ee is not None:
                ee[d, :c] = et[s : s + c]
            if tt is not None:
                tt[d, :c] = tm[s : s + c]
            if ii is not None:
                ii[d, :c] = ei[s : s + c]
    # keep dst_loc sorted including the padding tail (pad dst = last segment)
    resort = np.argsort(dl, axis=1, kind="stable")
    sl = np.take_along_axis(sl, resort, axis=1)
    dl = np.take_along_axis(dl, resort, axis=1)
    ww = np.take_along_axis(ww, resort, axis=1)
    vv = np.take_along_axis(vv, resort, axis=1)
    if ee is not None:
        ee = np.take_along_axis(ee, resort, axis=1)
    if tt is not None:
        tt = np.take_along_axis(tt, resort, axis=1)
    if ii is not None:
        ii = np.take_along_axis(ii, resort, axis=1)

    shape = (pmaj, pmin, e_local)
    return EdgeBlocks(
        src_loc=jnp.asarray(sl.reshape(shape)),
        dst_loc=jnp.asarray(dl.reshape(shape)),
        weight=jnp.asarray(ww.reshape(shape)),
        valid=jnp.asarray(vv.reshape(shape)),
        etype=None if ee is None else jnp.asarray(ee.reshape(shape)),
        etime=None if tt is None else jnp.asarray(tt.reshape(shape)),
        eid=None if ii is None else jnp.asarray(ii.reshape(shape)),
    )


def build_dist_graph(
    src: np.ndarray,
    dst: np.ndarray,
    weight: np.ndarray | None,
    num_vertices: int,
    pmaj: int,
    pmin: int,
    *,
    store_push: bool = True,
    symmetrize: bool = False,
    edge_type: np.ndarray | None = None,
    edge_time: np.ndarray | None = None,
    drop_self_loops: bool = False,
    drop_multi_edges: bool = False,
    store_eid: bool | None = None,
) -> DistGraph:
    """COO edge list → 2D-partitioned DistGraph (host-side build).

    ``drop_self_loops`` / ``drop_multi_edges`` mirror the reference MGGraph
    construction flags (pylibcugraph graphs.pyx:167-168); duplicates keep the
    first occurrence and are removed BEFORE symmetrization (matching the SG
    Graph, which dedupes then mirrors).  Note the SG ``Graph`` class always
    drops multi-edges for non-multigraphs — pass ``drop_multi_edges=True``
    here when comparing MG against SG on inputs that may contain duplicates.

    ``store_eid``: keep per-edge input INSTANCE indices on the push blocks
    so samplers can return the traversed instance (exact parallel-edge
    properties, gather_one_hop_impl.cuh).  Default (None) = automatic:
    stored whenever push blocks exist and any per-edge property (weight /
    edge_type / edge_time) was given.  Costs 4 bytes/edge on push.
    """
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    m = src.shape[0]
    w = np.ones(m, np.float32) if weight is None else np.asarray(weight, np.float32)
    if store_eid is None:
        store_eid = store_push and (weight is not None
                                    or edge_type is not None
                                    or edge_time is not None)
    eid = np.arange(m, dtype=np.int32) if store_eid else None

    def _filter(keep_idx):
        nonlocal src, dst, w, edge_type, edge_time, eid
        src, dst, w = src[keep_idx], dst[keep_idx], w[keep_idx]
        if edge_type is not None:
            edge_type = np.asarray(edge_type)[keep_idx]
        if edge_time is not None:
            edge_time = np.asarray(edge_time)[keep_idx]
        if eid is not None:
            eid = eid[keep_idx]

    if drop_self_loops:
        _filter(src != dst)
    if drop_multi_edges:
        key = (src << 32) | dst.astype(np.uint32).astype(np.int64)
        _, idx = np.unique(key, return_index=True)
        idx.sort()
        _filter(idx)
    if symmetrize:
        src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
        w = np.concatenate([w, w])
        if edge_type is not None:
            edge_type = np.concatenate([edge_type, edge_type])
        if edge_time is not None:
            edge_time = np.concatenate([edge_time, edge_time])
        if eid is not None:
            # both mirror directions are the SAME input instance
            eid = np.concatenate([eid, eid])

    part = Partition2D.create(num_vertices, pmaj, pmin)
    pull = _build_blocks(part, major_end=dst, minor_end=src, weight=w,
                         etype=edge_type, etime=edge_time)
    push = _build_blocks(part, major_end=src, minor_end=dst, weight=w,
                         etype=edge_type, etime=edge_time,
                         eid=eid) if store_push else None

    from cugraph_tpu.core import native

    res = native.degrees_native(src, dst, w, part.pad_v)
    if res is not None:
        out_deg, in_deg = res
    else:
        out_deg = np.zeros(part.pad_v, np.float32)
        in_deg = np.zeros(part.pad_v, np.float32)
        np.add.at(out_deg, src, w)
        np.add.at(in_deg, dst, w)

    return DistGraph(
        pull=pull,
        push=push,
        out_degree=jnp.asarray(out_deg),
        in_degree=jnp.asarray(in_deg),
        num_vertices=num_vertices,
        num_edges=int(src.shape[0]),
        pmaj=pmaj,
        pmin=pmin,
        chunk=part.chunk,
    )
