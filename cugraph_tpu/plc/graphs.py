"""Stable-layer graph containers (pylibcugraph graphs.pyx analog).

``SGGraph`` (reference graphs.pyx:42) and ``MGGraph`` (graphs.pyx:357) take
plain arrays — exactly the reference's calling convention — and wrap the
engine-level Graph / DistGraph.  ``ResourceHandle`` (resource_handle.pyx:15)
carries the device or mesh; on TPU the jax runtime owns devices, so the
handle is bookkeeping plus the mesh for MG graphs.
"""

from __future__ import annotations

import numpy as np


class ResourceHandle:
    """Device/mesh handle (the raft-handle analog; resource_handle.pyx:15).

    ``ResourceHandle()`` = default device.  ``ResourceHandle(mesh=mesh)``
    carries a 2D jax Mesh for MG graphs (replaces the reference's raft
    subcomm bootstrap, dask/comms/comms.py:82)."""

    def __init__(self, handle=None, *, mesh=None):
        self.mesh = mesh

    def get_mesh(self):
        if self.mesh is None:
            from cugraph_tpu.parallel.mesh import make_mesh_2d

            self.mesh = make_mesh_2d()
        return self.mesh


class GraphProperties:
    """reference graph_properties.pyx: is_symmetric / is_multigraph flags."""

    def __init__(self, is_symmetric: bool = False, is_multigraph: bool = False):
        self.is_symmetric = bool(is_symmetric)
        self.is_multigraph = bool(is_multigraph)


class SGGraph:
    """Single-device graph from arrays (reference graphs.pyx:42).

    Parameters mirror the reference signature; ``store_transposed`` is
    accepted for parity (both orientations are materialized on demand).
    """

    def __init__(self, resource_handle=None, graph_properties=None,
                 src_or_offset_array=None, dst_or_index_array=None,
                 weight_array=None, *, store_transposed=False, renumber=True,
                 do_expensive_check=False, edge_id_array=None,
                 edge_type_array=None, edge_start_time_array=None,
                 input_array_format="COO", vertices_array=None,
                 symmetrize=False, **kwargs):
        from cugraph_tpu.api.graph import Graph, MultiGraph

        props = graph_properties or GraphProperties()
        cls = MultiGraph if props.is_multigraph else Graph
        # reference contract (graphs.pyx:133,169): a symmetric graph's COO
        # already holds both directions UNLESS symmetrize=True is passed.
        # Build in as-is (directed) mode when not symmetrizing so multigraph
        # parallel edges survive; flag undirected afterwards.
        g = cls(directed=not symmetrize)
        if input_array_format != "COO":
            raise ValueError("only COO input is supported")
        g.from_edgelist(
            np.asarray(src_or_offset_array),
            np.asarray(dst_or_index_array),
            None if weight_array is None else np.asarray(weight_array),
            renumber=renumber,
            vertices=vertices_array,
            edge_id=edge_id_array,
            edge_type=edge_type_array,
            edge_time=edge_start_time_array,
        )
        if props.is_symmetric and not symmetrize:
            g._directed = False  # semantic flag only; edges stored as-is
        self._graph = g
        self.properties = props
        self.weighted = weight_array is not None

    def graph(self):
        return self._graph

    def number_of_vertices(self):
        return self._graph.number_of_vertices()

    def number_of_edges(self):
        return self._graph.number_of_edges()


class MGGraph:
    """Multi-device graph over the handle's 2D mesh (reference graphs.pyx:357).

    The reference builds one per worker with local COO chunks; here the full
    COO is passed once and partitioned by Partition2D (the shuffle happens at
    build, SURVEY.md §3.2)."""

    def __init__(self, resource_handle, graph_properties=None,
                 src_array=None, dst_array=None, weight_array=None, *,
                 store_transposed=False, num_arrays=1, do_expensive_check=False,
                 symmetrize=False, edge_id_array=None, edge_type_array=None,
                 edge_start_time_array=None, drop_self_loops=False,
                 drop_multi_edges=False, build="host", **kwargs):
        from cugraph_tpu.parallel import build_dist_graph
        from cugraph_tpu.parallel.mesh import shard_dist_graph

        mesh = resource_handle.get_mesh()
        props = graph_properties or GraphProperties()

        if build == "sharded":
            # distributed ingest: per-device chunk lists are routed to their
            # 2D owners by all_to_all; no process concatenates the full COO
            # (reference shuffle_ext_edges, c_api/graph_mg.cpp:140)
            self._init_sharded(
                mesh, props, src_array, dst_array, weight_array,
                symmetrize=symmetrize, edge_id_array=edge_id_array,
                edge_type_array=edge_type_array,
                edge_start_time_array=edge_start_time_array,
                drop_self_loops=drop_self_loops,
                drop_multi_edges=drop_multi_edges)
            return

        def _cat(a):
            if isinstance(a, (list, tuple)):  # per-worker chunk lists
                return np.concatenate([np.asarray(x) for x in a])
            return a

        src_array, dst_array = _cat(src_array), _cat(dst_array)
        weight_array, edge_id_array = _cat(weight_array), _cat(edge_id_array)
        edge_type_array = _cat(edge_type_array)
        edge_start_time_array = _cat(edge_start_time_array)
        src = np.asarray(src_array)
        dst = np.asarray(dst_array)
        n = int(max(src.max(initial=-1), dst.max(initial=-1))) + 1
        # the host build treats ids as DENSE [0, n): a sparse/huge external
        # id space would allocate pad_v ≈ max_id vertex arrays (measured:
        # 2^33-scale ids hang the build for minutes) — route those through
        # the hash-renumbered sharded ingest instead of failing slowly
        if n > max(4 * (src.shape[0] + 1), 1 << 24):
            raise ValueError(
                f"vertex id space [0, {n}) is sparse relative to "
                f"{src.shape[0]} edges; the host MGGraph build takes dense "
                "internal ids — renumber first, or use build='sharded' "
                "(hash-renumbered distributed ingest)")
        pmaj, pmin = mesh.devices.shape
        # is_symmetric DESCRIBES the input (both directions already in the
        # COO); only an explicit symmetrize=True asks us to ADD reverses —
        # concatenating reverses of an already-symmetric COO would double
        # every edge (same contract as SGGraph above)
        g = build_dist_graph(
            src, dst,
            None if weight_array is None else np.asarray(weight_array),
            n, pmaj, pmin,
            store_push=True, symmetrize=bool(symmetrize),
            edge_type=(None if edge_type_array is None
                       else np.asarray(edge_type_array)),
            edge_time=(None if edge_start_time_array is None
                       else np.asarray(edge_start_time_array)),
            drop_self_loops=bool(drop_self_loops),
            drop_multi_edges=bool(drop_multi_edges))
        self._graph = shard_dist_graph(g, mesh)
        self.mesh = mesh
        self.properties = props
        # edge ids kept host-side for lookup/post-processing parity; the
        # sorted (src,dst)-key table lets MG samplers attach sampled edge ids
        # (the reference returns them via gather_sampled_properties.cuh)
        self.edge_ids = (None if edge_id_array is None
                         else np.asarray(edge_id_array))
        self.edge_types = (None if edge_type_array is None
                           else np.asarray(edge_type_array))
        self._edge_id_table = self._build_edge_id_table(
            np.asarray(src, np.int64), np.asarray(dst, np.int64),
            self.edge_ids, g.pad_v, symmetrize=bool(symmetrize))
        # endpoint arrays (output id space) for the MG lookup container —
        # kept only when ids exist, same O(E) host residency as edge_ids
        self._edge_endpoints = (
            None if self.edge_ids is None
            else (np.asarray(src, np.int64), np.asarray(dst, np.int64)))

    @staticmethod
    def _build_edge_id_table(src, dst, ids, pad_v, *, symmetrize):
        """Sorted (src,dst)-key → edge id table.  With ``symmetrize`` the
        graph also stores mirrored edges, which inherit the input edge's id
        (the sampler may traverse either direction)."""
        if ids is None:
            return None
        if symmetrize:
            src, dst = (np.concatenate([src, dst]),
                        np.concatenate([dst, src]))
            ids = np.concatenate([ids, ids])
        key = src * pad_v + dst
        order = np.argsort(key, kind="stable")
        return key[order], ids[order]

    def lookup_edge_ids(self, sources, destinations):
        """Edge ids for (src, dst) pairs (first match on multi-edges)."""
        if self._edge_id_table is None:
            return None
        keys, ids = self._edge_id_table
        q = np.asarray(sources, np.int64) * self._graph.pad_v \
            + np.asarray(destinations, np.int64)
        pos = np.clip(np.searchsorted(keys, q), 0, max(len(keys) - 1, 0))
        if len(keys) == 0 or not (keys[pos] == q).all():
            raise ValueError("edge id lookup: pair not in graph")
        return ids[pos]

    def _init_sharded(self, mesh, props, src_array, dst_array, weight_array,
                      *, symmetrize, edge_id_array, edge_type_array,
                      edge_start_time_array, drop_self_loops,
                      drop_multi_edges):
        from cugraph_tpu.parallel import build_dist_graph_from_chunks

        n_dev = mesh.devices.size

        def _chunks(a):
            if a is None:
                return None
            if isinstance(a, (list, tuple)):
                if len(a) != n_dev:
                    raise ValueError(
                        f"sharded build needs {n_dev} chunks, got {len(a)}")
                return [np.asarray(x) for x in a]
            return np.array_split(np.asarray(a), n_dev)

        g, nmap, stats = build_dist_graph_from_chunks(
            mesh, _chunks(src_array), _chunks(dst_array),
            _chunks(weight_array), renumber=True, store_push=True,
            symmetrize=bool(symmetrize),
            drop_self_loops=bool(drop_self_loops),
            drop_multi_edges=bool(drop_multi_edges),
            edge_type_chunks=_chunks(edge_type_array),
            edge_time_chunks=_chunks(edge_start_time_array))
        self._graph = g
        self.mesh = mesh
        self.properties = props
        self.number_map = nmap
        self.build_stats = stats
        def _full(a):
            # flatten a chunk list; a plain ndarray is already the full
            # edge order (avoid the split-then-reconcatenate identity copy)
            if a is None:
                return None
            if isinstance(a, (list, tuple)):
                return np.concatenate([np.asarray(x) for x in a])
            return np.asarray(a)

        self.edge_ids = _full(edge_id_array)
        self.edge_types = _full(edge_type_array)
        if self.edge_ids is not None:
            # id keys live in INTERNAL id space (the sampler's output space);
            # the map query gathers to this host — same O(E) residency as
            # the edge_ids array itself.  Endpoints concatenate ONCE and
            # feed both the external-endpoint record and the id table.
            s_full = _full(src_array).astype(np.int64)
            d_full = _full(dst_array).astype(np.int64)
            self._edge_endpoints = (s_full, d_full)
            si = nmap.to_internal(s_full).astype(np.int64)
            di = nmap.to_internal(d_full).astype(np.int64)
            self._edge_id_table = self._build_edge_id_table(
                si, di, self.edge_ids, g.pad_v, symmetrize=bool(symmetrize))
        else:
            self._edge_endpoints = None
            self._edge_id_table = None

    def edge_endpoints_external(self):
        """(src, dst) endpoint arrays aligned with ``edge_ids``, in the
        graph's OUTPUT id space (external ids for sharded builds)."""
        if getattr(self, "_edge_endpoints", None) is None:
            raise ValueError("graph has no edge_id property")
        return self._edge_endpoints

    def graph(self):
        return self._graph
