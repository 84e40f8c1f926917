"""Vertex renumbering: arbitrary external ids -> dense internal int32 ids.

Capability match for the reference's NumberMap
(python/cugraph/cugraph/structure/number_map.py:12,480,592) and the C++
renumber_edgelist (cpp/src/structure/renumber_edgelist_impl.cuh:95-318).

The reference sorts the renumber map by global degree so its CUDA kernels can
pick per-degree-segment launch shapes (graph_view.hpp:242-254).  On TPU the
analogous payoff is edge-tile load balance inside Pallas kernels, so we keep
the same degree-descending order as an *option* (on by default): internal id 0
is the highest-degree vertex.
"""

from __future__ import annotations

import numpy as np


class NumberMap:
    """Bidirectional map external vertex ids <-> internal [0, V) int32 ids."""

    def __init__(self, internal_to_external: np.ndarray):
        # internal_to_external[i] = external id of internal vertex i
        self._i2e = internal_to_external
        self._sorter = np.argsort(internal_to_external, kind="stable")
        self._sorted_ext = internal_to_external[self._sorter]

    @property
    def num_vertices(self) -> int:
        return int(self._i2e.shape[0])

    def to_internal(self, external: np.ndarray) -> np.ndarray:
        external = np.asarray(external)
        if self._sorted_ext.shape[0] == 0:
            if external.size:
                raise ValueError(f"vertex ids not in graph: {external[:10]!r}")
            return np.empty(0, np.int32)
        pos = np.searchsorted(self._sorted_ext, external)
        pos = np.clip(pos, 0, self._sorted_ext.shape[0] - 1)
        found = self._sorted_ext[pos] == external
        if not np.all(found):
            missing = np.asarray(external)[~found]
            raise ValueError(f"vertex ids not in graph: {missing[:10]!r}")
        return self._sorter[pos].astype(np.int32)

    def to_external(self, internal: np.ndarray) -> np.ndarray:
        return self._i2e[np.asarray(internal)]

    def contains(self, external: np.ndarray) -> np.ndarray:
        external = np.asarray(external)
        if self._sorted_ext.shape[0] == 0:
            return np.zeros(external.shape, bool)
        pos = np.searchsorted(self._sorted_ext, external)
        pos = np.clip(pos, 0, self._sorted_ext.shape[0] - 1)
        return self._sorted_ext[pos] == external

    # -- reference NumberMap method-name parity (number_map.py:310-599) ----

    def to_internal_vertex_id(self, df, col_names=None):
        """External-id column(s)/Series → internal ids
        (reference number_map.py:310)."""
        if col_names is not None:
            df = df[col_names[0] if isinstance(col_names, list) else col_names]
        return self.to_internal(np.asarray(df))

    def from_internal_vertex_id(self, df, internal_column_name=None,
                                external_column_names=None, drop=False):
        """Internal-id column → external ids appended as '0'
        (reference number_map.py:39/:157 semantics, single-column maps)."""
        import pandas as pd

        if isinstance(df, pd.DataFrame):
            col = (internal_column_name if internal_column_name is not None
                   else df.columns[0])
            out = df.copy()
            name = (external_column_names[0]
                    if isinstance(external_column_names, list)
                    else external_column_names or "0")
            out[name] = self.to_external(np.asarray(df[col]))
            if drop:
                out = out.drop(columns=[col])
            return out
        return self.to_external(np.asarray(df))

    def add_internal_vertex_id(self, df, id_column_name, col_names,
                               drop=False, preserve_order=False):
        """Add an internal-id column for external-id column(s)
        (reference number_map.py:350)."""
        col = col_names[0] if isinstance(col_names, list) else col_names
        out = df.copy()
        out[id_column_name] = self.to_internal(np.asarray(df[col]))
        if drop:
            out = out.drop(columns=[col])
        return out

    @staticmethod
    def renumber(df, src_col_names, dst_col_names, preserve_order=False,
                 store_transposed=False):
        """Renumber a DataFrame's endpoint columns (reference
        number_map.py:592): returns (renumbered df ['src','dst', ...rest],
        NumberMap)."""
        src_col = (src_col_names[0] if isinstance(src_col_names, list)
                   else src_col_names)
        dst_col = (dst_col_names[0] if isinstance(dst_col_names, list)
                   else dst_col_names)
        s, d, nmap = renumber_edgelist(df[src_col].to_numpy(),
                                       df[dst_col].to_numpy())
        out = df.drop(columns=[src_col, dst_col]).copy()
        out.insert(0, "src", s)
        out.insert(1, "dst", d)
        return out, nmap

    def unrenumber(self, df, column_name, preserve_order=False,
                   get_column_names=False):
        """Map an internal-id column back to external ids
        (reference number_map.py:599)."""
        out = df.copy()
        out[column_name] = self.to_external(np.asarray(df[column_name]))
        return out

    def vertex_column_size(self):
        return 1


def renumber_edgelist(
    src: np.ndarray,
    dst: np.ndarray,
    *,
    sort_by_degree: bool = True,
    vertices: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, NumberMap]:
    """Renumber an edge list to dense int32 ids; returns (src', dst', map).

    With ``sort_by_degree`` internal ids are assigned in descending order of
    total degree (ties broken by external id), mirroring the reference's
    degree-ordered renumber map (renumber_edgelist_impl.cuh:95-318).
    ``vertices`` optionally adds isolated vertices not present in any edge
    (reference: the optional vertex list of create_graph_from_edgelist,
    cpp/src/structure/create_graph_from_edgelist_impl.cuh).
    """
    src = np.asarray(src)
    dst = np.asarray(dst)

    # hash-renumber fast path (native C++, O(E)): the big np.unique over the
    # 2E id pool is the construction hot spot at scale.  Ids come out in
    # first-seen order; the small per-vertex lexsorts below restore EXACTLY
    # the sorted-external tie semantics of the np.unique path.
    uniq = None
    if (len(src) and np.issubdtype(src.dtype, np.integer)
            and np.issubdtype(dst.dtype, np.integer)):
        from cugraph_tpu.core.native import renumber_native

        nat = renumber_native(src.astype(np.int64), dst.astype(np.int64))
        if nat is not None:
            uniq, src_i, dst_i = nat
            src_i = src_i.astype(np.int64)
            dst_i = dst_i.astype(np.int64)
            out_dt = np.result_type(src.dtype, dst.dtype)
            if vertices is not None:
                extra = np.setdiff1d(np.asarray(vertices, np.int64), uniq)
                uniq = np.concatenate([uniq, extra])
                out_dt = np.result_type(out_dt, np.asarray(vertices).dtype)
            uniq = uniq.astype(out_dt)
            n = uniq.shape[0]
            if not sort_by_degree:
                order = np.argsort(uniq, kind="stable")
                rank = np.empty(n, dtype=np.int64)
                rank[order] = np.arange(n)
                src_i = rank[src_i]
                dst_i = rank[dst_i]
                uniq = uniq[order]

    if uniq is None:
        pool = [src, dst]
        if vertices is not None:
            pool.append(np.asarray(vertices))
        uniq, inv_all = np.unique(np.concatenate(pool), return_inverse=True)
        inv = inv_all[: src.shape[0] + dst.shape[0]]
        n = uniq.shape[0]
        e = src.shape[0]
        src_i = inv[:e].astype(np.int64)
        dst_i = inv[e:].astype(np.int64)

    if sort_by_degree and n > 0:
        deg = np.bincount(src_i, minlength=n) + np.bincount(dst_i, minlength=n)
        # by -degree; ties in external-id order (identical to the stable
        # argsort over sorted uniq the np.unique path used)
        order = np.lexsort((uniq, -deg))
        rank = np.empty(n, dtype=np.int64)
        rank[order] = np.arange(n)
        src_i = rank[src_i]
        dst_i = rank[dst_i]
        uniq = uniq[order]

    return src_i.astype(np.int32), dst_i.astype(np.int32), NumberMap(uniq)
