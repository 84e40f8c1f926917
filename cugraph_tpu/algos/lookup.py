"""Edge (id, type) → (src, dst) lookup container.

Reference: cpp/src/lookup/lookup_src_dst_impl.cuh +
include/cugraph/src_dst_lookup_container.hpp (cuco hash map per edge type),
pylibcugraph edge_id_lookup_table.pyx.

TPU-native replacement for the GPU hash map: sorted key arrays + vectorized
binary search (SURVEY.md §7 "kv lookup — sorted-array binary search instead
of cuco hash map"); O(log E) per probe, fully host/NumPy (lookups feed
sampling pipelines on host)."""

from __future__ import annotations

import numpy as np
import pandas as pd


class EdgeIdLookupTable:
    """Build once from a graph with edge_id (and optionally edge_type)."""

    def __init__(self, G):
        if G.edge_ids is None:
            raise ValueError("graph has no edge_id property")
        src, dst, _ = G.edgelist_arrays()
        eid = np.asarray(G.edge_ids, np.int64)
        etp = (np.zeros(len(eid), np.int32) if G.edge_types is None
               else np.asarray(G.edge_types, np.int32))
        key = etp.astype(np.int64) * (int(eid.max()) + 1 if len(eid) else 1) + eid
        order = np.argsort(key, kind="stable")
        self._G = G
        self._key = key[order]
        self._src = np.asarray(src)[order]
        self._dst = np.asarray(dst)[order]
        self._id_base = int(eid.max()) + 1 if len(eid) else 1

    def lookup_vertex_ids(self, edge_ids, edge_type=0) -> pd.DataFrame:
        """DataFrame ['edge_id', 'src', 'dst']; missing ids get -1 endpoints
        (matching the C API's not-found convention)."""
        edge_ids = np.asarray(edge_ids, np.int64)
        if len(self._key) == 0:
            ids = np.full(len(edge_ids), -1, np.int64)
            return pd.DataFrame({"edge_id": edge_ids, "src": ids, "dst": ids})
        # ids outside [0, id_base) would alias into ANOTHER type's key space
        in_range = (edge_ids >= 0) & (edge_ids < self._id_base)
        key = np.int64(edge_type) * self._id_base \
            + np.where(in_range, edge_ids, 0)
        pos = np.searchsorted(self._key, key)
        pos = np.clip(pos, 0, len(self._key) - 1)
        hit = in_range & (self._key[pos] == key)
        src = np.where(hit, self._src[pos], -1)
        dst = np.where(hit, self._dst[pos], -1)
        nm = self._G.number_map
        ext_src = np.where(src >= 0, nm.to_external(np.maximum(src, 0)), -1)
        ext_dst = np.where(dst >= 0, nm.to_external(np.maximum(dst, 0)), -1)
        return pd.DataFrame({"edge_id": edge_ids, "src": ext_src, "dst": ext_dst})


def edge_id_lookup_table(G) -> EdgeIdLookupTable:
    return EdgeIdLookupTable(G)
