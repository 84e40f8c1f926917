"""Distributed edge (id, type) → (src, dst) lookup container.

Reference: cpp/src/lookup/lookup_src_dst_mg.cu + lookup_src_dst_impl.cuh —
the MG build shuffles (edge_id, type, src, dst) tuples to hash owners
(edge_id % P) and lookups shuffle query ids to the same owners, resolve in
the per-owner cuco map, and shuffle endpoints back.

TPU-native replacement: per-owner SORTED key tables (no hash map — SURVEY.md
§7 kv-lookup stance) and the `_Router` request/reply all_to_all exchange from
parallel/construct.py for both the build-time shuffle and each query.  The
exchanges run real jax collectives over the mesh; in-process, owner tables
are host NumPy per device slot (same residency model as DistNumberMap).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from cugraph_tpu.parallel.construct import (_Router, _merge64, _split64)

# jax under the default x64-off config SILENTLY casts int64 device_put
# inputs to int32 (verified; the construct.py hazard note) — every int64
# payload crossing the router therefore rides as TWO int32 limbs, using
# construct.py's split/merge (the one owner of the limb convention)


def _exchange64(router, arrays_per_slot):
    """router.exchange for a list of int64 fields, limb-split; returns the
    per-field per-device [P, cap] int64 arrays."""
    fields = []
    for slots in arrays_per_slot:
        pairs = [_split64(a) for a in slots]
        fields.append(([p[0] for p in pairs], np.int32))
        fields.append(([p[1] for p in pairs], np.int32))
    outs = router.exchange(*fields)
    joined = []
    for i in range(0, len(outs), 2):
        joined.append([_merge64(lo, hi)
                       for lo, hi in zip(outs[i], outs[i + 1])])
    return joined


def _reply64(router, reply_blocks):
    pairs = [_split64(np.asarray(b, np.int64)) for b in reply_blocks]
    lo = router.reply([p[0] for p in pairs], np.int32)
    hi = router.reply([p[1] for p in pairs], np.int32)
    return [_merge64(a, b) for a, b in zip(lo, hi)]


class MGEdgeIdLookupTable:
    """MG analog of algos.lookup.EdgeIdLookupTable (lookup_src_dst_mg.cu).

    Built from a plc.MGGraph carrying edge ids: the (key=(type, id), src,
    dst) tuples are routed to their id-hash owner device with one all_to_all
    exchange, each owner keeps a sorted key table, and every lookup runs the
    request/reply exchange pair (queries to owners, endpoints back).
    """

    def __init__(self, mg_graph):
        if getattr(mg_graph, "edge_ids", None) is None:
            raise ValueError("graph has no edge_id property")
        mesh = mg_graph.mesh
        self.mesh = mesh
        self.P = mesh.devices.size
        eid = np.asarray(mg_graph.edge_ids, np.int64)
        src, dst = mg_graph.edge_endpoints_external()
        etp = (np.zeros(len(eid), np.int32)
               if getattr(mg_graph, "edge_types", None) is None
               else np.asarray(mg_graph.edge_types, np.int32))
        self._id_base = int(eid.max()) + 1 if len(eid) else 1
        key = etp.astype(np.int64) * self._id_base + eid

        # build-time shuffle: split the tuples across device slots (each
        # slot plays one process's local edges) and route every tuple to its
        # id-hash owner via the all_to_all router
        parts = np.array_split(np.arange(len(eid)), self.P)
        owners = [((eid[p] % self.P + self.P) % self.P) for p in parts]
        router = _Router(mesh, owners)
        kx, sx, dx = _exchange64(router, [
            [key[p] for p in parts],
            [np.asarray(src, np.int64)[p] for p in parts],
            [np.asarray(dst, np.int64)[p] for p in parts]])
        self.tables = []
        karr = router.gather_arrivals(kx)
        sarr = router.gather_arrivals(sx)
        darr = router.gather_arrivals(dx)
        for d in range(self.P):
            k, s, t = karr[d], sarr[d], darr[d]
            order = np.argsort(k, kind="stable")
            self.tables.append((k[order], s[order], t[order]))

    def lookup_vertex_ids(self, edge_ids, edge_type=0) -> pd.DataFrame:
        """DataFrame ['edge_id', 'src', 'dst']; missing ids get -1 endpoints
        (the C API's not-found convention) — same frame the SG container
        returns, so SG↔MG parity is a frame comparison."""
        edge_ids = np.asarray(edge_ids, np.int64)
        in_range = (edge_ids >= 0) & (edge_ids < self._id_base)
        safe = np.where(in_range, edge_ids, 0)
        qkey = np.int64(edge_type) * self._id_base + safe

        # request/reply: queries split across device slots, routed to owners
        parts = np.array_split(np.arange(len(edge_ids)), self.P)
        owners = [((safe[p] % self.P + self.P) % self.P) for p in parts]
        router = _Router(self.mesh, owners)
        (qx,) = _exchange64(router, [[qkey[p] for p in parts]])
        reply_s, reply_d = [], []
        for d in range(self.P):
            keys, s, t = self.tables[d]
            blk = qx[d]                       # [P, cap] per-sender queries
            if len(keys):
                pos = np.clip(np.searchsorted(keys, blk), 0, len(keys) - 1)
                hit = keys[pos] == blk
                reply_s.append(np.where(hit, s[pos], -1))
                reply_d.append(np.where(hit, t[pos], -1))
            else:
                reply_s.append(np.full_like(blk, -1))
                reply_d.append(np.full_like(blk, -1))
        rs = _reply64(router, reply_s)
        rd = _reply64(router, reply_d)
        out_s = np.empty(len(edge_ids), np.int64)
        out_d = np.empty(len(edge_ids), np.int64)
        for p, s, t in zip(parts, rs, rd):
            out_s[p] = s
            out_d[p] = t
        out_s[~in_range] = -1
        out_d[~in_range] = -1
        return pd.DataFrame({"edge_id": edge_ids, "src": out_s,
                             "dst": out_d})


def mg_edge_id_lookup_table(mg_graph) -> MGEdgeIdLookupTable:
    return MGEdgeIdLookupTable(mg_graph)
