"""Padded fixed-width adjacency tables — THE fast gather on this TPU.

Element gathers (jnp.take of a flat array at arbitrary indices) scalarize on
this hardware (~0.075 G elem/s measured, benchmarks/bench_isect_micro.py);
ROW gathers (jnp.take along axis 0 of a [V, D] table — lane-dim slices) run
at ~1.5 G elem/s, and dense per-row tile ops (sort / compare / cumsum /
take_along_axis) run at VPU bandwidth.  This module builds cached [pad_v, D]
row views of the CSR adjacency (neighbor ids, weights, per-row cumulative
weights, arbitrary per-edge properties) so neighborhood-shaped computations
(sampling, random walks, intersection) become row gathers + dense tile ops.

Reference analog: the per-vertex neighbor enumerations inside
cpp/include/cugraph/prims/per_v_random_select_transform_outgoing_e.cuh and
detail/nbr_intersection.cuh — the reference walks CSR offsets per GPU
thread; the TPU formulation trades O(pad_v·D) memory for vectorizable
gathers.  D = max out-degree rounded up to 64 lanes; builders are
budget-gated (env CUGRAPH_TPU_ISECT_TABLE_MAX entries per table, default
2^26 ≈ 256 MB at int32) so hub-dominated graphs keep the CSR-walking
fallbacks.

Tables are cached on the CsrMatrix via object.__setattr__ (non-field attrs
do not enter the pytree, so jitted callers must fetch tables OUTSIDE traces
and pass them as arguments).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from cugraph_tpu.core.structure import CsrMatrix

_TABLE_MAX_DEFAULT = 1 << 26  # entries per table before builders refuse


def _budget() -> int:
    return int(os.environ.get("CUGRAPH_TPU_ISECT_TABLE_MAX",
                              _TABLE_MAX_DEFAULT))


def _layout(adj: CsrMatrix):
    """Cached host-side scatter layout: (rows, slots, D, nnz) mapping real
    CSR edge e → table cell (rows[e], slots[e]).  Covers rows < num_vertices
    only (the sink row holds padding edges and is excluded)."""
    cached = getattr(adj, "_ntab_layout", None)
    if cached is not None:
        return cached
    offs = np.asarray(adj.offsets)
    n = adj.num_vertices
    deg = offs[1: n + 1] - offs[:n]
    max_deg = int(deg.max()) if n else 0
    D = max(64, -(-max_deg // 64) * 64)
    rows = np.repeat(np.arange(n), deg)
    slots = np.arange(len(rows)) - np.repeat(offs[:n], deg)
    out = (rows, slots, D, int(offs[n]) if n else 0)
    object.__setattr__(adj, "_ntab_layout", out)
    return out


def table_width(adj: CsrMatrix) -> int:
    return _layout(adj)[2]


def table_entries(adj: CsrMatrix) -> int:
    return int(adj.pad_v) * table_width(adj)


def tables_fit(adj: CsrMatrix) -> bool:
    return table_entries(adj) <= _budget()


def edge_value_table(adj: CsrMatrix, vals, fill, dtype=None) -> np.ndarray:
    """Scatter a per-edge array (CSR edge order, first pad_e or nnz entries
    used) into a [pad_v, D] host table; cells past each row's degree (and
    all rows ≥ num_vertices) hold ``fill``.  Not cached — callers own it."""
    rows, slots, D, nnz = _layout(adj)
    vals = np.asarray(vals)
    out = np.full((adj.pad_v, D), fill,
                  dtype=dtype if dtype is not None else vals.dtype)
    out[rows, slots] = vals[:nnz]
    return out


def neighbor_table(adj: CsrMatrix):
    """Cached device [pad_v, D] int32 neighbor-id table.  Invalid cells hold
    DISTINCT sentinels pad_v + slot (≥ pad_v, distinct per slot — the
    sort-merge intersection in prims/intersection.py relies on both)."""
    cached = getattr(adj, "_ntab_nbr", None)
    if cached is not None:
        return cached
    rows, slots, D, nnz = _layout(adj)
    pv = int(adj.pad_v)
    tab = np.broadcast_to(pv + np.arange(D, dtype=np.int64),
                          (pv, D)).astype(np.int32).copy()
    tab[rows, slots] = np.asarray(adj.indices)[:nnz]
    dev = jnp.asarray(tab)
    object.__setattr__(adj, "_ntab_nbr", dev)
    return dev


def weight_table(adj: CsrMatrix):
    """Cached device [pad_v, D] float32 edge-weight table (0.0 fill)."""
    cached = getattr(adj, "_ntab_w", None)
    if cached is not None:
        return cached
    dev = jnp.asarray(edge_value_table(adj, np.asarray(adj.weights),
                                       np.float32(0.0), np.float32))
    object.__setattr__(adj, "_ntab_w", dev)
    return dev


def cumweight_table(adj: CsrMatrix):
    """Cached device [pad_v, D] float32 per-row CUMULATIVE weight table,
    +inf past each row's degree — positions for the inverse-CDF draw come
    from one dense comparison count instead of a 32-step binary search."""
    cached = getattr(adj, "_ntab_cumw", None)
    if cached is not None:
        return cached
    rows, slots, D, nnz = _layout(adj)
    offs = np.asarray(adj.offsets)
    n = adj.num_vertices
    w = np.asarray(adj.weights, dtype=np.float64)[:nnz]
    c = np.cumsum(w)
    rowstart = np.repeat(c[np.maximum(offs[:n] - 1, 0)] * (offs[:n] > 0),
                         offs[1: n + 1] - offs[:n])
    tab = np.full((adj.pad_v, D), np.inf, np.float32)
    tab[rows, slots] = (c - rowstart).astype(np.float32)
    dev = jnp.asarray(tab)
    object.__setattr__(adj, "_ntab_cumw", dev)
    return dev
