"""Shared helpers for algorithm wrappers: device→host result framing,
renumbering glue.  Plays the role of the reference's per-algo Python wrappers
(e.g. python/cugraph/cugraph/link_analysis/pagerank.py) that unrenumber
results back to user vertex ids."""

from __future__ import annotations

import numpy as np
import pandas as pd


def vertex_frame(G, values_by_name: dict, *, dtype_map=None) -> pd.DataFrame:
    """Build a DataFrame with a 'vertex' column (external ids) plus one column
    per entry of values_by_name; padded device arrays are sliced to V."""
    n = G.number_of_vertices()
    out = {"vertex": G.number_map.to_external(np.arange(n))}
    for name, vals in values_by_name.items():
        arr = np.asarray(vals)[:n]
        if dtype_map and name in dtype_map:
            arr = arr.astype(dtype_map[name])
        out[name] = arr
    return pd.DataFrame(out)


def unrenumber_column(G, arr: np.ndarray, *, sentinel=-1, sentinel_value=-1):
    """Map internal ids back to external, preserving sentinel entries (e.g.
    BFS predecessor = -1)."""
    arr = np.asarray(arr)
    out = np.empty(arr.shape, dtype=G.number_map.to_external(np.array([0])).dtype)
    mask = arr != sentinel
    out[mask] = G.number_map.to_external(arr[mask])
    if np.issubdtype(out.dtype, np.integer):
        out[~mask] = sentinel_value
    else:
        out = out.astype(object)
        out[~mask] = None
    return out


def normalize_start(G, start) -> np.ndarray:
    """Map user-provided start vertex/vertices to internal ids."""
    arr = np.atleast_1d(np.asarray(start))
    return G.lookup_internal_vertex_id(arr)


def source_panels(sources, width: int = 128):
    """Chunk source ids into fixed-width int32 panels padded with -1, so
    every batched multi-source sweep (Brandes, ms-BFS, OD matrices) compiles
    ONE kernel shape regardless of source count.  Yields
    (panel: np.int32[width], start: int, count: int) — panel[count:] = -1."""
    sources = np.asarray(sources)
    for i in range(0, len(sources), width):
        batch = sources[i:i + width]
        panel = np.full(width, -1, np.int32)
        panel[: len(batch)] = batch
        yield panel, i, len(batch)
