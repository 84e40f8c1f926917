"""Utility layer: profiling, validation, optional-import helpers.

Mirrors python/cugraph/cugraph/utilities/ (utils.py:212 ensure_cugraph_obj,
:323 import_optional) plus the reference's HighResTimer and
do_expensive_check posture (SURVEY.md §5)."""

from __future__ import annotations

import importlib

from cugraph_tpu.utils.path_retrieval import get_traversed_cost  # noqa
from cugraph_tpu.utils.profiling import (
    HighResTimer,
    trace_annotation,
    profile_trace,
    device_sync,
)
from cugraph_tpu.utils.validation import (
    checks_enabled,
    validate_edgelist,
    validate_structure,
    validate_vertex_subset,
)


class MissingModule:
    """Placeholder that raises on first use (reference import_optional)."""

    def __init__(self, name):
        self._name = name

    def __getattr__(self, item):
        raise ModuleNotFoundError(f"optional dependency {self._name!r} "
                                  "is not installed")


def import_optional(name: str):
    """Import a module, returning a raising placeholder when absent
    (python/cugraph/cugraph/utilities/utils.py:323)."""
    try:
        return importlib.import_module(name)
    except ImportError:
        return MissingModule(name)


def ensure_cugraph_obj(obj, *, directed: bool = False):
    """Coerce networkx graphs / scipy sparse / numpy adjacency / edge frames
    into a cugraph_tpu.Graph (utilities/utils.py:212 ensure_cugraph_obj).
    Returns (Graph, input_type)."""
    import numpy as np

    from cugraph_tpu.api.graph import Graph

    if isinstance(obj, Graph):
        return obj, Graph

    nx = import_optional("networkx")
    if not isinstance(nx, MissingModule) and isinstance(obj, nx.Graph):
        G = Graph(directed=obj.is_directed())
        edges = list(obj.edges(data=True))
        src = np.array([u for u, v, _ in edges])
        dst = np.array([v for u, v, _ in edges])
        w = np.array([d.get("weight", 1.0) for _, _, d in edges], np.float32)
        weighted = any("weight" in d for _, _, d in edges)
        G.from_edgelist(src, dst, w if weighted else None)
        return G, type(obj)

    sp = import_optional("scipy.sparse")
    if not isinstance(sp, MissingModule) and sp.issparse(obj):
        coo = obj.tocoo()
        G = Graph(directed=directed)
        G.from_edgelist(coo.row, coo.col, coo.data.astype(np.float32),
                        renumber=False)
        return G, type(obj)

    if isinstance(obj, np.ndarray) and obj.ndim == 2:
        G = Graph(directed=directed)
        G.from_numpy_array(obj)
        return G, np.ndarray

    raise TypeError(f"cannot convert {type(obj)!r} to a cugraph_tpu Graph")
