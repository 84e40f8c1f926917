"""Expensive-check validation (the reference's ``do_expensive_check`` model).

The reference has no sanitizer; correctness is guarded by O(V+E) invariant
validations behind ``do_expensive_check`` flags threaded through every API
(243 files, e.g. pagerank_impl.cuh:347; utilities/validation_checks.hpp).
Same posture here: host-side NumPy invariant checks callable from any entry
point, plus a module switch to force them on globally
(CUGRAPH_TPU_EXPENSIVE_CHECKS=1).
"""

from __future__ import annotations

import os

import numpy as np

from cugraph_tpu.api.exceptions import InvalidInputError


def checks_enabled(flag: bool | None = None) -> bool:
    if flag is not None:
        return bool(flag)
    return bool(os.environ.get("CUGRAPH_TPU_EXPENSIVE_CHECKS"))


def validate_edgelist(src, dst, weight=None, num_vertices=None):
    """O(E) edge list invariants (create_graph_from_edgelist expensive
    checks): ids in range, no negatives, finite weights."""
    src = np.asarray(src)
    dst = np.asarray(dst)
    if src.shape != dst.shape:
        raise InvalidInputError("src/dst length mismatch")
    if src.size:
        if src.min(initial=0) < 0 or dst.min(initial=0) < 0:
            raise InvalidInputError("negative vertex id in edge list")
        if num_vertices is not None:
            if src.max(initial=-1) >= num_vertices or dst.max(initial=-1) >= num_vertices:
                raise InvalidInputError("vertex id out of range")
    if weight is not None:
        w = np.asarray(weight)
        if w.shape != src.shape:
            raise InvalidInputError("weight length mismatch")
        if not np.all(np.isfinite(w)):
            raise InvalidInputError("non-finite edge weight")


def validate_structure(g) -> None:
    """O(V+E) CSR invariants (validation_checks.hpp analog): offsets monotone,
    indices in range, majors consistent with offsets."""
    for adj in (g.csr, g.csc):
        offs = np.asarray(adj.offsets)
        if np.any(np.diff(offs) < 0):
            raise InvalidInputError("CSR offsets not monotone")
        if int(offs[-1]) != adj.pad_e:
            raise InvalidInputError("CSR offsets do not cover the edge array")
        idx = np.asarray(adj.indices)
        if idx.size and (idx.min() < 0 or idx.max() >= adj.pad_v):
            raise InvalidInputError("CSR index out of range")
        majors = np.asarray(adj.majors)
        if np.any(np.diff(majors) < 0):
            raise InvalidInputError("CSR majors not sorted")
        expect = np.repeat(np.arange(adj.pad_v, dtype=np.int64), np.diff(offs))
        if not np.array_equal(expect, majors):
            raise InvalidInputError("CSR majors inconsistent with offsets")


def validate_vertex_subset(G, vertices) -> np.ndarray:
    """Check every vertex exists; returns internal ids (raises otherwise)."""
    return G.lookup_internal_vertex_id(np.asarray(vertices))
