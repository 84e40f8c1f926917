"""Memory management helpers.

Reference: large_buffer_manager (pinned-host spill), host_staging_buffer_
manager, RMM pools (SURVEY.md N30).  TPU translation: HBM is managed by the
jax runtime; what the framework controls is (a) sizing — predicting whether a
graph fits before building device arrays, (b) host staging — keeping cold
structures as NumPy and shipping on demand, (c) donation — letting XLA reuse
input buffers across iterations.
"""

from __future__ import annotations

import numpy as np


def estimate_graph_bytes(num_vertices: int, num_edges: int, *,
                         weighted: bool = True, both_orientations: bool = True,
                         dtype_bytes: int = 4) -> int:
    """Device bytes for a padded CSR/CSC GraphStructure (core/structure.py):
    per orientation: offsets (V+1) + indices (E) + majors (E) + weights (E)."""
    per = (num_vertices + 1) * 4 + num_edges * (8 + dtype_bytes)
    return per * (2 if both_orientations else 1)


def estimate_dist_graph_bytes(num_vertices: int, num_edges: int, pmaj: int,
                              pmin: int, *, store_push: bool = True) -> int:
    """Total bytes across the mesh for a DistGraph (parallel/partition.py):
    per orientation per edge slot: src_loc + dst_loc (8) + weight (4) +
    valid (1); plus two degree vectors."""
    slots = num_edges * 1.15  # per-device padding slack
    per = slots * 13
    orient = 2 if store_push else 1
    return int(per * orient + 2 * num_vertices * 4)


def device_memory_stats(device=None) -> dict:
    """Live/limit HBM bytes for a device (rmm pool stats analog)."""
    import jax

    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats() or {}
    except Exception:
        stats = {}
    return {
        "bytes_in_use": stats.get("bytes_in_use", -1),
        "bytes_limit": stats.get("bytes_limit", -1),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use", -1),
    }


def fits_on_device(num_vertices: int, num_edges: int, device=None,
                   safety: float = 0.8) -> bool:
    """Pre-flight check before building device structures."""
    stats = device_memory_stats(device)
    limit = stats["bytes_limit"]
    if limit in (-1, 0, None):
        return True  # unknown — let the runtime decide
    need = estimate_graph_bytes(num_vertices, num_edges)
    avail = limit - max(stats["bytes_in_use"], 0)
    return need <= avail * safety


class HostStagingBuffer:
    """Keep a cold array host-side, ship to device on demand and drop after
    use (host_staging_buffer_manager.hpp analog — on TPU this is just explicit
    device_put lifecycle management)."""

    def __init__(self, array: np.ndarray):
        self._host = np.asarray(array)
        self._device = None

    def to_device(self, sharding=None):
        import jax

        if self._device is None:
            self._device = (jax.device_put(self._host, sharding)
                            if sharding is not None
                            else jax.device_put(self._host))
        return self._device

    def release(self):
        self._device = None

    @property
    def nbytes(self) -> int:
        return self._host.nbytes
