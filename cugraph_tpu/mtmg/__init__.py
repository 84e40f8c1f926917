"""MTMG — multi-thread multi-device execution in one process.

Reference: include/cugraph/mtmg/ (resource_manager/instance_manager own one
raft handle per GPU; per-thread handles bind thread→stream; thread-safe
edge-list append — SURVEY.md N28).

TPU translation: single-process multi-device is jax's NATIVE execution model —
the jax runtime owns every local device and dispatch is already thread-safe
and asynchronous, so the reference's careful handle/stream machinery reduces
to bookkeeping.  What remains useful, and is provided here, is the same
*shape* of API so MTMG-structured reference code ports directly:

* ``ResourceManager``      — enumerates usable devices (registration step)
* ``InstanceManager``      — hands out per-thread handles round-robin
* ``PerThreadEdgelist``    — thread-safe chunked edge-list append + flush
* ``GraphHandle``          — builds the DistGraph once all threads flushed
"""

from __future__ import annotations

import threading

import numpy as np


class ResourceManager:
    """Tracks which local devices participate (mtmg/resource_manager.hpp)."""

    def __init__(self):
        self._ranks = []

    def register_local_gpu(self, rank: int, device=None):
        import jax

        device = device if device is not None else jax.devices()[rank]
        self._ranks.append((rank, device))

    # parity alias (reference naming)
    register_local_device = register_local_gpu

    def _sorted(self):
        # sort by rank ONLY: jax Device objects are unorderable, so a rank
        # tie (double registration) must not fall through to comparing them
        return sorted(self._ranks, key=lambda t: t[0])

    def registered_ranks(self):
        return [r for r, _ in self._sorted()]

    def devices(self):
        return [d for _, d in self._sorted()]

    def create_instance_manager(self, ranks=None):
        devs = self.devices()
        if ranks is not None:
            devs = [d for (r, d) in self._sorted() if r in set(ranks)]
        return InstanceManager(devs)


class Handle:
    """Per-thread handle (mtmg/handle.hpp): a device binding.  jax dispatch
    is stream-ordered per device already; the handle only records identity."""

    def __init__(self, device, index: int):
        self.device = device
        self.index = index

    def get_rank(self) -> int:
        return self.index

    def sync(self):
        import jax

        # there is no per-handle stream; effectful work is awaited via arrays
        jax.effects_barrier()


class InstanceManager:
    """Round-robin handle dispenser (mtmg/instance_manager.hpp)."""

    def __init__(self, devices):
        self._devices = list(devices)
        if not self._devices:
            raise ValueError("no devices registered (register_local_gpu "
                             "before create_instance_manager)")
        self._next = 0
        self._lock = threading.Lock()

    def get_handle(self) -> Handle:
        with self._lock:
            i = self._next
            self._next = (self._next + 1) % len(self._devices)
        return Handle(self._devices[i], i)

    def size(self) -> int:
        return len(self._devices)


class PerThreadEdgelist:
    """Thread-safe chunked append of (src, dst[, wgt]) edges
    (mtmg/per_thread_edgelist.hpp).  Each thread appends into its own chunk
    list; ``consolidate`` concatenates everything."""

    def __init__(self, handle: Handle | None = None, chunk_size: int = 1 << 20):
        self._local = threading.local()
        self._all = []
        self._lock = threading.Lock()
        # parity knob: the reference flushes per-thread staging buffers at
        # this granularity; chunks here are host lists already, so it only
        # bounds the per-append coalescing below (not a correctness knob)
        self.chunk_size = chunk_size

    def _bufs(self):
        if not hasattr(self._local, "bufs"):
            self._local.bufs = ([], [], [])
            with self._lock:
                self._all.append(self._local.bufs)
        return self._local.bufs

    def append(self, src, dst, wgt=None):
        src = np.atleast_1d(np.asarray(src))
        dst = np.atleast_1d(np.asarray(dst))
        if len(src) != len(dst):
            raise ValueError(f"src/dst length mismatch: {len(src)} vs "
                             f"{len(dst)}")
        if wgt is not None:
            wgt = np.atleast_1d(np.asarray(wgt))
            if len(wgt) != len(src):
                raise ValueError(f"wgt length mismatch: {len(wgt)} weights "
                                 f"for {len(src)} edges")
        # append the TRIPLE under the lock so a concurrent consolidate()
        # can never observe a torn (src-without-dst) chunk
        s, d, w = self._bufs()
        with self._lock:
            s.append(src)
            d.append(dst)
            if wgt is not None:
                w.append(wgt)

    def flush(self):  # parity no-op: chunks are already host-resident
        pass

    def consolidate(self):
        with self._lock:
            srcs = [np.concatenate(s) for s, _, _ in self._all if s]
            dsts = [np.concatenate(d) for _, d, _ in self._all if d]
            ws = [np.concatenate(w) for _, _, w in self._all if w]
        src = np.concatenate(srcs) if srcs else np.empty(0, np.int64)
        dst = np.concatenate(dsts) if dsts else np.empty(0, np.int64)
        w = np.concatenate(ws) if ws else None
        if w is not None and len(w) != len(src):
            raise ValueError(
                "mixed weighted/unweighted appends: every append must either "
                f"include wgt or none may ({len(w)} weights for {len(src)} edges)")
        return src, dst, w


class GraphHandle:
    """Builds the 2D-partitioned DistGraph from a consolidated edge list
    across the instance manager's devices (mtmg graph view analog)."""

    def __init__(self, instance_manager: InstanceManager):
        self.im = instance_manager

    def create_graph(self, edgelist: PerThreadEdgelist, num_vertices=None,
                     symmetrize: bool = False):
        from cugraph_tpu.parallel import build_dist_graph
        from cugraph_tpu.parallel.mesh import make_mesh_2d, mesh_shape_for, \
            shard_dist_graph

        src, dst, w = edgelist.consolidate()
        n = (int(max(src.max(initial=-1), dst.max(initial=-1))) + 1
             if num_vertices is None else num_vertices)
        ndev = max(self.im.size(), 1)
        pmaj, pmin = mesh_shape_for(ndev)
        mesh = make_mesh_2d(pmaj, pmin, self.im._devices)
        g = build_dist_graph(src, dst, w, n, pmaj, pmin, store_push=True,
                             symmetrize=symmetrize)
        return shard_dist_graph(g, mesh), mesh
