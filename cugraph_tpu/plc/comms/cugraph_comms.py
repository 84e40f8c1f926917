"""Dask-free multi-process comms bootstrap.

Mirrors pylibcugraph/comms/cugraph_nccl_comms.py:69-182 (``nccl_init`` /
``cugraph_comms_init`` / ``cugraph_comms_shutdown`` /
``cugraph_comms_create_unique_id`` / ``cugraph_comms_get_raft_handle``) —
the reference's torch/DDP-style launch path where each process brings up
NCCL from a broadcast unique id, builds a raft handle, and splits the 2D
subcomms, with no Dask in the loop.

The TPU-native transport is the jax distributed runtime: the "unique id" is
a coordinator address (host:port) that rank 0 creates and every rank passes
to ``jax.distributed.initialize``; the raft-handle analog is a
``ResourceHandle`` carrying the 2D device Mesh.  The 2D grid split follows
the reference's ``__get_2D_div`` (cugraph_nccl_comms.py:127-136).
"""

from __future__ import annotations

import math
import socket

__all__ = [
    "cugraph_comms_init",
    "cugraph_comms_shutdown",
    "cugraph_comms_create_unique_id",
    "cugraph_comms_get_raft_handle",
]

_raft_handle = None
_initialized_distributed = False


def _get_2D_div(ndevices):
    """(prows, pcols) split, reference cugraph_nccl_comms.py:127-136."""
    prows = int(math.sqrt(ndevices))
    while ndevices % prows != 0:
        prows = prows - 1
    return prows, int(ndevices / prows)


def _primary_ip():
    """Best-effort address other hosts can reach this one at (falls back to
    loopback on an isolated box).  The UDP connect never sends a packet —
    it only asks the kernel which interface would route out."""
    try:
        with socket.socket(socket.AF_INET, socket.SOCK_DGRAM) as s:
            s.connect(("10.255.255.255", 1))
            return s.getsockname()[0]
    except OSError:
        return "127.0.0.1"


def cugraph_comms_create_unique_id(host=None):
    """Coordinator address for rank 0 to broadcast (the NCCL-uid analog).

    Must be called ON the rank-0 host: the address carries that host's
    reachable IP (NCCL's unique id works cross-machine; a loopback address
    would strand remote ranks).  Pass ``host=`` to pin a specific interface.
    The port is picked free-at-probe-time; as with any probe-then-bind
    scheme it can race with other services — rank 0's
    jax.distributed.initialize fails fast if it was taken."""
    host = host or _primary_ip()
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("0.0.0.0", 0))
        port = s.getsockname()[1]
    return f"{host}:{port}"


def cugraph_comms_init(rank, world_size, uid=None, device=0, **init_kwargs):
    """Bring up the distributed runtime + the 2D mesh handle.

    rank/world_size are PROCESS coordinates; ``uid`` is the coordinator
    address from ``cugraph_comms_create_unique_id`` (required when
    world_size > 1).  ``device`` is accepted for signature parity (jax owns
    device assignment).
    """
    global _raft_handle, _initialized_distributed
    if _raft_handle is not None:
        raise RuntimeError("cuGraph has already been initialized!")

    import jax

    if int(world_size) > 1:
        if uid is None:
            raise ValueError("multi-process init needs the unique id "
                             "(coordinator address) from "
                             "cugraph_comms_create_unique_id()")
        jax.distributed.initialize(coordinator_address=str(uid),
                                   num_processes=int(world_size),
                                   process_id=int(rank), **init_kwargs)
        _initialized_distributed = True

    from cugraph_tpu.plc.graphs import ResourceHandle
    from cugraph_tpu.plc.comms.comms_wrapper import init_subcomms

    handle = ResourceHandle()
    # row_comm_size = the FIRST element of the div (the reference's own
    # cugraph_nccl_comms.py:179 binds it as `pcols, _` despite __get_2D_div
    # documenting a (prows, pcols) return — we keep the value, not the name)
    row_comm_size, _ = _get_2D_div(len(jax.devices()))
    init_subcomms(handle, row_comm_size)
    _raft_handle = handle
    return handle


def cugraph_comms_shutdown():
    """Tear down the handle (and the distributed runtime if we started it)."""
    global _raft_handle, _initialized_distributed
    if _initialized_distributed:
        import jax

        jax.distributed.shutdown()
        _initialized_distributed = False
    _raft_handle = None


def cugraph_comms_get_raft_handle():
    return _raft_handle
