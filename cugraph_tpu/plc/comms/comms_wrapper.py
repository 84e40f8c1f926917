"""init_subcomms — 2D subcommunicator bootstrap on a ResourceHandle.

Mirrors pylibcugraph/comms/comms_wrapper.pyx:14 ``init_subcomms(handle,
row_comm_size)``: the reference splits the raft communicator into a
row(major)×col(minor) 2D grid.  Here the grid IS a jax Mesh with axes
("major", "minor") — init_subcomms builds it over the handle's devices and
attaches it, after which MGGraph construction on that handle uses the grid.
"""

from __future__ import annotations

__all__ = ["init_subcomms"]


def init_subcomms(handle, row_comm_size):
    """Attach a row_comm_size × (n_devices // row_comm_size) mesh."""
    import jax

    from cugraph_tpu.parallel.mesh import make_mesh_2d

    devices = jax.devices()
    n = len(devices)
    row = int(row_comm_size)
    if row <= 0 or n % row:
        raise ValueError(
            f"row_comm_size {row} does not divide device count {n}")
    handle.mesh = make_mesh_2d(row, n // row, devices=devices)
    return handle
