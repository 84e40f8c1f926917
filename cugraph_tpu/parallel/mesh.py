"""Mesh construction for the 2D edge partition.

Replaces the reference's comms bootstrap layer entirely (Dask + raft subcomms,
dask/comms/comms.py:34-82; NCCL uid broadcast, cugraph_nccl_comms.py:69-182) —
the jax runtime owns process bootstrap; what remains is the rank-grid choice
(the `partition_manager` role, partition_manager.hpp:29-36): put "major" on
the ICI-dense axis so the gather/scatter pair rides ICI, and size the grid as
square as possible (the reference's __get_2D_div, comms.py:34-38).
"""

from __future__ import annotations

import math

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def mesh_shape_for(n_devices: int) -> tuple[int, int]:
    """(pmaj, pmin) as close to square as possible, pmaj ≥ pmin."""
    pmin = int(math.isqrt(n_devices))
    while n_devices % pmin:
        pmin -= 1
    return n_devices // pmin, pmin


def make_mesh_2d(pmaj: int | None = None, pmin: int | None = None,
                 devices=None) -> Mesh:
    """Build a Mesh with axes ("major", "minor")."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if pmaj is None or pmin is None:
        pmaj, pmin = mesh_shape_for(n)
    assert pmaj * pmin == n, f"{pmaj}x{pmin} != {n} devices"
    import numpy as np

    return Mesh(np.asarray(devices).reshape(pmaj, pmin), ("major", "minor"))


def vertex_spec() -> P:
    """PartitionSpec for global vertex vectors [pad_v, ...] (owner-sharded)."""
    return P(("major", "minor"))


def edge_spec() -> P:
    """PartitionSpec for stacked edge blocks [pmaj, pmin, E_loc, ...]."""
    return P("major", "minor")


def shard_dist_graph(g, mesh: Mesh):
    """device_put every DistGraph array with its natural sharding."""
    import jax.tree_util as jtu

    from cugraph_tpu.parallel.partition import DistGraph, EdgeBlocks

    ve = NamedSharding(mesh, vertex_spec())
    ee = NamedSharding(mesh, edge_spec())

    def put_blocks(b):
        if b is None:
            return None
        return EdgeBlocks(
            src_loc=jax.device_put(b.src_loc, ee),
            dst_loc=jax.device_put(b.dst_loc, ee),
            weight=jax.device_put(b.weight, ee),
            valid=jax.device_put(b.valid, ee),
            etype=None if b.etype is None else jax.device_put(b.etype, ee),
            etime=None if b.etime is None else jax.device_put(b.etime, ee),
            eid=None if b.eid is None else jax.device_put(b.eid, ee),
        )

    return DistGraph(
        pull=put_blocks(g.pull),
        push=put_blocks(g.push),
        out_degree=jax.device_put(g.out_degree, ve),
        in_degree=jax.device_put(g.in_degree, ve),
        num_vertices=g.num_vertices,
        num_edges=g.num_edges,
        pmaj=g.pmaj,
        pmin=g.pmin,
        chunk=g.chunk,
    )
