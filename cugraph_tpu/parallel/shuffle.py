"""Distributed shuffle: route (key, value) tuples to key owners over the mesh.

TPU-native replacement for the reference's shuffle layer
(utilities/shuffle_comm.cuh:467 groupby_gpu_id_and_shuffle_values, :533
groupby_gpu_id_and_shuffle_kv_pairs): variable-size NCCL all-to-alls become
FIXED-CAPACITY `jax.lax.all_to_all` exchanges (SURVEY.md §7: "fixed-capacity
buckets + count registers + capacity-doubling retry loop outside jit").

Routing is two-stage over the 2D mesh (row first, then column — classic 2D
routing): stage 1 moves tuples along "major" to the owner's mesh row, stage 2
along "minor" to the owner device.  Each stage buckets locally (sort by
target coordinate), pads buckets to the static capacity, and exchanges.
Overflowing tuples are counted and reported; callers retry with a larger
capacity (`shuffle_to_owners` does this automatically).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from cugraph_tpu.parallel import prims
from cugraph_tpu.parallel.mesh import vertex_spec


def _bucketize(keys, target, payload, n_buckets: int, cap: int, valid):
    """Group local tuples by target coordinate into [n_buckets, cap] slots.

    Returns (keys_b, payload_b, valid_b, n_dropped).  Pure jnp (runs inside
    shard_map).  Tuples beyond a bucket's capacity are dropped and counted.
    """
    L = keys.shape[0]
    tgt = jnp.where(valid, target, n_buckets)  # invalid → overflow bucket
    order = jnp.argsort(tgt, stable=True)
    tgt_s = jnp.take(tgt, order)
    keys_s = jnp.take(keys, order)
    pay_s = jnp.take(payload, order, axis=0)
    # position within each bucket run
    idx = jnp.arange(L)
    first_of_run = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), tgt_s[1:] != tgt_s[:-1]])
    run_start = jnp.where(first_of_run, idx, 0)
    run_start = jax.lax.associative_scan(jnp.maximum, run_start)
    pos = idx - run_start
    ok = (tgt_s < n_buckets) & (pos < cap)
    slot = jnp.where(ok, tgt_s * cap + pos, n_buckets * cap)  # dropped → pad
    out_keys = jnp.full((n_buckets * cap + 1,), -1, keys.dtype)
    out_keys = out_keys.at[slot].set(jnp.where(ok, keys_s, -1))[:-1]
    out_pay = jnp.zeros((n_buckets * cap + 1,) + payload.shape[1:],
                        payload.dtype)
    out_pay = out_pay.at[slot].set(jnp.where(
        ok.reshape((-1,) + (1,) * (payload.ndim - 1)), pay_s, 0))[:-1]
    dropped = jnp.sum((tgt_s < n_buckets) & ~ok)
    return (out_keys.reshape(n_buckets, cap),
            out_pay.reshape((n_buckets, cap) + payload.shape[1:]),
            dropped)


@lru_cache(maxsize=32)
def _shuffle_kernel(mesh, pmaj, pmin, chunk, cap1, pay_ndim):
    # stage-2 capacity sized so stage 2 can NEVER drop: at most pmaj*cap1
    # tuples arrive per device after stage 1
    cap2 = pmaj * cap1

    def kernel(keys, payload):
        k = keys
        pay = payload
        valid = k >= 0
        r = k // chunk
        own_i = jnp.where(valid, r // pmin, 0)

        # stage 1: route along "major" to the owner's mesh row
        kb, pb, drop1 = _bucketize(k, own_i, pay, pmaj, cap1, valid)
        kb = jax.lax.all_to_all(kb, prims.MAJOR, split_axis=0, concat_axis=0,
                                tiled=True)
        pb = jax.lax.all_to_all(pb, prims.MAJOR, split_axis=0, concat_axis=0,
                                tiled=True)
        k1 = kb.reshape(-1)
        p1 = pb.reshape((-1,) + pb.shape[2:]) if pay_ndim > 1 else pb.reshape(-1)

        # stage 2: route along "minor" to the owner device (cannot drop)
        valid1 = k1 >= 0
        own_j1 = jnp.where(valid1, (k1 // chunk) % pmin, 0)
        kb2, pb2, _ = _bucketize(k1, own_j1, p1, pmin, cap2, valid1)
        kb2 = jax.lax.all_to_all(kb2, prims.MINOR, split_axis=0, concat_axis=0,
                                 tiled=True)
        pb2 = jax.lax.all_to_all(pb2, prims.MINOR, split_axis=0, concat_axis=0,
                                 tiled=True)
        k2 = kb2.reshape(-1)
        p2 = pb2.reshape((-1,) + pb2.shape[2:]) if pay_ndim > 1 else pb2.reshape(-1)
        dropped = prims.psum_all(drop1)
        return k2, p2, dropped

    vs = vertex_spec()
    return jax.jit(jax.shard_map(
        kernel, mesh=mesh, in_specs=(vs, vs),
        out_specs=(vs, vs, P())))


def shuffle_to_owners(mesh, part, keys, payload, *, capacity: int | None = None,
                      max_retries: int = 6):
    """Route (key, payload) tuples to the devices owning `key`.

    keys: int array [total] evenly sharded over the mesh (−1 = empty slot);
    payload: same leading dim.  Returns (keys_out, payload_out) owner-sharded
    with pmin·pmaj·cap slots per device (−1 padding).  Retries with doubled
    stage-1 capacity until nothing is dropped (the reference's variable-size
    shuffle made static-shape, SURVEY.md §7).
    """
    keys = np.asarray(keys)
    payload = np.asarray(payload)
    total = keys.shape[0]
    n_dev = part.num_devices
    assert total % n_dev == 0, "keys length must be divisible by device count"
    per_dev = total // n_dev
    cap = int(capacity or max(8, (2 * per_dev) // part.pmaj))

    vsh = NamedSharding(mesh, vertex_spec())
    kd = jax.device_put(jnp.asarray(keys), vsh)
    pd = jax.device_put(jnp.asarray(payload), vsh)
    for _ in range(max_retries):
        kern = _shuffle_kernel(mesh, part.pmaj, part.pmin, part.chunk,
                               cap, payload.ndim)
        ko, po, dropped = kern(kd, pd)
        if int(dropped) == 0:
            return ko, po
        cap *= 2
    raise RuntimeError("shuffle capacity retry limit exceeded")


def shuffle_reduce_by_key(mesh, part, keys, values, op: str = "sum"):
    """Shuffle values to key owners and reduce duplicates per key.

    The groupby_gpu_id_and_shuffle_kv_pairs + owner-side reduce pattern
    (shuffle_comm.cuh:533).  Returns a dense [pad_v] array (sum/min/max over
    all tuples per key), owner-sharded.
    """
    ko, vo = shuffle_to_owners(mesh, part, keys, values)
    return _reduce_kernel(mesh, part.chunk, op)(ko, vo)


# module-level cache: a function-local lru_cache would be rebuilt (and the
# shard_map re-jitted — 30-200 s per compile through the tunnel) on EVERY
# shuffle_reduce_by_key call
@lru_cache(maxsize=8)
def _reduce_kernel(mesh_, chunk, op_):
    def kernel(k, v):
        i, j = prims.my_coords()
        pmin = jax.lax.axis_size(prims.MINOR)
        base = (i * pmin + j) * chunk
        local = jnp.where(k >= 0, k - base, chunk)  # invalid → pad slot
        seg = {"sum": jax.ops.segment_sum, "min": jax.ops.segment_min,
               "max": jax.ops.segment_max}[op_]
        out = seg(v, local, num_segments=chunk + 1)
        return out[:chunk]

    return jax.jit(jax.shard_map(kernel, mesh=mesh_,
                                 in_specs=(vertex_spec(), vertex_spec()),
                                 out_specs=vertex_spec()))
