"""(key, value)-compressed minor-block endpoint cache.

Reference: the hypersparse (key, value) endpoint property caches of
graph_view.hpp:239-242 and the compressed edge-property update path
(update_edge_src_dst_property.cuh:163-224 "kv_store" branch).

On TPU, `prims.gather_minor_block` replicates the full pmin·chunk source
block on every device of a mesh row — O(V/pmaj) memory per device regardless
of how few sources the local edges actually touch.  For hypersparse edge
partitions (large meshes, skewed graphs) that replication is what exceeds
HBM first.  This cache exchanges ONLY the referenced values:

* build time (host): per device, the sorted unique block-local sources its
  valid edges reference; a STATIC all-to-all routing (which positions of
  which owner's chunk go to which peer) and the receive permutation that
  lands values in unique-source order; every edge's source index remapped to
  its compressed position.
* run time: one `jax.lax.all_to_all` along "minor" moves exactly the
  requested values — no runtime bucketing, no capacity retries (request
  lists are static properties of the graph, like the reference's kv_store
  built at graph construction).

Memory per device: U (distinct sources) + pmin·R (exchange buffer) instead
of pmin·chunk.  The SpMV consumes the cache directly via the remapped edge
indices (`pull_spmv_compressed`).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from cugraph_tpu.parallel import prims
from cugraph_tpu.parallel.mesh import edge_spec, vertex_spec
from cugraph_tpu.parallel.partition import DistGraph


@dataclass(frozen=True)
class MinorCache:
    """Static compressed-gather routing for one DistGraph's pull blocks."""

    send_idx: jax.Array    # int32 [pmaj, pmin, pmin, R] pos in own chunk
    send_valid: jax.Array  # bool  [pmaj, pmin, pmin, R]
    perm_recv: jax.Array   # int32 [pmaj, pmin, U] into flattened [pmin*R]
    cache_valid: jax.Array  # bool [pmaj, pmin, U] real unique-source slots
    src_comp: jax.Array    # int32 [pmaj, pmin, E_loc] compressed edge srcs
    u_max: int = field(metadata=dict(static=True))
    r_max: int = field(metadata=dict(static=True))
    block: int = field(metadata=dict(static=True))  # pmin·chunk (replicated size)

    @property
    def compression_ratio(self) -> float:
        """Replicated-block entries per compressed-cache entry (>1 = win)."""
        return float(self.block) / max(self.u_max + self.send_idx.shape[2]
                                       * self.r_max, 1)


def build_minor_cache(g: DistGraph) -> MinorCache:
    """Host-side routing construction from the pull blocks (one pass)."""
    src_loc = np.asarray(g.pull.src_loc)
    valid = np.asarray(g.pull.valid)
    pmaj, pmin, e_loc = src_loc.shape
    chunk = g.chunk

    uniq = {}
    u_max = 1
    for i in range(pmaj):
        for j in range(pmin):
            u = np.unique(src_loc[i, j][valid[i, j]])
            uniq[(i, j)] = u
            u_max = max(u_max, len(u))

    # requests from (i, j) to peer j2, in sorted order (u is sorted)
    req = {}
    r_max = 1
    for (i, j), u in uniq.items():
        owner = u // chunk
        for j2 in range(pmin):
            r = u[owner == j2] % chunk
            req[(i, j, j2)] = r
            r_max = max(r_max, len(r))

    send_idx = np.zeros((pmaj, pmin, pmin, r_max), np.int32)
    send_valid = np.zeros((pmaj, pmin, pmin, r_max), bool)
    perm_recv = np.zeros((pmaj, pmin, u_max), np.int32)
    cache_valid = np.zeros((pmaj, pmin, u_max), bool)
    src_comp = np.zeros((pmaj, pmin, e_loc), np.int32)
    for i in range(pmaj):
        for j in range(pmin):
            # what (i, j) must SEND to each peer j2 = what j2 requested of j
            for j2 in range(pmin):
                r = req[(i, j2, j)]
                send_idx[i, j, j2, :len(r)] = r
                send_valid[i, j, j2, :len(r)] = True
            # where each of (i, j)'s unique sources lands in its recv buffer
            u = uniq[(i, j)]
            owner = u // chunk
            rank = np.zeros(len(u), np.int64)
            for j2 in range(pmin):
                sel = owner == j2
                rank[sel] = j2 * r_max + np.arange(sel.sum())
            perm_recv[i, j, :len(u)] = rank
            cache_valid[i, j, :len(u)] = True
            # remap edges to compressed positions
            s = src_loc[i, j]
            pos = np.searchsorted(u, s) if len(u) else np.zeros_like(s)
            src_comp[i, j] = np.where(valid[i, j],
                                      np.clip(pos, 0, max(len(u) - 1, 0)), 0)
    return MinorCache(
        send_idx=jnp.asarray(send_idx), send_valid=jnp.asarray(send_valid),
        perm_recv=jnp.asarray(perm_recv), cache_valid=jnp.asarray(cache_valid),
        src_comp=jnp.asarray(src_comp), u_max=u_max, r_max=r_max,
        block=pmin * chunk)


def fetch_compressed(send_idx, send_valid, perm_recv, x_own):
    """Inside shard_map: exchange requested values along "minor"; returns the
    per-device compressed cache [U] in unique-source order."""
    vals = jnp.where(send_valid, jnp.take(x_own, send_idx), 0.0)  # [pmin, R]
    recv = jax.lax.all_to_all(vals, prims.MINOR, split_axis=0, concat_axis=0,
                              tiled=True)
    return jnp.take(recv.reshape(-1), perm_recv)


@lru_cache(maxsize=32)
def _pull_spmv_compressed_kernel(mesh, pmaj, chunk):
    def kernel(send_idx_a, send_valid_a, perm_a, src_comp_a, dst_loc_a, w_a,
               x_own):
        cache = fetch_compressed(send_idx_a[0, 0], send_valid_a[0, 0],
                                 perm_a[0, 0], x_own)
        vals = w_a[0, 0] * jnp.take(cache, src_comp_a[0, 0])
        part = prims.block_segment_reduce(vals, dst_loc_a[0, 0],
                                          pmaj * chunk, "sum")
        return prims.scatter_reduce_major_sum(part)

    es, vs = edge_spec(), vertex_spec()
    return jax.jit(jax.shard_map(
        kernel, mesh=mesh, in_specs=(es, es, es, es, es, es, vs),
        out_specs=vs))


def pull_spmv_compressed(g: DistGraph, cache: MinorCache, mesh, x_own):
    """y[dst] = Σ w·x[src] through the compressed cache — identical semantics
    to prims.pull_spmv, O(U + pmin·R) gather memory instead of O(pmin·chunk).
    Padding edges carry w = 0, so the clipped compressed indices are inert."""
    kern = _pull_spmv_compressed_kernel(mesh, g.pmaj, g.chunk)
    return kern(cache.send_idx, cache.send_valid, cache.perm_recv,
                cache.src_comp, g.pull.dst_loc, g.pull.weight, x_own)
