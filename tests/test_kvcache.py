"""(key,value)-compressed minor-block cache (parallel/kvcache.py) vs the
replicated-gather pull SpMV (reference graph_view.hpp:239-242 hypersparse
endpoint caches)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding

from cugraph_tpu.parallel.kvcache import build_minor_cache, pull_spmv_compressed
from cugraph_tpu.parallel.mesh import make_mesh_2d, vertex_spec
from cugraph_tpu.parallel.partition import build_dist_graph


@pytest.fixture(scope="module")
def mesh():
    return make_mesh_2d(4, 2)


def _oracle(src, dst, w, x, pad_v):
    ref = np.zeros(pad_v, np.float32)
    np.add.at(ref, dst, w * x[src])
    return ref


def test_compressed_pull_spmv_matches_oracle(mesh):
    rng = np.random.default_rng(11)
    n, m = 300, 2000
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = rng.uniform(0.1, 1.0, m).astype(np.float32)
    g = build_dist_graph(src, dst, w, n, 4, 2, store_push=False)
    cache = build_minor_cache(g)
    x = rng.uniform(-1, 1, g.pad_v).astype(np.float32)
    xd = jax.device_put(jnp.asarray(x), NamedSharding(mesh, vertex_spec()))
    y = np.asarray(pull_spmv_compressed(g, cache, mesh, xd))
    assert np.abs(y - _oracle(src, dst, w, x, g.pad_v)).max() < 1e-4


def test_compressed_cache_wins_on_hypersparse(mesh):
    """Edges referencing FEW distinct sources: the cache must be much
    smaller than the replicated minor block."""
    rng = np.random.default_rng(3)
    n, m = 4000, 3000
    src = rng.integers(0, 12, m)        # only 12 distinct sources
    dst = rng.integers(0, n, m)
    w = np.ones(m, np.float32)
    g = build_dist_graph(src, dst, w, n, 4, 2, store_push=False)
    cache = build_minor_cache(g)
    assert cache.compression_ratio > 4.0, cache.compression_ratio
    x = rng.uniform(0, 1, g.pad_v).astype(np.float32)
    xd = jax.device_put(jnp.asarray(x), NamedSharding(mesh, vertex_spec()))
    y = np.asarray(pull_spmv_compressed(g, cache, mesh, xd))
    assert np.abs(y - _oracle(src, dst, w, x, g.pad_v)).max() < 1e-4


def test_compressed_handles_empty_blocks(mesh):
    """Devices with no edges (tiny graph on a big mesh) must not crash."""
    src = np.array([0, 1]); dst = np.array([1, 0])
    g = build_dist_graph(src, dst, np.ones(2, np.float32), 2, 4, 2,
                         store_push=False)
    cache = build_minor_cache(g)
    x = np.zeros(g.pad_v, np.float32); x[:2] = [1.0, 2.0]
    xd = jax.device_put(jnp.asarray(x), NamedSharding(mesh, vertex_spec()))
    y = np.asarray(pull_spmv_compressed(g, cache, mesh, xd))
    assert y[0] == 2.0 and y[1] == 1.0


def test_systolic_pull_spmv_matches_oracle(mesh):
    """Streamed (ppermute ring) pull SpMV — O(chunk) gather memory — must
    match the replicated-gather semantics exactly."""
    from cugraph_tpu.parallel import prims
    from cugraph_tpu.parallel.mesh import edge_spec

    rng = np.random.default_rng(2)
    n, m = 300, 2500
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = rng.uniform(0.1, 1.0, m).astype(np.float32)
    g = build_dist_graph(src, dst, w, n, 4, 2, store_push=False)
    x = rng.uniform(-1, 1, g.pad_v).astype(np.float32)
    xd = jax.device_put(jnp.asarray(x), NamedSharding(mesh, vertex_spec()))

    def kernel(sl, dl, ww, xo):
        return prims.pull_spmv_systolic(sl[0, 0], dl[0, 0], ww[0, 0], xo,
                                        pmaj=4, pmin=2, chunk=g.chunk)

    fn = jax.jit(jax.shard_map(
        kernel, mesh=mesh, in_specs=(edge_spec(),) * 3 + (vertex_spec(),),
        out_specs=vertex_spec()))
    y = np.asarray(fn(g.pull.src_loc, g.pull.dst_loc, g.pull.weight, xd))
    assert np.abs(y - _oracle(src, dst, w, x, g.pad_v)).max() < 1e-4
