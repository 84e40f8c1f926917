"""RMAT recursive-matrix graph generator.

Reference: cpp/src/generators/generate_rmat_edgelist.cuh (Chakrabarti et al.
R-MAT, Graph500 parameters a=0.57 b=0.19 c=0.19) + scramble.cuh vertex id
scrambler; python wrapper python/cugraph/cugraph/generators/rmat.py.

Generation is host-side NumPy (graph construction is host work on a TPU
system; drawing on-device costs a pointless round-trip of the
[edges × scale] uniform tensor).  Deterministic for a given seed."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _counter_uniform(seed: int, num_edges: int, bit: int) -> np.ndarray:
    """Vectorized splitmix64-finalized counter RNG: one u64 hash per
    (seed, edge, bit), mapped to [0, 1).  Bit-identical to the native C++
    generator (core/_native/builder.cpp rmat_edgelist)."""
    with np.errstate(over="ignore"):
        z = (np.uint64((seed * 0xD6E8FEB86659FD93) % 2**64)
             + np.arange(num_edges, dtype=np.uint64)
             * np.uint64(0x9E3779B97F4A7C15)
             + np.uint64(bit) * np.uint64(0xC2B2AE3D27D4EB4F))
        z ^= z >> np.uint64(30)
        z *= np.uint64(0xBF58476D1CE4E5B9)
        z ^= z >> np.uint64(27)
        z *= np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(31)
    return (z >> np.uint64(11)).astype(np.float64) * 2.0**-53


def _rmat_host(scale: int, num_edges: int, a: float, b: float, c: float,
               seed: int, clip_and_flip: bool):
    """Host RMAT — identical quadrant semantics to _rmat_kernel.

    Graph generation is host work in this framework (the device consumes the
    compressed graph); drawing on-host avoids a device round-trip of the
    [edges × scale] uniform tensor, which dominates wall time on a tunneled
    accelerator.  Hot path: the native threaded C++ generator
    (core/_native/builder.cpp rmat_edgelist, reference
    generate_rmat_edgelist.cuh); the NumPy fallback uses the same
    per-(seed, edge, bit) counter RNG and is bit-identical
    (tests/test_native.py)."""
    if scale > 31:
        # vertex ids are int32 throughout the framework (device plans,
        # renumbering); beyond 2^31 they would silently wrap negative
        raise ValueError(
            f"scale={scale} exceeds the int32 vertex-id range (max 31)")
    from cugraph_tpu.core.native import rmat_native

    out = rmat_native(scale, num_edges, a, b, c, seed, clip_and_flip)
    if out is not None:
        return out
    src = np.zeros(num_edges, np.int64)
    dst = np.zeros(num_edges, np.int64)
    for bit in range(scale):
        u = _counter_uniform(seed, num_edges, bit)
        src_bit = (u >= a + b).astype(np.int64)
        thresh_dst = np.where(src_bit == 1, a + b + c, a)
        dst_bit = (u >= thresh_dst).astype(np.int64)
        src = (src << 1) | src_bit
        dst = (dst << 1) | dst_bit
    if clip_and_flip:
        lo = np.minimum(src, dst)
        hi = np.maximum(src, dst)
        src, dst = lo, hi
    return src.astype(np.int32), dst.astype(np.int32)


@partial(jax.jit, static_argnames=("scale",))
def _scramble_kernel(ids, scale: int):
    """Deterministic vertex-id scrambler within [0, 2^scale) (reference
    generators/scramble.cuh uses a bijective bit-mix; here a feistel-style
    xor-multiply-shift confined to `scale` bits)."""
    x = ids.astype(jnp.uint32)
    mask = jnp.uint32((1 << scale) - 1)
    x = (x ^ (x >> 8)) & mask
    x = (x * jnp.uint32(0x9E3B)) & mask
    x = (x ^ (x >> 4)) & mask
    x = (x * jnp.uint32(0x85EB)) & mask
    x = (x ^ (x >> 7)) & mask
    return x.astype(jnp.int32)


def rmat(scale: int, num_edges: int, a: float = 0.57, b: float = 0.19,
         c: float = 0.19, seed: int = 42, clip_and_flip: bool = False,
         scramble_vertex_ids: bool = False, create_using=None,
         mg: bool = False, include_edge_weights: bool = False,
         minimum_weight=0.0, maximum_weight=1.0, dtype=np.float32,
         include_edge_ids: bool = False, include_edge_types: bool = False,
         min_edge_type_value=0, max_edge_type_value=0):
    """Generate an RMAT edge list or Graph (reference rmat.py /
    generate_rmat_edgelist.cuh).  create_using=None returns a DataFrame
    ['src','dst'(, 'weights')]; pass a Graph class to get a built graph."""
    if a + b + c > 1.0:
        raise ValueError("a + b + c must be <= 1.0")
    src, dst = _rmat_host(int(scale), int(num_edges), float(a), float(b),
                          float(c), int(seed), bool(clip_and_flip))
    if scramble_vertex_ids:
        src = np.asarray(_scramble_kernel(jnp.asarray(src), int(scale)))
        dst = np.asarray(_scramble_kernel(jnp.asarray(dst), int(scale)))
    src = np.asarray(src)
    dst = np.asarray(dst)
    cols = {"src": src, "dst": dst}
    if include_edge_weights:
        w = np.random.default_rng(seed + 1).uniform(
            minimum_weight, maximum_weight, num_edges)
        cols["weights"] = w.astype(dtype)
    import pandas as pd
    df = pd.DataFrame(cols)
    if create_using is None:
        return df
    G = create_using() if isinstance(create_using, type) else create_using
    G.from_edgelist(df["src"].to_numpy(), df["dst"].to_numpy(),
                    df["weights"].to_numpy() if include_edge_weights else None)
    return G


def generate_rmat_edgelist(*args, **kwargs):
    return rmat(*args, **kwargs)


def generate_rmat_edgelists(n_edgelists: int, min_scale: int, max_scale: int,
                            edge_factor: int = 16, seed: int = 42, **kw):
    """Batch RMAT generation (reference generate_rmat_edgelists.pyx)."""
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n_edgelists):
        s = int(rng.integers(min_scale, max_scale + 1))
        out.append(rmat(s, (2 ** s) * edge_factor, seed=seed + i, **kw))
    return out
