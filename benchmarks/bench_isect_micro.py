"""Microbenchmark: candidate TPU formulations for SG pair intersection.

Measures (t(2N)-t(N) of one jitted loop, per CLAUDE.md tunnel rules):
  1. element gather  — jnp.take(flat, idx[P*D])          (known-scalarized baseline)
  2. row gather      — jnp.take(table[V,D], us, axis=0)  (slice gather; may vectorize)
  3. allpairs count  — sum over [P,D,D] equality         (dense compare, no gather)
  4. rowsort count   — per-row sort of [P,2D] + adjacent-equal
  5. current pair_intersection (binary search) at same P, D

Run on real TPU:  cd /root/repo && nohup python benchmarks/bench_isect_micro.py > /tmp/isect_micro.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, n_lo=4, n_hi=8):
    """Time one jitted loop at two iteration counts; return per-iter seconds."""
    f = jax.jit(fn, static_argnums=(0,))
    f(n_lo).block_until_ready()  # compile
    t0 = time.perf_counter(); f(n_lo).block_until_ready(); t1 = time.perf_counter()
    f(n_hi).block_until_ready()
    t2 = time.perf_counter(); f(n_hi).block_until_ready(); t3 = time.perf_counter()
    return ((t3 - t2) - (t1 - t0)) / (n_hi - n_lo)


def main():
    rng = np.random.default_rng(0)
    V = 1 << 19
    D = 64
    P = 1 << 16

    table = jnp.asarray(rng.integers(0, V, size=(V, D)), dtype=jnp.int32)
    flat = table.reshape(-1)
    us = jnp.asarray(rng.integers(0, V, size=(P,)), dtype=jnp.int32)
    vs = jnp.asarray(rng.integers(0, V, size=(P,)), dtype=jnp.int32)
    idx_flat = jnp.asarray(rng.integers(0, V * D, size=(P * D,)), dtype=jnp.int32)

    # 1. element gather
    def elem(n):
        def body(i, c):
            g = jnp.take(flat, (idx_flat + c) % (V * D))
            return g[0] + i
        return jax.lax.fori_loop(0, n, body, jnp.int32(0))
    t = timed(elem)
    print(f"elem_gather: {t*1e3:.3f} ms/iter -> {P*D/t/1e9:.3f} G elem/s", flush=True)

    # 2. row gather
    def rowg(n):
        def body(i, c):
            g = jnp.take(table, (us + c) % V, axis=0)
            return g[0, 0] + i
        return jax.lax.fori_loop(0, n, body, jnp.int32(0))
    t = timed(rowg)
    print(f"row_gather:  {t*1e3:.3f} ms/iter -> {P*D/t/1e9:.3f} G elem/s", flush=True)

    # 3. all-pairs equality count on pre-gathered tiles
    nu = jnp.take(table, us, axis=0)
    nv = jnp.take(table, vs, axis=0)
    def allpairs(n):
        def body(i, c):
            eq = (nu[:, :, None] + c) == nv[:, None, :]
            return jnp.sum(eq.astype(jnp.int32)) + i
        return jax.lax.fori_loop(0, n, body, jnp.int32(0))
    t = timed(allpairs)
    print(f"allpairs:    {t*1e3:.3f} ms/iter -> {P*D*D/t/1e9:.3f} G cmp/s "
          f"({P/t/1e6:.2f} M pairs/s)", flush=True)

    # 4. per-row sort of concat + adjacent equal
    cat = jnp.concatenate([nu, nv], axis=1)
    def rowsort(n):
        def body(i, c):
            s = jnp.sort(cat + c, axis=1)
            return jnp.sum((s[:, 1:] == s[:, :-1]).astype(jnp.int32)) + i
        return jax.lax.fori_loop(0, n, body, jnp.int32(0))
    t = timed(rowsort)
    print(f"rowsort:     {t*1e3:.3f} ms/iter ({P/t/1e6:.2f} M pairs/s)", flush=True)

    # 5. current binary-search path on a real graph
    from cugraph_tpu.core.structure import build_structure_host
    from cugraph_tpu.prims.intersection import pair_intersection
    src = rng.integers(0, V, size=(1 << 22,))
    dst = rng.integers(0, V, size=(1 << 22,))
    g = build_structure_host(src, dst, None, num_vertices=V)
    gs = g  # GraphStructure
    def binsearch(n):
        def body(i, c):
            out = pair_intersection(gs, (us + c) % V, (vs + c) % V, max_deg=D)
            return out["count"][0] + i
        return jax.lax.fori_loop(0, n, body, jnp.int32(0))
    t = timed(binsearch, 2, 4)
    print(f"binsearch:   {t*1e3:.3f} ms/iter ({P/t/1e6:.2f} M pairs/s)", flush=True)


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    main()
