"""TPU measurement: table-based sampling paths vs CSR-walking fallbacks.

Run: nohup python benchmarks/bench_sampling_tpu.py > /tmp/samp_tpu.log 2>&1 &
Times one jitted fori_loop at two counts (t(2N)-t(N), per CLAUDE.md tunnel rules).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, n_lo=4, n_hi=12):
    f = jax.jit(fn, static_argnums=(0,))
    f(n_lo).block_until_ready()
    t0 = time.perf_counter(); f(n_lo).block_until_ready(); t1 = time.perf_counter()
    f(n_hi).block_until_ready()
    t2 = time.perf_counter(); f(n_hi).block_until_ready(); t3 = time.perf_counter()
    return ((t3 - t2) - (t1 - t0)) / (n_hi - n_lo)


def main():
    print(jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    V = 1 << 18
    m = 1 << 22
    F = 1 << 15
    K = 8
    from cugraph_tpu.core.structure import build_structure_host
    from cugraph_tpu.algos.sampling import (_fetch_tables, _row_cumweights,
                                            _sample_neighbors)

    src = rng.integers(0, V, m)
    dst = rng.integers(0, V, m)
    w = rng.uniform(0.5, 2.0, m).astype(np.float32)
    g = build_structure_host(src, dst, w, V)
    n = V
    max_deg = int(np.asarray(g.out_degrees())[:n].max())
    print(f"V={V} m={m} max_deg={max_deg} F={F} K={K}", flush=True)
    frontier = jnp.asarray(rng.integers(0, V, F).astype(np.int32))
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    tables = _fetch_tables(g, weights=True, cum=True)
    cumw = _row_cumweights(g)
    print(f"tables built+transferred in {time.perf_counter()-t0:.1f}s "
          f"D={tables[0].shape[1]}", flush=True)

    for label, tabs in (("table", tables), ("fallback", None)):
        for wr, biased in ((False, False), (False, True), (True, True)):
            def body_fn(n_iter, _wr=wr, _b=biased, _t=tabs):
                def body(i, c):
                    k2 = jax.random.fold_in(key, i)
                    d, e, v = _sample_neighbors(g, frontier, k2, K, _wr, _b,
                                                max_deg, cumw, _t)
                    return c + d[0, 0]
                return jax.lax.fori_loop(0, n_iter, body, jnp.int32(0))
            try:
                t = timed(body_fn)
                print(f"{label} wr={wr} biased={biased}: {t*1e3:.3f} ms "
                      f"({F*K/t/1e6:.1f} M samples/s)", flush=True)
            except Exception as ex:
                print(f"{label} wr={wr} biased={biased}: FAILED {type(ex).__name__}: {ex}",
                      flush=True)


if __name__ == "__main__":
    main()
