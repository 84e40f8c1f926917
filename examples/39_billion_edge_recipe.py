"""Billion-edge single-chip recipe at toy scale (reference
large_buffer_manager.hpp:28-60 oversubscription + the trillion-edge
headline, readme_pages/news.md:3-5): when the SpMV plan exceeds the HBM
budget, the host-spill path streams uniform chunks through the device —
and the rank vector CHECKPOINTS between iterations, the restartable
pattern `benchmarks/rmat26_recycle.py` uses to run multi-iteration
PageRank on the real 1.07-billion-edge RMAT-26 plan (docs/performance.md).

Run:  python examples/39_billion_edge_recipe.py
"""

import os
import tempfile

import jax

jax.config.update("jax_platforms", "cpu")
os.environ.setdefault("CUGRAPH_TPU_PALLAS_INTERPRET", "1")

import numpy as np

import cugraph_tpu as ct
from cugraph_tpu.kernels.spill import build_spilled_spmv_plan, spmv_spilled

SCALE, EF = 9, 16
n, m = 1 << SCALE, (1 << SCALE) * EF
df = ct.generate_rmat_edgelist(scale=SCALE, num_edges=m, seed=1)
src, dst = (df["src"].to_numpy().astype(np.int64),
            df["dst"].to_numpy().astype(np.int64))

# a tiny chunk budget forces multi-chunk streaming, the RMAT-26 shape
splan = build_spilled_spmv_plan(src, dst, None, n,
                                max_chunk_bytes=64 << 10, tile_subs=8)
print(f"spilled plan: {splan.num_chunks} chunks x "
      f"{splan.chunk_bytes()/1024:.0f} KiB (pad_v={splan.pad_v})")

pad_v = splan.pad_v
out_w = np.bincount(src, minlength=pad_v).astype(np.float32)
inv_out = np.divide(1.0, out_w, out=np.zeros_like(out_w), where=out_w > 0)
is_dang = (np.arange(pad_v) < n) & (out_w <= 0)
reset = np.zeros(pad_v, np.float32)
reset[:n] = 1.0 / n


def one_iteration(p):
    pulled = np.asarray(spmv_spilled(splan, p * inv_out, precision="split"))
    dang = float(p[is_dang].sum())
    p = 0.85 * (pulled + dang * reset) + 0.15 * reset
    p[n:] = 0.0
    return p.astype(np.float32)


# checkpoint/restart loop: each iteration could be a FRESH PROCESS (that is
# exactly what rmat26_recycle.py does to defeat per-process buffer mirrors)
ckpt = os.path.join(tempfile.mkdtemp(), "rank.npz")
p = reset.copy()
for it in range(6):
    p = one_iteration(p)
    np.savez(ckpt, p=p, iter=it + 1)           # survives a process exit
    p = np.load(ckpt)["p"]                     # ...and a fresh start
    print(f"iter {it + 1}: sum={p.sum():.6f}")

# float64 host parity, the check every recorded scale row carries
ph = reset.astype(np.float64).copy()
for _ in range(6):
    scaled = ph * inv_out
    dang = ph[is_dang].sum()
    pulled = np.bincount(dst, weights=scaled[src], minlength=pad_v)
    ph = 0.85 * (pulled + dang * reset) + 0.15 * reset
    ph[n:] = 0.0
l1 = float(np.abs(p.astype(np.float64) - ph).sum())
print(f"parity vs float64 host: L1 = {l1:.2e}")
assert l1 < 1e-4
