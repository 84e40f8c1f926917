"""MTMG walkthrough (reference cpp/tests/mtmg/threaded_test.cu as a
script): many INGEST THREADS append edge chunks through per-thread
edgelists while an instance manager hands each thread a device handle;
one distributed graph is built from the consolidated list and MG
analytics run on it — the single-process multi-device ETL pattern.

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
          python examples/38_mtmg_threaded_ingest.py
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import threading
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from cugraph_tpu.mtmg import (GraphHandle, InstanceManager,
                              PerThreadEdgelist, ResourceManager)
from cugraph_tpu.parallel import mg_pagerank, mg_wcc

rm = ResourceManager()
for r, dev in enumerate(jax.devices()[:8]):
    rm.register_local_gpu(r, dev)
im = rm.create_instance_manager()
print(f"instance manager over {im.size()} devices")

SCALE, EF, THREADS = 13, 16, 8
n, m = 1 << SCALE, (1 << SCALE) * EF
rng = np.random.default_rng(0)
src = rng.integers(0, n, m)
dst = rng.integers(0, n, m)

el = PerThreadEdgelist()
per = m // THREADS


def worker(t):
    h = im.get_handle()          # binds this thread to a device
    assert h.device is not None
    lo = t * per
    # stream in small chunks like a real loader
    for c in range(lo, lo + per, 4096):
        el.append(src[c:c + 4096], dst[c:c + 4096])
    el.flush()


t0 = time.time()
threads = [threading.Thread(target=worker, args=(t,)) for t in range(THREADS)]
for th in threads:
    th.start()
for th in threads:
    th.join()
s, d, w = el.consolidate()
print(f"{THREADS} threads ingested {len(s)} edges in {time.time()-t0:.2f}s")

g, mesh = GraphHandle(im).create_graph(el, num_vertices=n)
p, err, iters = mg_pagerank(g, mesh, tol=1e-7, max_iter=100)
print(f"mg_pagerank: sum={float(np.asarray(p)[:n].sum()):.6f} "
      f"({int(iters)} iterations)")
labels = np.asarray(mg_wcc(g, mesh))[:n]
print(f"mg_wcc: {len(np.unique(labels))} components")
assert abs(float(np.asarray(p)[:n].sum()) - 1.0) < 1e-3
