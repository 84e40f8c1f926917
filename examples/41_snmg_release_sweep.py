"""Single-node multi-device release sweep (reference notebooks/
cugraph_benchmarks/synth_release_single_node_multi_gpu.ipynb +
benchmarks_snmg.ipynb analog): the MG algorithm families timed on one
RMAT graph over the full 8-device mesh — the SNMG counterpart of
example 33's single-device sweep.

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
          python examples/41_snmg_release_sweep.py
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import cugraph_tpu as ct
from cugraph_tpu.parallel import (build_dist_graph, make_mesh_2d, mg_bfs,
                                  mg_core_number, mg_katz_centrality, mg_louvain,
                                  mg_pagerank, mg_sssp,
                                  mg_uniform_neighbor_sample, mg_wcc)

mesh = make_mesh_2d(4, 2, jax.devices()[:8])
SCALE, EF = 12, 16
el = ct.generate_rmat_edgelist(scale=SCALE, num_edges=(1 << SCALE) * EF,
                               seed=3)
src = el["src"].to_numpy().astype(np.int64)
dst = el["dst"].to_numpy().astype(np.int64)
keep = src != dst
src, dst = src[keep], dst[keep]
n = 1 << SCALE
g = build_dist_graph(src, dst, None, n, 4, 2, store_push=True)
gs = build_dist_graph(src, dst, None, n, 4, 2, store_push=True,
                      symmetrize=True)
print(f"RMAT-{SCALE} on the {mesh.devices.shape} mesh: {g.num_edges} edges")

root = int(src[0])
SWEEP = [
    ("mg_pagerank", lambda: mg_pagerank(g, mesh, tol=1e-6)),
    ("mg_bfs", lambda: mg_bfs(gs, mesh, root)),
    ("mg_sssp", lambda: mg_sssp(gs, mesh, root)),
    ("mg_wcc", lambda: mg_wcc(gs, mesh)),
    ("mg_katz", lambda: mg_katz_centrality(g, mesh, alpha=0.002)),
    ("mg_core_number", lambda: mg_core_number(gs, mesh)),
    ("mg_louvain", lambda: mg_louvain(gs, mesh)),
    ("mg_neighbor_sample", lambda: mg_uniform_neighbor_sample(
        g, mesh, np.unique(src)[:64].tolist(), [10, 10], seed=0,
        dedupe_sources=True)),
]
print(f"\n{'algorithm':22s} {'seconds':>8s}")
for name, fn in SWEEP:
    t0 = time.perf_counter()
    out = fn()
    jax.block_until_ready(out) if hasattr(out, "block_until_ready") else None
    print(f"{name:22s} {time.perf_counter() - t0:8.2f}")
print("\nSNMG sweep complete")
