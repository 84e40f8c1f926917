"""Release-style synthetic benchmark sweep (reference notebooks/
cugraph_benchmarks/synth_release_single_gpu.ipynb + release.ipynb analog):
one RMAT graph, every major algorithm family timed in sequence, one table.

Run:  python examples/33_release_benchmark_sweep.py
"""

import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import cugraph_tpu as ct

SCALE, EF = 11, 16
df = ct.generate_rmat_edgelist(scale=SCALE, num_edges=(1 << SCALE) * EF,
                               seed=3)
src, dst = df["src"].to_numpy(), df["dst"].to_numpy()
G = ct.Graph(directed=True)
G.from_edgelist(src, dst, None)
Gu = ct.Graph(directed=False)
Gu.from_edgelist(src, dst, None)
n, m = G.number_of_vertices(), G.number_of_edges()
print(f"RMAT-{SCALE}: {n} vertices, {m} directed edges\n")

root = int(np.unique(src)[0])
SWEEP = [
    ("pagerank", lambda: ct.pagerank(G)),
    ("bfs", lambda: ct.bfs(Gu, root)),
    ("sssp", lambda: ct.sssp(Gu, root)),
    ("wcc", lambda: ct.weakly_connected_components(G)),
    ("katz", lambda: ct.katz_centrality(G, alpha=0.005)),
    ("betweenness k=32", lambda: ct.betweenness_centrality(Gu, k=32, seed=0)),
    ("core_number", lambda: ct.core_number(Gu)),
    ("triangle_count", lambda: ct.triangle_count(Gu)),
    ("louvain", lambda: ct.louvain(Gu)),
    ("jaccard 1k pairs", lambda: ct.jaccard(
        Gu, ct.random_pairs(Gu, 1000, seed=0)
        if hasattr(ct, "random_pairs") else None)),
    ("uniform_neighbor_sample", lambda: ct.uniform_neighbor_sample(
        G, np.unique(src)[:256].tolist(), [10, 10], random_state=0)),
    ("random_walks", lambda: ct.random_walks(
        G, np.unique(src)[:128].tolist(), 8)),
]

rows = []
for name, fn in SWEEP:
    t0 = time.perf_counter()
    if name.startswith("jaccard") and not hasattr(ct, "random_pairs"):
        ct.jaccard(Gu)   # default pair source (two-hop neighbor pairs)
        rows.append((name, time.perf_counter() - t0, "ok"))
        continue
    fn()
    rows.append((name, time.perf_counter() - t0, "ok"))
print(f"{'algorithm':28s} {'seconds':>8s}")
for name, dt, st in rows:
    print(f"{name:28s} {dt:8.2f}  {st}")
assert all(st == "ok" for _, _, st in rows)
