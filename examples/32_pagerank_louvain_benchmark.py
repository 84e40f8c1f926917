"""PageRank / Louvain benchmark walkthrough (reference notebooks/
cugraph_benchmarks/{pagerank,louvain}_benchmark.ipynb analog): RMAT graph,
warm-vs-cold timing, convergence sweep, modularity report.

Run:  python examples/32_pagerank_louvain_benchmark.py
"""

import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import cugraph_tpu as ct

SCALE, EF = 12, 16
df = ct.generate_rmat_edgelist(scale=SCALE, num_edges=(1 << SCALE) * EF,
                               seed=1)
G = ct.Graph(directed=True)
G.from_edgelist(df["src"].to_numpy(), df["dst"].to_numpy(), None)
m = G.number_of_edges()
print(f"RMAT-{SCALE}: {G.number_of_vertices()} vertices, {m} edges")

# cold call includes plan build + compile; warm is the steady state
t0 = time.perf_counter()
pr = ct.pagerank(G, tol=1e-6)
cold = time.perf_counter() - t0
t0 = time.perf_counter()
pr = ct.pagerank(G, tol=1e-6)
warm = time.perf_counter() - t0
print(f"pagerank: cold {cold:.2f}s, warm {warm:.2f}s "
      f"({m / warm / 1e6:.1f} M edges/s incl. host assembly)")
print("top-5:", pr.nlargest(5, "pagerank")["vertex"].tolist())

for tol in (1e-4, 1e-6, 1e-8):
    t0 = time.perf_counter()
    ct.pagerank(G, tol=tol)
    print(f"  tol={tol:g}: {time.perf_counter() - t0:.2f}s")

Gu = ct.Graph(directed=False)
Gu.from_edgelist(df["src"].to_numpy(), df["dst"].to_numpy(), None)
t0 = time.perf_counter()
parts, mod = ct.louvain(Gu)
print(f"louvain: {time.perf_counter() - t0:.2f}s, "
      f"{parts['partition'].nunique()} communities, modularity {mod:.4f}")
t0 = time.perf_counter()
parts2, mod2 = ct.leiden(Gu)
print(f"leiden:  {time.perf_counter() - t0:.2f}s, "
      f"{parts2['partition'].nunique()} communities, modularity {mod2:.4f}")
# RMAT graphs are expander-like: modularity is low but must be positive
assert mod > 0 and mod2 > 0
