"""Large synthetic graph generation: RMAT at scale, id scrambling, and
multi-edgelist batches.

Mirrors reference notebook applications/gen_550M.ipynb (generate a 550M-edge
RMAT graph in chunks) and the generators surface
(cpp/src/generators/generate_rmat_edgelist.cu).  Scaled down so the script
runs on CPU in seconds; crank ``SCALE`` up on a real TPU host — generation is
host-side NumPy + native C++ construction, so memory, not compute, is the
limit (a scale-25/ef-16 list is 2×536M×8 B ≈ 8.6 GB host RAM).

Run: python examples/16_large_graph_generation.py
"""

import jax

jax.config.update("jax_platforms", "cpu")

import time

import numpy as np

import cugraph_tpu as ctpu

SCALE = 16          # 65,536 vertices
EDGE_FACTOR = 16    # ~1M edges

# --- one call generates an edge-list DataFrame with the reference's default
# skew (a,b,c = 0.57, 0.19, 0.19) and optional id scrambling
t0 = time.time()
df_edges = ctpu.generate_rmat_edgelist(
    scale=SCALE, num_edges=(1 << SCALE) * EDGE_FACTOR, seed=42,
    scramble_vertex_ids=True)
src = df_edges["src"].to_numpy()
dst = df_edges["dst"].to_numpy()
gen_s = time.time() - t0
print(f"generated {len(src):,} edges in {gen_s:.1f}s "
      f"({len(src)/gen_s/1e6:.0f} M edges/s)")

# --- the generator emits a power-law degree distribution: check the skew
deg = np.bincount(src, minlength=1 << SCALE)
print(f"max out-degree {deg.max():,}, median {int(np.median(deg))}, "
      f"isolated {np.mean(deg == 0):.0%}")
assert deg.max() > 50 * max(1, np.median(deg))  # heavy tail

# --- batched edge lists (the reference's generate_rmat_edgelists for
# multi-graph experiments)
lists = ctpu.generate_rmat_edgelists(
    n_edgelists=3, min_scale=10, max_scale=12, edge_factor=8, seed=7)
for i, dfi in enumerate(lists):
    print(f"  edgelist {i}: {len(dfi):,} edges")
assert len(lists) == 3

# --- build the Graph; construction runs native C++ counting sorts
# (core/_native/builder.cpp) with a NumPy fallback
t0 = time.time()
G = ctpu.Graph(directed=True)
G.from_edgelist(src, dst, None, renumber=True)
G.structure  # force CSR build
print(f"built CSR in {time.time()-t0:.1f}s: "
      f"{G.number_of_vertices():,} vertices, {G.number_of_edges():,} edges")

# --- the whole pipeline feeds any algorithm unchanged
df, converged = ctpu.pagerank(G, max_iter=20, fail_on_nonconvergence=False)
top = df.nlargest(5, "pagerank")
print("top-5 pagerank mass:", float(top["pagerank"].sum()))
assert abs(df["pagerank"].sum() - 1.0) < 1e-3
print("ok")
