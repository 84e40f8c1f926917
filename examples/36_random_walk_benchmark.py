"""Random-walk benchmark walkthrough (reference notebooks/
cugraph_benchmarks/random_walk_{benchmark,perf}.ipynb analog): uniform,
biased, and node2vec walks over an RMAT graph with steps/s throughput.

Run:  python examples/36_random_walk_benchmark.py
"""

import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import cugraph_tpu as ct

SCALE, EF = 11, 16
df = ct.generate_rmat_edgelist(scale=SCALE, num_edges=(1 << SCALE) * EF,
                               seed=5)
src, dst = df["src"].to_numpy(), df["dst"].to_numpy()
w = np.random.default_rng(0).random(len(src)).astype(np.float32)
G = ct.Graph(directed=True)
G.from_edgelist(src, dst, w)
print(f"RMAT-{SCALE}: {G.number_of_vertices()} vertices, "
      f"{G.number_of_edges()} edges")

starts = np.unique(src)[:512].tolist()
DEPTH = 16

for name, fn in [
    ("uniform", lambda: ct.random_walks(G, starts, DEPTH)),
    ("biased", lambda: ct.biased_random_walks(G, starts, DEPTH)),
    ("node2vec p=2 q=0.5", lambda: ct.node2vec(G, starts, DEPTH,
                                               p=2.0, q=0.5)),
]:
    fn()  # warm (compile + plan)
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    paths = out[0] if isinstance(out, tuple) else out
    arr = np.asarray(paths)
    steps = int((arr.reshape(len(starts), -1) >= 0).sum())
    print(f"{name:20s} {dt * 1e3:7.0f} ms  "
          f"{steps / dt / 1e3:8.1f} K steps/s")

# walk integrity: every consecutive pair is a real edge
paths = np.asarray(ct.random_walks(G, starts[:64], 8)[0]).reshape(64, -1)
keys = set((src.astype(np.int64) * (1 << SCALE) + dst).tolist())
for row in paths:
    for a, b in zip(row[:-1], row[1:]):
        if a >= 0 and b >= 0:
            assert int(a) * (1 << SCALE) + int(b) in keys
print("walk edges verified against the edge list")
