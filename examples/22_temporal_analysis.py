"""Temporal graph application: time-respecting reachability and temporal
neighbor sampling over an interaction log (who-contacted-whom-when).

Mirrors the reference's temporal sampling variants
(homogeneous_uniform_temporal_neighbor_sample.pyx,
temporal_sampling_impl.cuh): an edge is traversable only AFTER the walker
arrived at its source, so information flows respect timestamps.

Run: python examples/22_temporal_analysis.py
"""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import cugraph_tpu as ctpu

# interaction log: a chain 0→1→2→3 with INCREASING times (traversable) and
# a "shortcut" 0→3 whose time is before 3's upstream contacts arrive
src = np.array([0, 1, 2, 0, 3, 3])
dst = np.array([1, 2, 3, 3, 4, 5])
times = np.array([1.0, 2.0, 3.0, 0.5, 4.0, 2.5], np.float32)
G = ctpu.Graph(directed=True)
G.from_edgelist(src, dst, None, edge_time=times, renumber=False)

# strictly-increasing temporal sampling from patient zero (seed_time=0):
# fanout -1 = take every eligible edge per hop
df = ctpu.homogeneous_uniform_temporal_neighbor_sample(
    G, [0], [-1, -1, -1, -1], seed_time=0.0, strict=True, random_state=0)
reached = set(df["destinations"]) | {0}
print("time-respecting reach from 0:", sorted(reached))
# 3→5 (time 2.5) is NOT traversable after arriving at 3 via 0→3 at t=0.5?
# it IS (2.5 > 0.5) — but 3→5 after arriving via 1→2→3 at t=3.0 is not;
# the sampler takes the EARLIEST arrival, so 5 is reachable here
assert {1, 2, 3, 4, 5} <= reached

# make the shortcut late instead: now 3 is first reached at t=3.0, so the
# t=2.5 edge 3→5 becomes untraversable
times2 = times.copy()
times2[3] = 5.0                       # 0→3 now happens at t=5
G2 = ctpu.Graph(directed=True)
G2.from_edgelist(src, dst, None, edge_time=times2, renumber=False)
df2 = ctpu.homogeneous_uniform_temporal_neighbor_sample(
    G2, [0], [-1, -1, -1, -1], seed_time=0.0, strict=True, random_state=0)
reached2 = set(df2["destinations"]) | {0}
print("reach with late shortcut:", sorted(reached2))
assert 5 not in reached2, "t=2.5 edge must be blocked by t=3.0 arrival"
assert 4 in reached2                   # 3→4 at t=4.0 still works

# larger random log: temporal reach is always a subset of static reach
rng = np.random.default_rng(5)
n, m = 200, 1500
rs = rng.integers(0, n, m)
rd = rng.integers(0, n, m)
keep = rs != rd
rs, rd = rs[keep], rd[keep]
rt = rng.uniform(0, 10, len(rs)).astype(np.float32)
H = ctpu.Graph(directed=True)
H.from_edgelist(rs, rd, None, edge_time=rt, renumber=False)
tdf = ctpu.homogeneous_uniform_temporal_neighbor_sample(
    H, [0], [-1] * 6, seed_time=0.0, strict=True, random_state=1,
    dedupe_sources=True)
t_reach = set(tdf["destinations"]) | {0}
bfs = ctpu.bfs(H, 0)
s_reach = set(bfs[bfs["distance"] < 2**31 - 1]["vertex"])
print(f"temporal reach {len(t_reach)} ⊆ static reach {len(s_reach)}")
assert t_reach <= s_reach
print("temporal analysis OK")
