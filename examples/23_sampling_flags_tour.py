"""GNN feed-path options tour: the reference's sampling_flags_t knobs and
post-processing compression matrix, end to end.

Mirrors the reference's sampling API docs (sampling_functions.hpp:36-76,
heterogeneous_biased_temporal_neighbor_sample.pyx:160-220) — every flag
demonstrated with a visible effect.

Run: python examples/23_sampling_flags_tour.py
"""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import cugraph_tpu as ctpu
from cugraph_tpu.plc import ResourceHandle, SGGraph
from cugraph_tpu.plc import algorithms as plc

# fan graph: 0 → {1..4} → 100 → 0 (a cycle back to the seed)
src = np.concatenate([np.zeros(4, np.int64), np.arange(1, 5), [100]])
dst = np.concatenate([np.arange(1, 5), np.full(4, 100), [0]])
G = ctpu.Graph(directed=True)
G.from_edgelist(src, dst, None, vertices=np.arange(101), renumber=False)

# 1. multiplicity (reference DEFAULT): a vertex reached 4 times samples 4x
df = ctpu.uniform_neighbor_sample(G, [0], [4, 4, 1], with_replacement=False,
                                  random_state=0)
print("default multiplicity: hop-2 rows =", len(df[df.hop_id == 2]))
assert len(df[df.hop_id == 2]) == 4

# 2. deduplicate_sources collapses it to set semantics
df = ctpu.uniform_neighbor_sample(G, [0], [4, 4, 1], with_replacement=False,
                                  random_state=0, deduplicate_sources=True)
print("deduplicate_sources:  hop-2 rows =", len(df[df.hop_id == 2]))
assert len(df[df.hop_id == 2]) == 1

# 3. prior_sources_behavior="exclude" cuts the cycle re-entry
df = ctpu.uniform_neighbor_sample(G, [0], [4, 4, 1, 4],
                                  with_replacement=False, random_state=0,
                                  prior_sources_behavior="exclude")
print("exclude: hop-3 rows =", len(df[df.hop_id == 3]), "(cycle cut)")
assert len(df[df.hop_id == 3]) == 0

# 4. temporal comparison modes over a timestamped star
tsrc = np.full(4, 5)
tdst = np.arange(4)
ttm = (tdst + 1).astype(np.float32)          # times 1..4
T = ctpu.Graph(directed=True)
T.from_edgelist(tsrc, tdst, None, edge_time=ttm, renumber=False)
for mode, seed_t in [("strictly_increasing", 2.0),
                     ("monotonically_decreasing", 3.0), ("last", 10.0)]:
    d = ctpu.homogeneous_uniform_temporal_neighbor_sample(
        T, [5], [2], seed_time=seed_t, random_state=0,
        temporal_sampling_comparison=mode)
    print(f"temporal {mode:>26} @t={seed_t}: dsts "
          f"{sorted(set(d['destinations']))}")
assert set(d["destinations"]) == {2, 3}      # 'last' = 2 most recent

# 5. the plc output options: renumber + compression matrix
g = SGGraph(ResourceHandle(), None, src, dst, None)
for compression in ("COO", "CSR", "CSC", "DCSR"):
    out = plc.homogeneous_uniform_neighbor_sample(
        None, g, [0], h_fan_out=[4, 2], random_state=0,
        renumber=True, compression=compression)
    shape = (len(out["majors"]) if out["majors"] is not None
             else len(out["major_offsets"]))
    print(f"compression={compression}: minors={len(out['minors'])} "
          f"renumber_map={len(out['renumber_map'])}")
    if compression != "CSC":
        # src-major modes renumber hop-0 SOURCES (the seeds) first; CSC is
        # dst-major, so hop-0 destinations lead instead (reference rule 1)
        assert out["renumber_map"][0] == 0

print("sampling flags tour OK")
