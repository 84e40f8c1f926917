"""Property-graph pipeline: multi-type vertices/edges end to end.

The reference's property-graph notebooks model typed data (users/products,
rates/buys) over cugraph: build a typed edge list with ids/types/times,
sample heterogeneously per type, and post-process with the per-vertex-type
segmented renumberer (heterogeneous_renumber_and_sort_sampled_edgelist,
sampling_functions.hpp:1214) into GNN-ready tensors.

Run: PYTHONPATH=. python examples/29_property_graph_multitype.py
"""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import cugraph_tpu as ctpu
from cugraph_tpu import plc

rng = np.random.default_rng(11)

# --- typed universe: vertex ids [0, 40) = USERS, [40, 100) = PRODUCTS -----
N_USER, N_PROD = 40, 60
vertex_type_offsets = np.array([0, N_USER, N_USER + N_PROD])

# edge type 0 = user->product "buys"; edge type 1 = user->user "follows"
u_buy = rng.integers(0, N_USER, 300)
p_buy = rng.integers(N_USER, N_USER + N_PROD, 300)
u_fol = rng.integers(0, N_USER, 150)
v_fol = rng.integers(0, N_USER, 150)
keep = u_fol != v_fol
src = np.concatenate([u_buy, u_fol[keep]])
dst = np.concatenate([p_buy, v_fol[keep]])
etype = np.concatenate([np.zeros(300, np.int32),
                        np.ones(keep.sum(), np.int32)])
eid = np.arange(len(src), dtype=np.int64)
etime = rng.uniform(0, 100, len(src)).astype(np.float32)

h = plc.ResourceHandle()
G = plc.SGGraph(h, plc.GraphProperties(), src, dst, None,
                renumber=False, vertices_array=np.arange(100),
                edge_id_array=eid, edge_type_array=etype,
                edge_start_time_array=etime)
print(f"typed graph: {len(src)} edges, 2 vertex types, 2 edge types")

# --- heterogeneous sampling: fanout per (hop, edge type) ------------------
seeds = np.array([0, 1, 2, 3])
out = plc.heterogeneous_uniform_neighbor_sample(
    h, G, seeds, None, vertex_type_offsets,
    np.array([3, 2, 2, 2], np.int32),     # hop0: 3 buys + 2 follows, hop1: 2+2
    num_edge_types=2, renumber=True, return_hops=True, random_state=5,
    retain_seeds=True, batch_id_list=np.zeros(len(seeds), np.int64))
print("sampled + heterogeneous-renumbered:")
print("  edges:", len(out["majors"]))
lth = out["label_type_hop_offsets"]
print("  label_type_hop_offsets:", lth.tolist())

# renumber map is segmented per (label, vertex type): decode and check that
# user segments hold only user ids, product segments only product ids
rmo = out["renumber_map_offsets"]
users = out["renumber_map"][rmo[0]:rmo[1]]
prods = out["renumber_map"][rmo[1]:rmo[2]]
assert (users < N_USER).all() and (prods >= N_USER).all()
print(f"  renumber map: {len(users)} users + {len(prods)} products "
      "(type-segmented)")

# edge-id lookup: recover endpoints for audited edge ids by type
table = plc.edge_id_lookup_table(h, G)
q = table.lookup_vertex_ids(np.array([0, 1, 2]), edge_type=0)
np.testing.assert_array_equal(q["src"].to_numpy(), src[:3])
np.testing.assert_array_equal(q["dst"].to_numpy(), dst[:3])
print("edge-id lookup round-trips typed ids")

# --- per-type analytics on the SG engine -----------------------------------
g_buy = ctpu.Graph(directed=True)
g_buy.from_edgelist(src[etype == 0], dst[etype == 0], None)
pr = ctpu.pagerank(g_buy)
top_prod = pr[pr.vertex >= N_USER].sort_values(
    "pagerank", ascending=False)["vertex"].iloc[0]
print(f"most-bought product by PageRank: {int(top_prod)}")
