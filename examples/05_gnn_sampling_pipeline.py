"""Neighbor-sampling GNN feed pipeline: sample → renumber → compress
(the reference's GNN feed path, SURVEY.md §3.5, end to end).

Run:  python examples/05_gnn_sampling_pipeline.py
"""

import jax

jax.config.update("jax_platforms", "cpu")


import numpy as np

import cugraph_tpu as ct

G = ct.datasets.karate.get_graph()

# 2-hop fanout [5, 3] from two seed batches
df = ct.uniform_neighbor_sample(G, [0, 33], [5, 3], random_state=7)
print("sampled frame:")
print(df.head(8).to_string(index=False))

batches = ct.sampling_results_to_batches(df)
for b, pack in batches.items():
    print(f"\nbatch {b}: {len(pack['map'])} local vertices, "
          f"{len(pack['hops'])} hops")
    for h, hop in enumerate(pack["hops"]):
        print(f"  hop {h}: {len(hop['indices'])} edges, "
              f"offsets[-1]={hop['offsets'][-1]}")
