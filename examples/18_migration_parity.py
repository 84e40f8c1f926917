"""Drop-in migration from cuGraph: reference import paths, graph classes,
and the scale engines behind triangles/similarity.

Mirrors the reference's README quick-start plus the notebook idioms
(`from cugraph.community import louvain`, `cugraph.dask as dcg`), showing
they work here unchanged; then runs the degree-oriented triangle engine and
hub-bounded similarity on an RMAT-16 graph (the paths that keep hub-heavy
graphs cheap: max oriented degree, not max raw degree, bounds the work).

Run: python examples/18_migration_parity.py
"""

import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pandas as pd

# --- reference import paths, unchanged -----------------------------------
import cugraph_tpu as cugraph
from cugraph_tpu.centrality import betweenness_centrality  # noqa: F401
from cugraph_tpu.community import louvain
from cugraph_tpu.link_prediction import all_pairs_jaccard
from cugraph_tpu.structure import NumberMap, symmetrize  # noqa: F401
from cugraph_tpu.traversal import bfs

G = cugraph.datasets.karate.get_graph(ignore_weights=True)
parts, q = louvain(G)
print(f"louvain on karate: {parts['partition'].nunique()} communities, "
      f"modularity {q:.3f}")
print("bfs depth from 0:", int(bfs(G, 0)["distance"].replace(
    np.iinfo(np.int32).max, -1).max()))

# graph-class long tail
T = cugraph.Tree()
B = cugraph.BiPartiteGraph()
B.add_nodes_from([0, 1], bipartite=0)
B.add_nodes_from([2, 3], bipartite=1)
B.from_edgelist(np.array([0, 1]), np.array([2, 3]), None)
print("bipartite sets:", tuple(len(s) for s in B.sets()),
      "| density of karate:", round(G.density(), 4))

# --- scale engines: oriented triangles + hub-bounded similarity ----------
from cugraph_tpu.generators.rmat import _rmat_host

SCALE = 16
n = 1 << SCALE
src, dst = _rmat_host(SCALE, n * 16, 0.57, 0.19, 0.19, 7, False)
Gr = cugraph.Graph()
Gr.from_edgelist(src, dst, None)

t0 = time.time()
tc = cugraph.triangle_count(Gr)
t1 = time.time()
print(f"RMAT-{SCALE} triangle_count: {int(tc['counts'].sum()) // 3} "
      f"triangles in {t1 - t0:.1f}s (degree-oriented wedge engine)")

verts = Gr.nodes()
rng = np.random.default_rng(1)
pairs = pd.DataFrame({"first": rng.choice(verts, 2000),
                      "second": rng.choice(verts, 2000)})
t0 = time.time()
jac = cugraph.jaccard(Gr, pairs)
print(f"jaccard 2000 pairs (hub pairs -> min-degree probes): "
      f"{time.time() - t0:.1f}s, {int((jac['jaccard_coeff'] > 0).sum())} "
      f"nonzero")

top = all_pairs_jaccard(cugraph.datasets.karate.get_graph(
    ignore_weights=True), topk=3)
print("karate all-pairs top-3 jaccard:",
      [round(c, 3) for c in top["jaccard_coeff"]])
