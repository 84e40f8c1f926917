"""Structure tour: renumbering and symmetrization.

Mirrors reference notebooks algorithms/structure/{Renumber,Renumber-2,
Symmetrize}.ipynb: sparse/arbitrary external ids (IPv4-as-int), the
NumberMap round trip, renumber_arbitrary_edgelist, and directed→undirected
symmetrization semantics.

Run: PYTHONPATH=. python examples/28_renumber_symmetrize.py
"""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import cugraph_tpu as ctpu

# --- Renumber.ipynb: huge sparse external ids (IPv4 addresses as ints) ----
rng = np.random.default_rng(4)
ips = rng.choice(np.arange(2**32, dtype=np.int64), size=60, replace=False)
src_ext = rng.choice(ips, 400)
dst_ext = rng.choice(ips, 400)
keep = src_ext != dst_ext
src_ext, dst_ext = src_ext[keep], dst_ext[keep]

G = ctpu.Graph(directed=True)
G.from_edgelist(src_ext, dst_ext, None)   # renumbers internally by default
print(f"renumbered {len(ips)} sparse 32-bit ids -> "
      f"[0, {G.number_of_vertices()}) internal range")

# pagerank results come back in EXTERNAL ids
pr = ctpu.pagerank(G)
assert set(pr["vertex"]) <= set(ips.tolist())
print(f"pagerank top external id = {int(pr.loc[pr.pagerank.idxmax(), 'vertex'])}")

# the NumberMap round trip (Renumber-2.ipynb)
nm = G.number_map
internal = nm.to_internal(src_ext[:5])
back = nm.to_external(internal)
np.testing.assert_array_equal(back, src_ext[:5])
print("NumberMap round trip OK:", list(zip(src_ext[:3], internal[:3])))

# renumber_arbitrary_edgelist (the plc/cython utility)
s32, d32, idmap = ctpu.renumber_arbitrary_edgelist(src_ext, dst_ext)
assert s32.max() < len(ips) and len(idmap) <= len(ips)
np.testing.assert_array_equal(idmap[s32], src_ext)   # map round trip
print(f"renumber_arbitrary_edgelist: {len(idmap)} ids, "
      f"max internal = {int(max(s32.max(), d32.max()))}")

# --- Symmetrize.ipynb ------------------------------------------------------
s = np.array([0, 1, 2, 3])
d = np.array([1, 2, 3, 0])
sym_s, sym_d = ctpu.symmetrize(s, d)
pairs = set(zip(sym_s.tolist(), sym_d.tolist()))
assert all((b, a) in pairs for a, b in pairs)
print(f"symmetrize: {len(s)} directed edges -> {len(sym_s)} arcs "
      "(both directions present)")

# an undirected Graph symmetrizes on construction: degree counts both ways
Gu = ctpu.Graph(directed=False)
Gu.from_edgelist(s, d, None)
deg = Gu.degree()
assert (deg["degree"].to_numpy() == 2).all()
print("undirected 4-cycle: every vertex degree 2")
