"""Distributed PageRank over a 2D device mesh (the reference's
cugraph.dask MG path, as one shard_map program).

Works on any device count — on a CPU host, simulate 8 devices:

  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/03_multichip_pagerank.py
"""

import jax
import numpy as np

import cugraph_tpu as ct
from cugraph_tpu.parallel import build_dist_graph, make_mesh_2d, mg_pagerank
from cugraph_tpu.parallel.mesh import mesh_shape_for

jax.config.update("jax_platforms", "cpu")  # demo: run on simulated devices

devs = jax.devices()
pmaj, pmin = mesh_shape_for(len(devs))
mesh = make_mesh_2d(pmaj, pmin, devs)
print(f"mesh: {pmaj}×{pmin} ({len(devs)} devices)")

scale, ef = 14, 16
df = ct.rmat(scale, (1 << scale) * ef, seed=1)
n = 1 << scale
g = build_dist_graph(df["src"].to_numpy(), df["dst"].to_numpy(), None, n,
                     pmaj, pmin, store_push=False)
print(f"RMAT-{scale}: {g.num_edges} edges over {pmaj * pmin} devices "
      f"({g.pull.e_local} slots/device)")

p, err, iters = mg_pagerank(g, mesh, tol=1e-6, max_iter=100)
p = np.asarray(p)[:n]
print(f"converged in {int(iters)} iterations, err={float(err):.2e}")
print("top-5 vertices:", np.argsort(-p)[:5].tolist())
