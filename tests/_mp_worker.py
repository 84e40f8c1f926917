"""Worker for the multi-process MG validation test (run via subprocess).

The reference genuinely runs its MG tests as MPI ranks + NCCL comms
(cpp/tests/utilities/mg_utilities.cpp:19-46); single-process 8-virtual-device
simulation cannot exercise cross-process collectives.  This worker is one
rank of a ``jax.distributed`` CPU cluster: N processes × 4 virtual CPU
devices each form one global mesh, the DistGraph is laid out across BOTH
processes, and mg_pagerank's all_gather / psum_scatter / psum actually cross
the process boundary.

Usage: python tests/_mp_worker.py <process_id> <num_processes> <port> [mode]
                                  [devices_per_proc] [graph]
mode "parallel" (default) drives cugraph_tpu.parallel directly;
mode "plc" bootstraps through plc.comms.cugraph_comms_init (the reference's
Dask-free DDP-style launch, cugraph_nccl_comms.py:69-182) and runs
plc.MGGraph + plc.pagerank.
graph "skew" restricts edges to vertices < n//3, so on a 4×2 partition
several ranks own NO edges of some block rows (the empty-partition corner
the reference's 4+ rank MPI runs hit, mg_utilities.cpp:19-46).
Prints "MP_OK <checksum>" on success.
"""

import os
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "parallel"
    ndev = int(sys.argv[5]) if len(sys.argv) > 5 else 4
    graph = sys.argv[6] if len(sys.argv) > 6 else "default"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={ndev}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    if mode == "plc":
        return main_plc(pid, nproc, port, ndev)
    jax.distributed.initialize(f"localhost:{port}", num_processes=nproc,
                               process_id=pid,
                               initialization_timeout=60)
    assert jax.device_count() == ndev * nproc, jax.devices()
    assert len(jax.local_devices()) == ndev

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from cugraph_tpu.parallel import build_dist_graph, make_mesh_2d, \
        mg_pagerank, mg_bfs
    from cugraph_tpu.parallel.mesh import shard_dist_graph

    # identical edge list on every process (host-replicated input; the
    # device arrays are globally sharded by shard_dist_graph)
    rng = np.random.default_rng(0)
    n, m = 240, 2000
    if graph == "skew":
        # every edge inside the first third of the id range: on a 4×2
        # partition most block rows/cols hold ZERO edges — exercises ranks
        # that own no edges of some block
        src = rng.integers(0, n // 3, m)
        dst = rng.integers(0, n // 3, m)
    else:
        src = rng.integers(0, n, m)
        dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    key = np.unique(src * n + dst)
    src, dst = (key // n).astype(np.int64), (key % n).astype(np.int64)
    w = rng.uniform(0.5, 2.0, len(src)).astype(np.float32)

    from cugraph_tpu.parallel import mesh_shape_for

    pmaj, pmin = mesh_shape_for(ndev * nproc)
    g = build_dist_graph(src, dst, w, n, pmaj, pmin, store_push=True)
    mesh = make_mesh_2d(pmaj, pmin, jax.devices())
    g = shard_dist_graph(g, mesh)

    p, err, iters = mg_pagerank(g, mesh, tol=1e-8, max_iter=200)
    d, pred = mg_bfs(g, mesh, int(src[0]))

    from jax.experimental import multihost_utils

    p_full = np.asarray(multihost_utils.process_allgather(p, tiled=True))[:n]
    d_full = np.asarray(multihost_utils.process_allgather(d, tiled=True))[:n]

    # serial oracle (networkx) on every rank
    import networkx as nx

    Gx = nx.DiGraph()
    Gx.add_nodes_from(range(n))
    Gx.add_weighted_edges_from(zip(src.tolist(), dst.tolist(), w.tolist()))
    ref = nx.pagerank(Gx, alpha=0.85, tol=1e-10, weight="weight")
    np.testing.assert_allclose(p_full, [ref[v] for v in range(n)], atol=1e-6)
    refd = nx.single_source_shortest_path_length(Gx, int(src[0]))
    INT_INF = np.iinfo(np.int32).max
    expect_d = np.array([refd.get(v, INT_INF) for v in range(n)])
    got_d = np.where(d_full >= INT_INF, INT_INF, d_full)
    np.testing.assert_array_equal(got_d, expect_d)

    print(f"MP_OK {float(np.sum(p_full)):.6f}", flush=True)
    jax.distributed.shutdown()


def main_plc(pid, nproc, port, ndev=4):
    """Rank body for the plc.comms bootstrap path: cugraph_comms_init →
    init_subcomms 2D grid → plc.MGGraph → plc.pagerank, networkx-checked."""
    import jax
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from cugraph_tpu import plc
    from cugraph_tpu.plc.comms import (cugraph_comms_init,
                                       cugraph_comms_get_raft_handle,
                                       cugraph_comms_shutdown)

    handle = cugraph_comms_init(pid, nproc, f"localhost:{port}",
                                initialization_timeout=60)
    assert cugraph_comms_get_raft_handle() is handle
    assert jax.device_count() == ndev * nproc, jax.devices()
    assert handle.mesh.devices.size == ndev * nproc

    rng = np.random.default_rng(7)
    n, m = 200, 1500
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    key = np.unique(src[keep] * n + dst[keep])
    src, dst = (key // n).astype(np.int64), (key % n).astype(np.int64)

    G = plc.MGGraph(handle, plc.GraphProperties(),
                    src_array=src, dst_array=dst, store_transposed=True)
    verts, pr = plc.pagerank(handle, G, None, None, None, None,
                             0.85, 1e-8, 200, False)
    full = np.zeros(n)
    full[np.asarray(verts)[:n]] = np.asarray(pr)[:n]

    import networkx as nx

    Gx = nx.DiGraph()
    Gx.add_nodes_from(range(n))
    Gx.add_edges_from(zip(src.tolist(), dst.tolist()))
    ref = nx.pagerank(Gx, alpha=0.85, tol=1e-10)
    np.testing.assert_allclose(full, [ref[v] for v in range(n)], atol=1e-6)

    print(f"MP_OK {float(np.sum(full)):.6f}", flush=True)
    cugraph_comms_shutdown()


if __name__ == "__main__":
    main()
