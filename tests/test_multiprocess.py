"""Cross-process MG validation: 2 localhost jax.distributed processes.

The reference's MG tests run as MPI ranks with NCCL comms
(cpp/tests/utilities/mg_utilities.cpp:19-46, CUGRAPH_MG_TEST_PROGRAM_MAIN).
All other MG tests here simulate 8 devices inside ONE process, which never
exercises cross-process collectives — this test spawns 2 real processes
(4 virtual CPU devices each), forms one 4×2 global mesh spanning both, and
asserts mg_pagerank/mg_bfs match the networkx oracle end-to-end.  That is
the honest localhost analog of a multi-host DCN run (SURVEY.md §2.3
multi-node row).
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_ranks(nproc, mode, ndev=4, graph="default", timeout=280):
    port = _free_port()
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "_mp_worker.py")
    env = dict(os.environ)
    # the worker sets its own XLA device count; scrub the 8-device flag the
    # test session exports and any forced platform
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = ""
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), str(nproc), str(port), mode,
         str(ndev), graph],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for i in range(nproc)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out}"
        assert "MP_OK" in out, f"rank {i} missing MP_OK:\n{out}"
    # all ranks computed the same global checksum
    sums = {line.split()[1] for out in outs for line in out.splitlines()
            if line.startswith("MP_OK")}
    assert len(sums) == 1, sums


@pytest.mark.parametrize("mode", ["parallel", "plc"])
def test_two_process_mg_pagerank_bfs(mode):
    _run_ranks(2, mode)


def test_four_process_mg_pagerank_bfs_skew():
    """4 ranks × 2 devices on a 4×2 mesh, edges confined to the first third
    of the id range — several ranks own no edges of some block rows (the
    layout the reference's 4+ rank MPI runs exercise)."""
    _run_ranks(4, "parallel", ndev=2, graph="skew", timeout=420)
