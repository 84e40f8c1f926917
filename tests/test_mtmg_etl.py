"""MTMG-analog, ETL renumbering, and memory-helper tests."""

import threading

import numpy as np
import pandas as pd
import jax

import cugraph_tpu as ct
from cugraph_tpu.etl import renumber_strings, renumber_multi_columns
from cugraph_tpu.mtmg import (
    GraphHandle,
    InstanceManager,
    PerThreadEdgelist,
    ResourceManager,
)
from cugraph_tpu.utils.memory import (
    HostStagingBuffer,
    device_memory_stats,
    estimate_graph_bytes,
    fits_on_device,
)


def test_mtmg_threaded_build_and_pagerank():
    """Mirror of the reference's mtmg threaded_test.cpp: threads append edge
    chunks via per-thread edgelists, then one distributed graph is built and
    an MG algorithm runs on it."""
    rm = ResourceManager()
    for r in range(8):
        rm.register_local_gpu(r, jax.devices()[r])
    im = rm.create_instance_manager()
    assert im.size() == 8

    rng = np.random.default_rng(0)
    n = 64
    chunks = [(rng.integers(0, n, 200), rng.integers(0, n, 200))
              for _ in range(4)]
    el = PerThreadEdgelist()

    def worker(c):
        h = im.get_handle()
        assert h.device is not None
        s, d = c
        el.append(s[:100], d[:100])
        el.append(s[100:], d[100:])
        el.flush()

    threads = [threading.Thread(target=worker, args=(c,)) for c in chunks]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    src, dst, w = el.consolidate()
    assert len(src) == 800

    g, mesh = GraphHandle(im).create_graph(el, num_vertices=n)
    from cugraph_tpu.parallel import mg_pagerank

    p, err, iters = mg_pagerank(g, mesh, tol=1e-7, max_iter=100)
    np.testing.assert_allclose(np.asarray(p)[:n].sum(), 1.0, atol=1e-3)


def test_etl_renumber_strings():
    df = pd.DataFrame({"a": ["x", "y", "x"], "b": ["y", "z", "z"]})
    out, mp = renumber_strings(df, "a", "b")
    assert out.dtypes["a"] == np.int32
    assert len(mp) == 3  # x, y, z
    # round-trip
    lut = dict(zip(mp["id"], mp["value"]))
    assert [lut[i] for i in out["a"]] == ["x", "y", "x"]
    assert [lut[i] for i in out["b"]] == ["y", "z", "z"]


def test_etl_renumber_multi_columns():
    df = pd.DataFrame({"a1": ["u", "u"], "a2": ["1", "2"],
                       "b1": ["u", "v"], "b2": ["2", "1"]})
    out, mp = renumber_multi_columns(df, ["a1", "a2"], ["b1", "b2"])
    assert len(mp) == 3  # composite keys: (u,1), (u,2), (v,1)
    assert out["src"].nunique() == 2


def test_memory_helpers():
    assert estimate_graph_bytes(1000, 10000) > 10000 * 12
    stats = device_memory_stats()
    assert "bytes_in_use" in stats
    assert fits_on_device(100, 1000) in (True, False)
    buf = HostStagingBuffer(np.ones(10, np.float32))
    d = buf.to_device()
    assert float(np.asarray(d).sum()) == 10.0
    buf.release()
    assert buf._device is None


def test_mtmg_concurrent_ingest_rmat14_scale():
    """Weak-spot test (round-4): 8 writer threads ingest RMAT-14 (262K edge
    tuples) CONCURRENTLY through PerThreadEdgelist — the one behavior MTMG
    exists for (mtmg/per_thread_edgelist.hpp) — interleaved with handle
    churn, then the graph builds and analytics must be IDENTICAL to a
    single-threaded ingest of the same edges (thread interleaving must not
    leak into results)."""
    import threading

    import jax
    import numpy as np

    from cugraph_tpu.generators.rmat import _rmat_host
    from cugraph_tpu.mtmg import (GraphHandle, InstanceManager,
                                  PerThreadEdgelist, ResourceManager)
    from cugraph_tpu.parallel import mg_pagerank

    scale, m = 14, (1 << 14) * 16
    src, dst = _rmat_host(scale, m, 0.57, 0.19, 0.19, 7, False)

    rm = ResourceManager()
    for r in range(8):
        rm.register_local_gpu(r, jax.devices()[r])
    im = rm.create_instance_manager()

    el = PerThreadEdgelist(chunk_size=1 << 14)
    nthreads = 8
    parts = np.array_split(np.arange(m), nthreads)
    barrier = threading.Barrier(nthreads)
    errs = []

    def writer(t):
        try:
            h = im.get_handle()          # handle churn alongside appends
            barrier.wait()               # maximize interleaving
            idx = parts[t]
            # many small appends (the reference's streaming-ingest shape)
            for lo in range(0, len(idx), 4096):
                sel = idx[lo:lo + 4096]
                el.append(src[sel], dst[sel])
                el.flush()
            h.sync()
        except Exception as e:           # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(t,))
               for t in range(nthreads)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs, errs

    cs, cd, cw = el.consolidate()
    assert len(cs) == m and cw is None
    # every edge arrived exactly once (multiset equality, order-free)
    key = lambda a, b: np.sort(a.astype(np.int64) * (1 << 32) + b)
    np.testing.assert_array_equal(key(cs, cd), key(src, dst))

    gh = GraphHandle(im)
    g, mesh = gh.create_graph(el, num_vertices=1 << scale)
    p, err, iters = mg_pagerank(g, mesh, tol=1e-7, max_iter=100)

    # single-threaded oracle over the same edges
    el1 = PerThreadEdgelist()
    el1.append(src, dst)
    g1, mesh1 = GraphHandle(im).create_graph(el1, num_vertices=1 << scale)
    p1, _, _ = mg_pagerank(g1, mesh1, tol=1e-7, max_iter=100)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p1), atol=1e-7)


def test_etl_string_renumber_scale_through_build():
    """Round-4 weak-spot closure (ETL half): string-key renumbering at
    RMAT-14 edge scale (262K rows, ~16K unique keys) feeding an actual
    graph build + pagerank — the ingest pipeline the ETL library exists
    for, not just a toy frame (renumbering.cu role)."""
    import numpy as np
    import pandas as pd

    import cugraph_tpu as ct
    from cugraph_tpu.etl import renumber_strings
    from cugraph_tpu.generators.rmat import _rmat_host

    scale, m = 14, (1 << 14) * 16
    src, dst = _rmat_host(scale, m, 0.57, 0.19, 0.19, 7, False)
    df = pd.DataFrame({
        "s": np.char.add("ip-10-0-", src.astype(str)),
        "d": np.char.add("ip-10-0-", dst.astype(str)),
    })
    renum, mapping = renumber_strings(df, "s", "d")
    n = len(mapping)
    assert n == len(np.unique(np.concatenate([src, dst])))
    # round trip: every renumbered edge decodes to its original strings
    vals = mapping["value"].to_numpy()
    sel = np.random.default_rng(0).integers(0, m, 2000)
    np.testing.assert_array_equal(vals[renum["s"].to_numpy()[sel]],
                                  df["s"].to_numpy()[sel])
    # the renumbered ids drive a real build + analytics
    G = ct.Graph(directed=True)
    G.from_edgelist(renum["s"].to_numpy(), renum["d"].to_numpy(), None,
                    renumber=False, vertices=np.arange(n))
    pr = ct.pagerank(G, max_iter=40, fail_on_nonconvergence=False)
    out = pr[0] if isinstance(pr, tuple) else pr
    assert abs(float(out["pagerank"].sum()) - 1.0) < 1e-3
