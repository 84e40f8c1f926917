"""One-hot SpMV kernel: interpret-mode correctness vs a NumPy oracle.

On-TPU speed is covered by bench.py; here the Pallas kernel runs in
interpreter mode on CPU so the tiling/plan logic is exercised everywhere.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import cugraph_tpu as ctpu
from cugraph_tpu.kernels.spmv_onehot import build_spmv_plan, spmv_onehot


@pytest.mark.parametrize("n,m,yb_rows", [
    (300, 2000, 8192),       # single y block
    (40_000, 120_000, 128),  # multiple y blocks + multiple x windows
    (7, 5, 8192),            # tiny
    (1, 0, 8192),            # empty
])
def test_spmv_onehot_matches_numpy(n, m, yb_rows):
    rng = np.random.default_rng(n + m)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = rng.random(m).astype(np.float32)
    plan = build_spmv_plan(src, dst, w, n, yb_rows=yb_rows)
    x = rng.random(plan.pad_v).astype(np.float32)

    y = np.asarray(spmv_onehot(plan, jnp.asarray(x), interpret=True))
    expect = np.zeros(plan.pad_v, np.float64)
    np.add.at(expect, dst, w.astype(np.float64) * x[src])
    np.testing.assert_allclose(y, expect, rtol=1e-4, atol=1e-4)


def test_spmv_plan_padding_overhead_is_bounded():
    rng = np.random.default_rng(0)
    n, m = 1 << 14, 1 << 18
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    plan = build_spmv_plan(src, dst, None, n)
    # tiles ≥ ideal, but padding should stay modest on a uniform graph
    ideal = m // 1024
    assert plan.num_tiles <= ideal * 1.5 + 16


def test_spmv_self_loops_and_multi_edges():
    src = np.array([0, 0, 0, 2, 2, 1])
    dst = np.array([1, 1, 0, 2, 2, 1])
    w = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0], np.float32)
    plan = build_spmv_plan(src, dst, w, 3)
    x = np.zeros(plan.pad_v, np.float32)
    x[:3] = [10.0, 20.0, 30.0]
    y = np.asarray(spmv_onehot(plan, jnp.asarray(x), interpret=True))
    assert y[0] == pytest.approx(3 * 10)           # 0→0 w3
    assert y[1] == pytest.approx(1 * 10 + 2 * 10 + 6 * 20)
    assert y[2] == pytest.approx((4 + 5) * 30)


def test_spmv_empty_y_block_is_zeroed():
    # vertices span 2 y blocks (yb_rows=128 → 16384 vertices/block) but ALL
    # edges land in block 0: block 1 must come back zero, not garbage
    n = 40_000
    rng = np.random.default_rng(0)
    src = rng.integers(0, n, 5000)
    dst = rng.integers(0, 10_000, 5000)  # only low ids are destinations
    plan = build_spmv_plan(src, dst, None, n, yb_rows=128)
    assert plan.n_yblocks >= 2
    # the plan must give EVERY y block at least one tile — on real hardware
    # an unvisited output block would return uninitialized memory (the
    # interpreter zero-fills, so this structural check is the load-bearing one)
    assert set(np.asarray(plan.yblk).tolist()) == set(range(plan.n_yblocks))
    x = rng.random(plan.pad_v).astype(np.float32)
    y = np.asarray(spmv_onehot(plan, jnp.asarray(x), interpret=True))
    expect = np.zeros(plan.pad_v, np.float64)
    np.add.at(expect, dst, x[src].astype(np.float64))
    np.testing.assert_allclose(y, expect, rtol=1e-4, atol=1e-4)
    assert np.all(y[16384:] == 0)  # blocks past the edge range stay zero


@pytest.mark.parametrize("reduce,combine", [
    ("min", "add"),    # SSSP relaxation
    ("min", "left"),   # WCC label propagation
    ("max", "left"),   # BFS parent select
    ("max", "mul"),
    ("sum", "add"),
    ("sum", "left"),
])
@pytest.mark.parametrize("n,m", [(300, 2000), (40_000, 120_000), (9, 4)])
def test_spmv_semirings_match_numpy(reduce, combine, n, m):
    from cugraph_tpu.kernels.spmv_onehot import SEMIRING_BIG

    rng = np.random.default_rng(n + m + len(reduce))
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = rng.random(m).astype(np.float32)
    plan = build_spmv_plan(src, dst, w, n,
                           yb_rows=128 if n > 20_000 else 8192)
    x = (rng.random(plan.pad_v) * 10).astype(np.float32)

    y = np.asarray(spmv_onehot(plan, jnp.asarray(x), interpret=True,
                               reduce=reduce, combine=combine))
    v = {"mul": x[src] * w, "add": x[src] + w, "left": x[src]}[combine]
    ident = {"sum": 0.0, "min": SEMIRING_BIG, "max": -SEMIRING_BIG}[reduce]
    expect = np.full(plan.pad_v, ident, np.float64)
    op = {"sum": np.add, "min": np.minimum, "max": np.maximum}[reduce]
    op.at(expect, dst, v.astype(np.float64))
    np.testing.assert_allclose(y, expect, rtol=1e-4, atol=1e-4)


def test_spmv_min_add_with_big_distances():
    """Unreached sources carry SEMIRING_BIG; they must never win the min."""
    from cugraph_tpu.kernels.spmv_onehot import SEMIRING_BIG

    src = np.array([0, 1, 2, 2])
    dst = np.array([3, 3, 3, 4])
    w = np.array([1.0, 2.0, 5.0, 1.5], np.float32)
    plan = build_spmv_plan(src, dst, w, 5)
    x = np.full(plan.pad_v, SEMIRING_BIG, np.float32)
    x[0] = 4.0  # only vertex 0 reached
    y = np.asarray(spmv_onehot(plan, jnp.asarray(x), interpret=True,
                               reduce="min", combine="add"))
    assert y[3] == pytest.approx(5.0)          # 4.0 + 1.0 via src 0
    assert y[4] >= SEMIRING_BIG / 2            # only unreached src 2
    assert y[0] >= SEMIRING_BIG / 2            # untouched dst


# ---------------------------------------------------------------------------
# Pallas algorithm fast paths (interpret mode) vs the XLA slow paths
# ---------------------------------------------------------------------------

def _rand_graph(n, m, seed, weighted=False):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.uniform(0.1, 2.0, len(src)).astype(np.float32) if weighted else None
    return src, dst, w


def test_bfs_pallas_matches_xla():
    import cugraph_tpu
    from cugraph_tpu.algos.traversal import _bfs_kernel_diropt

    src, dst, _ = _rand_graph(120, 500, 1)
    G = cugraph_tpu.Graph(directed=True)
    G.from_edgelist(src, dst, None)
    slow = cugraph_tpu.bfs(G, int(src[0])).sort_values("vertex")

    s = int(G.lookup_internal_vertex_id(np.array([src[0]]))[0])
    n = G.number_of_vertices()
    plan = build_spmv_plan(*G.edgelist_arrays()[:2], None, n)
    dist, pred = _bfs_kernel_diropt(G.structure, plan, jnp.int32(s), n, n,
                                    True, interpret=True)
    dist, pred = np.asarray(dist)[:n], np.asarray(pred)[:n]

    order = np.argsort(G.number_map.to_external(np.arange(n)))
    np.testing.assert_array_equal(np.sort(G.number_map.to_external(
        np.arange(n))), slow["vertex"].to_numpy())
    np.testing.assert_array_equal(dist[order], slow["distance"].to_numpy())
    # predecessors: any valid parent is acceptable — check distance property
    reach = dist < np.iinfo(np.int32).max
    has_p = reach & (pred >= 0)
    assert np.array_equal(dist[pred[has_p]] + 1, dist[has_p])


def test_sssp_pallas_matches_xla():
    import cugraph_tpu
    from cugraph_tpu.algos.traversal import _sssp_kernel_nearfar, \
        _sssp_pred_host, _sssp_delta, F32_INF
    from cugraph_tpu.kernels.spmv_onehot import SEMIRING_BIG

    src, dst, w = _rand_graph(100, 420, 2, weighted=True)
    G = cugraph_tpu.Graph(directed=True)
    G.from_edgelist(src, dst, w)
    slow = cugraph_tpu.sssp(G, int(src[0])).sort_values("vertex")

    s = int(G.lookup_internal_vertex_id(np.array([src[0]]))[0])
    n = G.number_of_vertices()
    isrc, idst, iw = G.edgelist_arrays()
    plan = build_spmv_plan(isrc, idst, iw, n)
    dist = np.asarray(_sssp_kernel_nearfar(
        G.structure, plan, jnp.int32(s), jnp.float32(_sssp_delta(G)), n,
        True, interpret=True))
    dist = np.where(dist >= SEMIRING_BIG / 2, F32_INF, dist).astype(np.float32)
    pred = _sssp_pred_host(G, dist, s, n)

    order = np.argsort(G.number_map.to_external(np.arange(n)))
    np.testing.assert_allclose(dist[:n][order], slow["distance"].to_numpy(),
                               rtol=1e-5, atol=1e-6)
    # predecessor validity: dist[pred] + w(pred->v) == dist[v]
    reach = (dist[:n] < F32_INF / 2) & (np.arange(n) != s)
    assert (pred[reach] >= 0).all()


def test_wcc_pallas_matches_xla():
    import cugraph_tpu
    from cugraph_tpu.algos.components import _wcc_kernel_pallas

    src, dst, _ = _rand_graph(150, 200, 3)  # sparse → several components
    G = cugraph_tpu.Graph(directed=True)
    G.from_edgelist(src, dst, None)
    slow = cugraph_tpu.weakly_connected_components(G).sort_values("vertex")

    n = G.number_of_vertices()
    isrc, idst, _ = G.edgelist_arrays()
    s2, d2 = np.concatenate([isrc, idst]), np.concatenate([idst, isrc])
    plan = build_spmv_plan(s2, d2, None, n)
    label = np.asarray(_wcc_kernel_pallas(plan, jnp.int32(n),
                                          interpret=True))[:n]
    order = np.argsort(G.number_map.to_external(np.arange(n)))
    np.testing.assert_array_equal(
        G.number_map.to_external(label)[order], slow["labels"].to_numpy())


def test_split3_id_selection_exact():
    """Vertex-id payloads through the selection matmuls: the 2-limb split is
    only ~16-bit exact (ids at 2^20 came back off by ±4 — the bug that
    silently corrupted BFS predecessors / WCC labels past 2^16 vertices);
    split3 must be bit-exact."""
    n = 1 << 20
    rng = np.random.default_rng(0)
    src = rng.integers(1 << 16, n, 200)
    dst = rng.integers(0, 1 << 14, 200)
    src, dst = np.unique(np.stack([src, dst], 1), axis=0).T
    plan = build_spmv_plan(src, dst, None, n)
    x = (jnp.arange(plan.pad_v) + 1.0).astype(jnp.float32)
    expect = np.zeros(plan.pad_v)
    np.maximum.at(expect, dst, src + 1.0)
    mask = expect > 0

    y2 = np.asarray(spmv_onehot(plan, x, reduce="max", combine="left",
                                precision="split", interpret=True))
    assert np.abs(y2[mask] - expect[mask]).max() > 0, \
        "2-limb split unexpectedly exact — keep split3 anyway, but update " \
        "the gate comments"
    y3 = np.asarray(spmv_onehot(plan, x, reduce="max", combine="left",
                                precision="split3", interpret=True))
    np.testing.assert_array_equal(y3[mask], expect[mask])


def test_bfs_pred_exact_past_2p16_vertices(monkeypatch):
    """End-to-end regression: BFS predecessors on a graph with > 2^16
    vertices must be exact.  The dense bottom-up level used to select
    parent IDS through the 2-limb split (only ~16-bit exact → corrupted
    parents); it now propagates the exact 0/1 mask and the public bfs()
    recovers predecessors host-side (_bfs_pred_host)."""
    import cugraph_tpu

    monkeypatch.setenv("CUGRAPH_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("CUGRAPH_TPU_PALLAS_MIN_EDGES", "1")
    n = (1 << 17) + 1000
    rng = np.random.default_rng(8)
    # frontier of 5000 > _TD_K=4096 forces the DENSE level for the
    # hubs→leaves expansion
    hubs = rng.choice(np.arange(1 << 16, n), 5000, replace=False)
    leaves = hubs % 1024
    src = np.concatenate([np.zeros(5000, np.int64), hubs])
    dst = np.concatenate([hubs, leaves])
    G = cugraph_tpu.Graph(directed=True)
    G.from_edgelist(src, dst, None, vertices=np.arange(n), renumber=False)
    df = cugraph_tpu.bfs(G, 0)
    dist = np.empty(n, np.int64)
    pred = np.empty(n, np.int64)
    dist[df["vertex"].to_numpy()] = df["distance"].to_numpy()
    pred[df["vertex"].to_numpy()] = df["predecessor"].to_numpy()
    reach = (dist < np.iinfo(np.int32).max) & (np.arange(n) != 0)
    assert reach.sum() > 5000
    # every predecessor must be a REAL in-neighbor one level up
    edge_set = set(zip(src.tolist(), dst.tolist()))
    for v in np.flatnonzero(reach):
        assert (int(pred[v]), int(v)) in edge_set, (v, pred[v])
        assert dist[pred[v]] + 1 == dist[v]


def test_core_number_pallas_matches_xla():
    import cugraph_tpu
    from cugraph_tpu.algos.cores import _core_number_kernel_pallas

    src, dst, _ = _rand_graph(90, 500, 4)
    G = cugraph_tpu.Graph(directed=False)
    G.from_edgelist(src, dst, None)
    slow = cugraph_tpu.core_number(G).sort_values("vertex")

    n = G.number_of_vertices()
    isrc, idst, _ = G.edgelist_arrays()  # already symmetrized (undirected)
    plan = build_spmv_plan(isrc, idst, None, n)
    c = np.asarray(_core_number_kernel_pallas(plan, jnp.int32(n),
                                              interpret=True))[:n]
    order = np.argsort(G.number_map.to_external(np.arange(n)))
    np.testing.assert_array_equal(c[order], slow["core_number"].to_numpy())


def test_bfs_diropt_sparse_regime_on_path_graph():
    """High-diameter path graph: every level should take the sparse top-down
    branch (frontier of 1); distances must be exact."""
    import cugraph_tpu
    from cugraph_tpu.algos.traversal import _bfs_kernel_diropt

    n = 300
    src = np.arange(n - 1)
    dst = np.arange(1, n)
    G = cugraph_tpu.Graph(directed=True)
    G.from_edgelist(src, dst, None, renumber=False)
    dist, pred = _bfs_kernel_diropt(G.structure, None, jnp.int32(0), n, n,
                                    False)
    dist, pred = np.asarray(dist)[:n], np.asarray(pred)[:n]
    np.testing.assert_array_equal(dist, np.arange(n))
    np.testing.assert_array_equal(pred[1:], np.arange(n - 1))
    assert pred[0] == -1


def test_bfs_diropt_mixed_regimes():
    """Star + tail: first level dense-ish (hub fanout), tail levels sparse."""
    import cugraph_tpu

    hub_children = np.arange(1, 200)
    src = np.concatenate([np.zeros(199, np.int64), np.arange(200, 260),
                          [0]])
    dst = np.concatenate([hub_children, np.arange(201, 261), [200]])
    G = cugraph_tpu.Graph(directed=True)
    G.from_edgelist(src, dst, None, renumber=False)
    df = cugraph_tpu.bfs(G, 0).sort_values("vertex")
    d = df["distance"].to_numpy()
    assert d[0] == 0 and (d[1:200] == 1).all()
    assert d[200] == 1 and d[210] == 11


def test_per_v_random_select_valid_and_uniform():
    """Semiring neighbor selection (per_v_random_select_transform_outgoing_e
    fast path): every selected id is a real out-neighbor, sinks get -1, and
    the selection is uniform over neighbors (chi-square, loose)."""
    import jax.random as jr

    from cugraph_tpu.kernels.dispatch import per_v_random_select

    rng = np.random.default_rng(0)
    n, m = 300, 2400
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    G = ctpu.Graph(directed=True)
    G.from_edgelist(src, dst, None)
    s2, d2, _ = G.edgelist_arrays()
    adj = {}
    for u, v in zip(s2, d2):
        adj.setdefault(int(u), set()).add(int(v))

    sel = np.asarray(per_v_random_select(G, jr.key(0), interpret=True))
    for v in range(G.number_of_vertices()):
        if v in adj:
            assert sel[v] in adj[v]
        else:
            assert sel[v] == -1

    deg = {u: len(s) for u, s in adj.items()}
    u0 = max(deg, key=deg.get)
    counts = {}
    K = 200
    for kk in range(K):
        s = int(np.asarray(
            per_v_random_select(G, jr.key(kk), interpret=True))[u0])
        counts[s] = counts.get(s, 0) + 1
    d0 = deg[u0]
    exp = K / d0
    chi2 = sum((c - exp) ** 2 / exp for c in counts.values()) \
        + (d0 - len(counts)) * exp
    assert chi2 < 4 * d0


def test_bulk_sample_matches_gather_semantics(monkeypatch):
    """The bulk semiring sampling route must return valid neighbors with
    correct edge attribution, matching the gather route's frame schema."""
    import jax.random as jr

    monkeypatch.setenv("CUGRAPH_TPU_PALLAS_INTERPRET", "1")

    from cugraph_tpu.algos.sampling import _bulk_sample_with_replacement

    rng = np.random.default_rng(3)
    n, m = 500, 4000
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = rng.uniform(0.1, 1.0, m).astype(np.float32)
    G = ctpu.Graph(directed=True)
    G.from_edgelist(src, dst, w)
    g = G.structure
    frontier = np.arange(G.number_of_vertices(), dtype=np.int32)
    d, e, v = _bulk_sample_with_replacement(G, g, frontier, jr.key(1), 3)
    assert d.shape == (len(frontier), 3)
    ind = np.asarray(g.csr.indices)
    maj = np.asarray(g.csr.majors)
    ok = v.nonzero()
    # edge attribution: eidx must point at a (src, dst) CSR slot
    assert (ind[e[ok]] == d[ok]).all()
    srcs_rep = np.repeat(frontier, 3).reshape(-1, 3)
    assert (maj[e[ok]] == srcs_rep[ok]).all()


def test_tile_subs_variants_match():
    """tile_subs=16/32/128 packings must produce identical results to 8.
    128 exercises the VMEM-chunked gather (two 64-subtile one-hot batches
    per tile — the round-3 path the TPU bench runs)."""
    rng = np.random.default_rng(4)
    n, m = 2000, 15000
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = rng.uniform(0.5, 2.0, m).astype(np.float32)
    x = rng.uniform(-1, 1, ((n + 127) // 128) * 128).astype(np.float32)
    ref = None
    for ts in (8, 16, 32, 128):
        plan = build_spmv_plan(src, dst, w, n, tile_subs=ts)
        xp = jnp.asarray(np.pad(x, (0, plan.pad_v - len(x))))
        y = np.asarray(spmv_onehot(plan, xp, interpret=True,
                                   precision="split"))[: len(x)]
        ym = np.asarray(spmv_onehot(plan, xp, interpret=True,
                                    precision="split", reduce="max",
                                    combine="left"))[: len(x)]
        if ref is None:
            ref = (y, ym)
        else:
            np.testing.assert_allclose(y, ref[0], atol=1e-4)
            np.testing.assert_allclose(ym, ref[1], atol=1e-4)
