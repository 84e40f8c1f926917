"""Mid-scale algorithm correctness: RMAT-14 (16k vertices, ~260k directed
edges) against scipy/NetworkX oracles on the CPU XLA path.

Bridges the gap between the karate-scale unit oracles and the RMAT-18+
plan-builder invariants (test_plan_scale.py): real power-law degree
structure, multi-window plans, hub rows — while staying fast enough for the
default suite."""

import numpy as np
import pytest
import scipy.sparse as sp
from scipy.sparse import csgraph

import cugraph_tpu as ctpu


@pytest.fixture(scope="module")
def rmat14():
    from cugraph_tpu.generators.rmat import rmat

    scale, ef = 14, 16
    el = rmat(scale, (1 << scale) * ef, 0.57, 0.19, 0.19, seed=9)
    src = el["src"].to_numpy()
    dst = el["dst"].to_numpy()
    keep = src != dst
    src, dst = src[keep], dst[keep]
    # dedup parallel edges (scipy csr SUMS duplicates; Graph coalesces) and
    # compact to the touched vertex set so scipy oracles share the Graph's
    # vertex universe (isolated RMAT ids never enter the edge list)
    # int64 keys: the int32 inputs would overflow src * 2^21 and scramble
    # pairs (fabricating self-loops the keep filter already removed)
    pair = np.unique(src.astype(np.int64) * (1 << 21) + dst)
    src, dst = pair >> 21, pair & ((1 << 21) - 1)
    vs, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    src, dst = inv[: len(src)], inv[len(src):]
    return src.astype(np.int64), dst.astype(np.int64), len(vs)


def test_pagerank_rmat14_vs_scipy(rmat14):
    src, dst, n = rmat14
    G = ctpu.Graph(directed=True)
    G.from_edgelist(src, dst, None)
    pr = ctpu.pagerank(G, alpha=0.85, tol=1e-10, max_iter=200)

    A = sp.csr_matrix((np.ones(len(src)), (src, dst)), shape=(n, n))
    out = np.asarray(A.sum(axis=1)).ravel()
    P = sp.diags(np.divide(1.0, out, out=np.zeros_like(out),
                           where=out > 0)) @ A
    p = np.full(n, 1.0 / n)
    dang = out == 0
    for _ in range(200):
        p_new = 0.85 * (P.T @ p + p[dang].sum() / n) + 0.15 / n
        if np.abs(p_new - p).sum() < 1e-12:
            p = p_new
            break
        p = p_new
    got = dict(zip(pr["vertex"], pr["pagerank"]))
    err = max(abs(got[v] - p[v]) for v in range(n) if v in got)
    assert err < 1e-5, err


def test_bfs_wcc_rmat14_vs_scipy(rmat14):
    src, dst, n = rmat14
    G = ctpu.Graph()
    G.from_edgelist(np.concatenate([src, dst]), np.concatenate([dst, src]),
                    None)
    A = sp.csr_matrix((np.ones(len(src)), (src, dst)), shape=(n, n))

    bfs = ctpu.bfs(G, 0)
    ref_d = csgraph.shortest_path(A, method="D", unweighted=True,
                                  directed=False, indices=0)
    bd = dict(zip(bfs["vertex"], bfs["distance"]))
    for v in range(0, n, 97):
        want = ref_d[v]
        got = bd.get(v)
        if np.isinf(want):
            assert got is None or got >= np.iinfo(np.int32).max or got < 0
        else:
            assert got == want, (v, got, want)

    wcc = ctpu.weakly_connected_components(G)
    ncc_ref, cc_ref = csgraph.connected_components(A, directed=False)
    col = [c for c in wcc.columns if c != "vertex"][0]
    lab = dict(zip(wcc["vertex"], wcc[col]))
    # same partition: label equality must match reference equality on a sample
    idx = np.arange(0, n, 53)
    for i in idx[1:]:
        assert (lab[int(idx[0])] == lab[int(i)]) == \
            (cc_ref[idx[0]] == cc_ref[i])


def test_sssp_rmat14_vs_scipy(rmat14):
    src, dst, n = rmat14
    rng = np.random.default_rng(4)
    w = rng.uniform(0.5, 3.0, len(src)).astype(np.float32)
    G = ctpu.Graph(directed=True)
    G.from_edgelist(src, dst, w)
    df = ctpu.sssp(G, 0)
    A = sp.csr_matrix((w, (src, dst)), shape=(n, n))
    ref = csgraph.dijkstra(A, directed=True, indices=0)
    got = dict(zip(df["vertex"], df["distance"]))
    finite = np.isfinite(ref)
    sample = np.arange(0, n, 111)
    for v in sample:
        if finite[v]:
            assert abs(got[v] - ref[v]) < 1e-3, (v, got[v], ref[v])


def test_triangles_rmat14_cross_engine(rmat14):
    """Two independent implementations must agree at power-law scale: the
    oriented wedge engine's per-edge support vs the min-degree probe
    engine's |N(u)∩N(v)| for sampled adjacent pairs, plus the
    Σtri = Σsup = 3T invariants and scipy trace(A·A·A)/6."""
    src, dst, n = rmat14
    G = ctpu.Graph()
    G.from_edgelist(src, dst, None)

    tc = ctpu.triangle_count(G).sort_values("vertex")
    et = ctpu.edge_triangle_count(G)
    T3 = int(tc["counts"].sum())
    assert T3 % 3 == 0
    # per-directed-edge support sums to 6T (each triangle: 3 edges × 2 dirs)
    assert int(et["counts"].sum()) == 2 * T3

    # scipy oracle: number of triangles = trace(A^3)/6 on the simple
    # symmetric adjacency
    s2, d2, _ = G.edgelist_arrays()
    A = sp.csr_matrix((np.ones(len(s2)), (s2, d2)),
                      shape=(G.number_of_vertices(),) * 2)
    A.data[:] = 1.0
    tr = (A @ A).multiply(A).sum()
    # (A²∘A).sum() counts each triangle 6× on the symmetric matrix = 2·(3T)
    assert int(round(tr)) == 2 * T3

    # cross-engine: sampled adjacent pairs, probe engine vs wedge support
    from cugraph_tpu.prims.intersection import _pair_minprobe_host

    rng = np.random.default_rng(3)
    sel = rng.choice(len(s2), 400, replace=False)
    cnt, _, _ = _pair_minprobe_host(G.structure.csr, s2[sel].astype(np.int64),
                                    d2[sel].astype(np.int64), False)
    np.testing.assert_array_equal(cnt,
                                  et["counts"].to_numpy()[sel])
