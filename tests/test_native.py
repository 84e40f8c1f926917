"""Native (C++) builder vs NumPy-path equivalence.

The native layer (core/_native/builder.cpp via core/native.py) must produce
bit-identical structures to the NumPy fallback — same contract the reference
enforces between its host utilities and device results (SURVEY.md §4 tier 3).
"""

import numpy as np
import pytest

from cugraph_tpu.core import native
from cugraph_tpu.core.structure import (
    build_csr_host,
    padded_vertex_count,
    round_up,
    E_ALIGN,
)

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="no C++ toolchain")


def test_coo_to_csr_matches_numpy():
    rng = np.random.default_rng(0)
    n, m = 500, 4000
    major = rng.integers(0, n, m).astype(np.int32)
    minor = rng.integers(0, n, m).astype(np.int32)
    w = rng.random(m).astype(np.float32)

    pad_v = padded_vertex_count(n)
    pad_e = max(round_up(m, E_ALIGN), E_ALIGN)
    res = native.coo_to_csr_native(major, minor, w, n, pad_v, pad_e, pad_v - 1)
    assert res is not None
    offsets, om, on, ow = res

    # numpy oracle (the lexsort path)
    order = np.lexsort((minor, major))
    np.testing.assert_array_equal(om[:m], major[order])
    np.testing.assert_array_equal(on[:m], minor[order])
    np.testing.assert_array_equal(ow[:m], w[order])
    counts = np.bincount(major, minlength=pad_v)
    counts[pad_v - 1] += pad_e - m
    np.testing.assert_array_equal(np.diff(offsets), counts)
    assert np.all(om[m:] == pad_v - 1)
    assert np.all(ow[m:] == 0)


def test_csr_build_uses_native_and_matches():
    # build_csr_host must give identical device arrays either way
    rng = np.random.default_rng(1)
    n, m = 300, 2500
    src = rng.integers(0, n, m).astype(np.int32)
    dst = rng.integers(0, n, m).astype(np.int32)
    w = rng.random(m).astype(np.float32)

    a = build_csr_host(src, dst, w, n)
    # force numpy fallback by monkeypatching
    import cugraph_tpu.core.native as nat
    saved = nat._lib, nat._tried
    nat._lib, nat._tried = None, True
    try:
        b = build_csr_host(src, dst, w, n)
    finally:
        nat._lib, nat._tried = saved
    np.testing.assert_array_equal(np.asarray(a.offsets), np.asarray(b.offsets))
    np.testing.assert_array_equal(np.asarray(a.majors), np.asarray(b.majors))
    np.testing.assert_array_equal(np.asarray(a.indices), np.asarray(b.indices))
    np.testing.assert_array_equal(np.asarray(a.weights), np.asarray(b.weights))


def test_renumber_native():
    rng = np.random.default_rng(2)
    ids = rng.choice(10**12, 200, replace=False)
    src = rng.choice(ids, 1000)
    dst = rng.choice(ids, 1000)
    res = native.renumber_native(src, dst)
    assert res is not None
    uniq, s32, d32 = res
    # mapping is consistent and dense
    assert len(np.unique(np.concatenate([s32, d32]))) == len(uniq)
    np.testing.assert_array_equal(uniq[s32], src)
    np.testing.assert_array_equal(uniq[d32], dst)


def test_build_blocks_2d_native_matches_numpy():
    from cugraph_tpu.parallel.partition import Partition2D, _build_blocks
    import cugraph_tpu.core.native as nat

    rng = np.random.default_rng(3)
    n, m = 200, 1500
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    w = rng.random(m).astype(np.float32)
    part = Partition2D.create(n, 4, 2)

    a = _build_blocks(part, major_end=dst, minor_end=src, weight=w)
    saved = nat._lib, nat._tried
    nat._lib, nat._tried = None, True
    try:
        b = _build_blocks(part, major_end=dst, minor_end=src, weight=w)
    finally:
        nat._lib, nat._tried = saved

    # per-device multisets of (dst_loc, src_loc, w) must match; dst_loc order
    # must be sorted in both
    sa = np.asarray(a.dst_loc).reshape(8, -1)
    sb = np.asarray(b.dst_loc).reshape(8, -1)
    assert np.all(np.diff(sa, axis=1) >= 0) and np.all(np.diff(sb, axis=1) >= 0)
    for d in range(8):
        ta = sorted(zip(np.asarray(a.dst_loc).reshape(8, -1)[d],
                        np.asarray(a.src_loc).reshape(8, -1)[d],
                        np.asarray(a.weight).reshape(8, -1)[d]))
        tb = sorted(zip(sb[d], np.asarray(b.src_loc).reshape(8, -1)[d],
                        np.asarray(b.weight).reshape(8, -1)[d]))
        assert ta == tb


def test_build_blocks_2d_eid_native_matches_numpy():
    """eid payloads permute alongside the other columns in both builders:
    every valid slot's eid must point at the input edge with that slot's
    (endpoints, weight); pad slots are −1."""
    from cugraph_tpu.parallel.partition import Partition2D, _build_blocks
    import cugraph_tpu.core.native as nat

    rng = np.random.default_rng(5)
    n, m = 200, 1500
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    w = np.arange(m, dtype=np.float32)  # weight IS the input index
    eid = np.arange(m, dtype=np.int32)
    part = Partition2D.create(n, 4, 2)

    def check(blocks):
        assert blocks.eid is not None
        ei = np.asarray(blocks.eid).reshape(-1)
        vv = np.asarray(blocks.valid).reshape(-1)
        ww = np.asarray(blocks.weight).reshape(-1)
        assert np.all(ei[~vv] == -1)
        assert np.array_equal(ei[vv], ww[vv].astype(np.int32))
        assert sorted(ei[vv].tolist()) == list(range(m))

    check(_build_blocks(part, major_end=dst, minor_end=src, weight=w,
                        eid=eid))
    saved = nat._lib, nat._tried
    nat._lib, nat._tried = None, True
    try:
        check(_build_blocks(part, major_end=dst, minor_end=src, weight=w,
                            eid=eid))
    finally:
        nat._lib, nat._tried = saved


def test_degrees_native_matches_numpy():
    rng = np.random.default_rng(4)
    n, m = 400, 3000
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    w = rng.random(m).astype(np.float32)
    res = native.degrees_native(src, dst, w, n)
    assert res is not None
    out_deg, in_deg = res
    eo = np.zeros(n, np.float32); np.add.at(eo, src, w)
    ei = np.zeros(n, np.float32); np.add.at(ei, dst, w)
    np.testing.assert_allclose(out_deg, eo, rtol=1e-6)
    np.testing.assert_allclose(in_deg, ei, rtol=1e-6)
    # unweighted
    out_deg, in_deg = native.degrees_native(src, dst, None, n)
    np.testing.assert_array_equal(out_deg, np.bincount(src, minlength=n))
    np.testing.assert_array_equal(in_deg, np.bincount(dst, minlength=n))


def test_native_spmv_plan_matches_numpy():
    """Native C++ tiler must produce bit-identical plan arrays to the NumPy
    path (same sort order, packing, padding conventions)."""
    import os

    from cugraph_tpu.core.native import spmv_plan_native
    from cugraph_tpu.kernels.spmv_onehot import build_spmv_plan

    if spmv_plan_native(np.array([0]), np.array([1]), None, 1, 64,
                        16384, 8192) is None:
        pytest.skip("no native toolchain")

    rng = np.random.default_rng(5)
    for n, m, sw, dw, ybr in [(3000, 150000, 16384, 8192, 8192),
                              (20000, 200000, 8192, 4096, 64),
                              (500, 120000, 4096, 2048, 8192)]:
        src = rng.integers(0, n, m)
        dst = rng.integers(0, n, m)
        w = rng.uniform(0.1, 1.0, m).astype(np.float32)
        os.environ["CUGRAPH_TPU_NO_NATIVE"] = "1"
        try:
            ref = build_spmv_plan(src, dst, w, n, yb_rows=ybr,
                                  device_arrays=False, src_win=sw, dst_win=dw)
        finally:
            del os.environ["CUGRAPH_TPU_NO_NATIVE"]
        got = build_spmv_plan(src, dst, w, n, yb_rows=ybr,
                              device_arrays=False, src_win=sw, dst_win=dw)
        assert got.num_tiles == ref.num_tiles
        np.testing.assert_array_equal(np.asarray(got.src_rel),
                                      np.asarray(ref.src_rel))
        np.testing.assert_array_equal(np.asarray(got.dst_full),
                                      np.asarray(ref.dst_full))
        np.testing.assert_array_equal(np.asarray(got.xwin_blk),
                                      np.asarray(ref.xwin_blk))
        np.testing.assert_array_equal(np.asarray(got.yblk),
                                      np.asarray(ref.yblk))
        rw = np.asarray(ref.weight)
        gw = np.asarray(got.weight)
        assert ((rw == gw) | (np.isnan(rw) & np.isnan(gw))).all()


def test_rmat_native_matches_numpy_fallback(monkeypatch):
    from cugraph_tpu.core import native as N
    from cugraph_tpu.generators import rmat as R

    args = (12, 5000, 0.57, 0.19, 0.19, 42, False)
    out = N.rmat_native(*args)
    assert out is not None, "native lib should compile in this image"
    s_nat, d_nat = out
    # force the NumPy fallback (scoped so later native calls still work)
    with monkeypatch.context() as mp:
        mp.setattr("cugraph_tpu.core.native.rmat_native",
                   lambda *a, **k: None)
        s_np, d_np = R._rmat_host(*args)
    np.testing.assert_array_equal(s_nat, s_np)
    np.testing.assert_array_equal(d_nat, d_np)

    # clip_and_flip orients src <= dst
    s_cf, d_cf = N.rmat_native(12, 5000, 0.57, 0.19, 0.19, 42, True)
    assert (s_cf <= d_cf).all()

    # quadrant proportions: top src bit should be 0 with prob a+b = 0.76
    frac = np.mean(s_nat < (1 << 11))
    assert abs(frac - 0.76) < 0.03

    # ids are int32 framework-wide: scale > 31 must raise, not wrap negative
    import pytest

    with pytest.raises(ValueError, match="int32"):
        R._rmat_host(32, 10, 0.57, 0.19, 0.19, 1, False)

    # determinism across thread counts (counter RNG is order-independent)
    s1, d1 = N.rmat_native(*args, n_threads=1)
    s8, d8 = N.rmat_native(*args, n_threads=8)
    np.testing.assert_array_equal(s1, s8)
    np.testing.assert_array_equal(d1, d8)


def test_spmm_plan_native_matches_numpy():
    """The SpMM plan layout is bit-identical to the SpMV layout, so the
    native SpMV tiler builds it; this pins the equivalence (NumPy fallback
    forced via a monkeypatched unavailable lib)."""
    import cugraph_tpu.kernels.spmm_onehot as so
    from cugraph_tpu.core import native as nat

    rng = np.random.default_rng(5)
    for n, m, weighted in [(700, 4000, True), (3000, 40000, False),
                           (128, 200, True)]:
        src = rng.integers(0, n, m)
        dst = rng.integers(0, n, m)
        w = rng.random(m).astype(np.float32) if weighted else None
        p_nat = so.build_spmm_plan(src, dst, w, n)
        import unittest.mock as mock
        with mock.patch.object(nat, "get_lib", lambda: None):
            p_np = so.build_spmm_plan(src, dst, w, n)
        assert p_nat.num_tiles == p_np.num_tiles
        assert (p_nat.w_src, p_nat.w_dst, p_nat.ybv, p_nat.tile_subs) == \
            (p_np.w_src, p_np.w_dst, p_np.ybv, p_np.tile_subs)
        for f in ("src_rel", "dst_rel", "xwin", "yblk"):
            assert np.array_equal(np.asarray(getattr(p_nat, f)),
                                  np.asarray(getattr(p_np, f))), f
        a, b = np.asarray(p_nat.weight), np.asarray(p_np.weight)
        assert np.array_equal(np.isnan(a), np.isnan(b))
        assert np.array_equal(a[~np.isnan(a)], b[~np.isnan(b)])


def test_triangle_support_native_matches_numpy(monkeypatch):
    """Threaded C++ wedge engine vs the NumPy oriented engine: exact count
    equality for per-vertex triangles AND per-edge support, hub-heavy."""
    from cugraph_tpu.algos import _oriented_tri as OT

    rng = np.random.default_rng(9)
    u0 = rng.integers(0, 300, 3000)
    v0 = rng.integers(0, 300, 3000)
    # hub
    u0 = np.concatenate([u0, np.zeros(200, np.int64)])
    v0 = np.concatenate([v0, rng.integers(1, 300, 200)])
    keep = u0 != v0
    key = np.unique(np.minimum(u0, v0)[keep] * 300
                    + np.maximum(u0, v0)[keep])
    u, v = key // 300, key % 300

    tri_n, sup_n = OT.oriented_wedge_counts(u, v, 300,
                                            need_edge_support=True)
    with monkeypatch.context() as mp:
        mp.setattr("cugraph_tpu.core.native.triangle_support_native",
                   lambda *a, **k: None)
        tri_p, sup_p = OT.oriented_wedge_counts(u, v, 300,
                                                need_edge_support=True)
    np.testing.assert_array_equal(tri_n, tri_p)
    np.testing.assert_array_equal(sup_n, sup_p)


def test_pair_probe_native_matches_numpy(monkeypatch):
    """Threaded C++ min-degree probes vs the NumPy searchsorted fallback:
    identical counts and weighted sums."""
    from cugraph_tpu.core.structure import build_structure_host
    from cugraph_tpu.prims.intersection import _pair_minprobe_host

    rng = np.random.default_rng(11)
    n = 250
    src = rng.integers(0, n, 2500)
    dst = rng.integers(0, n, 2500)
    keep = src != dst
    pairs = np.unique(np.stack([src[keep], dst[keep]], 1), axis=0)
    src, dst = pairs[:, 0], pairs[:, 1]
    w = rng.uniform(0.5, 2.0, len(src)).astype(np.float32)
    g = build_structure_host(src, dst, w, n)

    us = rng.integers(0, n, 600)
    vs = rng.integers(0, n, 600)
    for weighted in (False, True):
        c1, mn1, mx1 = _pair_minprobe_host(g.csr, us, vs, weighted)
        with monkeypatch.context() as mp:
            mp.setattr("cugraph_tpu.core.native.pair_probe_native",
                       lambda *a, **k: None)
            c2, mn2, mx2 = _pair_minprobe_host(g.csr, us, vs, weighted)
        np.testing.assert_array_equal(c1, c2)
        if weighted:
            np.testing.assert_allclose(mn1, mn2, rtol=1e-6)
            np.testing.assert_allclose(mx1, mx2, rtol=1e-6)


def test_coarsen_edges_native_matches_numpy():
    """Native counting-sort contraction vs the NumPy key-sort path: same
    aggregated (src, dst, weight) multiset and compaction."""
    import cugraph_tpu.core.native as nat
    from cugraph_tpu.algos.community import _coarsen

    rng = np.random.default_rng(21)
    m, n = 5000, 300
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = rng.random(m).astype(np.float32)
    labels = rng.integers(0, 40, n)

    a = _coarsen(src, dst, w, labels)
    saved = nat._lib, nat._tried
    nat._lib, nat._tried = None, True
    try:
        b = _coarsen(src, dst, w, labels)
    finally:
        nat._lib, nat._tried = saved
    assert a[3] == b[3]  # nc
    np.testing.assert_array_equal(a[4], b[4])  # compact mapping
    ka = sorted(zip(a[0].tolist(), a[1].tolist(), np.round(a[2], 4)))
    kb = sorted(zip(b[0].tolist(), b[1].tolist(), np.round(b[2], 4)))
    assert ka == kb


def test_louvain_sweep_native_matches_xla_quality():
    """Native louvain one-level vs the jitted path: identical modularity on
    a structured graph (two planted cliques + bridge)."""
    import cugraph_tpu.core.native as nat
    from cugraph_tpu.algos.community import _louvain_one_level

    rng = np.random.default_rng(2)
    edges = []
    for base in (0, 10):
        for i in range(10):
            for j in range(i + 1, 10):
                if rng.random() < 0.8:
                    edges.append((base + i, base + j))
    edges.append((0, 10))
    src = np.array([e[0] for e in edges] + [e[1] for e in edges])
    dst = np.array([e[1] for e in edges] + [e[0] for e in edges])
    w = np.ones(len(src), np.float32)
    lab_n, q_n = _louvain_one_level(src, dst, w, 20, 1.0)
    saved = nat._lib, nat._tried
    nat._lib, nat._tried = None, True
    try:
        lab_x, q_x = _louvain_one_level(src, dst, w, 20, 1.0)
    finally:
        nat._lib, nat._tried = saved
    assert abs(q_n - q_x) < 1e-6
    # same partition structure (labels may differ up to renaming)
    for a_, b_ in ((lab_n, lab_x),):
        groups_a = {}
        for v_, l_ in enumerate(a_):
            groups_a.setdefault(l_, set()).add(v_)
        groups_b = {}
        for v_, l_ in enumerate(b_):
            groups_b.setdefault(l_, set()).add(v_)
        assert sorted(map(sorted, groups_a.values())) == \
            sorted(map(sorted, groups_b.values()))


def test_renumber_mixed_width_and_sparse_dedupe():
    """Review regressions: renumber must widen to the dst dtype (int32 src +
    int64 dst with huge ids), and sparse huge raw ids must not reach the
    counting-sort dedupe (falls back to np.unique, stays correct)."""
    import cugraph_tpu as ct
    from cugraph_tpu.core.renumber import renumber_edgelist

    src = np.array([0, 1, 2], np.int32)
    dst = np.array([2**40, 1, 0], np.int64)
    s, d, nm = renumber_edgelist(src, dst)
    assert len(np.unique(nm._i2e)) == 4  # no wrapped duplicates
    assert 2**40 in set(nm._i2e.tolist())

    # sparse ids (max id >> 4·m): the dense-bucket native dedupe must be
    # skipped in favor of np.unique — answers stay correct either way
    from cugraph_tpu.core.preprocess import remove_multi_edges

    s2 = np.array([1_000_000, 5, 1_000_000], np.int64)
    d2 = np.array([7, 9, 7], np.int64)
    rs, rd, _ = remove_multi_edges(s2, d2)
    assert len(rs) == 2 and 1_000_000 in set(rs.tolist())


def test_dedupe_huge_ids_and_renumber_int64min():
    """Review regressions: the dedupe fallback must not alias edges whose
    ids exceed 2^32 (the old (src<<32)|uint32(dst) key truncated), and the
    hash renumber must intern INT64_MIN (it collided with the empty-slot
    sentinel)."""
    from cugraph_tpu.core.preprocess import remove_multi_edges
    from cugraph_tpu.core.renumber import renumber_edgelist

    src = np.array([0, 0], np.int64)
    dst = np.array([2**32, 0], np.int64)
    rs, rd, _ = remove_multi_edges(src, dst)
    assert len(rs) == 2  # (0, 2^32) and (0, 0) are DISTINCT edges

    s = np.array([np.iinfo(np.int64).min, 5], np.int64)
    d = np.array([5, 7], np.int64)
    si, di, nm = renumber_edgelist(s, d)
    assert (si >= 0).all() and (di >= 0).all()
    assert np.iinfo(np.int64).min in set(nm._i2e.tolist())
    np.testing.assert_array_equal(nm.to_external(si), s)


def test_bfs_pred_from_dist_native_matches_numpy():
    """Native threaded BFS predecessor recovery == the numpy fallback's
    validity contract: every filled pred is an in-neighbor one level up,
    every missing reached vertex gets filled."""
    import pytest

    from cugraph_tpu.core.native import bfs_pred_from_dist_native, get_lib

    if get_lib() is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(5)
    n, m = 500, 4000
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    # synthetic valid BFS levels from vertex 0 via networkx
    import networkx as nx

    Gx = nx.DiGraph()
    Gx.add_nodes_from(range(n))
    Gx.add_edges_from(zip(src.tolist(), dst.tolist()))
    INT_INF = np.iinfo(np.int32).max
    dist = np.full(n, INT_INF, np.int32)
    for v, d in nx.single_source_shortest_path_length(Gx, 0).items():
        dist[v] = d
    pred = np.full(n, -1, np.int64)
    assert bfs_pred_from_dist_native(src, dst, dist, pred)
    edge_set = set(zip(src.tolist(), dst.tolist()))
    for v in range(n):
        if dist[v] in (0, INT_INF):
            assert pred[v] == -1
        else:
            assert (int(pred[v]), v) in edge_set
            assert dist[pred[v]] + 1 == dist[v]
