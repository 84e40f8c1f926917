"""ctypes loader for the native (C++) graph-construction kernels.

The reference implements construction in CUDA (renumber_edgelist_impl.cuh,
create_graph_from_edgelist_impl.cuh); on a TPU system construction is host
work, so the native layer is tight C++ (counting sorts, open-addressing
renumber map) compiled on first use with the system toolchain and loaded via
ctypes.  NumPy fallbacks keep everything working when no compiler is present.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "_native", "builder.cpp")
_lock = threading.Lock()
_lib = None
_tried = False


def _cache_path() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.environ.get(
        "CUGRAPH_TPU_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "cugraph_tpu"),
    )
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, f"builder_{digest}.so")


def _build() -> str | None:
    so = _cache_path()
    if os.path.exists(so):
        return so
    tmp = f"{so}.{os.getpid()}.tmp"  # per-process: concurrent builders
    #                                  must not interleave into one file
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             "-pthread", _SRC, "-o", tmp],
            check=True, capture_output=True, timeout=180,
        )
        os.replace(tmp, so)  # atomic publish
        return so
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def get_lib():
    """The loaded native library, or None if unavailable (no toolchain, or
    CUGRAPH_TPU_NO_NATIVE set — the documented kill switch for EVERY native
    path, forcing the NumPy reference implementations)."""
    global _lib, _tried
    if os.environ.get("CUGRAPH_TPU_NO_NATIVE"):
        return None
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None  # corrupt cache file: fall back to NumPy paths
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.coo_to_csr.restype = ctypes.c_int
        lib.coo_to_csr.argtypes = [i32p, i32p, f32p, ctypes.c_int64,
                                   ctypes.c_int64, ctypes.c_int64,
                                   ctypes.c_int64, ctypes.c_int32,
                                   i32p, i32p, i32p, f32p]
        lib.renumber_edgelist64.restype = ctypes.c_int64
        lib.renumber_edgelist64.argtypes = [i64p, i64p, ctypes.c_int64,
                                            i64p, i32p, i32p]
        lib.degrees.restype = None
        lib.degrees.argtypes = [i32p, i32p, f32p, ctypes.c_int64,
                                ctypes.c_int64, f32p, f32p]
        lib.build_blocks_2d.restype = ctypes.c_int
        lib.build_blocks_2d.argtypes = [i64p, i64p, f32p, ctypes.c_int64,
                                        ctypes.c_int64, ctypes.c_int64,
                                        ctypes.c_int64, ctypes.c_int64,
                                        i32p, i32p, f32p, u8p, i32p, i32p]
        lib.spmv_plan_count.restype = ctypes.c_int64
        lib.spmv_plan_count.argtypes = [i64p, i64p, ctypes.c_int64,
                                        ctypes.c_int64, ctypes.c_int64,
                                        ctypes.c_int64, ctypes.c_int64,
                                        ctypes.c_int64]
        lib.spmv_plan_fill.restype = ctypes.c_int
        lib.spmv_plan_fill.argtypes = [i64p, i64p, f32p, ctypes.c_int64,
                                       ctypes.c_int64, ctypes.c_int64,
                                       ctypes.c_int64, ctypes.c_int64,
                                       ctypes.c_int64, ctypes.c_int64,
                                       i32p, i32p, f32p, i32p, i32p]
        lib.rmat_edgelist.restype = None
        lib.rmat_edgelist.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                      ctypes.c_double, ctypes.c_double,
                                      ctypes.c_double, ctypes.c_uint64,
                                      ctypes.c_int, ctypes.c_int, i32p, i32p]
        lib.bfs_pred_from_dist.restype = ctypes.c_int
        lib.bfs_pred_from_dist.argtypes = [i32p, i32p, i32p, ctypes.c_int64,
                                           ctypes.c_int64, i64p,
                                           ctypes.c_int]
        lib.triangle_support.restype = ctypes.c_int
        lib.triangle_support.argtypes = [i64p, i64p, ctypes.c_int64,
                                         ctypes.c_int64, ctypes.c_int,
                                         ctypes.c_int, i64p, i64p]
        lib.pair_intersection_probe.restype = ctypes.c_int
        lib.pair_intersection_probe.argtypes = [i64p, i64p, ctypes.c_int64,
                                                i64p, i32p, f32p,
                                                ctypes.c_int, ctypes.c_int,
                                                i32p, f32p, f32p]
        lib.louvain_sweep.restype = ctypes.c_int
        lib.louvain_sweep.argtypes = [i32p, f32p, ctypes.c_int64,
                                      ctypes.c_int64, i64p, i32p, i32p,
                                      ctypes.c_int, ctypes.c_double,
                                      ctypes.c_int, i32p]
        lib.coarsen_edges.restype = ctypes.c_int64
        lib.coarsen_edges.argtypes = [i32p, i32p, f32p, ctypes.c_int64,
                                      ctypes.c_int64, i32p, i32p, f32p]
        lib.core_number_peel.restype = ctypes.c_int
        lib.core_number_peel.argtypes = [i64p, i32p, ctypes.c_int64, i64p,
                                         i32p]
        lib.dedupe_edges.restype = ctypes.c_int64
        lib.dedupe_edges.argtypes = [i32p, i32p, f32p, ctypes.c_int64,
                                     ctypes.c_int64, ctypes.c_int, i64p,
                                     f32p]
        lib.leiden_refine_sweep.restype = ctypes.c_int
        lib.leiden_refine_sweep.argtypes = [i32p, f32p, ctypes.c_int64,
                                            ctypes.c_int64, i64p, i32p, i32p,
                                            ctypes.c_double, ctypes.c_double,
                                            ctypes.c_uint64, ctypes.c_int,
                                            i32p]
        _lib = lib
        return _lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def coo_to_csr_native(major, minor, weight, num_vertices, pad_v, pad_e, sink):
    """Native COO→sorted-CSR; returns (offsets, out_major, out_minor,
    out_weight) or None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    major = np.ascontiguousarray(major, np.int32)
    minor = np.ascontiguousarray(minor, np.int32)
    m = major.shape[0]
    w = None if weight is None else np.ascontiguousarray(weight, np.float32)
    offsets = np.empty(pad_v + 1, np.int32)
    om = np.empty(pad_e, np.int32)
    on = np.empty(pad_e, np.int32)
    ow = np.empty(pad_e, np.float32)
    rc = lib.coo_to_csr(
        _ptr(major, ctypes.c_int32), _ptr(minor, ctypes.c_int32),
        _ptr(w, ctypes.c_float) if w is not None else None,
        m, num_vertices, pad_v, pad_e, sink,
        _ptr(offsets, ctypes.c_int32), _ptr(om, ctypes.c_int32),
        _ptr(on, ctypes.c_int32), _ptr(ow, ctypes.c_float))
    if rc != 0:
        return None
    return offsets, om, on, ow


def renumber_native(src, dst):
    """Native renumber: (src64, dst64) → (unique_ids, src32, dst32) or None."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.int64)
    dst = np.ascontiguousarray(dst, np.int64)
    m = src.shape[0]
    uniq = np.empty(max(2 * m, 1), np.int64)
    so = np.empty(m, np.int32)
    do = np.empty(m, np.int32)
    n = lib.renumber_edgelist64(_ptr(src, ctypes.c_int64),
                                _ptr(dst, ctypes.c_int64), m,
                                _ptr(uniq, ctypes.c_int64),
                                _ptr(so, ctypes.c_int32),
                                _ptr(do, ctypes.c_int32))
    return uniq[:n].copy(), so, do


def degrees_native(src, dst, weight, num_vertices):
    """Native weighted out/in degree accumulation (one pass, ~10× faster than
    np.add.at); returns (out_deg, in_deg) float32[num_vertices] or None."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    m = src.shape[0]
    w = None if weight is None else np.ascontiguousarray(weight, np.float32)
    out_deg = np.empty(num_vertices, np.float32)
    in_deg = np.empty(num_vertices, np.float32)
    lib.degrees(_ptr(src, ctypes.c_int32), _ptr(dst, ctypes.c_int32),
                _ptr(w, ctypes.c_float) if w is not None else None,
                m, num_vertices,
                _ptr(out_deg, ctypes.c_float), _ptr(in_deg, ctypes.c_float))
    return out_deg, in_deg


def bfs_pred_from_dist_native(src, dst, dist, pred, n_threads=None):
    """Threaded BFS predecessor recovery: fill pred[v] (<0, reached, non-
    root) with any in-neighbor one level up.  Mutates ``pred`` (int64
    [n]) in place; returns True when the native engine ran."""
    lib = get_lib()
    if lib is None:
        return False
    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    dist = np.ascontiguousarray(dist, np.int32)
    assert pred.dtype == np.int64 and pred.flags.c_contiguous
    t = n_threads or min(16, os.cpu_count() or 1)
    lib.bfs_pred_from_dist(_ptr(src, ctypes.c_int32),
                           _ptr(dst, ctypes.c_int32),
                           _ptr(dist, ctypes.c_int32),
                           src.shape[0], pred.shape[0],
                           _ptr(pred, ctypes.c_int64), int(t))
    return True


def build_blocks_2d_native(gathered_end, reduced_end, weight, pmaj, pmin,
                           chunk, e_local, eid=None):
    """Native 2D-partition bucketing; returns (src_loc, dst_loc, w, valid,
    eid_or_None) as [n_dev, e_local] arrays, or None.  ``eid``: optional
    per-edge instance indices permuted alongside the payloads (pad −1)."""
    lib = get_lib()
    if lib is None:
        return None
    ge = np.ascontiguousarray(gathered_end, np.int64)
    re = np.ascontiguousarray(reduced_end, np.int64)
    m = ge.shape[0]
    w = None if weight is None else np.ascontiguousarray(weight, np.float32)
    ei = None if eid is None else np.ascontiguousarray(eid, np.int32)
    n_dev = pmaj * pmin
    src_loc = np.empty((n_dev, e_local), np.int32)
    dst_loc = np.empty((n_dev, e_local), np.int32)
    w_out = np.empty((n_dev, e_local), np.float32)
    valid = np.empty((n_dev, e_local), np.uint8)
    eid_out = None if ei is None else np.empty((n_dev, e_local), np.int32)
    rc = lib.build_blocks_2d(
        _ptr(ge, ctypes.c_int64), _ptr(re, ctypes.c_int64),
        _ptr(w, ctypes.c_float) if w is not None else None,
        m, pmaj, pmin, chunk, e_local,
        _ptr(src_loc, ctypes.c_int32), _ptr(dst_loc, ctypes.c_int32),
        _ptr(w_out, ctypes.c_float), _ptr(valid, ctypes.c_uint8),
        _ptr(ei, ctypes.c_int32) if ei is not None else None,
        _ptr(eid_out, ctypes.c_int32) if eid_out is not None else None)
    if rc != 0:
        return None
    return src_loc, dst_loc, w_out, valid.astype(bool), eid_out


def rmat_native(scale, num_edges, a, b, c, seed, clip_and_flip,
                n_threads=None):
    """Native threaded R-MAT generation; returns (src, dst) int32 arrays or
    None.  Bit-identical to the NumPy counter-RNG fallback in
    generators/rmat._rmat_host (same splitmix64 per-(seed,edge,bit) hash)."""
    lib = get_lib()
    if lib is None:
        return None
    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 16)
    src = np.empty(num_edges, np.int32)
    dst = np.empty(num_edges, np.int32)
    lib.rmat_edgelist(int(scale), int(num_edges), float(a), float(b),
                      float(c), ctypes.c_uint64(int(seed) & (2**64 - 1)),
                      int(bool(clip_and_flip)), int(n_threads),
                      _ptr(src, ctypes.c_int32), _ptr(dst, ctypes.c_int32))
    return src, dst


def triangle_support_native(u, v, n, need_support, n_threads=None):
    """Native threaded degree-oriented wedge engine (builder.cpp
    triangle_support); returns (tri int64[n], sup int64[M] or None) or None
    when the library is unavailable.  Exact-count-identical to the NumPy
    engine in algos/_oriented_tri.py (equality-tested)."""
    lib = get_lib()
    if lib is None:
        return None
    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 16)
        # per-thread accumulators are (n + M)·8 B — cap the fleet so the
        # transient stays under ~2 GB at any scale
        per = (int(n) + len(u)) * 8
        n_threads = max(1, min(n_threads, (2 << 30) // max(per, 1)))
    u = np.ascontiguousarray(u, np.int64)
    v = np.ascontiguousarray(v, np.int64)
    tri = np.empty(int(n), np.int64)
    sup = np.empty(len(u), np.int64) if need_support else np.empty(0, np.int64)
    rc = lib.triangle_support(
        _ptr(u, ctypes.c_int64), _ptr(v, ctypes.c_int64), len(u), int(n),
        int(bool(need_support)), int(n_threads),
        _ptr(tri, ctypes.c_int64), _ptr(sup, ctypes.c_int64))
    if rc != 0:
        return None
    return tri, (sup if need_support else None)


def louvain_sweep_native(dst_sorted, w_sorted, row_off, cluster, up_down,
                         resolution, rank=None, n_threads=None):
    """One native threaded Louvain local-moving sweep (builder.cpp
    louvain_sweep); COO must be pre-sorted by src with row_off[n+1]
    offsets.  ``rank`` optionally relabels the id ORDER for direction/tie
    decisions (ECG's ensemble permutation without re-sorting the graph).
    Returns the new cluster array or None."""
    lib = get_lib()
    if lib is None:
        return None
    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 16)
    dst_sorted = np.ascontiguousarray(dst_sorted, np.int32)
    w_sorted = np.ascontiguousarray(w_sorted, np.float32)
    row_off = np.ascontiguousarray(row_off, np.int64)
    cluster = np.ascontiguousarray(cluster, np.int32)
    rank_arr = (None if rank is None
                else np.ascontiguousarray(rank, np.int32))
    n = len(row_off) - 1
    out = np.empty(n, np.int32)
    rc = lib.louvain_sweep(
        _ptr(dst_sorted, ctypes.c_int32), _ptr(w_sorted, ctypes.c_float),
        len(dst_sorted), n, _ptr(row_off, ctypes.c_int64),
        _ptr(cluster, ctypes.c_int32),
        _ptr(rank_arr, ctypes.c_int32) if rank_arr is not None else None,
        int(bool(up_down)), float(resolution), int(n_threads),
        _ptr(out, ctypes.c_int32))
    if rc != 0:
        return None
    return out


def leiden_refine_sweep_native(dst_sorted, w_sorted, row_off, comm,
                               refined, theta, resolution, seed,
                               n_threads=None):
    """One native threaded Leiden refinement sweep (builder.cpp
    leiden_refine_sweep).  Returns the refined labels (path-compressed)
    or None."""
    lib = get_lib()
    if lib is None:
        return None
    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 16)
    dst_sorted = np.ascontiguousarray(dst_sorted, np.int32)
    w_sorted = np.ascontiguousarray(w_sorted, np.float32)
    row_off = np.ascontiguousarray(row_off, np.int64)
    comm = np.ascontiguousarray(comm, np.int32)
    refined = np.ascontiguousarray(refined, np.int32)
    n = len(row_off) - 1
    out = np.empty(n, np.int32)
    rc = lib.leiden_refine_sweep(
        _ptr(dst_sorted, ctypes.c_int32), _ptr(w_sorted, ctypes.c_float),
        len(dst_sorted), n, _ptr(row_off, ctypes.c_int64),
        _ptr(comm, ctypes.c_int32), _ptr(refined, ctypes.c_int32),
        float(theta), float(resolution),
        ctypes.c_uint64(int(seed) & (2**64 - 1)), int(n_threads),
        _ptr(out, ctypes.c_int32))
    if rc != 0:
        return None
    return out


def core_number_peel_native(row_off, adj, deg_init):
    """Exact Batagelj–Zaversnik core peeling (builder.cpp
    core_number_peel); returns core int32[n] or None."""
    lib = get_lib()
    if lib is None:
        return None
    row_off = np.ascontiguousarray(row_off, np.int64)
    adj = np.ascontiguousarray(adj, np.int32)
    deg_init = np.ascontiguousarray(deg_init, np.int64)
    n = len(row_off) - 1
    out = np.empty(n, np.int32)
    rc = lib.core_number_peel(
        _ptr(row_off, ctypes.c_int64), _ptr(adj, ctypes.c_int32), n,
        _ptr(deg_init, ctypes.c_int64), _ptr(out, ctypes.c_int32))
    if rc != 0:
        return None
    return out


def dedupe_edges_native(src, dst, w, n, mode):
    """Native duplicate-pair coalescing (builder.cpp dedupe_edges).
    mode: 0=first, 1=sum, 2=min, 3=max.  Returns (keep_idx int64[K] in
    (src, dst) key order, w_out float32[K] or None) or None."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    m = len(src)
    keep = np.empty(m, np.int64)
    wout = np.empty(m if mode else 0, np.float32)
    wptr = (np.ascontiguousarray(w, np.float32) if w is not None
            else np.empty(0, np.float32))
    cnt = lib.dedupe_edges(
        _ptr(src, ctypes.c_int32), _ptr(dst, ctypes.c_int32),
        _ptr(wptr, ctypes.c_float) if w is not None else None,
        m, int(n), int(mode), _ptr(keep, ctypes.c_int64),
        _ptr(wout, ctypes.c_float))
    if cnt < 0:
        return None
    return keep[:cnt].copy(), (wout[:cnt].copy() if mode else None)


def coarsen_edges_native(cs, cd, w, nc):
    """Native cluster-contraction aggregation (builder.cpp coarsen_edges);
    returns (src, dst, w) src-sorted aggregated arrays or None."""
    lib = get_lib()
    if lib is None:
        return None
    cs = np.ascontiguousarray(cs, np.int32)
    cd = np.ascontiguousarray(cd, np.int32)
    w = np.ascontiguousarray(w, np.float32)
    m = len(cs)
    osrc = np.empty(m, np.int32)
    odst = np.empty(m, np.int32)
    ow = np.empty(m, np.float32)
    cnt = lib.coarsen_edges(
        _ptr(cs, ctypes.c_int32), _ptr(cd, ctypes.c_int32),
        _ptr(w, ctypes.c_float), m, int(nc),
        _ptr(osrc, ctypes.c_int32), _ptr(odst, ctypes.c_int32),
        _ptr(ow, ctypes.c_float))
    if cnt < 0:
        return None
    return osrc[:cnt].copy(), odst[:cnt].copy(), ow[:cnt].copy()


def pair_probe_native(us, vs, offsets, indices, weights, weighted,
                      n_threads=None):
    """Native threaded min-degree pair-intersection probes (builder.cpp
    pair_intersection_probe); returns (count, sum_min, sum_max) or None.
    Semantics identical to prims/intersection._pair_minprobe_host's NumPy
    path (equality-tested)."""
    lib = get_lib()
    if lib is None:
        return None
    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 16)
    us = np.ascontiguousarray(us, np.int64)
    vs = np.ascontiguousarray(vs, np.int64)
    offs = np.ascontiguousarray(offsets, np.int64)
    ind = np.ascontiguousarray(indices, np.int32)
    P = len(us)
    count = np.empty(P, np.int32)
    smin = np.empty(P if weighted else 0, np.float32)
    smax = np.empty(P if weighted else 0, np.float32)
    w = (np.ascontiguousarray(weights, np.float32) if weighted
         else np.empty(0, np.float32))
    rc = lib.pair_intersection_probe(
        _ptr(us, ctypes.c_int64), _ptr(vs, ctypes.c_int64), P,
        _ptr(offs, ctypes.c_int64), _ptr(ind, ctypes.c_int32),
        _ptr(w, ctypes.c_float), int(bool(weighted)), int(n_threads),
        _ptr(count, ctypes.c_int32), _ptr(smin, ctypes.c_float),
        _ptr(smax, ctypes.c_float))
    if rc != 0:
        return None
    return count, (smin if weighted else None), (smax if weighted else None)


def spmv_plan_native(src, dst, weight, n_rows, yb_rows, src_win, dst_win,
                     tile_subs=8):
    """Native tiling for the one-hot SpMV plan (kernels/spmv_onehot).

    Returns (src_rel, dst_full, weight, xwin_blk, yblk, T) as NumPy arrays,
    or None when the native library is unavailable (caller falls back to the
    NumPy tiler, which produces identical arrays — tests/test_native.py).
    """
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.int64)
    dst = np.ascontiguousarray(dst, np.int64)
    m = len(src)
    T = lib.spmv_plan_count(_ptr(src, ctypes.c_int64), _ptr(dst, ctypes.c_int64),
                            m, n_rows, yb_rows, src_win, dst_win, tile_subs)
    if T <= 0:
        return None
    src_rel = np.empty((T * tile_subs, 128), np.int32)
    dst_full = np.empty((T * tile_subs, 128), np.int32)
    w_out = np.empty((T * tile_subs, 128), np.float32)
    xwin_blk = np.empty(T, np.int32)
    yblk = np.empty(T, np.int32)
    wp = (None if weight is None
          else np.ascontiguousarray(weight, np.float32))
    rc = lib.spmv_plan_fill(
        _ptr(src, ctypes.c_int64), _ptr(dst, ctypes.c_int64),
        _ptr(wp, ctypes.c_float) if wp is not None else None,
        m, n_rows, yb_rows, src_win, dst_win, tile_subs, T,
        _ptr(src_rel, ctypes.c_int32), _ptr(dst_full, ctypes.c_int32),
        _ptr(w_out, ctypes.c_float), _ptr(xwin_blk, ctypes.c_int32),
        _ptr(yblk, ctypes.c_int32))
    if rc != 0:
        return None
    return src_rel, dst_full, w_out, xwin_blk, yblk, int(T)


def spmv_plan_count_native(src, dst, n_rows, yb_rows, src_win, dst_win,
                           tile_subs=8):
    """Tile count only (the window-autotuner cost model's inner loop).
    Returns T (INCLUDING one padding tile per edge-less y block) or None."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.int64)
    dst = np.ascontiguousarray(dst, np.int64)
    T = lib.spmv_plan_count(_ptr(src, ctypes.c_int64),
                            _ptr(dst, ctypes.c_int64), len(src),
                            n_rows, yb_rows, src_win, dst_win, tile_subs)
    return int(T) if T > 0 else None
