"""Shared on-disk caches for the benchmark harnesses (bench.py + benchmarks/).

One owner for the RMAT edge-list cache and the autotuned-SpmvPlan cache so
the serialization format, the content digest, and the ``planv4`` version tag
cannot drift between scripts (CLAUDE.md: a plan FORMAT change must bump the
version tag here — stale caches silently corrupt results).

Not a public API — benchmark plumbing only.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import numpy as np

CACHE_DIR = os.path.expanduser("~/.cache/cugraph_tpu/bench")

# Bump on ANY SpmvPlan field/format change (v4: tile_subs cap 128, round 3).
PLAN_TAG = "planv4"

_PLAN_ARRAYS = ("src_rel", "dst_full", "weight", "xwin_blk", "yblk")
_PLAN_SCALARS = ("num_vertices", "n_rows", "yb_rows", "n_yblocks",
                 "num_tiles", "src_win", "dst_win", "tile_subs")


def _savez_atomic(path: str, **arrays):
    """np.savez via tmp + rename: these files run to tens of GiB in a
    host-near-OOM regime, and an interrupted write at the final keyed path
    bricks every later run with a zipfile error (np.savez appends .npz to
    suffix-less names, hence the .npz tmp suffix)."""
    tmp = f"{path}.{os.getpid()}.tmp.npz"
    try:
        np.savez(tmp, **arrays)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def edge_cache(scale: int, edgefactor: int):
    """RMAT edge list, disk-cached.  "c1" = counter-RNG generator semantics
    (native C++ / NumPy identical); versioning the file keeps pre-change
    caches from mixing with plans built for differently-generated edges."""
    os.makedirs(CACHE_DIR, exist_ok=True)
    path = os.path.join(CACHE_DIR, f"rmat{scale}_ef{edgefactor}_c1.npz")
    if os.path.exists(path):
        z = np.load(path)
        return z["src"], z["dst"]
    from cugraph_tpu.generators.rmat import _rmat_host

    n = 1 << scale
    src, dst = _rmat_host(scale, n * edgefactor, 0.57, 0.19, 0.19, 7, False)
    _savez_atomic(path, src=src, dst=dst)
    return src, dst


def edge_digest(src, dst) -> str:
    """Short content hash tying a plan cache file to the exact edge arrays
    (a sparse sample keeps it cheap at 16M+ edges)."""
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(src[::65537]).tobytes())
    h.update(np.ascontiguousarray(dst[::65537]).tobytes())
    h.update(str(len(src)).encode())
    return h.hexdigest()[:8]


def plan_path(scale: int, edgefactor: int, digest: str,
              tile_subs=None) -> str:
    """THE plan-cache filename (single owner of the layout — harnesses
    that stamp a digest and reload later, e.g. benchmarks/rmat26_recycle,
    must build paths here so a format/tag change cannot strand them)."""
    tag = "" if tile_subs is None else f"_ts{tile_subs}"
    return os.path.join(
        CACHE_DIR, f"{PLAN_TAG}_{scale}_ef{edgefactor}_{digest}{tag}.npz")


def load_plan(path: str, *, device_arrays: bool = False):
    """Load a cached SpmvPlan npz (host arrays by default)."""
    from cugraph_tpu.kernels.spmv_onehot import SpmvPlan

    z = np.load(path)
    arrs = {k: z[k] for k in _PLAN_ARRAYS}
    if device_arrays:
        import jax.numpy as jnp

        arrs = {k: jnp.asarray(v) for k, v in arrs.items()}
    return SpmvPlan(**arrs, **{k: int(z[k]) for k in _PLAN_SCALARS})


def plan_cache(src, dst, scale: int, edgefactor: int, n: int, *,
               device_arrays: bool = True, tile_subs=None):
    """Build (or load) the autotuned SpmvPlan; caching skips ~60 s of
    host-side window estimation + tiling sort per run."""
    from cugraph_tpu.kernels.spmv_onehot import build_spmv_plan, \
        estimate_windows

    os.makedirs(CACHE_DIR, exist_ok=True)   # callers may skip edge_cache
    path = plan_path(scale, edgefactor, edge_digest(src, dst), tile_subs)
    if os.path.exists(path):
        return load_plan(path, device_arrays=device_arrays)
    t0 = time.perf_counter()
    sw, dw = estimate_windows(src, dst, n)
    print(f"# windows: src={sw} dst={dw} "
          f"({time.perf_counter()-t0:.0f}s)", file=sys.stderr, flush=True)
    plan = build_spmv_plan(src, dst, None, n, src_win=sw, dst_win=dw,
                           device_arrays=False, tile_subs=tile_subs)
    print(f"# plan built in {time.perf_counter()-t0:.0f}s: "
          f"tiles={plan.num_tiles} ts={plan.tile_subs}",
          file=sys.stderr, flush=True)
    _savez_atomic(
        path, **{k: np.asarray(getattr(plan, k)) for k in _PLAN_ARRAYS},
        **{k: getattr(plan, k) for k in _PLAN_SCALARS})
    if device_arrays:
        import jax
        import jax.numpy as jnp

        plan = jax.tree_util.tree_map(jnp.asarray, plan)
    return plan
