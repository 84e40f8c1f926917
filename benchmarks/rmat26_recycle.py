"""Multi-iteration billion-edge PageRank via PROCESS RECYCLING (RMAT-26).

Round-4 finding (docs/performance.md): the axon tunnel client keeps host
mirrors of every streamed device buffer for the PROCESS lifetime (~58 GB
per RMAT-26 iteration; jax.Array.delete() does not release them), so one
process admits exactly one streamed iteration next to the 48 GiB plan
before the host OOM-kills it.  The workaround this harness implements
(round-4 verdict directive #2): one subprocess per iteration — load the
disk-cached plan, load the checkpointed rank vector, stream ONE iteration
through the host-spill path, write the vector, exit.  Process exit is the
only thing that releases the relay's mirrors; ~30-50 min/iteration is
tunnel H2D bandwidth (22-38 MB/s for 48 GiB/iter), not a kernel limit.

Reference match: readme_pages/news.md:3-5 (trillion-edge multi-iteration
analytics), large_buffer_manager.hpp:28-60 (host-spilled buffers).

Usage:
    python benchmarks/rmat26_recycle.py [--iters 3] [--scale 26]
                                        [--child-timeout 7200]
Prints per-iteration JSON lines and a final summary row with the float64
host parity check over all completed iterations.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cugraph_tpu.utils.benchcache import CACHE_DIR, edge_cache  # noqa: E402


def _state_path(args):
    # keyed by every parameter that changes the math — a scale-only name
    # silently reused stale vectors across edgefactor/tile_subs variants
    return os.path.join(
        CACHE_DIR, f"rmat{args.scale}_ef{args.edgefactor}"
        f"_ts{args.tile_subs}_recycle_state.npz")


def _aux_path(args):
    return os.path.join(
        CACHE_DIR, f"rmat{args.scale}_ef{args.edgefactor}"
        f"_ts{args.tile_subs}_recycle_aux.npz")


def child(args):
    """ONE streamed PageRank iteration, then exit (frees relay mirrors)."""
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cugraph_tpu.kernels.spill import (build_spilled_spmv_plan,
                                           spmv_spilled)

    n = 1 << args.scale
    t0 = time.perf_counter()
    aux = np.load(_aux_path(args))
    inv_out_h, is_dang_h, reset_h = aux["inv_out"], aux["is_dang"], aux["reset"]
    pad_v = len(reset_h)
    # the plan MUST be a cache hit (a miss would re-run ~25 min of tiling
    # per child); the parent stamped the edge digest into the aux file so
    # the child never touches the 8.6 GB edge arrays.  Path + loader come
    # from benchcache — the ONE owner of the cache layout.
    from cugraph_tpu.utils.benchcache import load_plan, plan_path
    path = plan_path(args.scale, args.edgefactor, aux["digest"].item(),
                     args.tile_subs)
    if not os.path.exists(path):
        raise SystemExit(f"plan cache missing: {path}")
    full = load_plan(path)
    print(f"# plan loaded ({time.perf_counter()-t0:.0f}s)", file=sys.stderr,
          flush=True)
    splan = build_spilled_spmv_plan(
        None, None, None, n, max_chunk_bytes=args.chunk_mb << 20,
        tile_subs=args.tile_subs, full_plan=full)
    print(f"# spilled plan: {splan.num_chunks} chunks x "
          f"{splan.chunk_bytes()/2**20:.0f} MiB", file=sys.stderr, flush=True)

    sp = _state_path(args)
    if os.path.exists(sp):
        st = np.load(sp)
        p_h, it0 = st["p"].astype(np.float32), int(st["iter"])
    else:
        p_h, it0 = reset_h.astype(np.float32), 0

    alpha = jnp.float32(0.85)
    inv_out = jnp.asarray(inv_out_h)
    is_dang = jnp.asarray(is_dang_h)
    reset_d = jnp.asarray(reset_h.astype(np.float32))
    live = jnp.asarray(np.arange(pad_v) < n)

    @jax.jit
    def update(p, pulled):
        dang = jnp.sum(jnp.where(is_dang, p, 0.0))
        p_new = alpha * (pulled + dang * reset_d) + (1 - alpha) * reset_d
        return jnp.where(live, p_new, 0.0)

    p = jnp.asarray(p_h)
    t0 = time.perf_counter()
    pulled = spmv_spilled(splan, p * inv_out, precision="split")
    p = update(p, pulled)
    p_out = np.asarray(p)          # materialize ON HOST
    dt = time.perf_counter() - t0
    tmp = sp + ".tmp.npz"     # np.savez APPENDS .npz to suffix-less names
    np.savez(tmp, p=p_out, iter=it0 + 1)
    os.replace(tmp, sp)
    print(json.dumps({"iter": it0 + 1, "seconds": dt,
                      "edges_per_s": (1 << args.scale) * args.edgefactor / dt,
                      "sum": float(p_out.sum())}), flush=True)
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=26)
    ap.add_argument("--edgefactor", type=int, default=16)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--chunk-mb", type=int, default=512)
    ap.add_argument("--tile-subs", type=int, default=64)
    ap.add_argument("--child-timeout", type=int, default=7200)
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="CPU backend (smoke tests; interpret via "
                         "CUGRAPH_TPU_PALLAS_INTERPRET=1)")
    ap.add_argument("--fresh", action="store_true",
                    help="discard any previous checkpoint state")
    args = ap.parse_args()
    if args.child:
        return child(args)

    n = 1 << args.scale
    if args.fresh:
        for f in (_state_path(args), _aux_path(args)):
            if os.path.exists(f):
                os.unlink(f)

    # aux vectors once (bincount over the cached edge list)
    if not os.path.exists(_aux_path(args)):
        t0 = time.perf_counter()
        src, dst = edge_cache(args.scale, args.edgefactor)
        from cugraph_tpu.utils.benchcache import edge_digest, plan_path

        digest = edge_digest(src, dst)
        # pad_v from the cached plan scalars (cheap load of scalar keys)
        ppath = plan_path(args.scale, args.edgefactor, digest,
                          args.tile_subs)
        if not os.path.exists(ppath):
            raise SystemExit(
                f"RMAT-{args.scale} plan cache missing ({ppath}); build it "
                "first: python benchmarks/frontier_scale.py --scale "
                f"{args.scale} --spill --tile-subs {args.tile_subs} "
                "--prep-only")
        pad_v = int(np.load(ppath)["n_rows"]) * 128
        out_w = np.bincount(src, minlength=pad_v).astype(np.float32)
        inv_out = np.divide(1.0, out_w, out=np.zeros_like(out_w),
                            where=out_w > 0).astype(np.float32)
        is_dang = (np.arange(pad_v) < n) & (out_w <= 0)
        reset = np.zeros(pad_v, np.float32)
        reset[:n] = 1.0 / n
        np.savez(_aux_path(args), inv_out=inv_out, is_dang=is_dang,
                 reset=reset, digest=digest)
        del src, dst, out_w, inv_out, is_dang, reset
        print(f"# aux ready ({time.perf_counter()-t0:.0f}s)",
              file=sys.stderr, flush=True)

    done = 0
    if os.path.exists(_state_path(args)):
        done = int(np.load(_state_path(args))["iter"])
        print(f"# resuming from iteration {done}", file=sys.stderr, flush=True)
    rows = []
    while done < args.iters:
        t0 = time.perf_counter()
        cmd = [sys.executable, os.path.abspath(__file__), "--child",
               "--scale", str(args.scale),
               "--edgefactor", str(args.edgefactor),
               "--chunk-mb", str(args.chunk_mb),
               "--tile-subs", str(args.tile_subs)] \
            + (["--cpu"] if args.cpu else [])
        def _attempt():
            """(rc, json_line_or_None) — a timeout counts as a failure,
            not a parent-killing traceback (the tunnel stalls sometimes;
            the checkpoint state makes a retry safe)."""
            try:
                pr = subprocess.run(cmd, capture_output=True, text=True,
                                    timeout=args.child_timeout)
            except subprocess.TimeoutExpired as e:
                sys.stderr.write((e.stderr or "")[-2000:] + "\n")
                return -9, None
            sys.stderr.write(pr.stderr[-2000:] + "\n")
            ln_out = None          # reset per attempt: a stale row from a
            for ln in pr.stdout.splitlines():   # failed attempt must not
                if ln.strip().startswith("{"):  # masquerade as the retry's
                    ln_out = json.loads(ln)
            return pr.returncode, ln_out

        rc, line = _attempt()
        if rc != 0 or line is None:
            print(f"# child failed rc={rc} after "
                  f"{time.perf_counter()-t0:.0f}s — retrying once",
                  file=sys.stderr, flush=True)
            rc, line = _attempt()
            if rc != 0 or line is None:
                raise SystemExit("child failed twice; aborting")
        rows.append(line)
        done = line["iter"]
        print(json.dumps(line), flush=True)

    # float64 host parity over ALL completed iterations
    print("# host parity run...", file=sys.stderr, flush=True)
    from benchmarks.frontier_scale import host_pagerank

    src, dst = edge_cache(args.scale, args.edgefactor)
    st = np.load(_state_path(args))
    pv = st["p"].astype(np.float64)
    ph = host_pagerank(src, dst, n, len(pv), int(st["iter"]))
    l1 = float(np.abs(pv - ph).sum())
    m = n * args.edgefactor
    secs = [r["seconds"] for r in rows]
    print(json.dumps({
        "metric": f"pagerank_rmat{args.scale}_multi_iteration_recycled",
        "iterations_completed": int(st["iter"]),
        "seconds_per_iter_min": min(secs) if secs else None,
        "seconds_per_iter_all": secs,
        "edges_per_s_best": m / min(secs) if secs else None,
        "parity_l1": l1, "parity_ok": bool(l1 < 1e-3),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
