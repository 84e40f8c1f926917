"""Graph500-style BFS/SSSP benchmark: K search keys, validated, TTEPS means.

Mirrors cpp/tests/traversal/mg_graph500_{bfs,sssp}_test.cu: RMAT graph, 64
random search keys with degree >= 1, one traversal per key, the parent-tree
validation after each (testing/graph500.py), and arithmetic + harmonic mean
TEPS printed at the end (`:481-487,757-764,984-987`).  --algo sssp draws
uniform (0, 1] edge weights like the sssp harness and runs the weighted
6-rule validation.

Usage:
    python benchmarks/graph500_bfs.py [--scale 18] [--keys 64] [--cpu]
                                      [--novalidate] [--reps 3]

Timing discipline (CLAUDE.md): each BFS is one jitted dispatch; through the
tunneled TPU a single wall time carries seconds of variable overhead, so the
WHOLE key sweep is repeated ``--reps`` times (consecutive timed calls always
carry different roots — identical back-to-back calls can return without
truly waiting in some tunnel states) and the per-key minimum is kept.
Results are materialized to host inside the timed region.  Per-key
wall-clock through the tunnel is still upper-bound noisy — treat TPU TTEPS
from this harness as a floor, and prefer --cpu for relative comparisons.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_batched(args, G, src, dst, w, keys, n_ext):
    """Device-rate Graph500: ALL search keys traverse simultaneously as one
    128-wide panel through the batched SpMM sweep (the multi_source_bfs /
    od_shortest_distances machinery — one masked SpMM per level for the
    whole panel), mirroring the reference's device-floor TTEPS prints
    (mg_graph500_bfs_test.cu:757-764,984-987) instead of the serial
    per-key path whose wall time is dominated by the tunnel relay.

    Timing discipline: the panel sweep is jitted with a TRACED iteration
    count and a `forced` flag that disables the convergence halt, so ONE
    compiled executable serves every call.  With L = the converged level
    count, t(2L) − t(L) over forced runs is exactly the device time of the
    full K-key traversal (constant dispatch + transfer overhead cancels;
    only a scalar checksum crosses the tunnel in the timed region).
    Per-key TEPS attribution is the equal share panel_time / K — all keys
    sweep in the same dispatches, so no per-key time exists; the aggregate
    sum(traversed)/panel_time is also printed.
    """
    from functools import partial

    import jax
    import jax.numpy as jnp

    from cugraph_tpu.algos.traversal import INT32_INF, _bfs_pred_host
    from cugraph_tpu.kernels.dispatch import use_pallas
    from cugraph_tpu.kernels.spmv_onehot import SEMIRING_BIG as BIG
    from cugraph_tpu.testing import (teps_summary, validate_bfs_tree,
                                     validate_sssp_tree)

    n = G.number_of_vertices()
    fast = use_pallas(G)
    if fast:
        if args.algo == "bfs":
            from cugraph_tpu.algos.centrality import _get_brandes_spmm_plan

            plan = _get_brandes_spmm_plan(G, "pull")
        else:
            from cugraph_tpu.kernels.spmm_onehot import get_structure_spmm_plan

            plan = get_structure_spmm_plan(G.structure)
        from cugraph_tpu.kernels.spmm_onehot import spmm_onehot

        pad_v = plan.pad_v
    else:
        plan = G.structure
        pad_v = plan.pad_v

    keys_int = G.lookup_internal_vertex_id(np.asarray(keys)).astype(np.int32)
    panel = np.full(128, -1, np.int32)
    panel[: len(keys_int)] = keys_int
    sources = jnp.asarray(panel)
    K = len(keys_int)

    @partial(jax.jit, static_argnames=("n",))
    def bfs_panel(iters, forced, plan, sources, n):
        varange = jnp.arange(pad_v)
        src1h = varange[:, None] == sources[None, :]
        real = (varange < n)[:, None]
        dist0 = jnp.where(src1h, jnp.int32(0), jnp.int32(-1))

        def body(st):
            dist, level, _ = st
            frontier = (dist == level).astype(jnp.float32)
            if fast:
                hit = spmm_onehot(plan, frontier, precision="split")
            else:
                from cugraph_tpu.prims.vertex_edge import (
                    gather_minor, segment_reduce_by_major)

                hit = segment_reduce_by_major(
                    plan.csc, gather_minor(plan.csc, frontier), "sum")
            newly = (hit > 0) & (dist == -1) & real
            return (jnp.where(newly, level + 1, dist), level + 1,
                    jnp.any(newly))

        dist, it, _ = jax.lax.while_loop(
            lambda st: (st[1] < iters) & (st[2] | forced), body,
            (dist0, jnp.int32(0), jnp.bool_(True)))
        checksum = jnp.sum(jnp.where(dist > 0, dist, 0).astype(jnp.float32))
        return dist, it, checksum

    @partial(jax.jit, static_argnames=("n",))
    def sssp_panel(iters, forced, plan, sources, n):
        varange = jnp.arange(pad_v)
        src1h = varange[:, None] == sources[None, :]
        dist0 = jnp.where(src1h, 0.0, BIG).astype(jnp.float32)

        def body(st):
            dist, it, _ = st
            if fast:
                cand = spmm_onehot(plan, dist, reduce="min", combine="add",
                                   precision="split")
            else:
                from cugraph_tpu.prims.vertex_edge import (
                    gather_minor, segment_reduce_by_major)

                val = (gather_minor(plan.csc, dist)
                       + plan.csc.weights[:, None])
                cand = segment_reduce_by_major(
                    plan.csc, jnp.minimum(val, BIG), "min")
            new = jnp.minimum(dist, cand)
            return (new, it + 1,
                    jnp.any(new < dist - 1e-6 * jnp.abs(dist)))

        dist, it, _ = jax.lax.while_loop(
            lambda st: (st[1] < iters) & (st[2] | forced), body,
            (dist0, jnp.int32(0), jnp.bool_(True)))
        checksum = jnp.sum(jnp.where(dist < BIG / 2, dist, 0.0))
        return dist, it, checksum

    run = bfs_panel if args.algo == "bfs" else sssp_panel

    # converged run (also the compile): distances + the level count L
    t0 = time.perf_counter()
    dist_d, it, cs = run(jnp.int32(1 << 20), jnp.bool_(False), plan,
                         sources, n)
    L = int(it)
    print(f"# converged in {L} sweeps ({time.perf_counter()-t0:.1f} s "
          f"incl. compile), checksum {float(cs):.6e}", file=sys.stderr,
          flush=True)
    dist = np.asarray(dist_d[:, :K])[:n]

    # t(2L) - t(L): the device time of one full panel traversal
    def timed(k):
        t0 = time.perf_counter()
        _, _, cs = run(jnp.int32(k), jnp.bool_(True), plan, sources, n)
        float(cs)  # materialize ON HOST inside the timed region
        return time.perf_counter() - t0

    diffs, walls = [], []
    for _ in range(max(args.reps, 2)):
        t1 = timed(L)
        t2 = timed(2 * L)
        diffs.append(t2 - t1)
        walls.append(t2 / 2)
        print(f"# t({L})={t1:.3f}s t({2 * L})={t2:.3f}s diff={t2 - t1:.3f}s",
              file=sys.stderr, flush=True)
    wall = min(walls)
    good = [d for d in diffs if d > 0.25 * wall]
    panel_time = min(good) if good else wall
    src_i, dst_i, _ = G.edgelist_arrays()

    # per-key validation + traversed-edge counts (external id space)
    verts = G.number_map.to_external(np.arange(n))
    n_reach = np.zeros(n_ext, bool)
    traversed = []
    for i, root in enumerate(keys):
        d_int = dist[:, i].astype(np.int64)
        if args.algo == "bfs":
            d_h = np.where(d_int < 0, INT32_INF, d_int)
            pred = _bfs_pred_host(G, d_h, np.full(n, -1, np.int64),
                                  int(keys_int[i]), n)
            d_ext, unreached = d_h.astype(np.int32), INT32_INF
        else:
            d_f = dist[:, i].astype(np.float64)
            unreached = np.float64(np.finfo(np.float32).max)
            d_ext = np.where(d_f < BIG / 2, d_f, unreached)
            # exact f64 host Dijkstra for the parent tree (see
            # run_device_serial — tolerance-matched parents 2-cycle on
            # near-zero-weight undirected edges)
            from scipy.sparse import csr_matrix
            from scipy.sparse.csgraph import dijkstra

            _, _, w_int = G.edgelist_arrays()
            if not hasattr(G, "_g500_spmat"):
                both_s = np.concatenate([src_i, dst_i])
                both_d = np.concatenate([dst_i, src_i])
                both_w = np.concatenate([w_int, w_int]).astype(np.float64)
                G._g500_spmat = csr_matrix(
                    (both_w, (both_s, both_d)), shape=(n, n))
            _, pr = dijkstra(G._g500_spmat, indices=int(keys_int[i]),
                             return_predecessors=True)
            pred = pr.astype(np.int64)
            pred[pred == -9999] = -1
            pred[keys_int[i]] = -1
        reach = d_ext < unreached
        n_reach[verts[reach]] = True
        te = int(np.count_nonzero(n_reach[src] & n_reach[dst]))
        n_reach[verts[reach]] = False
        traversed.append(max(te, 1))
        if not args.novalidate:
            from cugraph_tpu.algos._utils import unrenumber_column

            pred_ext = unrenumber_column(G, pred)
            if args.algo == "bfs":
                validate_bfs_tree(src, dst, int(root), d_ext, pred_ext,
                                  directed=False, vertices=verts)
            else:
                validate_sssp_tree(src, dst, w, int(root), d_ext, pred_ext,
                                   directed=False, vertices=verts)
            print(f"# key {i:3d} validated ({traversed[-1]} edge tuples)",
                  file=sys.stderr, flush=True)

    s = teps_summary(traversed, [panel_time / K] * K)
    s.update({
        "algo": args.algo, "scale": args.scale,
        "edgefactor": args.edgefactor, "validated": not args.novalidate,
        "batched": True, "levels": L, "panel_seconds": panel_time,
        "teps_aggregate": float(sum(traversed) / panel_time),
    })
    print(json.dumps(s))


def run_device_serial(args, G, src, dst, w, keys, n_ext):
    """Device-rate Graph500, serial-keys design: ONE jitted dispatch runs a
    fori_loop over ALL search keys, each key a dense level-sweep BFS (or
    Bellman-Ford for --algo sssp) through the one-hot SpMV kernel — the
    per-edge cost of the [pad_v] vector kernel (padding ~1.07 at RMAT-20)
    instead of the [pad_v, 128] panel SpMM whose per-edge MAC cost scales
    with the panel width (measured padding factor 28.5 at RMAT-20; see the
    --batched mode).  BFS rides precision="default": the 0/1 frontier mask
    and unit one-hot weights are bf16-EXACT (products 1·1, f32 accumulation
    of small integers), so the fast path loses nothing.  SSSP keeps the
    exact split selection (distances must meet the validator's 1e-4 rtol).

    Timing: the key count is TRACED — t(2K keys) − t(K keys) over the same
    executable (second half repeats the keys) is the device time of the
    full K-key sweep, the bench.py discipline.
    """
    from functools import partial

    import jax
    import jax.numpy as jnp

    from cugraph_tpu.algos.traversal import INT32_INF, _bfs_pred_host
    from cugraph_tpu.kernels.dispatch import get_pull_plan, use_pallas
    from cugraph_tpu.kernels.spmv_onehot import SEMIRING_BIG as BIG
    from cugraph_tpu.kernels.spmv_onehot import spmv_onehot
    from cugraph_tpu.testing import (teps_summary, validate_bfs_tree,
                                     validate_sssp_tree)

    if not use_pallas(G):
        raise SystemExit("--device needs the Pallas TPU path")
    n = G.number_of_vertices()
    plan = get_pull_plan(G)
    pad_v = plan.pad_v
    keys_int = G.lookup_internal_vertex_id(np.asarray(keys)).astype(np.int32)
    K = len(keys_int)
    keys2 = jnp.asarray(np.concatenate([keys_int, keys_int]))

    @partial(jax.jit, static_argnames=("n", "K"))
    def bfs_serial(nkeys, plan, keys2, n, K):
        varange = jnp.arange(pad_v)
        real = varange < n

        def key_body(kidx, dist_all):
            root = keys2[kidx]
            dist0 = jnp.where(varange == root, 0, -1).astype(jnp.int32)

            def body(st):
                dist, level, _ = st
                frontier = (dist == level).astype(jnp.float32)
                hit = spmv_onehot(plan, frontier, precision="default")
                newly = (hit > 0) & (dist == -1) & real
                return (jnp.where(newly, level + 1, dist), level + 1,
                        jnp.any(newly))

            dist, _, _ = jax.lax.while_loop(
                lambda st: st[2], body,
                (dist0, jnp.int32(0), jnp.bool_(True)))
            return dist_all.at[:, kidx % K].set(dist)

        dist_all = jax.lax.fori_loop(
            0, nkeys, key_body, jnp.full((pad_v, K), -1, jnp.int32))
        checksum = jnp.sum(jnp.where(dist_all > 0, dist_all, 0)
                           .astype(jnp.float32))
        return dist_all, checksum

    @partial(jax.jit, static_argnames=("n", "K"))
    def sssp_serial(nkeys, plan, keys2, n, K):
        varange = jnp.arange(pad_v)

        def key_body(kidx, dist_all):
            root = keys2[kidx]
            dist0 = jnp.where(varange == root, 0.0, BIG).astype(jnp.float32)

            def body(st):
                dist, it, _ = st
                cand = spmv_onehot(plan, dist, reduce="min", combine="add",
                                   precision="split")
                new = jnp.minimum(dist, cand)
                return (new, it + 1,
                        jnp.any(new < dist - 1e-6 * jnp.abs(dist)))

            dist, _, _ = jax.lax.while_loop(
                lambda st: st[2], body,
                (dist0, jnp.int32(0), jnp.bool_(True)))
            return dist_all.at[:, kidx % K].set(dist)

        dist_all = jax.lax.fori_loop(
            0, nkeys, key_body, jnp.full((pad_v, K), BIG, jnp.float32))
        checksum = jnp.sum(jnp.where(dist_all < BIG / 2, dist_all, 0.0))
        return dist_all, checksum

    run = bfs_serial if args.algo == "bfs" else sssp_serial

    t0 = time.perf_counter()
    dist_d, cs = run(jnp.int32(K), plan, keys2, n, K)
    print(f"# {K}-key sweep done ({time.perf_counter()-t0:.1f} s incl. "
          f"compile), checksum {float(cs):.6e}", file=sys.stderr, flush=True)

    def timed(nk):
        t0 = time.perf_counter()
        _, cs = run(jnp.int32(nk), plan, keys2, n, K)
        float(cs)
        dt = time.perf_counter() - t0
        print(f"# t({nk})={dt:.3f}s", file=sys.stderr, flush=True)
        return dt

    # no two ADJACENT dispatches may carry identical payloads (CLAUDE.md
    # tunnel trap) — the warm call ran K keys, so BFS opens with hi=2K and
    # SSSP (whose hi IS K) opens with lo=K/2.  BFS programs run 2K keys
    # fine; the (min,+) SSSP program crashes the TPU worker past ~15 s of
    # single-program execution (reproduced 3×), so SSSP differences
    # t(K) − t(K/2) instead — the timed window covers keys [lo, hi) and
    # TEPS is computed over exactly those keys.
    hi, lo = (2 * K, K) if args.algo == "bfs" else (K, K // 2)
    order = (hi, lo) if args.algo == "bfs" else (lo, hi)
    diffs, walls = [], []
    for _ in range(max(args.reps, 2)):
        ts = {nk: timed(nk) for nk in order}
        t2, t1 = ts[hi], ts[lo]
        diffs.append(t2 - t1)
        walls.append(t2 / hi)
        print(f"# diff={t2 - t1:.3f}s over keys [{lo},{hi})",
              file=sys.stderr, flush=True)
    wall = min(walls)
    good = [d for d in diffs if d > 0.25 * (hi - lo) * wall]
    window_time = min(good) if good else (hi - lo) * wall
    win_keys = sorted({k % K for k in range(lo, hi)})
    per_key_time = window_time / (hi - lo)
    dist = np.asarray(dist_d)[:n]

    src_i, dst_i, w_i = G.edgelist_arrays()
    verts = G.number_map.to_external(np.arange(n))
    n_reach = np.zeros(n_ext, bool)
    traversed = []
    for i, root in enumerate(keys):
        if args.algo == "bfs":
            d_int = dist[:, i].astype(np.int64)
            d_h = np.where(d_int < 0, INT32_INF, d_int)
            pred = _bfs_pred_host(G, d_h, np.full(n, -1, np.int64),
                                  int(keys_int[i]), n)
            d_ext, unreached = d_h.astype(np.int32), INT32_INF
        else:
            d_f = dist[:, i].astype(np.float64)
            unreached = np.float64(np.finfo(np.float32).max)
            d_ext = np.where(d_f < BIG / 2, d_f, unreached)
            # exact f64 host Dijkstra for the parent tree (acyclic by
            # construction — tolerance-matched parents form 2-cycles on
            # near-zero-weight undirected edges; same host-pred-recovery
            # convention as the BFS row's bfs_pred_from_dist engine).  The
            # device distances stay the validated payload: rule 3 holds
            # because the exact tree realizes them within the split noise.
            from scipy.sparse import csr_matrix
            from scipy.sparse.csgraph import dijkstra

            if not hasattr(G, "_g500_spmat"):
                both_s = np.concatenate([src_i, dst_i])
                both_d = np.concatenate([dst_i, src_i])
                both_w = np.concatenate([w_i, w_i]).astype(np.float64)
                G._g500_spmat = csr_matrix(
                    (both_w, (both_s, both_d)), shape=(n, n))
            _, pr = dijkstra(G._g500_spmat, indices=int(keys_int[i]),
                             return_predecessors=True)
            pred = pr.astype(np.int64)
            pred[pred == -9999] = -1
            pred[keys_int[i]] = -1
        reach = d_ext < unreached
        n_reach[verts[reach]] = True
        te = int(np.count_nonzero(n_reach[src] & n_reach[dst]))
        n_reach[verts[reach]] = False
        traversed.append(max(te, 1))
        if not args.novalidate:
            from cugraph_tpu.algos._utils import unrenumber_column

            pred_ext = unrenumber_column(G, pred)
            if args.algo == "bfs":
                validate_bfs_tree(src, dst, int(root), d_ext, pred_ext,
                                  directed=False, vertices=verts)
            else:
                validate_sssp_tree(src, dst, w, int(root), d_ext, pred_ext,
                                   directed=False, vertices=verts)
            print(f"# key {i:3d} validated ({traversed[-1]} edge tuples)",
                  file=sys.stderr, flush=True)

    te_win = [traversed[k] for k in win_keys]
    s = teps_summary(te_win, [per_key_time] * len(win_keys))
    s.update({
        "algo": args.algo, "scale": args.scale,
        "edgefactor": args.edgefactor, "validated": not args.novalidate,
        "device_serial": True, "timed_keys": len(win_keys),
        "window_seconds": window_time,
        "sweep_seconds_est": per_key_time * K,
        "teps_aggregate": float(sum(te_win) / window_time),
    })
    print(json.dumps(s))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=16)
    ap.add_argument("--edgefactor", type=int, default=16)
    ap.add_argument("--keys", type=int, default=64)
    ap.add_argument("--algo", choices=["bfs", "sssp"], default="bfs")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--novalidate", action="store_true")
    ap.add_argument("--batched", action="store_true",
                    help="all keys in ONE 128-wide panel dispatch "
                         "(device-rate TTEPS; serial is the tunnel floor)")
    ap.add_argument("--device", action="store_true",
                    help="ONE dispatch, serial keys on device (fori_loop "
                         "of SpMV level sweeps — the fastest TTEPS mode)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import cugraph_tpu
    from cugraph_tpu.testing import (teps_summary, validate_bfs_tree,
                                     validate_sssp_tree)

    n = 1 << args.scale
    m = n * args.edgefactor
    print(f"RMAT scale={args.scale} ({n} vertices, {m} edge tuples)...",
          file=sys.stderr)
    df = cugraph_tpu.generate_rmat_edgelist(scale=args.scale,
                                            num_edges=m, seed=42)
    src = df["src"].to_numpy()
    dst = df["dst"].to_numpy()
    # graph500 treats the graph as undirected; sssp draws uniform (0, 1]
    # weights (mg_graph500_sssp_test.cu generates uniform random weights)
    w = None
    G = cugraph_tpu.Graph(directed=False)
    if args.algo == "sssp":
        w = (1.0 - np.random.default_rng(11).random(len(src))).astype(
            np.float32)
        # parallel input tuples carry DISTINCT weights; for shortest paths
        # only the minimum per undirected pair is reachable, and the
        # validator checks rule 4 against every input tuple — so the graph
        # must carry the min-weight reduction (construction dedupe keeps an
        # arbitrary parallel instance otherwise)
        lo, hi = np.minimum(src, dst), np.maximum(src, dst)
        key = lo.astype(np.int64) * (1 << args.scale) + hi
        order = np.argsort(key, kind="stable")
        ks, ws = key[order], w[order]
        first = np.ones(len(ks), bool)
        first[1:] = ks[1:] != ks[:-1]
        seg = np.cumsum(first) - 1
        wmin = np.full(int(seg[-1]) + 1 if len(seg) else 0, np.inf,
                       np.float32)
        np.minimum.at(wmin, seg, ws)
        G.from_edgelist(lo[order][first], hi[order][first], wmin)
    else:
        G.from_edgelist(src, dst, w)

    # search keys: sampled among vertices with degree >= 1 (the harness
    # samples keys then rejects zero-degree ones)
    rng = np.random.default_rng(7)
    present = np.unique(np.concatenate([src, dst]))
    keys = rng.choice(present, size=min(args.keys, len(present)),
                      replace=False)

    if args.reps < 1:
        ap.error("--reps must be >= 1")

    if args.batched:
        if len(keys) > 128:
            ap.error("--batched supports up to 128 keys (one panel)")
        run_batched(args, G, src, dst, w, keys, n)
        return
    if args.device:
        run_device_serial(args, G, src, dst, w, keys, n)
        return

    # edge-tuple count per component for the TEPS numerator: graph500
    # counts input edge tuples with both endpoints in the traversed
    # component.  Sweep ALL keys per rep so consecutive timed calls carry
    # different roots (CLAUDE.md: never repeat identical timed calls).
    best = np.full(len(keys), np.inf)
    outs = [None] * len(keys)
    for rep in range(args.reps):
        for i, root in enumerate(keys):
            t0 = time.perf_counter()
            out = (cugraph_tpu.bfs(G, int(root)) if args.algo == "bfs"
                   else cugraph_tpu.sssp(G, int(root)))
            # materialize to host INSIDE the timed region
            d = out["distance"].to_numpy()
            dt = time.perf_counter() - t0
            print(f"# rep {rep} key {i:3d} {dt*1e3:9.1f} ms",
                  file=sys.stderr, flush=True)
            if dt < best[i]:
                best[i] = dt
                outs[i] = (out, d)
    times, traversed = [], []
    for i, root in enumerate(keys):
        out, d = outs[i]
        verts = out["vertex"].to_numpy()
        unreached = (2**31 - 1 if args.algo == "bfs"
                     else np.float32(np.finfo(np.float32).max))
        reach = np.zeros(n, bool)
        reach[verts[d < unreached]] = True
        te = int(np.count_nonzero(reach[src] & reach[dst]))
        times.append(best[i])
        traversed.append(max(te, 1))
        if not args.novalidate:
            if args.algo == "bfs":
                validate_bfs_tree(src, dst, int(root), d,
                                  out["predecessor"].to_numpy(),
                                  directed=False, vertices=verts)
            else:
                validate_sssp_tree(src, dst, w, int(root), d,
                                   out["predecessor"].to_numpy(),
                                   directed=False, vertices=verts)
        print(f"  key {i:3d} root={int(root):8d} "
              f"{te/best[i]/1e6:8.1f} MTEPS  ({best[i]*1e3:.1f} ms)",
              file=sys.stderr)

    s = teps_summary(traversed, times)
    s.update({"algo": args.algo, "scale": args.scale,
              "edgefactor": args.edgefactor,
              "validated": not args.novalidate})
    print(json.dumps(s))


if __name__ == "__main__":
    main()
