"""Headline benchmark: PageRank traversed-edges/s on one chip (RMAT graph).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric definition matches the reference's TTEPS convention
(cpp/tests/traversal/mg_graph500_bfs_test.cu:757-764): edges × iterations /
device-seconds of the jitted power-iteration loop, warm cache, forced
iteration count (tol=0) so runs are comparable.  The compute path is the
Pallas one-hot MXU SpMV (cugraph_tpu/kernels/spmv_onehot.py) in split-bf16
exact-selection mode.  ``vs_baseline`` anchors against a 1.0 GTEPS nominal
single-GPU cuGraph PageRank figure (the reference publishes no absolute
numbers — BASELINE.md).

Environment hardening (the TPU sits behind a tunnel that adds seconds of
variable per-call latency and occasionally stalls or drops the backend):

* the measurement runs in a CHILD process; the parent retries up to
  ``ATTEMPTS`` times with a fresh process (= fresh TPU client) and a hard
  timeout per attempt, so one FAILED_PRECONDITION / stall cannot zero the
  round's perf record;
* the RMAT edge list and the built SpmvPlan are cached on disk
  (~/.cache/cugraph_tpu/bench) so retries and later rounds skip ~75 s of
  host-side prep;
* device time is estimated tunnel-robustly as t(2N) − t(N) over the SAME
  compiled function (iteration count is a traced argument), which cancels
  the constant dispatch + transfer overhead; the plain wall-clock t(2N)/2N
  figure is kept as a conservative fallback when the difference is noisy.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_EDGES_PER_S = 1.0e9
SCALE = 20
EDGE_FACTOR = 16
ITERS = 100          # N; timed pairs run N and 2N iterations
ATTEMPTS = 4
ATTEMPT_TIMEOUT_S = 1500
CACHE_DIR = os.path.expanduser("~/.cache/cugraph_tpu/bench")


def _edge_cache():
    from cugraph_tpu.utils.benchcache import edge_cache

    return edge_cache(SCALE, EDGE_FACTOR)


def _plan_cache(src, dst, n):
    # one owner for the cache format + planv4 version tag: benchcache.py
    from cugraph_tpu.utils.benchcache import plan_cache

    return plan_cache(src, dst, SCALE, EDGE_FACTOR, n, device_arrays=True)


def child():
    import jax
    import jax.numpy as jnp

    from cugraph_tpu.kernels.spmv_onehot import spmv_onehot

    n = 1 << SCALE
    m = n * EDGE_FACTOR
    src, dst = _edge_cache()
    plan = _plan_cache(src, dst, n)
    pad_v = plan.pad_v

    out_w = np.bincount(src, minlength=pad_v).astype(np.float32)
    inv_out = np.divide(1.0, out_w, out=np.zeros_like(out_w),
                        where=out_w > 0).astype(np.float32)
    is_dang = (np.arange(pad_v) < n) & (out_w <= 0)
    reset = np.zeros(pad_v, np.float32)
    reset[:n] = 1.0 / n

    inv_out = jnp.asarray(inv_out)
    is_dang = jnp.asarray(is_dang)
    reset_d = jnp.asarray(reset)
    alpha = jnp.float32(0.85)

    @jax.jit
    def run(iters, plan, inv_out, is_dang, reset_d):
        """Power iteration, TRACED iteration count → one compile for N and 2N.
        Returns scalars only (tiny transfer through the tunnel).  The plan
        rides as an argument — closure-captured arrays are embedded as HLO
        constants and the tunnel rejects oversized compile bodies."""

        def body(state):
            p, _, it = state
            scaled = p * inv_out
            dangling_sum = jnp.sum(jnp.where(is_dang, p, 0.0))
            pulled = spmv_onehot(plan, scaled, precision="split")
            p_new = alpha * (pulled + dangling_sum * reset_d) \
                + (1.0 - alpha) * reset_d
            p_new = jnp.where(jnp.arange(pad_v) < n, p_new, 0.0)
            err = jnp.sum(jnp.abs(p_new - p))
            return p_new, err, it + 1

        def cond(state):
            _, _, it = state
            return it < iters

        p, err, it = jax.lax.while_loop(
            cond, body, (reset_d, jnp.asarray(jnp.inf, jnp.float32),
                         jnp.asarray(0, jnp.int32)))
        return err, it, p[0]

    # warm-up / compile (both shapes identical — one executable)
    err, it, _ = run(jnp.int32(2), plan, inv_out, is_dang, reset_d)
    assert int(it) == 2
    print(f"# warm ok, err={float(err):.3e}", file=sys.stderr, flush=True)

    def timed(k):
        t0 = time.perf_counter()
        _, it, _ = jax.block_until_ready(run(jnp.int32(k), plan, inv_out, is_dang, reset_d))
        return time.perf_counter() - t0

    diffs, walls = [], []
    for _ in range(4):
        t1 = timed(ITERS)
        t2 = timed(2 * ITERS)
        diffs.append(t2 - t1)
        walls.extend([t1 / ITERS, t2 / (2 * ITERS)])
        print(f"# t({ITERS})={t1:.3f}s t({2*ITERS})={t2:.3f}s",
              file=sys.stderr, flush=True)

    per_iter_wall = min(walls)                 # includes tunnel overhead
    good = [d for d in diffs if d > 0.25 * ITERS * per_iter_wall]
    per_iter = (min(good) / ITERS) if good else per_iter_wall

    edges_per_s = m / per_iter
    print(json.dumps({
        "metric": f"pagerank_rmat{SCALE}_ef{EDGE_FACTOR}_edges_per_s",
        "value": edges_per_s,
        "unit": "edges/s",
        "vs_baseline": edges_per_s / BASELINE_EDGES_PER_S,
    }), flush=True)
    return 0


def main():
    if "--child" in sys.argv:
        return child()
    env = dict(os.environ)
    for attempt in range(1, ATTEMPTS + 1):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child"],
                capture_output=True, text=True, timeout=ATTEMPT_TIMEOUT_S,
                env=env)
        except subprocess.TimeoutExpired:
            print(f"# attempt {attempt}: timeout after {ATTEMPT_TIMEOUT_S}s",
                  file=sys.stderr, flush=True)
            continue
        line = None
        for ln in proc.stdout.splitlines():
            ln = ln.strip()
            if ln.startswith("{"):
                try:
                    # plausibility bound: one v5e chip cannot exceed ~100 G
                    # edges/s; a wedged runtime that returns instantly (seen
                    # once after a VMEM OOM) would otherwise record garbage
                    if 0 < json.loads(ln).get("value", 0) < 1e11:
                        line = ln
                except json.JSONDecodeError:
                    pass
        if proc.returncode == 0 and line:
            print(line, flush=True)
            return 0
        tail = "\n".join((proc.stderr or "").splitlines()[-15:])
        print(f"# attempt {attempt} failed rc={proc.returncode}\n{tail}",
              file=sys.stderr, flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
