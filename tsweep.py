import json, os, time
import numpy as np
import jax, jax.numpy as jnp
from cugraph_tpu.kernels.spmv_onehot import build_spmv_plan, spmv_onehot

z = np.load(os.path.expanduser("~/.cache/cugraph_tpu/bench/rmat20_ef16.npz"))
src, dst = z["src"], z["dst"]
n = 1 << 20
m = len(src)
ITERS = 50

for sw, dw in ((16384, 8192), (16384, 2048), (8192, 4096), (32768, 4096)):
    t0 = time.perf_counter()
    ts = 64
    os.environ["CUGRAPH_TPU_NO_NATIVE"] = "1"
    plan = build_spmv_plan(src, dst, None, n, src_win=sw, dst_win=dw,
                           tile_subs=ts)
    build_s = time.perf_counter() - t0
    pad_v = plan.pad_v
    out_w = np.bincount(src, minlength=pad_v).astype(np.float32)
    inv_out = jnp.asarray(np.divide(1.0, out_w, out=np.zeros_like(out_w),
                                    where=out_w > 0).astype(np.float32))
    reset = np.zeros(pad_v, np.float32); reset[:n] = 1.0 / n
    reset_d = jnp.asarray(reset)
    alpha = jnp.float32(0.85)

    @jax.jit
    def run(iters, plan, inv_out, reset_d):
        def body(state):
            p, it = state
            pulled = spmv_onehot(plan, p * inv_out, precision="split")
            return alpha * pulled + (1.0 - alpha) * reset_d, it + 1
        p, it = jax.lax.while_loop(lambda s: s[1] < iters, body,
                                   (reset_d, jnp.asarray(0, jnp.int32)))
        return it, p[0]

    t0 = time.perf_counter()
    jax.block_until_ready(run(jnp.int32(2), plan, inv_out, reset_d))
    compile_s = time.perf_counter() - t0
    diffs = []
    for _ in range(3):
        t0 = time.perf_counter(); jax.block_until_ready(run(jnp.int32(ITERS), plan, inv_out, reset_d)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); jax.block_until_ready(run(jnp.int32(2*ITERS), plan, inv_out, reset_d)); t2 = time.perf_counter() - t0
        diffs.append(t2 - t1)
    per_iter = min(d for d in diffs if d > 0) / ITERS
    print(json.dumps({"sw": sw, "dw": dw, "tile_subs": ts, "tiles": plan.num_tiles,
                      "per_iter_ms": per_iter * 1e3,
                      "edges_per_s": m / per_iter,
                      "build_s": round(build_s, 1),
                      "compile_s": round(compile_s, 1)}), flush=True)
