"""Bulk neighbor-sampling throughput at RMAT-20 on the TPU.

BASELINE.json's metric string includes "sampling edges/s"; docs/performance
previously stopped at V=256K synthetic tables.  This measures the PUBLIC
``uniform_neighbor_sample`` bulk path (the GNN feed) end to end at RMAT-20:
F seeds × fanout hops, uniform and biased, reporting

* samples/s   — emitted (src, dst) rows per second, and
* edges/s     — frontier work scanned per second (sum of sampled-frontier
                out-degrees per hop; the reference TTEPS-style numerator).

Timing: whole-call wall clock, ``--reps`` sweeps with ROTATING seed batches
(CLAUDE.md: never repeat identical timed calls through the tunnel), min
kept.  This includes host frame assembly — it is the number a dataloader
actually sees.  Device-kernel-only numbers live in bench_randsel_tpu.py.

Usage: nohup python benchmarks/bench_sampling_rmat20.py > /tmp/samp20.log &
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from frontier_scale import edge_cache  # noqa: E402  (shared RMAT cache)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=20)
    ap.add_argument("--edgefactor", type=int, default=16)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--fanout", type=int, nargs="+", default=[10, 10])
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import cugraph_tpu as ct

    n = 1 << args.scale
    src, dst = edge_cache(args.scale, args.edgefactor)
    t0 = time.perf_counter()
    G = ct.Graph(directed=True)
    G.from_edgelist(src, dst, None, renumber=False,
                    vertices=np.arange(n))
    out_deg = np.bincount(src, minlength=n)
    print(f"# graph built in {time.perf_counter()-t0:.0f}s", file=sys.stderr,
          flush=True)

    rng = np.random.default_rng(3)
    present = np.flatnonzero(out_deg > 0)
    # one seed batch per (rep, mode) — rotating payloads
    batches = [rng.choice(present, size=args.batch, replace=False)
               for _ in range(args.reps * 2 + 2)]

    rows = []
    bi = 0
    for biased in (False, True):
        Gw = G
        if biased:
            w = (1.0 - np.random.default_rng(5).random(len(src))).astype(
                np.float32)
            Gw = ct.Graph(directed=True)
            Gw.from_edgelist(src, dst, w, renumber=False,
                             vertices=np.arange(n))
        fn = (ct.homogeneous_biased_neighbor_sample if biased
              else ct.uniform_neighbor_sample)
        # warm with a FULL-SIZE batch (padded shapes are batch-dependent;
        # a smaller warm batch would leave the timed reps recompiling)
        fn(Gw, batches[-1 - int(biased)].tolist(), args.fanout,
           random_state=1)
        best, best_stats = np.inf, None
        for rep in range(args.reps):
            seeds = batches[bi]
            bi += 1
            t0 = time.perf_counter()
            df = fn(Gw, seeds.tolist(), args.fanout, random_state=rep)
            ns = len(df)                      # materialized frame
            dt = time.perf_counter() - t0
            # edges touched: out-degrees of each hop's actual frontier
            touched = int(out_deg[np.unique(seeds)].sum())
            if "hop_id" in df:
                for h in range(len(args.fanout) - 1):
                    nxt = np.unique(
                        df[df.hop_id == h]["destinations"].to_numpy())
                    touched += int(out_deg[nxt[nxt < n]].sum())
            print(f"# biased={biased} rep={rep}: {dt:.2f}s "
                  f"{ns} samples, {touched} edges touched",
                  file=sys.stderr, flush=True)
            if dt < best:
                best, best_stats = dt, (ns, touched)
        ns, touched = best_stats
        rows.append({
            "mode": "biased" if biased else "uniform",
            "scale": args.scale, "batch": args.batch,
            "fanout": args.fanout, "wall_s": best,
            "samples_per_s": ns / best,
            "edges_touched_per_s": touched / best,
        })
    print(json.dumps(rows))


if __name__ == "__main__":
    sys.exit(main())
