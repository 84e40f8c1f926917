"""Algorithm benchmark suite (the reference's
benchmarks/cugraph/pytest-based/bench_algos.py:251-403 re-targeted at TPU).

Run:  python benchmarks/bench_algos.py [--scale N] [--edgefactor K] [--algos a,b]

Prints one JSON line per benchmark: {"name", "wall_s", "edges", "edges_per_s"}.
pytest-benchmark isn't vendored in this image, so this is a standalone
harness in the spirit of the reference's standalone runner
(benchmarks/cugraph/standalone/benchmark.py); it doubles as the nightly
"scale sweep" entry point.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _build_graph(scale: int, edgefactor: int):
    import cugraph_tpu as ct
    from cugraph_tpu.generators.rmat import _rmat_host

    n = 1 << scale
    m = n * edgefactor
    src, dst = _rmat_host(scale, m, 0.57, 0.19, 0.19, 42, False)
    w = np.random.default_rng(0).random(m).astype(np.float32)
    G = ct.Graph(directed=True)
    G.from_edgelist(src, dst, w, renumber=False)
    # community/similarity algorithms need the undirected view
    Gu = ct.Graph(directed=False)
    Gu.from_edgelist(src, dst, w, renumber=False)
    return G, Gu, m


def _timed(fn, warmup=1, reps=3):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _sample_pairs(G, k):
    import pandas as pd

    verts = G.nodes()
    rng = np.random.default_rng(1)
    return pd.DataFrame({"first": rng.choice(verts, k),
                         "second": rng.choice(verts, k)})


def all_benchmarks():
    import cugraph_tpu as ct

    return {
        "pagerank": lambda G: ct.pagerank(G, max_iter=30, tol=0.0,
                                          fail_on_nonconvergence=False),
        "bfs": lambda G: ct.bfs(G, 0),
        "sssp": lambda G: ct.sssp(G, 0),
        "wcc": lambda G: ct.weakly_connected_components(G),
        "katz": lambda G: ct.katz_centrality(G, max_iter=500, tol=1e-4),
        "betweenness_k128": lambda G: ct.betweenness_centrality(
            G, k=128, seed=0),
        "core_number": lambda G: ct.core_number(G),
        "triangle_count": lambda G: ct.triangle_count(G),
        "louvain": lambda G: ct.louvain(G),
        # sampled vertex pairs, like the reference bench (bench_algos.py:311
        # "algo cannot compute neighbors on all nodes without running into
        # OOM") — 10k random pairs
        "jaccard": lambda G: ct.jaccard(G, _sample_pairs(G, 10000)),
        "degrees": lambda G: G.degrees(),
        "neighbor_sample": lambda G: ct.uniform_neighbor_sample(
            G, list(range(64)), [10, 10], random_state=0),
        "random_walks": lambda G: ct.uniform_random_walks(
            G, list(range(64)), 16),
    }


HEAVY = {"triangle_count", "louvain", "jaccard", "core_number"}
# run on the undirected view (reference semantics require it)
UNDIRECTED = {"triangle_count", "louvain", "jaccard"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=16)
    ap.add_argument("--edgefactor", type=int, default=16)
    ap.add_argument("--algos", type=str, default=None,
                    help="comma-separated subset")
    ap.add_argument("--skip-heavy", action="store_true",
                    help="skip quadratic-ish benchmarks at large scale")
    args = ap.parse_args()

    t0 = time.perf_counter()
    G, Gu, m = _build_graph(args.scale, args.edgefactor)
    G.structure  # force CSR build
    create_s = time.perf_counter() - t0
    print(json.dumps({"name": "create_graph", "wall_s": create_s,
                      "edges": m, "edges_per_s": m / create_s}), flush=True)

    benches = all_benchmarks()
    selected = (args.algos.split(",") if args.algos else list(benches))
    for name in selected:
        if args.skip_heavy and name in HEAVY:
            continue
        fn = benches[name]
        Gin = Gu if name in UNDIRECTED else G
        try:
            # heavy benchmarks run once (cold+warm dominated by real work)
            t = (_timed(lambda: fn(Gin), warmup=0, reps=1)
                 if name in HEAVY else _timed(lambda: fn(Gin)))
            print(json.dumps({"name": name, "wall_s": t, "edges": m,
                              "edges_per_s": m / t}), flush=True)
        except Exception as e:  # pragma: no cover
            print(json.dumps({"name": name, "error": str(e)[:120]}), flush=True)


if __name__ == "__main__":
    main()
