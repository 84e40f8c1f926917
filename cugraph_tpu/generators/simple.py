"""Simple deterministic generators: path / complete / 2D+3D mesh / star,
Erdős–Rényi, bipartite RMAT helper.

Reference: cpp/src/generators/{simple_generators.cuh, erdos_renyi_generator.cuh},
cpp/include/cugraph/graph_generators.hpp:26-174.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def path_graph(n: int, base: int = 0):
    s = np.arange(base, base + n - 1)
    return pd.DataFrame({"src": s, "dst": s + 1})


def complete_graph(n: int, base: int = 0):
    i, j = np.triu_indices(n, k=1)
    return pd.DataFrame({"src": i + base, "dst": j + base})


def star_graph(n: int, center: int = 0):
    leaves = np.array([v for v in range(n) if v != center])
    return pd.DataFrame({"src": np.full(n - 1, center), "dst": leaves})


def mesh_2d_graph(rows: int, cols: int):
    v = np.arange(rows * cols).reshape(rows, cols)
    right = np.stack([v[:, :-1].ravel(), v[:, 1:].ravel()], axis=1)
    down = np.stack([v[:-1, :].ravel(), v[1:, :].ravel()], axis=1)
    e = np.concatenate([right, down])
    return pd.DataFrame({"src": e[:, 0], "dst": e[:, 1]})


def mesh_3d_graph(x: int, y: int, z: int):
    v = np.arange(x * y * z).reshape(x, y, z)
    es = []
    es.append(np.stack([v[:, :, :-1].ravel(), v[:, :, 1:].ravel()], axis=1))
    es.append(np.stack([v[:, :-1, :].ravel(), v[:, 1:, :].ravel()], axis=1))
    es.append(np.stack([v[:-1].ravel(), v[1:].ravel()], axis=1))
    e = np.concatenate(es)
    return pd.DataFrame({"src": e[:, 0], "dst": e[:, 1]})


def _sample_distinct(rng, total: int, m: int) -> np.ndarray:
    """m distinct uniform draws from [0, total) in O(m) memory.

    numpy's choice(total, replace=False) materializes a permutation of the
    whole domain — fatal for total ~ n²/2.  Oversample-and-dedupe instead
    (coupon-collector expansion keeps the loop to a couple of rounds)."""
    if m >= total:
        return np.arange(total, dtype=np.int64)
    if total <= 4 * m or total < 1 << 20:
        return rng.choice(total, size=m, replace=False).astype(np.int64)
    out = np.unique(rng.integers(0, total, int(m * 1.2) + 16, dtype=np.int64))
    while len(out) < m:
        extra = rng.integers(0, total, m, dtype=np.int64)
        out = np.unique(np.concatenate([out, extra]))
    return rng.permutation(out)[:m]


def erdos_renyi_gnp(n: int, p: float, seed: int = 42, directed: bool = False):
    """G(n, p) via per-block binomial sampling (reference
    erdos_renyi_generator.cuh samples the same way on GPU)."""
    rng = np.random.default_rng(seed)
    # sample edge count then choose distinct pairs — exact G(n,p) marginal
    if directed:
        total = n * (n - 1)
    else:
        total = n * (n - 1) // 2
    m = rng.binomial(total, p)
    picks = _sample_distinct(rng, total, m)
    if directed:
        src = picks // (n - 1)
        off = picks % (n - 1)
        dst = np.where(off >= src, off + 1, off)
    else:
        # map linear index to (i, j) upper triangle
        i = (n - 2 - np.floor(np.sqrt(-8 * picks + 4 * n * (n - 1) - 7) / 2.0
                              - 0.5)).astype(np.int64)
        j = (picks + i + 1 - n * (n - 1) // 2
             + (n - i) * ((n - i) - 1) // 2).astype(np.int64)
        src, dst = i, j
    return pd.DataFrame({"src": src, "dst": dst})


def erdos_renyi_gnm(n: int, m: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    total = n * (n - 1) // 2
    picks = _sample_distinct(rng, total, min(m, total))
    i = (n - 2 - np.floor(np.sqrt(-8 * picks + 4 * n * (n - 1) - 7) / 2.0
                          - 0.5)).astype(np.int64)
    j = (picks + i + 1 - n * (n - 1) // 2
         + (n - i) * ((n - i) - 1) // 2).astype(np.int64)
    return pd.DataFrame({"src": i, "dst": j})


def bipartite_rmat(scale_src: int, scale_dst: int, num_edges: int,
                   a: float = 0.57, b: float = 0.19, c: float = 0.19,
                   seed: int = 42):
    """Bipartite RMAT (reference graph_generators.hpp:125): sources in
    [0, 2^scale_src), destinations offset into a disjoint id range."""
    from cugraph_tpu.generators.rmat import rmat as _rmat
    s = max(scale_src, scale_dst)
    df = _rmat(s, num_edges, a, b, c, seed=seed)
    src = df["src"].to_numpy() % (2 ** scale_src)
    dst = df["dst"].to_numpy() % (2 ** scale_dst) + 2 ** scale_src
    return pd.DataFrame({"src": src, "dst": dst})
