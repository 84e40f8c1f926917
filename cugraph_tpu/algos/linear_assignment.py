"""Linear assignment (Hungarian) on bipartite graphs / dense cost matrices.

Reference: legacy cpp/src/linear_assignment/legacy/hungarian.cu (raft::lap,
a GPU auction/Hungarian hybrid); python/cugraph/cugraph/linear_assignment/lap.py.

TPU design: Bertsekas auction algorithm with epsilon scaling — per round every
unassigned bidder computes best/second-best values over the full cost row,
a dense [N, N] masked argmax that is pure VPU work; assignment conflicts are
resolved with segment-max (highest bid wins).  This is the canonical
parallel LAP and avoids the Hungarian algorithm's serial augmenting paths."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd


@jax.jit
def _auction_round(benefit, price, owner, eps):
    """One synchronous auction round.  benefit [N,N] (maximize), price [N],
    owner [N] (object -> bidder or -1).  Returns updated (price, owner)."""
    N = benefit.shape[0]
    # scatter True at assigned bidders; unowned objects dump into slot N
    bidder_assigned = jnp.zeros(N + 1, bool).at[
        jnp.where(owner >= 0, owner, N)].set(True)[:N]
    unassigned = ~bidder_assigned

    value = benefit - price[None, :]
    top2v, top2i = jax.lax.top_k(value, 2)
    best_obj = top2i[:, 0]
    bid_amount = price[best_obj] + (top2v[:, 0] - top2v[:, 1]) + eps

    # highest bid per object wins (segment max over bidders)
    NEG = jnp.float32(-3e38)
    bids = jnp.where(unassigned, bid_amount, NEG)
    obj = jnp.where(unassigned, best_obj, N)  # N = dump slot
    best_bid = jax.ops.segment_max(bids, obj, num_segments=N + 1)[:N]
    # winning bidder: smallest bidder index among those matching best bid
    BIGI = jnp.int32(2 ** 30)
    cand = unassigned & (bids >= jnp.take(best_bid, jnp.clip(obj, 0, N - 1)) - 0.0)
    win = jax.ops.segment_min(
        jnp.where(cand, jnp.arange(N, dtype=jnp.int32), BIGI),
        obj, num_segments=N + 1)[:N]
    has_bid = win < BIGI
    # displace previous owners
    owner = jnp.where(has_bid, win, owner)
    price = jnp.where(has_bid, best_bid, price)
    return price, owner


def _auction_solve(benefit: np.ndarray, eps_start=None, eps_final=1e-6):
    N = benefit.shape[0]
    b = jnp.asarray(benefit, jnp.float32)
    price = jnp.zeros(N, jnp.float32)
    owner = jnp.full(N, -1, jnp.int32)
    C = float(np.abs(benefit).max()) + 1.0
    eps = C / 2 if eps_start is None else eps_start
    while True:
        it = 0
        while int(jnp.sum(owner >= 0)) < N and it < 50 * N:
            price, owner = _auction_round(b, price, owner, jnp.float32(eps))
            it += 1
        if eps <= eps_final * C or eps <= 1e-9:
            break
        eps /= 4.0
        owner = jnp.full(N, -1, jnp.int32)  # re-run at finer epsilon
    owner = np.asarray(owner)
    assign = np.empty(N, np.int64)  # bidder -> object
    assign[owner] = np.arange(N)
    return assign


def dense_hungarian(costs, num_rows: int = None, num_cols: int = None,
                    epsilon=None):
    """Solve min-cost assignment on a dense cost matrix (row-major flattened
    or 2D).  Returns (total_cost, assignment array row->col).
    Reference: cugraph.dense_hungarian (hungarian.cu)."""
    C = np.asarray(costs, dtype=np.float64)
    if C.ndim == 1:
        C = C.reshape(num_rows, num_cols)
    n, m = C.shape
    N = max(n, m)
    pad = np.full((N, N), C.max() + 1.0)
    pad[:n, :m] = C
    assign = _auction_solve(-pad)  # maximize -cost
    rows = np.arange(n)
    cols = assign[:n]
    total = float(C[rows, np.minimum(cols, m - 1)].sum())
    return total, cols


def hungarian(G, workers, epsilon=None):
    """Assignment on a weighted bipartite graph: ``workers`` vertices are one
    side; returns (cost, DataFrame ['vertex','assignment']).
    Reference: python/cugraph/cugraph/linear_assignment/lap.py."""
    workers = np.asarray(workers)
    src, dst, w = G.edgelist_arrays()
    if w is None:
        raise ValueError("hungarian requires edge weights")
    wid = G.lookup_internal_vertex_id(workers)
    wset = set(wid.tolist())
    tasks = np.array(sorted(set(range(G.number_of_vertices())) - wset),
                     dtype=np.int64)
    widx = {v: i for i, v in enumerate(wid.tolist())}
    tidx = {v: i for i, v in enumerate(tasks.tolist())}
    BIG = float(np.abs(w).max()) * 10 + 1.0
    C = np.full((len(wid), len(tasks)), BIG)
    for s, d, ww in zip(src, dst, w):
        if s in widx and d in tidx:
            C[widx[s], tidx[d]] = ww
    cost, cols = dense_hungarian(C)
    assign_ext = G.number_map.to_external(tasks[np.minimum(cols, len(tasks) - 1)])
    return cost, pd.DataFrame({"vertex": workers, "assignment": assign_ext})
