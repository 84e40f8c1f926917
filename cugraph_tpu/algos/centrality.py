"""Centrality: Katz, eigenvector, degree, betweenness (+ edge betweenness).

Reference: cpp/src/centrality/{katz_centrality_impl.cuh:32-187,
eigenvector_centrality_impl.cuh:161, betweenness_centrality_impl.cuh:1636}
and python/cugraph/cugraph/centrality/.

TPU design: Katz/eigenvector are pull-SpMV power iterations fully on-device
(lax.while_loop).  Betweenness is multi-source Brandes with *dense*
level-synchronous forward sigma accumulation and backward dependency sweeps —
the frontier is a distance array, not a compressed worklist, which trades
O(E) work per level for static shapes (the right trade on TPU; see
prims/frontier.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from cugraph_tpu.algos._utils import vertex_frame, normalize_start
from cugraph_tpu.api.exceptions import FailedToConvergeError
from cugraph_tpu.core.structure import GraphStructure
from cugraph_tpu.prims.vertex_edge import (
    spmv_pull,
    segment_reduce_by_major,
    gather_minor,
    gather_major,
)


# --------------------------------------------------------------------------
# Katz
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("max_iter", "normalized"))
def _katz_kernel(g: GraphStructure, alpha, beta, tol, x0, max_iter: int,
                 normalized: bool):
    n = g.num_vertices
    real = jnp.arange(g.pad_v) < n

    def step(state):
        x, _, it = state
        x_new = alpha * spmv_pull(g, x) + beta
        x_new = jnp.where(real, x_new, 0.0)
        err = jnp.sum(jnp.abs(x_new - x))
        return x_new, err, it + 1

    def cond(state):
        _, err, it = state
        return (err >= tol) & (it < max_iter)

    x, err, iters = jax.lax.while_loop(
        cond, step, (x0, jnp.asarray(jnp.inf, jnp.float32), jnp.asarray(0, jnp.int32))
    )
    if normalized:
        norm = jnp.sqrt(jnp.sum(jnp.where(real, x * x, 0.0)))
        x = x / jnp.maximum(norm, 1e-30)
    return x, err, iters


@partial(jax.jit, static_argnames=("max_iter", "normalized", "n", "prec"))
def _katz_kernel_pallas(plan, alpha, beta, tol, x0, max_iter: int,
                        normalized: bool, n: int, prec: str = "split"):
    """Katz power iteration over the one-hot MXU SpMV (TPU fast path)."""
    from cugraph_tpu.kernels.spmv_onehot import spmv_onehot

    real = jnp.arange(x0.shape[0]) < n

    def step(state):
        x, _, it = state
        x_new = alpha * spmv_onehot(plan, x, precision=prec) + beta
        x_new = jnp.where(real, x_new, 0.0)
        err = jnp.sum(jnp.abs(x_new - x))
        return x_new, err, it + 1

    def cond(state):
        _, err, it = state
        return (err >= tol) & (it < max_iter)

    x, err, iters = jax.lax.while_loop(
        cond, step, (x0, jnp.asarray(jnp.inf, jnp.float32), jnp.asarray(0, jnp.int32))
    )
    if normalized:
        norm = jnp.sqrt(jnp.sum(jnp.where(real, x * x, 0.0)))
        x = x / jnp.maximum(norm, 1e-30)
    return x, err, iters


def katz_centrality(G, alpha=None, beta: float = 1.0, max_iter: int = 100,
                    tol: float = 1.0e-6, nstart=None, normalized: bool = True,
                    precision: str = "exact"):
    """Katz centrality (reference katz_centrality_impl.cuh:32-187).
    Returns DataFrame ['vertex', 'katz_centrality'].
    ``precision``: "exact" (default) or "fast" bf16 kernels (Pallas path
    only; see pagerank)."""
    from cugraph_tpu.algos.link_analysis import _kernel_precision

    _kernel_precision(precision)   # validate even on the XLA path
    g = G.structure
    n = G.number_of_vertices()
    if alpha is None:
        dmax = int(np.max(np.asarray(g.in_degrees())[:n])) if n else 1
        alpha = 1.0 / (dmax + 1)
    from cugraph_tpu.kernels.dispatch import get_pull_plan, use_pallas

    fast = use_pallas(G)
    pad = get_pull_plan(G).pad_v if fast else g.pad_v
    x0 = np.zeros(pad, dtype=np.float32)
    if nstart is not None:
        ids = G.lookup_internal_vertex_id(nstart["vertex"].to_numpy())
        x0[ids] = nstart["values"].to_numpy()
    # scalar beta, or a per-vertex beta vector (the reference's `betas`,
    # katz_centrality.pyx) padded to the kernel shape
    if np.ndim(beta) == 0:
        beta_dev = jnp.float32(beta)
    else:
        bv = np.zeros(pad, np.float32)
        bv[: len(np.asarray(beta))] = np.asarray(beta, np.float32)
        beta_dev = jnp.asarray(bv)
    # convergence threshold follows the reference: L1 diff < n * tol
    if fast:
        x, err, iters = _katz_kernel_pallas(
            get_pull_plan(G), jnp.float32(alpha), beta_dev,
            jnp.float32(n * tol), jnp.asarray(x0), int(max_iter), normalized,
            n, _kernel_precision(precision))
    else:
        x, err, iters = _katz_kernel(g, jnp.float32(alpha), beta_dev,
                                     jnp.float32(n * tol), jnp.asarray(x0),
                                     int(max_iter), normalized)
    if not bool(err < n * tol):
        raise FailedToConvergeError(f"katz failed to converge in {max_iter} iters")
    return vertex_frame(G, {"katz_centrality": np.asarray(x)})


# --------------------------------------------------------------------------
# Eigenvector
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("max_iter",))
def _eigenvector_kernel(g: GraphStructure, tol, x0, max_iter: int):
    n = g.num_vertices
    real = jnp.arange(g.pad_v) < n

    def step(state):
        x, _, it = state
        y = spmv_pull(g, x)
        y = y + x  # reference adds the previous vector (shifted iteration)
        y = jnp.where(real, y, 0.0)
        norm = jnp.sqrt(jnp.sum(y * y))
        y = y / jnp.maximum(norm, 1e-30)
        err = jnp.sum(jnp.abs(y - x))
        return y, err, it + 1

    def cond(state):
        _, err, it = state
        return (err >= tol) & (it < max_iter)

    return jax.lax.while_loop(
        cond, step, (x0, jnp.asarray(jnp.inf, jnp.float32), jnp.asarray(0, jnp.int32))
    )


@partial(jax.jit, static_argnames=("max_iter", "n", "prec"))
def _eigenvector_kernel_pallas(plan, tol, x0, max_iter: int, n: int,
                               prec: str = "split"):
    from cugraph_tpu.kernels.spmv_onehot import spmv_onehot

    real = jnp.arange(x0.shape[0]) < n

    def step(state):
        x, _, it = state
        y = spmv_onehot(plan, x, precision=prec) + x  # shifted iteration
        y = jnp.where(real, y, 0.0)
        norm = jnp.sqrt(jnp.sum(y * y))
        y = y / jnp.maximum(norm, 1e-30)
        err = jnp.sum(jnp.abs(y - x))
        return y, err, it + 1

    def cond(state):
        _, err, it = state
        return (err >= tol) & (it < max_iter)

    return jax.lax.while_loop(
        cond, step, (x0, jnp.asarray(jnp.inf, jnp.float32), jnp.asarray(0, jnp.int32))
    )


def eigenvector_centrality(G, max_iter: int = 100, tol: float = 1.0e-6,
                           precision: str = "exact"):
    """Eigenvector centrality (reference eigenvector_centrality_impl.cuh:161);
    matches networkx (L2-normalized principal eigenvector, pull direction).
    ``precision``: "exact" (default) or "fast" (Pallas path; see pagerank)."""
    from cugraph_tpu.algos.link_analysis import _kernel_precision
    from cugraph_tpu.kernels.dispatch import get_pull_plan, use_pallas

    _kernel_precision(precision)   # validate even on the XLA path
    n = G.number_of_vertices()
    fast = use_pallas(G)
    if fast:
        plan = get_pull_plan(G)
        x0 = np.zeros(plan.pad_v, dtype=np.float32)
        x0[:n] = 1.0 / np.sqrt(n)
        x, err, iters = _eigenvector_kernel_pallas(
            plan, jnp.float32(n * tol), jnp.asarray(x0), int(max_iter), n,
            _kernel_precision(precision))
    else:
        g = G.structure
        x0 = np.zeros(g.pad_v, dtype=np.float32)
        x0[:n] = 1.0 / np.sqrt(n)
        x, err, iters = _eigenvector_kernel(g, jnp.float32(n * tol), jnp.asarray(x0),
                                            int(max_iter))
    if not bool(err < n * tol):
        raise FailedToConvergeError(f"eigenvector failed to converge in {max_iter} iters")
    return vertex_frame(G, {"eigenvector_centrality": np.asarray(x)})


# --------------------------------------------------------------------------
# Degree centrality (python-only in the reference too)
# --------------------------------------------------------------------------

def degree_centrality(G, normalized: bool = True):
    df = G.degree()
    n = G.number_of_vertices()
    vals = df["degree"].to_numpy().astype(np.float64)
    if normalized and n > 1:
        vals = vals / (n - 1)
    import pandas as pd
    return pd.DataFrame({"vertex": df["vertex"], "degree_centrality": vals})


# --------------------------------------------------------------------------
# Betweenness centrality (multi-source Brandes)
# --------------------------------------------------------------------------

# --------------------------------------------------------------------------
# Batched multi-source Brandes — the TPU-native design.
#
# The reference's betweenness engine is a "multi-source" Brandes only in the
# sense of looping sources through frontier kernels
# (betweenness_centrality_impl.cuh:1636).  Here a batch of B=128 sources runs
# SIMULTANEOUSLY as [pad_v, 128] sigma/delta panels: each forward level and
# each backward level is ONE masked SpMM (features = sources on the MXU lane
# axis), so the per-source per-edge cost drops from a scalarized gather
# (~0.12 G elem/s on this TPU) to amortized MXU matmul work.
# --------------------------------------------------------------------------

_BRANDES_BATCH = 128  # sources per sweep = one MXU lane width


def _brandes_sweep_batched(spmm_pull, spmm_push, pad_v: int, n: int,
                           sources: jax.Array, csr=None,
                           endpoints: bool = False):
    """Forward sigma + backward delta for a batch of sources.

    ``sources``: int32 [B] internal ids, -1 = padding column (contributes 0).
    ``spmm_pull(x)``: [pad_v, B] -> [pad_v, B], y[d] = sum over in-edges of
    x[s]; ``spmm_push`` the transpose.  Returns (vertex delta summed over the
    batch [pad_v] f32, edge dependency [pad_e] f32 in ``csr`` edge order or
    None).  Edge accumulation rides ROW gathers of the [pad_v, B] panels
    (jnp.take along axis 0 — the one gather shape this TPU runs at bandwidth;
    see docs/performance.md), not element gathers.

    ``endpoints=True`` adds the path-endpoint contributions (reference
    betweenness_centrality_impl.cuh:1225-1303 / networkx
    _accumulate_endpoints): per source s, bc[s] += |reachable from s|−1 and
    every reached w≠s gets +1 on top of its dependency.
    """
    B = sources.shape[0]
    varange = jnp.arange(pad_v)
    src1h = varange[:, None] == sources[None, :]          # [pad_v, B]
    real = (varange < n)[:, None]
    NEG = jnp.int32(-1)
    dist0 = jnp.where(src1h, jnp.int32(0), NEG)
    sigma0 = jnp.where(src1h, 1.0, 0.0).astype(jnp.float32)

    def fwd_body(state):
        dist, sigma, level, _ = state
        masked = jnp.where(dist == level, sigma, 0.0)
        sig_in = spmm_pull(masked)
        newly = (dist == NEG) & real & (sig_in > 0)
        dist = jnp.where(newly, level + 1, dist)
        sigma = sigma + jnp.where(newly, sig_in, 0.0)
        return dist, sigma, level + 1, jnp.any(newly)

    dist, sigma, max_level, _ = jax.lax.while_loop(
        lambda st: st[3] & (st[2] < n), fwd_body,
        (dist0, sigma0, jnp.int32(0), jnp.bool_(True)))

    def _rows(x, rows):
        if x.shape[0] < rows:
            return jnp.pad(x, ((0, rows - x.shape[0]), (0, 0)))
        return x[:rows]

    def bwd_body(state):
        delta, edep, level = state
        # y[w] = (1+delta[w])/sigma[w] on the level+1 ring; s[u] = sum of y
        # over u's out-neighbors; tree-edge test (du==l & dw==l+1) factors
        # into the two masks because non-tree terms are zeroed by either side.
        y = jnp.where(dist == level + 1,
                      (1.0 + delta) / jnp.maximum(sigma, 1e-30), 0.0)
        s = spmm_push(y)
        a = jnp.where(dist == level, sigma, 0.0)
        delta = delta + a * s
        if csr is not None:
            # per-edge dep = a[src] · y[dst] summed over the batch: two row
            # gathers + one lane reduce (su·(1+δw)/σw on tree edges)
            au = jnp.take(_rows(a, csr.pad_v), csr.majors, axis=0)
            yw = jnp.take(_rows(y, csr.pad_v), csr.indices, axis=0)
            edep = edep + jnp.sum(au * yw, axis=1)
        return delta, edep, level - 1

    edep0 = (jnp.zeros((0,), jnp.float32) if csr is None
             else jnp.zeros((csr.pad_e,), jnp.float32))
    delta, edep, _ = jax.lax.while_loop(
        lambda st: st[2] >= 0, bwd_body,
        (jnp.zeros((pad_v, B), jnp.float32), edep0, max_level - 1))
    delta = jnp.where(src1h, 0.0, delta)
    if endpoints:
        # reached (excluding the source itself; padding columns have
        # dist == -1 everywhere, so they contribute nothing)
        reached = (dist >= 0) & real & jnp.logical_not(src1h)
        per_src = jnp.sum(reached.astype(jnp.float32), axis=0)      # [B]
        delta = delta + reached + jnp.where(src1h, per_src[None, :], 0.0)
    return jnp.sum(delta, axis=1), (edep if csr is not None else None)


@partial(jax.jit, static_argnames=("n", "edges", "endpoints"))
def _brandes_batch_xla(g: GraphStructure, sources: jax.Array, n: int,
                       edges: bool = False, endpoints: bool = False):
    """Batched Brandes on the XLA path ([pad_v, B] gathers/segment sums)."""

    def pull(x):
        return segment_reduce_by_major(g.csc, gather_minor(g.csc, x), "sum")

    def push(x):
        return segment_reduce_by_major(g.csr, gather_minor(g.csr, x), "sum")

    return _brandes_sweep_batched(pull, push, g.pad_v, n, sources,
                                  csr=g.csr if edges else None,
                                  endpoints=endpoints)


@partial(jax.jit, static_argnames=("n", "edges", "endpoints"))
def _brandes_batch_pallas(pull_plan, push_plan, g: GraphStructure,
                          sources: jax.Array, n: int, edges: bool = False,
                          endpoints: bool = False):
    """Batched Brandes through the one-hot SpMM kernel (unit weights are
    bf16-exact, so split precision gives ~2^-16-relative sigma sums)."""
    from cugraph_tpu.kernels.spmm_onehot import _fit_rows, spmm_onehot

    P = max(pull_plan.pad_v, push_plan.pad_v)

    def pull(x):
        y = spmm_onehot(pull_plan, _fit_rows(x, pull_plan.pad_v),
                        precision="split")
        return _fit_rows(y, P)

    def push(x):
        y = spmm_onehot(push_plan, _fit_rows(x, push_plan.pad_v),
                        precision="split")
        return _fit_rows(y, P)

    return _brandes_sweep_batched(pull, push, P, n, sources,
                                  csr=g.csr if edges else None,
                                  endpoints=endpoints)


def _get_brandes_spmm_plan(G, orientation: str):
    """Cached UNWEIGHTED SpMM plan for one orientation ("pull"/"push") —
    Brandes counts paths, so edge weights must not enter the sigma sums.
    Built lazily per orientation: multi_source_bfs and unweighted OD
    matrices only ever need the pull plan."""
    cache = getattr(G, "_spmm_plans_brandes", None)
    if not isinstance(cache, dict):
        cache = {}
        G._spmm_plans_brandes = cache
    plan = cache.get(orientation)
    if plan is None:
        from cugraph_tpu.kernels.spmm_onehot import build_spmm_plan

        src, dst, _ = G.edgelist_arrays()
        n = G.number_of_vertices()
        if orientation == "push":
            src, dst = dst, src
        plan = build_spmm_plan(src, dst, None, n)
        cache[orientation] = plan
    return plan


def _get_brandes_spmm_plans(G):
    """(pull, push) plan pair for the full Brandes forward/backward sweep."""
    return (_get_brandes_spmm_plan(G, "pull"),
            _get_brandes_spmm_plan(G, "push"))


def _bc_batched(G, sources_internal: np.ndarray, edges: bool = False,
                endpoints: bool = False):
    """Accumulate (vertex, edge) betweenness over sources in batches of 128.
    Returns (bc [>=n], edge_dep [pad_e] csr-order or None)."""
    from cugraph_tpu.kernels.dispatch import use_pallas

    n = G.number_of_vertices()
    g = G.structure
    fast = use_pallas(G)
    if fast:
        pull_plan, push_plan = _get_brandes_spmm_plans(G)
        pad_v = max(pull_plan.pad_v, push_plan.pad_v)
    else:
        pad_v = g.pad_v
    bc = jnp.zeros(pad_v, dtype=jnp.float32)
    ebc = jnp.zeros(g.csr.pad_e, dtype=jnp.float32) if edges else None
    from cugraph_tpu.algos._utils import source_panels

    for chunk, _, _ in source_panels(sources_internal, _BRANDES_BATCH):
        if fast:
            d, ed = _brandes_batch_pallas(pull_plan, push_plan, g,
                                          jnp.asarray(chunk), n, edges,
                                          endpoints)
        else:
            d, ed = _brandes_batch_xla(g, jnp.asarray(chunk), n, edges,
                                       endpoints)
        bc = bc + d
        if edges:
            ebc = ebc + ed
    return np.asarray(bc), (np.asarray(ebc) if edges else None)


def _bc_scale(G, k, normalized, n, endpoints=False):
    directed = G.is_directed()
    if normalized:
        # raw accumulation counts each unordered pair twice for undirected
        # graphs (all sources), which is exactly the networkx/cuGraph
        # convention, so no extra undirected factor here.  With endpoints the
        # pair count includes the endpoints themselves: 1/(n(n−1))
        # (networkx _rescale; betweenness_centrality_impl.cuh:1225-1303).
        if endpoints:
            scale = 1.0 / (n * (n - 1)) if n > 1 else 1.0
        else:
            scale = 1.0 / ((n - 1) * (n - 2)) if n > 2 else 1.0
    else:
        scale = 1.0 if directed else 0.5
    if k is not None and k < n:
        scale *= n / k
    return scale


def betweenness_centrality(G, k=None, normalized: bool = True, weight=None,
                           endpoints: bool = False, seed=None, random_state=None):
    """Vertex betweenness (reference betweenness_centrality_impl.cuh:1636).
    ``k``: number of random source samples (None = exact, all sources)."""
    if weight is not None:
        raise NotImplementedError("weighted betweenness not yet supported")
    n = G.number_of_vertices()
    if k is None:
        sources = np.arange(n, dtype=np.int32)
    elif np.isscalar(k):
        rng = np.random.default_rng(seed if seed is not None else random_state)
        sources = rng.choice(n, size=int(k), replace=False).astype(np.int32)
    else:
        sources = normalize_start(G, k)
    bc, _ = _bc_batched(G, sources, endpoints=endpoints)
    # list-form k gets the same n/|sources| extrapolation as scalar k
    nsrc = len(sources) if (k is not None and len(sources) < n) else None
    scale = _bc_scale(G, nsrc, normalized, n, endpoints=endpoints)
    return vertex_frame(G, {"betweenness_centrality": bc * scale})


def edge_betweenness_centrality(G, k=None, normalized: bool = True, weight=None,
                                seed=None):
    """Edge betweenness (reference betweenness_centrality_impl.cuh:1649).
    Returns ['src', 'dst', 'betweenness_centrality']."""
    if weight is not None:
        raise NotImplementedError("weighted edge betweenness not yet supported")
    n = G.number_of_vertices()
    if k is None:
        sources = np.arange(n, dtype=np.int32)
    elif np.isscalar(k):
        rng = np.random.default_rng(seed)
        sources = rng.choice(n, size=int(k), replace=False).astype(np.int32)
    else:
        # list-form k = explicit source vertices (reference accepts both)
        sources = normalize_start(G, k)
    _, ebc = _bc_batched(G, sources, edges=True)
    g = G.structure
    E = g.num_edges

    if normalized:
        scale = 1.0 / (n * (n - 1)) if n > 1 else 1.0
        if not G.is_directed():
            scale *= 2.0
    else:
        # undirected double-counting is handled by the /2 after the groupby
        # below — no extra 0.5 here (it would halve the nx value twice)
        scale = 1.0
    if k is not None and not np.isscalar(k):
        k = len(np.asarray(k).reshape(-1))
    if k is not None and k < n:
        scale *= n / len(sources)

    src = np.asarray(g.csr.majors)[:E]
    dst = np.asarray(g.csr.indices)[:E]
    vals = ebc[:E] * scale
    import pandas as pd
    df = pd.DataFrame({
        "src": G.number_map.to_external(src),
        "dst": G.number_map.to_external(dst),
        "betweenness_centrality": vals,
    })
    if not G.is_directed():
        # report each undirected edge once with summed halves, like the reference
        lo = np.minimum(df["src"].to_numpy(), df["dst"].to_numpy())
        hi = np.maximum(df["src"].to_numpy(), df["dst"].to_numpy())
        df = pd.DataFrame({"src": lo, "dst": hi,
                           "betweenness_centrality": vals})
        df = df.groupby(["src", "dst"], as_index=False).sum()
        df["betweenness_centrality"] /= 2.0
    return df
