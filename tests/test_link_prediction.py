"""Similarity coefficients vs NetworkX."""

import networkx as nx
import numpy as np
import pandas as pd

import cugraph_tpu as ctpu
from tests.utils import karate, random_undirected


def _nx_pairs(Gnx):
    return list(Gnx.edges())


def test_jaccard_edges():
    G, Gnx = karate()
    df = ctpu.jaccard(G)
    ref = {(min(u, v), max(u, v)): c
           for u, v, c in nx.jaccard_coefficient(Gnx, _nx_pairs(Gnx))}
    got = {(min(a, b), max(a, b)): c
           for a, b, c in zip(df["first"], df["second"], df["jaccard_coeff"])}
    assert set(got) == set(ref)
    assert max(abs(got[k] - ref[k]) for k in ref) < 1e-6


def test_jaccard_explicit_pairs():
    G, Gnx = karate()
    pairs = [(0, 33), (1, 2), (5, 16)]
    vp = pd.DataFrame({"first": [p[0] for p in pairs],
                       "second": [p[1] for p in pairs]})
    df = ctpu.jaccard(G, vp)
    ref = {(u, v): c for u, v, c in nx.jaccard_coefficient(Gnx, pairs)}
    for a, b, c in zip(df["first"], df["second"], df["jaccard_coeff"]):
        assert abs(ref[(a, b)] - c) < 1e-6


def _manual_coeff(Gnx, u, v, kind):
    nu, nv = set(Gnx[u]), set(Gnx[v])
    inter = len(nu & nv)
    if kind == "sorensen":
        return 2 * inter / (len(nu) + len(nv)) if (nu or nv) else 0
    if kind == "overlap":
        return inter / min(len(nu), len(nv)) if (nu and nv) else 0
    if kind == "cosine":
        return inter / np.sqrt(len(nu) * len(nv)) if (nu and nv) else 0


def test_sorensen_overlap_cosine():
    G, Gnx = random_undirected(n=50, m=200, seed=2)
    for kind, fn in [("sorensen", ctpu.sorensen), ("overlap", ctpu.overlap),
                     ("cosine", ctpu.cosine)]:
        df = fn(G)
        for a, b, c in zip(df["first"], df["second"], df[f"{kind}_coeff"]):
            assert abs(_manual_coeff(Gnx, a, b, kind) - c) < 1e-6, (kind, a, b)


def test_weighted_jaccard():
    G, Gnx = karate(weighted=True)
    df = ctpu.jaccard(G, use_weight=True)
    # manual weighted jaccard on one pair
    row = df.iloc[0]
    u, v = row["first"], row["second"]
    wu = {x: Gnx[u][x]["weight"] for x in Gnx[u]}
    wv = {x: Gnx[v][x]["weight"] for x in Gnx[v]}
    inter = sum(min(wu[x], wv[x]) for x in set(wu) & set(wv))
    union = sum(wu.values()) + sum(wv.values()) - inter
    assert abs(row["jaccard_coeff"] - inter / union) < 1e-5


def test_all_pairs_topk():
    G, Gnx = karate()
    df = ctpu.all_pairs_jaccard(G, topk=5)
    assert len(df) == 5
    # values must be sorted descending and correct
    vals = df["jaccard_coeff"].to_numpy()
    assert (np.diff(vals) <= 1e-9).all()
    for a, b, c in zip(df["first"], df["second"], df["jaccard_coeff"]):
        ref = list(nx.jaccard_coefficient(Gnx, [(a, b)]))[0][2]
        assert abs(ref - c) < 1e-6


# ---------------------------------------------------------------------------
# sorted fast path ≡ binary-search path (round 3: TPU intersection kernel)
# ---------------------------------------------------------------------------

def test_pair_intersection_sorted_matches_binsearch():
    import jax.numpy as jnp
    from cugraph_tpu.core.structure import build_structure_host
    from cugraph_tpu.prims.intersection import (
        pair_intersection, pair_intersection_sorted)

    rng = np.random.default_rng(17)
    n, m = 300, 2400
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    # simple graph: coalesce parallel edges (the fast-path precondition,
    # same as the reference's similarity remove_multi_edges requirement)
    pairs = np.unique(np.stack([src[keep], dst[keep]], 1), axis=0)
    src, dst = pairs[:, 0], pairs[:, 1]
    w = rng.uniform(0.5, 2.0, len(src)).astype(np.float32)
    g = build_structure_host(src, dst, w, n)

    P = 500
    us = jnp.asarray(rng.integers(0, n, P).astype(np.int32))
    vs = jnp.asarray(rng.integers(0, n, P).astype(np.int32))
    max_deg = int(np.asarray(g.out_degrees())[:n].max())

    for weighted in (False, True):
        ref = pair_intersection(g, us, vs, max_deg=max_deg, weighted=weighted)
        fast = pair_intersection_sorted(g, us, vs, weighted=weighted)
        for key in ref:
            np.testing.assert_allclose(
                np.asarray(fast[key]), np.asarray(ref[key]),
                rtol=1e-5, atol=1e-5, err_msg=f"{key} weighted={weighted}")


def test_pair_intersection_sorted_self_and_disjoint():
    import jax.numpy as jnp
    from cugraph_tpu.core.structure import build_structure_host
    from cugraph_tpu.prims.intersection import pair_intersection_sorted

    # star + disjoint edge: N(0)={1,2,3}, N(1)={0}, N(4)={5}
    src = np.array([0, 0, 0, 1, 4])
    dst = np.array([1, 2, 3, 0, 5])
    g = build_structure_host(src, dst, None, 6)
    us = jnp.asarray(np.array([0, 0, 1], np.int32))
    vs = jnp.asarray(np.array([0, 4, 4], np.int32))
    out = pair_intersection_sorted(g, us, vs)
    np.testing.assert_array_equal(np.asarray(out["count"]), [3, 0, 0])
    np.testing.assert_array_equal(np.asarray(out["deg_u"]), [3, 3, 1])
    np.testing.assert_array_equal(np.asarray(out["deg_v"]), [3, 1, 1])


def test_pair_intersection_bucketed_matches_binsearch(monkeypatch):
    """Degree-bucketed compact-table path (hub-scale fallback) ≡ binary
    search, weighted and not — including a hub vertex that forces multiple
    degree buckets, and the tiny-budget auto dispatch."""
    import jax.numpy as jnp
    from cugraph_tpu.core.structure import build_structure_host
    from cugraph_tpu.prims.intersection import (
        pair_intersection, pair_intersection_auto, pair_intersection_bucketed)

    rng = np.random.default_rng(23)
    n, m = 400, 3000
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    # hub: vertex 0 connects to many vertices
    src = np.concatenate([src, np.zeros(300, np.int64)])
    dst = np.concatenate([dst, rng.integers(1, n, 300)])
    keep = src != dst
    pairs = np.unique(np.stack([src[keep], dst[keep]], 1), axis=0)
    src, dst = pairs[:, 0], pairs[:, 1]
    w = rng.uniform(0.5, 2.0, len(src)).astype(np.float32)
    g = build_structure_host(src, dst, w, n)

    P = 700
    us = rng.integers(0, n, P).astype(np.int64)
    us[:50] = 0  # hub pairs land in a big-degree bucket
    vs = rng.integers(0, n, P).astype(np.int64)
    max_deg = int(np.asarray(g.out_degrees())[:n].max())

    # force the DEVICE compact-table buckets (native probes otherwise take
    # every pair) so that path keeps equivalence coverage
    monkeypatch.setenv("CUGRAPH_TPU_ISECT_HOST_DEG", "1000000")
    for weighted in (False, True):
        ref = pair_intersection(g, jnp.asarray(us), jnp.asarray(vs),
                                max_deg=max_deg, weighted=weighted)
        fast = pair_intersection_bucketed(g, us, vs, weighted=weighted)
        for key in ref:
            np.testing.assert_allclose(
                np.asarray(fast[key]), np.asarray(ref[key]),
                rtol=1e-5, atol=1e-5, err_msg=f"{key} weighted={weighted}")
    monkeypatch.delenv("CUGRAPH_TPU_ISECT_HOST_DEG")

    # default dispatch (native probes when built): same answers
    for weighted in (False, True):
        ref = pair_intersection(g, jnp.asarray(us), jnp.asarray(vs),
                                max_deg=max_deg, weighted=weighted)
        fast = pair_intersection_bucketed(g, us, vs, weighted=weighted)
        for key in ref:
            np.testing.assert_allclose(
                np.asarray(fast[key]), np.asarray(ref[key]),
                rtol=1e-5, atol=1e-5,
                err_msg=f"default {key} weighted={weighted}")

    # tiny budget forces the auto dispatcher onto the bucketed path
    monkeypatch.setenv("CUGRAPH_TPU_ISECT_TABLE_MAX", "64")
    ref = pair_intersection(g, jnp.asarray(us), jnp.asarray(vs),
                            max_deg=max_deg, weighted=True)
    fast = pair_intersection_auto(g, us, vs, max_deg=max_deg, weighted=True)
    for key in ref:
        np.testing.assert_allclose(np.asarray(fast[key]), np.asarray(ref[key]),
                                   rtol=1e-5, atol=1e-5, err_msg=key)

    # tiny host-probe threshold routes EVERY pair through the min-degree
    # searchsorted path — must still match exactly
    monkeypatch.setenv("CUGRAPH_TPU_ISECT_HOST_DEG", "1")
    for weighted in (False, True):
        ref = pair_intersection(g, jnp.asarray(us), jnp.asarray(vs),
                                max_deg=max_deg, weighted=weighted)
        fast = pair_intersection_bucketed(g, us, vs, weighted=weighted)
        for key in ref:
            np.testing.assert_allclose(
                np.asarray(fast[key]), np.asarray(ref[key]),
                rtol=1e-5, atol=1e-5,
                err_msg=f"hostprobe {key} weighted={weighted}")


def test_all_pairs_vertices_restriction_and_weighted():
    """vertices= restricts the SpGEMM rows (pairs must involve a listed
    vertex and match the unrestricted run exactly, none missing); the
    weighted path still routes through the intersection query."""
    G, Gnx = karate()
    df = ctpu.all_pairs_jaccard(G, vertices=[0, 33])
    assert ((df["first"].isin([0, 33])) | (df["second"].isin([0, 33]))).all()
    full = ctpu.all_pairs_jaccard(G)
    fk = {(a, b): c for a, b, c in zip(full["first"], full["second"],
                                      full["jaccard_coeff"])}
    for a, b, c in zip(df["first"], df["second"], df["jaccard_coeff"]):
        key = (a, b) if (a, b) in fk else (b, a)
        assert abs(fk[key] - c) < 1e-9
    n_expected = sum(1 for (a, b) in fk if a in (0, 33) or b in (0, 33))
    assert n_expected == len(df)

    Gw, _ = karate(weighted=True)
    dw = ctpu.all_pairs_jaccard(Gw, use_weight=True, topk=10)
    assert len(dw) == 10 and (np.diff(dw["jaccard_coeff"]) <= 1e-9).all()
