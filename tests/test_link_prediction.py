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
