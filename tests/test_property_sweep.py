"""Cross-algorithm randomized parity sweep.

The reference validates each algorithm against NetworkX on fixed datasets
(python/cugraph/cugraph/tests/*, e.g. test_pagerank.py:77-96); this sweep
runs the core algorithms over several random graph shapes (sparse, dense,
disconnected, star/hub-heavy) in one pass — a cheap guard against
regressions that only bite on a particular structure."""

import networkx as nx
import numpy as np
import pytest

import cugraph_tpu as ct

INF32 = np.iinfo(np.int32).max


def _shapes():
    rng = np.random.default_rng(99)
    shapes = []
    # sparse random
    s = rng.integers(0, 80, 200); d = rng.integers(0, 80, 200)
    shapes.append(("sparse", s, d))
    # dense-ish
    s = rng.integers(0, 30, 400); d = rng.integers(0, 30, 400)
    shapes.append(("dense", s, d))
    # disconnected halves
    s1 = rng.integers(0, 25, 80); d1 = rng.integers(0, 25, 80)
    s2 = rng.integers(40, 65, 80); d2 = rng.integers(40, 65, 80)
    shapes.append(("disconnected", np.concatenate([s1, s2]),
                   np.concatenate([d1, d2])))
    # hub-heavy star + noise
    s = np.concatenate([np.zeros(60, np.int64), rng.integers(0, 70, 100)])
    d = np.concatenate([rng.integers(1, 70, 60), rng.integers(0, 70, 100)])
    shapes.append(("hub", s, d))
    out = []
    for name, s, d in shapes:
        keep = s != d
        out.append((name, s[keep], d[keep]))
    return out


@pytest.mark.parametrize("name,src,dst", _shapes(),
                         ids=[s[0] for s in _shapes()])
def test_sweep_core_algorithms(name, src, dst):
    G = ct.Graph()
    G.from_edgelist(src, dst, None)
    Gx = nx.Graph(); Gx.add_edges_from(zip(src.tolist(), dst.tolist()))

    pr = ct.pagerank(G)
    prx = nx.pagerank(Gx)
    d = dict(zip(pr["vertex"], pr["pagerank"]))
    assert max(abs(d[v] - prx[v]) for v in prx) < 1e-4

    s0 = int(src[0])
    b = ct.bfs(G, s0)
    ref = nx.single_source_shortest_path_length(Gx, s0)
    bd = dict(zip(b["vertex"], b["distance"]))
    for v in Gx.nodes:
        assert bd[v] == ref.get(v, INF32)

    wcc = ct.weakly_connected_components(G)
    lab = dict(zip(wcc["vertex"], wcc["labels"]))
    for comp in nx.connected_components(Gx):
        comp = list(comp)
        assert len({lab[v] for v in comp}) == 1

    tc = ct.triangle_count(G)
    reft = nx.triangles(Gx)
    td = dict(zip(tc["vertex"], tc["counts"]))
    for v in Gx.nodes:
        assert td[v] == reft[v], (name, v)

    _, q = ct.louvain(G)
    assert np.isfinite(q)

    cn = ct.core_number(G)
    refc = nx.core_number(Gx)
    cd = dict(zip(cn["vertex"], cn["core_number"]))
    for v in Gx.nodes:
        assert cd[v] == refc[v], (name, v)
