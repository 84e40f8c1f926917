"""Sampling: neighbor sampling, random walks, negative sampling.
Tests assert structural validity + distributional properties + determinism
(SURVEY.md §7: RNG parity is distributional, not bitwise)."""

import networkx as nx
import numpy as np

import cugraph_tpu as ctpu
from tests.utils import karate, random_directed


def test_uniform_neighbor_sample_valid_edges():
    G, Gnx = karate()
    df = ctpu.uniform_neighbor_sample(G, [0, 1, 2], [3, 2], random_state=7)
    for s, d in zip(df["sources"], df["destinations"]):
        assert Gnx.has_edge(s, d)
    assert set(df["hop_id"].unique()) <= {0, 1}


def test_uniform_neighbor_sample_fanout():
    G, Gnx = karate()
    df = ctpu.uniform_neighbor_sample(G, [0], [5], with_replacement=True,
                                      random_state=1)
    hop0 = df[df["hop_id"] == 0]
    assert len(hop0) == 5  # vertex 0 has degree 16 > 5


def test_without_replacement_distinct():
    G, Gnx = karate()
    df = ctpu.uniform_neighbor_sample(G, [0], [8], with_replacement=False,
                                      random_state=3)
    hop0 = df[df["hop_id"] == 0]
    assert len(hop0) == 8
    assert hop0["destinations"].nunique() == 8  # distinct draws


def test_sample_determinism():
    G, _ = karate()
    a = ctpu.uniform_neighbor_sample(G, [0, 5], [4, 4], random_state=11)
    b = ctpu.uniform_neighbor_sample(G, [0, 5], [4, 4], random_state=11)
    assert a.equals(b)


def test_biased_sampling_prefers_heavy_edges():
    # graph: 0 -> 1 (w=100), 0 -> 2 (w=0.01)
    src = np.array([0, 0]); dst = np.array([1, 2])
    w = np.array([100.0, 0.01], dtype=np.float32)
    G = ctpu.Graph(directed=True).from_edgelist(src, dst, w)
    df = ctpu.homogeneous_biased_neighbor_sample(G, [0] * 50, [1],
                                                 random_state=5)
    hits_heavy = (df["destinations"] == 1).sum()
    assert hits_heavy > 45


def test_random_walks_follow_edges():
    G, Gnx = karate()
    paths, weights, d = ctpu.random_walks(G, [0, 1, 2, 3], 5, random_state=2)
    p = paths.to_numpy().reshape(4, 6)
    for row in p:
        for a, b in zip(row[:-1], row[1:]):
            if b == -1:
                break
            assert Gnx.has_edge(a, b)


def test_random_walks_stop_at_sink():
    src = np.array([0, 1]); dst = np.array([1, 2])
    G = ctpu.Graph(directed=True).from_edgelist(src, dst)
    paths, _, _ = ctpu.random_walks(G, [0], 5, random_state=0)
    p = paths.to_numpy()
    assert p[0] == 0 and p[1] == 1 and p[2] == 2
    assert (p[3:] == -1).all()


def test_node2vec_walks_valid():
    G, Gnx = karate()
    paths, weights, d = ctpu.node2vec_random_walks(G, [0, 8, 20], 6,
                                                   p=2.0, q=0.5,
                                                   random_state=9)
    p = paths.to_numpy().reshape(3, 7)
    for row in p:
        for a, b in zip(row[:-1], row[1:]):
            if b == -1:
                break
            assert Gnx.has_edge(a, b)


def test_biased_walks_prefer_heavy():
    src = np.array([0, 0]); dst = np.array([1, 2])
    w = np.array([1000.0, 0.001], dtype=np.float32)
    G = ctpu.Graph(directed=True).from_edgelist(src, dst, w)
    counts = 0
    paths, _, _ = ctpu.biased_random_walks(G, [0] * 64, 1, random_state=4)
    p = paths.to_numpy().reshape(64, 2)
    assert (p[:, 1] == 1).sum() > 58


def test_negative_sampling_no_edges():
    G, Gnx = karate()
    df = ctpu.negative_sampling(G, 50, random_state=6)
    assert len(df) == 50
    for s, d in zip(df["src"], df["dst"]):
        assert not Gnx.has_edge(s, d)
        assert s != d


def test_rmat_generator():
    df = ctpu.rmat(8, 2048, seed=3)
    assert len(df) == 2048
    assert df["src"].max() < 256 and df["dst"].max() < 256
    # power-law-ish: top sources take a disproportionate share
    counts = np.bincount(df["src"], minlength=256)
    top = np.sort(counts)[-26:].sum()
    assert top > 0.25 * 2048


def test_rmat_determinism_and_scramble():
    a = ctpu.rmat(7, 500, seed=9)
    b = ctpu.rmat(7, 500, seed=9)
    assert a.equals(b)
    c = ctpu.rmat(7, 500, seed=9, scramble_vertex_ids=True)
    assert not a.equals(c)
    assert c["src"].max() < 128


def test_host_without_replacement_engine_validity(monkeypatch):
    """The host Gumbel-top-k fallback (big F×max_deg tiles) must return
    distinct valid neighbors per vertex, degree-capped, deterministic per
    seed — and it must be what the public path dispatches to when the
    device tile would not fit."""
    import cugraph_tpu.algos.sampling as S

    rng = np.random.default_rng(9)
    n = 300
    src = rng.integers(0, n, 5000)
    dst = rng.integers(0, n, 5000)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.uniform(0.1, 2.0, len(src)).astype(np.float32)
    G = ctpu.Graph(directed=True)
    G.from_edgelist(src, dst, w, renumber=False, vertices=np.arange(n))

    nbrs = {}
    for s, d in zip(src, dst):
        nbrs.setdefault(int(s), []).append(int(d))

    # force the host engine through the PUBLIC sampler
    monkeypatch.setattr(S, "_TILE_FALLBACK_ENTRIES", 10)
    monkeypatch.setattr(S, "_fetch_tables", lambda *a, **k: None)
    seeds = sorted(nbrs)[:40]
    for biased in (False, True):
        fn = (ctpu.homogeneous_biased_neighbor_sample if biased
              else ctpu.uniform_neighbor_sample)
        df = fn(G, seeds, [4], with_replacement=False, random_state=7)
        df2 = fn(G, seeds, [4], with_replacement=False, random_state=7)
        assert df.equals(df2), "host engine must be deterministic per seed"
        for s, grp in df.groupby("sources"):
            picks = grp.destinations.tolist()
            # distinct picks (no replacement) up to neighbor multiplicity
            import collections
            cnt = collections.Counter(picks)
            avail = collections.Counter(nbrs[int(s)])
            for d, c in cnt.items():
                assert c <= avail[d], (s, d, c)
            assert len(picks) == min(4, len(nbrs[int(s)]))
            for d in picks:
                assert d in avail


def test_host_wr_rejection_fast_path_uniform():
    """High-degree rows take the first-k-distinct rejection path (exactly
    the without-replacement law); chi-square uniformity over a 600-degree
    hub plus distinctness and small-row fallback correctness."""
    import jax

    import cugraph_tpu.algos.sampling as S

    rng = np.random.default_rng(0)
    hub_dst = rng.choice(np.arange(1, 601), 600, replace=False)
    src = np.concatenate([np.zeros(600, np.int64), [700, 700, 701]])
    dst = np.concatenate([hub_dst, [701, 702, 702]])
    G = ctpu.Graph(directed=True)
    G.from_edgelist(src, dst, None, renumber=False, vertices=np.arange(1000))
    g = G.structure
    counts = np.zeros(1000, np.int64)
    k = 3
    for t in range(1500):
        d, e, v = S._host_sample_without_replacement(
            g, np.array([0, 700, 701]), jax.random.PRNGKey(t), k, False)
        assert v[0].all() and len(set(d[0].tolist())) == k
        counts[d[0]] += 1
        assert v[1].sum() == 2 and len(set(d[1][v[1]].tolist())) == 2
        assert v[2].sum() == 1
    exp = 1500 * k / 600
    chi2 = (((counts[hub_dst] - exp) ** 2) / exp).sum()
    assert 400 < chi2 < 820, chi2   # dof 599
