"""Heterogeneous/temporal sampling, post-processing, lookup table, and the
new structure utilities."""

import numpy as np
import pandas as pd
import pytest

import cugraph_tpu as ct


def _typed_graph():
    # two edge types: type 0 = ring 0→1→2→3→0, type 1 = star 0→{4,5,6}
    src = np.array([0, 1, 2, 3, 0, 0, 0])
    dst = np.array([1, 2, 3, 0, 4, 5, 6])
    etype = np.array([0, 0, 0, 0, 1, 1, 1], np.int32)
    eid = np.arange(7, dtype=np.int64)
    etime = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0], np.float32)
    G = ct.Graph(directed=True)
    G.from_edgelist(src, dst, None, edge_id=eid, edge_type=etype,
                    edge_time=etime, renumber=False)
    return G


def test_edge_properties_stored():
    G = _typed_graph()
    assert G.edge_ids is not None and len(G.edge_ids) == 7
    assert G.edge_types is not None and G.edge_times is not None


def test_heterogeneous_sampling_respects_types():
    G = _typed_graph()
    # hop fanouts: [type0: 2, type1: 0] → only ring edges from vertex 0
    df = ct.heterogeneous_uniform_neighbor_sample(
        G, [0], [2, 0], num_edge_types=2, random_state=0)
    assert set(df["destinations"]) <= {1}          # only 0→1 is type 0
    df2 = ct.heterogeneous_uniform_neighbor_sample(
        G, [0], [0, 3], num_edge_types=2, random_state=0)
    assert set(df2["destinations"]) <= {4, 5, 6}   # only star edges


def test_temporal_sampling_monotone_times():
    G = _typed_graph()
    df = ct.homogeneous_uniform_temporal_neighbor_sample(
        G, [0], [2, 2], seed_time=0.0, random_state=1)
    # all sampled edge times must exceed the seed time and be non-decreasing
    # across hops along each path (edge_time column present)
    assert "edge_time" in df.columns
    assert (df["edge_time"] > 0).all()
    h0 = df[df.hop_id == 0]
    h1 = df[df.hop_id == 1]
    if len(h1):
        assert h1["edge_time"].min() > h0["edge_time"].min()


def test_temporal_requires_times():
    G = ct.Graph(directed=True)
    G.from_edgelist(np.array([0, 1]), np.array([1, 2]), None)
    with pytest.raises(ValueError):
        ct.homogeneous_uniform_temporal_neighbor_sample(G, [0], [1])


def test_sampling_post_processing_batches():
    G = _typed_graph()
    df = ct.uniform_neighbor_sample(G, [0, 1], [2, 2], random_state=0)
    batches = ct.sampling_results_to_batches(df)
    for b, pack in batches.items():
        n_local = len(pack["map"])
        for hop in pack["hops"]:
            assert hop["offsets"][-1] == len(hop["indices"])
            assert (hop["indices"] < n_local).all()
        # seeds come first in the renumber map
        seed = df[df.batch_id == b]["sources"].iloc[0]
        assert pack["map"][0] == seed or seed in pack["map"][:2]


def test_edge_id_lookup_table():
    G = _typed_graph()
    t = ct.edge_id_lookup_table(G)
    r = t.lookup_vertex_ids(np.array([4, 5]), edge_type=1)
    assert list(r["src"]) == [0, 0]
    assert list(r["dst"]) == [4, 5]
    miss = t.lookup_vertex_ids(np.array([99]), edge_type=1)
    assert miss["src"].iloc[0] == -1


def test_structure_utils_roundtrip():
    rng = np.random.default_rng(0)
    src = rng.integers(0, 50, 300)
    dst = rng.integers(0, 50, 300)
    G = ct.Graph(directed=True)
    G.from_edgelist(src, dst, None)
    df = ct.decompress_to_edgelist(G)
    # round-trip: same edge multiset after dedupe (Graph dedupes multi-edges)
    a = set(zip(df["src"], df["dst"]))
    b = set(zip(src.tolist(), dst.tolist()))
    assert a <= b and len(a) == len(set(b))

    assert ct.count_multi_edges(G) == 0  # already deduped inside Graph
    vs = ct.select_random_vertices(G, 10, random_state=0)
    assert len(set(vs)) == 10
    assert len(ct.extract_vertex_list(G)) == G.number_of_vertices()
    assert ct.total_edge_weight(G) == G.number_of_edges()

    s32, d32, mp = ct.renumber_arbitrary_edgelist(
        np.array([10**10, 10**10 + 5]), np.array([10**10 + 5, 10**10]))
    assert s32.max() <= 1 and len(mp) == 2


def test_hypergraph():
    df = pd.DataFrame({"user": ["a", "b", "a"], "item": ["x", "x", "y"]})
    nodes, edges, G = ct.hypergraph(df, columns=["user", "item"])
    assert G.number_of_vertices() == len(nodes)
    nodes2, edges2, G2 = ct.hypergraph(df, columns=["user", "item"], direct=True)
    assert G2.number_of_vertices() == 4  # a,b,x,y entities only


def test_fanout_exceeding_degree_returns_all_neighbors():
    # fanout > max degree must not crash (clamped to the degree)
    G = ct.Graph(directed=True)
    G.from_edgelist(np.array([0, 0]), np.array([1, 2]), None, renumber=False)
    df = ct.uniform_neighbor_sample(G, [0], [10], with_replacement=False,
                                    random_state=0)
    assert set(df["destinations"]) == {1, 2}


def test_heterogeneous_fanout_positional_type_ids():
    # non-contiguous type ids: fanout slot t targets TYPE ID t
    G = ct.Graph(directed=True)
    G.from_edgelist(np.array([0, 0]), np.array([1, 2]), None,
                    edge_type=np.array([0, 2], np.int32), renumber=False)
    df = ct.heterogeneous_uniform_neighbor_sample(
        G, [0], [1, 1, 1], num_edge_types=3, random_state=0)
    assert set(df["destinations"]) == {1, 2}  # slot 1 (absent type) skipped


def test_heterogeneous_sampling_undirected_graph():
    # undirected graphs: the mask must cover the SYMMETRIZED edge slots
    G = ct.Graph()  # undirected
    G.from_edgelist(np.array([0, 1, 2]), np.array([1, 2, 0]), None,
                    edge_type=np.array([0, 0, 0], np.int32), renumber=False)
    df = ct.heterogeneous_uniform_neighbor_sample(
        G, [1], [2], num_edge_types=1, random_state=0)
    assert set(df["destinations"]) == {0, 2}  # both of vertex 1's neighbors


def test_negative_sampling_respects_seed_and_vertices():
    rng = np.random.default_rng(0)
    src = rng.integers(0, 40, 200)
    dst = rng.integers(0, 40, 200)
    G = ct.Graph(directed=True)
    G.from_edgelist(src, dst, None, renumber=False)
    b = np.ones(40)
    a1 = ct.negative_sampling(G, 12, src_bias=b, dst_bias=b, random_state=1)
    a2 = ct.negative_sampling(G, 12, src_bias=b, dst_bias=b, random_state=999)
    assert not a1.equals(a2)  # seed must matter for biased draws
    sub = ct.negative_sampling(G, 10, vertices=np.arange(5), random_state=0)
    assert sub["src"].max() < 5 and sub["dst"].max() < 5


def test_uniform_sample_with_edge_properties():
    G = ct.Graph(directed=True)
    G.from_edgelist(np.array([0, 0, 1]), np.array([1, 2, 2]), None,
                    edge_id=np.arange(3), edge_type=np.zeros(3, np.int32),
                    renumber=False)
    df = ct.uniform_neighbor_sample(G, [0, 1], [2], random_state=0,
                                    with_edge_properties=True)
    assert {"edge_id", "edge_type"} <= set(df.columns)


# ---------------------------------------------------------------------------
# Round-2 additions: biased-temporal SG variants + MG heterogeneous/temporal
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def mesh8():
    import jax
    from cugraph_tpu.parallel import make_mesh_2d
    assert jax.device_count() >= 8
    return make_mesh_2d(4, 2, jax.devices()[:8])


def _temporal_graph(seed=0, n=40, m=300):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.uniform(0.5, 3.0, len(src)).astype(np.float32)
    t = rng.uniform(0.0, 10.0, len(src)).astype(np.float32)
    et = rng.integers(0, 3, len(src)).astype(np.int32)
    return src, dst, w, t, et, n


def test_homogeneous_biased_temporal_sample():
    import cugraph_tpu as ct

    src, dst, w, t, et, n = _temporal_graph(1)
    G = ct.Graph(directed=True)
    G.from_edgelist(src, dst, w, edge_time=t, renumber=False)
    df = ct.homogeneous_biased_temporal_neighbor_sample(
        G, [int(src[0])], [5, 5], seed_time=2.0, random_state=0)
    assert len(df) > 0
    # every sampled edge exists and satisfies monotone time
    eset = {(int(s), int(d)): float(tt)
            for s, d, tt in zip(src, dst, t)}
    emax = {}
    for s, d, tt in zip(src, dst, t):
        emax[(int(s), int(d))] = max(emax.get((int(s), int(d)), -1), tt)
    for _, r in df.iterrows():
        assert (int(r["sources"]), int(r["destinations"])) in eset
        assert r["edge_time"] > 2.0 or r["hop_id"] > 0


def test_heterogeneous_biased_temporal_sample():
    import cugraph_tpu as ct

    src, dst, w, t, et, n = _temporal_graph(2)
    G = ct.Graph(directed=True)
    G.from_edgelist(src, dst, w, edge_time=t, edge_type=et, renumber=False)
    df = ct.heterogeneous_biased_temporal_neighbor_sample(
        G, [int(src[0]), int(src[1])], [3, 3, 3, 2, 2, 2],
        num_edge_types=3, seed_time=1.0, random_state=0)
    if len(df):
        # sampled edges respect their per-type fanout slots
        assert set(df["hop_id"].unique()) <= {0, 1}
        assert df["edge_time"].min() > 1.0 or df["hop_id"].max() > 0


def test_plc_temporal_entry_points():
    from cugraph_tpu import plc

    src, dst, w, t, et, n = _temporal_graph(3)
    rh = plc.ResourceHandle()
    g = plc.SGGraph(rh, None, np.asarray(src), np.asarray(dst),
                    weight_array=w, edge_start_time_array=t,
                    edge_type_array=et)
    for fn in (plc.homogeneous_uniform_temporal_neighbor_sample,
               plc.homogeneous_biased_temporal_neighbor_sample):
        df = fn(rh, g, [int(src[0])], [4], seed_time=0.5, random_state=0)
        assert df is not None
    for fn in (plc.heterogeneous_uniform_temporal_neighbor_sample,
               plc.heterogeneous_biased_temporal_neighbor_sample):
        df = fn(rh, g, [int(src[0])], [2, 2, 2], num_edge_types=3,
                seed_time=0.5, random_state=0)
        assert df is not None


def test_mg_heterogeneous_sample_matches_structure(mesh8):
    from cugraph_tpu.parallel import build_dist_graph, \
        mg_heterogeneous_neighbor_sample

    src, dst, w, t, et, n = _temporal_graph(4, n=60, m=500)
    g = build_dist_graph(src, dst, w, n, 4, 2, store_push=True,
                         edge_type=et, edge_time=t)
    df = mg_heterogeneous_neighbor_sample(
        g, mesh8, [int(src[0]), int(src[5])], [2, 2, 2, 1, 1, 1],
        num_edge_types=3, seed=0)
    assert len(df) > 0
    typed = {}
    for s, d, tp in zip(src, dst, et):
        typed.setdefault((int(s), int(d)), set()).add(int(tp))
    for _, r in df.iterrows():
        key = (int(r["sources"]), int(r["destinations"]))
        assert key in typed and int(r["edge_type"]) in typed[key]


def test_mg_temporal_sample_monotone(mesh8):
    from cugraph_tpu.parallel import build_dist_graph, \
        mg_temporal_neighbor_sample

    src, dst, w, t, et, n = _temporal_graph(5, n=60, m=500)
    g = build_dist_graph(src, dst, w, n, 4, 2, store_push=True,
                         edge_time=t)
    df = mg_temporal_neighbor_sample(g, mesh8, [int(src[0]), int(src[1])],
                                     [4, 4], seed_time=2.0, seed=0)
    eset = set(zip(src.tolist(), dst.tolist()))
    hop0_t = {}
    for _, r in df.iterrows():
        assert (int(r["sources"]), int(r["destinations"])) in eset
        if r["hop_id"] == 0:
            assert r["edge_time"] > 2.0
            hop0_t.setdefault(int(r["destinations"]), set()).add(
                float(r["edge_time"]))
    # hop-1 edges must advance past SOME hop-0 arrival time of their source
    for _, r in df[df["hop_id"] == 1].iterrows():
        s = int(r["sources"])
        if s in hop0_t:
            assert any(r["edge_time"] > tt for tt in hop0_t[s])


def test_mg_biased_temporal_sample(mesh8):
    from cugraph_tpu.parallel import build_dist_graph, \
        mg_temporal_neighbor_sample

    src, dst, w, t, et, n = _temporal_graph(6, n=50, m=400)
    g = build_dist_graph(src, dst, w, n, 4, 2, store_push=True,
                         edge_time=t)
    df = mg_temporal_neighbor_sample(g, mesh8, [int(src[0])], [4],
                                     seed_time=0.0, seed=1, biased=True)
    if len(df):
        assert (df["edge_time"] > 0.0).all()


# ---------------------------------------------------------------------------
# row-gather table fast paths ≡ CSR-walking fallbacks (same key → same draws)
# ---------------------------------------------------------------------------

def _rand_graph(seed=5, n=120, m=700, weighted=True):
    import numpy as np
    from cugraph_tpu.core.structure import build_structure_host

    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = rng.uniform(0.5, 2.0, m).astype(np.float32) if weighted else None
    return build_structure_host(src, dst, w, n), n


def test_sample_neighbors_table_matches_fallback():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cugraph_tpu.algos.sampling import (_fetch_tables, _row_cumweights,
                                            _sample_neighbors)

    g, n = _rand_graph()
    max_deg = int(np.asarray(g.out_degrees())[:n].max())
    frontier = jnp.asarray(np.arange(0, n, 2, dtype=np.int32))
    key = jax.random.PRNGKey(7)
    cumw = _row_cumweights(g)
    tables = _fetch_tables(g, weights=True, cum=True)
    assert tables is not None
    for wr in (True, False):
        for biased in (True, False):
            a = _sample_neighbors(g, frontier, key, 4, wr, biased, max_deg,
                                  cumw, None)
            b = _sample_neighbors(g, frontier, key, 4, wr, biased, max_deg,
                                  cumw, tables)
            np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))
            va = np.asarray(a[2])
            np.testing.assert_array_equal(np.asarray(a[0])[va],
                                          np.asarray(b[0])[va],
                                          err_msg=f"wr={wr} biased={biased}")
            np.testing.assert_array_equal(np.asarray(a[1])[va],
                                          np.asarray(b[1])[va])


def test_walk_kernels_table_matches_fallback():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cugraph_tpu.algos.sampling import (_fetch_tables, _node2vec_kernel,
                                            _row_cumweights, _walk_kernel)

    g, n = _rand_graph(seed=6)
    max_deg = int(np.asarray(g.out_degrees())[:n].max())
    starts = jnp.asarray(np.arange(0, n, 3, dtype=np.int32))
    key = jax.random.PRNGKey(9)
    cumw = _row_cumweights(g)
    tables = _fetch_tables(g, weights=True, cum=True)

    for biased in (False, True):
        pa, wa = _walk_kernel(g, starts, key, 6, biased, cumw, None)
        pb, wb = _walk_kernel(g, starts, key, 6, biased, cumw, tables)
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
        np.testing.assert_allclose(np.asarray(wa), np.asarray(wb))

    pa, wa = _node2vec_kernel(g, starts, key, 6, 2.0, 0.5, max_deg, None)
    pb, wb = _node2vec_kernel(g, starts, key, 6, 2.0, 0.5, max_deg, tables)
    np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
    np.testing.assert_allclose(np.asarray(wa), np.asarray(wb))


def test_masked_sampler_table_matches_fallback():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cugraph_tpu.algos.sampling import (_fetch_tables,
                                            _sample_neighbors_masked)
    from cugraph_tpu.prims.neighbor_table import edge_value_table

    g, n = _rand_graph(seed=8)
    adj = g.csr
    max_deg = int(np.asarray(g.out_degrees())[:n].max())
    rng = np.random.default_rng(0)
    mask = rng.random(adj.pad_e) < 0.6
    etimes = rng.uniform(0, 10, adj.pad_e).astype(np.float32)
    frontier = jnp.asarray(np.arange(0, n, 2, dtype=np.int32))
    seed_times = jnp.full((len(np.arange(0, n, 2)),), 3.0, jnp.float32)
    key = jax.random.PRNGKey(3)
    tables = _fetch_tables(g, weights=True)
    ok_tab = jnp.asarray(edge_value_table(adj, mask, False, np.bool_))
    time_tab = jnp.asarray(edge_value_table(adj, etimes, np.float32(0.0)))

    for biased in (False, True):
        a = _sample_neighbors_masked(
            g, frontier, key, 3, max_deg, jnp.asarray(mask), seed_times,
            jnp.asarray(etimes), "strictly_increasing", biased)
        b = _sample_neighbors_masked(
            g, frontier, key, 3, max_deg, None, seed_times, None,
            "strictly_increasing", biased, tables, ok_tab, time_tab)
        np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))
        va = np.asarray(a[2])
        np.testing.assert_array_equal(np.asarray(a[0])[va],
                                      np.asarray(b[0])[va])


def test_sampling_trailing_zero_degree_exact_pad():
    """pad_e == nnz (exactly 128 edges) + a trailing zero-out-degree vertex:
    its CSR base equals nnz, so unclipped eidx would index one past the
    weights array (regression: dense-CDF / uniform with-replacement paths
    returned eidx = base for degree-0 rows)."""
    import cugraph_tpu as ct
    from cugraph_tpu.algos import sampling as S

    rng = np.random.default_rng(3)
    n = 40
    # 128 unique (src, dst) pairs with src < n-1 (vertex n-1 stays sinkless)
    pairs = rng.permutation((n - 1) * n)[:128]
    src, dst = (pairs // n).astype(np.int64), (pairs % n).astype(np.int64)
    w = rng.uniform(0.5, 2.0, 128).astype(np.float32)
    G = ct.Graph(directed=True)
    G.from_edgelist(src, dst, w, vertices=np.arange(n), renumber=False)
    g = G.structure
    assert g.csr.pad_e == g.num_edges == 128
    assert int(np.asarray(g.csr.offsets)[n - 1]) == 128  # base == nnz

    start = np.array([n - 1, int(src[0])])
    df_u = ct.uniform_neighbor_sample(G, start, [2], with_replacement=True)
    df_b = S.homogeneous_biased_neighbor_sample(G, start, [2],
                                                with_replacement=True)
    for df in (df_u, df_b):
        # degree-0 seed contributes no rows; the others sample real edges
        assert (df["sources"] != n - 1).all()
        assert len(df) > 0


def test_negative_sampling_bias_vertices_contract():
    """Review regressions: biases pair with the candidate list (vertices=)
    or with G.nodes() order; wrong lengths raise; biased draws stay inside
    the candidate set; biased homogeneous sampling forwards
    with_edge_properties."""
    import pytest

    import cugraph_tpu as ct

    rng = np.random.default_rng(2)
    src = rng.integers(100, 140, 300)
    dst = rng.integers(100, 140, 300)
    keep = src != dst
    G = ct.Graph(directed=True)
    G.from_edgelist(src[keep], dst[keep],
                    rng.random(int(keep.sum())).astype(np.float32),
                    edge_id=np.arange(int(keep.sum())))

    cand = np.array([100, 101, 102])
    df = ct.negative_sampling(G, 20, vertices=cand,
                              src_bias=np.array([1.0, 1.0, 5.0]),
                              dst_bias=np.array([5.0, 1.0, 1.0]))
    assert set(df["src"]).issubset(set(cand.tolist()))
    assert set(df["dst"]).issubset(set(cand.tolist()))

    with pytest.raises(ValueError, match="src_bias"):
        ct.negative_sampling(G, 5, vertices=cand, src_bias=np.ones(7))

    hs = ct.homogeneous_biased_neighbor_sample(
        G, [100, 105], [3], with_edge_properties=True)
    assert "edge_id" in hs.columns
