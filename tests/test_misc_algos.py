"""MST, topological sort, layout, Hungarian, structure ops, datasets."""

import networkx as nx
import numpy as np
import pandas as pd
import pytest

import cugraph_tpu as ctpu
from tests.utils import karate, build_pair, disconnected


def test_mst_weight_matches_networkx():
    rng = np.random.default_rng(0)
    Gnx = nx.gnm_random_graph(40, 120, seed=5)
    for u, v in Gnx.edges():
        Gnx[u][v]["weight"] = float(rng.uniform(0.1, 5.0))
    G, _ = build_pair(Gnx, weighted=True)
    mst = ctpu.minimum_spanning_tree(G)
    ref = nx.minimum_spanning_tree(Gnx)
    got_w = mst.view_edge_list()["weight"].sum()
    ref_w = sum(d["weight"] for _, _, d in ref.edges(data=True))
    assert abs(got_w - ref_w) < 1e-3
    assert mst.number_of_edges() == ref.number_of_edges()


def test_mst_forest_disconnected():
    G, Gnx = disconnected()
    mst = ctpu.minimum_spanning_tree(G)
    ncc = nx.number_connected_components(Gnx)
    assert mst.number_of_edges() == Gnx.number_of_nodes() - ncc


def test_maximum_spanning_tree():
    rng = np.random.default_rng(1)
    Gnx = nx.gnm_random_graph(30, 90, seed=2)
    for u, v in Gnx.edges():
        Gnx[u][v]["weight"] = float(rng.uniform(0.1, 5.0))
    G, _ = build_pair(Gnx, weighted=True)
    mst = ctpu.maximum_spanning_tree(G)
    ref = nx.maximum_spanning_tree(Gnx)
    assert abs(mst.view_edge_list()["weight"].sum()
               - sum(d["weight"] for _, _, d in ref.edges(data=True))) < 1e-3


def test_topological_sort():
    Gnx = nx.gn_graph(25, seed=3).reverse()  # a DAG
    G, _ = build_pair(Gnx)
    df = ctpu.topological_sort(G)
    pos = {v: i for i, v in enumerate(df["vertex"])}
    for u, v in Gnx.edges():
        assert pos[u] < pos[v]


def test_topological_sort_cycle_raises():
    Gnx = nx.DiGraph([(0, 1), (1, 2), (2, 0)])
    G, _ = build_pair(Gnx)
    with pytest.raises(ValueError):
        ctpu.topological_sort(G)


def test_force_atlas2_separates_components():
    G, Gnx = disconnected()
    df = ctpu.force_atlas2(G, max_iter=200)
    assert len(df) == Gnx.number_of_nodes()
    assert np.isfinite(df[["x", "y"]].to_numpy()).all()
    # connected vertices end closer together than the global spread
    pos = {v: (x, y) for v, x, y in zip(df["vertex"], df["x"], df["y"])}
    d_edges = np.mean([np.hypot(pos[u][0] - pos[v][0], pos[u][1] - pos[v][1])
                       for u, v in Gnx.edges()])
    all_pts = df[["x", "y"]].to_numpy()
    spread = np.mean(np.abs(all_pts - all_pts.mean(0)))
    assert d_edges < spread * 2.5


def test_dense_hungarian():
    from scipy.optimize import linear_sum_assignment
    rng = np.random.default_rng(4)
    C = rng.uniform(0, 10, (12, 12))
    cost, cols = ctpu.dense_hungarian(C)
    r, c = linear_sum_assignment(C)
    assert abs(cost - C[r, c].sum()) < 1e-2


def test_two_hop_neighbors():
    G, Gnx = karate()
    df = ctpu.two_hop_neighbors(G)
    got = {tuple(sorted(p)) for p in zip(df["first"], df["second"])}
    ref = set()
    for u in Gnx.nodes():
        for w in Gnx[u]:
            for v in Gnx[w]:
                if u != v:
                    ref.add(tuple(sorted((u, v))))
    assert got == ref


def test_induced_subgraph():
    G, Gnx = karate()
    verts = [0, 1, 2, 3, 33]
    df, offs = ctpu.induced_subgraph(G, verts)
    ref = Gnx.subgraph(verts)
    got = {tuple(sorted(e)) for e in zip(df["src"], df["dst"])}
    assert got == {tuple(sorted(e)) for e in ref.edges()}


def test_subgraph_returns_graph():
    G, Gnx = karate()
    sub = ctpu.subgraph(G, [0, 1, 2, 3])
    assert sub.number_of_edges() == Gnx.subgraph([0, 1, 2, 3]).number_of_edges()


def test_symmetrize_frame():
    df = pd.DataFrame({"src": [0, 1], "dst": [1, 2]})
    out = ctpu.symmetrize(df)
    got = set(zip(out["src"], out["dst"]))
    assert got == {(0, 1), (1, 0), (1, 2), (2, 1)}


def test_datasets_registry():
    from cugraph_tpu import datasets
    G = datasets.karate.get_graph(ignore_weights=True)
    assert G.number_of_vertices() == 34
    assert G.number_of_edges() == 78
    el = datasets.les_miserables.get_edgelist()
    assert {"src", "dst", "wgt"} <= set(el.columns)
    assert datasets.small_rmat.number_of_edges() == 1024 * 16


def test_simple_generators():
    from cugraph_tpu.generators import simple
    p = simple.path_graph(5)
    assert len(p) == 4
    c = simple.complete_graph(6)
    assert len(c) == 15
    m = simple.mesh_2d_graph(3, 4)
    assert len(m) == 3 * 3 + 2 * 4
    er = simple.erdos_renyi_gnp(50, 0.1, seed=1)
    assert (er["src"] != er["dst"]).all()
    # valid vertex range
    assert er[["src", "dst"]].to_numpy().max() < 50


def test_file_readers_roundtrip(tmp_path):
    import cugraph_tpu as ct
    from cugraph_tpu.datasets import read_csv_edgelist, read_mtx, \
        write_csv_edgelist

    # csv round trip
    G = ct.datasets.karate.get_graph()
    p = tmp_path / "karate.csv"
    write_csv_edgelist(G, str(p))
    df = read_csv_edgelist(str(p))
    G2 = ct.Graph()
    G2.from_edgelist(df["src"].to_numpy(), df["dst"].to_numpy(),
                     df["wgt"].to_numpy() if "wgt" in df else None)
    assert G2.number_of_edges() == G.number_of_edges()

    # mtx: symmetric banner expansion + 1-based conversion
    mtx = tmp_path / "t.mtx"
    mtx.write_text("%%MatrixMarket matrix coordinate real symmetric\n"
                   "3 3 3\n1 2 1.5\n2 3 2.5\n3 3 9.0\n")
    dfm = read_mtx(str(mtx))
    assert len(dfm) == 5  # two off-diagonal edges doubled + one self loop
    assert dfm["src"].min() == 0
    assert set(dfm.columns) == {"src", "dst", "wgt"}


def test_er_generator_large_sparse_domain():
    from cugraph_tpu.generators.simple import erdos_renyi_gnp

    # total pair domain ~ 8.6e9 — must not materialize a permutation of it
    df = erdos_renyi_gnp(131072, 1e-7, seed=1)
    assert len(df) < 5000
    assert df["src"].max() < 131072 and (df["src"] < df["dst"]).all()


def test_core_number_degree_types_differ_on_directed():
    import cugraph_tpu as ct

    # directed chain: 0→1→2; in/out degrees differ per vertex
    G = ct.Graph(directed=True)
    G.from_edgelist(np.array([0, 1]), np.array([1, 2]), None, renumber=False)
    ci = ct.core_number(G, degree_type="incoming")
    cb = ct.core_number(G, degree_type="bidirectional")
    # in-coreness of a DAG peels to zero; bidirectional keeps the 1-core
    assert list(ci["core_number"]) == [0, 0, 0]
    assert list(cb["core_number"]) == [1, 1, 1]


def test_induced_subgraph_empty_edge_graph():
    import cugraph_tpu as ct

    G = ct.Graph(directed=True)
    G.from_edgelist(np.array([], np.int64), np.array([], np.int64), None,
                    vertices=np.arange(3), renumber=False)
    df, offs = ct.induced_subgraph(G, [0, 1])
    assert len(df) == 0


def test_pm_repulsion_matches_exact():
    """Particle-mesh far-field repulsion tracks the exact pairwise force."""
    import jax.numpy as jnp
    from cugraph_tpu.algos.layout import _exact_repulsion, _pm_repulsion

    rng = np.random.default_rng(7)
    n = 768
    # clustered positions — the hard case for centroid approximations
    centers = rng.uniform(-100, 100, (8, 2))
    pos = (centers[rng.integers(0, 8, n)]
           + rng.normal(0, 5.0, (n, 2))).astype(np.float32)
    deg = rng.integers(1, 20, n).astype(np.float32)
    real = np.ones(n, np.float32)
    exact = np.asarray(_exact_repulsion(
        jnp.asarray(pos), jnp.asarray(deg), jnp.asarray(real),
        jnp.float32(2.0)))
    pm = np.asarray(_pm_repulsion(
        jnp.asarray(pos), jnp.asarray(deg), jnp.asarray(real), 64,
        jnp.float32(2.0)))
    num = np.linalg.norm(pm - exact, axis=1)
    den = np.linalg.norm(exact, axis=1) + 1e-6
    # per-vertex relative error is ill-conditioned where exact forces nearly
    # cancel; judge by the median and the magnitude-weighted total error
    assert np.median(num / den) < 0.02
    assert num.sum() / den.sum() < 0.03


def test_pm_repulsion_window_overflow_degrades_gracefully():
    """A single dense blob larger than the Morton window must fall back to
    the residual-mass centroid path, not double-count or explode."""
    import jax.numpy as jnp
    from cugraph_tpu.algos.layout import _exact_repulsion, _pm_repulsion

    rng = np.random.default_rng(3)
    n = 2048  # chunk + 2*halo == 2048: same-cell members can overflow
    pos = rng.normal(0, 1.0, (n, 2)).astype(np.float32)
    pos[:1500] = rng.normal(0, 0.01, (1500, 2))  # blob in one fine cell
    deg = np.ones(n, np.float32)
    real = np.ones(n, np.float32)
    exact = np.asarray(_exact_repulsion(
        jnp.asarray(pos), jnp.asarray(deg), jnp.asarray(real),
        jnp.float32(2.0)))
    pm = np.asarray(_pm_repulsion(
        jnp.asarray(pos), jnp.asarray(deg), jnp.asarray(real), 16,
        jnp.float32(2.0)))
    assert np.isfinite(pm).all()
    num = np.linalg.norm(pm - exact, axis=1)
    den = np.linalg.norm(exact, axis=1) + 1e-6
    assert num.sum() / den.sum() < 0.5  # approximate but bounded


def test_force_atlas2_pm_layout_quality():
    """PM path produces a layout equivalent to the exact path: pairwise
    distance structure must correlate (rotation/reflection invariant)."""
    Gnx = nx.connected_caveman_graph(6, 8)
    G, _ = build_pair(Gnx)
    df_ex = ctpu.force_atlas2(G, max_iter=150, random_state=11)
    df_pm = ctpu.force_atlas2(G, max_iter=150, random_state=11,
                              barnes_hut_optimize=True)
    assert np.isfinite(df_pm[["x", "y"]].to_numpy()).all()

    def pdists(df):
        p = df.sort_values("vertex")[["x", "y"]].to_numpy()
        d = np.sqrt(((p[:, None] - p[None, :]) ** 2).sum(-1))
        return d[np.triu_indices(len(p), 1)]

    a, b = pdists(df_ex), pdists(df_pm)
    r = np.corrcoef(a, b)[0, 1]
    assert r > 0.7, r


def test_force_atlas2_pm_scale_smoke():
    """PM path runs on a graph the exact path would need a 64M-entry
    pairwise matrix for, and keeps clusters coherent."""
    rng = np.random.default_rng(0)
    n_comm, sz = 40, 50  # 2000 vertices, auto threshold not hit: force PM
    src, dst = [], []
    for c in range(n_comm):
        base = c * sz
        s = rng.integers(0, sz, 300) + base
        d = rng.integers(0, sz, 300) + base
        src.append(s); dst.append(d)
    src, dst = np.concatenate(src), np.concatenate(dst)
    keep = src != dst
    G = ctpu.Graph()
    G.from_edgelist(src[keep], dst[keep], None)
    df = ctpu.force_atlas2(G, max_iter=60, barnes_hut_optimize=True)
    assert np.isfinite(df[["x", "y"]].to_numpy()).all()
    pos = df.sort_values("vertex")[["x", "y"]].to_numpy()
    # mean intra-community distance well under the global spread
    intra = np.mean([np.linalg.norm(pos[c * sz:(c + 1) * sz]
                                    - pos[c * sz:(c + 1) * sz].mean(0), axis=1).mean()
                     for c in range(n_comm)])
    spread = np.mean(np.linalg.norm(pos - pos.mean(0), axis=1))
    assert intra < spread * 0.8


def test_bundled_public_datasets():
    """Bundled benchmark datasets (reference datasets/*.csv parity) load and
    run algorithms end-to-end."""
    from cugraph_tpu import datasets

    for name, nv in [("dolphins", 62), ("polbooks", 105),
                     ("toy_graph", 6), ("small_line", 10)]:
        ds = next(d for d in datasets.get_all_datasets() if d.name == name)
        G = ds.get_graph()
        assert G.number_of_vertices() == nv, (name, G.number_of_vertices())
    pr = ctpu.pagerank(datasets.dolphins.get_graph())
    assert len(pr) == 62 and np.isfinite(pr["pagerank"]).all()


def test_convenience_constructors_and_exports():
    """Module-level constructor/exporter parity (cugraph convert_matrix.py)."""
    df = pd.DataFrame({"source": [0, 1, 2], "destination": [1, 2, 0],
                       "w": [1.0, 2.0, 3.0]})
    G = ctpu.from_pandas_edgelist(df, edge_attr="w")
    assert G.number_of_edges() == 3 and ctpu.is_weighted(G)

    A = np.array([[0, 1.5, 0], [0, 0, 2.0], [1.0, 0, 0]])
    Gd = ctpu.from_numpy_array(A, create_using=ctpu.Graph(directed=True))
    assert Gd.number_of_edges() == 3
    back = ctpu.to_numpy_array(Gd, nodelist=[0, 1, 2])
    np.testing.assert_allclose(back, A)

    Ga = ctpu.from_adjlist(np.array([0, 2, 3, 3]), np.array([1, 2, 0]),
                           create_using=ctpu.Graph(directed=True))
    assert Ga.number_of_edges() == 3

    el = ctpu.to_pandas_edgelist(G)
    assert {"src", "dst"} <= set(el.columns)

    adj = ctpu.to_pandas_adjacency(Gd)
    assert adj.shape == (3, 3)


def test_convenience_bfs_variants_and_ego():
    G, Gnx = karate()
    df = ctpu.bfs_edges(G, 0)
    assert "distance" in df.columns

    ms = ctpu.multi_source_bfs(G, [0, 33])
    assert {"distance_0", "distance_33",
            "predecessor_0", "predecessor_33"} <= set(ms.columns)
    ref0 = nx.single_source_shortest_path_length(Gnx, 0)
    got = dict(zip(ms["vertex"], ms["distance_0"]))
    assert all(got[v] == d for v, d in ref0.items())

    [cf] = ctpu.concurrent_bfs([G], [[0]])
    assert "distance_0" in cf.columns

    ego = ctpu.ego_graph(G, 0, radius=1)
    ref = nx.ego_graph(Gnx, 0, radius=1)
    assert ego.number_of_vertices() == ref.number_of_nodes()

    sp = ctpu.shortest_path(G, 0)
    assert "distance" in sp.columns


def test_bipartite_graph_and_predicates():
    B = ctpu.BiPartiteGraph()
    B.add_nodes_from([0, 1], bipartite=0)
    B.add_nodes_from([2, 3], bipartite=1)
    B.from_edgelist(np.array([0, 1]), np.array([2, 3]), None)
    s0, s1 = B.sets()
    assert ctpu.is_bipartite(B) and not ctpu.is_directed(B)
    assert ctpu.experimental is not None


def test_ego_graph_preserves_directedness_and_isolated_center():
    """Regression: ego_graph built its result via type(G)() (dropping
    directed=True → symmetrized edges) and fabricated a (n, n) self-loop
    for an isolated center."""
    src = np.array([0, 1, 2])
    dst = np.array([1, 2, 3])
    G = ctpu.Graph(directed=True)
    G.from_edgelist(src, dst, None, vertices=np.arange(6), renumber=False)

    ego = ctpu.ego_graph(G, 0, radius=1)
    assert ego.is_directed()
    es, ed, _ = ego.edgelist_arrays()
    pairs = set(zip(ego.number_map.to_external(es),
                    ego.number_map.to_external(ed)))
    assert pairs == {(0, 1)}  # no reversed (1, 0) edge

    iso = ctpu.ego_graph(G, 5, radius=1)   # vertex 5 has no edges
    assert iso.number_of_edges() == 0
    assert iso.number_of_vertices() == 1
    assert iso.is_directed()


def test_multi_source_bfs_batched_panel(monkeypatch):
    """Panel msbfs: distances match nx per source; predecessors form valid
    BFS trees; depth_limit caps; >128 sources span multiple panels; the
    interpreted Pallas panel agrees."""
    rng = np.random.default_rng(31)
    src = rng.integers(0, 140, 700)
    dst = rng.integers(0, 140, 700)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    G = ctpu.Graph(directed=True)
    G.from_edgelist(src, dst, None)
    Gx = nx.DiGraph(list(zip(src.tolist(), dst.tolist())))
    sources = list(range(130))  # two panels
    ms = ctpu.multi_source_bfs(G, sources)
    INF = np.iinfo(np.int32).max
    edge_set = set(zip(src.tolist(), dst.tolist()))
    for s in (0, 5, 129):
        ref = nx.single_source_shortest_path_length(Gx, s)
        got = dict(zip(ms["vertex"], ms[f"distance_{s}"]))
        preds = dict(zip(ms["vertex"], ms[f"predecessor_{s}"]))
        for v in Gx.nodes:
            if v in ref:
                assert got[v] == ref[v], (s, v)
                if ref[v] > 0:
                    p = preds[v]
                    assert (p, v) in edge_set and got[p] == got[v] - 1
            else:
                assert got[v] == INF

    ms2 = ctpu.multi_source_bfs(G, [0], depth_limit=1)
    d = dict(zip(ms2["vertex"], ms2["distance_0"]))
    assert all(v == INF or v <= 1 for v in d.values())

    monkeypatch.setenv("CUGRAPH_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("CUGRAPH_TPU_PALLAS_MIN_EDGES", "1")
    G2 = ctpu.Graph(directed=True)
    G2.from_edgelist(src, dst, None)
    ms3 = ctpu.multi_source_bfs(G2, [0, 5])
    assert (ms3.sort_values("vertex")["distance_5"].to_numpy()
            == ms.sort_values("vertex")["distance_5"].to_numpy()).all()


def test_experimental_bicliques_and_scc():
    """find_bicliques: a planted (machines x features) biclique plus noise
    must surface as cluster 0 with correct membership and bad_ratio;
    strong_connected_component resolves to stable SCC."""
    import pandas as pd

    from cugraph_tpu.experimental import find_bicliques, \
        strong_connected_component

    machines = list(range(12))
    feats = [100, 101, 102, 103]
    rows = [(m, f, 1 if m == 0 else 0) for m in machines for f in feats]
    rows += [(50, 100, 0), (51, 101, 0)]  # noise shares single features
    df = pd.DataFrame(rows, columns=["src", "dst", "flag"])
    B, S = find_bicliques(df, k=3, support=1.0, min_features=2,
                          min_machines=10)
    assert len(S) >= 1
    s0 = S.iloc[0]
    got_m = set(B[(B["id"] == 0) & (B["type"] == 0)]["vert"])
    got_f = set(B[(B["id"] == 0) & (B["type"] == 1)]["vert"])
    # the planted machines all carry every planted feature; noise machines
    # fail the support threshold
    assert set(machines) <= got_m and got_f == set(feats)
    assert s0["machines"] == len(got_m) and s0["features"] == len(got_f)
    assert abs(s0["bad_ratio"] - 1 / s0["total"]) < 1e-9

    G = ctpu.Graph(directed=True)
    G.from_edgelist(np.array([0, 1, 2, 3]), np.array([1, 2, 0, 3]), None)
    df2 = strong_connected_component(G)
    lab = dict(zip(df2["vertex"], df2["labels"]))
    assert lab[0] == lab[1] == lab[2] != lab[3]


def test_force_atlas2_callback_protocol():
    """callback= steps the kernel per epoch and fires the reference's
    GraphBasedDimRedCallback hooks with [n,2] host arrays; the final
    positions equal the no-callback run (same adaptive-speed carry)."""
    from cugraph_tpu.internals import GraphBasedDimRedCallback

    src = np.array([0, 1, 2, 3, 4, 0])
    dst = np.array([1, 2, 3, 4, 0, 2])
    G = ctpu.Graph()
    G.from_edgelist(src, dst, None)

    calls = {"pre": 0, "epoch": 0, "end": 0}

    class Rec(GraphBasedDimRedCallback):
        def on_preprocess_end(self, positions):
            calls["pre"] += 1
            assert positions.shape == (5, 2)

        def on_epoch_end(self, positions):
            calls["epoch"] += 1

        def on_train_end(self, positions):
            calls["end"] += 1

    df_cb = ctpu.force_atlas2(G, max_iter=7, callback=Rec(), random_state=3)
    assert calls == {"pre": 1, "epoch": 7, "end": 1}
    df = ctpu.force_atlas2(G, max_iter=7, random_state=3)
    np.testing.assert_allclose(df_cb[["x", "y"]].to_numpy(),
                               df[["x", "y"]].to_numpy(), rtol=1e-4,
                               atol=1e-4)


def test_get_traversed_cost():
    """Path-sum retrieval (pointer doubling) vs a manual predecessor walk,
    including an unreachable vertex (dtype max) and the source (0)."""
    from cugraph_tpu.utils import get_traversed_cost

    src = np.array([0, 1, 1, 2, 5])
    dst = np.array([1, 2, 3, 4, 6])
    w = np.array([1.0, 2.0, 4.0, 8.0, 1.0], np.float32)
    G = ctpu.Graph()
    G.from_edgelist(src, dst, w)
    r = ctpu.sssp(G, 0).sort_values("vertex").reset_index(drop=True)
    out = get_traversed_cost(r, 0, src, dst, w).sort_values("vertex")
    info = dict(zip(out["vertex"], out["info"]))
    assert info[0] == 0.0
    assert info[1] == 1.0 and info[2] == 3.0 and info[3] == 5.0
    assert info[4] == 11.0
    assert info[5] == np.finfo(np.float32).max  # unreachable from 0
    import pytest
    with pytest.raises(ValueError, match="vertex"):
        get_traversed_cost(r.drop(columns=["vertex"]), 0, src, dst, w)


def test_graph_class_long_tail():
    """Tree / NPartiteGraph / density / MultiGraph.density parity
    (reference graph_classes.py:801-877)."""
    import pytest

    G = ctpu.Graph(directed=True)
    G.from_edgelist(np.array([0, 1]), np.array([1, 2]), None)
    assert abs(G.density() - 2 / 6) < 1e-12
    Gu = ctpu.Graph()
    Gu.from_edgelist(np.array([0, 1]), np.array([1, 2]), None)
    assert abs(Gu.density() - 2 * 2 / 6) < 1e-12

    M = ctpu.MultiGraph()
    M.from_edgelist(np.array([0, 0]), np.array([1, 1]), None)
    assert M.is_multigraph()
    with pytest.raises(TypeError):
        M.density()

    T = ctpu.Tree()
    assert T.tree and not T.is_directed()

    NP = ctpu.NPartiteGraph()
    NP.add_nodes_from([0, 1], multipartite="a")
    NP.add_nodes_from([2, 3], multipartite="b")
    assert NP.is_multipartite() and not NP.is_bipartite()
    assert set(NP.sets()) == {"a", "b"}
    with pytest.raises(TypeError):
        NP.add_nodes_from([4], bipartite=0)  # not constructed bipartite


def test_graph_method_surface_parity():
    """Reference Graph-method aliases: from_cudf_edgelist/adjlist,
    unrenumber/add_internal_vertex_id, add_nodes_from registering isolated
    vertices, has_isolated_vertices, predicates."""
    import pandas as pd

    df = pd.DataFrame({"source": [10, 20], "destination": [20, 30],
                       "w": [1.5, 2.5]})
    G = ctpu.Graph(directed=True)
    G.from_cudf_edgelist(df, edge_attr="w")
    assert G.is_weighted() and G.number_of_edges() == 2
    assert not G.is_bipartite() and not G.is_multi_gpu() and not G.is_remote()
    assert not G.has_isolated_vertices()

    r = ctpu.bfs(G, 10)
    internal = G.add_internal_vertex_id(r[["vertex"]].copy(), "iv", "vertex")
    back = G.unrenumber(internal.rename(columns={"iv": "v"}), "v")
    assert set(back["v"]) == {10, 20, 30}

    G2 = ctpu.Graph()
    G2.add_nodes_from([0, 1, 2, 3, 99])
    G2.from_edgelist(np.array([0, 1]), np.array([1, 2]), None)
    assert G2.number_of_vertices() == 5 and G2.has_isolated_vertices()

    G3 = ctpu.Graph(directed=True)
    G3.from_cudf_adjlist(np.array([0, 2, 3, 3]), np.array([1, 2, 0]))
    assert G3.number_of_edges() == 3

    B = ctpu.BiPartiteGraph()
    B.add_nodes_from([0, 1, 7], bipartite=0)  # 7 stays isolated
    B.add_nodes_from([2, 3], bipartite=1)
    B.from_edgelist(np.array([0, 1]), np.array([2, 3]), None)
    assert B.number_of_vertices() == 5 and B.has_isolated_vertices()


def test_dataset_api_surface():
    """Reference Dataset methods: unload/get_path/is_symmetric/
    number_of_vertices/get_dask_* aliases + module download fns."""
    from cugraph_tpu import datasets as ds

    d = ds.dolphins
    p = d.get_path()
    assert p is not None and p.endswith("dolphins.csv")
    assert d.number_of_vertices() == d.number_of_nodes() == 62
    assert not d.is_multigraph() and not d.is_symmetric()
    e1 = d.get_edgelist()
    d.unload()
    e2 = d.get_dask_edgelist()
    assert len(e1) == len(e2)
    g = d.get_dask_graph()
    assert g.number_of_vertices() == 62
    assert ds.karate.get_path() is None  # generator-backed
    ds.set_download_dir("/tmp/x")
    assert ds.get_download_dir() == "/tmp/x"
    ds.set_download_dir(None)
    assert ds.get_download_dir().endswith("data")


def test_reference_import_paths():
    """Code written against the reference's import layout must keep
    working: cugraph.<sub> subpackages map to cugraph_tpu.<sub>."""
    from cugraph_tpu.centrality import betweenness_centrality  # noqa: F401
    from cugraph_tpu.community import louvain as comm_louvain
    from cugraph_tpu.components import connected_components  # noqa: F401
    from cugraph_tpu.cores import core_number  # noqa: F401
    from cugraph_tpu.dask import pagerank as dask_pagerank  # noqa: F401
    from cugraph_tpu.layout import force_atlas2  # noqa: F401
    from cugraph_tpu.linear_assignment import hungarian  # noqa: F401
    from cugraph_tpu.link_analysis import pagerank as la_pagerank
    from cugraph_tpu.link_prediction import all_pairs_jaccard  # noqa: F401
    from cugraph_tpu.sampling import node2vec_random_walks  # noqa: F401
    from cugraph_tpu.structure import (NumberMap,  # noqa: F401
                                       replicate_cudf_dataframe, symmetrize)
    from cugraph_tpu.traversal import shortest_path_length  # noqa: F401
    from cugraph_tpu.tree import maximum_spanning_tree  # noqa: F401

    assert comm_louvain is ctpu.louvain and la_pagerank is ctpu.pagerank
    df = pd.DataFrame({"a": [1]})
    assert replicate_cudf_dataframe(df) is df


def test_review_fixes_algos_long_tail():
    """Review regressions: MIS/coloring terminate on self-loop graphs;
    edge-id lookup rejects out-of-range ids instead of aliasing across
    types; FA2 honors edge_weight_influence; max spanning tree rejects
    directed input; symmetrize only infers conventionally-named weights."""
    import pytest

    # self-loop graph: MIS must terminate and exclude no valid structure
    G = ctpu.Graph()
    G.from_edgelist(np.array([0, 0, 1]), np.array([0, 1, 2]), None)
    mis = ctpu.maximal_independent_set(G)
    assert len(mis) >= 1
    vc = ctpu.vertex_coloring(G)
    assert len(vc) == 3

    # lookup: out-of-range id must be -1, not another type's edge
    G2 = ctpu.Graph(directed=True)
    G2.from_edgelist(np.array([0, 1]), np.array([1, 2]), None,
                     edge_id=np.array([0, 2]),
                     edge_type=np.array([0, 1]))
    t = ctpu.EdgeIdLookupTable(G2)
    r = t.lookup_vertex_ids([5], edge_type=0)  # 0*3+5 would alias (1,2)
    assert r["src"].iloc[0] == -1 and r["dst"].iloc[0] == -1

    # FA2 influence=0 must ignore weights: equals the unweighted layout
    src = np.array([0, 1, 2, 3, 0]); dst = np.array([1, 2, 3, 0, 2])
    w = np.array([100.0, 0.01, 5.0, 1.0, 2.0], np.float32)
    Gw = ctpu.Graph(); Gw.from_edgelist(src, dst, w)
    Gu = ctpu.Graph(); Gu.from_edgelist(src, dst, None)
    lw = ctpu.force_atlas2(Gw, max_iter=30, edge_weight_influence=0.0,
                           random_state=5).sort_values("vertex")
    lu = ctpu.force_atlas2(Gu, max_iter=30, random_state=5) \
        .sort_values("vertex")
    np.testing.assert_allclose(lw[["x", "y"]].to_numpy(),
                               lu[["x", "y"]].to_numpy(), rtol=1e-4,
                               atol=1e-4)

    Gd = ctpu.Graph(directed=True)
    Gd.from_edgelist(np.array([0, 1]), np.array([1, 2]),
                     np.array([1.0, 2.0], np.float32))
    with pytest.raises(ValueError, match="undirected"):
        ctpu.maximum_spanning_tree(Gd)

    import pandas as pd
    df = pd.DataFrame({"src": [0, 1], "dst": [1, 2], "etype": [7, 8]})
    out = ctpu.symmetrize(df)
    assert "weight" not in out.columns  # etype must NOT become weights


def test_symmetrize_columns_returns_tuple():
    """Column input → column tuple (the reference symmetrize() contract,
    symmetrize.py:262); the DataFrame branch keeps returning a frame
    (symmetrize_df analog).  Example 28 rotted against this before the
    examples smoke test existed."""
    s, d = np.array([0, 1]), np.array([1, 2])
    out = ctpu.symmetrize(s, d)
    assert isinstance(out, tuple) and len(out) == 2
    pairs = set(zip(out[0].tolist(), out[1].tolist()))
    assert pairs == {(0, 1), (1, 0), (1, 2), (2, 1)}
    w = np.array([0.5, 2.0], np.float32)
    s2, d2, w2 = ctpu.symmetrize(s, d, w)
    assert len(s2) == len(w2) == 4


def test_multi_source_bfs_serial_strategy_matches_panel(monkeypatch):
    """The serial-device strategy (round 5: fori_loop of SpMV level sweeps,
    faster on large graphs where the panel SpMM plan fragments) must
    produce identical distances/predecessors to the panel strategy."""
    monkeypatch.setenv("CUGRAPH_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("CUGRAPH_TPU_PALLAS_MIN_EDGES", "1")
    rng = np.random.default_rng(2)
    src = rng.integers(0, 90, 500)
    dst = rng.integers(0, 90, 500)
    G = ctpu.Graph(directed=True)
    G.from_edgelist(src, dst, None)
    a = ctpu.multi_source_bfs(G, [0, 5, 7], strategy="serial")
    b = ctpu.multi_source_bfs(G, [0, 5, 7], strategy="panel")
    for c in a.columns:
        np.testing.assert_array_equal(a[c].to_numpy(), b[c].to_numpy(), c)
    with pytest.raises(ValueError, match="strategy"):
        ctpu.multi_source_bfs(G, [0], strategy="bogus")


def test_from_adjlist_keeps_isolated_rows_and_multigraph_to_directed():
    """Round-5 review regressions: (1) CSR constructors name every row a
    vertex — zero-degree rows must survive; (2) MultiGraph.to_directed
    keeps parallel edges (a plain Graph conversion deduped them)."""
    G = ctpu.from_adjlist(np.array([0, 1, 1, 1]), np.array([1]))
    assert G.number_of_vertices() == 3  # vertex 2 is isolated but real

    M = ctpu.MultiGraph(directed=False)
    M.from_edgelist(np.array([0, 0]), np.array([1, 1]),
                    np.array([1.0, 2.0], np.float32))
    D = M.to_directed()
    assert isinstance(D, ctpu.MultiGraph)
    # both directions of both parallel edges survive (4 arcs); the old
    # plain-Graph conversion deduped them to 2
    assert D.number_of_edges() == 2 * M.number_of_edges()


def test_extract_paths_weighted_hops_and_khop_cycle_seed():
    """Round-5 review regressions: (1) SSSP paths whose hop count exceeds
    int(max distance)+1 must not overflow the row width; (2) a seed on a
    cycle of length <= k is part of its own k-hop neighborhood."""
    # dist 0.5 over TWO hops: row width must come from chain length
    G = ctpu.Graph(directed=True)
    G.from_edgelist(np.array([0, 1]), np.array([1, 2]),
                    np.array([0.25, 0.25], np.float32))
    out = ctpu.sssp(G, 0)
    df, flat, max_len = ctpu.extract_bfs_paths(G, out, [2])
    assert max_len >= 3
    assert flat[:3].tolist() == [0, 1, 2]

    # seeds are ALWAYS excluded (documented contract: nx cutoff minus
    # the seeds — cycle re-inclusion would trivially re-add every seed of
    # an undirected graph at k >= 2)
    T = ctpu.Graph(directed=True)
    T.from_edgelist(np.array([0, 1, 2]), np.array([1, 2, 0]), None)
    kh = ctpu.k_hop_neighbors(T, 0, 3)
    assert 0 not in set(kh["vertex"].tolist())
    assert set(kh["vertex"].tolist()) == {1, 2}


def test_leiden_modularity_consistent_with_analyze_on_self_loops():
    """Leiden's reported q must use the same doubled-self-loop convention
    as louvain and analyzeClustering_modularity (round-5 review)."""
    rng = np.random.default_rng(0)
    src = np.concatenate([rng.integers(0, 20, 100), [3, 7]])
    dst = np.concatenate([rng.integers(0, 20, 100), [3, 7]])  # self-loops
    G = ctpu.Graph(directed=False)
    G.from_edgelist(src, dst, None)
    df, q = ctpu.leiden(G, random_state=0)
    q2 = ctpu.analyzeClustering_modularity(
        G, df["partition"].nunique(), df, "vertex", "partition")
    assert abs(q - q2) < 1e-4, (q, q2)
