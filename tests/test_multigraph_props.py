"""Instance-exact sampled edge properties on multigraphs.

The reference gathers the sampled edge INSTANCE's own property
(cpp/src/sampling/detail/gather_one_hop_impl.cuh, sample_edges_impl.cuh) —
parallel edges with distinct weight/type/time must come back with the
property of the instance the sampler actually traversed, not the first
(src, dst) key match.  Round-5 fix: edge ids ride the sampling kernels.
"""

import numpy as np
import pytest

import jax

import cugraph_tpu as ct
from cugraph_tpu.parallel import (build_dist_graph, make_mesh_2d,
                                  mg_uniform_neighbor_sample)


def _parallel_graph_arrays():
    """0→1 twice (w=1, w=2; types 10/11; times 1.0/2.0) and 0→2 (w=3)."""
    src = np.array([0, 0, 0], np.int64)
    dst = np.array([1, 1, 2], np.int64)
    w = np.array([1.0, 2.0, 3.0], np.float32)
    et = np.array([10, 11, 12], np.int32)
    tm = np.array([1.0, 2.0, 3.0], np.float32)
    return src, dst, w, et, tm


def test_mg_layered_sampler_instance_exact_weights():
    """Without replacement, fanout 3 selects ALL THREE edge instances of
    vertex 0 — the returned weight multiset must be {1, 2, 3}, not the
    first-key-match duplicate."""
    mesh = make_mesh_2d(4, 2, jax.devices()[:8])
    src, dst, w, et, tm = _parallel_graph_arrays()
    g = build_dist_graph(src, dst, w, 8, 4, 2, store_push=True,
                         edge_type=et, edge_time=tm)
    df = mg_uniform_neighbor_sample(g, mesh, [0], [3],
                                    with_replacement=False, seed=3,
                                    with_edge_properties=True)
    assert sorted(df["destinations"].tolist()) == [1, 1, 2]
    assert sorted(df["weight"].tolist()) == [1.0, 2.0, 3.0]
    assert sorted(df["edge_type"].tolist()) == [10, 11, 12]
    assert sorted(df["edge_time"].tolist()) == [1.0, 2.0, 3.0]


def test_mg_fused_sampler_instance_exact_weights():
    """Same law through the fused device path (dedupe_sources config)."""
    mesh = make_mesh_2d(4, 2, jax.devices()[:8])
    src, dst, w, _, _ = _parallel_graph_arrays()
    g = build_dist_graph(src, dst, w, 8, 4, 2, store_push=True)
    df = mg_uniform_neighbor_sample(g, mesh, [0], [3],
                                    with_replacement=False, seed=3,
                                    dedupe_sources=True,
                                    with_edge_properties=True)
    assert sorted(df["destinations"].tolist()) == [1, 1, 2]
    assert sorted(df["weight"].tolist()) == [1.0, 2.0, 3.0]


def test_sg_multigraph_sampler_instance_exact_weights():
    """SG MultiGraph: the tile/host paths carry CSR edge indices — the
    weight column must be per-instance there too (regression guard)."""
    src, dst, w, _, _ = _parallel_graph_arrays()
    G = ct.MultiGraph(directed=True)
    G.from_edgelist(src, dst, w)
    df = ct.uniform_neighbor_sample(G, [0], [3], with_replacement=False,
                                    random_state=0)
    assert sorted(df["destinations"].tolist()) == [1, 1, 2]
    assert sorted(df["weight"].tolist()) == [1.0, 2.0, 3.0]


def test_sg_bulk_instance_attribution_is_uniform():
    """The bulk with-replacement prim samples a NEIGHBOR; conditioned on a
    parallel pair the traversed instance is uniform over the instances —
    `_eidx_lookup(..., rng=...)` must draw among ALL parallel matches, not
    pin the first."""
    from cugraph_tpu.algos.sampling import _eidx_lookup

    src, dst, w, _, _ = _parallel_graph_arrays()
    G = ct.MultiGraph(directed=True)
    G.from_edgelist(src, dst, w)
    g = G.structure
    srcs = np.zeros(400, np.int64)
    dsts = np.ones(400, np.int64)
    rng = np.random.default_rng(0)
    eidx = _eidx_lookup(g, srcs, dsts, rng=rng)
    wts = np.asarray(
        np.asarray(jax.device_get(g.csr.weights))[eidx])
    seen = set(np.round(wts, 3).tolist())
    assert seen == {1.0, 2.0}, seen
    frac = float(np.mean(wts == 1.0))
    assert 0.3 < frac < 0.7  # ~Binomial(400, 1/2)


def test_mg_attach_props_fallback_raises_on_ambiguous_multigraph():
    """Without eid blocks (store_eid=False), the first-match fallback must
    REFUSE distinct-property parallel edges instead of silently returning
    the wrong instance's property."""
    mesh = make_mesh_2d(4, 2, jax.devices()[:8])
    src, dst, w, _, _ = _parallel_graph_arrays()
    g = build_dist_graph(src, dst, w, 8, 4, 2, store_push=True,
                         store_eid=False)
    with pytest.raises(ValueError, match="parallel edge"):
        mg_uniform_neighbor_sample(g, mesh, [0], [3],
                                   with_replacement=False, seed=3,
                                   with_edge_properties=True)


def test_shard_dist_graph_preserves_eid():
    """shard_dist_graph must carry eid (review finding: it rebuilt
    EdgeBlocks without it, silently losing instance-exactness for every
    sharded graph — the plc MGGraph path)."""
    from cugraph_tpu.parallel.mesh import make_mesh_2d, shard_dist_graph

    mesh = make_mesh_2d(4, 2, jax.devices()[:8])
    src, dst, w, _, _ = _parallel_graph_arrays()
    g = build_dist_graph(src, dst, w, 8, 4, 2, store_push=True)
    assert g.push.eid is not None
    gs = shard_dist_graph(g, mesh)
    assert gs.push.eid is not None
    df = mg_uniform_neighbor_sample(gs, mesh, [0], [3],
                                    with_replacement=False, seed=3,
                                    with_edge_properties=True)
    assert sorted(df["weight"].tolist()) == [1.0, 2.0, 3.0]


def test_attach_props_fallback_only_rejects_ambiguous_samples():
    """Without eid blocks, sampling AWAY from the distinct-property
    parallel pair must still succeed — only touching the ambiguous pair
    raises (review finding: the old check refused the whole graph)."""
    mesh = make_mesh_2d(4, 2, jax.devices()[:8])
    src, dst, w, _, _ = _parallel_graph_arrays()
    # add an unambiguous corner of the graph: 5→6, 5→7
    src = np.concatenate([src, [5, 5]])
    dst = np.concatenate([dst, [6, 7]])
    w = np.concatenate([w, [9.0, 8.0]]).astype(np.float32)
    g = build_dist_graph(src, dst, w, 8, 4, 2, store_push=True,
                         store_eid=False)
    ok = mg_uniform_neighbor_sample(g, mesh, [5], [2],
                                    with_replacement=False, seed=1,
                                    with_edge_properties=True)
    assert sorted(ok["weight"].tolist()) == [8.0, 9.0]
    with pytest.raises(ValueError, match="parallel edge"):
        mg_uniform_neighbor_sample(g, mesh, [0], [3],
                                   with_replacement=False, seed=3,
                                   with_edge_properties=True)
