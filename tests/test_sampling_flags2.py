"""Round-3b sampling-surface parity: the 5 temporal comparison modes,
disjoint_sampling validation, the pyx kwarg spellings, and the plc sampler
OUTPUT options (renumber / compression / retain_seeds).

Reference: sampling_functions.hpp:38-46 temporal_sampling_comparison_t,
heterogeneous_biased_temporal_neighbor_sample.pyx:160-220.
"""

import jax
import numpy as np
import pytest

import cugraph_tpu as ct
from cugraph_tpu.parallel import (build_dist_graph, make_mesh_2d,
                                  mg_temporal_neighbor_sample)
from cugraph_tpu.plc import ResourceHandle, SGGraph
from cugraph_tpu.plc import algorithms as plc


def _time_graph():
    # star 5 → {0..3} with times 1,2,3,4
    src = np.full(4, 5)
    dst = np.arange(4)
    tm = (dst + 1).astype(np.float32)
    G = ct.Graph(directed=True)
    G.from_edgelist(src, dst, None, edge_time=tm, renumber=False)
    return G, src, dst, tm


@pytest.mark.parametrize("mode,seed_t,expect", [
    ("strictly_increasing", 2.0, {2, 3}),      # t > 2 → times 3,4
    ("monotonically_increasing", 2.0, {1, 2, 3}),
    ("strictly_decreasing", 3.0, {0, 1}),       # t < 3 → times 1,2
    ("monotonically_decreasing", 3.0, {0, 1, 2}),
])
def test_temporal_comparison_modes_sg(mode, seed_t, expect):
    G, *_ = _time_graph()
    df = ct.homogeneous_uniform_temporal_neighbor_sample(
        G, [5], [-1], seed_time=seed_t, random_state=0,
        temporal_sampling_comparison=mode)
    assert set(df["destinations"]) == expect, mode


def test_temporal_last_mode_sg():
    """'last' = deterministic recency: the k MOST RECENT past edges."""
    G, *_ = _time_graph()
    df = ct.homogeneous_uniform_temporal_neighbor_sample(
        G, [5], [2], seed_time=10.0, random_state=0,
        temporal_sampling_comparison="last")
    # most recent two past edges have times 4 and 3 → dsts 3 and 2
    assert set(df["destinations"]) == {2, 3}


@pytest.mark.parametrize("mode,seed_t,expect", [
    ("strictly_increasing", 2.0, {2, 3}),
    ("monotonically_decreasing", 3.0, {0, 1, 2}),
])
def test_temporal_comparison_modes_mg(mode, seed_t, expect):
    mesh = make_mesh_2d(4, 2, jax.devices()[:8])
    src = np.full(4, 5)
    dst = np.arange(4)
    tm = (dst + 1).astype(np.float32)
    g = build_dist_graph(src, dst, None, 6, 4, 2, store_push=True,
                         edge_time=tm)
    df = mg_temporal_neighbor_sample(g, mesh, [5], [4], seed_time=seed_t,
                                     seed=0, with_replacement=False,
                                     temporal_sampling_comparison=mode)
    assert set(df["destinations"]) == expect, mode


def test_temporal_last_mode_mg():
    mesh = make_mesh_2d(4, 2, jax.devices()[:8])
    src = np.full(4, 5)
    dst = np.arange(4)
    tm = (dst + 1).astype(np.float32)
    g = build_dist_graph(src, dst, None, 6, 4, 2, store_push=True,
                         edge_time=tm)
    df = mg_temporal_neighbor_sample(g, mesh, [5], [2], seed_time=10.0,
                                     seed=0, with_replacement=False,
                                     temporal_sampling_comparison="last")
    assert set(df["destinations"]) == {2, 3}


def test_disjoint_false_raises_on_temporal():
    G, *_ = _time_graph()
    with pytest.raises(ValueError):
        ct.homogeneous_uniform_temporal_neighbor_sample(
            G, [5], [2], seed_time=0.0, disjoint_sampling=False)
    mesh = make_mesh_2d(4, 2, jax.devices()[:8])
    g = build_dist_graph(np.full(4, 5), np.arange(4), None, 6, 4, 2,
                         store_push=True,
                         edge_time=np.arange(1, 5, dtype=np.float32))
    with pytest.raises(ValueError):
        mg_temporal_neighbor_sample(g, mesh, [5], [2],
                                    disjoint_sampling=False)


def test_deduplicate_sources_alias():
    src = np.concatenate([np.zeros(4, np.int64), np.arange(1, 5), [100]])
    dst = np.concatenate([np.arange(1, 5), np.full(4, 100), [0]])
    G = ct.Graph(directed=True)
    G.from_edgelist(src, dst, None, vertices=np.arange(101), renumber=False)
    a = ct.uniform_neighbor_sample(G, [0], [4, 4, 1],
                                   with_replacement=False, random_state=0,
                                   deduplicate_sources=True)
    b = ct.uniform_neighbor_sample(G, [0], [4, 4, 1],
                                   with_replacement=False, random_state=0,
                                   dedupe_sources=True)
    assert len(a) == len(b) and len(a[a.hop_id == 2]) == 1


def test_carryover_spelling():
    src = np.array([0, 1]); dst = np.array([1, 2])
    G = ct.Graph(directed=True)
    G.from_edgelist(src, dst, None, renumber=False)
    df = ct.uniform_neighbor_sample(G, [0], [1, 1], with_replacement=False,
                                    random_state=0,
                                    prior_sources_behavior="carryover")
    h1 = df[df.hop_id == 1]
    assert (h1.sources == 0).any()  # 0 carried into hop 1


def test_plc_sampler_renumber_compression_outputs():
    rng = np.random.default_rng(6)
    src = rng.integers(0, 40, 300)
    dst = rng.integers(0, 40, 300)
    keep = src != dst
    g = SGGraph(ResourceHandle(), None, src[keep], dst[keep], None)
    for compression in ("COO", "CSR", "CSC", "DCSR"):
        out = plc.homogeneous_uniform_neighbor_sample(
            None, g, [1, 2, 3], h_fan_out=[3, 2], random_state=0,
            renumber=True, compression=compression)
        assert isinstance(out, dict), compression
        assert "renumber_map" in out and "minors" in out
        if compression == "COO":
            assert out["majors"] is not None and \
                len(out["majors"]) == len(out["minors"])
        elif compression.startswith("D"):
            assert out["majors"] is not None
        else:
            assert out["majors"] is None
    # retain_seeds: a seed with no outgoing edges still enters the map
    g2 = SGGraph(ResourceHandle(), None, np.array([0]), np.array([1]), None,
                 vertices_array=np.arange(3))
    out = plc.homogeneous_uniform_neighbor_sample(
        None, g2, [0, 2], h_fan_out=[1], random_state=0,
        renumber=True, retain_seeds=True, batch_id_list=[0, 0])
    assert 2 in set(out["renumber_map"])  # isolated seed retained
    out2 = plc.homogeneous_uniform_neighbor_sample(
        None, g2, [0, 2], h_fan_out=[1], random_state=0, renumber=True)
    assert 2 not in set(out2["renumber_map"])


def test_mg_last_mode_negative_times_and_distinct_k():
    """Review regressions: 'last' scores are raw edge times, so (a) times
    ≤ -1 must still be selectable (the uniform path's -1.0 sentinel was
    masking them) and (b) with_replacement must still return the k DISTINCT
    most recent edges (it re-picked t_max k times)."""
    mesh = make_mesh_2d(4, 2, jax.devices()[:8])
    src = np.full(4, 5)
    dst = np.arange(4)
    tm = np.array([-5.0, -4.0, -3.0, -2.0], np.float32)
    g = build_dist_graph(src, dst, None, 6, 4, 2, store_push=True,
                         edge_time=tm)
    df = mg_temporal_neighbor_sample(g, mesh, [5], [2], seed_time=0.0,
                                     seed=0, with_replacement=True,
                                     temporal_sampling_comparison="last")
    # two most recent past edges: times -2 (dst 3) and -3 (dst 2)
    assert sorted(df["destinations"]) == [2, 3]


def test_plc_temporal_renumber_output():
    """Review regression: the temporal plc wrappers must honor the output
    options (they silently returned plain frames)."""
    src = np.full(4, 5)
    dst = np.arange(4)
    tm = (dst + 1).astype(np.float32)
    g = SGGraph(ResourceHandle(), None, src, dst, None,
                edge_start_time_array=tm)
    out = plc.homogeneous_uniform_temporal_neighbor_sample(
        None, g, "t", [5], [0.0], None, [2], random_state=0,
        renumber=True, compression="CSR")
    assert isinstance(out, dict) and "renumber_map" in out


def test_retain_seeds_label_with_no_edges():
    """Review regression: a batch label whose seeds sampled NOTHING must
    still get a renumber-map segment under retain_seeds."""
    g = SGGraph(ResourceHandle(), None, np.array([0]), np.array([1]), None,
                vertices_array=np.arange(3))
    out = plc.homogeneous_uniform_neighbor_sample(
        None, g, [0, 2], h_fan_out=[1], random_state=0,
        renumber=True, retain_seeds=True, batch_id_list=[0, 1])
    # label 1 (seed 2, no out-edges) still present
    assert len(out["renumber_map_offsets"]) == 3
    m1 = out["renumber_map"][out["renumber_map_offsets"][1]:
                             out["renumber_map_offsets"][2]]
    assert 2 in set(m1)


def test_coo_label_hop_offsets_are_edge_offsets():
    rng = np.random.default_rng(4)
    src = rng.integers(0, 30, 200)
    dst = rng.integers(0, 30, 200)
    keep = src != dst
    g = SGGraph(ResourceHandle(), None, src[keep], dst[keep], None)
    out = plc.homogeneous_uniform_neighbor_sample(
        None, g, [1, 2], h_fan_out=[3, 2], random_state=0,
        renumber=True, compression="COO", batch_id_list=[0, 1])
    lho = out["label_hop_offsets"]
    assert lho[-1] == len(out["minors"]) == len(out["majors"])
    assert (np.diff(lho) >= 0).all()


def test_plc_mg_nontemporal_ignores_temporal_kwarg():
    """Review regression: temporal_sampling_comparison passed to a
    NON-temporal MG sampler must be ignored like the SG branch, not
    TypeError."""
    mesh = make_mesh_2d(4, 2, jax.devices()[:8])
    from cugraph_tpu.plc import MGGraph
    g = MGGraph(ResourceHandle(mesh=mesh), None, np.array([0, 1]),
                np.array([1, 2]), None)
    df = plc.homogeneous_uniform_neighbor_sample(
        None, g, [0], h_fan_out=[1], random_state=0,
        temporal_sampling_comparison="last")
    assert len(df) == 1


def test_mg_device_gate_validates_batch_list():
    from cugraph_tpu.parallel import mg_uniform_neighbor_sample as mg_s

    mesh = make_mesh_2d(4, 2, jax.devices()[:8])
    g = build_dist_graph(np.array([0, 1]), np.array([1, 2]), None, 3, 4, 2,
                         store_push=True)
    with pytest.raises(ValueError):
        mg_s(g, mesh, [0, 1], [1], dedupe_sources=True, batch_id_list=[])
