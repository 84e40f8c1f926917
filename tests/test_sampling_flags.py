"""sampling_flags_t semantics + the post-processing compression matrix.

Reference: sampling_functions.hpp:36-76 (prior_sources_behavior /
dedupe_sources / return_hops), :900-1015
(renumber_and_compress_sampled_edgelist), prepare_next_frontier_impl.cuh
(per-label frontiers).
"""

import numpy as np
import pandas as pd
import pytest

import cugraph_tpu as ct
from cugraph_tpu.parallel import (build_dist_graph, make_mesh_2d,
                                  mg_uniform_neighbor_sample)


def _path_plus_fan(n_fan=4):
    """0 → {1..n_fan}; every fan vertex → 100; 100 → 0 (a cycle back)."""
    src = np.concatenate([np.zeros(n_fan, np.int64),
                          np.arange(1, n_fan + 1), [100]])
    dst = np.concatenate([np.arange(1, n_fan + 1),
                          np.full(n_fan, 100), [0]])
    G = ct.Graph(directed=True)
    G.from_edgelist(src, dst, None, vertices=np.arange(101), renumber=False)
    return G


def test_frontier_multiplicity_default():
    """A vertex reached r times in one batch is passed r times (reference:
    dedupe only 'if dedupe_sources')."""
    G = _path_plus_fan(4)
    df = ct.uniform_neighbor_sample(G, [0], [4, 4], with_replacement=False,
                                    random_state=0,
                                    batch_id_list=[7])
    h1 = df[df.hop_id == 1]
    # hop0 emits 4 edges into distinct fan vertices; each fan vertex has ONE
    # out-neighbor (100), so hop 1 must emit exactly 4 rows (4 sources × 1)
    assert len(h1) == 4
    assert set(h1.destinations) == {100}
    # hop 2 would then carry vertex 100 with multiplicity 4
    df2 = ct.uniform_neighbor_sample(G, [0], [4, 4, 1],
                                     with_replacement=False, random_state=0,
                                     batch_id_list=[7])
    h2 = df2[df2.hop_id == 2]
    assert len(h2) == 4 and set(h2.sources) == {100} \
        and set(h2.destinations) == {0}
    assert set(df2.batch_id) == {7}


def test_dedupe_sources():
    G = _path_plus_fan(4)
    df = ct.uniform_neighbor_sample(G, [0], [4, 4, 1],
                                    with_replacement=False, random_state=0,
                                    dedupe_sources=True)
    # with dedupe, vertex 100 is passed once → one hop-2 row
    assert len(df[df.hop_id == 2]) == 1


def test_prior_sources_exclude():
    G = _path_plus_fan(2)
    # cycle 0 → fan → 100 → 0: with EXCLUDE, 0 (a prior source) never
    # re-enters the frontier, so no hop-3 rows out of 0
    df = ct.uniform_neighbor_sample(G, [0], [2, 2, 1, 2],
                                    with_replacement=False, random_state=0,
                                    prior_sources_behavior="exclude")
    assert len(df[df.hop_id == 3]) == 0
    # DEFAULT revisits 0 and samples again
    df2 = ct.uniform_neighbor_sample(G, [0], [2, 2, 1, 2],
                                     with_replacement=False, random_state=0)
    assert len(df2[df2.hop_id == 3]) > 0


def test_prior_sources_carry_over():
    G = _path_plus_fan(2)
    df = ct.uniform_neighbor_sample(G, [0], [2, 1],
                                    with_replacement=False, random_state=0,
                                    prior_sources_behavior="carry_over")
    # hop 1 frontier carries 0 over → 0 samples again at hop 1
    h1 = df[df.hop_id == 1]
    assert (h1.sources == 0).any() and (h1.sources != 0).any()


def test_return_hops_false_drops_column():
    G = _path_plus_fan(2)
    df = ct.uniform_neighbor_sample(G, [0], [2, 1], with_replacement=False,
                                    return_hops=False, random_state=0)
    assert "hop_id" not in df.columns


def test_batches_sample_independently():
    """Two batches seeded at the same vertex each get their own tree."""
    G = _path_plus_fan(4)
    df = ct.uniform_neighbor_sample(G, [0, 0], [2], with_replacement=False,
                                    random_state=0, batch_id_list=[3, 9])
    assert set(df.batch_id) == {3, 9}
    assert (df.batch_id == 3).sum() == 2 and (df.batch_id == 9).sum() == 2


def test_mg_sampler_flags_and_props(mesh=None):
    import jax

    mesh = make_mesh_2d(4, 2, jax.devices()[:8])
    src = np.concatenate([np.zeros(4, np.int64), np.arange(1, 5), [100]])
    dst = np.concatenate([np.arange(1, 5), np.full(4, 100), [0]])
    w = (src * 10 + dst).astype(np.float32)
    et = ((src + dst) % 3).astype(np.int32)
    g = build_dist_graph(src, dst, w, 101, 4, 2, store_push=True,
                         edge_type=et)
    df = mg_uniform_neighbor_sample(g, mesh, [0], [4, 4, 1],
                                    with_replacement=False, seed=1,
                                    with_edge_properties=True,
                                    batch_id_list=[5])
    # multiplicity: hop 2 carries vertex 100 four times
    assert len(df[df.hop_id == 2]) == 4
    assert set(df.batch_id) == {5}
    # edge properties looked up correctly
    expect_w = df.sources.to_numpy() * 10 + df.destinations.to_numpy()
    np.testing.assert_allclose(df.weight.to_numpy(), expect_w)
    np.testing.assert_array_equal(
        df.edge_type.to_numpy(),
        (df.sources.to_numpy() + df.destinations.to_numpy()) % 3)
    # dedupe_sources collapses the hop-2 multiplicity
    df2 = mg_uniform_neighbor_sample(g, mesh, [0], [4, 4, 1],
                                     with_replacement=False, seed=1,
                                     dedupe_sources=True)
    assert len(df2[df2.hop_id == 2]) == 1
    # exclude: the 100 → 0 → fan re-entry is cut
    df3 = mg_uniform_neighbor_sample(g, mesh, [0], [4, 4, 1, 4],
                                     with_replacement=False, seed=1,
                                     prior_sources_behavior="exclude")
    assert len(df3[df3.hop_id == 3]) == 0
    # return_hops=False
    df4 = mg_uniform_neighbor_sample(g, mesh, [0], [2],
                                     with_replacement=False, seed=1,
                                     return_hops=False)
    assert "hop_id" not in df4.columns


def test_temporal_fanout_minus_one_takes_all_eligible():
    """fanout -1 = all eligible neighbors on the masked (het/temporal) path
    too — it used to silently skip the hop."""
    src = np.array([0, 1, 2, 0, 3, 3])
    dst = np.array([1, 2, 3, 3, 4, 5])
    times = np.array([1.0, 2.0, 3.0, 0.5, 4.0, 2.5], np.float32)
    G = ct.Graph(directed=True)
    G.from_edgelist(src, dst, None, edge_time=times, renumber=False)
    df = ct.homogeneous_uniform_temporal_neighbor_sample(
        G, [0], [-1, -1, -1], seed_time=0.0, strict=True, random_state=0)
    assert {1, 2, 3, 4, 5} <= set(df["destinations"])
    # MG refuses -1 explicitly instead of silently skipping
    import jax
    from cugraph_tpu.parallel import mg_temporal_neighbor_sample

    mesh = make_mesh_2d(4, 2, jax.devices()[:8])
    g = build_dist_graph(src, dst, None, 6, 4, 2, store_push=True,
                         edge_time=times)
    with pytest.raises(ValueError):
        mg_temporal_neighbor_sample(g, mesh, [0], [-1])


def test_plc_mg_sampler_attaches_edge_ids():
    import jax
    from cugraph_tpu.plc import ResourceHandle, MGGraph
    from cugraph_tpu.plc.algorithms import homogeneous_uniform_neighbor_sample

    mesh = make_mesh_2d(4, 2, jax.devices()[:8])
    src = np.concatenate([np.zeros(4, np.int64), np.arange(1, 5)])
    dst = np.concatenate([np.arange(1, 5), np.full(4, 20)])
    eid = src * 1000 + dst
    g = MGGraph(ResourceHandle(mesh=mesh), None, src, dst, None,
                edge_id_array=eid)
    df = homogeneous_uniform_neighbor_sample(
        None, g, [0], h_fan_out=[4, 1], with_edge_properties=True,
        random_state=0)
    assert "edge_id" in df.columns and len(df) == 8
    np.testing.assert_array_equal(
        df.edge_id.to_numpy(),
        df.sources.to_numpy() * 1000 + df.destinations.to_numpy())


def test_mg_device_multihop_matches_layered_path():
    """The fused device-resident sampler (one kernel, frontier mask on
    device) must reproduce the layered per-hop path EXACTLY under its
    gating config (dedupe_sources, one batch, default prior): same seed →
    identical RNG folds → identical samples."""
    import jax
    from cugraph_tpu.parallel.sampling_mg import (_mg_neighbor_sample_core,
                                                  _mg_sample_device_path)

    mesh = make_mesh_2d(4, 2, jax.devices()[:8])
    rng = np.random.default_rng(17)
    n, m = 120, 900
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.uniform(0.5, 2.0, len(src)).astype(np.float32)
    g = build_dist_graph(src, dst, w, n, 4, 2, store_push=True)
    seeds = [3, 40, 99]
    for biased, wr in ((False, False), (True, True)):
        df_fast = mg_uniform_neighbor_sample(
            g, mesh, seeds, [4, 3], seed=5, dedupe_sources=True,
            with_replacement=wr, biased=biased,
            batch_id_list=[2, 2, 2], with_edge_properties=True)
        plans = [[(None, 4)], [(None, 3)]]
        df_ref = _mg_neighbor_sample_core(
            g, mesh, seeds, plans, seed=5, with_replacement=wr,
            biased=biased, dedupe_sources=True, batch_id_list=[2, 2, 2],
            with_edge_properties=True)
        key = lambda d: sorted(zip(d.hop_id, d.sources, d.destinations))
        assert key(df_fast) == key(df_ref), (biased, wr)
        assert set(df_fast.batch_id) == {2}
        np.testing.assert_allclose(
            np.sort(df_fast.weight.to_numpy()),
            np.sort(df_ref.weight.to_numpy()))
    # gate: multiplicities (no dedupe) must stay on the layered path
    df_multi = mg_uniform_neighbor_sample(g, mesh, [3, 3], [2, 2], seed=1)
    assert len(set(df_multi.batch_id)) == 2


def test_plc_mg_edge_ids_symmetrized_and_sharded():
    """Round-3 review findings: (a) the edge-id table must cover mirrored
    edges on symmetrize=True graphs; (b) the sharded build must construct
    the table in INTERNAL id space (it previously never built one)."""
    import jax
    from cugraph_tpu.plc import ResourceHandle, MGGraph
    from cugraph_tpu.plc.algorithms import homogeneous_uniform_neighbor_sample

    mesh = make_mesh_2d(4, 2, jax.devices()[:8])
    src = np.arange(0, 8, dtype=np.int64)
    dst = np.arange(1, 9, dtype=np.int64)
    eid = np.arange(100, 108, dtype=np.int64)
    # (a) symmetrized: sampling walks BOTH directions
    g = MGGraph(ResourceHandle(mesh=mesh), None, src, dst, None,
                symmetrize=True, edge_id_array=eid)
    df = homogeneous_uniform_neighbor_sample(
        None, g, [4], h_fan_out=[2, 2], with_edge_properties=True,
        random_state=0)
    assert "edge_id" in df.columns and len(df) > 0
    # every looked-up id matches the input edge in either direction
    by_pair = {}
    for s, d, i in zip(src, dst, eid):
        by_pair[(s, d)] = i
        by_pair[(d, s)] = i
    for s, d, i in zip(df.sources, df.destinations, df.edge_id):
        assert by_pair[(int(s), int(d))] == i

    # (b) sharded build: external ids, internal-keyed table
    ext = np.array([10**9 + 5 * k for k in range(9)], np.int64)
    g2 = MGGraph(ResourceHandle(mesh=mesh), None,
                 np.array_split(ext[:8], 8), np.array_split(ext[1:], 8),
                 None, build="sharded",
                 edge_id_array=np.array_split(eid, 8))
    df2 = homogeneous_uniform_neighbor_sample(
        None, g2, g2.number_map.to_internal(ext[:1]), h_fan_out=[1],
        with_edge_properties=True, random_state=0)
    assert "edge_id" in df2.columns and len(df2) == 1
    s_ext = g2.number_map.to_external(df2.sources.to_numpy())
    d_ext = g2.number_map.to_external(df2.destinations.to_numpy())
    k = np.flatnonzero((ext[:8] == s_ext[0]) & (ext[1:] == d_ext[0]))
    assert eid[k[0]] == df2.edge_id.iloc[0]

    # has_vertex consults the sharded number map (external id space)
    from cugraph_tpu.plc.algorithms import has_vertex
    got = has_vertex(None, g2, np.array([ext[0], ext[0] + 1]))
    np.testing.assert_array_equal(got, [True, False])


def test_plc_mg_temporal_strict_forwarded():
    import jax
    from cugraph_tpu.plc import ResourceHandle, MGGraph
    from cugraph_tpu.plc.algorithms import (
        homogeneous_uniform_temporal_neighbor_sample)

    mesh = make_mesh_2d(4, 2, jax.devices()[:8])
    src = np.array([0, 1]); dst = np.array([1, 2])
    tm = np.array([0.0, 0.0], np.float32)  # times EQUAL to seed_time
    g = MGGraph(ResourceHandle(mesh=mesh), None, src, dst, None,
                edge_start_time_array=tm)
    # strict=True: time must EXCEED 0.0 → nothing sampled
    d1 = homogeneous_uniform_temporal_neighbor_sample(
        None, g, "t", [0], [0.0], None, [1, 1], strict=True, random_state=0)
    assert len(d1) == 0
    # strict=False (>=) reaches 1 then 2 — was silently dropped before
    d2 = homogeneous_uniform_temporal_neighbor_sample(
        None, g, "t", [0], [0.0], None, [1, 1], strict=False, random_state=0)
    assert set(d2["destinations"]) == {1, 2}


def test_mg_negative_sampling_vertices_and_exact(mesh=None):
    import jax
    from cugraph_tpu.parallel import mg_negative_sampling

    mesh = make_mesh_2d(4, 2, jax.devices()[:8])
    rng = np.random.default_rng(2)
    src = rng.integers(0, 40, 200); dst = rng.integers(0, 40, 200)
    keep = src != dst
    g = build_dist_graph(src[keep], dst[keep], None, 40, 4, 2,
                         store_push=True)
    cand = np.arange(10, 20)
    df = mg_negative_sampling(g, mesh, 30, seed=3, vertices=cand,
                              exact_number_of_samples=True)
    assert len(df) == 30
    assert df["src"].isin(cand).all() and df["dst"].isin(cand).all()


# ---------------------------------------------------------------------------
# compression matrix round-trips
# ---------------------------------------------------------------------------

def _toy_frame():
    rng = np.random.default_rng(3)
    rows = []
    for b in (0, 1):
        seeds = [b * 50, b * 50 + 1]
        cur = seeds
        for hop in range(3):
            nxt = []
            for s in cur:
                for _ in range(2):
                    d = int(rng.integers(0, 100))
                    rows.append((s, d, hop, b))
                    nxt.append(d)
            cur = nxt
    df = pd.DataFrame(rows, columns=["sources", "destinations", "hop_id",
                                     "batch_id"])
    df["weight"] = rng.random(len(df)).astype(np.float32)
    df["edge_id"] = np.arange(len(df), dtype=np.int64)
    df["edge_type"] = rng.integers(0, 3, len(df)).astype(np.int32)
    return df


def _decode(out, df, src_is_major, compress_per_hop, doubly):
    """Reconstruct the per-label edge multiset from the compressed output."""
    num_labels = len(out["renumber_map_offsets"]) - 1
    lho = out["label_hop_offsets"]
    segs = len(lho) - 1
    per_label_segs = segs // num_labels
    edges = []
    minor_pos = 0
    nzd_pos = 0
    for li in range(num_labels):
        m0, m1 = out["renumber_map_offsets"][li], \
            out["renumber_map_offsets"][li + 1]
        vmap = out["renumber_map"][m0:m1]
        for sj in range(per_label_segs):
            si = li * per_label_segs + sj
            offs = out["major_offsets"][lho[si]:lho[si + 1]]
            counts = np.diff(offs)
            if doubly:
                nz = out["majors"][nzd_pos:nzd_pos + len(counts)]
                nzd_pos += len(counts)
                majors_r = np.repeat(nz, counts)
            else:
                majors_r = np.repeat(np.arange(len(counts)), counts)
            k = int(counts.sum())
            minors_r = out["minors"][minor_pos:minor_pos + k]
            w = out["weight"][minor_pos:minor_pos + k]
            eid = out["edge_id"][minor_pos:minor_pos + k]
            et = out["edge_type"][minor_pos:minor_pos + k]
            minor_pos += k
            for a, bb, ww, ii, tt in zip(vmap[majors_r], vmap[minors_r],
                                         w, eid, et):
                edges.append((li, int(a), int(bb), float(np.float32(ww)),
                              int(ii), int(tt)))
    expect = []
    for _, r in df.iterrows():
        a, bb = ((r.sources, r.destinations) if src_is_major
                 else (r.destinations, r.sources))
        expect.append((int(r.batch_id), int(a), int(bb),
                       float(np.float32(r.weight)), int(r.edge_id),
                       int(r.edge_type)))
    assert sorted(edges) == sorted(expect)


@pytest.mark.parametrize("src_is_major", [True, False])
@pytest.mark.parametrize("mode", ["plain", "per_hop", "doubly"])
def test_compress_matrix_roundtrip(src_is_major, mode):
    df = _toy_frame()
    out = ct.renumber_and_compress_sampled_edgelist(
        df, src_is_major=src_is_major,
        compress_per_hop=(mode == "per_hop"),
        doubly_compress=(mode == "doubly"))
    _decode(out, df, src_is_major, mode == "per_hop", mode == "doubly")
    # renumber invariant: seeds (hop-0 majors) take the lowest ids per label
    for li in (0, 1):
        m0 = out["renumber_map_offsets"][li]
        grp = df[df.batch_id == li]
        mj = "sources" if src_is_major else "destinations"
        hop0_majors = set(grp[grp.hop_id == 0][mj])
        lead = set(out["renumber_map"][m0:m0 + len(hop0_majors)])
        assert lead == hop0_majors


def test_compress_per_hop_requires_hops():
    df = _toy_frame().drop(columns=["hop_id"])
    with pytest.raises(ValueError):
        ct.renumber_and_compress_sampled_edgelist(df, compress_per_hop=True)
    with pytest.raises(ValueError):
        ct.renumber_and_compress_sampled_edgelist(
            _toy_frame(), compress_per_hop=True, doubly_compress=True)


def _parity_graph():
    rng = np.random.default_rng(23)
    n, m = 120, 900
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.uniform(0.5, 2.0, len(src)).astype(np.float32)
    return build_dist_graph(src, dst, w, n, 4, 2, store_push=True)


def test_mg_device_multihop_multibatch_parity():
    """Round-4 generalization: the fused sampler's batch-keyed mask planes
    + in-kernel canonical occurrence layering must reproduce the layered
    path bit-for-bit for MULTI-batch dedupe configs — including vertices
    shared between batches (different RNG layer per occurrence)."""
    import jax
    from cugraph_tpu.parallel.sampling_mg import (_mg_neighbor_sample_core,
                                                  _plan_fused)

    mesh = make_mesh_2d(4, 2, jax.devices()[:8])
    g = _parity_graph()
    # vertex 7 is in all three batches; 40 in two
    starts = [7, 40, 3, 7, 40, 99, 7, 11]
    bl = [0, 0, 0, 4, 4, 4, 9, 9]
    for biased in (False, True):
        df_fast = mg_uniform_neighbor_sample(
            g, mesh, starts, [3, 2], seed=11, dedupe_sources=True,
            biased=biased, batch_id_list=bl, with_edge_properties=True)
        df_ref = _mg_neighbor_sample_core(
            g, mesh, starts, [[(None, 3)], [(None, 2)]], seed=11,
            with_replacement=False, biased=biased, dedupe_sources=True,
            batch_id_list=bl, with_edge_properties=True)
        key = lambda d: sorted(zip(d.hop_id, d.batch_id, d.sources,
                                   d.destinations))
        assert key(df_fast) == key(df_ref), biased
        assert set(df_fast.batch_id) == {0, 4, 9}
    # the config really took the fused path
    from cugraph_tpu.parallel.sampling_mg import _flag_kwargs

    flags = _flag_kwargs(dict(dedupe_sources=True, batch_id_list=bl))
    assert _plan_fused(g, mesh, starts, [3, 2], flags) is not None


@pytest.mark.parametrize("behavior", ["exclude", "carry_over", "carryover"])
def test_mg_device_multihop_prior_behavior_parity(behavior):
    """exclude / carry_over prior_sources_behavior on the fused device
    path: mask algebra on the planes must equal FrontierState's key-set
    rules, with identical RNG draws."""
    import jax
    from cugraph_tpu.parallel.sampling_mg import (_mg_neighbor_sample_core,
                                                  _plan_fused, _flag_kwargs)

    mesh = make_mesh_2d(4, 2, jax.devices()[:8])
    g = _parity_graph()
    starts = [7, 40, 3, 99]
    bl = [0, 0, 5, 5]
    flags = _flag_kwargs(dict(dedupe_sources=True, batch_id_list=bl,
                              prior_sources_behavior=behavior))
    assert _plan_fused(g, mesh, starts, [3, 2, 2], flags) is not None
    df_fast = mg_uniform_neighbor_sample(
        g, mesh, starts, [3, 2, 2], seed=4, dedupe_sources=True,
        batch_id_list=bl, prior_sources_behavior=behavior)
    df_ref = _mg_neighbor_sample_core(
        g, mesh, starts, [[(None, 3)], [(None, 2)], [(None, 2)]], seed=4,
        with_replacement=False, biased=False, dedupe_sources=True,
        batch_id_list=bl, prior_sources_behavior=behavior)
    key = lambda d: sorted(zip(d.hop_id, d.batch_id, d.sources,
                               d.destinations))
    assert key(df_fast) == key(df_ref)
    if behavior == "exclude":
        # no hop re-samples a vertex already used as a source in its batch
        seen = {}
        for h in sorted(set(df_fast.hop_id)):
            hopf = df_fast[df_fast.hop_id == h]
            for b in set(hopf.batch_id):
                srcs = set(hopf[hopf.batch_id == b].sources)
                assert not (srcs & seen.get(b, set()))
                seen.setdefault(b, set()).update(srcs)


def test_mg_device_multihop_single_readback():
    """The fused path's contract: ONE device→host transfer per call
    (jax.device_get of every hop's compacted keys+rows at once)."""
    import jax
    import cugraph_tpu.parallel.sampling_mg as smg

    mesh = make_mesh_2d(4, 2, jax.devices()[:8])
    g = _parity_graph()
    calls = []
    real = jax.device_get

    def counting(x):
        calls.append(1)
        return real(x)

    jax.device_get = counting
    try:
        df = mg_uniform_neighbor_sample(
            g, mesh, [7, 40, 3], [3, 2, 2], seed=2, dedupe_sources=True,
            batch_id_list=[0, 1, 1])
    finally:
        jax.device_get = real
    assert len(df) > 0
    assert len(calls) == 1, calls


def test_mg_fused_default_batches_are_per_seed():
    """Regression (round-4 review): with batch_id_list=None every seed is
    its OWN batch (FrontierState / SG arange default) — the fused gate must
    not merge them into one plane (it briefly mapped None → zeros, changing
    batch_id labels AND the merged-frontier RNG stream)."""
    import jax
    from cugraph_tpu.parallel.sampling_mg import _mg_neighbor_sample_core

    mesh = make_mesh_2d(4, 2, jax.devices()[:8])
    g = _parity_graph()
    seeds = [3, 40, 99]
    df = mg_uniform_neighbor_sample(g, mesh, seeds, [3, 2], seed=21,
                                    dedupe_sources=True)
    assert set(df.batch_id) == {0, 1, 2}
    df_ref = _mg_neighbor_sample_core(
        g, mesh, seeds, [[(None, 3)], [(None, 2)]], seed=21,
        with_replacement=False, biased=False, dedupe_sources=True)
    key = lambda d: sorted(zip(d.hop_id, d.batch_id, d.sources,
                               d.destinations))
    assert key(df) == key(df_ref)


def test_plc_het_legacy_call_keeps_vertex_type_offsets():
    """Regression (round-4 review): a legacy-shaped heterogeneous call
    (fanout in the positional label-offsets slot) with EXPLICIT keyword
    num_edge_types + vertex_type_offsets must still run the segmented
    heterogeneous renumber, not silently drop the offsets."""
    from cugraph_tpu import plc

    rng = np.random.default_rng(8)
    src = rng.integers(0, 40, 300)
    dst = rng.integers(0, 40, 300)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    et = ((src + dst) % 2).astype(np.int32)
    h = plc.ResourceHandle()
    g = plc.SGGraph(h, plc.GraphProperties(), src, dst, None,
                    renumber=False, vertices_array=np.arange(40),
                    edge_type_array=et)
    out = plc.heterogeneous_uniform_neighbor_sample(
        h, g, np.array([0, 1]), np.array([2, 2], np.int32),
        num_edge_types=2, vertex_type_offsets=np.array([0, 20, 40]),
        renumber=True, return_hops=True, random_state=3)
    # the heterogeneous (segmented) renumber ran: per-(label, vertex-type)
    # map offsets, L*2 types + 1 entries
    assert out["renumber_map_offsets"] is not None
    assert len(out["renumber_map_offsets"]) % 2 == 1
    assert out["label_type_hop_offsets"] is not None


def test_mg_device_multihop_group_chunked_parity():
    """Round-5: >16 batches chunk into ≤16-plane GROUPS with cross-group
    occurrence-layer offsets (lbase) — outputs must stay bit-identical to
    the layered host path, including vertices shared between batches that
    land in DIFFERENT groups (their RNG layer is the GLOBAL canonical
    rank, not the within-group one)."""
    import jax
    from cugraph_tpu.parallel.sampling_mg import (_mg_neighbor_sample_core,
                                                  _flag_kwargs, _plan_fused)

    mesh = make_mesh_2d(4, 2, jax.devices()[:8])
    g = _parity_graph()
    # 40 batches (one per seed, bl=None default); vertex 7 occurs in
    # batches 2, 20 and 38 (groups 0, 1, 2), vertex 40 in batches 5 and 25
    rng = np.random.default_rng(1)
    starts = rng.integers(0, 120, 40).tolist()
    starts[2] = starts[20] = starts[38] = 7
    starts[5] = starts[25] = 40
    flags = _flag_kwargs(dict(dedupe_sources=True))
    plan = _plan_fused(g, mesh, starts, [3, 2], flags)
    assert plan is not None and len(plan["groups"]) == 3
    for biased in (False, True):
        df_fast = mg_uniform_neighbor_sample(
            g, mesh, starts, [3, 2], seed=11, dedupe_sources=True,
            biased=biased, with_edge_properties=True)
        df_ref = _mg_neighbor_sample_core(
            g, mesh, starts, [[(None, 3)], [(None, 2)]], seed=11,
            with_replacement=False, biased=biased, dedupe_sources=True,
            with_edge_properties=True)
        key = lambda d: sorted(zip(d.hop_id, d.batch_id, d.sources,
                                   d.destinations,
                                   np.round(d.weight.to_numpy(), 5)))
        assert key(df_fast) == key(df_ref), biased


@pytest.mark.parametrize(
    "comparison", [None, "monotonically_increasing", "last"])
def test_mg_temporal_fused_matches_layered(comparison):
    """Round-5: temporal configs fuse (arrival-time planes min-reduced
    across the mesh per hop) — outputs must be bit-identical to the
    layered host path, whose dedupe keeps the canonical MIN arrival time
    per (batch, vertex).  Covers multi-batch frontiers with vertices
    shared across batches and multiple comparison modes."""
    import jax
    from cugraph_tpu.parallel.sampling_mg import (_mg_neighbor_sample_core,
                                                  _flag_kwargs, _plan_fused,
                                                  mg_temporal_neighbor_sample)

    mesh = make_mesh_2d(4, 2, jax.devices()[:8])
    rng = np.random.default_rng(23)
    n, m = 120, 900
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.uniform(0.5, 2.0, len(src)).astype(np.float32)
    tm = rng.uniform(0.0, 10.0, len(src)).astype(np.float32)
    g = build_dist_graph(src, dst, w, n, 4, 2, store_push=True,
                         edge_time=tm)
    starts = [7, 40, 3, 7, 40, 99, 7, 11]
    bl = [0, 0, 0, 4, 4, 4, 9, 9]
    flags = _flag_kwargs(dict(dedupe_sources=True, batch_id_list=bl))
    assert _plan_fused(g, mesh, starts, [3, 2], flags,
                       temporal=True) is not None
    kw = {} if comparison is None \
        else {"temporal_sampling_comparison": comparison}
    df_fast = mg_temporal_neighbor_sample(
        g, mesh, starts, [3, 2], seed=11, seed_time=1.0,
        dedupe_sources=True, batch_id_list=bl, **kw)
    df_ref = _mg_neighbor_sample_core(
        g, mesh, starts, [[(None, 3)], [(None, 2)]], seed=11,
        with_replacement=False, biased=False, dedupe_sources=True,
        batch_id_list=bl, temporal=True, seed_time=1.0,
        temporal_sampling_comparison=comparison)
    key = lambda d: sorted(zip(d.hop_id, d.batch_id, d.sources,
                               d.destinations,
                               np.round(d.edge_time.to_numpy(), 5)))
    assert key(df_fast) == key(df_ref), comparison
    # times gate the walk: every hop-1 edge's time obeys the regime
    assert set(df_fast.columns) >= {"sources", "destinations", "edge_time",
                                    "hop_id", "batch_id"}
