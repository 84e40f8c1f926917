"""plc infra parity: internal_types (SamplingResult/COO/EdgeIdLookupResult)
and the comms bootstrap shims (comms_wrapper.init_subcomms, cugraph_comms_*).

Reference surfaces: pylibcugraph/internal_types/{sampling_result,coo,
edge_id_lookup_result}.pyx, pylibcugraph/comms/{comms_wrapper.pyx,
cugraph_nccl_comms.py}.
"""

import numpy as np
import pytest

from cugraph_tpu import plc


def _small_graph(store_transposed=False, with_props=True):
    src = np.array([0, 0, 1, 1, 2, 3, 3, 4], np.int64)
    dst = np.array([1, 2, 2, 3, 4, 4, 0, 1], np.int64)
    kw = {}
    if with_props:
        kw = dict(weight_array=np.arange(1, 9, dtype=np.float32),
                  edge_id_array=np.arange(8, dtype=np.int64),
                  edge_type_array=np.zeros(8, np.int32))
    return plc.SGGraph(plc.ResourceHandle(), plc.GraphProperties(),
                       src, dst, store_transposed=store_transposed, **kw)


def test_sampling_result_frame_accessors():
    G = _small_graph()
    out = plc.homogeneous_uniform_neighbor_sample(
        plc.ResourceHandle(), G, np.array([0, 1]), h_fan_out=np.array([2, 2]),
        with_replacement=False, random_state=7, with_edge_properties=True,
        return_hops=True)
    res = plc.SamplingResult(out)
    majors, minors = res.get_majors(), res.get_minors()
    assert majors is not None and minors is not None
    assert len(majors) == len(minors) > 0
    # deprecated aliases route to the same arrays
    np.testing.assert_array_equal(res.get_sources(), majors)
    np.testing.assert_array_equal(res.get_destinations(), minors)
    assert res.get_edge_weights() is not None
    np.testing.assert_array_equal(res.get_indices(), res.get_edge_weights())
    assert res.get_hop() is not None
    # absent fields are None, like the pyx NULL checks
    assert res.get_renumber_map() is None
    assert res.get_major_offsets() is None


def test_sampling_result_renumbered_accessors():
    G = _small_graph()
    out = plc.homogeneous_uniform_neighbor_sample(
        plc.ResourceHandle(), G, np.array([0, 1]), h_fan_out=np.array([2, 2]),
        with_replacement=False, random_state=7, with_edge_properties=True,
        renumber=True, compression="CSR", batch_id_list=np.array([0, 0]))
    res = plc.SamplingResult(out)
    assert res.get_major_offsets() is not None
    assert res.get_minors() is not None
    assert res.get_renumber_map() is not None
    assert res.get_renumber_map_offsets() is not None
    assert res.get_label_hop_offsets() is not None
    np.testing.assert_array_equal(res.get_offsets(),
                                  res.get_label_hop_offsets())


def test_coo_and_lookup_result_types():
    coo = plc.COO(np.array([0, 1]), np.array([1, 2]),
                  edge_ids=np.array([5, 6]))
    np.testing.assert_array_equal(coo.get_sources(), [0, 1])
    np.testing.assert_array_equal(coo.get_destinations(), [1, 2])
    np.testing.assert_array_equal(coo.get_edge_ids(), [5, 6])
    assert coo.get_edge_types() is None and coo.get_edge_weights() is None

    r = plc.EdgeIdLookupResult(np.array([3]), np.array([4]))
    np.testing.assert_array_equal(r.get_sources(), [3])
    np.testing.assert_array_equal(r.get_destinations(), [4])


def test_init_subcomms_builds_grid():
    import jax

    from cugraph_tpu.plc.comms import init_subcomms

    n = len(jax.devices())
    handle = plc.ResourceHandle()
    init_subcomms(handle, 2)
    assert handle.mesh.devices.shape == (2, n // 2)
    assert handle.mesh.axis_names == ("major", "minor")
    with pytest.raises(ValueError):
        init_subcomms(plc.ResourceHandle(), 3 if n % 3 else n + 1)

    # an MGGraph built on the bootstrapped handle runs end to end
    src = np.array([0, 1, 2, 3], np.int64)
    dst = np.array([1, 2, 3, 0], np.int64)
    G = plc.MGGraph(handle, plc.GraphProperties(), src_array=src,
                    dst_array=dst, store_transposed=True)
    verts, pr = plc.pagerank(handle, G, None, None, None, None,
                             0.85, 1e-10, 100, False)
    np.testing.assert_allclose(np.asarray(pr)[:4], 0.25, atol=1e-6)


def test_cugraph_comms_single_process():
    from cugraph_tpu.plc.comms import (cugraph_comms_create_unique_id,
                                       cugraph_comms_get_raft_handle,
                                       cugraph_comms_init,
                                       cugraph_comms_shutdown)

    uid = cugraph_comms_create_unique_id()
    assert ":" in uid
    handle = cugraph_comms_init(0, 1, uid)
    try:
        assert cugraph_comms_get_raft_handle() is handle
        assert handle.mesh is not None
        with pytest.raises(RuntimeError):
            cugraph_comms_init(0, 1, uid)  # double init, like the reference
    finally:
        cugraph_comms_shutdown()
    assert cugraph_comms_get_raft_handle() is None
