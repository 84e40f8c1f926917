"""Distributed shuffle primitive: routing + keyed reduction on the CPU mesh."""

import jax
import numpy as np
import pytest

from cugraph_tpu.parallel.mesh import make_mesh_2d
from cugraph_tpu.parallel.partition import Partition2D
from cugraph_tpu.parallel.shuffle import shuffle_reduce_by_key, shuffle_to_owners


@pytest.fixture(scope="module")
def mesh():
    return make_mesh_2d(4, 2, jax.devices()[:8])


def test_shuffle_routes_to_owner(mesh):
    part = Partition2D.create(100, 4, 2)
    rng = np.random.default_rng(0)
    total = part.num_devices * 64
    keys = np.full(total, -1, np.int32)
    m = 300
    keys[:m] = rng.integers(0, 100, m)
    payload = np.where(keys >= 0, keys.astype(np.float32) * 2.0, 0.0)

    ko, po = shuffle_to_owners(mesh, part, keys, payload)
    ko, po = np.asarray(ko), np.asarray(po)
    per_dev = len(ko) // part.num_devices
    for d in range(part.num_devices):
        i, j = d // part.pmin, d % part.pmin
        lo, hi = part.owned_range(i, j)
        sl = ko[d * per_dev:(d + 1) * per_dev]
        got = sl[sl >= 0]
        # every delivered key belongs to this device
        assert np.all((got >= lo) & (got < hi))
        # payload rode along
        ps = po[d * per_dev:(d + 1) * per_dev]
        np.testing.assert_allclose(ps[sl >= 0], got * 2.0)
    # nothing lost
    delivered = np.sort(ko[ko >= 0])
    np.testing.assert_array_equal(delivered, np.sort(keys[keys >= 0]))


def test_shuffle_capacity_retry(mesh):
    # all keys target ONE device → guaranteed first-round overflow
    part = Partition2D.create(100, 4, 2)
    total = part.num_devices * 64
    keys = np.full(total, -1, np.int32)
    keys[:200] = 3  # owner of vertex 3 gets everything
    payload = np.ones(total, np.float32)
    ko, po = shuffle_to_owners(mesh, part, keys, payload, capacity=8)
    ko = np.asarray(ko)
    assert (ko == 3).sum() == 200


def test_shuffle_reduce_by_key(mesh):
    part = Partition2D.create(50, 4, 2)
    rng = np.random.default_rng(1)
    total = part.num_devices * 128
    keys = np.full(total, -1, np.int32)
    m = 500
    keys[:m] = rng.integers(0, 50, m)
    vals = np.zeros(total, np.float32)
    vals[:m] = rng.random(m).astype(np.float32)

    out = np.asarray(shuffle_reduce_by_key(mesh, part, keys, vals, op="sum"))
    expect = np.zeros(part.pad_v, np.float64)
    np.add.at(expect, keys[:m], vals[:m].astype(np.float64))
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)
