"""Test harness config: force the CPU backend with 8 virtual devices so
multi-chip sharding tests run anywhere (the TPU translation of the reference's
MG test harness bootstrapping MPI+NCCL, cpp/tests/utilities/mg_utilities.cpp:19-46
— here jax's simulated multi-device CPU platform replaces real chips)."""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: large-scale tests (RMAT-18+); run with CUGRAPH_TPU_RUN_SLOW=1")


def pytest_collection_modifyitems(config, items):
    import pytest

    if os.environ.get("CUGRAPH_TPU_RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow; set CUGRAPH_TPU_RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
