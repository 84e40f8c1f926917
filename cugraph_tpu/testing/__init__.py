"""Testing utilities: golden resultsets + multi-device helpers.

Mirrors python/cugraph/cugraph/testing/: resultset.py's golden-result store
(there: a downloaded tarball of NetworkX results; here: computed-on-demand
NetworkX oracles with an on-disk cache) and mg_utils.py's cluster bootstrap
(there: LocalCUDACluster/Dask; here: the virtual-CPU-device mesh).
"""

from __future__ import annotations

import os
import pickle

import numpy as np

_CACHE_DIR = os.environ.get(
    "CUGRAPH_TPU_RESULTSET_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "cugraph_tpu", "resultsets"),
)

DEFAULT_DATASETS = ["karate", "les_miserables", "small_rmat"]

# reference-named dataset re-exports + batch lists (testing/__init__.py:14-60)
from cugraph_tpu.datasets import (  # noqa: E402
    dolphins,
    email_Eu_core,
    karate,
    karate_disjoint,
    netscience,
    polbooks,
    small_line,
    small_tree,
    toy_graph,
    toy_graph_undirected,
)

UNDIRECTED_DATASETS = [karate, dolphins]
SMALL_DATASETS = [karate, dolphins, polbooks]
WEIGHTED_DATASETS = [dolphins, karate, karate_disjoint, netscience,
                     polbooks, small_line, small_tree]
ALL_DATASETS = [dolphins, karate, karate_disjoint, polbooks, netscience,
                small_line, small_tree, email_Eu_core, toy_graph,
                toy_graph_undirected]

from cugraph_tpu.testing.graph500 import (  # noqa: E402
    validate_bfs_tree,
    validate_sssp_tree,
    teps_summary,
)

# dataset root (reference testing/utils.py RAPIDS_DATASET_ROOT_DIR): the
# bundled data directory stands in for the downloaded tarball root
RAPIDS_DATASET_ROOT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "datasets", "data")
RAPIDS_DATASET_ROOT_DIR_PATH = RAPIDS_DATASET_ROOT_DIR


class Resultset:
    """Golden-result container (reference resultset.py:15)."""

    def __init__(self, data_dictionary):
        self._data_dictionary = data_dictionary

    def get_cudf_dataframe(self):
        import pandas as pd

        return pd.DataFrame(self._data_dictionary)


def default_resultset_download_dir():
    return results_dir()


def load_resultset(resultset_name, resultset_download_url=None):
    """Reference resultset.py load_resultset: fetches the golden tarball.
    Here results are computed on demand (no egress) — this just ensures the
    cache directory exists."""
    return results_dir()


def results_dir():
    os.makedirs(_CACHE_DIR, exist_ok=True)
    return _CACHE_DIR


def get_resultset(category: str, **params):
    """Golden result lookup (testing/resultset.py:15 analog).

    Key = (category, sorted params).  On miss, computes the NetworkX oracle
    for known categories and caches it.
    """
    key = category + "__" + "__".join(f"{k}={params[k]}" for k in sorted(params))
    path = os.path.join(results_dir(), key.replace("/", "_") + ".pkl")
    if os.path.exists(path):
        with open(path, "rb") as f:
            return pickle.load(f)
    result = _compute_oracle(category, **params)
    with open(path, "wb") as f:
        pickle.dump(result, f)
    return result


def _nx_graph(dataset: str, directed: bool):
    import networkx as nx

    from cugraph_tpu import datasets as ds

    d = getattr(ds, dataset)
    df = d.get_edgelist()
    cls = nx.DiGraph if directed else nx.Graph
    G = nx.from_pandas_edgelist(df, "src", "dst",
                                edge_attr="wgt" if "wgt" in df else None,
                                create_using=cls)
    return G


def _compute_oracle(category: str, *, dataset="karate", directed=False, **kw):
    import networkx as nx

    G = _nx_graph(dataset, directed)
    if category == "pagerank":
        return nx.pagerank(G, weight=kw.get("weight"))
    if category == "bfs_distances":
        return nx.single_source_shortest_path_length(G, kw["source"])
    if category == "sssp_distances":
        return nx.single_source_dijkstra_path_length(G, kw["source"])
    if category == "wcc":
        return [sorted(c) for c in
                nx.weakly_connected_components(G)] if directed else \
               [sorted(c) for c in nx.connected_components(G)]
    if category == "core_number":
        H = G.copy()
        H.remove_edges_from(nx.selfloop_edges(H))
        return nx.core_number(H)
    if category == "triangle_count":
        return nx.triangles(G)
    raise KeyError(f"no oracle for category {category!r}")


def make_test_mesh(pmaj: int = 4, pmin: int = 2):
    """8-virtual-CPU-device mesh (testing/mg_utils.py:21 start_dask_client
    analog; requires conftest's xla_force_host_platform_device_count)."""
    import jax

    from cugraph_tpu.parallel.mesh import make_mesh_2d

    devs = jax.devices("cpu") if jax.default_backend() != "cpu" else jax.devices()
    assert len(devs) >= pmaj * pmin, (
        "set XLA_FLAGS=--xla_force_host_platform_device_count>=8")
    return make_mesh_2d(pmaj, pmin, devs[: pmaj * pmin])


def assert_frame_allclose(a, b, on="vertex", rtol=1e-4, atol=1e-6):
    """Order-insensitive DataFrame comparison helper."""
    import pandas as pd

    a = a.sort_values(on).reset_index(drop=True)
    b = b.sort_values(on).reset_index(drop=True)
    assert list(a.columns) == list(b.columns)
    for c in a.columns:
        if np.issubdtype(a[c].dtype, np.floating):
            np.testing.assert_allclose(a[c], b[c], rtol=rtol, atol=atol)
        else:
            np.testing.assert_array_equal(a[c], b[c])
