"""Dataset registry mirroring cugraph.datasets
(python/cugraph/cugraph/datasets/dataset.py:65).

This environment has no network egress, so instead of downloading the RAPIDS
dataset tarballs the registry serves the same classic graphs from bundled
generators (networkx ships karate/les_miserables/davis; dolphins/polbooks
come from a small embedded edge list builder) plus synthetic RMAT configs.
The API shape matches the reference: ``Dataset.get_edgelist()`` /
``get_graph(download=...)`` / metadata attributes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


class Dataset:
    """Mirror of cugraph.datasets.Dataset (dataset.py:65)."""

    def __init__(self, name, loader, directed=False, weighted=False,
                 description=""):
        self.name = name
        self._loader = loader
        self._directed = directed
        self._weighted = weighted
        self.description = description
        self._edgelist = None

    def get_edgelist(self, download: bool = True, reader=None) -> pd.DataFrame:
        if self._edgelist is None:
            self._edgelist = self._loader()
        return self._edgelist.copy()

    def get_graph(self, download: bool = True, create_using=None,
                  ignore_weights: bool = False, store_transposed: bool = False):
        from cugraph_tpu.api.graph import Graph
        df = self.get_edgelist()
        if create_using is None:
            G = Graph(directed=self._directed)
        elif isinstance(create_using, type):
            G = create_using()
        else:
            G = create_using
        w = None
        if self._weighted and not ignore_weights and "wgt" in df.columns:
            w = df["wgt"].to_numpy().astype(np.float32)
        G.from_edgelist(df["src"].to_numpy(), df["dst"].to_numpy(), w)
        return G

    def get_dask_edgelist(self, download: bool = True) -> pd.DataFrame:
        """Reference get_dask_edgelist (dataset.py:224) — data is
        host-resident here; same frame as get_edgelist."""
        return self.get_edgelist(download=download)

    def get_dask_graph(self, download: bool = True, create_using=None,
                       ignore_weights: bool = False,
                       store_transposed: bool = False):
        """Reference get_dask_graph (dataset.py:332); the distributed build
        is `parallel.build_dist_graph` — this returns the host Graph."""
        return self.get_graph(download=download, create_using=create_using,
                              ignore_weights=ignore_weights,
                              store_transposed=store_transposed)

    def unload(self):
        """Drop the cached edge list (reference dataset.py:154)."""
        self._edgelist = None

    def get_path(self):
        """Bundled CSV path when the dataset is file-backed, else None
        (generator-backed datasets have no file; reference returns the
        download path)."""
        import os

        fname = getattr(self._loader, "_csv_name", None)
        if fname is None:
            return None
        return os.path.join(os.path.dirname(__file__), "data", fname)

    def is_directed(self):
        return self._directed

    def is_multigraph(self):
        return False

    def is_symmetric(self):
        return not self._directed

    def number_of_nodes(self):
        df = self.get_edgelist()
        return len(np.unique(np.concatenate([df["src"], df["dst"]])))

    def number_of_vertices(self):
        return self.number_of_nodes()

    def number_of_edges(self):
        return len(self.get_edgelist())


def _from_nx(factory, weighted=False):
    def load():
        import networkx as nx
        Gnx = factory()
        src = np.array([u for u, v in Gnx.edges()])
        dst = np.array([v for u, v in Gnx.edges()])
        if isinstance(next(iter(Gnx.nodes()), 0), str):
            # map node names to stable int ids for a csv-like edgelist
            names = {n: i for i, n in enumerate(sorted(Gnx.nodes()))}
            src = np.array([names[u] for u, v in Gnx.edges()])
            dst = np.array([names[v] for u, v in Gnx.edges()])
        out = {"src": src, "dst": dst}
        if weighted:
            out["wgt"] = np.array(
                [Gnx[u][v].get("weight", 1.0) for u, v in Gnx.edges()],
                dtype=np.float32)
        return pd.DataFrame(out)
    return load


def _rmat_loader(scale, edge_factor=16, seed=7):
    def load():
        from cugraph_tpu.generators.rmat import rmat
        return rmat(scale, (2 ** scale) * edge_factor, seed=seed,
                    include_edge_weights=True).rename(
                        columns={"weights": "wgt"})
    return load


def _nx():
    import networkx as nx
    return nx


karate = Dataset(
    "karate", _from_nx(lambda: _nx().karate_club_graph(), weighted=True),
    weighted=True, description="Zachary karate club (34 v, 78 e)")
karate_undirected = karate
les_miserables = Dataset(
    "les_miserables",
    _from_nx(lambda: _nx().les_miserables_graph(), weighted=True),
    weighted=True, description="Les Misérables co-appearance")
davis = Dataset(
    "davis", _from_nx(lambda: _nx().davis_southern_women_graph()),
    description="Davis southern women bipartite")
florentine = Dataset(
    "florentine", _from_nx(lambda: _nx().florentine_families_graph()),
    description="Florentine families")
petersen = Dataset("petersen", _from_nx(lambda: _nx().petersen_graph()),
                   description="Petersen graph")
small_rmat = Dataset("small_rmat", _rmat_loader(10), weighted=True,
                     description="RMAT scale 10, ef 16 (synthetic)")
medium_rmat = Dataset("medium_rmat", _rmat_loader(14), weighted=True,
                      description="RMAT scale 14, ef 16 (synthetic)")

def _from_csv(fname, weighted=True, sep=" "):
    """Bundled public benchmark data (cugraph datasets/ ships the same CSVs;
    the graphs are classic public datasets — dolphins, polbooks, netscience,
    … — bundled here because this environment has no egress)."""
    def load():
        import os

        path = os.path.join(os.path.dirname(__file__), "data", fname)
        df = pd.read_csv(path, sep=sep, header=None,
                         names=["src", "dst", "wgt"])
        if not weighted:
            df = df[["src", "dst"]]
        return df
    load._csv_name = fname
    return load


dolphins = Dataset("dolphins", _from_csv("dolphins.csv"), directed=True,
                   weighted=True,
                   description="Dolphin social network (62 v, 159 e)")
polbooks = Dataset("polbooks", _from_csv("polbooks.csv"), directed=True,
                   weighted=True,
                   description="Political books co-purchase (105 v)")
netscience = Dataset("netscience", _from_csv("netscience.csv"),
                     weighted=True,
                     description="Network-science co-authorship (1589 v)")
email_Eu_core = Dataset("email-Eu-core", _from_csv("email-Eu-core.csv"),
                        directed=True, weighted=True,
                        description="EU research institution email (1005 v)")
karate_asymmetric = Dataset("karate-asymmetric",
                            _from_csv("karate-asymmetric.csv"),
                            directed=True, weighted=True,
                            description="Karate club, asymmetric direction")
karate_disjoint = Dataset("karate-disjoint", _from_csv("karate-disjoint.csv"),
                          weighted=True,
                          description="Two disjoint karate clubs")
small_line = Dataset("small_line", _from_csv("small_line.csv"), weighted=True,
                     description="Path graph (10 v)")
small_tree = Dataset("small_tree", _from_csv("small_tree.csv"), weighted=True,
                     description="Small tree")
toy_graph = Dataset("toy_graph", _from_csv("toy_graph.csv"), directed=True,
                    weighted=True, description="6-vertex toy graph")
toy_graph_undirected = Dataset("toy_graph_undirected",
                               _from_csv("toy_graph_undirected.csv"),
                               weighted=True,
                               description="6-vertex toy graph, undirected")

ALL_DATASETS = [karate, les_miserables, davis, florentine, petersen,
                dolphins, polbooks, netscience, email_Eu_core,
                karate_asymmetric, karate_disjoint, small_line, small_tree,
                toy_graph, toy_graph_undirected, small_rmat, medium_rmat]


def get_all_datasets():
    return list(ALL_DATASETS)


_download_dir = None


def download_all(force: bool = False):
    """Reference dataset.py:447 — everything here is bundled or generated
    (no egress), so this just materializes every edge list."""
    for ds in ALL_DATASETS:
        if force:
            ds.unload()
        ds.get_edgelist()


def set_download_dir(path):
    """Reference dataset.py:472 — recorded for API parity; bundled data
    never moves."""
    global _download_dir
    _download_dir = path


def get_download_dir():
    import os

    return (_download_dir if _download_dir is not None
            else os.path.join(os.path.dirname(__file__), "data"))


from cugraph_tpu.datasets.readers import (  # noqa: E402
    read_csv_edgelist,
    read_mtx,
    write_csv_edgelist,
)
