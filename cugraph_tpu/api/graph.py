"""User-facing Graph classes (NetworkX-flavored, cuGraph-compatible surface).

Capability match for the reference's Python layer:
``cugraph.Graph``/``MultiGraph`` (python/cugraph/cugraph/structure/
graph_classes.py:30) backed by simpleGraph.py / simpleDistributedGraph.py.

Differences by design (TPU-first):
* The device structure is a pair of padded, statically-shaped CSR orderings
  (see core/structure.py) built eagerly on first use, not a lazily-created
  SGGraph C object.
* Results come back as pandas DataFrames (the host-side analog of cudf
  frames the reference returns).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from cugraph_tpu.api.exceptions import InvalidInputError
from cugraph_tpu.core import preprocess
from cugraph_tpu.core.renumber import NumberMap, renumber_edgelist
from cugraph_tpu.core.structure import GraphStructure, build_structure_host


def _as_numpy_col(df_or_arr, col):
    if isinstance(df_or_arr, pd.DataFrame):
        return df_or_arr[col].to_numpy()
    raise InvalidInputError("expected a pandas DataFrame")


class Graph:
    """A property graph holding one edge list; undirected by default.

    Mirrors ``cugraph.Graph(directed=...)``
    (python/cugraph/cugraph/structure/graph_classes.py:30).  Undirected
    construction symmetrizes the edge list exactly like the reference.
    """

    def __init__(self, directed: bool = False):
        self._directed = bool(directed)
        self._multi = False
        self._src: np.ndarray | None = None  # internal int32 ids
        self._dst: np.ndarray | None = None
        self._weight: np.ndarray | None = None
        self._edge_id: np.ndarray | None = None
        self._edge_type: np.ndarray | None = None
        self._edge_time: np.ndarray | None = None
        self._number_map: NumberMap | None = None
        self._structure: GraphStructure | None = None
        self._renumbered = False
        # Pallas SpMV plan caches (kernels/dispatch.py) — reset here so
        # clear() + from_edgelist never serves a stale plan for the old graph
        self._spmv_plan_pull = None
        self._spmv_plan_push = None
        self._spmv_plan_sym = None
        self._spmv_plan_pull_spilled = None
        self._spmv_plan_aux = {}     # VMEM-constrained variants (dispatch)
        self._spmm_plans_brandes = None
        self._csr_perm_cache = None
        self._cumw_cache = None      # biased-sampling row cum-weights
        self._pending_nodes = None

    # -- construction ---------------------------------------------------------

    _WEIGHT_COL_NAMES = ("weight", "weights", "wgt", "w", "value")

    def from_edgelist(
        self,
        source,
        destination=None,
        weight=None,
        weight_col=None,
        *,
        vertices=None,
        renumber: bool = True,
        edge_id=None,
        edge_type=None,
        edge_time=None,
        store_transposed: bool = False,  # accepted for API parity; both
                                         # orientations are materialized
    ) -> "Graph":
        """Build from arrays or a DataFrame.

        ``from_edgelist(df, 'src', 'dst', 'wgt')`` or
        ``from_edgelist(src_array, dst_array, weight_array)``.
        Mirrors Graph.from_cudf_edgelist / from_pandas_edgelist
        (graph_classes.py:119,238).
        """
        if isinstance(source, pd.DataFrame):
            df = source
            src_col = destination if destination is not None else "src"
            dst_col = weight if weight is not None else "dst"
            if not isinstance(src_col, str) or not isinstance(dst_col, str):
                raise InvalidInputError("column names must be strings")
            src = df[src_col].to_numpy()
            dst = df[dst_col].to_numpy()
            w = None
            if weight_col is not None:
                w = df[weight_col].to_numpy().astype(np.float32)
            else:
                # only infer a weight column by a conventional name — grabbing
                # an arbitrary leftover column would silently corrupt weights
                wcols = [c for c in df.columns
                         if c not in (src_col, dst_col)
                         and str(c).lower() in self._WEIGHT_COL_NAMES]
                if len(wcols) == 1:
                    w = df[wcols[0]].to_numpy().astype(np.float32)
        else:
            src = np.asarray(source)
            dst = np.asarray(destination)
            w = None if weight is None else np.asarray(weight, dtype=np.float32)
        return self._from_arrays(src, dst, w, renumber=renumber, vertices=vertices,
                                 edge_id=edge_id, edge_type=edge_type,
                                 edge_time=edge_time)

    def from_pandas_edgelist(self, df, source="source",
                             destination="destination",
                             edge_attr=None, renumber=True) -> "Graph":
        # reference defaults are source/destination (graph_classes.py);
        # frames using the src/dst convention keep working when the
        # defaults were not overridden
        if source == "source" and source not in df.columns \
                and {"src", "dst"} <= set(df.columns):
            source, destination = "src", "dst"
        src = df[source].to_numpy()
        dst = df[destination].to_numpy()
        w = None if edge_attr is None else df[edge_attr].to_numpy().astype(np.float32)
        return self._from_arrays(src, dst, w, renumber=renumber)

    def _from_arrays(self, src, dst, weight, *, renumber=True, vertices=None,
                     edge_id=None, edge_type=None, edge_time=None) -> "Graph":
        if self._src is not None:
            raise InvalidInputError("graph already has an edge list")
        if src.shape != dst.shape:
            raise InvalidInputError("source/destination length mismatch")
        if weight is not None and weight.shape != src.shape:
            raise InvalidInputError("weight length mismatch")
        extras = {}
        for name, arr in (("edge_id", edge_id), ("edge_type", edge_type),
                          ("edge_time", edge_time)):
            if arr is not None:
                arr = np.asarray(arr)
                if arr.shape != src.shape:
                    raise InvalidInputError(f"{name} length mismatch")
                extras[name] = arr

        if vertices is None:
            vertices = self._pending_nodes
            self._pending_nodes = None  # consumed by this build only
        if renumber:
            src_i, dst_i, nmap = renumber_edgelist(src, dst, vertices=vertices)
        else:
            if (not np.issubdtype(np.asarray(src).dtype, np.integer)
                    or not np.issubdtype(np.asarray(dst).dtype, np.integer)):
                raise InvalidInputError("renumber=False requires integer ids")
            if src.size and (src.min(initial=0) < 0 or dst.min(initial=0) < 0):
                raise InvalidInputError("renumber=False requires non-negative ids")
            n = int(max(src.max(initial=-1), dst.max(initial=-1))) + 1 if src.size else 0
            if vertices is not None:  # explicit vertex set may add isolated ids
                n = max(n, int(np.asarray(vertices).max(initial=-1)) + 1)
            src_i, dst_i = src.astype(np.int32), dst.astype(np.int32)
            nmap = NumberMap(np.arange(n))

        if extras or self._multi:
            # edge properties / multigraphs require keeping every edge; the
            # reference likewise attaches edge_id/type only on paths that
            # store edges as-is (graphs.pyx SGGraph edge_id_array)
            if not self._multi:
                # dedupe on UNORDERED pairs so an input already holding both
                # directions doesn't get double-stored after symmetrization
                a = np.minimum(src_i, dst_i).astype(np.int64)
                b = np.maximum(src_i, dst_i).astype(np.int64)
                key = ((a << 32) | b.astype(np.uint32).astype(np.int64)
                       if not self._directed
                       else (src_i.astype(np.int64) << 32)
                       | dst_i.astype(np.uint32).astype(np.int64))
                _, idx = np.unique(key, return_index=True)
                idx.sort()
                src_i, dst_i = src_i[idx], dst_i[idx]
                weight = None if weight is None else weight[idx]
                extras = {k: v[idx] for k, v in extras.items()}
            if not self._directed:
                # store the reverse of every non-self-loop edge
                rev = src_i != dst_i
                src_i, dst_i = (np.concatenate([src_i, dst_i[rev]]),
                                np.concatenate([dst_i, src_i[rev]]))
                if weight is not None:
                    weight = np.concatenate([weight, weight[rev]])
                extras = {k: np.concatenate([v, v[rev]]) for k, v in extras.items()}
        else:
            if not self._multi:
                src_i, dst_i, weight = preprocess.remove_multi_edges(src_i, dst_i, weight)
            if not self._directed:
                src_i, dst_i, weight = preprocess.symmetrize_edgelist(src_i, dst_i, weight)

        self._src, self._dst, self._weight = src_i, dst_i, weight
        self._edge_id = extras.get("edge_id")
        self._edge_type = extras.get("edge_type")
        self._edge_time = extras.get("edge_time")
        self._number_map = nmap
        self._renumbered = renumber
        return self

    # -- edge properties ------------------------------------------------------

    @property
    def edge_ids(self):
        return self._edge_id

    @property
    def edge_types(self):
        return self._edge_type

    @property
    def edge_times(self):
        return self._edge_time

    # -- properties -----------------------------------------------------------

    def is_directed(self) -> bool:
        return self._directed

    def is_multigraph(self) -> bool:
        return self._multi

    def is_weighted(self) -> bool:
        return self._weight is not None

    def is_renumbered(self) -> bool:
        return self._renumbered

    @property
    def number_map(self) -> NumberMap:
        self._check_built()
        return self._number_map

    def number_of_vertices(self) -> int:
        self._check_built()
        return self._number_map.num_vertices

    number_of_nodes = number_of_vertices

    def number_of_edges(self) -> int:
        """Edge count matching NetworkX semantics (undirected edges counted
        once)."""
        self._check_built()
        e = int(self._src.shape[0])
        if self._directed:
            return e
        n_loops = int(np.sum(self._src == self._dst))
        return (e - n_loops) // 2 + n_loops

    def density(self) -> float:
        """Edges present vs the maximum possible (reference
        graph_classes.py:801): m/(n·(n−1)) directed, 2m/(n·(n−1))
        undirected."""
        n = self.number_of_vertices()
        if n < 2:
            return 0.0
        m = self.number_of_edges()
        factor = 1 if self.is_directed() else 2
        return factor * m / (n * (n - 1))

    def has_vertex(self, v) -> bool:
        self._check_built()
        return bool(self._number_map.contains(np.asarray([v]))[0])

    has_node = has_vertex

    def nodes(self) -> np.ndarray:
        self._check_built()
        return self._number_map.to_external(np.arange(self.number_of_vertices()))

    def vertices(self) -> np.ndarray:
        return self.nodes()

    def edges(self) -> pd.DataFrame:
        return self.view_edge_list()

    def view_edge_list(self) -> pd.DataFrame:
        """Decompress back to an external-id edge list (reference:
        decompress_to_edgelist, cpp/include/cugraph/graph_functions.hpp:366)."""
        self._check_built()
        src, dst, w = self._src, self._dst, self._weight
        if not self._directed:
            keep = src <= dst
            src, dst = src[keep], dst[keep]
            w = None if w is None else w[keep]
        out = {
            "src": self._number_map.to_external(src),
            "dst": self._number_map.to_external(dst),
        }
        if w is not None:
            out["weight"] = w
        return pd.DataFrame(out)

    # -- internal edge list / device structure --------------------------------

    def edgelist_arrays(self):
        """(src, dst, weight) internal int32 arrays, symmetrized if undirected."""
        self._check_built()
        return self._src, self._dst, self._weight

    @property
    def structure(self) -> GraphStructure:
        """Device-side padded CSR/CSC bundle (built lazily, cached) — the
        analog of simpleGraph.py:1376 building the SGGraph on first use."""
        self._check_built()
        if self._structure is None:
            self._structure = build_structure_host(
                self._src, self._dst, self._weight, self.number_of_vertices()
            )
        return self._structure

    # -- degrees (reference: graph_view.hpp:653-668, degrees.pyx) -------------

    def degrees(self, vertex_subset=None) -> pd.DataFrame:
        self._check_built()
        n = self.number_of_vertices()
        ind = np.bincount(self._dst, minlength=n)
        outd = np.bincount(self._src, minlength=n)
        df = pd.DataFrame({
            "vertex": self._number_map.to_external(np.arange(n)),
            "in_degree": ind,
            "out_degree": outd,
        })
        return self._filter_vertices(df, vertex_subset)

    def in_degree(self, vertex_subset=None) -> pd.DataFrame:
        df = self.degrees(vertex_subset)[["vertex", "in_degree"]]
        return df.rename(columns={"in_degree": "degree"})

    def out_degree(self, vertex_subset=None) -> pd.DataFrame:
        df = self.degrees(vertex_subset)[["vertex", "out_degree"]]
        return df.rename(columns={"out_degree": "degree"})

    def degree(self, vertex_subset=None) -> pd.DataFrame:
        d = self.degrees(vertex_subset)
        # NetworkX-style degree = in + out for directed; for undirected the
        # symmetrized list already double-counts non-loop edges.  Known
        # divergence: an undirected self-loop is stored once, so it adds 1
        # here where nx.degree adds 2.
        if self._directed:
            deg = d["in_degree"] + d["out_degree"]
        else:
            deg = d["out_degree"]
        return pd.DataFrame({"vertex": d["vertex"], "degree": deg})

    def _filter_vertices(self, df, vertex_subset):
        if vertex_subset is None:
            return df
        vs = np.asarray(vertex_subset)
        return df[df["vertex"].isin(vs)].reset_index(drop=True)

    # -- helpers for algorithms ------------------------------------------------

    def unrenumber_frame(self, df: pd.DataFrame, col: str) -> pd.DataFrame:
        self._check_built()
        df = df.copy()
        df[col] = self._number_map.to_external(df[col].to_numpy())
        return df

    def _check_built(self):
        if self._src is None:
            raise InvalidInputError("graph has no edge list; call from_edgelist")

    def clear(self):
        self.__init__(directed=self._directed)

    # -- reference-name construction aliases (graph_classes.py:104-406;
    #    cudf/dask frames don't exist here — any DataFrame-like works) ------

    def from_cudf_edgelist(self, df, source="source",
                           destination="destination", edge_attr=None,
                           weight=None, renumber=True,
                           store_transposed=False, symmetrize=None):
        """Reference Graph.from_cudf_edgelist (graph_classes.py:104).
        ``store_transposed`` is moot (both orientations are stored);
        ``symmetrize`` defaults to the directedness like the reference."""
        attr = edge_attr if edge_attr is not None else weight
        w = df[attr].to_numpy(np.float32) if attr is not None else None
        return self.from_edgelist(df[source].to_numpy(),
                                  df[destination].to_numpy(), w,
                                  renumber=renumber)

    def from_dask_cudf_edgelist(self, df, source="source",
                                destination="destination", edge_attr=None,
                                renumber=True, store_transposed=False):
        """Reference Graph.from_dask_cudf_edgelist (graph_classes.py:270):
        the MG ingest.  Data here is host-resident; the distributed build is
        `parallel.build_dist_graph` — this alias ingests the frame and keeps
        the SG surface working for ported call sites."""
        return self.from_cudf_edgelist(df, source, destination, edge_attr,
                                       renumber=renumber)

    def from_cudf_adjlist(self, offset_col, index_col, value_col=None,
                          renumber=True):
        """Reference Graph.from_cudf_adjlist (graph_classes.py:376): CSR
        arrays → Graph."""
        offsets = np.asarray(offset_col)
        indices = np.asarray(index_col)
        deg = np.diff(offsets)
        src = np.repeat(np.arange(len(deg)), deg)
        w = None if value_col is None else np.asarray(value_col, np.float32)
        # every CSR row is a vertex — zero-degree rows must survive
        return self.from_edgelist(src, indices, w, renumber=renumber,
                                  vertices=np.arange(len(deg)))

    def from_pandas_adjacency(self, pdf):
        """Reference Graph.from_pandas_adjacency: labeled dense matrix
        (values become weights, like from_numpy_array)."""
        return self.from_numpy_array(pdf.to_numpy(),
                                     nodes=np.asarray(pdf.columns))

    def from_numpy_array(self, A, nodes=None):
        """Adjacency-matrix construction (reference graph_classes.py:493):
        matrix values always become edge weights, and ``nodes`` labels every
        vertex (isolated ones included)."""
        A = np.asarray(A)
        if A.ndim != 2:
            raise ValueError("np_array is not a 2D matrix")
        src, dst = np.nonzero(A)
        w = A[src, dst].astype(np.float32)
        verts = None
        if nodes is not None:
            nodes = np.asarray(nodes)
            src, dst = nodes[src], nodes[dst]
            verts = nodes
        return self.from_edgelist(src, dst, w, vertices=verts)

    def from_numpy_matrix(self, A):
        return self.from_numpy_array(np.asarray(A))

    # -- renumber glue methods (graph_classes.py:618-668) ------------------

    def unrenumber(self, df, column_name, preserve_order=False,
                   get_column_names=False):
        """Map a column of internal ids back to external ids in-place
        (reference Graph.unrenumber)."""
        out = df.copy()
        arr = np.asarray(df[column_name])
        mask = arr >= 0
        ext_dt = self._number_map.to_external(np.array([0])).dtype
        ext = np.empty(len(arr), dtype=ext_dt)
        ext[mask] = self._number_map.to_external(arr[mask])
        if np.issubdtype(ext_dt, np.integer):
            ext[~mask] = arr[~mask]
        else:
            ext = ext.astype(object)
            ext[~mask] = None
        out[column_name] = ext
        return out

    def lookup_internal_vertex_id(self, external, column_name=None):
        self._check_built()
        if column_name is not None:
            external = external[column_name]
        return self._number_map.to_internal(np.asarray(external))

    def add_internal_vertex_id(self, df, internal_column_name,
                               external_column_name, drop=True,
                               preserve_order=False):
        """Add a column of internal ids for an external-id column
        (reference Graph.add_internal_vertex_id)."""
        out = df.copy()
        out[internal_column_name] = self.lookup_internal_vertex_id(
            np.asarray(df[external_column_name]))
        if drop:
            out = out.drop(columns=[external_column_name])
        return out

    # -- predicates / bookkeeping (graph_classes.py:690-800) ---------------

    def is_bipartite(self):
        return False

    def is_multipartite(self):
        return False

    def is_remote(self):
        return False

    def is_multi_gpu(self):
        return False

    def has_isolated_vertices(self) -> bool:
        """True when some vertex has no incident edges (possible with
        renumber=False or an explicit vertices= list)."""
        self._check_built()
        n = self.number_of_vertices()
        touched = np.zeros(n, bool)
        touched[self._src] = True
        touched[self._dst] = True
        return bool((~touched).any())

    def add_nodes_from(self, nodes):
        """Pre-register vertices (isolated ones included) for the next
        from_edgelist call (reference records them the same way).
        Repeated calls accumulate."""
        nodes = np.asarray(list(nodes))
        if self._pending_nodes is not None:
            nodes = np.unique(np.concatenate([self._pending_nodes, nodes]))
        self._pending_nodes = nodes

    def to_directed(self) -> "Graph":
        # a MultiGraph converts to a directed MULTIgraph (parallel edges
        # survive, reference graph_classes.py) — type(self) keeps the class
        g = type(self)(directed=True)
        src, dst, w = self.edgelist_arrays()
        ext_s = self._number_map.to_external(src)
        ext_d = self._number_map.to_external(dst)
        return g.from_edgelist(ext_s, ext_d, w)

    def to_undirected(self) -> "Graph":
        g = type(self)(directed=False)
        src, dst, w = self.edgelist_arrays()
        ext_s = self._number_map.to_external(src)
        ext_d = self._number_map.to_external(dst)
        return g.from_edgelist(ext_s, ext_d, w)


class MultiGraph(Graph):
    """Graph that keeps parallel edges (reference graph_classes.py MultiGraph)."""

    def __init__(self, directed: bool = False):
        super().__init__(directed=directed)
        self._multi = True

    def is_multigraph(self):
        return True

    def density(self):
        """Reference graph_classes.py:853 — undefined for multigraphs
        (parallel edges make the max-possible-edge count meaningless)."""
        raise TypeError("The density function is not support on a Multigraph.")


class Tree(Graph):
    """A Tree (reference graph_classes.py:867 — a Graph marked as a tree)."""

    def __init__(self, directed: bool = False):
        super().__init__(directed=directed)
        self.tree = True


class DiGraph(Graph):
    def __init__(self, directed: bool = True):  # arg accepted so clear() works
        super().__init__(directed=True)
