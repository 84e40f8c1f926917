"""Stable-layer algorithm functions (pylibcugraph's one-module-per-algorithm
surface, SURVEY.md Appendix B) over the cugraph_tpu engine.

Convention (matching the reference .pyx signatures): every function takes
``(resource_handle, graph, ...)`` and returns plain NumPy arrays in internal
vertex id space — the exact contract of the C API it mirrors
(cpp/include/cugraph_c/*.h).  SGGraph dispatches to the single-device engine;
MGGraph to the 2D-mesh shard_map engine where implemented.
"""

from __future__ import annotations

import numpy as np

from cugraph_tpu.plc.graphs import MGGraph, ResourceHandle, SGGraph


def _host(x):
    """Device→host for MG engine outputs, multiprocess-safe.

    Under a multi-process mesh (jax.distributed — the reference's MPI/NCCL
    rank layout) a mesh-sharded result is not fully addressable and plain
    np.asarray raises; every rank instead allgathers its shards
    (multihost_utils, the host-side analog of device_allgatherv)."""
    import jax

    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        x = multihost_utils.process_allgather(x, tiled=True)
    return np.asarray(x)


def _sg(graph) -> "object":
    if isinstance(graph, SGGraph):
        return graph.graph()
    if isinstance(graph, MGGraph):
        raise NotImplementedError("this algorithm has no MG path yet; "
                                  "see cugraph_tpu.parallel for MG coverage")
    return graph  # allow raw Graph


def _vert_df(df, value_cols):
    v = df["vertex"].to_numpy()
    return (v, *[df[c].to_numpy() for c in value_cols])


def _seed(random_state) -> int:
    """Resolve an int seed from None / int / CuGraphRandomState (each use
    of a state object advances it — repeated calls differ like the
    reference's rng_state)."""
    if random_state is None:
        return 0
    if isinstance(random_state, (int, np.integer)):
        return int(random_state)
    if isinstance(random_state, CuGraphRandomState):
        return random_state.next_seed()
    return abs(hash(random_state)) % (2**31)


# -- link analysis -----------------------------------------------------------

def pagerank(resource_handle, graph, precomputed_vertex_out_weight_vertices=None,
             precomputed_vertex_out_weight_sums=None,
             initial_guess_vertices=None, initial_guess_values=None,
             alpha=0.85, epsilon=1e-5, max_iterations=100,
             do_expensive_check=False, fail_on_nonconvergence=True):
    import cugraph_tpu as ct

    if isinstance(graph, MGGraph):
        from cugraph_tpu.parallel import mg_pagerank

        p, err, iters = mg_pagerank(graph.graph(), graph.mesh, alpha=alpha,
                                    tol=epsilon, max_iter=max_iterations)
        n = graph.graph().num_vertices
        p = _host(p)[:n]
        return np.arange(n, dtype=np.int32), p
    G = _sg(graph)
    import pandas as pd

    kw = {}
    if precomputed_vertex_out_weight_vertices is not None:
        kw["precomputed_vertex_out_weight"] = pd.DataFrame({
            "vertex": np.asarray(precomputed_vertex_out_weight_vertices),
            "sums": np.asarray(precomputed_vertex_out_weight_sums),
        })
    if initial_guess_vertices is not None:
        kw["nstart"] = pd.DataFrame({
            "vertex": np.asarray(initial_guess_vertices),
            "values": np.asarray(initial_guess_values),
        })
    out = ct.pagerank(G, alpha=alpha, tol=epsilon, max_iter=max_iterations,
                      fail_on_nonconvergence=fail_on_nonconvergence, **kw)
    df = out[0] if isinstance(out, tuple) else out
    return _vert_df(df.sort_values("vertex"), ["pagerank"])


def personalized_pagerank(resource_handle, graph, personalization_vertices,
                          personalization_values, alpha=0.85, epsilon=1e-5,
                          max_iterations=100, **kw):
    import cugraph_tpu as ct
    import pandas as pd

    if isinstance(graph, MGGraph):
        from cugraph_tpu.parallel import mg_pagerank

        n = graph.graph().num_vertices
        pers = np.zeros(n, np.float32)
        pers[np.asarray(personalization_vertices)] = \
            np.asarray(personalization_values, np.float32)
        p, err, iters = mg_pagerank(graph.graph(), graph.mesh, alpha=alpha,
                                    tol=epsilon, max_iter=max_iterations,
                                    personalization=pers)
        return np.arange(n, dtype=np.int32), _host(p)[:n]
    G = _sg(graph)
    pers = pd.DataFrame({"vertex": np.asarray(personalization_vertices),
                         "values": np.asarray(personalization_values)})
    df = ct.pagerank(G, alpha=alpha, tol=epsilon, max_iter=max_iterations,
                     personalization=pers)
    return _vert_df(df.sort_values("vertex"), ["pagerank"])


def hits(resource_handle, graph, tol=1e-5, max_iter=100, initial_hubs_guess_vertices=None,
         initial_hubs_guess_values=None, normalized=True, do_expensive_check=False):
    import cugraph_tpu as ct

    if isinstance(graph, MGGraph):
        from cugraph_tpu.parallel import mg_hits

        n = graph.graph().num_vertices
        nstart = None
        if initial_hubs_guess_vertices is not None:
            nstart = np.zeros(n, np.float32)
            nstart[np.asarray(initial_hubs_guess_vertices)] = \
                np.asarray(initial_hubs_guess_values, np.float32)
        h, a, err, iters = mg_hits(graph.graph(), graph.mesh, tol=tol,
                                   max_iter=max_iter, normalized=normalized,
                                   nstart=nstart)
        return (np.arange(n, dtype=np.int32), _host(h)[:n],
                _host(a)[:n])
    kw = {}
    if initial_hubs_guess_vertices is not None:
        import pandas as pd

        kw["nstart"] = pd.DataFrame({
            "vertex": np.asarray(initial_hubs_guess_vertices),
            "values": np.asarray(initial_hubs_guess_values),
        })
    df = ct.hits(_sg(graph), max_iter=max_iter, tol=tol, normalized=normalized,
                 **kw)
    return _vert_df(df.sort_values("vertex"), ["hubs", "authorities"])


# -- traversal ---------------------------------------------------------------

def bfs(resource_handle, graph, sources, direction_optimizing=False, depth_limit=-1,
        compute_predecessors=True, do_expensive_check=False):
    import cugraph_tpu as ct

    srcs = np.asarray(sources).reshape(-1)
    if isinstance(graph, MGGraph):
        from cugraph_tpu.parallel import mg_bfs

        dl = None if depth_limit in (-1, None) else depth_limit
        n = graph.graph().num_vertices
        # single OR multi-source: one multi-root traversal (the per-source
        # loop this replaced cost |S| full sweeps; distances are identical)
        dist, pred = mg_bfs(graph.graph(), graph.mesh, srcs, dl)
        pred = (_host(pred)[:n] if compute_predecessors
                else np.full(n, -1, np.int32))
        return (_host(dist)[:n], pred, np.arange(n, dtype=np.int32))
    dl = None if depth_limit in (-1, None) else depth_limit
    if len(srcs) > 1:
        # multi-source BFS: one batched panel sweep, distances = per-vertex
        # min, predecessors recovered from the merged level function
        ms = ct.multi_source_bfs(_sg(graph), srcs.tolist(), depth_limit=dl)
        ms = ms.sort_values("vertex")
        dcols = [c for c in ms.columns if c.startswith("distance_")]
        pcols = [c for c in ms.columns if c.startswith("predecessor_")]
        D = ms[dcols].to_numpy()
        P = ms[pcols].to_numpy()
        best = np.argmin(D, axis=1)
        rows = np.arange(len(ms))
        pv = (P[rows, best] if compute_predecessors
              else np.full(len(ms), -1, np.int64))
        return (D[rows, best], pv, ms["vertex"].to_numpy())
    df = ct.bfs(_sg(graph), start=srcs[0], depth_limit=dl,
                return_predecessors=compute_predecessors)
    df = df.sort_values("vertex")
    # reference order: (distances, predecessors, vertices) — bfs.pyx:196
    return (df["distance"].to_numpy(), df["predecessor"].to_numpy(),
            df["vertex"].to_numpy())


def sssp(resource_handle, graph, source, cutoff=np.inf,
         compute_predecessors=True, do_expensive_check=False):
    import cugraph_tpu as ct

    if isinstance(graph, MGGraph):
        from cugraph_tpu.parallel import mg_sssp

        dist, pred = mg_sssp(graph.graph(), graph.mesh, int(source), cutoff)
        n = graph.graph().num_vertices
        return (np.arange(n, dtype=np.int32), _host(dist)[:n],
                _host(pred)[:n])
    df = ct.sssp(_sg(graph), source=source, cutoff=cutoff).sort_values("vertex")
    pred = (df["predecessor"].to_numpy() if compute_predecessors
            else np.full(len(df), -1, np.int64))
    return df["vertex"].to_numpy(), df["distance"].to_numpy(), pred


# -- centrality --------------------------------------------------------------

def katz_centrality(resource_handle, graph, betas=None, alpha=0.1, beta=1.0,
                    epsilon=1e-6, max_iterations=100, do_expensive_check=False):
    import cugraph_tpu as ct

    if isinstance(graph, MGGraph):
        from cugraph_tpu.parallel import mg_katz_centrality

        if betas is not None:
            raise NotImplementedError("per-vertex betas: SG only")
        c, err, it = mg_katz_centrality(graph.graph(), graph.mesh, alpha=alpha,
                                        beta=beta, tol=epsilon,
                                        max_iter=max_iterations)
        n = graph.graph().num_vertices
        return np.arange(n, dtype=np.int32), _host(c)[:n]
    G = _sg(graph)
    if betas is not None:
        # betas align with the wrapper's output order (vertices sorted by
        # external id); re-index into the engine's internal id space
        n = G.number_of_vertices()
        ext_sorted = np.sort(G.number_map.to_external(np.arange(n)))
        b_int = np.zeros(n, np.float32)
        b_int[G.lookup_internal_vertex_id(ext_sorted)] = \
            np.asarray(betas, np.float32)
        beta = b_int
    df = ct.katz_centrality(G, alpha=alpha, beta=beta,
                            tol=epsilon, max_iter=max_iterations)
    return _vert_df(df.sort_values("vertex"), ["katz_centrality"])


def eigenvector_centrality(resource_handle, graph, epsilon=1e-6,
                           max_iterations=100, do_expensive_check=False):
    import cugraph_tpu as ct

    if isinstance(graph, MGGraph):
        from cugraph_tpu.parallel import mg_eigenvector_centrality

        c, err, iters = mg_eigenvector_centrality(
            graph.graph(), graph.mesh, tol=epsilon, max_iter=max_iterations)
        n = graph.graph().num_vertices
        return np.arange(n, dtype=np.int32), _host(c)[:n]
    df = ct.eigenvector_centrality(_sg(graph), tol=epsilon,
                                   max_iter=max_iterations)
    return _vert_df(df.sort_values("vertex"), ["eigenvector_centrality"])


def betweenness_centrality(resource_handle, graph, k=None, random_state=None,
                           normalized=True, include_endpoints=False,
                           do_expensive_check=False):
    import cugraph_tpu as ct

    if isinstance(graph, MGGraph):
        from cugraph_tpu.parallel import mg_betweenness_centrality

        bc = mg_betweenness_centrality(graph.graph(), graph.mesh, k=k,
                                       normalized=normalized,
                                       seed=_seed(random_state),
                                       endpoints=include_endpoints)
        n = graph.graph().num_vertices
        return np.arange(n, dtype=np.int32), _host(bc)[:n]
    df = ct.betweenness_centrality(_sg(graph), k=k, normalized=normalized,
                                   endpoints=include_endpoints,
                                   seed=_seed(random_state))
    return _vert_df(df.sort_values("vertex"), ["betweenness_centrality"])


def edge_betweenness_centrality(resource_handle, graph, k=None,
                                random_state=None, normalized=True,
                                do_expensive_check=False):
    import cugraph_tpu as ct

    if isinstance(graph, MGGraph):
        from cugraph_tpu.parallel import mg_edge_betweenness_centrality

        df = mg_edge_betweenness_centrality(graph.graph(), graph.mesh, k=k,
                                            normalized=normalized,
                                            seed=_seed(random_state))
        return (df["src"].to_numpy(), df["dst"].to_numpy(),
                df["betweenness_centrality"].to_numpy())
    df = ct.edge_betweenness_centrality(_sg(graph), k=k, normalized=normalized,
                                        seed=_seed(random_state))
    return (df["src"].to_numpy(), df["dst"].to_numpy(),
            df["betweenness_centrality"].to_numpy())


# -- community ---------------------------------------------------------------

def louvain(resource_handle, graph, max_level=100, threshold=1e-7,
            resolution=1.0, do_expensive_check=False):
    import cugraph_tpu as ct

    if isinstance(graph, MGGraph):
        from cugraph_tpu.parallel import mg_louvain

        labels, mod = mg_louvain(graph.graph(), graph.mesh,
                                 max_level=max_level, resolution=resolution,
                                 threshold=threshold)
        n = graph.graph().num_vertices
        return np.arange(n, dtype=np.int32), _host(labels), float(mod)
    parts, mod = ct.louvain(_sg(graph), max_level=max_level,
                            threshold=threshold, resolution=resolution)
    parts = parts.sort_values("vertex")
    return parts["vertex"].to_numpy(), parts["partition"].to_numpy(), float(mod)


def leiden(resource_handle, random_state=None, graph=None, max_level=100,
           resolution=1.0, theta=1.0, do_expensive_check=False):
    """Reference positional order (leiden.pyx:50): random_state SECOND,
    graph third.  Legacy (graph-second) calls are detected and swapped."""
    import cugraph_tpu as ct

    if graph is None or isinstance(random_state, (SGGraph, MGGraph)):
        random_state, graph = graph, random_state

    if isinstance(graph, MGGraph):
        from cugraph_tpu.parallel import mg_leiden

        # theta: N/A on the MG path — the distributed refinement enforces
        # the Leiden guarantee by WCC-splitting communities, not by
        # theta-tempered merge sampling (parallel/louvain.py mg_leiden)
        labels, mod = mg_leiden(graph.graph(), graph.mesh,
                                max_level=max_level, resolution=resolution)
        n = graph.graph().num_vertices
        return np.arange(n, dtype=np.int32), _host(labels), float(mod)
    parts, mod = ct.leiden(_sg(graph), max_iter=max_level, resolution=resolution,
                           random_state=random_state, theta=theta)
    parts = parts.sort_values("vertex")
    return parts["vertex"].to_numpy(), parts["partition"].to_numpy(), float(mod)


def ecg(resource_handle, random_state=None, graph=None, min_weight=0.0001,
        ensemble_size=16, max_level=10, threshold=1e-7, resolution=1.0,
        do_expensive_check=False):
    """Reference positional order (ecg.pyx:50): random_state SECOND.
    Legacy (graph-second) calls are detected and swapped."""
    import cugraph_tpu as ct

    if graph is None or isinstance(random_state, (SGGraph, MGGraph)):
        random_state, graph = graph, random_state

    if isinstance(graph, MGGraph):
        from cugraph_tpu.parallel import mg_ecg

        labels, mod = mg_ecg(graph.graph(), graph.mesh,
                             min_weight=min_weight,
                             ensemble_size=ensemble_size,
                             max_level=max_level, threshold=threshold,
                             resolution=resolution, seed=_seed(random_state))
        n = graph.graph().num_vertices
        return np.arange(n, dtype=np.int32), _host(labels)[:n]
    parts = ct.ecg(_sg(graph), min_weight=min_weight,
                   ensemble_size=ensemble_size)
    if isinstance(parts, tuple):
        parts, mod = parts
    parts = parts.sort_values("vertex")
    return parts["vertex"].to_numpy(), parts["partition"].to_numpy()


def triangle_count(resource_handle, graph, start_list=None,
                   do_expensive_check=False):
    import cugraph_tpu as ct

    if isinstance(graph, MGGraph):
        from cugraph_tpu.parallel import mg_triangle_count

        t = mg_triangle_count(graph.graph(), graph.mesh)
        n = graph.graph().num_vertices
        verts = np.arange(n, dtype=np.int32)
        t = _host(t)[:n]
        if start_list is not None:
            sel = np.asarray(start_list).reshape(-1)
            return verts[sel], t[sel]
        return verts, t
    df = ct.triangle_count(_sg(graph), start_list=start_list) \
        .sort_values("vertex")
    return df["vertex"].to_numpy(), df["counts"].to_numpy()


def k_truss_subgraph(resource_handle, graph, k, do_expensive_check=False):
    import cugraph_tpu as ct

    if isinstance(graph, MGGraph):
        from cugraph_tpu.parallel import mg_k_truss

        src, dst, w = mg_k_truss(graph.graph(), graph.mesh, k)
        return src, dst, w
    H = ct.ktruss_subgraph(_sg(graph), k)
    src, dst, w = H.edgelist_arrays()
    return (H.number_map.to_external(src), H.number_map.to_external(dst),
            w if w is not None else np.ones(len(src), np.float32))


def egonet(resource_handle, graph, source_vertices, radius,
           do_expensive_check=False):
    import cugraph_tpu as ct

    if isinstance(graph, MGGraph):
        from cugraph_tpu.parallel import mg_egonet

        return mg_egonet(graph.graph(), graph.mesh, source_vertices,
                         radius=radius)
    df, offsets = ct.batched_ego_graphs(_sg(graph), source_vertices, radius)
    return (df["src"].to_numpy(), df["dst"].to_numpy(),
            df["weight"].to_numpy() if "weight" in df else
            np.ones(len(df), np.float32), np.asarray(offsets))


def balanced_cut_clustering(resource_handle, graph, num_clusters,
                            num_eigenvectors=2, evs_tolerance=1e-5,
                            evs_max_iterations=100, kmean_tolerance=1e-5,
                            kmean_max_iterations=100, do_expensive_check=False):
    import cugraph_tpu as ct

    df = ct.spectralBalancedCutClustering(
        _sg(graph), num_clusters, num_eigen_vects=num_eigenvectors,
        evs_tolerance=evs_tolerance, evs_max_iter=evs_max_iterations,
        kmean_tolerance=kmean_tolerance, kmean_max_iter=kmean_max_iterations)
    df = df.sort_values("vertex")
    return df["vertex"].to_numpy(), df["cluster"].to_numpy()


def spectral_modularity_maximization(resource_handle, graph, num_clusters,
                                     num_eigenvectors=2, **kw):
    import cugraph_tpu as ct

    df = ct.spectralModularityMaximizationClustering(
        _sg(graph), num_clusters, num_eigen_vects=num_eigenvectors)
    df = df.sort_values("vertex")
    return df["vertex"].to_numpy(), df["cluster"].to_numpy()


def analyze_clustering_modularity(resource_handle, graph, num_clusters,
                                  vertex, cluster):
    import cugraph_tpu as ct
    import pandas as pd

    df = pd.DataFrame({"vertex": np.asarray(vertex),
                       "cluster": np.asarray(cluster)})
    return float(ct.analyzeClustering_modularity(_sg(graph), num_clusters, df,
                                                 "vertex", "cluster"))


def analyze_clustering_edge_cut(resource_handle, graph, num_clusters, vertex,
                                cluster):
    import cugraph_tpu as ct
    import pandas as pd

    df = pd.DataFrame({"vertex": np.asarray(vertex),
                       "cluster": np.asarray(cluster)})
    return float(ct.analyzeClustering_edge_cut(_sg(graph), num_clusters, df,
                                               "vertex", "cluster"))


def analyze_clustering_ratio_cut(resource_handle, graph, num_clusters, vertex,
                                 cluster):
    import cugraph_tpu as ct
    import pandas as pd

    df = pd.DataFrame({"vertex": np.asarray(vertex),
                       "cluster": np.asarray(cluster)})
    return float(ct.analyzeClustering_ratio_cut(_sg(graph), num_clusters, df,
                                                "vertex", "cluster"))


# -- cores -------------------------------------------------------------------

def core_number(resource_handle, graph, degree_type="bidirectional",
                do_expensive_check=False):
    import cugraph_tpu as ct

    if isinstance(graph, MGGraph):
        from cugraph_tpu.parallel import mg_core_number

        core = mg_core_number(graph.graph(), graph.mesh, degree_type=degree_type)
        n = graph.graph().num_vertices
        return np.arange(n, dtype=np.int32), _host(core)[:n]
    df = ct.core_number(_sg(graph), degree_type=degree_type).sort_values("vertex")
    return df["vertex"].to_numpy(), df["core_number"].to_numpy()


def k_core(resource_handle, graph, k=None, degree_type="bidirectional",
           core_result=None, do_expensive_check=False):
    import cugraph_tpu as ct

    if isinstance(graph, MGGraph):
        from cugraph_tpu.parallel import mg_k_core

        src, dst, w, _core = mg_k_core(graph.graph(), graph.mesh, k=k,
                                       degree_type=degree_type)
        return src, dst, w
    core_df = None
    if core_result is not None:
        import pandas as pd

        if isinstance(core_result, tuple):
            core_df = pd.DataFrame({"vertex": np.asarray(core_result[0]),
                                    "core_number": np.asarray(core_result[1])})
        else:
            core_df = core_result
    H = ct.k_core(_sg(graph), k=k, degree_type=degree_type,
                  core_number_df=core_df)
    src, dst, w = H.edgelist_arrays()
    return (H.number_map.to_external(src), H.number_map.to_external(dst),
            w if w is not None else np.ones(len(src), np.float32))


# -- components --------------------------------------------------------------

def _legacy_csr_graph(offsets, indices, weights):
    """Legacy CSR-input path of the reference wcc/scc pyx (graph=None)."""
    import cugraph_tpu as ct

    offs = np.asarray(offsets)
    idx = np.asarray(indices)
    src = np.repeat(np.arange(len(offs) - 1), np.diff(offs))
    w = None if weights is None else np.asarray(weights)
    G = ct.Graph(directed=True)
    G.from_edgelist(src, idx, w, vertices=np.arange(len(offs) - 1),
                    renumber=False)
    return G


def weakly_connected_components(resource_handle, graph, offsets=None,
                                indices=None, weights=None, labels=None,
                                do_expensive_check=False):
    import cugraph_tpu as ct

    if graph is None and offsets is not None:
        graph = _legacy_csr_graph(offsets, indices, weights)
    if isinstance(graph, MGGraph):
        from cugraph_tpu.parallel import mg_wcc

        lab = mg_wcc(graph.graph(), graph.mesh)
        n = graph.graph().num_vertices
        return np.arange(n, dtype=np.int32), _host(lab)[:n]
    df = ct.weakly_connected_components(_sg(graph)).sort_values("vertex")
    return df["vertex"].to_numpy(), df["labels"].to_numpy()


def strongly_connected_components(resource_handle, graph, offsets=None,
                                  indices=None, weights=None, labels=None,
                                  do_expensive_check=False):
    import cugraph_tpu as ct

    if graph is None and offsets is not None:
        graph = _legacy_csr_graph(offsets, indices, weights)
    if isinstance(graph, MGGraph):
        from cugraph_tpu.parallel import mg_strongly_connected_components

        lab = mg_strongly_connected_components(graph.graph(), graph.mesh)
        n = graph.graph().num_vertices
        return np.arange(n, dtype=np.int32), _host(lab)[:n]
    df = ct.strongly_connected_components(_sg(graph)).sort_values("vertex")
    return df["vertex"].to_numpy(), df["labels"].to_numpy()


# -- similarity --------------------------------------------------------------

def _sim(fn, graph, first, second, use_weight=False):
    import pandas as pd

    df = fn(_sg(graph), pd.DataFrame({"first": np.asarray(first),
                                      "second": np.asarray(second)}),
            use_weight=use_weight)
    col = [c for c in df.columns if c.endswith("_coeff")][0]
    return df["first"].to_numpy(), df["second"].to_numpy(), df[col].to_numpy()


def jaccard_coefficients(resource_handle, graph, first, second,
                         use_weight=False, do_expensive_check=False):
    import cugraph_tpu as ct

    if isinstance(graph, MGGraph):
        from cugraph_tpu.parallel import mg_jaccard_coefficients

        return _mg_sim(mg_jaccard_coefficients, graph, first, second)
    return _sim(ct.jaccard, graph, first, second, use_weight)


def _mg_sim(mg_fn, graph, first, second):
    c = mg_fn(graph.graph(), graph.mesh, first, second)
    return np.asarray(first), np.asarray(second), np.asarray(c)


def sorensen_coefficients(resource_handle, graph, first, second,
                          use_weight=False, do_expensive_check=False):
    import cugraph_tpu as ct

    if isinstance(graph, MGGraph):
        from cugraph_tpu.parallel import mg_sorensen_coefficients

        return _mg_sim(mg_sorensen_coefficients, graph, first, second)
    return _sim(ct.sorensen, graph, first, second, use_weight)


def overlap_coefficients(resource_handle, graph, first, second,
                         use_weight=False, do_expensive_check=False):
    import cugraph_tpu as ct

    if isinstance(graph, MGGraph):
        from cugraph_tpu.parallel import mg_overlap_coefficients

        return _mg_sim(mg_overlap_coefficients, graph, first, second)
    return _sim(ct.overlap, graph, first, second, use_weight)


def cosine_coefficients(resource_handle, graph, first, second,
                        use_weight=False, do_expensive_check=False):
    import cugraph_tpu as ct

    if isinstance(graph, MGGraph):
        from cugraph_tpu.parallel import mg_cosine_coefficients

        return _mg_sim(mg_cosine_coefficients, graph, first, second)
    return _sim(ct.cosine, graph, first, second, use_weight)


def _all_pairs(fn, graph, vertices, topk, kind=None):
    if isinstance(graph, MGGraph):
        from cugraph_tpu.parallel import mg_all_pairs_similarity

        df = mg_all_pairs_similarity(graph.graph(), graph.mesh, kind=kind,
                                     vertices=vertices, topk=topk)
    else:
        df = fn(_sg(graph), vertices=vertices, topk=topk)
    col = [c for c in df.columns if c.endswith("_coeff")][0]
    return df["first"].to_numpy(), df["second"].to_numpy(), df[col].to_numpy()


def all_pairs_jaccard_coefficients(resource_handle, graph, vertices=None,
                                   use_weight=False, topk=None,
                                   do_expensive_check=False):
    import cugraph_tpu as ct

    return _all_pairs(ct.all_pairs_jaccard, graph, vertices, topk, "jaccard")


def all_pairs_sorensen_coefficients(resource_handle, graph, vertices=None,
                                    use_weight=False, topk=None,
                                    do_expensive_check=False):
    import cugraph_tpu as ct

    return _all_pairs(ct.all_pairs_sorensen, graph, vertices, topk, "sorensen")


def all_pairs_overlap_coefficients(resource_handle, graph, vertices=None,
                                   use_weight=False, topk=None,
                                   do_expensive_check=False):
    import cugraph_tpu as ct

    return _all_pairs(ct.all_pairs_overlap, graph, vertices, topk, "overlap")


def all_pairs_cosine_coefficients(resource_handle, graph, vertices=None,
                                  use_weight=False, topk=None,
                                  do_expensive_check=False):
    import cugraph_tpu as ct

    return _all_pairs(ct.all_pairs_cosine, graph, vertices, topk, "cosine")


# -- sampling / walks --------------------------------------------------------

def uniform_random_walks(resource_handle, graph, start_vertices, max_length,
                         random_state=None):
    import cugraph_tpu as ct

    if isinstance(graph, MGGraph):
        from cugraph_tpu.parallel import mg_uniform_random_walks

        return mg_uniform_random_walks(
            graph.graph(), graph.mesh, start_vertices, max_length,
            seed=_seed(random_state))
    df = ct.uniform_random_walks(_sg(graph), start_vertices, max_length,
                                 random_state=random_state)
    return df


def biased_random_walks(resource_handle, graph, start_vertices, max_length,
                        random_state=None):
    import cugraph_tpu as ct

    if isinstance(graph, MGGraph):
        from cugraph_tpu.parallel import mg_biased_random_walks

        return mg_biased_random_walks(graph.graph(), graph.mesh,
                                      start_vertices, max_length,
                                      seed=_seed(random_state))
    return ct.biased_random_walks(_sg(graph), start_vertices, max_length,
                                  random_state=random_state)


def node2vec_random_walks(resource_handle, graph, start_vertices, max_length,
                          p=1.0, q=1.0, random_state=None):
    import cugraph_tpu as ct

    if isinstance(graph, MGGraph):
        from cugraph_tpu.parallel import mg_node2vec_random_walks

        return mg_node2vec_random_walks(graph.graph(), graph.mesh,
                                        start_vertices, max_length, p=p, q=q,
                                        seed=_seed(random_state))
    return ct.node2vec_random_walks(_sg(graph), start_vertices, max_length,
                                    p=p, q=q, random_state=random_state)


def uniform_neighbor_sample(resource_handle, graph, start_list, fanout_vals,
                            with_replacement=True, random_state=None, **kw):
    import cugraph_tpu as ct

    if isinstance(graph, MGGraph):
        from cugraph_tpu.parallel import mg_uniform_neighbor_sample

        return mg_uniform_neighbor_sample(
            graph.graph(), graph.mesh, start_list, fanout_vals,
            with_replacement=with_replacement, seed=_seed(random_state))
    return ct.uniform_neighbor_sample(_sg(graph), start_list, fanout_vals,
                                      with_replacement=with_replacement,
                                      random_state=random_state)


def _fanout_compat(starting_vertex_label_offsets, h_fan_out):
    """Reference order is (..., starting_vertex_label_offsets, h_fan_out);
    legacy 4-positional calls passed the fanout in the offsets slot."""
    if h_fan_out is None:
        return None, starting_vertex_label_offsets
    return starting_vertex_label_offsets, h_fan_out


def _label_offsets_to_batches(offsets, start_list, kw):
    """starting_vertex_label_offsets → batch_id_list (the reference groups
    seeds into labels by CSR offsets, sampling_functions.hpp:512; the
    wrappers previously DROPPED the offsets — round-5 review finding).
    Explicit batch_id_list wins when both are given."""
    if offsets is None or kw.get("batch_id_list") is not None:
        return kw
    off = np.asarray(offsets, np.int64).reshape(-1)
    n_seeds = len(np.asarray(start_list).reshape(-1))
    if len(off) < 2 or off[0] != 0 or off[-1] != n_seeds or \
            (np.diff(off) < 0).any():
        raise ValueError(
            f"starting_vertex_label_offsets must be a CSR over the "
            f"{n_seeds} start vertices (got {offsets!r})")
    kw = dict(kw)
    kw["batch_id_list"] = np.repeat(
        np.arange(len(off) - 1, dtype=np.int32), np.diff(off))
    return kw


def _mg_sample_kw(kw):
    """Map plc sampler kwargs onto the MG engine's knobs, including the
    reference sampling_flags_t fields (sampling_functions.hpp:36-76)."""
    out = {
        "with_replacement": bool(kw.get("with_replacement", False)),
        "seed": _seed(kw.get("random_state")),
    }
    for name in ("prior_sources_behavior", "dedupe_sources",
                 "deduplicate_sources", "return_hops",
                 "with_edge_properties", "batch_id_list",
                 "disjoint_sampling", "temporal_sampling_comparison"):
        if kw.get(name) is not None:
            out[name] = kw[name]
    return out


def _strip_out(kw):
    """Drop the OUTPUT-shaping kwargs before forwarding to the engines
    (they are consumed by _finish_sample)."""
    return {k: v for k, v in kw.items()
            if k not in ("renumber", "compression", "compress_per_hop",
                         "retain_seeds")}


def _seeds_per_label(kw, start_list):
    seeds = np.asarray(start_list).reshape(-1)
    bl = kw.get("batch_id_list")
    if bl is None:
        bl = np.arange(len(seeds))
    out = {}
    for s, b in zip(seeds, np.asarray(bl).reshape(-1)):
        out.setdefault(int(b), []).append(int(s))
    return {b: np.asarray(v) for b, v in out.items()}


def _finish_sample(df, kw, start_list, vertex_type_offsets=None,
                   num_edge_types=None):
    """Apply the reference's sampler OUTPUT options (pyx:184-205):
    ``renumber=True`` renumbers per batch and compresses per ``compression``
    ("COO" default /"CSR"/"CSC"/"DCSR"/"DCSC") honoring ``compress_per_hop``;
    ``retain_seeds`` keeps outgoing-edge-less seeds in the renumber map.
    With ``vertex_type_offsets`` (the heterogeneous samplers) the renumber
    routes through heterogeneous_renumber_and_sort_sampled_edgelist —
    per-(label, vertex type) segmented maps, (label, edge type, hop) sorted
    COO (c_api/neighbor_sampling.cpp:579).
    Returns the plain frame when renumber is off (the default)."""
    if not kw.get("renumber"):
        return df
    import cugraph_tpu as ct

    compression = str(kw.get("compression") or "COO").upper()
    if compression not in ("COO", "CSR", "CSC", "DCSR", "DCSC"):
        raise ValueError(f"unknown compression {compression!r}")
    seeds_per_label = None
    if kw.get("retain_seeds") and start_list is not None:
        seeds_per_label = _seeds_per_label(kw, start_list)
    src_is_major = compression not in ("CSC", "DCSC")
    if vertex_type_offsets is not None:
        # heterogeneous path: renumber+SORT only (the reference's C API
        # pairs vertex_type_offsets with the sort entry, not compression)
        if compression not in ("COO", "CSC"):
            raise ValueError(
                "heterogeneous renumbering (vertex_type_offsets) emits "
                "sorted COO only; use compression='COO' (src major) or "
                "'CSC' (dst major)")
        return ct.heterogeneous_renumber_and_sort_sampled_edgelist(
            df, vertex_type_offsets=vertex_type_offsets,
            num_edge_types=num_edge_types, src_is_major=src_is_major,
            seed_vertices_per_label=seeds_per_label)
    out = ct.renumber_and_compress_sampled_edgelist(
        df, src_is_major=src_is_major,
        compress_per_hop=bool(kw.get("compress_per_hop", False)),
        doubly_compress=compression in ("DCSR", "DCSC"),
        seed_vertices_per_label=seeds_per_label)
    if compression == "COO":
        # expand the offsets back to explicit renumbered majors (the
        # reference's COO mode returns majors alongside minors), and convert
        # label_hop_offsets from offset-array indices to EDGE indices so
        # minors[lho[i]:lho[i+1]] segments stay meaningful
        lho = out["label_hop_offsets"]
        majors, edge_lho = [], [0]
        for si in range(len(lho) - 1):
            offs = out["major_offsets"][lho[si]:lho[si + 1]]
            majors.append(np.repeat(np.arange(len(offs) - 1), np.diff(offs)))
            edge_lho.append(edge_lho[-1] + int(offs[-1] if len(offs) else 0))
        out["majors"] = (np.concatenate(majors) if majors
                         else np.zeros(0, np.int64))
        out["label_hop_offsets"] = np.asarray(edge_lho, np.int64)
        out["major_offsets"] = None
    return out


def _mg_attach_ids(graph, df, kw):
    """Attach sampled edge ids when the MGGraph carries an id table and the
    caller asked for edge properties (gather_sampled_properties.cuh role)."""
    if (kw.get("with_edge_properties")
            and getattr(graph, "_edge_id_table", None) is not None
            and len(df)):
        df["edge_id"] = graph.lookup_edge_ids(df["sources"].to_numpy(),
                                              df["destinations"].to_numpy())
    return df


def homogeneous_uniform_neighbor_sample(resource_handle, graph, start_list,
                                        starting_vertex_label_offsets=None,
                                        h_fan_out=None, **kw):
    import cugraph_tpu as ct

    offs, fanout_vals = _fanout_compat(starting_vertex_label_offsets,
                                       h_fan_out)
    kw = _label_offsets_to_batches(offs, start_list, kw)
    kw.setdefault("with_replacement", False)  # one default for SG and MG
    if isinstance(graph, MGGraph):
        from cugraph_tpu.parallel import mg_uniform_neighbor_sample

        df = mg_uniform_neighbor_sample(graph.graph(), graph.mesh,
                                        start_list, fanout_vals,
                                        **_mg_sample_kw(kw))
        return _finish_sample(_mg_attach_ids(graph, df, kw), kw, start_list)
    return _finish_sample(
        ct.homogeneous_uniform_neighbor_sample(_sg(graph), start_list,
                                               fanout_vals, **_strip_out(kw)),
        kw, start_list)


def homogeneous_biased_neighbor_sample(resource_handle, graph, start_list,
                                       starting_vertex_label_offsets=None,
                                       h_fan_out=None, **kw):
    import cugraph_tpu as ct

    offs, fanout_vals = _fanout_compat(starting_vertex_label_offsets,
                                       h_fan_out)
    kw = _label_offsets_to_batches(offs, start_list, kw)
    kw.setdefault("with_replacement", False)  # one default for SG and MG
    if isinstance(graph, MGGraph):
        from cugraph_tpu.parallel import mg_biased_neighbor_sample

        df = mg_biased_neighbor_sample(graph.graph(), graph.mesh,
                                       start_list, fanout_vals,
                                       **_mg_sample_kw(kw))
        return _finish_sample(_mg_attach_ids(graph, df, kw), kw, start_list)
    return _finish_sample(
        ct.homogeneous_biased_neighbor_sample(_sg(graph), start_list,
                                              fanout_vals, **_strip_out(kw)),
        kw, start_list)


def heterogeneous_uniform_neighbor_sample(resource_handle, graph, start_list,
                                          starting_vertex_label_offsets=None,
                                          vertex_type_offsets=None,
                                          h_fan_out=None, *,
                                          num_edge_types=None, **kw):
    """Reference positional order (heterogeneous_*.pyx:74): label/type
    offsets precede h_fan_out; legacy (start, fanout, num_edge_types)
    calls are detected by the missing h_fan_out."""
    import cugraph_tpu as ct

    if h_fan_out is None:
        h_fan_out = starting_vertex_label_offsets
        if num_edge_types is None:
            # legacy positional slot held num_edge_types; an EXPLICIT
            # keyword vertex_type_offsets alongside num_edge_types must
            # survive (it drives the heterogeneous renumber)
            num_edge_types = vertex_type_offsets
            vertex_type_offsets = None
    if isinstance(graph, MGGraph):
        from cugraph_tpu.parallel import mg_heterogeneous_neighbor_sample

        return _finish_sample(mg_heterogeneous_neighbor_sample(
            graph.graph(), graph.mesh, start_list, h_fan_out,
            num_edge_types=num_edge_types, **_mg_sample_kw(kw)),
            kw, start_list, vertex_type_offsets, num_edge_types)
    return _finish_sample(ct.heterogeneous_uniform_neighbor_sample(
        _sg(graph), start_list, h_fan_out, num_edge_types=num_edge_types,
        **_strip_out(kw)), kw, start_list, vertex_type_offsets,
        num_edge_types)


def heterogeneous_biased_neighbor_sample(resource_handle, graph, start_list,
                                         starting_vertex_label_offsets=None,
                                         vertex_type_offsets=None,
                                         h_fan_out=None, *,
                                         num_edge_types=None, **kw):
    import cugraph_tpu as ct

    if h_fan_out is None:
        h_fan_out = starting_vertex_label_offsets
        if num_edge_types is None:
            # see uniform twin: only null the slot when it was CONSUMED
            num_edge_types = vertex_type_offsets
            vertex_type_offsets = None
    if isinstance(graph, MGGraph):
        from cugraph_tpu.parallel import mg_heterogeneous_neighbor_sample

        return _finish_sample(mg_heterogeneous_neighbor_sample(
            graph.graph(), graph.mesh, start_list, h_fan_out,
            num_edge_types=num_edge_types, biased=True, **_mg_sample_kw(kw)),
            kw, start_list, vertex_type_offsets, num_edge_types)
    return _finish_sample(ct.heterogeneous_biased_neighbor_sample(
        _sg(graph), start_list, h_fan_out, num_edge_types=num_edge_types,
        **_strip_out(kw)), kw, start_list, vertex_type_offsets,
        num_edge_types)


def _temporal_compat(args, kw):
    """Reference order (homogeneous_uniform_temporal_*.pyx:76):
    (temporal_property_name, start_vertex_list, starting_vertex_start_times,
    starting_vertex_label_offsets, h_fan_out).  Legacy calls passed
    (start_list, fanout_vals[, num_edge_types], seed_time=...).  Detect by
    the leading string property name."""
    if args and isinstance(args[0], str):
        start_list = args[1]
        start_times = args[2] if len(args) > 2 else None
        fanout = args[4] if len(args) > 4 else kw.pop("h_fan_out", None)
        if start_times is not None:
            # PER-SEED start times flow through whole (the engines
            # broadcast a scalar or take the aligned array; collapsing to
            # the first element gave every seed the wrong eligibility
            # window — round-5 review finding)
            st = np.asarray(start_times, np.float32).reshape(-1)
            kw.setdefault("seed_time",
                          float(st[0]) if len(st) == 1 else st)
        return start_list, fanout, kw
    start_list = args[0]
    fanout = args[1] if len(args) > 1 else kw.pop("h_fan_out", None)
    if len(args) > 2 and args[2] is not None:
        kw.setdefault("num_edge_types", args[2])
    return start_list, fanout, kw


def homogeneous_uniform_temporal_neighbor_sample(resource_handle, graph,
                                                 *args, **kw):
    """Temporal variant (reference homogeneous_uniform_temporal_neighbor_
    sample.pyx / temporal_sampling_impl.cuh); accepts both the reference
    positional order and the legacy (start, fanout) form."""
    import cugraph_tpu as ct

    start_list, fanout_vals, kw = _temporal_compat(args, kw)
    kw.pop("num_edge_types", None)
    if isinstance(graph, MGGraph):
        from cugraph_tpu.parallel import mg_temporal_neighbor_sample

        return _finish_sample(mg_temporal_neighbor_sample(
            graph.graph(), graph.mesh, start_list, fanout_vals,
            seed_time=float(kw.get("seed_time", 0.0)),
            strict=bool(kw.get("strict", True)), **_mg_sample_kw(kw)),
            kw, start_list)
    return _finish_sample(ct.homogeneous_uniform_temporal_neighbor_sample(
        _sg(graph), start_list, fanout_vals, **_strip_out(kw)),
        kw, start_list)


def homogeneous_biased_temporal_neighbor_sample(resource_handle, graph,
                                                *args, **kw):
    import cugraph_tpu as ct

    start_list, fanout_vals, kw = _temporal_compat(args, kw)
    kw.pop("num_edge_types", None)
    if isinstance(graph, MGGraph):
        from cugraph_tpu.parallel import mg_temporal_neighbor_sample

        return _finish_sample(mg_temporal_neighbor_sample(
            graph.graph(), graph.mesh, start_list, fanout_vals,
            seed_time=float(kw.get("seed_time", 0.0)), biased=True,
            strict=bool(kw.get("strict", True)), **_mg_sample_kw(kw)),
            kw, start_list)
    return _finish_sample(ct.homogeneous_biased_temporal_neighbor_sample(
        _sg(graph), start_list, fanout_vals, **_strip_out(kw)),
        kw, start_list)


def heterogeneous_uniform_temporal_neighbor_sample(resource_handle, graph,
                                                   *args, **kw):
    import cugraph_tpu as ct

    start_list, fanout_vals, kw = _temporal_compat(args, kw)
    if isinstance(graph, MGGraph):
        from cugraph_tpu.parallel import (
            mg_heterogeneous_temporal_neighbor_sample)

        return _finish_sample(mg_heterogeneous_temporal_neighbor_sample(
            graph.graph(), graph.mesh, start_list, fanout_vals,
            num_edge_types=kw.get("num_edge_types"),
            seed_time=float(kw.get("seed_time", 0.0)),
            strict=bool(kw.get("strict", True)), **_mg_sample_kw(kw)),
            kw, start_list)
    return _finish_sample(ct.heterogeneous_uniform_temporal_neighbor_sample(
        _sg(graph), start_list, fanout_vals, **_strip_out(kw)),
        kw, start_list)


def heterogeneous_biased_temporal_neighbor_sample(resource_handle, graph,
                                                  *args, **kw):
    import cugraph_tpu as ct

    start_list, fanout_vals, kw = _temporal_compat(args, kw)
    if isinstance(graph, MGGraph):
        from cugraph_tpu.parallel import (
            mg_heterogeneous_temporal_neighbor_sample)

        return _finish_sample(mg_heterogeneous_temporal_neighbor_sample(
            graph.graph(), graph.mesh, start_list, fanout_vals,
            num_edge_types=kw.get("num_edge_types"),
            seed_time=float(kw.get("seed_time", 0.0)), biased=True,
            strict=bool(kw.get("strict", True)), **_mg_sample_kw(kw)),
            kw, start_list)
    return _finish_sample(ct.heterogeneous_biased_temporal_neighbor_sample(
        _sg(graph), start_list, fanout_vals, **_strip_out(kw)),
        kw, start_list)


def negative_sampling(resource_handle, graph, num_samples, random_state=None,
                      vertices=None, src_bias=None, dst_bias=None,
                      remove_duplicates=True, remove_false_negatives=True,
                      exact_number_of_samples=False, do_expensive_check=False):
    """Reference positional order (negative_sampling.pyx:57):
    random_state fourth, then vertices/biases."""
    import cugraph_tpu as ct

    if isinstance(graph, MGGraph):
        from cugraph_tpu.parallel import mg_negative_sampling

        df = mg_negative_sampling(
            graph.graph(), graph.mesh, num_samples, seed=_seed(random_state),
            remove_duplicates=remove_duplicates,
            remove_existing_edges=remove_false_negatives,
            src_bias=src_bias, dst_bias=dst_bias, vertices=vertices,
            exact_number_of_samples=exact_number_of_samples)
        return df["src"].to_numpy(), df["dst"].to_numpy()
    df = ct.negative_sampling(_sg(graph), num_samples, vertices=vertices,
                              src_bias=src_bias, dst_bias=dst_bias,
                              remove_duplicates=remove_duplicates,
                              remove_existing_edges=remove_false_negatives,
                              exact_number_of_samples=exact_number_of_samples,
                              random_state=_seed(random_state))
    return df["src"].to_numpy(), df["dst"].to_numpy()


# -- generators --------------------------------------------------------------

def generate_rmat_edgelist(resource_handle, random_state, scale, num_edges,
                           a=0.57, b=0.19, c=0.19, clip_and_flip=False,
                           scramble_vertex_ids=False, include_edge_weights=False,
                           minimum_weight=0.0, maximum_weight=1.0, dtype=None,
                           include_edge_ids=False, include_edge_types=False,
                           min_edge_type_value=0, max_edge_type_value=0,
                           multi_gpu=False):
    import cugraph_tpu as ct

    df = ct.rmat(scale, num_edges, a, b, c,
                 seed=_seed(random_state),
                 clip_and_flip=clip_and_flip,
                 scramble_vertex_ids=scramble_vertex_ids,
                 include_edge_weights=include_edge_weights,
                 minimum_weight=minimum_weight, maximum_weight=maximum_weight)
    # multi_gpu: N/A here — generation is host-side and the MGGraph build
    # shards the result (the reference flag picks the MG C++ generator)
    out = [df["src"].to_numpy(), df["dst"].to_numpy()]
    if include_edge_weights:
        w = df["weights"].to_numpy()
        out.append(w.astype(dtype) if dtype is not None else w)
    if include_edge_ids:
        out.append(np.arange(len(df), dtype=np.int64))
    if include_edge_types:
        rng_t = np.random.default_rng(_seed(random_state) + 7)
        out.append(rng_t.integers(min_edge_type_value,
                                  max(max_edge_type_value,
                                      min_edge_type_value) + 1,
                                  len(df)).astype(np.int32))
    return tuple(out)


def generate_rmat_edgelists(resource_handle, random_state, n_edgelists,
                            min_scale, max_scale, edge_factor=16, **kw):
    from cugraph_tpu.generators.rmat import generate_rmat_edgelists as gen

    return gen(n_edgelists, min_scale, max_scale, edge_factor=edge_factor,
               seed=_seed(random_state))


# -- structure / misc --------------------------------------------------------

def two_hop_neighbors(resource_handle, graph, start_vertices=None,
                      do_expensive_check=False):
    import cugraph_tpu as ct

    if isinstance(graph, MGGraph):
        from cugraph_tpu.parallel import mg_two_hop_neighbors

        return mg_two_hop_neighbors(graph.graph(), graph.mesh,
                                    start_vertices=start_vertices)
    df = ct.two_hop_neighbors(_sg(graph))
    if start_vertices is not None:
        # match the MG path and get_two_hop_neighbors: pairs FROM the
        # given starts only (review finding: the SG path ignored it)
        sel = np.isin(df["first"].to_numpy(),
                      np.asarray(start_vertices).reshape(-1))
        df = df[sel]
    return df["first"].to_numpy(), df["second"].to_numpy()


def _mg_degree_arrays(graph):
    # edge COUNTS (the plc degrees contract) — DistGraph.in/out_degree hold
    # WEIGHT sums (the pagerank normalizer); count from the cached host COO
    from cugraph_tpu.parallel.louvain import _gather_edges_host

    g = graph.graph()
    n = g.num_vertices
    src, dst, _w = _gather_edges_host(g)
    return (np.arange(n, dtype=np.int32),
            np.bincount(dst, minlength=n)[:n].astype(np.int64),
            np.bincount(src, minlength=n)[:n].astype(np.int64))


def _subset_deg(verts, deg, source_vertices):
    if source_vertices is None:
        return verts, deg
    sel = np.asarray(source_vertices).reshape(-1)
    return verts[sel], deg[sel]


def degrees(resource_handle, graph, source_vertices=None,
            do_expensive_check=False):
    if isinstance(graph, MGGraph):
        verts, din, dout = _mg_degree_arrays(graph)
        v1, din = _subset_deg(verts, din, source_vertices)
        _, dout = _subset_deg(verts, dout, source_vertices)
        return v1, din, dout
    G = _sg(graph)
    df = G.degrees(vertex_subset=source_vertices).sort_values("vertex")
    return (df["vertex"].to_numpy(), df["in_degree"].to_numpy(),
            df["out_degree"].to_numpy())


def in_degrees(resource_handle, graph, source_vertices=None, **kw):
    if isinstance(graph, MGGraph):
        verts, din, _ = _mg_degree_arrays(graph)
        return _subset_deg(verts, din, source_vertices)
    G = _sg(graph)
    df = G.in_degree(source_vertices).sort_values("vertex")
    return df["vertex"].to_numpy(), df["degree"].to_numpy()


def out_degrees(resource_handle, graph, source_vertices=None, **kw):
    if isinstance(graph, MGGraph):
        verts, _, dout = _mg_degree_arrays(graph)
        return _subset_deg(verts, dout, source_vertices)
    G = _sg(graph)
    df = G.out_degree(source_vertices).sort_values("vertex")
    return df["vertex"].to_numpy(), df["degree"].to_numpy()


def select_random_vertices(resource_handle, graph, random_state, num_vertices):
    import cugraph_tpu as ct

    if isinstance(graph, MGGraph):
        n = graph.graph().num_vertices
        rng = np.random.default_rng(_seed(random_state))
        return rng.choice(n, size=min(int(num_vertices), n), replace=False)
    return ct.select_random_vertices(_sg(graph), num_vertices,
                                     random_state=random_state)


def _mg_edges_host(graph):
    from cugraph_tpu.parallel.louvain import _gather_edges_host

    return _gather_edges_host(graph.graph())


def replicate_edgelist(resource_handle, src_array=None, dst_array=None,
                       weight_array=None, graph=None, **kw):
    import cugraph_tpu as ct

    if isinstance(graph, MGGraph):
        src, dst, _w = _mg_edges_host(graph)
        return src, dst
    if graph is not None:
        df = ct.replicate_edgelist(_sg(graph))
        return df["src"].to_numpy(), df["dst"].to_numpy()
    if weight_array is not None:
        return (np.asarray(src_array), np.asarray(dst_array),
                np.asarray(weight_array))
    return np.asarray(src_array), np.asarray(dst_array)


def decompress_to_edgelist(resource_handle, graph, do_expensive_check=False):
    import cugraph_tpu as ct

    if isinstance(graph, MGGraph):
        return _mg_edges_host(graph)
    df = ct.decompress_to_edgelist(_sg(graph))
    out = [df["src"].to_numpy(), df["dst"].to_numpy()]
    if "weight" in df:
        out.append(df["weight"].to_numpy())
    return tuple(out)


def extract_vertex_list(resource_handle, graph, do_expensive_check=False):
    import cugraph_tpu as ct

    if isinstance(graph, MGGraph):
        return np.arange(graph.graph().num_vertices, dtype=np.int64)
    return ct.extract_vertex_list(_sg(graph))


def has_vertex(resource_handle, graph, vertices):
    if isinstance(graph, MGGraph):
        v = np.asarray(vertices).reshape(-1)
        nmap = getattr(graph, "number_map", None)
        if nmap is not None:          # sharded build: EXTERNAL id space
            return nmap.contains(v)
        n = graph.graph().num_vertices
        return (v >= 0) & (v < n)
    G = _sg(graph)
    return np.array([G.has_vertex(v) for v in np.asarray(vertices).reshape(-1)])


def count_multi_edges(resource_handle, graph, do_expensive_check=False):
    import cugraph_tpu as ct

    if isinstance(graph, MGGraph):
        src, dst, _w = _mg_edges_host(graph)
        n = graph.graph().pad_v
        keys = src.astype(np.int64) * np.int64(n) + dst
        _, counts = np.unique(keys, return_counts=True)
        return int((counts - 1).sum())
    return ct.count_multi_edges(_sg(graph))


def renumber_arbitrary_edgelist(resource_handle, renumber_map, src_array,
                                dst_array):
    """Ids become POSITIONS in the caller-supplied renumber_map
    (pylibcugraph renumber_arbitrary_edgelist.pyx contract)."""
    rmap = np.asarray(renumber_map)
    order = np.argsort(rmap, kind="stable")
    sorted_map = rmap[order]

    def to_pos(a):
        a = np.asarray(a)
        pos = np.searchsorted(sorted_map, a)
        pos = np.clip(pos, 0, max(len(sorted_map) - 1, 0))
        if len(sorted_map) == 0 or not np.all(sorted_map[pos] == a):
            raise ValueError("edge endpoint not present in renumber_map")
        return order[pos].astype(np.int32)

    return to_pos(src_array), to_pos(dst_array)


def minimum_spanning_tree(resource_handle, graph, do_expensive_check=False):
    import cugraph_tpu as ct

    df = ct.minimum_spanning_tree(_sg(graph))
    src, dst, w = df._src, df._dst, df._weight
    return (df.number_map.to_external(src), df.number_map.to_external(dst),
            w if w is not None else np.ones(len(src), np.float32))


def induced_subgraph(resource_handle, graph, subgraph_vertices,
                     subgraph_offsets=None, do_expensive_check=False):
    import cugraph_tpu as ct

    if isinstance(graph, MGGraph):
        from cugraph_tpu.parallel import mg_induced_subgraph

        src, dst, w = mg_induced_subgraph(graph.graph(), graph.mesh,
                                          subgraph_vertices)
        return src, dst, w, np.asarray([0, len(src)])
    if subgraph_offsets is not None and len(subgraph_offsets) > 2:
        # multiple induced subgraphs in one call (induced_subgraph.pyx):
        # offsets delimit vertex groups; results concatenate with edge
        # offsets per group
        so = np.asarray(subgraph_offsets)
        sv = np.asarray(subgraph_vertices)
        srcs, dsts, ws, eoff = [], [], [], [0]
        for gi in range(len(so) - 1):
            df, _ = ct.induced_subgraph(_sg(graph), sv[so[gi]:so[gi + 1]])
            srcs.append(df["src"].to_numpy())
            dsts.append(df["dst"].to_numpy())
            ws.append(df["weight"].to_numpy(np.float32) if "weight" in df
                      else np.ones(len(df), np.float32))
            eoff.append(eoff[-1] + len(df))
        return (np.concatenate(srcs) if srcs else np.empty(0, np.int64),
                np.concatenate(dsts) if dsts else np.empty(0, np.int64),
                np.concatenate(ws) if ws else np.empty(0, np.float32),
                np.asarray(eoff))
    df, offsets = ct.induced_subgraph(_sg(graph), subgraph_vertices)
    w = (df["weight"].to_numpy(np.float32) if "weight" in df.columns
         else np.ones(len(df), np.float32))
    return (df["src"].to_numpy(), df["dst"].to_numpy(), w,
            np.asarray(offsets))


def force_atlas2(resource_handle, graph, max_iter=500, **kw):
    import cugraph_tpu as ct

    df = ct.force_atlas2(_sg(graph), max_iter=max_iter, **kw)
    df = df.sort_values("vertex")
    return df["vertex"].to_numpy(), df["x"].to_numpy(), df["y"].to_numpy()


def edge_id_lookup_table(resource_handle, graph):
    """pylibcugraph.EdgeIdLookupTable (edge_id_lookup_table.pyx:49).  MG
    graphs get the distributed id-hash-sharded container
    (lookup/lookup_src_dst_mg.cu analog, parallel/lookup.py)."""
    import cugraph_tpu as ct

    if isinstance(graph, MGGraph):
        from cugraph_tpu.parallel.lookup import MGEdgeIdLookupTable

        return MGEdgeIdLookupTable(graph)
    return ct.edge_id_lookup_table(_sg(graph))


def ego_graph(resource_handle, graph, source_vertices, radius,
              do_expensive_check=False):
    """pylibcugraph.ego_graph (egonet.pyx:50) — induced subgraphs within
    ``radius`` of each source.  Returns (srcs, dsts, weights, offsets)."""
    return egonet(resource_handle, graph, source_vertices, radius,
                  do_expensive_check)


def get_two_hop_neighbors(resource_handle, graph, start_vertices,
                          do_expensive_check=False):
    """pylibcugraph.get_two_hop_neighbors (two_hop_neighbors.pyx:45).
    Returns (first, second) sorted vertex-pair arrays two hops apart."""
    import cugraph_tpu as ct

    if isinstance(graph, MGGraph):
        from cugraph_tpu.parallel import mg_two_hop_neighbors

        return mg_two_hop_neighbors(graph.graph(), graph.mesh,
                                    start_vertices=start_vertices)
    df = ct.two_hop_neighbors(_sg(graph))
    if start_vertices is not None:
        sv = set(np.asarray(start_vertices).tolist())
        df = df[df["first"].isin(sv)]
    df = df.sort_values(["first", "second"])
    return df["first"].to_numpy(), df["second"].to_numpy()


class CuGraphRandomState:
    """pylibcugraph.CuGraphRandomState (random.pyx:53): a reusable RNG state
    for sampling entry points.  Here it wraps a stateless jax threefry key
    (advanced by fold_in per use — same role, deterministic)."""

    def __init__(self, resource_handle, seed=None):
        import jax

        self._seed0 = 0 if seed is None else int(seed)
        self._key = jax.random.key(self._seed0)
        self._uses = 0

    def next_key(self):
        import jax

        self._uses += 1
        return jax.random.fold_in(self._key, self._uses)

    def next_seed(self) -> int:
        """An int seed derived from (seed, use count) — what the plc
        wrappers feed the engines' stateless RNGs."""
        self._uses += 1
        return (self._seed0 * 1_000_003 + self._uses) % (2**31)
