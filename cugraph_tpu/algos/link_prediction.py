"""Link prediction: Jaccard / Sorensen / Overlap / Cosine similarity
(+ weighted variants, + all-pairs forms with top-k).

Reference: cpp/src/link_prediction/{jaccard,sorensen,overlap,cosine}_impl.cuh
over the shared detail/similarity_impl.cuh; Python wrappers
python/cugraph/cugraph/link_prediction/.

TPU design: neighbor intersections via the sorted-row binary-search prim
(prims/intersection.py) instead of the reference's gathered-list merges.
Default pair list (vertex_pair=None) = the graph's edges, i.e. all one-hop
pairs — same as the reference.  all_pairs_* enumerates two-hop candidate
pairs host-side and scores them on device.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pandas as pd

from cugraph_tpu.prims.intersection import pair_intersection_auto


def _default_pairs(G):
    src, dst, _ = G.edgelist_arrays()
    if not G.is_directed():
        keep = src < dst
        return src[keep], dst[keep]
    return src, dst


def _resolve_pairs(G, vertex_pair):
    if vertex_pair is None:
        return _default_pairs(G)
    first = G.lookup_internal_vertex_id(vertex_pair["first"].to_numpy())
    second = G.lookup_internal_vertex_id(vertex_pair["second"].to_numpy())
    return first, second


def _similarity(G, vertex_pair, kind: str, use_weight: bool):
    g = G.structure
    us, vs = _resolve_pairs(G, vertex_pair)
    if len(us) == 0:
        return pd.DataFrame({"first": [], "second": [], f"{kind}_coeff": []})
    if use_weight and not G.is_weighted():
        raise ValueError("use_weight=True requires a weighted graph")
    n = g.num_vertices
    max_deg = int(np.asarray(g.out_degrees())[:n].max()) if n else 1
    stats = pair_intersection_auto(g, jnp.asarray(us), jnp.asarray(vs),
                                   max_deg=max(int(max_deg), 1),
                                   weighted=use_weight)
    if use_weight:
        inter = np.asarray(stats["sum_min"], dtype=np.float64)
        su = np.asarray(stats["wsum_u"], dtype=np.float64)
        sv = np.asarray(stats["wsum_v"], dtype=np.float64)
        union = su + sv - inter
        mins = np.minimum(su, sv)
        denom_cos = np.sqrt(su * sv)
    else:
        inter = np.asarray(stats["count"], dtype=np.float64)
        du = np.asarray(stats["deg_u"], dtype=np.float64)
        dv = np.asarray(stats["deg_v"], dtype=np.float64)
        union = du + dv - inter
        su, sv = du, dv
        mins = np.minimum(du, dv)
        denom_cos = np.sqrt(du * dv)

    with np.errstate(divide="ignore", invalid="ignore"):
        if kind == "jaccard":
            coeff = np.where(union > 0, inter / union, 0.0)
        elif kind == "sorensen":
            coeff = np.where(su + sv > 0, 2.0 * inter / (su + sv), 0.0)
        elif kind == "overlap":
            coeff = np.where(mins > 0, inter / mins, 0.0)
        elif kind == "cosine":
            coeff = np.where(denom_cos > 0, inter / denom_cos, 0.0)
        else:
            raise ValueError(kind)

    return pd.DataFrame({
        "first": G.number_map.to_external(us),
        "second": G.number_map.to_external(vs),
        f"{kind}_coeff": coeff,
    })


def jaccard(G, vertex_pair=None, use_weight: bool = False):
    """Jaccard similarity |N(u)∩N(v)| / |N(u)∪N(v)| (reference
    jaccard_impl.cuh); returns ['first','second','jaccard_coeff']."""
    return _similarity(G, vertex_pair, "jaccard", use_weight)


def sorensen(G, vertex_pair=None, use_weight: bool = False):
    return _similarity(G, vertex_pair, "sorensen", use_weight)


def overlap(G, vertex_pair=None, use_weight: bool = False):
    return _similarity(G, vertex_pair, "overlap", use_weight)


def cosine(G, vertex_pair=None, use_weight: bool = False):
    return _similarity(G, vertex_pair, "cosine", use_weight)


def jaccard_coefficient(G, ebunch=None):
    """NetworkX-flavored alias (reference keeps it for compat)."""
    vp = None
    if ebunch is not None:
        vp = pd.DataFrame({"first": [u for u, _ in ebunch],
                           "second": [v for _, v in ebunch]})
    return jaccard(G, vp)


def _two_hop_candidates(G, ids=None):
    """All two-hop pairs (restricted to one endpoint ∈ ids when given) WITH
    their common-neighbor counts: the SpGEMM A·Aᵀ that enumerates the
    candidates already computes |N(u)∩N(v)| as its values, so the
    unweighted all-pairs path never re-queries intersections (the reference
    chunks all-pairs the same way inside similarity_impl.cuh).
    Returns (us, vs, counts)."""
    import scipy.sparse as sp

    src, dst, _ = G.edgelist_arrays()
    n = G.number_of_vertices()
    # dedupe directed edge instances so counts stay set-semantics exact
    ekey = np.unique(src.astype(np.int64) * n + dst.astype(np.int64))
    A = sp.csr_matrix((np.ones(len(ekey)), (ekey // n, ekey % n)),
                      shape=(n, n))
    B = A if ids is None else A[ids]
    P = (B @ A.T).tocoo()  # values = common out-neighbor counts
    row = P.row if ids is None else ids[P.row.astype(np.int64)]
    col, cnt = P.col.astype(np.int64), P.data
    if not G.is_directed():
        lo = np.minimum(row, col)
        hi = np.maximum(row, col)
        mask = lo != hi
        key, idx = np.unique(lo[mask] * n + hi[mask], return_index=True)
        return ((key // n).astype(np.int32), (key % n).astype(np.int32),
                cnt[mask][idx].astype(np.int64))
    mask = row != col
    return (row[mask].astype(np.int32), col[mask].astype(np.int32),
            cnt[mask].astype(np.int64))


def _two_hop_pairs(G):
    us, vs, _ = _two_hop_candidates(G)
    return us, vs


def _all_pairs(G, kind: str, use_weight: bool, vertices, topk):
    ids = None
    if vertices is not None:
        ids = np.unique(G.lookup_internal_vertex_id(np.asarray(vertices)))
    us, vs, cnt = _two_hop_candidates(G, ids)
    col = f"{kind}_coeff"
    if use_weight:
        vp = pd.DataFrame({"first": G.number_map.to_external(us),
                           "second": G.number_map.to_external(vs)})
        df = _similarity(G, vp, kind, use_weight)
    else:
        offs = np.asarray(G.structure.csr.offsets)
        deg = (offs[1:] - offs[:-1]).astype(np.float64)
        inter = cnt.astype(np.float64)
        du, dv = deg[us], deg[vs]
        with np.errstate(divide="ignore", invalid="ignore"):
            if kind == "jaccard":
                coeff = np.where(du + dv - inter > 0,
                                 inter / (du + dv - inter), 0.0)
            elif kind == "sorensen":
                coeff = np.where(du + dv > 0, 2.0 * inter / (du + dv), 0.0)
            elif kind == "overlap":
                mins = np.minimum(du, dv)
                coeff = np.where(mins > 0, inter / mins, 0.0)
            elif kind == "cosine":
                denom = np.sqrt(du * dv)
                coeff = np.where(denom > 0, inter / denom, 0.0)
            else:
                raise ValueError(kind)
        df = pd.DataFrame({"first": G.number_map.to_external(us),
                           "second": G.number_map.to_external(vs),
                           col: coeff})
    df = df.sort_values(col, ascending=False).reset_index(drop=True)
    if topk is not None:
        df = df.head(int(topk)).reset_index(drop=True)
    return df


def all_pairs_jaccard(G, vertices=None, use_weight=False, topk=None):
    return _all_pairs(G, "jaccard", use_weight, vertices, topk)


def all_pairs_sorensen(G, vertices=None, use_weight=False, topk=None):
    return _all_pairs(G, "sorensen", use_weight, vertices, topk)


def all_pairs_overlap(G, vertices=None, use_weight=False, topk=None):
    return _all_pairs(G, "overlap", use_weight, vertices, topk)


def all_pairs_cosine(G, vertices=None, use_weight=False, topk=None):
    return _all_pairs(G, "cosine", use_weight, vertices, topk)
