"""Host-side edge list transforms used at graph-construction time.

Capability match for the reference's structure transforms
(cpp/src/structure/{symmetrize_graph_impl.cuh,remove_multi_edges_impl.cuh,
remove_self_loops_impl.cuh}; Python symmetrize at
python/cugraph/cugraph/structure/symmetrize.py).
"""

from __future__ import annotations

import numpy as np


def remove_self_loops(src, dst, weight=None):
    keep = src != dst
    if weight is None:
        return src[keep], dst[keep], None
    return src[keep], dst[keep], weight[keep]


def remove_multi_edges(src, dst, weight=None, *, keep="first"):
    """Drop duplicate (src, dst) pairs.

    ``keep='first'`` keeps the first occurrence (reference
    remove_multi_edges_impl.cuh keeps an arbitrary one); ``keep='sum'`` sums
    weights, ``keep='min'``/``'max'`` reduce weights.
    """
    n_ids = int(max(src.max(initial=-1), dst.max(initial=-1))) + 1 \
        if len(src) else 0
    # counting sort pays only for DENSE id spaces: O(max_id) bucket arrays
    # on sparse huge raw ids (renumber=False) would dwarf O(m log m)
    if (n_ids and np.issubdtype(src.dtype, np.integer)
            and n_ids < (1 << 31) and n_ids <= 4 * len(src) + 1024
            and src.min(initial=0) >= 0 and dst.min(initial=0) >= 0):
        from cugraph_tpu.core.native import dedupe_edges_native

        mode = {"first": 0, "sum": 1, "min": 2, "max": 3}.get(keep)
        if mode is not None and (mode == 0 or weight is not None):
            nat = dedupe_edges_native(src, dst, weight, n_ids,
                                      0 if weight is None else mode)
            if nat is not None:
                idx, w_out = nat
                if mode == 0 or weight is None:
                    idx.sort()  # original-order output, same as np.unique
                    return (src[idx], dst[idx],
                            None if weight is None else weight[idx])
                return src[idx], dst[idx], w_out.astype(weight.dtype)

    # (src<<32)|uint32(dst) would alias once ids reach 2^32 (this fallback
    # serves exactly the sparse huge-raw-id case the native guard rejects):
    # build a collision-free key via factorized endpoints instead
    if len(src) and (src.max(initial=0) >= (1 << 31)
                     or dst.max(initial=0) >= (1 << 31)
                     or src.min(initial=0) < 0 or dst.min(initial=0) < 0):
        uniq_ids, inv = np.unique(np.concatenate([src, dst]),
                                  return_inverse=True)
        e = len(src)
        key = inv[:e].astype(np.int64) * len(uniq_ids) + inv[e:]
    else:
        key = ((src.astype(np.int64) << 32)
               | dst.astype(np.uint32).astype(np.int64))
    if keep == "first" or weight is None:
        _, idx = np.unique(key, return_index=True)
        idx.sort()
        if weight is None:
            return src[idx], dst[idx], None
        return src[idx], dst[idx], weight[idx]
    order = np.argsort(key, kind="stable")
    key_s, w_s = key[order], weight[order]
    uniq_key, start = np.unique(key_s, return_index=True)
    seg = np.repeat(np.arange(uniq_key.shape[0]), np.diff(np.append(start, key_s.shape[0])))
    if keep == "sum":
        w_out = np.bincount(seg, weights=w_s)
    elif keep == "min":
        w_out = np.full(uniq_key.shape[0], np.inf)
        np.minimum.at(w_out, seg, w_s)
    elif keep == "max":
        w_out = np.full(uniq_key.shape[0], -np.inf)
        np.maximum.at(w_out, seg, w_s)
    else:
        raise ValueError(f"unknown keep={keep!r}")
    first = order[start]
    return src[first], dst[first], w_out.astype(weight.dtype)


def symmetrize_edgelist(src, dst, weight=None):
    """Union of the edge list with its reverse, duplicates removed.

    Matches the reference's symmetrize-on-construction for undirected graphs
    (python/cugraph/cugraph/structure/graph_classes.py from_cudf_edgelist with
    symmetrize=True; C++ cpp/src/structure/symmetrize_graph_impl.cuh).
    Duplicate weights coalesce with MIN, matching symmetrize_df's
    ``groupby(...).min()`` (structure/symmetrize.py:75).
    """
    s2 = np.concatenate([src, dst])
    d2 = np.concatenate([dst, src])
    w2 = None if weight is None else np.concatenate([weight, weight])
    return remove_multi_edges(s2, d2, w2, keep="first" if weight is None else "min")
