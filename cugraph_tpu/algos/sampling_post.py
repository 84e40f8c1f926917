"""Sampling post-processing: per-batch renumber + compress to CSR/CSC.

Reference: cpp/src/sampling/sampling_post_processing_impl.cuh ("renumber
sampled edge list and compress to (D)CSR/CSC", sampling_functions.hpp) and
python/cugraph/cugraph/sampling/sampling_utilities.py — the step that turns
raw sampled COO frames into the per-batch tensors GNN dataloaders consume.

TPU framing: outputs are dense NumPy arrays ready to be padded/stacked into
static-shaped device batches (the cugraph-pyg/DGL role is played by
cugraph_tpu.nn, which consumes exactly these)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def renumber_sampled_edgelist(df: pd.DataFrame, batch_col: str = "batch_id"):
    """Per-batch dense renumbering of a sampled edge frame.

    Vertices are numbered in first-appearance order walking hops in order —
    sources of hop 0 first (the seeds), then destinations of hop 0, then
    hop 1, … matching the reference's renumbering so layer-wise GNN code can
    slice seed rows as [0, num_seeds) (sampling_post_processing_impl.cuh).

    Returns (renumbered_df, maps) where maps[batch] is the int array whose
    i-th entry is the original vertex id of renumbered id i.
    """
    out_src = np.empty(len(df), np.int64)
    out_dst = np.empty(len(df), np.int64)
    maps = {}
    pos = np.arange(len(df))
    for b, grp in df.groupby(batch_col, sort=True):
        rows = grp.index.to_numpy()
        # first-appearance order walking hops: ALL sources of hop h before
        # any destination of hop h (vectorized via a (hop, src/dst) sort key)
        hops = grp["hop_id"].to_numpy()
        allv = np.concatenate([grp["sources"].to_numpy(),
                               grp["destinations"].to_numpy()])
        keys = np.concatenate([hops * 2, hops * 2 + 1])
        stream = allv[np.argsort(keys, kind="stable")]
        uniq, first = np.unique(stream, return_index=True)
        appearance = np.argsort(first, kind="stable")
        vmap = uniq[appearance]                       # id → original vertex
        lut = {int(v): i for i, v in enumerate(vmap)}
        maps[b] = vmap
        sel = pos[df.index.get_indexer(rows)] if not df.index.equals(
            pd.RangeIndex(len(df))) else rows
        out_src[sel] = [lut[int(v)] for v in df["sources"].to_numpy()[sel]]
        out_dst[sel] = [lut[int(v)] for v in df["destinations"].to_numpy()[sel]]
    out = df.copy()
    out["sources"] = out_src
    out["destinations"] = out_dst
    return out, maps


def compress_per_hop_csr(renumbered: pd.DataFrame, maps: dict,
                         batch_col: str = "batch_id"):
    """Compress a renumbered sampled frame to per-(batch, hop) CSR arrays.

    Returns {batch: {"map": ids, "hops": [{"offsets", "indices", "weight"}]}}
    — offsets over the batch's renumbered source space, the (D)CSR shape the
    reference emits for GNN consumption.
    """
    out = {}
    for b, grp in renumbered.groupby(batch_col, sort=True):
        n_local = len(maps[b])
        hops = []
        for hop in sorted(grp["hop_id"].unique()):
            h = grp[grp["hop_id"] == hop]
            s = h["sources"].to_numpy()
            d = h["destinations"].to_numpy()
            w = h["weight"].to_numpy() if "weight" in h else np.ones(len(h))
            order = np.lexsort((d, s))
            s, d, w = s[order], d[order], w[order]
            offsets = np.zeros(n_local + 1, np.int64)
            np.add.at(offsets, s + 1, 1)
            np.cumsum(offsets, out=offsets)
            hops.append({"offsets": offsets, "indices": d, "weight": w})
        out[b] = {"map": maps[b], "hops": hops}
    return out


def sampling_results_to_batches(df: pd.DataFrame):
    """One-call convenience: raw sampled frame → per-batch compressed CSR."""
    renum, maps = renumber_sampled_edgelist(df)
    return compress_per_hop_csr(renum, maps)
