"""Edge-list file readers: CSV and MatrixMarket.

Reference ingestion surface: datasets/karate.csv (space-separated
src dst wgt), .mtx via tests/utilities/matrix_market_file_utilities and
cudf.read_csv in the dataset loader (python/cugraph/cugraph/datasets/
dataset.py:165 get_edgelist)."""

from __future__ import annotations

import gzip

import numpy as np
import pandas as pd


def read_csv_edgelist(path: str, *, delimiter=None, names=("src", "dst", "wgt"),
                      header=None, comment="#", dtype=None) -> pd.DataFrame:
    """Read a whitespace/CSV edge list into ['src', 'dst'(, 'wgt')]."""
    df = pd.read_csv(path, sep=delimiter if delimiter is not None else r"\s+",
                     header=header, comment=comment, engine="python")
    cols = list(names)[: df.shape[1]]
    # extra columns beyond the given names keep positional names (col_3, ...)
    cols += [f"col_{i}" for i in range(len(cols), df.shape[1])]
    df.columns = cols
    if dtype:
        df = df.astype(dtype)
    return df


def read_mtx(path: str) -> pd.DataFrame:
    """Read a MatrixMarket coordinate file into ['src', 'dst'(, 'wgt')].

    Supports general/symmetric banners, optional gzip, pattern (unweighted)
    and real/integer values; 1-based indices become 0-based (the reference's
    mm_to_coo behavior)."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        banner = f.readline().strip().lower()
        if not banner.startswith("%%matrixmarket"):
            raise ValueError("not a MatrixMarket file")
        symmetric = "symmetric" in banner
        pattern = "pattern" in banner
        line = f.readline()
        while line.startswith("%"):
            line = f.readline()
        rows, cols, nnz = map(int, line.split()[:3])
        data = np.loadtxt(f, ndmin=2)
    if data.size == 0:
        data = data.reshape(0, 3 if not pattern else 2)
    src = data[:, 0].astype(np.int64) - 1
    dst = data[:, 1].astype(np.int64) - 1
    w = None if (pattern or data.shape[1] < 3) else data[:, 2].astype(np.float32)
    if symmetric:
        keep = src != dst
        src2 = np.concatenate([src, dst[keep]])
        dst2 = np.concatenate([dst, src[keep]])
        if w is not None:
            w = np.concatenate([w, w[keep]])
        src, dst = src2, dst2
    out = {"src": src, "dst": dst}
    if w is not None:
        out["wgt"] = w
    return pd.DataFrame(out)


def write_csv_edgelist(G, path: str, *, delimiter=" ") -> None:
    """Round-trip companion: dump a Graph's edge list (external ids)."""
    import cugraph_tpu as ct

    df = ct.decompress_to_edgelist(G)
    df.to_csv(path, sep=delimiter, header=False, index=False)
