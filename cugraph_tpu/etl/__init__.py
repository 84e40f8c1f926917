"""ETL: string-column renumbering for ingest pipelines.

Reference: cpp/libcugraph_etl/src/renumbering.cu (GPU hash-based renumbering
of cudf string columns, SURVEY.md N29).  On a TPU system ingest is host work;
the heavy lifting is a hash factorization — pandas' C factorize (or the
native C++ int64 renumberer after hashing) plays the cuDF-kernel role.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def renumber_strings(df: pd.DataFrame, src_col: str, dst_col: str):
    """Map two string key columns to dense int32 vertex ids.

    Returns (renumbered_df[src, dst int32], map_df['id', 'value']) — the
    libcugraph_etl renumbering contract: one shared id space over both
    columns, ids dense in [0, n_unique).
    """
    both = pd.concat([df[src_col], df[dst_col]], ignore_index=True)
    codes, uniques = pd.factorize(both, use_na_sentinel=False)
    m = len(df)
    out = pd.DataFrame({
        src_col: codes[:m].astype(np.int32),
        dst_col: codes[m:].astype(np.int32),
    })
    map_df = pd.DataFrame({
        "id": np.arange(len(uniques), dtype=np.int32),
        "value": np.asarray(uniques),
    })
    return out, map_df


def renumber_multi_columns(df: pd.DataFrame, src_cols: list, dst_cols: list):
    """Multi-column composite-key renumbering (NumberMap multi-column mode,
    python/cugraph/cugraph/structure/number_map.py:480)."""
    src_key = df[src_cols].astype(str).agg("\x1f".join, axis=1)
    dst_key = df[dst_cols].astype(str).agg("\x1f".join, axis=1)
    tmp = pd.DataFrame({"s": src_key, "d": dst_key})
    out, map_df = renumber_strings(tmp, "s", "d")
    parts = map_df["value"].str.split("\x1f", expand=True)
    parts.columns = [f"key_{i}" for i in range(parts.shape[1])]
    map_df = pd.concat([map_df[["id"]], parts], axis=1)
    return out.rename(columns={"s": "src", "d": "dst"}), map_df
