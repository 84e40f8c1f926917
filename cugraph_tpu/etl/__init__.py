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
    python/cugraph/cugraph/structure/number_map.py:480).  Keys compare by
    VALUE with original dtypes (a string-join encoding would split
    numerically equal keys of different dtypes and collide on separator
    bytes inside values); the map frame returns typed key columns."""
    import numpy as np

    src_idx = pd.MultiIndex.from_frame(
        df[src_cols].set_axis(range(len(src_cols)), axis=1))
    dst_idx = pd.MultiIndex.from_frame(
        df[dst_cols].set_axis(range(len(dst_cols)), axis=1))
    codes, uniques = pd.factorize(src_idx.append(dst_idx))
    e = len(df)
    out = pd.DataFrame({"src": codes[:e].astype(np.int32),
                        "dst": codes[e:].astype(np.int32)})
    map_df = uniques.to_frame(index=False)
    map_df.columns = [f"key_{i}" for i in range(map_df.shape[1])]
    map_df.insert(0, "id", np.arange(len(uniques), dtype=np.int32))
    return out, map_df
