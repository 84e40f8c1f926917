"""Host-spill execution of the one-hot SpMV for graphs exceeding HBM.

TPU-native analog of the reference's large_buffer_manager pinned-host spill
(cpp/include/cugraph/large_buffer_manager.hpp:28-60): when the edge-tile plan
is bigger than device memory, the tile arrays stay host-resident (NumPy) and
stream through the device one y-block chunk at a time.  The dense state
vector x (O(V)) stays on device whole; only the O(E) tile arrays spill —
the same split the reference makes (vertex frames in HBM, edge partitions
spillable).

Chunks are padded to ONE uniform (tiles, y-blocks) shape so a single XLA
compilation serves every chunk — the per-chunk cost is one H2D copy plus one
kernel launch, and jax's async dispatch overlaps the next chunk's H2D with
the current chunk's compute (the stream-overlap role of SURVEY.md §2.3).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from cugraph_tpu.kernels.spmv_onehot import (
    DEFAULT_YB_ROWS,
    SpmvPlan,
    build_spmv_plan,
    spmv_onehot,
)


@dataclass(frozen=True)
class SpilledSpmvPlan:
    """Host-resident plan split at y-block boundaries into uniform chunks."""

    chunks: tuple  # of SpmvPlan with NumPy arrays, yblk rebased per chunk
    num_vertices: int
    n_rows: int          # full padded x rows (pad_v = n_rows * 128)
    yb_rows: int
    blocks_per_chunk: int

    @property
    def pad_v(self) -> int:
        return self.n_rows * 128

    @property
    def num_chunks(self) -> int:
        return len(self.chunks)

    def chunk_bytes(self) -> int:
        c = self.chunks[0]
        return int(np.asarray(c.src_rel).nbytes + np.asarray(c.dst_full).nbytes
                   + np.asarray(c.weight).nbytes)


def build_spilled_spmv_plan(src, dst, weight, num_vertices: int,
                            yb_rows: int = DEFAULT_YB_ROWS,
                            max_chunk_bytes: int = 256 << 20,
                            tile_subs: int | None = None
                            ) -> SpilledSpmvPlan:
    """Build the full plan host-side, then split it into uniform chunks of
    whole y blocks such that each chunk's tile arrays fit ``max_chunk_bytes``.
    """
    full = build_spmv_plan(src, dst, weight, num_vertices, yb_rows=yb_rows,
                           device_arrays=False, tile_subs=tile_subs)
    yb = full.yb_rows
    tile_bytes = full.tile_subs * 128 * (4 + 4 + 4)  # per-tile array bytes
    yblk = np.asarray(full.yblk)

    # tiles per y block (tiles are sorted by yblk; every block has >= 1)
    tiles_per_blk = np.bincount(yblk, minlength=full.n_yblocks)
    blk_start_tile = np.concatenate([[0], np.cumsum(tiles_per_blk)])

    # pick blocks_per_chunk so the heaviest chunk fits the budget; at least 1
    budget_tiles = max(int(max_chunk_bytes // tile_bytes), 1)
    bpc = full.n_yblocks
    while bpc > 1:
        worst = max(
            int(blk_start_tile[min(b + bpc, full.n_yblocks)]
                - blk_start_tile[b])
            for b in range(0, full.n_yblocks, bpc))
        if worst <= budget_tiles:
            break
        bpc = (bpc + 1) // 2
    starts = list(range(0, full.n_yblocks, bpc))
    chunk_tiles = max(
        int(blk_start_tile[min(b + bpc, full.n_yblocks)] - blk_start_tile[b])
        for b in starts)

    chunks = []
    for b0 in starts:
        b1 = min(b0 + bpc, full.n_yblocks)
        t0, t1 = int(blk_start_tile[b0]), int(blk_start_tile[b1])
        nt = t1 - t0
        pad_t = chunk_tiles - nt
        TS = full.tile_subs
        sr = np.asarray(full.src_rel)[t0 * TS: t1 * TS]
        df = np.asarray(full.dst_full)[t0 * TS: t1 * TS]
        ww = np.asarray(full.weight)[t0 * TS: t1 * TS]
        xb = np.asarray(full.xwin_blk)[t0:t1]
        yk = yblk[t0:t1] - b0
        if pad_t:
            # all-NaN padding tiles pinned to the chunk's LAST y block keep
            # yblk sorted and are masked out inside the kernel
            sr = np.concatenate([sr, np.zeros((pad_t * TS, 128), np.int32)])
            df = np.concatenate([df, np.zeros((pad_t * TS, 128), np.int32)])
            ww = np.concatenate([ww, np.full((pad_t * TS, 128), np.nan,
                                             np.float32)])
            xb = np.concatenate([xb, np.zeros(pad_t, np.int32)])
            yk = np.concatenate([yk, np.full(pad_t, yk[-1], np.int32)])
        chunks.append(SpmvPlan(
            src_rel=sr, dst_full=df, weight=ww, xwin_blk=xb,
            yblk=yk.astype(np.int32),
            # num_vertices is unused by the kernel; keep it UNIFORM across
            # chunks — it is a static jit field, and a differing last chunk
            # would force a second 30-90 s compile
            num_vertices=bpc * yb * 128,
            n_rows=bpc * yb,       # uniform out rows -> one compilation
            yb_rows=yb,
            n_yblocks=bpc,
            num_tiles=chunk_tiles,
            src_win=full.src_win,
            dst_win=full.dst_win,
            tile_subs=full.tile_subs,
        ))
    return SpilledSpmvPlan(
        chunks=tuple(chunks),
        num_vertices=num_vertices,
        n_rows=full.n_rows,
        yb_rows=yb,
        blocks_per_chunk=bpc,
    )


def spmv_spilled(plan: SpilledSpmvPlan, x, *, interpret: bool = False,
                 precision: str = "highest", reduce: str = "sum",
                 combine: str = "mul") -> jax.Array:
    """Streamed semiring SpMV.  x: [pad_v] (device or host); returns
    y [pad_v] on device.  Same semantics as spmv_onehot."""
    x = jnp.asarray(x)
    parts = []
    for c in plan.chunks:
        dev = jax.tree_util.tree_map(jnp.asarray, c)  # H2D this chunk
        parts.append(spmv_onehot(dev, x, interpret=interpret,
                                 precision=precision, reduce=reduce,
                                 combine=combine))
        del dev
    return jnp.concatenate(parts)[: plan.pad_v]
