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
    """Host-resident plan split at y-block boundaries into uniform chunks.

    Chunks are MATERIALIZED ON DEMAND from the full plan's arrays: RMAT
    skew concentrates tiles in the hub y blocks, so padding every chunk to
    the heaviest chunk's tile count up front cost ~3× the plan's own
    footprint in host copies — at RMAT-25 (18.4 GiB plan) the eager padded
    chunks (59 GiB) OOM-killed the host (round-4 measurement).  Keeping
    (t0, t1, b0) index ranges + one transient padded buffer per streamed
    chunk bounds host memory at plan + O(1) chunks."""

    full: SpmvPlan       # host (NumPy) arrays, tiles sorted by y block
    ranges: tuple        # ((t0, t1, b0), ...) tile/block span per chunk
    chunk_tiles: int     # uniform padded tile count (one XLA compilation)
    num_vertices: int
    n_rows: int          # full padded x rows (pad_v = n_rows * 128)
    yb_rows: int
    blocks_per_chunk: int

    @property
    def pad_v(self) -> int:
        return self.n_rows * 128

    @property
    def num_chunks(self) -> int:
        return len(self.ranges)

    def chunk_bytes(self) -> int:
        return int(self.chunk_tiles * self.full.tile_subs * 128 * (4 + 4 + 4))

    def materialize_chunk(self, i: int) -> SpmvPlan:
        """Padded uniform-shape SpmvPlan for chunk ``i`` (fresh host
        arrays; all-NaN padding tiles pinned to the chunk's last y block
        keep yblk sorted and are masked out inside the kernel)."""
        t0, t1, b0 = self.ranges[i]
        full, TS = self.full, self.full.tile_subs
        nt = t1 - t0
        pad_t = self.chunk_tiles - nt
        sr = np.asarray(full.src_rel)[t0 * TS: t1 * TS]
        df = np.asarray(full.dst_full)[t0 * TS: t1 * TS]
        ww = np.asarray(full.weight)[t0 * TS: t1 * TS]
        xb = np.asarray(full.xwin_blk)[t0:t1]
        yk = np.asarray(full.yblk)[t0:t1] - b0
        if pad_t:
            sr = np.concatenate([sr, np.zeros((pad_t * TS, 128), np.int32)])
            df = np.concatenate([df, np.zeros((pad_t * TS, 128), np.int32)])
            ww = np.concatenate([ww, np.full((pad_t * TS, 128), np.nan,
                                             np.float32)])
            xb = np.concatenate([xb, np.zeros(pad_t, np.int32)])
            # nt == 0 (a pad-only range, possible when a y-block span holds
            # no tiles): no last real block to pin padding to — use block 0,
            # the NaN weights mask every lane anyway
            pin = yk[-1] if nt else np.int32(0)
            yk = np.concatenate([yk, np.full(pad_t, pin, np.int32)])
        bpc, yb = self.blocks_per_chunk, self.yb_rows
        return SpmvPlan(
            src_rel=sr, dst_full=df, weight=ww, xwin_blk=xb,
            yblk=yk.astype(np.int32),
            # num_vertices is unused by the kernel; keep it UNIFORM across
            # chunks — it is a static jit field, and a differing last chunk
            # would force a second 30-90 s compile
            num_vertices=bpc * yb * 128,
            n_rows=bpc * yb,       # uniform out rows -> one compilation
            yb_rows=yb,
            n_yblocks=bpc,
            num_tiles=self.chunk_tiles,
            src_win=full.src_win,
            dst_win=full.dst_win,
            tile_subs=TS,
        )

    @property
    def chunks(self):
        """Eagerly materialized chunk tuple — test/introspection
        convenience; the streaming path materializes one at a time."""
        return tuple(self.materialize_chunk(i)
                     for i in range(self.num_chunks))


def build_spilled_spmv_plan(src, dst, weight, num_vertices: int,
                            yb_rows: int = DEFAULT_YB_ROWS,
                            max_chunk_bytes: int = 256 << 20,
                            tile_subs: int | None = None,
                            full_plan: SpmvPlan | None = None
                            ) -> SpilledSpmvPlan:
    """Build the full plan host-side, then split it into uniform chunks of
    whole y blocks such that each chunk's tile arrays fit ``max_chunk_bytes``.
    ``full_plan`` supplies a prebuilt HOST-array plan (e.g. from the
    benchcache disk cache — ~16 min of tiling sorts at RMAT-25).
    """
    full = full_plan if full_plan is not None else build_spmv_plan(
        src, dst, weight, num_vertices, yb_rows=yb_rows,
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

    # SUB-SPLIT oversized block ranges: RMAT skew can put most tiles in the
    # hub y block, and padding every chunk to that block's tile count
    # multiplies the per-iteration H2D traffic ~4× (measured at RMAT-25).
    # Several uniform chunks may cover the SAME y-block range; their
    # partial outputs fold with the reduce combiner in spmv_spilled.
    ranges = []
    for b0 in starts:
        b1 = min(b0 + bpc, full.n_yblocks)
        t0, t1 = int(blk_start_tile[b0]), int(blk_start_tile[b1])
        nt = t1 - t0
        pieces = max(1, -(-nt // budget_tiles))
        step = -(-nt // pieces)
        for p in range(pieces):
            ranges.append((t0 + p * step, min(t0 + (p + 1) * step, t1),
                           int(b0)))
    chunk_tiles = max(t1 - t0 for t0, t1, _ in ranges)
    return SpilledSpmvPlan(
        full=full,
        ranges=tuple(ranges),
        chunk_tiles=chunk_tiles,
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
    fold = {"sum": lambda a, b: a + b,
            "min": jnp.minimum, "max": jnp.maximum}[reduce]
    by_block, order, pending = {}, [], []
    for i in range(plan.num_chunks):
        t0, t1, b0 = plan.ranges[i]
        if t1 == t0:
            # pad-only range (a y-block span with no tiles): its output is
            # identically the reduce identity — emit it directly instead of
            # materializing + streaming a full padded chunk (hundreds of
            # MiB of NaNs through the tunnel per iteration)
            from cugraph_tpu.kernels.spmv_onehot import SEMIRING_BIG

            rows = plan.blocks_per_chunk * plan.yb_rows * 128
            ident = {"sum": 0.0, "min": SEMIRING_BIG,
                     "max": -SEMIRING_BIG}[reduce]
            part = jnp.full((rows,), ident, jnp.float32)
            if b0 in by_block:
                by_block[b0] = fold(by_block[b0], part)
            else:
                by_block[b0] = part
                order.append(b0)
            continue
        c = plan.materialize_chunk(i)                 # fresh host arrays
        dev = jax.tree_util.tree_map(jnp.asarray, c)  # H2D this chunk
        part = spmv_onehot(dev, x, interpret=interpret,
                           precision=precision, reduce=reduce,
                           combine=combine)
        if b0 in by_block:
            # sub-chunks of one y-block range fold with the reduce
            # combiner (untouched rows hold the reduce identity)
            by_block[b0] = fold(by_block[b0], part)
        else:
            by_block[b0] = part
            order.append(b0)
        del c
        pending.append((dev, part))
        if len(pending) >= 2:
            # BACKPRESSURE + EAGER FREEING (three OOM lessons at
            # RMAT-25/26, CLAUDE.md): (1) async dispatch queues every
            # chunk's host copy, so a barrier is mandatory; (2) the
            # barrier must be a SCALAR D2H FETCH — in some tunnel states
            # block_until_ready returns without waiting (measured 129 GB
            # OOM); (3) the tunnel client keeps host mirrors of live
            # device buffers across ITERATIONS (second OOM after a clean
            # warm pass), so the chunk arrays are Array.delete()d
            # explicitly once their output is fetched.  Bounds in-flight
            # chunks at 2 while overlapping compute with the next
            # materialization.
            dprev, pprev = pending.pop(0)
            _ = float(pprev.ravel()[0])
            for leaf in jax.tree_util.tree_leaves(dprev):
                if hasattr(leaf, "delete"):
                    try:
                        leaf.delete()
                    except Exception:
                        pass
    for dprev, pprev in pending:
        _ = float(pprev.ravel()[0])
        for leaf in jax.tree_util.tree_leaves(dprev):
            if hasattr(leaf, "delete"):
                try:
                    leaf.delete()
                except Exception:
                    pass
    return jnp.concatenate([by_block[b] for b in order])[: plan.pad_v]
