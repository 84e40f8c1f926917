"""Tracing / profiling utilities.

Reference posture (SURVEY.md §5): a labeled-region host timer
(utilities/high_res_timer.hpp:25-40) used by timed Louvain/Leiden builds,
plus external nsight.  TPU translation: the same labeled wall-clock timer,
jax.profiler trace capture, and named scopes that show up in the XLA trace
viewer (jax.profiler.TraceAnnotation / named_scope).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class HighResTimer:
    """Labeled-region accumulator timer (utilities/high_res_timer.hpp analog).

    >>> t = HighResTimer()
    >>> with t.range("spmv"):
    ...     work()
    >>> t.display()
    """

    def __init__(self):
        self._totals = defaultdict(float)
        self._counts = defaultdict(int)
        self._starts = {}

    def start(self, label: str):
        self._starts[label] = time.perf_counter()

    def stop(self, label: str, *, block_on=None):
        if block_on is not None:  # wait for device work before stamping
            import jax

            jax.block_until_ready(block_on)
        dt = time.perf_counter() - self._starts.pop(label)
        self._totals[label] += dt
        self._counts[label] += 1
        return dt

    @contextlib.contextmanager
    def range(self, label: str, *, annotate: bool = True):
        """Timed region; also emitted as a named trace annotation so it is
        visible in jax.profiler traces."""
        cm = trace_annotation(label) if annotate else contextlib.nullcontext()
        with cm:
            self.start(label)
            try:
                yield self
            finally:
                self.stop(label)

    def totals(self) -> dict:
        return {k: (self._totals[k], self._counts[k]) for k in self._totals}

    def display(self, file=None) -> str:
        lines = [f"{k}: {tot * 1e3:.2f} ms over {cnt} call(s)"
                 for k, (tot, cnt) in sorted(self.totals().items())]
        out = "\n".join(lines)
        print(out, file=file)
        return out

    def reset(self):
        self._totals.clear()
        self._counts.clear()
        self._starts.clear()


def trace_annotation(label: str):
    """Named scope visible in the profiler trace viewer (NVTX-range analog)."""
    import jax

    try:
        return jax.profiler.TraceAnnotation(label)
    except Exception:  # pragma: no cover - older jax
        return contextlib.nullcontext()


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a device trace for the enclosed region (nsight-run analog):

    >>> with profile_trace('/tmp/trace'):
    ...     cugraph_tpu.pagerank(G)
    """
    import jax

    with jax.profiler.trace(log_dir):
        yield


def device_sync(*arrays):
    """Block until device work producing `arrays` is complete (the
    cudaStreamSynchronize analog for fair timing)."""
    import jax

    for a in arrays:
        jax.block_until_ready(a)
