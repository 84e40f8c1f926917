"""cugraph.internals analog: the dimensionality-reduction callback protocol.

Reference: python/cugraph/cugraph/internals/internals.pyx
`GraphBasedDimRedCallback` — a base class whose on_preprocess_end /
on_epoch_end / on_train_end hooks receive the current positions during
ForceAtlas2 training (the reference wires it through a C++ callback into
the CUDA FA2 loop; here `algos/layout.py force_atlas2(callback=...)` steps
the jitted kernel per epoch and calls the hooks with host arrays)."""

from __future__ import annotations


class GraphBasedDimRedCallback:
    """Subclass and override any of the hooks; each receives an
    [n_vertices, 2] float32 position array (host NumPy)."""

    def on_preprocess_end(self, positions):
        pass

    def on_epoch_end(self, positions):
        pass

    def on_train_end(self, positions):
        pass
