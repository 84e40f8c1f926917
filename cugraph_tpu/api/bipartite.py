"""BiPartiteGraph (reference structure/graph_classes.py BiPartiteGraph):
a Graph that tracks the two vertex partitions.  The reference class is a
thin Graph subclass whose algorithms treat it as a plain graph; parity here
is the same."""

from __future__ import annotations

import numpy as np

from cugraph_tpu.api.graph import Graph


class BiPartiteGraph(Graph):
    def __init__(self, directed: bool = False):
        super().__init__(directed=directed)
        self._set0 = None
        self._set1 = None

    def add_nodes_from(self, nodes, bipartite=None):
        """Record a partition ('top'/'bottom' or 0/1) — reference
        add_nodes_from(bipartite=...) semantics."""
        nodes = np.asarray(list(nodes))
        if bipartite in (0, "top", None):
            self._set0 = nodes
        else:
            self._set1 = nodes

    def sets(self):
        if self._set0 is None and self._set1 is None:
            raise RuntimeError("bipartite sets not set; call add_nodes_from")
        return self._set0, self._set1

    def is_bipartite(self):
        return True
