"""N-partite / bipartite graph classes (reference structure/graph_classes.py
NPartiteGraph:877, BiPartiteGraph:1045): Graphs that track vertex
partitions.  The reference classes are thin Graph subclasses whose
algorithms treat them as plain graphs; parity here is the same."""

from __future__ import annotations

import numpy as np

from cugraph_tpu.api.graph import Graph


class NPartiteGraph(Graph):
    """Graph with named vertex partitions (reference add_nodes_from
    multipartite=... semantics)."""

    def __init__(self, bipartite: bool = False, directed: bool = False):
        super().__init__(directed=directed)
        self._bipartite = bool(bipartite)
        self._partitions: dict = {}

    def add_nodes_from(self, nodes, bipartite=None, multipartite=None):
        """Record a partition.  With ``bipartite`` the graph must be
        bipartite (reference raises otherwise); ``multipartite`` names an
        arbitrary partition."""
        nodes = np.asarray(list(nodes))
        if bipartite is not None:
            if not self._bipartite:
                raise TypeError("Graph is not bipartite; use multipartite=")
            key = 0 if bipartite in (0, "top") else 1
        elif multipartite is not None:
            key = multipartite
        else:
            raise TypeError("specify bipartite= or multipartite=")
        self._partitions[key] = nodes
        # partition members exist even when isolated — register them for
        # the next from_edgelist (Graph.add_nodes_from semantics)
        pend = getattr(self, "_pending_nodes", None)
        self._pending_nodes = (nodes if pend is None
                               else np.unique(np.concatenate([pend, nodes])))

    def sets(self):
        if not self._partitions:
            raise RuntimeError("partition sets not set; call add_nodes_from")
        return self._partitions

    def is_multipartite(self):
        return True

    def is_bipartite(self):
        return self._bipartite


class BiPartiteGraph(NPartiteGraph):
    def __init__(self, directed: bool = False):
        super().__init__(bipartite=True, directed=directed)

    def add_nodes_from(self, nodes, bipartite=None, multipartite=None):
        """Record one of the two partitions ('top'/'bottom' or 0/1)."""
        if multipartite is not None:
            raise TypeError("BiPartiteGraph takes bipartite=, not "
                            "multipartite=")
        if bipartite is None:
            bipartite = 0
        super().add_nodes_from(nodes, bipartite=bipartite)

    def sets(self):
        parts = super().sets()
        return parts.get(0), parts.get(1)

    def is_bipartite(self):
        return True
