"""cugraph.experimental namespace analog (reference
python/cugraph/cugraph/experimental/__init__.py): staging ground for
pre-stable APIs — the reference branch exports `strong_connected_component`
(legacy SCC, experimental/components/scc.py) and `find_bicliques`
(experimental/structure/bicliques.py); convenience re-exports kept for
import compatibility."""

from cugraph_tpu.algos.structure import renumber_arbitrary_edgelist  # noqa
from cugraph_tpu.api.convenience import (  # noqa
    concurrent_bfs,
    multi_source_bfs,
)
from cugraph_tpu.experimental.bicliques import find_bicliques  # noqa


def strong_connected_component(G):
    """Reference experimental/components/scc.py — the legacy SCC entry;
    resolves to the stable SCC implementation here."""
    from cugraph_tpu.algos.components import strongly_connected_components

    return strongly_connected_components(G)
