"""Algorithm modules (one per reference directory under cpp/src/)."""
from cugraph_tpu.algos import (
    centrality,
    community,
    components,
    cores,
    dag,
    layout,
    linear_assignment,
    link_analysis,
    link_prediction,
    sampling,
    structure,
    traversal,
    tree,
)
