"""Import-path parity subpackage: mirrors `cugraph.link_prediction`
(python/cugraph/cugraph/link_prediction/__init__.py) so call sites written
against the reference import layout keep working.  Implementations
live in cugraph_tpu.algos/* — this module only re-exports."""

from cugraph_tpu import (  # noqa: F401
    jaccard,
    jaccard_coefficient,
    all_pairs_jaccard,
    sorensen,
    sorensen_coefficient,
    all_pairs_sorensen,
    overlap,
    overlap_coefficient,
    all_pairs_overlap,
    cosine,
    cosine_coefficient,
    all_pairs_cosine,
)
