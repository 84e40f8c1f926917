"""pylibcugraph.internal_types parity (python/pylibcugraph/pylibcugraph/
internal_types/: sampling_result.pyx, coo.pyx, edge_id_lookup_result.pyx)."""

from cugraph_tpu.plc.internal_types.sampling_result import SamplingResult
from cugraph_tpu.plc.internal_types.coo import COO
from cugraph_tpu.plc.internal_types.edge_id_lookup_result import (
    EdgeIdLookupResult,
)

__all__ = ["SamplingResult", "COO", "EdgeIdLookupResult"]
