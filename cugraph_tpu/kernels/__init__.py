"""Pallas TPU kernels for the hot compute paths.

The reference's per-edge CUDA kernels (prims/detail/per_v_transform_reduce_e.cuh
degree-segmented gather/scatter) have no efficient TPU analog: XLA's gather and
scatter scalarize (~0.12 G elem/s measured on v5e).  These kernels re-express
sparse gather/scatter as one-hot matrix products on the MXU — the TPU-native
formulation — giving ~14× the XLA lowering on PageRank SpMV.
"""

from cugraph_tpu.kernels.spmv_onehot import (
    SpmvPlan,
    build_spmv_plan,
    spmv_onehot,
    spmv_available,
)
