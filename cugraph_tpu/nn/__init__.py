"""GNN layer + model family (pure-functional JAX, MXU-friendly).

The reference delegates GNNs to the external cugraph-gnn repo and only ships
the sampling feed path (readme_pages/gnn_support.md); here the layers live
in-framework so the BASELINE GraphSAGE config runs end-to-end on TPU.
"""

from cugraph_tpu.nn.layers import (
    aggregate_neighbors,
    sage_init,
    sage_conv,
    gcn_init,
    gcn_conv,
    gat_init,
    gat_conv,
    gatv2_init,
    gatv2_conv,
    gin_init,
    gin_conv,
    appnp_propagate,
)
from cugraph_tpu.nn.models import (
    graphsage_init,
    graphsage_apply,
    gcn_init as gcn_model_init,
    gcn_apply,
    gat_init as gat_model_init,
    gat_apply,
    gatv2_model_init,
    gatv2_apply,
    gin_model_init,
    gin_apply,
    appnp_init,
    appnp_apply,
    masked_cross_entropy,
    make_train_step,
    accuracy,
)
from cugraph_tpu.nn.linkpred import (
    dot_decoder,
    mlp_decoder_init,
    mlp_decoder,
    distmult_decoder_init,
    distmult_decoder,
    link_prediction_loss,
    roc_auc,
    hits_at_k,
    make_linkpred_train_step,
    sample_negatives,
)
