"""Graph generators (reference cpp/src/generators/)."""
from cugraph_tpu.generators import rmat, simple
from cugraph_tpu.generators.rmat import generate_rmat_edgelist, generate_rmat_edgelists
