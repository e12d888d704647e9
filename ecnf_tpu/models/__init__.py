from ecnf_tpu.models.mlp import MLP, StableMLP, ConcatDense, NonLinearLayerWithResidualAndLayerNorm
from ecnf_tpu.models.egnn import EGCL, EGNN
from ecnf_tpu.models.vector_net import VectorNet
