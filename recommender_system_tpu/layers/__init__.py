from . import core, embedding, interaction, nlp, sequence
from .core import DNN, Dice, PReLU, PredictionLayer, activation_fn
from .embedding import EmbeddingCollection, EmbedOutputs, LinearEmbedding
from .interaction import (AFMAttention, CrossNet, FGCNN, FMLayer,
                          InnerProductLayer, MMoELayer, OuterProductLayer,
                          ResBlock, TowerLayer)
from .sequence import AUGRULayer, DinAttention, GRULayer
