from . import checkpoint, harness, losses
from .harness import (FusedAdagrad, FusedAdam, FusedSGD, Trainer,
                      TrainState, default_loss)
from .losses import (NegativeSampler, bce_with_logits, inbatch_softmax_loss,
                     sampled_softmax_loss)
