"""Generic pjit training loop, optimizers, objectives."""

from .loop import Trainer, TrainState, create_train_state, make_train_step
from .objectives import (
    clip_classification_loss,
    info_nce_loss,
    listnet_loss,
    masked_token_loss,
    seq2seq_title_loss,
)
from .optim import lr_multiplier, make_optimizer, no_decay_mask, set_lr_mult

__all__ = [
    "Trainer",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "clip_classification_loss",
    "info_nce_loss",
    "listnet_loss",
    "masked_token_loss",
    "seq2seq_title_loss",
    "lr_multiplier",
    "make_optimizer",
    "no_decay_mask",
    "set_lr_mult",
]
