from .losses import LossConfig, SamplerConfig, compute_losses
from .loop import (TrainConfig, TrainState, init_state, train_step,
                   val_step, make_optimizer, pd_structure_prob)

__all__ = ["LossConfig", "SamplerConfig", "compute_losses", "TrainConfig",
           "TrainState", "init_state", "train_step", "val_step",
           "make_optimizer", "pd_structure_prob"]
