from .elbo import mcd_l1, mcd_l2, mcd_constant, gv_log_rmse, masked_mean
from .train import (
    CycleVAEParams,
    TrainState,
    init_cyclevae,
    make_train_step,
    cyclic_forward,
)

__all__ = [
    "mcd_l1",
    "mcd_l2",
    "mcd_constant",
    "gv_log_rmse",
    "masked_mean",
    "CycleVAEParams",
    "TrainState",
    "init_cyclevae",
    "make_train_step",
    "cyclic_forward",
]
