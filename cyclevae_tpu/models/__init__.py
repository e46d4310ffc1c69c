from .gru_vae import (
    GRURNNConfig,
    init_gru_rnn,
    gru_rnn_apply,
    sampling_vae_batch,
    sampling_vae_laplace_batch,
    loss_vae,
    loss_vae_laplace,
    LOG_VAR_MIN,
    LOG_SCALE_MIN,
)
from .layers import (
    init_dilconv,
    dilconv_effective,
    dilconv_apply,
    init_gru_stack,
    init_dense,
)

__all__ = [
    "GRURNNConfig",
    "init_gru_rnn",
    "gru_rnn_apply",
    "sampling_vae_batch",
    "sampling_vae_laplace_batch",
    "loss_vae",
    "loss_vae_laplace",
    "LOG_VAR_MIN",
    "LOG_SCALE_MIN",
    "init_dilconv",
    "dilconv_effective",
    "dilconv_apply",
    "init_gru_stack",
    "init_dense",
]
