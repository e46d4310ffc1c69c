from .logjoint import make_utterance_logjoint, make_utterance_logjoint_batched
from .hmc import hmc_sample, hmc_sample_batch, hmc_sample_chains, hmc_sample_sharded, HMCConfig
from .nuts import nuts_sample, nuts_sample_chains, nuts_sample_sharded, NUTSConfig
from .nuts_batch import nuts_sample_batch
from .smc import smc_filter, smc_filter_sharded, make_decoder_ssm, SMCConfig
from .dual_averaging import DualAveragingState, da_init, da_update, da_final

__all__ = [
    "make_utterance_logjoint", "make_utterance_logjoint_batched",
    "hmc_sample", "hmc_sample_batch", "hmc_sample_chains",
    "hmc_sample_sharded", "HMCConfig",
    "nuts_sample", "nuts_sample_chains", "nuts_sample_sharded",
    "nuts_sample_batch", "NUTSConfig",
    "smc_filter", "smc_filter_sharded", "make_decoder_ssm", "SMCConfig",
    "DualAveragingState", "da_init", "da_update", "da_final",
]
