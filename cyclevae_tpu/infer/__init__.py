from .logjoint import make_utterance_logjoint
from .hmc import hmc_sample, HMCConfig
from .nuts import nuts_sample, NUTSConfig
from .smc import smc_filter, SMCConfig
from .dual_averaging import DualAveragingState, da_init, da_update, da_final

__all__ = [
    "make_utterance_logjoint",
    "hmc_sample", "HMCConfig",
    "nuts_sample", "NUTSConfig",
    "smc_filter", "SMCConfig",
    "DualAveragingState", "da_init", "da_update", "da_final",
]
