"""cyclevae_tpu — a TPU-native framework for non-parallel voice conversion with a
Cyclic Variational Autoencoder (CycleVAE).

Re-designed from scratch for TPU (JAX / XLA / Pallas / pjit); capability surface of
patrickltobing/cyclevae-vc (reference layer map in SURVEY.md).

Sub-packages
------------
- ``utils``    : HDF5 feature store, wav I/O, typed configs, logging.
- ``dsp``      : host-side C++ DSP library (WORLD-class vocoder analysis/synthesis,
                 SPTK-class mel-cepstrum ops, DTW/MCD) + device-side JAX versions of
                 the frame-parallel transforms.
- ``models``   : pure-functional GRU-VAE (dilated-conv context embedding as a single
                 window matmul, AR GRU as ``lax.scan``), parameter init, sampling.
- ``ops``      : fused TPU kernels (XLA-level fused GRU-AR scan, Pallas kernels).
- ``vi``       : cyclic-ELBO amortized variational inference (training), TBPTT
                 segmented scan, checkpointing with PRNG keys.
- ``infer``    : HMC / NUTS over per-utterance latents, SMC over frame-sequence
                 latents, dual-averaging adaptation; chain/particle sharding.
- ``parallel`` : device-mesh creation, sharding rules, collective helpers.
- ``pipeline`` : stage drivers equivalent to the reference recipe (features, stats,
                 converted excitation, train, GV calibration, decode) + CLI.
"""

__version__ = "0.1.0"


def enable_compilation_cache(path: str = "/tmp/cyclevae_jax_cache"):
    """Persistent XLA compilation cache: new processes reuse compiled programs
    (the tunneled TPU attachment compiles remotely at ~30-90 s per program, so
    per-process recompiles dominate short runs). Called by the recipe CLI and
    bench entry points; safe to call multiple times.

    Also honors ``CYCLEVAE_PLATFORM`` (e.g. ``cpu``): some TPU plugins ignore
    the standard ``JAX_PLATFORMS`` env var, so a CLI run that must NOT touch
    the (possibly busy, single-tenant) TPU chip can pin the backend here —
    this runs before first backend use in every driver."""
    import os

    import jax

    platform = os.environ.get("CYCLEVAE_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # older jax without these flags: degrade gracefully
        pass
