"""Device-side (JAX) versions of the frame-parallel DSP transforms.

The mel-cepstrum transforms are LINEAR up to the log/exp: ``freqt`` is a
linear recursion, and cepstrum <-> log-spectrum is a DFT pair.  So on TPU:

    sp2mc(ps) = log(ps) @ A        with A = (half+1, order+1)
    mc2sp(mc) = exp(mc @ B)        with B = (order+1, half+1)

The basis matrices are built ONCE by passing unit vectors through the C++
reference implementation (dsp/sptk.py), guaranteeing bit-consistency with the
host path; both transforms are then single MXU matmuls over (frames, bins) —
ideal for on-device GV postfilters, eval metrics, and differentiable spectral
losses (reference call sites: feature_extract_vc.py:354-355, decode…py:259).

Also: masked MCD / GV metrics (device-side analogues of dtw_c.calc_mcd and
the GV statistics) — everything here is jit/vmap/grad-compatible.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=8)
def _sp2mc_basis(order: int, alpha: float, fftl: int) -> np.ndarray:
    """(half+1, order+1) matrix A with sp2mc(ps) = log(ps) @ A."""
    from . import sptk
    half = fftl // 2
    eye = np.eye(half + 1)
    # sp2mc is linear in log(ps): probe with log(ps) = e_i  -> ps = exp(e_i)
    cols = sptk.sp2mc(np.exp(eye), order, alpha)   # (half+1, order+1)
    return cols.astype(np.float64)


@functools.lru_cache(maxsize=8)
def _mc2sp_basis(order: int, alpha: float, fftl: int) -> np.ndarray:
    """(order+1, half+1) matrix B with mc2sp(mc) = exp(mc @ B)."""
    from . import sptk
    eye = np.eye(order + 1)
    sp = sptk.mc2sp(eye, alpha, fftl)              # exp of linear map
    return np.log(sp).astype(np.float64)


def sp2mc(powerspec: jnp.ndarray, order: int, alpha: float) -> jnp.ndarray:
    """(..., half+1) power spectra -> (..., order+1) mel-cepstra (one matmul)."""
    fftl = (powerspec.shape[-1] - 1) * 2
    A = jnp.asarray(_sp2mc_basis(order, float(alpha), fftl),
                    dtype=powerspec.dtype)
    return jnp.log(jnp.maximum(powerspec, 1e-30)) @ A


def mc2sp(mc: jnp.ndarray, alpha: float, fftl: int) -> jnp.ndarray:
    """(..., order+1) mel-cepstra -> (..., fftl//2+1) power spectra."""
    B = jnp.asarray(_mc2sp_basis(mc.shape[-1] - 1, float(alpha), fftl),
                    dtype=mc.dtype)
    return jnp.exp(mc @ B)


# ---------------------------------------------------------------------------
# metrics (device-side analogues of dtw_c.calc_mcd / GV stats)
# ---------------------------------------------------------------------------

_MCD_K = 10.0 / 2.3025850929940456840179914546844


def calc_mcd(x: jnp.ndarray, y: jnp.ndarray,
             mask: Optional[jnp.ndarray] = None
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Frame-wise L2 MCD in dB over (..., T, D); returns (mean, per-frame)."""
    per = _MCD_K * jnp.sqrt(2.0 * jnp.sum((x - y) ** 2, axis=-1))
    if mask is None:
        return jnp.mean(per, axis=-1), per
    denom = jnp.maximum(jnp.sum(mask, axis=-1), 1.0)
    return jnp.sum(per * mask, axis=-1) / denom, per


def gv_postfilter(cvmcep: jnp.ndarray, gv_mean_data: jnp.ndarray,
                  cvgv_mean_model: jnp.ndarray) -> jnp.ndarray:
    """Device-side GV postfilter (decode…py:418-421): scale deviations of
    dims 1: by sqrt(gv_data/gv_model), keep c0."""
    datamean = jnp.mean(cvmcep[..., 1:], axis=-2, keepdims=True)
    scaled = (jnp.sqrt(gv_mean_data / cvgv_mean_model)
              * (cvmcep[..., 1:] - datamean) + datamean)
    return jnp.concatenate([cvmcep[..., :1], scaled], axis=-1)


def mod_pow_device(cvmcep: jnp.ndarray, mcep: jnp.ndarray, alpha: float,
                   fftl: int = 1024) -> jnp.ndarray:
    """Device-side power correction: match frame energy via Parseval on the
    reconstructed power spectrum (host mod_pow uses the truncated impulse
    response — this spectral form is its fftl-limit)."""
    e_cv = jnp.mean(mc2sp(cvmcep, alpha, fftl), axis=-1)
    e_ref = jnp.mean(mc2sp(mcep, alpha, fftl), axis=-1)
    dpow = 0.5 * jnp.log(e_ref / jnp.maximum(e_cv, 1e-30))
    return cvmcep.at[..., 0].add(dpow)
