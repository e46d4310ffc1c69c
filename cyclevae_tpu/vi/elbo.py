"""Loss / metric algebra for the cyclic ELBO.

Mirrors the reference's TWFSEloss semantics (src/nets/gru_vae.py:466-534):
  * MCD in dB, L2 form: (10/ln10) * sqrt(2 * sum_D (x-y)^2) per frame,
  * MCD L1 form: (10/ln10) * sqrt(2) * sum_D |x-y| per frame (training uses
    L2=False, GV=False → L1 mean; train…py:1366-1368),
  * GV log-RMSE: mean_D sqrt((log var_T(x) - log var_T(y))^2).

All forms are masked so padded frames can be excluded under jit (the reference
slices ``[:flen]`` dynamically instead — train…py:1366-1371).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

# 10 / ln(10) (reference gru_vae.py:493)
_MCD_K = 10.0 / 2.3025850929940456840179914546844
_SQRT2 = 1.4142135623730950488016887242097


def mcd_constant() -> float:
    return _MCD_K


def masked_mean(x: jnp.ndarray, mask: Optional[jnp.ndarray], axis=-1) -> jnp.ndarray:
    if mask is None:
        return jnp.mean(x, axis=axis)
    denom = jnp.maximum(jnp.sum(mask, axis=axis), 1.0)
    return jnp.sum(x * mask, axis=axis) / denom


def mcd_l1(x: jnp.ndarray, y: jnp.ndarray,
           mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Per-utterance mean L1-MCD over frames. x, y: (..., T, D); mask (..., T)."""
    per_frame = _MCD_K * _SQRT2 * jnp.sum(jnp.abs(x - y), axis=-1)
    return masked_mean(per_frame, mask)


def mcd_l2(x: jnp.ndarray, y: jnp.ndarray,
           mask: Optional[jnp.ndarray] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean and per-frame L2-MCD in dB (evaluation metric form)."""
    per_frame = _MCD_K * jnp.sqrt(2.0 * jnp.sum((x - y) ** 2, axis=-1))
    return masked_mean(per_frame, mask), per_frame


def masked_var(x: jnp.ndarray, mask: Optional[jnp.ndarray],
               ddof: int = 0) -> jnp.ndarray:
    """Variance over the frame axis with masking; x: (..., T, D), mask (..., T).

    ddof=0 matches the reference eval epoch's np.var (train…py:722-727);
    ddof=1 matches torch.var's unbiased estimator used by the TWFSEloss GV
    mode (gru_vae.py:508)."""
    if mask is None:
        n = x.shape[-2]
        mean = jnp.mean(x, axis=-2, keepdims=True)
        return jnp.sum((x - mean) ** 2, axis=-2) / max(n - ddof, 1)
    m = mask[..., None]
    n = jnp.maximum(jnp.sum(m, axis=-2), 1.0)
    mean = jnp.sum(x * m, axis=-2, keepdims=True) / n[..., None, :]
    return jnp.sum(((x - mean) ** 2) * m, axis=-2) / jnp.maximum(n - ddof, 1.0)


def rmse_corr(x: jnp.ndarray, y: jnp.ndarray,
              mask: Optional[jnp.ndarray] = None,
              l2: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """TWFSEloss RMSE+corr mode (reference gru_vae.py:511-521).

    Per-dimension RMSE over the frame axis (L2) or mean absolute error (L1),
    plus the per-dimension Pearson correlation over frames; both are then
    averaged over dimensions.  x, y: (..., T, D); mask (..., T).
    Returns (mean_rmse, mean_corr) with the leading batch axes preserved.
    """
    m = None if mask is None else mask[..., None]
    if l2:
        per_dim = jnp.sqrt(masked_mean((x - y) ** 2, m, axis=-2))
    else:
        per_dim = masked_mean(jnp.abs(x - y), m, axis=-2)
    if m is None:
        x_mean = jnp.mean(x, axis=-2, keepdims=True)
        y_mean = jnp.mean(y, axis=-2, keepdims=True)
        xd, yd = x - x_mean, y - y_mean
    else:
        n = jnp.maximum(jnp.sum(m, axis=-2, keepdims=True), 1.0)
        xd = (x - jnp.sum(x * m, axis=-2, keepdims=True) / n) * m
        yd = (y - jnp.sum(y * m, axis=-2, keepdims=True) / n) * m
    num = jnp.sum(xd * yd, axis=-2)
    den = jnp.sqrt(jnp.sum(xd ** 2, axis=-2)) * jnp.sqrt(jnp.sum(yd ** 2, axis=-2))
    corr = num / jnp.maximum(den, 1e-12)
    return jnp.mean(per_dim, axis=-1), jnp.mean(corr, axis=-1)


def gv_log_rmse(x: jnp.ndarray, gv_mean: jnp.ndarray,
                mask: Optional[jnp.ndarray] = None,
                ddof: int = 0) -> jnp.ndarray:
    """RMSE of log per-utterance variance vs a data GV mean vector.

    Default ddof=0 is the reference eval-epoch numpy form (train…py:722-727);
    pass ddof=1 for the TWFSEloss GV mode's torch.var semantics
    (gru_vae.py:508)."""
    var_x = masked_var(x, mask, ddof=ddof)
    return jnp.mean(jnp.sqrt((jnp.log(var_x) - jnp.log(gv_mean)) ** 2), axis=-1)
