"""Diagonal-covariance GMM: log-likelihood, posterior-expected means, EM.

Reference: src/nets/gru_vae.py:200-262 (GMM nn.Module) — the speaker-space
modeling surface (not called by shipped binaries).  Functional JAX version:
params = {"weights" (K,), "means" (K, D), "dcovs" (K, D)}; all ops jit-able,
EM is a pure params -> params update.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def init_gmm(key, n_mix: int, n_dim: int, data: jnp.ndarray = None) -> Dict:
    if data is not None:
        idx = jax.random.choice(key, data.shape[0], (n_mix,), replace=False)
        means = data[idx]
        var = jnp.var(data, axis=0)
    else:
        means = jax.random.normal(key, (n_mix, n_dim))
        var = jnp.ones((n_dim,))
    return {
        "weights": jnp.full((n_mix,), 1.0 / n_mix),
        "means": means,
        "dcovs": jnp.broadcast_to(var, (n_mix, n_dim)),
    }


def _log_component_probs(params: Dict, data: jnp.ndarray) -> jnp.ndarray:
    """(T, D) -> (T, K) log [w_k N(x | mu_k, diag(cov_k))]."""
    D = data.shape[-1]
    diff = data[:, None, :] - params["means"][None, :, :]
    mahal = jnp.sum(diff ** 2 / params["dcovs"][None, :, :], axis=-1)
    log_det = jnp.sum(jnp.log(params["dcovs"]), axis=-1)
    log_norm = -0.5 * (D * jnp.log(2.0 * jnp.pi) + log_det)
    return jnp.log(params["weights"])[None, :] + log_norm[None, :] - 0.5 * mahal


def gmm_forward(params: Dict, data: jnp.ndarray
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean log-likelihood + posterior-expected means (reference forward
    gru_vae.py:211-227), computed in log space for stability."""
    log_probs = _log_component_probs(params, data)
    log_like = jax.nn.logsumexp(log_probs, axis=-1)
    post = jnp.exp(log_probs - log_like[:, None])
    e_means = post @ params["means"]
    return jnp.mean(log_like), e_means


def gmm_log_prob(params: Dict, data: jnp.ndarray) -> jnp.ndarray:
    """Mean log-likelihood (reference ``probs`` gru_vae.py:229-239)."""
    log_probs = _log_component_probs(params, data)
    return jnp.mean(jax.nn.logsumexp(log_probs, axis=-1))


def gmm_em_update(params: Dict, data: jnp.ndarray,
                  min_var: float = 1e-6) -> Tuple[Dict, jnp.ndarray]:
    """One EM step (reference ``update`` gru_vae.py:241-262).
    Returns (new params, mean log-likelihood before the update)."""
    log_probs = _log_component_probs(params, data)
    log_like = jax.nn.logsumexp(log_probs, axis=-1)
    post = jnp.exp(log_probs - log_like[:, None])        # (T, K)
    nk = jnp.sum(post, axis=0)                           # (K,)
    weights = nk / data.shape[0]
    means = (post.T @ data) / nk[:, None]
    diff2 = (data[:, None, :] - means[None, :, :]) ** 2
    dcovs = jnp.maximum(
        jnp.einsum("tk,tkd->kd", post, diff2) / nk[:, None], min_var)
    return ({"weights": weights, "means": means, "dcovs": dcovs},
            jnp.mean(log_like))
