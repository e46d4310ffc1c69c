"""VQ-VAE helper surface: nearest-centroid search and soft assignment.

Reference: src/nets/gru_vae.py:147-197 (nn_search, nn_search_batch,
weighted_ctr) — the L1-distance centroid helpers for the ``cyclevqvae``
variant (run.sh:183; its training binary lives in the successor repo, so this
is capability surface, not a shipped pipeline).  JAX versions are batched and
jit/vmap-friendly; distances use the same L1 metric as the reference.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def nn_search(encoding: jnp.ndarray, centroids: jnp.ndarray) -> jnp.ndarray:
    """(T, D) x (K, D) -> (T,) argmin_k sum_d |e_td - c_kd|."""
    dist = jnp.sum(jnp.abs(encoding[:, None, :] - centroids[None, :, :]),
                   axis=-1)
    return jnp.argmin(dist, axis=-1)


def nn_search_batch(encoding: jnp.ndarray, centroids: jnp.ndarray) -> jnp.ndarray:
    """(B, T, D) x (K, D) -> (B, T)."""
    dist = jnp.sum(jnp.abs(encoding[..., None, :] - centroids[None, None, :, :]),
                   axis=-1)
    return jnp.argmin(dist, axis=-1)


def weighted_ctr(encoding: jnp.ndarray, centroids: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Soft assignment: exp(-L1) posterior-weighted centroids + mean weighted
    distance (reference gru_vae.py:178-193)."""
    dist = jnp.sum(jnp.abs(encoding[:, None, :] - centroids[None, :, :]),
                   axis=-1)                                   # (T, K)
    score = jnp.exp(-dist)
    post = score / jnp.sum(score, axis=1, keepdims=True)      # (T, K)
    weighted_centroids = post @ centroids                     # (T, D)
    weighted_dist = jnp.mean(jnp.sum(dist * post, axis=1))
    return weighted_centroids, weighted_dist


def vq_straight_through(encoding: jnp.ndarray, centroids: jnp.ndarray
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Straight-through quantization: forward = nearest centroid, backward =
    identity (the standard VQ-VAE estimator; extends the reference surface to
    a trainable path)."""
    ids = nn_search(encoding, centroids)
    quantized = centroids[ids]
    st = encoding + jax.lax.stop_gradient(quantized - encoding)
    return st, ids
