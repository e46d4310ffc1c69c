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


def vq_straight_through_batch(
        encoding: jnp.ndarray, centroids: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(B, T, D) straight-through quantization using the reference's L1
    nearest-centroid assignment (nn_search_batch).  Returns
    (st_quantized (B,T,D), hard_quantized (B,T,D), ids (B,T)) — the hard
    values feed the codebook/commitment losses, the straight-through values
    feed the decoder."""
    ids = nn_search_batch(encoding, centroids)
    quantized = centroids[ids]
    st = encoding + jax.lax.stop_gradient(quantized - encoding)
    return st, quantized, ids


def codebook_perplexity(ids: jnp.ndarray, n_centroids: int,
                        mask: jnp.ndarray = None) -> jnp.ndarray:
    """exp(entropy) of the (optionally masked) codebook-usage histogram —
    K means uniform usage, 1 means codebook collapse."""
    onehot = jax.nn.one_hot(ids, n_centroids)
    if mask is not None:
        onehot = onehot * mask[..., None]
        denom = jnp.maximum(jnp.sum(mask), 1.0)
    else:
        denom = ids.size
    p = jnp.sum(onehot, axis=tuple(range(onehot.ndim - 1))) / denom
    return jnp.exp(-jnp.sum(jnp.where(p > 0, p * jnp.log(p), 0.0)))
