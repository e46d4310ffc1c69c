"""Tests for the VQ helper + GMM surfaces (reference gru_vae.py:147-262)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from cyclevae_tpu.models.gmm import gmm_em_update, gmm_forward, gmm_log_prob, init_gmm
from cyclevae_tpu.models.vq import (
    nn_search,
    nn_search_batch,
    vq_straight_through,
    weighted_ctr,
)


def test_nn_search_matches_torch_reference():
    rng = np.random.RandomState(0)
    enc = rng.randn(11, 4).astype(np.float32)
    ctr = rng.randn(5, 4).astype(np.float32)
    # reference formula (gru_vae.py:147-159): argmin_k sum |e - c| (L1)
    e, c = torch.tensor(enc), torch.tensor(ctr)
    T, K = 11, 5
    dist = torch.sum((e.unsqueeze(1).repeat(1, K, 1)
                      - c.unsqueeze(0).repeat(T, 1, 1)).abs(), 2)
    ref = torch.argmin(dist, dim=-1).numpy()
    ours = np.asarray(nn_search(jnp.asarray(enc), jnp.asarray(ctr)))
    np.testing.assert_array_equal(ours, ref)
    batched = np.asarray(nn_search_batch(jnp.asarray(enc[None]),
                                         jnp.asarray(ctr)))[0]
    np.testing.assert_array_equal(batched, ref)


def test_weighted_ctr_matches_torch_reference():
    rng = np.random.RandomState(1)
    enc = rng.randn(7, 3).astype(np.float32)
    ctr = rng.randn(4, 3).astype(np.float32)
    e, c = torch.tensor(enc), torch.tensor(ctr)
    T, K, D = 7, 4, 3
    ct = c.unsqueeze(0).repeat(T, 1, 1)
    dist = torch.sum((e.unsqueeze(1).repeat(1, K, 1) - ct).abs(), 2)
    score = torch.exp(-dist)
    post = score / torch.sum(score, 1).unsqueeze(1).repeat(1, K)
    wc_ref = torch.sum(post.unsqueeze(2).repeat(1, 1, D) * ct, 1).numpy()
    wd_ref = torch.sum(dist * post, 1).mean().item()
    wc, wd = weighted_ctr(jnp.asarray(enc), jnp.asarray(ctr))
    np.testing.assert_allclose(np.asarray(wc), wc_ref, atol=1e-5)
    assert abs(float(wd) - wd_ref) < 1e-5


def test_vq_straight_through_gradient():
    ctr = jnp.asarray(np.eye(3, dtype=np.float32) * 2)

    def loss(e):
        q, _ = vq_straight_through(e, ctr)
        return jnp.sum(q ** 2)

    e = jnp.asarray(np.random.RandomState(2).randn(5, 3).astype(np.float32))
    g = jax.grad(loss)(e)
    # straight-through: grad flows as if q == e (identity)
    q, _ = vq_straight_through(e, ctr)
    np.testing.assert_allclose(np.asarray(g), np.asarray(2 * q), atol=1e-5)


def test_gmm_em_increases_likelihood_and_recovers_modes():
    rng = np.random.default_rng(3)
    data = np.concatenate([
        rng.normal([-3.0, 0.0], 0.5, size=(400, 2)),
        rng.normal([3.0, 1.0], 0.7, size=(600, 2)),
    ]).astype(np.float32)
    data_j = jnp.asarray(data)
    params = init_gmm(jax.random.PRNGKey(0), 2, 2, data_j)
    lls = []
    for _ in range(30):
        params, ll = gmm_em_update(params, data_j)
        lls.append(float(ll))
    assert lls[-1] >= lls[0]
    means = np.sort(np.asarray(params["means"]), axis=0)
    np.testing.assert_allclose(means[0], [-3.0, 0.0], atol=0.2)
    np.testing.assert_allclose(means[1], [3.0, 1.0], atol=0.2)
    w = np.sort(np.asarray(params["weights"]))
    np.testing.assert_allclose(w, [0.4, 0.6], atol=0.05)
    ll_mean, e_means = gmm_forward(params, data_j)
    assert e_means.shape == data.shape
    assert abs(float(gmm_log_prob(params, data_j)) - float(ll_mean)) < 1e-5
