"""VQ-CycleVAE smoke trainer (reference ``cyclevqvae`` variant, run.sh:183;
latent helpers gru_vae.py:147-197 — the training binary lives in the
successor repo, so the trainer completes the declared capability surface)."""

import numpy as np
import pytest

import jax.numpy as jnp

from cyclevae_tpu.models.vq import (codebook_perplexity,
                                    nn_search_batch,
                                    vq_straight_through_batch)
from cyclevae_tpu.utils.config import (ExperimentConfig, ModelConfig,
                                       TrainConfig)
from cyclevae_tpu.utils.hdf5 import write_hdf5


def test_vq_straight_through_batch_matches_assignment():
    rng = np.random.default_rng(0)
    enc = jnp.asarray(rng.normal(size=(2, 7, 4)).astype(np.float32))
    ctr = jnp.asarray(rng.normal(size=(5, 4)).astype(np.float32))
    st, hard, ids = vq_straight_through_batch(enc, ctr)
    assert np.array_equal(np.asarray(ids), np.asarray(nn_search_batch(enc, ctr)))
    np.testing.assert_allclose(np.asarray(hard), np.asarray(ctr)[np.asarray(ids)])
    # straight-through forward equals the hard assignment
    np.testing.assert_allclose(np.asarray(st), np.asarray(hard), rtol=1e-6)


def test_codebook_perplexity_bounds():
    ids = jnp.zeros((2, 10), jnp.int32)
    assert float(codebook_perplexity(ids, 8)) == pytest.approx(1.0)
    ids = jnp.tile(jnp.arange(8), (2, 10))[:, :80].reshape(2, 80) % 8
    assert float(codebook_perplexity(ids, 8)) == pytest.approx(8.0, rel=1e-5)
    # mask removes the skew: only the first 8 frames (uniform) count
    ids = jnp.concatenate([jnp.arange(8), jnp.zeros(8, jnp.int32)])[None]
    mask = jnp.concatenate([jnp.ones(8), jnp.zeros(8)])[None]
    assert float(codebook_perplexity(ids, 8, mask)) == pytest.approx(8.0,
                                                                     rel=1e-5)


@pytest.fixture(scope="module")
def vq_corpus(tmp_path_factory):
    """Tiny paired one-to-one corpus (same h5 contract as stage 1-3)."""
    root = tmp_path_factory.mktemp("vq")
    rng = np.random.default_rng(1)
    files = {}
    for k, spk in enumerate(("SPK_S", "SPK_T")):
        files[spk] = []
        for i in range(4):
            f = str(root / spk / f"u{i}.h5")
            T = 90 + 20 * i
            t = np.arange(T)[:, None]
            feats = (np.sin(t * 0.07 + np.arange(54)[None]) + 1.2 * k
                     + 0.1 * rng.normal(size=(T, 54)))
            write_hdf5(f, "/feat_org_lf0", feats)
            write_hdf5(f, "/cvuvlogf0fil_ap", feats[:, :4] + 0.1)
            write_hdf5(f, "/spcidx_range", np.arange(5, T - 5)[None])
            files[spk].append(f)
    stats = str(root / "stats_jnt.h5")
    write_hdf5(stats, "/mean_feat_org_lf0_jnt", np.full(54, 0.6))
    write_hdf5(stats, "/scale_feat_org_lf0_jnt", np.full(54, 1.1))
    return {"files": files, "stats": stats}


def test_vq_cyclevae_soft_assignment_train(vq_corpus, tmp_path):
    """The soft (weighted_ctr) assignment path is fully differentiable and
    also trains: loss and recon MCD decrease."""
    from cyclevae_tpu.pipeline.train_stage_vq import run_train_vq
    exp = ExperimentConfig(
        model=ModelConfig(hidden_units=16, lat_dim=6, do_prob=0.0),
        train=TrainConfig(batch_size=40, batch_size_utt=4, epoch_count=3,
                          lr=5e-3))
    res = run_train_vq(exp, vq_corpus["files"]["SPK_S"],
                       vq_corpus["files"]["SPK_T"], "SPK_S",
                       vq_corpus["stats"], str(tmp_path / "exp_vq_soft"),
                       n_centroids=16, assignment="soft")
    h = res["history"]
    assert h[-1]["train"]["loss"] < h[0]["train"]["loss"]
    assert h[-1]["train"]["mcd_rec"] < h[0]["train"]["mcd_rec"]


def test_vq_cyclevae_smoke_train(vq_corpus, tmp_path):
    """The cyclic VQ objective decreases and the codebook stays alive
    (perplexity well above collapse)."""
    from cyclevae_tpu.pipeline.train_stage_vq import run_train_vq
    exp = ExperimentConfig(
        model=ModelConfig(hidden_units=16, lat_dim=6, do_prob=0.0),
        train=TrainConfig(batch_size=40, batch_size_utt=4, epoch_count=4,
                          lr=5e-3))
    res = run_train_vq(exp, vq_corpus["files"]["SPK_S"],
                       vq_corpus["files"]["SPK_T"], "SPK_S",
                       vq_corpus["stats"], str(tmp_path / "exp_vq"),
                       n_centroids=16)
    h = res["history"]
    assert h[-1]["train"]["loss"] < h[0]["train"]["loss"]
    assert h[-1]["train"]["mcd_rec"] < h[0]["train"]["mcd_rec"]
    assert h[-1]["train"]["perplexity"] > 2.0
    # frozen scalers really are frozen
    p = res["params"]
    np.testing.assert_allclose(
        np.asarray(p["encoder"]["scale_in"]["mean"]), np.full(54, 0.6))
