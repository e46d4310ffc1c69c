"""VQ-CycleVAE smoke trainer — completes the ``cyclevqvae`` capability
surface into a runnable training loop.

The reference names the variant (run.sh:183 ``mdl_name=cyclevqvae``) and
ships its latent helpers (nn_search / nn_search_batch / weighted_ctr,
src/nets/gru_vae.py:147-197), but the training binary lives in the successor
repo.  This driver completes it: the Gaussian reparameterized posterior of
vi/train is replaced by a K-centroid vector quantizer over the encoder
output (straight-through estimator through the reference's L1 assignment),
trained with the standard VQ-VAE objective in the same cyclic flow:

  lat      = encoder(feats)                -> z_q = VQ(lat)
  recon    = decoder(src_code ++ z_q)
  conv     = decoder(trg_code ++ z_q)
  lat_cv   = encoder(cv_excit ++ conv)     -> z_q_cv = VQ(lat_cv)
  cyc      = decoder(src_code ++ z_q_cv)

  loss = L1-MCD(recon, mcep) + L1-MCD(cyc, mcep)
       + ||sg(lat) - q||^2 + beta * ||lat - sg(q)||^2   (both encodes)

Smoke level by design (whole-utterance forward, no TBPTT segmentation), the
same scope as the classifier-code trainer (train_stage_cls.py).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, List, Sequence

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..models.gru_vae import GRURNNConfig, gru_rnn_apply, init_gru_rnn
from ..models.vq import (codebook_perplexity, nn_search_batch,
                         vq_straight_through_batch, weighted_ctr)
from ..utils.config import ExperimentConfig
from ..utils.hdf5 import read_hdf5
from ..vi.elbo import mcd_l1
from .dataset import SingleVAEDataset, bucket_len, padding


def make_vq_cfgs(exp: ExperimentConfig):
    m = exp.model
    enc = GRURNNConfig(
        in_dim=m.in_dim, out_dim=m.lat_dim, hidden_units=m.hidden_units,
        hidden_layers=m.hidden_layers, kernel_size=m.kernel_size,
        dilation_size=m.dilation_size, do_prob=m.do_prob,
        scale_in=True, scale_out=False)
    dec = GRURNNConfig(
        in_dim=m.lat_dim + m.n_spk, out_dim=m.out_dim,
        hidden_units=m.hidden_units, hidden_layers=m.hidden_layers,
        kernel_size=m.kernel_size, dilation_size=m.dilation_size,
        do_prob=m.do_prob, scale_in=False, scale_out=True)
    return enc, dec


def make_vq_step(enc_cfg: GRURNNConfig, dec_cfg: GRURNNConfig,
                 optimizer, stdim: int, n_centroids: int,
                 beta: float = 0.25, assignment: str = "st"):
    """Jitted VQ-CycleVAE step over whole (padded, masked) utterances.

    ``assignment``: "st" = hard nearest-centroid with the straight-through
    estimator; "soft" = the reference's exp(-L1) posterior-weighted centroids
    (weighted_ctr, gru_vae.py:178-193) — fully differentiable, the weighted
    distance is the codebook-fit penalty."""
    lat_dim = enc_cfg.out_dim

    def loss_fn(params, rng, batch):
        feats, mask = batch["feats"], batch["mask"]        # (B,T,54), (B,T)
        B = feats.shape[0]
        mcep = feats[..., stdim:]
        denom = jnp.maximum(jnp.sum(mask), 1.0)   # for the VQ frame means
        k1, k2 = jax.random.split(rng)

        def masked_mcd(x, y):
            return jnp.mean(mcd_l1(x, y, mask))

        def vq_terms_st(lat):
            st, hard, ids = vq_straight_through_batch(lat, params["centroids"])
            sq = jnp.sum((jax.lax.stop_gradient(lat) - hard) ** 2, -1)
            cm = jnp.sum((lat - jax.lax.stop_gradient(hard)) ** 2, -1)
            vq_loss = jnp.sum((sq + beta * cm) * mask) / denom
            return st, ids, vq_loss

        def vq_terms_soft(lat):
            # weighted_ctr means over ALL frames (incl. padding) — exercises
            # the reference helper verbatim; smoke-level trainer tolerance
            wc, wd = jax.vmap(weighted_ctr, in_axes=(0, None))(
                lat, params["centroids"])           # (B,T,D), (B,)
            ids = nn_search_batch(lat, params["centroids"])  # logged only
            return wc, ids, beta * jnp.mean(wd)

        vq_terms = vq_terms_soft if assignment == "soft" else vq_terms_st

        lat, _, _ = gru_rnn_apply(params["encoder"], enc_cfg, feats,
                                  jnp.zeros((B, lat_dim)), rng=k1,
                                  do=enc_cfg.do_prob > 0)
        z_q, ids, vq1 = vq_terms(lat)
        recon, _, _ = gru_rnn_apply(
            params["decoder"], dec_cfg,
            jnp.concatenate([batch["src_code"], z_q], -1),
            jnp.zeros((B, dec_cfg.out_dim)))
        conv, _, _ = gru_rnn_apply(
            params["decoder"], dec_cfg,
            jnp.concatenate([batch["trg_code"], z_q], -1),
            jnp.zeros((B, dec_cfg.out_dim)))
        lat_cv, _, _ = gru_rnn_apply(
            params["encoder"], enc_cfg,
            jnp.concatenate([batch["cv_excit"], conv], -1),
            jnp.zeros((B, lat_dim)), rng=k2, do=enc_cfg.do_prob > 0)
        z_q_cv, _, vq2 = vq_terms(lat_cv)
        cyc, _, _ = gru_rnn_apply(
            params["decoder"], dec_cfg,
            jnp.concatenate([batch["src_code"], z_q_cv], -1),
            jnp.zeros((B, dec_cfg.out_dim)))

        mcd_rec = masked_mcd(recon, mcep)
        mcd_cyc = masked_mcd(cyc, mcep)
        loss = mcd_rec + mcd_cyc + vq1 + vq2
        metrics = {
            "loss": loss, "mcd_rec": mcd_rec, "mcd_cyc": mcd_cyc,
            "vq": vq1 + vq2,
            "perplexity": codebook_perplexity(ids, n_centroids, mask),
        }
        return loss, metrics

    def step(params, opt_state, rng, batch):
        rng, k = jax.random.split(rng)
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, k, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, rng, metrics

    return jax.jit(step)


def _collate_vq(utts, seg_len: int) -> Dict:
    T = bucket_len(max(u.flen for u in utts), seg_len, 1)

    def pad_stack(get):
        return np.stack([padding(get(u), T).astype(np.float32) for u in utts])

    return {
        "feats": pad_stack(lambda u: u.feats),
        "src_code": pad_stack(lambda u: u.src_code),
        "trg_code": pad_stack(lambda u: u.trg_code),
        "cv_excit": pad_stack(lambda u: u.cv_excit),
        "mask": np.stack([(np.arange(T) < u.flen).astype(np.float32)
                          for u in utts]),
    }


def run_train_vq(exp: ExperimentConfig, src_files: Sequence[str],
                 trg_files: Sequence[str], spk_src: str, stats_jnt: str,
                 expdir: str, n_centroids: int = 64,
                 beta: float = 0.25, assignment: str = "st") -> Dict:
    """Train the VQ-CycleVAE; returns history incl. codebook perplexity."""
    os.makedirs(expdir, exist_ok=True)
    enc_cfg, dec_cfg = make_vq_cfgs(exp)
    m, tcfg = exp.model, exp.train

    mean_jnt = jnp.asarray(read_hdf5(stats_jnt, "/mean_feat_org_lf0_jnt"),
                           jnp.float32)
    scale_jnt = jnp.asarray(read_hdf5(stats_jnt, "/scale_feat_org_lf0_jnt"),
                            jnp.float32)
    key = jax.random.PRNGKey(tcfg.seed)
    k_enc, k_dec, k_ctr = jax.random.split(key, 3)
    params = {
        "encoder": init_gru_rnn(k_enc, enc_cfg),
        "decoder": init_gru_rnn(k_dec, dec_cfg),
        # centroids start inside the encoder's operating range (~unit scale)
        "centroids": 0.5 * jax.random.normal(k_ctr,
                                             (n_centroids, m.lat_dim)),
    }
    params["encoder"]["scale_in"] = {"mean": mean_jnt, "scale": scale_jnt}
    params["decoder"]["scale_out"] = {"mean": mean_jnt[m.stdim:],
                                      "scale": scale_jnt[m.stdim:]}

    # frozen scalers, as the gauss trainer (vi/train.make_optimizer)
    def label_fn(p):
        def net_labels(net):
            return {k: jax.tree_util.tree_map(
                lambda _: "frozen" if k in ("scale_in", "scale_out")
                else "train", v) for k, v in net.items()}
        return {"encoder": net_labels(p["encoder"]),
                "decoder": net_labels(p["decoder"]),
                "centroids": "train"}

    opt = optax.multi_transform(
        {"train": optax.adam(tcfg.lr), "frozen": optax.set_to_zero()},
        label_fn)
    opt_state = opt.init(params)
    rng = jax.random.PRNGKey(tcfg.seed + 1)
    np_rng = np.random.default_rng(tcfg.seed)

    ds = SingleVAEDataset(list(src_files) + list(trg_files),
                          list(trg_files) + list(src_files), spk_src,
                          n_spk=m.n_spk)
    step = make_vq_step(enc_cfg, dec_cfg, opt, m.stdim, n_centroids,
                        beta, assignment)

    history: List[Dict] = []
    bsu = tcfg.batch_size_utt
    for epoch in range(tcfg.epoch_count):
        t0 = time.time()
        order = np_rng.permutation(len(ds))
        ms = []
        for s in range(0, len(order), bsu):
            idxs = order[s:s + bsu]
            if len(idxs) < bsu:
                idxs = np.concatenate([idxs, order[:bsu - len(idxs)]])
            utts = [ds[int(i)] for i in idxs]
            jb = {k: jnp.asarray(v)
                  for k, v in _collate_vq(utts, tcfg.batch_size).items()}
            params, opt_state, rng, m_ = step(params, opt_state, rng, jb)
            ms.append({k: float(v) for k, v in m_.items()})
        train_m = {k: float(np.mean([x[k] for x in ms])) for k in ms[0]}
        history.append({"epoch": epoch + 1, "train": train_m,
                        "sec": time.time() - t0})
        logging.info("vq epoch %d: %s (%.1fs)", epoch + 1,
                     {k: round(v, 3) for k, v in train_m.items()},
                     history[-1]["sec"])

    with open(os.path.join(expdir, "history_vq.json"), "w") as f:
        json.dump({"history": history}, f, indent=2)
    return {"history": history, "params": params,
            "enc_cfg": enc_cfg, "dec_cfg": dec_cfg}


def main(argv=None):
    """CLI: train the VQ-CycleVAE variant on a prepared workspace
    (stages 1-3 must have run; same split semantics as the recipe)."""
    import argparse

    from .. import enable_compilation_cache
    from ..utils.config import ExperimentConfig, load_config
    from .recipe import RecipePaths

    p = argparse.ArgumentParser(prog="cyclevae_tpu.train_stage_vq")
    p.add_argument("--work", required=True)
    p.add_argument("--config", default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--n-train", type=int, default=40)
    p.add_argument("--n-centroids", type=int, default=64)
    p.add_argument("--beta", type=float, default=0.25)
    p.add_argument("--assignment", choices=("st", "soft"), default="st")
    p.add_argument("--wav-root",
                   default="/root/reference/egs/one-to-one/wav")
    args = p.parse_args(argv)

    enable_compilation_cache()
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
        datefmt="%m/%d/%Y %I:%M:%S")
    exp = load_config(args.config) if args.config else ExperimentConfig()
    if args.epochs is not None:
        exp.train.epoch_count = args.epochs
    paths = RecipePaths(wav_root=args.wav_root, work=args.work,
                        n_train=args.n_train)
    # parallel-sentence head halves of both speakers (recipe train_lists)
    src = paths.h5s(exp.model.spk_src)[:paths.n_train]
    trg = paths.h5s(exp.model.spk_trg)[:paths.n_train]
    n = min(len(src), len(trg))
    expdir = os.path.join(paths.work, "exp", exp.name() + "_vq")
    res = run_train_vq(exp, src[:n], trg[:n], exp.model.spk_src,
                       paths.stats_jnt(), expdir,
                       n_centroids=args.n_centroids, beta=args.beta,
                       assignment=args.assignment)
    logging.info("vq training done: %s", res["history"][-1])


if __name__ == "__main__":
    main()
