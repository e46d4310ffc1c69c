"""Speaker-classifier training driver over the Cls dataset variants.

The reference defines classifier-code datasets (FeatureDatasetMult*VAECls,
src/utils/dataset.py:290-492) whose training binary lives in its successor
repo; the class codes supervise a per-frame speaker classifier with the
GRU_RNN softmax output head (reference gru_vae.py:446-447).  This driver
completes the capability at smoke level: a GRU_RNN classifier (softmax head,
masked cross-entropy on the per-frame class codes) trained on
MultSpkTrainClsDataset, evaluated by frame accuracy on the deterministic
MultSpkEvalClsDataset pairing.
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
from ..utils.config import ExperimentConfig
from ..utils.hdf5 import read_hdf5
from .dataset import bucket_len, padding
from .dataset_mult import MultSpkEvalClsDataset, MultSpkTrainClsDataset


def make_classifier_step(cfg: GRURNNConfig, optimizer):
    """Jitted step: masked per-frame cross-entropy through the softmax head.

    batch: feats (B, T, in_dim), cls (B, T) int32, mask (B, T).
    """

    def loss_fn(params, rng, batch):
        logits_softmax, _, _ = gru_rnn_apply(
            params, cfg, batch["feats"],
            jnp.zeros((batch["feats"].shape[0], cfg.out_dim)),
            rng=rng, do=cfg.do_prob > 0, softmax=True)
        logp = jnp.log(jnp.maximum(logits_softmax, 1e-12))
        nll = -jnp.take_along_axis(logp, batch["cls"][..., None],
                                   axis=-1)[..., 0]          # (B, T)
        mask = batch["mask"]
        denom = jnp.maximum(jnp.sum(mask), 1.0)
        loss = jnp.sum(nll * mask) / denom
        pred = jnp.argmax(logits_softmax, axis=-1)
        acc = jnp.sum((pred == batch["cls"]) * mask) / denom
        return loss, acc

    def step(params, opt_state, rng, batch):
        rng, k = jax.random.split(rng)
        (loss, acc), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, k, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, rng, {"loss": loss, "acc": acc}

    return jax.jit(step)


def _collate_cls(utts, seg_len: int) -> Dict:
    T = bucket_len(max(u.flen for u in utts), seg_len, 1)
    feats = np.stack([padding(u.feats, T).astype(np.float32) for u in utts])
    cls = np.stack([padding(u.src_class_code, T).astype(np.int32)
                    for u in utts])
    mask = np.stack([(np.arange(T) < u.flen).astype(np.float32)
                     for u in utts])
    return {"feats": feats, "cls": cls, "mask": mask}


def run_train_cls(exp: ExperimentConfig, feat_files: Sequence[str],
                  eval_files_src_list: Sequence[Sequence[str]],
                  eval_files_trg_list: Sequence[Sequence[str]],
                  spk_src_list: Sequence[str], spk_trg_list: Sequence[str],
                  stats_jnt: str, expdir: str) -> Dict:
    """Train the per-frame speaker classifier; returns history incl. accuracy."""
    os.makedirs(expdir, exist_ok=True)
    n_spk = len(spk_src_list) + len(spk_trg_list)
    m = exp.model
    cfg = GRURNNConfig(
        in_dim=m.in_dim, out_dim=n_spk, hidden_units=m.hidden_units,
        hidden_layers=m.hidden_layers, kernel_size=m.kernel_size,
        dilation_size=m.dilation_size, do_prob=m.do_prob,
        scale_in=True, scale_out=False)
    tcfg = exp.train

    mean_jnt = read_hdf5(stats_jnt, "/mean_feat_org_lf0_jnt")
    scale_jnt = read_hdf5(stats_jnt, "/scale_feat_org_lf0_jnt")
    params = init_gru_rnn(jax.random.PRNGKey(tcfg.seed), cfg)
    params["scale_in"] = {"mean": jnp.asarray(mean_jnt, jnp.float32),
                          "scale": jnp.asarray(scale_jnt, jnp.float32)}
    opt = optax.adam(tcfg.lr)
    opt_state = opt.init(params)
    rng = jax.random.PRNGKey(tcfg.seed + 1)
    np_rng = np.random.default_rng(tcfg.seed)

    train_ds = MultSpkTrainClsDataset(feat_files, spk_src_list, spk_trg_list,
                                      n_cyc=1, seed=tcfg.seed)
    eval_ds = MultSpkEvalClsDataset(eval_files_src_list, eval_files_trg_list,
                                    spk_src_list, spk_trg_list)
    step = make_classifier_step(cfg, opt)

    # hoisted so the jit cache persists across utterances/epochs (a fresh
    # lambda per call would retrace+recompile every single eval forward)
    @jax.jit
    def eval_forward(p, f):
        return gru_rnn_apply(p, cfg, f, jnp.zeros((1, cfg.out_dim)),
                             softmax=True)

    history: List[Dict] = []
    bsu = tcfg.batch_size_utt
    for epoch in range(tcfg.epoch_count):
        t0 = time.time()
        order = np.arange(len(train_ds))
        np_rng.shuffle(order)
        ms = []
        for s in range(0, len(order), bsu):
            utts = [train_ds[i] for i in order[s:s + bsu]]
            jb = {k: jnp.asarray(v) for k, v in
                  _collate_cls(utts, tcfg.batch_size).items()}
            params, opt_state, rng, m_ = step(params, opt_state, rng, jb)
            ms.append({k: float(v) for k, v in m_.items()})
        train_m = {k: float(np.mean([x[k] for x in ms])) for k in ms[0]}

        # eval: frame accuracy over both directions of the deterministic pairs
        correct = total = 0.0
        for i in range(len(eval_ds)):
            item = eval_ds[i]
            for side in ("src", "trg"):
                r = item[side]
                feats = jnp.asarray(r["feats"][None])
                probs, _, _ = eval_forward(params, feats)
                pred = np.asarray(jnp.argmax(probs[0], axis=-1))
                correct += float((pred == r["class_code"]).sum())
                total += len(pred)
        acc_eval = correct / max(total, 1.0)
        history.append({"epoch": epoch + 1, "train": train_m,
                        "eval_acc": acc_eval})
        logging.info("cls epoch %d: train %s eval_acc %.3f (%.1fs)",
                     epoch + 1, {k: round(v, 3) for k, v in train_m.items()},
                     acc_eval, time.time() - t0)

    with open(os.path.join(expdir, "history_cls.json"), "w") as f:
        json.dump({"history": history}, f, indent=2)
    return {"history": history, "params": params, "cfg": cfg}


def main(argv=None):
    """CLI: train the per-frame speaker classifier over N speakers on a
    prepared workspace (per-speaker stages 1-3 must have run)."""
    import argparse

    from .. import enable_compilation_cache
    from ..utils.config import ExperimentConfig, load_config
    from .recipe import RecipePaths
    from .stats import calc_stats_joint

    p = argparse.ArgumentParser(prog="cyclevae_tpu.train_stage_cls")
    p.add_argument("--work", required=True)
    p.add_argument("--src-speakers", nargs="+", required=True)
    p.add_argument("--trg-speakers", nargs="+", required=True)
    p.add_argument("--config", default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--n-train", type=int, default=40)
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
    all_spk = list(args.src_speakers) + list(args.trg_speakers)
    train_files = []
    for spk in all_spk:
        train_files += paths.h5s(spk)[:paths.n_train]
    stats_jnt = os.path.join(paths.work, "stats", "stats_jnt_cls.h5")
    calc_stats_joint(train_files, [], stats_jnt)
    expdir = os.path.join(paths.work, "exp", exp.name() + "_cls")
    res = run_train_cls(
        exp, train_files,
        [paths.h5s(s, True) for s in args.src_speakers],
        [paths.h5s(s, True) for s in args.trg_speakers],
        args.src_speakers, args.trg_speakers, stats_jnt, expdir)
    logging.info("cls training done: eval_acc=%.3f",
                 res["history"][-1]["eval_acc"])


if __name__ == "__main__":
    main()
