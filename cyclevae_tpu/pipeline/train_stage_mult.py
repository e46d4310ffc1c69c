"""Many-to-many CycleVAE training driver.

The reference defines the many-to-many data surface (dataset.py:101-492) but
ships no training binary (it lives in the successor repo — SURVEY.md §2.2).
This driver completes the capability: N-speaker one-hot codes, per-cycle
random conversion pairs with the partner speaker's converted excitation, same
cyclic-ELBO machinery (vi/train handles the per-cycle code axis natively).
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

from ..utils.config import ExperimentConfig, save_config
from ..utils.hdf5 import read_hdf5
from ..vi.checkpoint import save_checkpoint
from ..vi.train import (
    CycleVAEConfig,
    TrainState,
    init_cyclevae,
    make_eval_forward,
    make_optimizer,
    make_train_step,
)
from .dataset import bucket_len, padding
from .dataset_mult import MultSpkEvalDataset, MultSpkTrainDataset, MultUtterance


def _collate(utts: List[MultUtterance], n_cyc: int, seg_len: int,
             quantum_segs: int = 7) -> Dict:
    T = bucket_len(max(u.flen for u in utts), seg_len, quantum_segs)
    B = len(utts)

    def pad2(x):
        return padding(x, T).astype(np.float32)

    batch = {
        "feats": np.stack([pad2(u.feats) for u in utts]),
        "src_code": np.stack([pad2(u.src_code) for u in utts]),
        "trg_code": np.stack(
            [np.stack([pad2(u.trg_codes[i]) for u in utts])
             for i in range(n_cyc)]),                       # (n_cyc, B, T, N)
        "cv_excit": np.stack(
            [np.stack([pad2(u.cv_excits[i]) for u in utts])
             for i in range(n_cyc)]),                       # (n_cyc, B, T, 4)
        "flens": np.asarray([u.flen for u in utts], dtype=np.int32),
    }
    return batch, T // seg_len


def run_train_mult(exp: ExperimentConfig, feat_files: Sequence[str],
                   feat_files_eval: Sequence[str],
                   spk_src_list: Sequence[str], spk_trg_list: Sequence[str],
                   stats_jnt: str, expdir: str) -> Dict:
    """Train a many-to-many CycleVAE over N speakers."""
    os.makedirs(expdir, exist_ok=True)
    n_spk = len(spk_src_list) + len(spk_trg_list)
    m = exp.model
    cfg = CycleVAEConfig(
        in_dim=m.in_dim, out_dim=m.out_dim, lat_dim=m.lat_dim, n_spk=n_spk,
        hidden_units=m.hidden_units, hidden_layers=m.hidden_layers,
        kernel_size=m.kernel_size, dilation_size=m.dilation_size,
        n_cyc=m.n_cyc, do_prob=m.do_prob, stdim=m.stdim,
        posterior=m.posterior, use_pallas=m.use_pallas,
        compute_dtype=m.compute_dtype)
    tcfg = exp.train
    save_config(exp, os.path.join(expdir, "model.json"))

    mean_jnt = read_hdf5(stats_jnt, "/mean_feat_org_lf0_jnt")
    scale_jnt = read_hdf5(stats_jnt, "/scale_feat_org_lf0_jnt")
    key = jax.random.PRNGKey(tcfg.seed)
    np_rng = np.random.default_rng(tcfg.seed)
    params = init_cyclevae(key, cfg, mean_jnt.astype(np.float32),
                           scale_jnt.astype(np.float32))
    opt = make_optimizer(cfg, tcfg.lr, tcfg.weight_decay)
    key, sub = jax.random.split(key)
    ts = TrainState(params, opt.init(params), sub, jnp.zeros((), jnp.int32))

    train_ds = MultSpkTrainDataset(feat_files, spk_src_list, spk_trg_list,
                                   cfg.eff_cyc, seed=tcfg.seed)
    eval_ds = MultSpkEvalDataset(feat_files_eval, spk_src_list, spk_trg_list,
                                 cfg.eff_cyc)

    seg = tcfg.batch_size
    bsu = tcfg.batch_size_utt
    step_cache: Dict[int, any] = {}
    eval_fn = make_eval_forward(cfg)

    def get_step(n_segs):
        if n_segs not in step_cache:
            step_cache[n_segs] = make_train_step(cfg, opt, seg, n_segs)
        return step_cache[n_segs]

    history = []
    from ..dsp import dtw as dtw_c

    for epoch in range(tcfg.epoch_count):
        t_ep = time.time()
        order = np.arange(len(train_ds))
        np_rng.shuffle(order)
        ep_metrics = []
        for s in range(0, len(order), bsu):
            utts = [train_ds[i] for i in order[s:s + bsu]]
            while len(utts) < bsu:  # dummy-pad partial batches (masked out)
                dummy = utts[0]
                utts.append(MultUtterance(
                    dummy.featfile, np.zeros_like(dummy.feats),
                    dummy.src_code, dummy.trg_codes, dummy.cv_excits,
                    dummy.spcidx, dummy.pair_spks))
            batch, n_segs = _collate(utts, cfg.eff_cyc, seg)
            if len(utts) > len(order[s:s + bsu]):
                batch["flens"][len(order[s:s + bsu]):] = 0
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            ts, metrics = get_step(n_segs)(ts, jb)
            # average over VALID segments only (as in train_stage.run_train):
            # fully-padded trailing segments carry all-zero metrics that would
            # dilute the epoch means, and seg_valid itself is a flag, not a
            # training metric
            w = np.asarray(metrics.pop("seg_valid"))
            nw = max(float(w.sum()), 1.0)
            ep_metrics.append(
                {k: float(np.sum(np.asarray(v) * w) / nw)
                 for k, v in metrics.items()})
        mean_train = {k: float(np.mean([mm[k] for mm in ep_metrics]))
                      for k in ep_metrics[0]}
        logging.info("m2m epoch %d train: %s (%.1fs)", epoch + 1,
                     {k: round(v, 3) for k, v in sorted(mean_train.items())},
                     time.time() - t_ep)
        save_checkpoint(expdir, ts.params, ts.opt_state, ts.rng, np_rng,
                        epoch + 1)

        # eval: reconstruction / cyclic MCD over speech frames per utterance
        ev = []
        key_eval = jax.random.PRNGKey(tcfg.seed + 31 * (epoch + 1))
        for s in range(0, len(eval_ds), tcfg.batch_size_utt_eval):
            utts = [eval_ds[i] for i in
                    range(s, min(s + tcfg.batch_size_utt_eval, len(eval_ds)))]
            batch, _ = _collate(utts, cfg.eff_cyc, seg)
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            outs = jax.tree_util.tree_map(
                np.asarray, eval_fn(ts.params, key_eval, jb))
            for j, u in enumerate(utts):
                spc = u.spcidx
                mcep = np.asarray(u.feats[:, cfg.stdim:], np.float64)
                rec = np.asarray(outs["recon"][0, j, :u.flen], np.float64)
                cyc = np.asarray(outs["cyc_recon"][0, j, :u.flen], np.float64)
                m1, _ = dtw_c.calc_mcd(rec[spc], mcep[spc])
                m2, _ = dtw_c.calc_mcd(cyc[spc], mcep[spc])
                ev.append({"mcdpow_rec": m1, "mcdpow_cyc": m2})
        agg = {f"{k}_mean": float(np.mean([e[k] for e in ev])) for k in ev[0]}
        logging.info("m2m epoch %d eval: %s", epoch + 1,
                     {k: round(v, 3) for k, v in agg.items()})
        history.append({"epoch": epoch + 1, "train": mean_train, "eval": agg})
        with open(os.path.join(expdir, "history.json"), "w") as f:
            json.dump({"history": history,
                       "best": {"epoch": int(np.argmin(
                           [h["eval"]["mcdpow_rec_mean"] for h in history]) + 1)}},
                      f, indent=2)
    return {"history": history}
