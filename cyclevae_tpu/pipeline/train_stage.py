"""Stage 4: cyclic-CycleVAE training driver.

Reference: src/bin/train_gru_cyclevae_gauss_batch.py (call stack SURVEY.md
§3.1).  One epoch = shuffled utterance batches -> TBPTT segment scan with
per-segment Adam (all on device, one jit per bucket size) -> per-epoch
checkpoint with RNG state -> eval epoch (full-length cyclic forward, DTW MCD
metrics vs the paired utterance on host C++) -> best-epoch selection by the
reference criterion (mcdpow+std+mcd+std of src→trg, train…py:1153-1201).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..dsp import dtw as dtw_c
from ..utils.config import ExperimentConfig, save_config
from ..utils.hdf5 import read_hdf5
from ..vi.checkpoint import load_checkpoint, restore_np_rng, save_checkpoint
from ..vi.train import (
    CycleVAEConfig,
    TrainState,
    init_cyclevae,
    make_eval_forward,
    make_optimizer,
    make_train_step,
)
from .dataset import SingleVAEDataset, Utterance, iter_batches, make_batch


def model_config(exp: ExperimentConfig) -> CycleVAEConfig:
    m = exp.model
    return CycleVAEConfig(
        in_dim=m.in_dim, out_dim=m.out_dim, lat_dim=m.lat_dim, n_spk=m.n_spk,
        hidden_units=m.hidden_units, hidden_layers=m.hidden_layers,
        kernel_size=m.kernel_size, dilation_size=m.dilation_size,
        n_cyc=m.n_cyc, do_prob=m.do_prob, stdim=m.stdim,
        posterior=m.posterior, use_pallas=m.use_pallas,
        compute_dtype=m.compute_dtype)


def _pad_batch_utts(batch: Dict, bsu: int) -> Dict:
    """Pad a partial utterance batch to bsu with zero-flen dummies so each
    bucket compiles exactly once (masks null their loss contribution)."""
    B = batch["feats"].shape[0]
    if B == bsu:
        return batch
    out = {}
    for k, v in batch.items():
        pad_shape = (bsu - B,) + v.shape[1:]
        out[k] = np.concatenate([v, np.zeros(pad_shape, v.dtype)])
    return out


def _utt_eval_metrics(cfg: CycleVAEConfig, utt: Utterance,
                      outs: Dict, j: int,
                      gv_mean_trg: Optional[np.ndarray] = None
                      ) -> Dict[str, float]:
    """Per-utterance eval metrics on cycle 0 (reference eval epoch
    train…py:817-1152 / decode metric definitions decode…py:363-404)."""
    stdim = cfg.stdim
    flen = utt.flen
    spc = utt.spcidx
    mcep_src = np.asarray(utt.feats[:, stdim:], dtype=np.float64)
    recon = np.asarray(outs["recon"][0, j, :flen], dtype=np.float64)
    cyc = np.asarray(outs["cyc_recon"][0, j, :flen], dtype=np.float64)
    conv = np.asarray(outs["conv"][0, j, :flen], dtype=np.float64)

    m: Dict[str, float] = {}
    if gv_mean_trg is not None:
        # GV log-RMSE of converted mcep vs target-speaker data GV
        # (reference train…py:722-727 / gru_vae.py:508)
        var_cv = np.var(conv[:, 1:], axis=0)
        m["gv_log_rmse_cv"] = float(np.mean(np.sqrt(
            (np.log(np.maximum(var_cv, 1e-12)) - np.log(gv_mean_trg)) ** 2)))
    # reconstruction / cyclic MCD over speech frames (power-incl and excl)
    m["mcdpow_rec"], _ = dtw_c.calc_mcd(recon[spc], mcep_src[spc])
    m["mcd_rec"], _ = dtw_c.calc_mcd(recon[spc][:, 1:], mcep_src[spc][:, 1:])
    m["mcdpow_cyc"], _ = dtw_c.calc_mcd(cyc[spc], mcep_src[spc])
    m["mcd_cyc"], _ = dtw_c.calc_mcd(cyc[spc][:, 1:], mcep_src[spc][:, 1:])
    # conversion MCD vs the PAIRED utterance with DTW alignment
    mcep_trg = np.asarray(utt.feats_pair[:, stdim:], dtype=np.float64)
    trg_spc = mcep_trg[utt.spcidx_pair]
    conv_spc = conv[spc]
    _, _, m["mcdpow_cv"], _ = dtw_c.dtw_org_to_trg(conv_spc, trg_spc)
    _, _, m["mcd_cv"], _ = dtw_c.dtw_org_to_trg(conv_spc[:, 1:], trg_spc[:, 1:])
    return m


def run_train(exp: ExperimentConfig, feats_src: List[str],
              feats_src_pair: List[str], feats_trg: List[str],
              feats_trg_pair: List[str], feats_eval_src: List[str],
              feats_eval_trg: List[str], stats_src: str, stats_trg: str,
              stats_jnt: str, expdir: str,
              resume: Optional[str] = None) -> Dict:
    """Train; returns summary dict incl. best epoch. Artifacts in expdir."""
    os.makedirs(expdir, exist_ok=True)
    cfg = model_config(exp)
    tcfg = exp.train
    save_config(exp, os.path.join(expdir, "model.json"))

    mean_jnt = read_hdf5(stats_jnt, "/mean_feat_org_lf0_jnt")
    scale_jnt = read_hdf5(stats_jnt, "/scale_feat_org_lf0_jnt")
    gv_trg_mean = read_hdf5(stats_trg, "/gv_range_mean")[1:]
    gv_src_mean = read_hdf5(stats_src, "/gv_range_mean")[1:]

    key = jax.random.PRNGKey(tcfg.seed)
    np_rng = np.random.default_rng(tcfg.seed)
    params = init_cyclevae(key, cfg, mean_jnt.astype(np.float32),
                           scale_jnt.astype(np.float32))
    opt = make_optimizer(cfg, tcfg.lr, tcfg.weight_decay)
    opt_state = opt.init(params)
    start_epoch = 0
    key, sub = jax.random.split(key)
    if resume:
        ckpt = load_checkpoint(resume)
        params = jax.tree_util.tree_map(jnp.asarray, ckpt["params"])
        opt_state = jax.tree_util.tree_map(jnp.asarray, ckpt["opt_state"])
        sub = jnp.asarray(ckpt["jax_key"])
        np_rng = restore_np_rng(ckpt["np_rng_state"])
        start_epoch = ckpt["epoch"]
        logging.info("restored from %d-epoch checkpoint %s", start_epoch, resume)
    ts = TrainState(params, opt_state, sub, jnp.asarray(start_epoch))

    train_ds = SingleVAEDataset(
        list(feats_src) + list(feats_trg),
        list(feats_src_pair) + list(feats_trg_pair), exp.model.spk_src)
    eval_src_ds = SingleVAEDataset(feats_eval_src, feats_eval_trg, exp.model.spk_src)
    eval_trg_ds = SingleVAEDataset(feats_eval_trg, feats_eval_src, exp.model.spk_src)

    seg = tcfg.batch_size
    bsu = tcfg.batch_size_utt
    step_cache: Dict[int, any] = {}
    eval_fn = make_eval_forward(cfg)

    def get_step(n_segs: int):
        if n_segs not in step_cache:
            step_cache[n_segs] = make_train_step(cfg, opt, seg, n_segs)
        return step_cache[n_segs]

    history = []
    best = {"criterion": np.inf, "epoch": -1}
    if resume:
        # continue the experiment's history/best across the restart
        hist_path = os.path.join(expdir, "history.json")
        if os.path.exists(hist_path):
            with open(hist_path) as f:
                prev = json.load(f)
            history = [h for h in prev.get("history", [])
                       if h["epoch"] <= start_epoch]
            prev_best = prev.get("best", {})
            if prev_best.get("epoch", -1) <= start_epoch and \
                    np.isfinite(prev_best.get("criterion", np.inf)):
                best = prev_best

    for epoch in range(start_epoch, tcfg.epoch_count):
        t_ep = time.time()
        ep_metrics: List[Dict] = []
        for batch, meta in iter_batches(train_ds, bsu, seg, np_rng):
            batch = _pad_batch_utts(batch, bsu)
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            ts, metrics = get_step(meta["n_segs"])(ts, jb)
            # average over VALID segments only — fully-padded trailing segments
            # carry all-zero metrics that would dilute the epoch means
            w = np.asarray(metrics.pop("seg_valid"))
            nw = max(float(w.sum()), 1.0)
            ep_metrics.append(
                {k: float(np.sum(np.asarray(v) * w) / nw)
                 for k, v in metrics.items()})
        mean_train = {k: float(np.mean([m[k] for m in ep_metrics]))
                      for k in ep_metrics[0]}
        logging.info("epoch %d train: %s (%.1fs)", epoch + 1,
                     {k: round(v, 3) for k, v in sorted(mean_train.items())},
                     time.time() - t_ep)

        # checkpoint with RNG state (reference :711); non-eval epochs only
        # refresh the rolling 'latest' to bound disk usage
        eval_interval = getattr(tcfg, "eval_interval", 1)
        is_eval_epoch = (epoch + 1) % max(eval_interval, 1) == 0
        if is_eval_epoch:
            save_checkpoint(expdir, ts.params, ts.opt_state, ts.rng, np_rng,
                            epoch + 1)
        save_checkpoint(expdir, ts.params, ts.opt_state, ts.rng, np_rng,
                        epoch + 1, name="checkpoint-latest.pkl")
        if not is_eval_epoch:
            history.append({"epoch": epoch + 1, "train": mean_train,
                            "eval": None})
            continue

        # ---- eval epoch (reference :817-1152) ----
        ev: List[Dict[str, float]] = []
        key_eval = jax.random.PRNGKey(tcfg.seed + 10007 * (epoch + 1))
        for ds in (eval_src_ds, eval_trg_ds):
            for b_start in range(0, len(ds), tcfg.batch_size_utt_eval):
                utts = [ds[i] for i in
                        range(b_start, min(b_start + tcfg.batch_size_utt_eval,
                                           len(ds)))]
                batch, meta = make_batch(utts, seg)
                jb = {k: jnp.asarray(v) for k, v in batch.items()}
                outs = eval_fn(ts.params, key_eval, jb)
                outs = jax.tree_util.tree_map(np.asarray, outs)
                # host DTW is the serial bottleneck of the eval epoch
                # (reference pays it serially, SURVEY.md §7); the C++ kernels
                # release the GIL, so thread the per-utterance metrics
                from concurrent.futures import ThreadPoolExecutor
                def one(j_utt):
                    j, utt = j_utt
                    gv_t = gv_trg_mean if utt.is_src_speaker else gv_src_mean
                    m = _utt_eval_metrics(cfg, utt, outs, j, gv_t)
                    m["is_src"] = float(utt.is_src_speaker)
                    return m
                with ThreadPoolExecutor(max_workers=8) as ex:
                    ev.extend(ex.map(one, list(enumerate(utts))))
        agg = {}
        for k in ev[0]:
            if k == "is_src":
                continue
            vals = np.array([m[k] for m in ev])
            agg[f"{k}_mean"] = float(vals.mean())
            agg[f"{k}_std"] = float(vals.std())
        # best-epoch criterion: the SRC→TRG direction only, as the reference
        # (train…py:1153 uses eval_*_src_trg, never the trg→src direction);
        # the pooled two-direction agg above is logged for observability
        src_cv_pow = np.array([m["mcdpow_cv"] for m in ev if m["is_src"] > 0])
        src_cv = np.array([m["mcd_cv"] for m in ev if m["is_src"] > 0])
        if src_cv_pow.size == 0:    # no src-speaker eval utterances
            src_cv_pow = np.array([m["mcdpow_cv"] for m in ev])
            src_cv = np.array([m["mcd_cv"] for m in ev])
        criterion = float(src_cv_pow.mean() + src_cv_pow.std()
                          + src_cv.mean() + src_cv.std())
        agg["criterion"] = criterion
        logging.info("epoch %d eval: %s", epoch + 1,
                     {k: round(v, 3) for k, v in sorted(agg.items())})
        history.append({"epoch": epoch + 1, "train": mean_train, "eval": agg})
        if criterion < best["criterion"]:
            best = {"criterion": criterion, "epoch": epoch + 1}
        with open(os.path.join(expdir, "history.json"), "w") as f:
            json.dump({"history": history, "best": best}, f, indent=2)

    save_checkpoint(expdir, ts.params, ts.opt_state, ts.rng, np_rng,
                    tcfg.epoch_count, name="checkpoint-final.pkl")
    return {"best": best, "history": history}
