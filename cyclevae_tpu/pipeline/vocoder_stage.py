"""Neural-vocoder training + synthesis driver (WaveRNN-class).

Completes the reference's dormant vocoder surface (FeatureDatasetNeuVoco,
dataset.py:517-563) into a runnable stage: teacher-forced training over
wav/feature pairs, checkpointing, and mu-law AR synthesis via the Pallas
sampling kernel (XLA fallback off-TPU).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Sequence

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..models.wavernn import (
    WaveRNNConfig,
    generate_xla,
    hop_fraction,
    init_wavernn,
    mulaw_decode,
    n_samples_for,
    upsample_cond,
    wavernn_loss,
)
from ..vi.checkpoint import save_checkpoint
from .dataset_mult import NeuVocoDataset


def sample_clips(ds: NeuVocoDataset, idxs, clip_frames: int,
                 cfg: WaveRNNConfig, rng: np.random.Generator):
    """Random fixed-length (clip_frames) wav/feature crops for one batch.
    Clip starts align to hop_den frames so the fractional hop (441/4 samples
    per frame) maps to an exact integer sample offset — no cumulative
    frame/sample drift across the crop."""
    num, den = hop_fraction(cfg)
    n_samp_clip = n_samples_for(cfg, clip_frames)
    feats, wavs = [], []
    for i in idxs:
        item = ds[int(i)]
        F = item["feat"].shape[0]
        n_frames = min(clip_frames, F)
        start = int(rng.integers(0, max(F - clip_frames, 0) + 1))
        start -= start % den
        f = item["feat"][start:start + n_frames]
        s0 = start * num // den
        w = item["x"][s0:s0 + n_samples_for(cfg, n_frames)]
        if n_frames < clip_frames or len(w) < n_samp_clip:
            f = np.pad(f, ((0, clip_frames - n_frames), (0, 0)))
            w = np.pad(w, (0, n_samp_clip - len(w)))
        feats.append(f)
        wavs.append(w)
    return (jnp.asarray(np.stack(feats), jnp.float32),
            jnp.asarray(np.stack(wavs), jnp.float32))


def run_train_vocoder(cfg: WaveRNNConfig, wav_files: Sequence[str],
                      feat_files: Sequence[str], expdir: str,
                      epochs: int = 10, batch_size: int = 8,
                      clip_frames: int = 24, lr: float = 2e-4,
                      seed: int = 1, lr_decay: bool = False,
                      ckpt_every: int = 25,
                      resume: str = None,
                      spk_ids: Sequence[int] = None) -> Dict:
    os.makedirs(expdir, exist_ok=True)
    ds = NeuVocoDataset(wav_files, feat_files, cfg.hop,
                        spk_ids=spk_ids, n_spk=cfg.n_spk)
    key = jax.random.PRNGKey(seed)
    np_rng = np.random.default_rng(seed)
    params = init_wavernn(key, cfg)
    if lr_decay:
        # cosine to lr/10 over the full run (steps = batches/epoch * epochs)
        steps = max(1, (len(ds) + batch_size - 1) // batch_size) * epochs
        sched = optax.cosine_decay_schedule(lr, steps, alpha=0.1)
        opt = optax.adam(sched)
    else:
        opt = optax.adam(lr)
    opt_state = opt.init(params)
    start_epoch = 0
    if resume:
        from ..vi.checkpoint import load_checkpoint, restore_np_rng
        ckpt = load_checkpoint(resume)
        params = jax.tree_util.tree_map(jnp.asarray, ckpt["params"])
        opt_state = jax.tree_util.tree_map(jnp.asarray, ckpt["opt_state"])
        key = jnp.asarray(ckpt["jax_key"])
        np_rng = restore_np_rng(ckpt["np_rng_state"])
        start_epoch = int(ckpt["epoch"])
        logging.info("vocoder resume from %s at epoch %d", resume,
                     start_epoch)

    @jax.jit
    def step(params, opt_state, feats, wavs):
        loss, g = jax.value_and_grad(wavernn_loss)(params, cfg, feats, wavs)
        upd, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, upd), opt_state, loss

    history = []
    hist_path = os.path.join(expdir, "history.json")
    if resume and os.path.exists(hist_path):
        # splice: keep the pre-resume epochs' history entries
        history = [h for h in json.load(open(hist_path))["history"]
                   if h["epoch"] <= start_epoch]
    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        order = np_rng.permutation(len(ds))
        losses = []
        for s in range(0, len(order), batch_size):
            idxs = order[s:s + batch_size]
            if len(idxs) < batch_size:
                idxs = np.concatenate([idxs, order[:batch_size - len(idxs)]])
            feats, wavs = sample_clips(ds, idxs, clip_frames, cfg, np_rng)
            params, opt_state, loss = step(params, opt_state, feats, wavs)
            losses.append(float(loss))
        history.append({"epoch": epoch + 1, "nll": float(np.mean(losses)),
                        "sec": time.time() - t0})
        logging.info("vocoder epoch %d: nll=%.3f (%.1fs)", epoch + 1,
                     history[-1]["nll"], history[-1]["sec"])
        # rolling latest every epoch; numbered keepers are ~40 MB each, so
        # thin them to every ckpt_every epochs (+ the final one)
        save_checkpoint(expdir, params, opt_state, key, np_rng, epoch + 1,
                        name="checkpoint-latest.pkl")
        if (epoch + 1) % ckpt_every == 0 or epoch + 1 == epochs:
            save_checkpoint(expdir, params, opt_state, key, np_rng, epoch + 1)
    with open(hist_path, "w") as f:
        json.dump({"history": history}, f, indent=2)
    return {"params": params, "history": history}


def synthesize_vocoder(params: Dict, cfg: WaveRNNConfig, feats: np.ndarray,
                       seed: int = 0, temperature: float = 1.0,
                       use_pallas: bool = True, spk_id: int = None
                       ) -> np.ndarray:
    """Features (F, feat_dim) -> waveform samples in [-1, 1].  For a
    multi-speaker model (cfg.n_spk > 0) pass ``spk_id`` to append the
    one-hot speaker code the model was trained with."""
    feats = np.asarray(feats, np.float32)
    if cfg.n_spk > 0:
        assert spk_id is not None, "multi-speaker vocoder needs spk_id"
        code = np.zeros((feats.shape[0], cfg.n_spk), np.float32)
        code[:, spk_id] = 1.0
        feats = np.concatenate([feats, code], axis=1)
    cond = upsample_cond(params, cfg, jnp.asarray(feats, jnp.float32)[None])
    if use_pallas and jax.devices()[0].platform == "tpu":
        from ..ops.pallas_wavernn import pallas_wavernn_generate
        idx = pallas_wavernn_generate(params, cfg, cond, seed=seed,
                                      temperature=temperature)[0]
    else:
        idx = generate_xla(params, cfg, jax.random.PRNGKey(seed), cond[0],
                           temperature=temperature)
    return np.asarray(mulaw_decode(idx, cfg.n_classes))


def converted_conditioning(src_feat: np.ndarray, cvmcep: np.ndarray,
                           cvf0: np.ndarray, shiftms: float) -> np.ndarray:
    """Assemble neural-vocoder conditioning for a CONVERTED utterance in the
    training feature layout (pipeline/decode._feat_from_wav:49-50):
    [uv, log cont-F0-lpf, codeap, mcep] with the converted F0 trajectory and
    converted mceps in place of the naturals; codeap stays the source's.

    src_feat: (T, feat_dim) natural source features (layout above).
    cvmcep:   (T, mcep_dim+1) converted (typically GV-postfiltered) mceps.
    cvf0:     (T,) converted F0 in Hz (0 = unvoiced).
    """
    from ..utils.wavio import low_pass_filter
    from .features import convert_continuos_f0

    uv, contf0 = convert_continuos_f0(np.array(cvf0))
    cont_lpf = low_pass_filter(contf0, int(1.0 / (shiftms * 0.001)),
                               cutoff=20)
    # degenerate all-unvoiced trajectory: the continuous F0 is 0 everywhere
    # and log() would poison the conditioning with -inf; floor at 1 Hz
    # (uv = 0 already tells the vocoder these frames are unvoiced)
    cont_lpf = np.maximum(cont_lpf, 1.0)
    n_codeap = src_feat.shape[1] - 2 - cvmcep.shape[1]
    return np.c_[uv[:, None], np.log(cont_lpf)[:, None],
                 src_feat[:, 2:2 + n_codeap], cvmcep].astype(np.float32)


def eval_copy_synthesis(params: Dict, cfg: WaveRNNConfig, exp,
                        eval_wavs: Sequence[str], sc, outdir: str,
                        temperature: float = 1.0,
                        spk_id: int = None) -> Dict:
    """Copy-synthesis quality on held-out utterances: analyze -> vocode the
    natural features -> re-analyze, report DTW MCD vs the original mcep plus
    voiced-F0 relative error and U/V agreement.  ``sc``: SpeakerConf bounds.
    Returns the aggregate dict (means + stds)."""
    from ..dsp import dtw as dtw_c
    from ..utils.wavio import read_wav, write_wav
    from .decode import _feat_from_wav

    fcfg = exp.feature
    os.makedirs(outdir, exist_ok=True)
    mets = []
    for i, wf in enumerate(eval_wavs):
        fs, x = read_wav(wf, cutoff=int(fcfg.highpass_cutoff))
        ana = _feat_from_wav(x, fs, sc.minf0, sc.maxf0, sc.pow_threshold,
                             fcfg)
        # vocoder samples are [-1, 1]; host IO/analysis are int16-scale
        y = synthesize_vocoder(params, cfg, ana["feat"], seed=i,
                                temperature=temperature,
                                spk_id=spk_id) * 32768.0
        write_wav(os.path.join(outdir, os.path.basename(wf)), fs,
                  y.astype(np.float32))
        re = _feat_from_wav(y.astype(np.float64), fs, sc.minf0, sc.maxf0,
                            sc.pow_threshold, fcfg)
        m = {}
        a = ana["mcep"][ana["spcidx"]].astype(np.float64)
        b = re["mcep"][re["spcidx"]].astype(np.float64)
        _, _, m["mcdpow"], _ = dtw_c.dtw_org_to_trg(b, a)
        _, _, m["mcd"], _ = dtw_c.dtw_org_to_trg(b[:, 1:], a[:, 1:])
        n = min(len(ana["f0"]), len(re["f0"]))
        v = (ana["f0"][:n] > 0) & (re["f0"][:n] > 0)
        m["f0_rel_err_median"] = float(np.median(
            np.abs(re["f0"][:n][v] - ana["f0"][:n][v]) / ana["f0"][:n][v])) \
            if v.any() else float("nan")
        m["uv_agree"] = float(np.mean((ana["f0"][:n] > 0)
                                      == (re["f0"][:n] > 0)))
        mets.append(m)
        logging.info("vocoded %s: %s", os.path.basename(wf),
                     {k: round(v, 4) for k, v in m.items()})
    if not mets:  # eval skipped (n_eval=0): train-only stage run
        return {}
    agg = {k: float(np.mean([m[k] for m in mets])) for k in mets[0]}
    agg.update({f"{k}_std": float(np.std([m[k] for m in mets]))
                for k in mets[0]})
    return agg
