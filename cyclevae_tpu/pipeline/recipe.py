"""Recipe orchestrator: the reference's egs/one-to-one/run.sh as a typed
Python driver (stages selected by substring, run.sh:209-638).

Stages:
  0  data list preparation (train/pair split: first n_train wavs = train,
     rest = pair set; eval dirs separate — run.sh:222-237)
  1  feature extraction (train + eval, both speakers)
  a  speaker F0/power statistics (histograms + suggested bounds)
  2  per-speaker + joint statistics
  3  converted excitation
  4  CycleVAE training
  5  GV calibration (cvgv)
  6  decode eval utterances to waveforms
  i  posterior-inference stage (HMC over eval latents; no ref counterpart)
  v  neural-vocoder training + copy-synthesis eval (surface from reference
     FeatureDatasetNeuVoco; no trainer ships in the reference)
"""

from __future__ import annotations

import argparse
import json
import logging
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from ..utils.config import ExperimentConfig, load_config
from ..utils.hdf5 import find_files, read_hdf5


@dataclass
class SpeakerConf:
    """Per-speaker analysis bounds (reference conf/<spk>.f0 / conf/<spk>.pow)."""
    minf0: float
    maxf0: float
    pow_threshold: float


# bundled VCC2018 speaker settings (reference egs/one-to-one/conf/)
DEFAULT_SPEAKERS: Dict[str, SpeakerConf] = {
    "VCC2SF1": SpeakerConf(130.0, 427.0, -40.0),
    "VCC2SF2": SpeakerConf(121.0, 341.0, -35.5),
    "VCC2SF3": SpeakerConf(132.0, 318.0, -45.0),
    "VCC2SF4": SpeakerConf(125.0, 360.0, -36.0),
    "VCC2SM1": SpeakerConf(60.0, 199.0, -34.5),
    "VCC2SM2": SpeakerConf(86.0, 275.0, -35.0),
    "VCC2SM3": SpeakerConf(58.0, 210.0, -38.5),
    "VCC2SM4": SpeakerConf(57.0, 247.0, -34.5),
    "VCC2TF1": SpeakerConf(138.0, 343.0, -45.5),
    "VCC2TF2": SpeakerConf(127.0, 400.0, -35.0),
    "VCC2TM1": SpeakerConf(64.0, 220.0, -29.0),
    "VCC2TM2": SpeakerConf(85.0, 265.0, -35.5),
    "bdl": SpeakerConf(61.0, 257.0, -28.0),
    "slt": SpeakerConf(132.0, 325.0, -28.5),
}


@dataclass
class RecipePaths:
    wav_root: str                  # contains <spk>/ and eval/<spk>/
    work: str                      # output root (hdf5/stats/exp)
    n_train: int = 40              # first N wavs per speaker = train set

    def wavs(self, spk: str, eval_set: bool = False) -> List[str]:
        d = os.path.join(self.wav_root, "eval", spk) if eval_set else \
            os.path.join(self.wav_root, spk)
        return sorted(find_files(d, "*.wav"))

    def h5dir(self, spk: str, eval_set: bool = False) -> str:
        # NOTE: the parent directory name IS the speaker identity (the
        # datasets' code-assignment contract, reference dataset.py:75-80) —
        # eval sets therefore live under eval/<spk>/, never eval_<spk>/
        sub = os.path.join("eval", spk) if eval_set else spk
        return os.path.join(self.work, "hdf5", sub)

    def h5s(self, spk: str, eval_set: bool = False) -> List[str]:
        return sorted(find_files(self.h5dir(spk, eval_set), "*.h5"))

    def stats(self, spk: str) -> str:
        return os.path.join(self.work, "stats", f"stats_{spk}.h5")

    def stats_jnt(self) -> str:
        return os.path.join(self.work, "stats", "stats_jnt.h5")


def _read_spk_conf(conf_dir: Optional[str], spk: str) -> SpeakerConf:
    if conf_dir:
        f0p = os.path.join(conf_dir, f"{spk}.f0")
        powp = os.path.join(conf_dir, f"{spk}.pow")
        if os.path.exists(f0p) and os.path.exists(powp):
            mn, mx = open(f0p).read().split()
            pw = float(open(powp).read().strip())
            return SpeakerConf(float(mn), float(mx), pw)
    return DEFAULT_SPEAKERS.get(spk, SpeakerConf(40.0, 700.0, -20.0))


def run_stages(stages: str, exp: ExperimentConfig, paths: RecipePaths,
               conf_dir: Optional[str] = None, n_jobs: int = 8,
               decode_epoch: Optional[int] = None,
               vocoder_epochs: int = 300, vocoder_clip_frames: int = 96,
               vocoder_n_eval: int = 5, vocoder_hidden_units: int = 896,
               vocoder_resume: str = None,
               vocoder_temperature: float = 0.8,
               vocoder_multispk: bool = False,
               vocoder_lr_decay: bool = False):
    from .. import enable_compilation_cache
    enable_compilation_cache()
    spk_src = exp.model.spk_src
    spk_trg = exp.model.spk_trg
    speakers = [spk_src, spk_trg]
    expdir = os.path.join(paths.work, "exp", exp.name())
    os.makedirs(expdir, exist_ok=True)
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
        datefmt="%m/%d/%Y %I:%M:%S")

    def split(files):
        return files[:paths.n_train], files[paths.n_train:]

    # Reference split semantics (run.sh:222-237): the SOURCE speaker trains on
    # the FIRST n_train utterances, the TARGET speaker on the REMAINING tail —
    # disjoint sentence sets, so training is truly non-parallel.  The opposite
    # half of each speaker provides the sentence-parallel counterpart used
    # ONLY for eval-time DTW alignment (train_src_trg / train_trg_src).
    def train_lists():
        src_head, src_tail = split(paths.h5s(spk_src))
        trg_head, trg_tail = split(paths.h5s(spk_trg))
        n_head = min(len(src_head), len(trg_head))
        n_tail = min(len(src_tail), len(trg_tail))
        return {
            "train_src": src_head[:n_head],
            "train_src_pair": trg_head[:n_head],   # same sentences, trg voice
            "train_trg": trg_tail[:n_tail],
            "train_trg_pair": src_tail[:n_tail],   # same sentences, src voice
        }

    if "1" in stages:
        from .features import extract_features
        for spk in speakers:
            sc = _read_spk_conf(conf_dir, spk)
            for eval_set in (False, True):
                wavs = paths.wavs(spk, eval_set)
                if not wavs:
                    continue
                wavdir = None if eval_set else os.path.join(
                    paths.work, "wav_anasyn", spk)
                n_files, n_frames = extract_features(
                    wavs, paths.h5dir(spk, eval_set), wavdir, exp.feature,
                    sc.minf0, sc.maxf0, sc.pow_threshold, n_jobs=n_jobs)
                assert n_files == len(wavs), (n_files, len(wavs))
                logging.info("stage 1 %s eval=%s: %d files %d frames",
                             spk, eval_set, n_files, n_frames)

    if "a" in stages:
        from .stats import spk_stat
        for spk in speakers:
            sugg = spk_stat(paths.h5s(spk), os.path.join(paths.work,
                                                         "init_spk_stat"), spk)
            logging.info("stage a %s suggested conf: %s", spk, sugg)

    if "2" in stages:
        from .stats import calc_stats, calc_stats_joint
        tl = train_lists()
        calc_stats(tl["train_src"], paths.stats(spk_src), spkr=spk_src)
        calc_stats(tl["train_trg"], paths.stats(spk_trg), spkr=spk_trg)
        calc_stats_joint(tl["train_src"], tl["train_trg"], paths.stats_jnt())
        logging.info("stage 2 done: %s", paths.stats_jnt())

    if "3" in stages:
        from .stats import extract_cv_excitation
        # every utterance of each speaker gets converted excitation toward the
        # partner (train + pair + eval sets; reference run.sh stage 3)
        for spk, other in ((spk_src, spk_trg), (spk_trg, spk_src)):
            for eval_set in (False, True):
                files = paths.h5s(spk, eval_set)
                if files:
                    extract_cv_excitation(files, paths.stats(spk),
                                          paths.stats(other), exp.feature.fs,
                                          exp.feature.shiftms)
        logging.info("stage 3 done")

    if "4" in stages:
        from .train_stage import run_train
        tl = train_lists()
        # CYCLEVAE_N_EVAL truncates the per-speaker eval lists — used by
        # tools/ref_headtohead.py to keep the reference trainer's per-epoch
        # eval cost sane over updates-matched schedules (the reference has
        # no eval-subset knob; both sides must see the SAME eval files)
        n_eval = int(os.environ.get("CYCLEVAE_N_EVAL", "0"))
        eval_src = paths.h5s(spk_src, True)
        eval_trg = paths.h5s(spk_trg, True)
        if n_eval > 0:
            eval_src, eval_trg = eval_src[:n_eval], eval_trg[:n_eval]
        summary = run_train(
            exp,
            feats_src=tl["train_src"], feats_src_pair=tl["train_src_pair"],
            feats_trg=tl["train_trg"], feats_trg_pair=tl["train_trg_pair"],
            feats_eval_src=eval_src,
            feats_eval_trg=eval_trg,
            stats_src=paths.stats(spk_src), stats_trg=paths.stats(spk_trg),
            stats_jnt=paths.stats_jnt(), expdir=expdir,
            resume=exp.train.resume)
        logging.info("stage 4 done: best=%s", summary["best"])

    if "5" in stages or "6" in stages or "i" in stages:
        import jax
        from ..vi.checkpoint import load_checkpoint
        from ..vi.train import CycleVAEParams
        from .decode import Codec
        from .train_stage import model_config
        import jax.numpy as jnp

        epoch = decode_epoch
        if epoch is None:
            hist = json.load(open(os.path.join(expdir, "history.json")))
            epoch = hist["best"]["epoch"]
        ckpt = load_checkpoint(os.path.join(expdir, f"checkpoint-{epoch}.pkl"))
        params = jax.tree_util.tree_map(jnp.asarray, ckpt["params"])
        codec = Codec(CycleVAEParams(*params), model_config(exp))
        model_id = f"{exp.name()}_ep{epoch}"

        if "5" in stages:
            from .decode import calc_cvgv
            tl = train_lists()
            out = calc_cvgv(codec, exp, jax.random.PRNGKey(decode_epoch or 0),
                            tl["train_src"], tl["train_trg"],
                            paths.stats(spk_src), model_id)
            logging.info("stage 5 done: %s",
                         {k: v.mean() for k, v in out.items()})

        if "6" in stages:
            from .decode import decode_pair
            sc_src = _read_spk_conf(conf_dir, spk_src)
            sc_trg = _read_spk_conf(conf_dir, spk_trg)
            f0stats = {
                "lf0_mean_src": float(read_hdf5(paths.stats(spk_src), "/lf0_range_mean")),
                "lf0_std_src": float(read_hdf5(paths.stats(spk_src), "/lf0_range_std")),
                "lf0_mean_trg": float(read_hdf5(paths.stats(spk_trg), "/lf0_range_mean")),
                "lf0_std_trg": float(read_hdf5(paths.stats(spk_trg), "/lf0_range_std")),
            }
            gv = {
                "gv_mean_src": read_hdf5(paths.stats(spk_src), "/gv_range_mean")[1:],
                "gv_mean_trg": read_hdf5(paths.stats(spk_trg), "/gv_range_mean")[1:],
                "cvgv_mean": read_hdf5(paths.stats(spk_src), f"/cvgv_mean_{model_id}"),
                "cvgvsrc_mean": read_hdf5(paths.stats(spk_src), f"/cvgvsrc_mean_{model_id}"),
                "cvgvtrg_mean": read_hdf5(paths.stats(spk_src), f"/cvgvtrg_mean_{model_id}"),
            }
            outdir = os.path.join(expdir, f"wav_cv_ep{epoch}")
            wavs_src = paths.wavs(spk_src, eval_set=True)
            wavs_trg = paths.wavs(spk_trg, eval_set=True)
            key = jax.random.PRNGKey(4242)
            pairs = list(zip(wavs_src, wavs_trg))
            keys = jax.random.split(key, len(pairs))
            # producer/consumer pipeline (reference fans whole decodes over
            # n_gpus processes, decode…py:552-602; here one device is shared):
            # analysis prefetches on worker threads (C++ DSP releases the
            # GIL) ahead of the decode pool; decode_pair's device calls
            # serialize inside JAX while the host DSP/metric tails of other
            # pairs run concurrently — device decode of pair i overlaps
            # analysis of i+1.. and synthesis of i-1..
            from concurrent.futures import ThreadPoolExecutor
            from .decode import analyze_pair
            from ..utils.prefetch import BackgroundGenerator

            from collections import deque
            n_workers = max(2, min(n_jobs, 8))
            lookahead = 4
            ana_pool = ThreadPoolExecutor(max_workers=max(1, n_workers // 2))

            def ana_gen():
                # bounded lookahead: at most `lookahead` analyses in flight
                pending = deque()
                for ws, wt in pairs:
                    pending.append(ana_pool.submit(
                        analyze_pair, exp, ws, wt, sc_src.minf0,
                        sc_src.maxf0, sc_trg.minf0, sc_trg.maxf0,
                        sc_src.pow_threshold, sc_trg.pow_threshold))
                    if len(pending) >= lookahead:
                        yield pending.popleft().result()
                while pending:
                    yield pending.popleft().result()

            if os.environ.get("CYCLEVAE_PREFETCH", "1") == "0":
                # sequential baseline (A/B knob for the overlap pipeline):
                # analyze -> decode -> synthesize one pair at a time
                ana_pool.shutdown(wait=False)
                all_metrics = [
                    decode_pair(codec, exp, keys[i], ws, wt, outdir,
                                f0stats, gv, sc_src.minf0, sc_src.maxf0,
                                sc_trg.minf0, sc_trg.maxf0,
                                sc_src.pow_threshold, sc_trg.pow_threshold,
                                analysis=analyze_pair(
                                    exp, ws, wt, sc_src.minf0, sc_src.maxf0,
                                    sc_trg.minf0, sc_trg.maxf0,
                                    sc_src.pow_threshold,
                                    sc_trg.pow_threshold))
                    for i, (ws, wt) in enumerate(pairs)]
            else:
                analyses = BackgroundGenerator(ana_gen(), max_prefetch=2)
                try:
                    with ThreadPoolExecutor(max_workers=n_workers) as syn_pool:
                        futs = []
                        for i, analysis in enumerate(analyses):
                            ws, wt = pairs[i]
                            futs.append(syn_pool.submit(
                                decode_pair, codec, exp, keys[i], ws, wt,
                                outdir, f0stats, gv, sc_src.minf0,
                                sc_src.maxf0, sc_trg.minf0, sc_trg.maxf0,
                                sc_src.pow_threshold, sc_trg.pow_threshold,
                                analysis=analysis))
                        all_metrics = [f.result() for f in futs]
                finally:
                    ana_pool.shutdown(wait=False, cancel_futures=True)
            agg = {k: float(np.mean([m[k] for m in all_metrics]))
                   for k in all_metrics[0]}
            agg_std = {f"{k}_std": float(np.std([m[k] for m in all_metrics]))
                       for k in all_metrics[0]}
            agg.update(agg_std)
            with open(os.path.join(expdir, f"decode_metrics_ep{epoch}.json"),
                      "w") as f:
                json.dump(agg, f, indent=2)
            logging.info("stage 6 done: %s", {k: round(v, 3)
                                              for k, v in agg.items()})

        if "i" in stages:
            # posterior-inference stage (no reference counterpart): HMC
            # posterior over eval utterance latents + posterior-predictive
            # conversion stats written to posterior.h5
            from .infer_stage import run_infer_stage
            out_h5 = os.path.join(expdir, f"posterior_ep{epoch}.h5")
            res = run_infer_stage(codec.params, codec.cfg,
                                  paths.h5s(spk_src, True)[:4], out_h5)
            logging.info("stage i done: %s", res)

    if "v" in stages:
        # neural-vocoder stage (the reference defines the data surface,
        # FeatureDatasetNeuVoco dataset.py:495-563, but ships no trainer):
        # train the target speaker's WaveRNN on its train wav/feature pairs,
        # then score copy-synthesis on held-out eval utterances
        import json as _json

        from ..models.wavernn import WaveRNNConfig
        from .vocoder_stage import eval_copy_synthesis, run_train_vocoder
        if vocoder_multispk:
            # pool BOTH speakers' full train+pair sets (2 x 81 utts here)
            # under one-hot speaker-code conditioning: the single-speaker
            # model was data-limited at ~4 min of speech (VERDICT r2 #5)
            spks = [spk_src, spk_trg]
            vcfg = WaveRNNConfig(hidden_units=vocoder_hidden_units,
                                 n_spk=len(spks))
            wavs, h5s, spk_ids = [], [], []
            for si, spk in enumerate(spks):
                w = paths.wavs(spk)
                h = paths.h5s(spk)
                assert len(w) == len(h) and w, "run stages 0-1 first"
                wavs += w
                h5s += h
                spk_ids += [si] * len(w)
            vexpdir = os.path.join(
                paths.work, "exp",
                f"vocoder_multispk_hu{vcfg.hidden_units}")
            res = run_train_vocoder(vcfg, wavs, h5s, vexpdir,
                                    epochs=vocoder_epochs,
                                    clip_frames=vocoder_clip_frames,
                                    resume=vocoder_resume,
                                    spk_ids=spk_ids,
                                    lr_decay=vocoder_lr_decay)
            aggs = {}
            for si, spk in enumerate(spks):
                if vocoder_n_eval <= 0:
                    continue
                sc = _read_spk_conf(conf_dir, spk)
                aggs[spk] = eval_copy_synthesis(
                    res["params"], vcfg, exp,
                    paths.wavs(spk, eval_set=True)[:vocoder_n_eval], sc,
                    os.path.join(vexpdir, f"wav_vocoded_{spk}"),
                    temperature=vocoder_temperature, spk_id=si)
            with open(os.path.join(vexpdir, "vocoder_eval.json"), "w") as f:
                _json.dump({"speakers": spks, "epochs": vocoder_epochs,
                            "final_nll": res["history"][-1]["nll"],
                            "copy_synthesis": aggs}, f, indent=2)
            logging.info("stage v done (multispk): %s",
                         {s: {k: round(v, 3) for k, v in a.items()}
                          for s, a in aggs.items()})
        else:
            vcfg = WaveRNNConfig(hidden_units=vocoder_hidden_units)
            sc = _read_spk_conf(conf_dir, spk_trg)
            wavs = paths.wavs(spk_trg)[:paths.n_train]
            h5s = paths.h5s(spk_trg)[:paths.n_train]
            assert len(wavs) == len(h5s) and wavs, "run stages 0-1 first"
            vexpdir = os.path.join(paths.work, "exp",
                                   f"vocoder_{spk_trg}_hu{vcfg.hidden_units}")
            res = run_train_vocoder(vcfg, wavs, h5s, vexpdir,
                                    epochs=vocoder_epochs,
                                    clip_frames=vocoder_clip_frames,
                                    resume=vocoder_resume,
                                    lr_decay=vocoder_lr_decay)
            agg = eval_copy_synthesis(res["params"], vcfg, exp,
                                      paths.wavs(spk_trg, eval_set=True)[:vocoder_n_eval],
                                      sc,
                                      os.path.join(vexpdir, "wav_vocoded"),
                                      temperature=vocoder_temperature)
            with open(os.path.join(vexpdir, "vocoder_eval.json"), "w") as f:
                _json.dump({"speaker": spk_trg, "epochs": vocoder_epochs,
                            "final_nll": res["history"][-1]["nll"],
                            "copy_synthesis": agg}, f, indent=2)
            logging.info("stage v done: %s", {k: round(v, 3)
                                              for k, v in agg.items()})


def main(argv=None):
    p = argparse.ArgumentParser(prog="cyclevae_tpu",
                                description="TPU-native CycleVAE VC recipe")
    p.add_argument("--stage", default="123456", help="stages to run (e.g. 1a23456)")
    p.add_argument("--wav-root", default="/root/reference/egs/one-to-one/wav")
    p.add_argument("--work", required=True, help="output working directory")
    p.add_argument("--config", default=None, help="experiment config json")
    p.add_argument("--conf-dir", default=None, help="dir with <spk>.f0/<spk>.pow")
    p.add_argument("--n-jobs", type=int, default=8)
    p.add_argument("--n-train", type=int, default=40)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--decode-epoch", type=int, default=None)
    p.add_argument("--resume", default=None,
                   help="checkpoint path to resume stage-4 training from")
    p.add_argument("--vocoder-epochs", type=int, default=300)
    p.add_argument("--vocoder-clip-frames", type=int, default=96)
    p.add_argument("--vocoder-n-eval", type=int, default=5)
    p.add_argument("--vocoder-hidden-units", type=int, default=896)
    p.add_argument("--vocoder-resume", default=None)
    p.add_argument("--vocoder-temperature", type=float, default=0.8,
                   help="sampling temperature (0.8 = measured sweet spot)")
    p.add_argument("--vocoder-multispk", action="store_true",
                   help="pool both speakers' train+pair sets under one-hot "
                        "speaker-code conditioning (one shared model)")
    p.add_argument("--vocoder-lr-decay", action="store_true",
                   help="cosine lr decay to lr/10 over the run")
    args = p.parse_args(argv)

    exp = load_config(args.config) if args.config else ExperimentConfig()
    if args.epochs is not None:
        exp.train.epoch_count = args.epochs
    if args.resume is not None:
        exp.train.resume = args.resume
    paths = RecipePaths(wav_root=args.wav_root, work=args.work,
                        n_train=args.n_train)
    run_stages(args.stage, exp, paths, conf_dir=args.conf_dir,
               n_jobs=args.n_jobs, decode_epoch=args.decode_epoch,
               vocoder_epochs=args.vocoder_epochs,
               vocoder_clip_frames=args.vocoder_clip_frames,
               vocoder_n_eval=args.vocoder_n_eval,
               vocoder_hidden_units=args.vocoder_hidden_units,
               vocoder_resume=args.vocoder_resume,
               vocoder_temperature=args.vocoder_temperature,
               vocoder_multispk=args.vocoder_multispk,
               vocoder_lr_decay=args.vocoder_lr_decay)


if __name__ == "__main__":
    main()
