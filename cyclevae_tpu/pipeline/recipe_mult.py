"""Many-to-many recipe driver.

The reference defines the many-to-many data surface but ships no recipe for
it (SURVEY.md §2.2 — the training binary lives in the successor repo).  This
driver completes it end-to-end on top of the same per-speaker feature/stats
artifacts as the one-to-one recipe:

  stage 3m  per-partner converted excitation (/cvuvlogf0fil_ap_<spk>)
  stage 4m  N-speaker CycleVAE training (random conversion pair per cycle)
  stage 5m  per-direction GV calibration (N·N batched directions/utterance)
  stage 6m  eval decode over every ordered direction + interpolation demo
            (runs 5m inline first if the model is uncalibrated)

Usage:
  python -m cyclevae_tpu.pipeline.recipe_mult --work /path/to/work \
      --src-speakers VCC2SF1 --trg-speakers VCC2TF1 VCC2TF2 --stage 34
(stages 1/2 are shared with the one-to-one recipe: run them per speaker
first with `python -m cyclevae_tpu --stage 12`.)
"""

from __future__ import annotations

import argparse
import logging
import os
from typing import List

from ..utils.config import ExperimentConfig, load_config
from .recipe import RecipePaths


def run_mult_stages(stages: str, exp: ExperimentConfig, paths: RecipePaths,
                    spk_src_list: List[str], spk_trg_list: List[str]):
    from .. import enable_compilation_cache
    enable_compilation_cache()
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
        datefmt="%m/%d/%Y %I:%M:%S")
    all_spk = list(spk_src_list) + list(spk_trg_list)

    if "3" in stages:
        from .stats import extract_cv_excitation_mult
        for spk in all_spk:
            partners = {s: paths.stats(s) for s in all_spk if s != spk}
            for eval_set in (False, True):
                files = paths.h5s(spk, eval_set)
                if files:
                    extract_cv_excitation_mult(files, paths.stats(spk),
                                               partners, exp.feature.fs,
                                               exp.feature.shiftms)
        logging.info("stage 3m done")

    if "4" in stages:
        from .stats import calc_stats_joint
        from .train_stage_mult import run_train_mult
        # joint stats across ALL speakers' train halves
        train_files, eval_files = [], []
        for spk in all_spk:
            train_files += paths.h5s(spk)[:paths.n_train]
            eval_files += paths.h5s(spk, True)
        stats_jnt = os.path.join(paths.work, "stats", "stats_jnt_mult.h5")
        calc_stats_joint(train_files, [], stats_jnt)
        expdir = os.path.join(paths.work, "exp", exp.name() + "_m2m")
        summary = run_train_mult(exp, train_files, eval_files, spk_src_list,
                                 spk_trg_list, stats_jnt, expdir)
        logging.info("stage 4m done: %d epochs", len(summary["history"]))

    if "5" in stages or "6" in stages:
        import json

        import jax
        import jax.numpy as jnp

        from ..vi.checkpoint import load_checkpoint
        from ..vi.train import CycleVAEParams
        from .decode import Codec
        from .train_stage import model_config

        expdir = os.path.join(paths.work, "exp", exp.name() + "_m2m")
        hist = json.load(open(os.path.join(expdir, "history.json")))
        epoch = hist["best"]["epoch"]
        ckpt = load_checkpoint(os.path.join(expdir,
                                            f"checkpoint-{epoch}.pkl"))
        params = jax.tree_util.tree_map(jnp.asarray, ckpt["params"])
        codec = Codec(CycleVAEParams(*params), model_config(exp))
        model_id = f"{exp.name()}_m2m_ep{epoch}"

    if "5" in stages:
        # stage 5m: per-direction GV calibration over training data
        from .decode_mult import calc_cvgv_mult
        calc_cvgv_mult(codec, paths, all_spk, model_id,
                       key=jax.random.PRNGKey(5))
        logging.info("stage 5m done")

    if "6" in stages:
        # m2m eval decode: every ordered speaker direction over the parallel
        # eval sets, DTW MCD vs the target utterance (one-to-one stage-6
        # metric contract on the N-speaker path) + interpolation demo decode
        import numpy as np

        from .decode_mult import (calc_cvgv_mult, decode_to_speaker,
                                  eval_pair_mult, load_cvgv_mult)

        if load_cvgv_mult(paths, all_spk[0], all_spk[-1], model_id) is None:
            # decode alone on an uncalibrated model: run stage 5m inline so
            # the GV postfilter uses the corpus-calibrated per-direction
            # stats rather than the utterance-level fallback
            calc_cvgv_mult(codec, paths, all_spk, model_id,
                           key=jax.random.PRNGKey(5))
        outdir = os.path.join(expdir, f"wav_m2m_ep{epoch}")

        key = jax.random.PRNGKey(4242)
        per_dir: dict = {}
        for src_spk in all_spk:
            for trg_spk in all_spk:
                if trg_spk == src_spk:
                    continue
                pairs = list(zip(paths.wavs(src_spk, eval_set=True),
                                 paths.wavs(trg_spk, eval_set=True)))
                mets = []
                for i, (ws, wt) in enumerate(pairs):
                    key, k1 = jax.random.split(key)
                    mets.append(eval_pair_mult(
                        codec, exp, paths, ws, wt, src_spk, trg_spk,
                        all_spk, outdir=outdir if i < 3 else None, key=k1,
                        model_id=model_id))
                if not mets:  # no eval wavs for this direction
                    continue
                per_dir[f"{src_spk}-{trg_spk}"] = {
                    k: float(np.mean([m[k] for m in mets]))
                    for k in mets[0]}
                per_dir[f"{src_spk}-{trg_spk}"].update({
                    f"{k}_std": float(np.std([m[k] for m in mets]))
                    for k in mets[0]})

        # interpolation demo: first eval utterance of the first source
        # speaker swept through speaker space (reference has no counterpart;
        # BASELINE.json north-star config 5)
        demo_wav = paths.wavs(all_spk[0], eval_set=True)[0]
        for w0 in (0.75, 0.5, 0.25):
            decode_to_speaker(codec, exp, paths, demo_wav, all_spk[0],
                              all_spk, [w0, 1.0 - w0] + [0.0] *
                              (len(all_spk) - 2), outdir)

        if not per_dir:  # no ordered direction had eval wavs
            logging.warning("stage 6m: no eval pairs in any direction; "
                            "skipping decode_metrics aggregate")
            return
        overall = {k: float(np.mean([d[k] for d in per_dir.values()]))
                   for k in next(iter(per_dir.values()))
                   if not k.endswith("_std")}
        agg = {"per_direction": per_dir, "overall": overall,
               "epoch": epoch}
        with open(os.path.join(expdir,
                               f"decode_metrics_m2m_ep{epoch}.json"),
                  "w") as f:
            json.dump(agg, f, indent=2)
        logging.info("stage 6m done: overall %s",
                     {k: round(v, 3) for k, v in overall.items()})


def main(argv=None):
    p = argparse.ArgumentParser(prog="cyclevae_tpu.recipe_mult")
    p.add_argument("--stage", default="34")
    p.add_argument("--work", required=True)
    p.add_argument("--src-speakers", nargs="+", required=True)
    p.add_argument("--trg-speakers", nargs="+", required=True)
    p.add_argument("--config", default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--n-train", type=int, default=40)
    p.add_argument("--wav-root", default="/root/reference/egs/one-to-one/wav",
                   help="corpus root (stage 6 eval decode reads eval wavs)")
    args = p.parse_args(argv)
    exp = load_config(args.config) if args.config else ExperimentConfig()
    if args.epochs is not None:
        exp.train.epoch_count = args.epochs
    exp.model.n_spk = len(args.src_speakers) + len(args.trg_speakers)
    paths = RecipePaths(wav_root=args.wav_root, work=args.work,
                        n_train=args.n_train)
    run_mult_stages(args.stage, exp, paths, args.src_speakers,
                    args.trg_speakers)


if __name__ == "__main__":
    main()
