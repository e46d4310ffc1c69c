"""Train the WaveRNN-class neural vocoder on one speaker's natural
wav/feature pairs, then measure copy-synthesis quality on held-out eval
utterances: re-analyze the vocoded waveform and report DTW MCD vs the
original mel-cepstra plus voiced-F0 relative error.

The reference defines the vocoder data surface (FeatureDatasetNeuVoco,
dataset.py:495-563) but ships no trainer or quality metric; this completes
the loop (TODO "vocoder quality eval").

Usage:
  python tools/train_eval_vocoder.py --work /tmp/vcwork2 --speaker VCC2TF1 \
      --epochs 60 --n-train 40 --n-eval 5 --out /tmp/vocoder_eval.json
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--work", required=True)
    p.add_argument("--speaker", default="VCC2TF1")
    p.add_argument("--wav-root", default="/root/reference/egs/one-to-one/wav")
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--n-train", type=int, default=40)
    p.add_argument("--n-eval", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--clip-frames", type=int, default=24)
    p.add_argument("--hidden-units", type=int, default=896)
    p.add_argument("--eval-only", action="store_true",
                   help="skip training; evaluate checkpoint-latest.pkl")
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--lr-decay", action="store_true",
                   help="cosine-decay the lr to lr/10 over the run")
    p.add_argument("--resume", default=None,
                   help="checkpoint to resume training from")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    from cyclevae_tpu import enable_compilation_cache
    enable_compilation_cache()
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
        datefmt="%m/%d/%Y %I:%M:%S")

    from cyclevae_tpu.models.wavernn import WaveRNNConfig
    from cyclevae_tpu.pipeline.recipe import RecipePaths, _read_spk_conf
    from cyclevae_tpu.pipeline.vocoder_stage import (eval_copy_synthesis,
                                                     run_train_vocoder)
    from cyclevae_tpu.utils.config import ExperimentConfig

    spk = args.speaker
    paths = RecipePaths(wav_root=args.wav_root, work=args.work,
                        n_train=args.n_train)
    exp = ExperimentConfig()
    sc = _read_spk_conf(None, spk)

    wavs = paths.wavs(spk)[:args.n_train]
    feats = paths.h5s(spk)[:args.n_train]
    assert len(wavs) == len(feats) and wavs, "run stages 1-2 first"

    cfg = WaveRNNConfig(hidden_units=args.hidden_units)
    expdir = os.path.join(args.work, "exp", f"vocoder_{spk}_hu{cfg.hidden_units}")
    if args.eval_only:
        import jax
        import jax.numpy as jnp

        from cyclevae_tpu.vi.checkpoint import latest_checkpoint, load_checkpoint
        ckpt = load_checkpoint(latest_checkpoint(expdir))
        params = jax.tree_util.tree_map(jnp.asarray, ckpt["params"])
        final_nll = float("nan")
    else:
        res = run_train_vocoder(cfg, wavs, feats, expdir, epochs=args.epochs,
                                batch_size=args.batch_size,
                                clip_frames=args.clip_frames,
                                lr_decay=args.lr_decay,
                                resume=args.resume)
        params = res["params"]
        final_nll = res["history"][-1]["nll"]

    # --- copy-synthesis quality on held-out eval utterances ---------------
    eval_wavs = paths.wavs(spk, eval_set=True)[:args.n_eval]
    agg = eval_copy_synthesis(params, cfg, exp, eval_wavs, sc,
                              os.path.join(expdir, "wav_vocoded"),
                              temperature=args.temperature)
    summary = {"speaker": spk, "epochs": args.epochs,
               "final_nll": final_nll,
               "n_eval": len(eval_wavs), "temperature": args.temperature,
               "copy_synthesis": agg}
    out_path = args.out or os.path.join(expdir, "vocoder_eval.json")
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)
    logging.info("vocoder eval: %s", json.dumps(summary))


if __name__ == "__main__":
    main()
