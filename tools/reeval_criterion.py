"""Recompute the best-epoch criterion for saved checkpoints of an experiment.

Round-1 runs selected the best epoch with a criterion POOLED over both
conversion directions; the reference uses only the src->trg direction
(reference train_gru_cyclevae_gauss_batch.py:1153).  This tool replays the
(deterministic) eval epoch for every saved checkpoint, computes BOTH criteria,
writes criteria.json into the expdir, and patches history.json's "best" to the
src-only winner so a resumed run tracks best consistently.

Usage: python tools/reeval_criterion.py --work /tmp/vcwork --config exp.json
"""

import argparse
import glob
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--work", required=True)
    p.add_argument("--config", required=True)
    p.add_argument("--wav-root", default="/root/reference/egs/one-to-one/wav")
    p.add_argument("--n-train", type=int, default=40)
    p.add_argument("--patch-history", action="store_true")
    args = p.parse_args()

    from cyclevae_tpu import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from cyclevae_tpu.utils.config import load_config
    from cyclevae_tpu.utils.hdf5 import read_hdf5
    from cyclevae_tpu.vi.checkpoint import load_checkpoint
    from cyclevae_tpu.vi.train import CycleVAEParams, make_eval_forward
    from cyclevae_tpu.pipeline.train_stage import model_config, _utt_eval_metrics
    from cyclevae_tpu.pipeline.dataset import SingleVAEDataset, make_batch
    from cyclevae_tpu.pipeline.recipe import RecipePaths

    exp = load_config(args.config)
    cfg = model_config(exp)
    tcfg = exp.train
    paths = RecipePaths(wav_root=args.wav_root, work=args.work,
                        n_train=args.n_train)
    expdir = os.path.join(args.work, "exp", exp.name())
    spk_src, spk_trg = exp.model.spk_src, exp.model.spk_trg

    gv_trg_mean = read_hdf5(paths.stats(spk_trg), "/gv_range_mean")[1:]
    gv_src_mean = read_hdf5(paths.stats(spk_src), "/gv_range_mean")[1:]
    eval_src_ds = SingleVAEDataset(paths.h5s(spk_src, True),
                                   paths.h5s(spk_trg, True), spk_src)
    eval_trg_ds = SingleVAEDataset(paths.h5s(spk_trg, True),
                                   paths.h5s(spk_src, True), spk_src)
    eval_fn = make_eval_forward(cfg)

    ckpts = sorted(
        ((int(m.group(1)), f) for f in glob.glob(
            os.path.join(expdir, "checkpoint-*.pkl"))
         if (m := re.match(r".*checkpoint-(\d+)\.pkl$", f))),
    )
    results = []
    from concurrent.futures import ThreadPoolExecutor
    for epoch, ck in ckpts:
        params = CycleVAEParams(*jax.tree_util.tree_map(
            jnp.asarray, load_checkpoint(ck)["params"]))
        # exact eval-epoch replay: same key schedule as run_train
        key_eval = jax.random.PRNGKey(tcfg.seed + 10007 * epoch)
        ev = []
        for ds in (eval_src_ds, eval_trg_ds):
            for b0 in range(0, len(ds), tcfg.batch_size_utt_eval):
                utts = [ds[i] for i in
                        range(b0, min(b0 + tcfg.batch_size_utt_eval, len(ds)))]
                batch, _ = make_batch(utts, tcfg.batch_size)
                jb = {k: jnp.asarray(v) for k, v in batch.items()}
                outs = jax.tree_util.tree_map(
                    np.asarray, eval_fn(params, key_eval, jb))
                def one(j_utt):
                    j, utt = j_utt
                    gv_t = gv_trg_mean if utt.is_src_speaker else gv_src_mean
                    m = _utt_eval_metrics(cfg, utt, outs, j, gv_t)
                    m["is_src"] = float(utt.is_src_speaker)
                    return m
                with ThreadPoolExecutor(max_workers=8) as ex:
                    ev.extend(ex.map(one, list(enumerate(utts))))
        def crit(sel):
            pw = np.array([m["mcdpow_cv"] for m in sel])
            mc = np.array([m["mcd_cv"] for m in sel])
            return float(pw.mean() + pw.std() + mc.mean() + mc.std())
        src_sel = [m for m in ev if m["is_src"] > 0]
        row = {"epoch": epoch, "criterion_src": crit(src_sel),
               "criterion_pooled": crit(ev)}
        results.append(row)
        print(json.dumps(row), flush=True)

    best = min(results, key=lambda r: r["criterion_src"])
    out = {"results": results, "best_src": best}
    with open(os.path.join(expdir, "criteria.json"), "w") as f:
        json.dump(out, f, indent=2)
    print("best (src-only):", best)

    if args.patch_history:
        hp = os.path.join(expdir, "history.json")
        with open(hp) as f:
            hist = json.load(f)
        hist["best"] = {"criterion": best["criterion_src"],
                        "epoch": best["epoch"]}
        with open(hp, "w") as f:
            json.dump(hist, f, indent=2)
        print("patched", hp)


if __name__ == "__main__":
    main()
