"""Render the head-to-head artifact (tools/ref_headtohead.py) as PARITY rows.

Reads HEADTOHEAD.json (reference = the ACTUAL PyTorch trainer
/root/reference/src/bin/train_gru_cyclevae_gauss_batch.py run on CPU; ours =
cyclevae_tpu stage 4 on the identical feature store) and emits an
updates-matched trajectory table plus a pass/fail parity call.

Epoch semantics (discovered in the first 20v20 run): the reference's
train_generator consumes ONE batch_size_utt utterance batch per "epoch"
(c_idx>0 break, train...py:141-144), so our full-pass epoch e corresponds to
reference epochs ((e-1)*R, e*R] with R = 2*n_train/bsu.  Each of our rows is
therefore compared against the MEAN of the R reference epochs that cover the
same update range (the reference re-evals after every 5-utterance batch; its
per-epoch eval numbers are noisy single-batch snapshots, the R-epoch mean is
the fair trajectory estimate — we also show the ref epoch at the boundary).

Metric mapping (both sides eval with sampled z, no dropout, and the SAME
C++ DTW kernels — the reference run literally imports our dsp/native/dtw.cc
via the dtw_c shim):
  ours mcdpow_rec_mean (pooled src+trg recon)  <-> ref (mcdpow_src_src +
                                                        mcdpow_trg_trg)/2
  ours mcdpow_cv_mean  (pooled conversions)    <-> ref (mcdpow_src_trg +
                                                        mcdpow_trg_src)/2
  criterion (src->trg only, reference train...py:1153):
      mcdpow_src_trg_mean + std + mcd_src_trg_mean + std — identical
      formula on both sides (ours: pipeline/train_stage.py:232-239).

Usage: python tools/headtohead_report.py /tmp/refrun_matched/HEADTOHEAD.json
"""
from __future__ import annotations

import json
import math
import sys


def ref_criterion(e: dict) -> float:
    return (e["eval_mcdpow_src_trg"] + e["eval_mcdpow_src_trg_std"]
            + e["eval_mcd_src_trg"] + e["eval_mcd_src_trg_std"])


def main(path: str) -> None:
    with open(path) as f:
        d = json.load(f)
    cfg = d["config"]
    cfg.setdefault("n_eval", 0)
    cfg.setdefault("ref_epochs", "?")
    assert (2 * cfg["n_train"]) % cfg["batch_size_utt"] == 0, (
        "batch_size_utt must divide 2*n_train or the updates-matched epoch "
        "mapping drifts (floor truncation)")
    R = 2 * cfg["n_train"] // cfg["batch_size_utt"]
    ours = d["ours"]["history"]
    ref = {e["epoch"]: e for e in d.get("reference", [])}
    n_ref = len(ref)
    print(f"config: hu{cfg['hidden_units']} bsu{cfg['batch_size_utt']} "
          f"lr{cfg['lr']} n_train={cfg['n_train']}/spk "
          f"n_eval={cfg['n_eval']}/spk; ours {len(ours)} full-pass epochs, "
          f"ref {n_ref}/{cfg['ref_epochs']} single-batch epochs "
          f"(R={R} ref epochs per ours epoch)\n")

    hdr = ("| ours ep (ref eps) | rec MCDpow ours / ref | "
           "cv MCDpow ours / ref | criterion ours / ref |")
    print(hdr)
    print("|---|---|---|---|")
    rows = []
    for h in ours:
        e = h["epoch"]
        lo, hi = (e - 1) * R + 1, e * R
        span = [ref[i] for i in range(lo, hi + 1) if i in ref]
        o_rec = h["eval"]["mcdpow_rec_mean"]
        o_cv = h["eval"]["mcdpow_cv_mean"]
        o_cri = h["eval"]["criterion"]
        if span:
            r_rec = sum((x["eval_mcdpow_src_src"] + x["eval_mcdpow_trg_trg"])
                        / 2 for x in span) / len(span)
            r_cv = sum((x["eval_mcdpow_src_trg"] + x["eval_mcdpow_trg_src"])
                       / 2 for x in span) / len(span)
            r_cri = sum(ref_criterion(x) for x in span) / len(span)
            rows.append((e, o_rec, r_rec, o_cv, r_cv, o_cri, r_cri))
            print(f"| {e} ({lo}-{hi}) | {o_rec:.2f} / {r_rec:.2f} | "
                  f"{o_cv:.2f} / {r_cv:.2f} | {o_cri:.2f} / {r_cri:.2f} |")
        else:
            print(f"| {e} ({lo}-{hi}) | {o_rec:.2f} / — | {o_cv:.2f} / — | "
                  f"{o_cri:.2f} / — |")

    if not rows:
        print("\n(no overlapping reference epochs yet)")
        return

    # Parity call on the second half of the overlapping trajectory (both
    # sides past the fast transient), plus best-epoch criterion.
    tail = rows[len(rows) // 2:]
    d_rec = [o - r for (_, o, r, *_rest) in tail]
    d_cv = [row[3] - row[4] for row in tail]
    mean_d_rec = sum(d_rec) / len(d_rec)
    mean_d_cv = sum(d_cv) / len(d_cv)
    # Monte-Carlo scale: per-epoch eval MCD std across utterances / sqrt(n),
    # from our artifact (both speakers pooled => n = 2*n_eval)
    n_utt = 2 * cfg["n_eval"] if cfg["n_eval"] else 2 * 35
    mc = ours[-1]["eval"]["mcdpow_cv_std"] / math.sqrt(n_utt)
    # Best-criterion comparison at MATCHED granularity: ours' best over its
    # full-pass evals vs the reference's best over the R-epoch BLOCK MEANS
    # covering the same update ranges.  Minimizing the reference over all
    # single-batch snapshots (16x more, much noisier draws) would bias it
    # low — we report that raw min too, but the call uses block means.
    o_best = min(r[5] for r in rows)
    r_best_block = min(r[6] for r in rows)
    r_best_snap = min(ref_criterion(x) for x in ref.values())
    print(f"\nsecond-half trajectory deltas (ours - ref): "
          f"rec {mean_d_rec:+.3f} dB, cv {mean_d_cv:+.3f} dB "
          f"(per-epoch Monte-Carlo scale ±{mc:.3f} dB at n={n_utt} utts)")
    print(f"best criterion (matched granularity): ours {o_best:.3f} vs ref "
          f"block-mean {r_best_block:.3f} ({o_best - r_best_block:+.3f}); "
          f"[ref raw single-batch-snapshot min {r_best_snap:.3f} — noisier, "
          f"biased low, not comparable]")
    if mean_d_cv < -2 * mc:
        call = "PASS (ours strictly better)"
    elif mean_d_cv <= 2 * mc + 1e-9:
        call = "PASS"
    else:
        call = "FAIL"
    print(f"parity call (cv MCD within 2x MC error, or better): {call}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "/tmp/refrun_matched/HEADTOHEAD.json")
