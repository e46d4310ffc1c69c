"""headtohead_report renders updates-matched rows and a correct parity call.

The head-to-head artifact (tools/ref_headtohead.py) is the round-4 direct
evidence vs the ACTUAL reference trainer; this locks the report math — the
R = 2*n_train/bsu epoch mapping, the ref-epoch-span averaging, and the
pass/fail call — against a tiny synthetic artifact with known numbers.
"""

import json
import subprocess
import sys
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_artifact(tmp_path, ours_cv, ref_cv):
    """Two ours epochs (R=2 ref epochs each) with constant rec metrics."""
    ours_hist = []
    for e, cv in enumerate(ours_cv, 1):
        ours_hist.append({
            "epoch": e,
            "train": {},
            "eval": {"mcdpow_rec_mean": 7.0, "mcd_rec_mean": 6.0,
                     "mcdpow_cv_mean": cv, "mcdpow_cv_std": 0.4,
                     "mcd_cv_mean": cv - 1.0, "mcd_cv_std": 0.3,
                     "criterion": cv + 0.4 + (cv - 1.0) + 0.3},
        })
    ref_hist = []
    for i, cv in enumerate(ref_cv, 1):
        ref_hist.append({
            "epoch": i,
            "eval_mcdpow_src_src": 7.5, "eval_mcdpow_trg_trg": 7.5,
            "eval_mcdpow_src_trg": cv, "eval_mcdpow_src_trg_std": 0.4,
            "eval_mcd_src_trg": cv - 1.0, "eval_mcd_src_trg_std": 0.3,
            "eval_mcdpow_trg_src": cv,
        })
    art = {
        "config": {"hidden_units": 16, "epochs": len(ours_cv),
                   "ref_epochs": len(ref_cv), "n_eval": 2, "n_train": 2,
                   "batch_size_utt": 2, "lr": 1e-4, "n_cyc": 2,
                   "batch_size": 80, "spk_src": "A", "spk_trg": "B"},
        "ours": {"history": ours_hist},
        "reference": ref_hist,
    }
    p = tmp_path / "HEADTOHEAD.json"
    p.write_text(json.dumps(art))
    return str(p)


def run_report(path):
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "headtohead_report.py"),
         path], capture_output=True, text=True, check=True)
    return out.stdout


def test_matched_rows_average_ref_span(tmp_path):
    # R = 2*2/2 = 2 ref epochs per ours epoch; ref epochs (3,4) avg 9.0
    path = make_artifact(tmp_path, ours_cv=[10.0, 9.0],
                         ref_cv=[11.0, 10.0, 9.5, 8.5])
    out = run_report(path)
    assert "| 1 (1-2) |" in out and "| 2 (3-4) |" in out
    assert "9.00 / 9.00" in out          # ours ep2 cv vs ref (9.5+8.5)/2
    assert "PASS" in out


def test_fail_when_ours_clearly_worse(tmp_path):
    path = make_artifact(tmp_path, ours_cv=[12.0, 12.0],
                         ref_cv=[9.0, 9.0, 9.0, 9.0])
    out = run_report(path)
    assert "FAIL" in out


def test_partial_reference_does_not_crash(tmp_path):
    path = make_artifact(tmp_path, ours_cv=[10.0, 9.0], ref_cv=[11.0])
    out = run_report(path)
    assert "/ —" in out  # unmatched rows rendered with a dash
