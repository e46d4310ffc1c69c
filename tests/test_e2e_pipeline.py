"""End-to-end recipe integrity on synthetic speech (stages 1-6, tiny model).

The reference has no CI analogue (SURVEY.md §4); this is the framework's
pipeline-contract test: every stage consumes the previous stage's artifacts
through the real drivers, on CPU, in under ~2 minutes.
"""

import json
import os

import numpy as np
import pytest

from cyclevae_tpu.utils.config import ExperimentConfig, FeatureConfig, ModelConfig, TrainConfig
from cyclevae_tpu.utils.wavio import write_wav

FS = 22050


def synth_speechlike(f0, dur, seed, fs=FS):
    """Sawtooth source + two moving formant resonators + breath noise."""
    rng = np.random.default_rng(seed)
    n = int(dur * fs)
    t = np.arange(n) / fs
    f0_t = f0 * (1.0 + 0.05 * np.sin(2 * np.pi * 2.0 * t))
    ph = np.cumsum(f0_t) / fs
    src = 2.0 * (ph % 1.0) - 1.0
    from scipy.signal import lfilter
    f1 = 600 + 200 * np.sin(2 * np.pi * 1.3 * t)
    out = np.zeros(n)
    # time-varying single-pole resonators applied blockwise
    blk = 2048
    for s in range(0, n, blk):
        e = min(s + blk, n)
        for fc, bw in ((np.mean(f1[s:e]), 120.0), (1800.0, 200.0)):
            r = np.exp(-np.pi * bw / fs)
            th = 2 * np.pi * fc / fs
            b, a = [1 - r], [1, -2 * r * np.cos(th), r * r]
            out[s:e] += lfilter(b, a, src[s:e])
    out += 0.01 * rng.normal(size=n)
    # amplitude envelope with silence at edges
    env = np.minimum(1.0, np.maximum(0.0, np.sin(np.pi * t / dur) * 1.5))
    return out * env * 8000.0


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("wavroot")
    for spk, f0 in (("SPKA", 120.0), ("SPKB", 220.0)):
        for d in (root / spk, root / "eval" / spk):
            os.makedirs(d, exist_ok=True)
        for i in range(3):
            write_wav(str(root / spk / f"u{i}.wav"), FS,
                      synth_speechlike(f0 * (1 + 0.1 * i), 1.0, seed=i))
        write_wav(str(root / "eval" / spk / "e0.wav"), FS,
                  synth_speechlike(f0 * 1.05, 1.0, seed=99))
    return root


def test_full_recipe(corpus, tmp_path):
    from cyclevae_tpu.pipeline.recipe import (
        DEFAULT_SPEAKERS, RecipePaths, SpeakerConf, run_stages)

    DEFAULT_SPEAKERS["SPKA"] = SpeakerConf(70.0, 400.0, -25.0)
    DEFAULT_SPEAKERS["SPKB"] = SpeakerConf(100.0, 500.0, -25.0)

    exp = ExperimentConfig(
        feature=FeatureConfig(),
        model=ModelConfig(hidden_units=16, n_cyc=1, spk_src="SPKA",
                          spk_trg="SPKB"),
        train=TrainConfig(batch_size=40, batch_size_utt=2,
                          batch_size_utt_eval=2, epoch_count=1, lr=1e-3),
    )
    paths = RecipePaths(wav_root=str(corpus), work=str(tmp_path / "work"),
                        n_train=2)
    run_stages("1a23456", exp, paths, n_jobs=2)

    expdir = os.path.join(paths.work, "exp", exp.name())
    hist = json.load(open(os.path.join(expdir, "history.json")))
    assert hist["best"]["epoch"] == 1
    assert np.isfinite(hist["history"][0]["train"]["loss"])
    dm = json.load(open(os.path.join(expdir, "decode_metrics_ep1.json")))
    assert np.isfinite(dm["mcdpow_cv"])
    wavs = os.listdir(os.path.join(expdir, "wav_cv_ep1"))
    # 8 variants per eval utterance, 1 eval utterance per speaker pair
    assert len([w for w in wavs if w.endswith(".wav")]) == 8

    # stage v (neural-vocoder training), train-only: AR generation is too
    # slow for CPU CI, so n_eval=0 exercises the stage wiring + artifacts
    run_stages("v", exp, paths, vocoder_epochs=1, vocoder_clip_frames=8,
               vocoder_n_eval=0, vocoder_hidden_units=32)
    vexpdir = os.path.join(paths.work, "exp", "vocoder_SPKB_hu32")
    vh = json.load(open(os.path.join(vexpdir, "history.json")))
    assert np.isfinite(vh["history"][-1]["nll"])
    assert os.path.exists(os.path.join(vexpdir, "checkpoint-latest.pkl"))


def test_resume_reproduces_trajectory(corpus, tmp_path):
    """Resume from the epoch-1 checkpoint must reproduce epoch 2 exactly
    (the reference's determinism contract, SURVEY.md §4 item 5)."""
    from cyclevae_tpu.pipeline.recipe import (
        DEFAULT_SPEAKERS, RecipePaths, SpeakerConf, run_stages)
    from cyclevae_tpu.pipeline.train_stage import run_train
    from cyclevae_tpu.utils.hdf5 import find_files

    DEFAULT_SPEAKERS.setdefault("SPKA", SpeakerConf(70.0, 400.0, -25.0))
    DEFAULT_SPEAKERS.setdefault("SPKB", SpeakerConf(100.0, 500.0, -25.0))

    exp = ExperimentConfig(
        model=ModelConfig(hidden_units=16, n_cyc=1, spk_src="SPKA",
                          spk_trg="SPKB"),
        train=TrainConfig(batch_size=40, batch_size_utt=2,
                          batch_size_utt_eval=2, epoch_count=2, lr=1e-3),
    )
    paths = RecipePaths(wav_root=str(corpus), work=str(tmp_path / "work2"),
                        n_train=2)
    run_stages("123", exp, paths, n_jobs=2)

    def h5s(spk, eval_set=False):
        return paths.h5s(spk, eval_set)

    kwargs = dict(
        feats_src=h5s("SPKA")[:2], feats_src_pair=h5s("SPKB")[:2],
        feats_trg=h5s("SPKB")[:2], feats_trg_pair=h5s("SPKA")[:2],
        feats_eval_src=h5s("SPKA", True), feats_eval_trg=h5s("SPKB", True),
        stats_src=paths.stats("SPKA"), stats_trg=paths.stats("SPKB"),
        stats_jnt=paths.stats_jnt())

    exp_a = ExperimentConfig(model=exp.model, train=exp.train)
    dir_a = str(tmp_path / "exp_a")
    res_a = run_train(exp_a, expdir=dir_a, **kwargs)

    # 1 epoch, then resume for the 2nd
    exp_b1 = ExperimentConfig(model=exp.model,
                              train=TrainConfig(**{**exp.train.__dict__,
                                                   "epoch_count": 1}))
    dir_b = str(tmp_path / "exp_b")
    run_train(exp_b1, expdir=dir_b, **kwargs)
    exp_b2 = ExperimentConfig(model=exp.model, train=exp.train)
    res_b = run_train(exp_b2, expdir=dir_b,
                      resume=os.path.join(dir_b, "checkpoint-1.pkl"), **kwargs)

    a = res_a["history"][-1]
    b = res_b["history"][-1]
    assert a["epoch"] == b["epoch"] == 2
    assert abs(a["train"]["loss"] - b["train"]["loss"]) < 1e-3 * abs(a["train"]["loss"])
    assert abs(a["eval"]["criterion"] - b["eval"]["criterion"]) < 1e-4


def test_m2m_recipe_on_synthetic(corpus, tmp_path):
    """Many-to-many recipe stages 3m+4m on the synthetic corpus (after the
    shared per-speaker stages 1-2)."""
    from cyclevae_tpu.pipeline.recipe import (
        DEFAULT_SPEAKERS, RecipePaths, SpeakerConf, run_stages)
    from cyclevae_tpu.pipeline.recipe_mult import run_mult_stages

    DEFAULT_SPEAKERS.setdefault("SPKA", SpeakerConf(70.0, 400.0, -25.0))
    DEFAULT_SPEAKERS.setdefault("SPKB", SpeakerConf(100.0, 500.0, -25.0))
    exp = ExperimentConfig(
        model=ModelConfig(hidden_units=16, n_cyc=2, lat_dim=4, n_spk=2,
                          spk_src="SPKA", spk_trg="SPKB"),
        train=TrainConfig(batch_size=40, batch_size_utt=2,
                          batch_size_utt_eval=2, epoch_count=1, lr=1e-3))
    paths = RecipePaths(wav_root=str(corpus), work=str(tmp_path / "wm"),
                        n_train=2)
    run_stages("12", exp, paths, n_jobs=2)
    run_mult_stages("34", exp, paths, ["SPKA"], ["SPKB"])
    import json
    hist = json.load(open(os.path.join(paths.work, "exp",
                                       exp.name() + "_m2m", "history.json")))
    assert np.isfinite(hist["history"][0]["train"]["loss"])

    # m2m decode: named target and interpolated speaker code
    import jax
    import jax.numpy as jnp
    from cyclevae_tpu.pipeline.decode import Codec
    from cyclevae_tpu.pipeline.decode_mult import decode_to_speaker
    from cyclevae_tpu.pipeline.train_stage import model_config
    from cyclevae_tpu.vi.checkpoint import load_checkpoint
    from cyclevae_tpu.vi.train import CycleVAEParams
    ckpt = load_checkpoint(os.path.join(paths.work, "exp",
                                        exp.name() + "_m2m",
                                        "checkpoint-1.pkl"))
    params = CycleVAEParams(*jax.tree_util.tree_map(jnp.asarray,
                                                    ckpt["params"]))
    codec = Codec(params, model_config(exp), n_smpl_dec=10)
    wav = str(corpus / "eval" / "SPKA" / "e0.wav")
    outdir = str(tmp_path / "m2m_dec")
    out = decode_to_speaker(codec, exp, paths, wav, "SPKA",
                            ["SPKA", "SPKB"], "SPKB", outdir)
    assert os.path.exists(out["_noGV"]) and os.path.exists(out["_GV"])
    out2 = decode_to_speaker(codec, exp, paths, wav, "SPKA",
                             ["SPKA", "SPKB"], [0.5, 0.5], outdir)
    assert "mix-0.50-0.50" in out2["_noGV"]

    # stage 6m: eval decode over every direction with DTW MCD metrics
    run_mult_stages("6", exp, paths, ["SPKA"], ["SPKB"])
    mdir = os.path.join(paths.work, "exp", exp.name() + "_m2m")
    ep = json.load(open(os.path.join(mdir, "history.json")))["best"]["epoch"]
    m = json.load(open(os.path.join(
        mdir, f"decode_metrics_m2m_ep{ep}.json")))
    assert set(m["per_direction"]) == {"SPKA-SPKB", "SPKB-SPKA"}
    assert np.isfinite(m["overall"]["mcdpow_cv"])
    m2m_wavs = os.listdir(os.path.join(mdir, f"wav_m2m_ep{ep}"))
    assert any("_to_SPKB_GV" in w for w in m2m_wavs)
    assert any("_to_mix-" in w for w in m2m_wavs)

    # stage 6m ran the 5m calibration inline: per-direction model GV stats
    # (incl. self-reconstruction) are in each source speaker's stats file
    from cyclevae_tpu.pipeline.decode_mult import load_cvgv_mult
    mid = f"{exp.name()}_m2m_ep{ep}"
    for s in ("SPKA", "SPKB"):
        for t in ("SPKA", "SPKB"):
            gv = load_cvgv_mult(paths, s, t, mid)
            assert gv is not None and gv.shape == (exp.model.out_dim - 1,)
            assert np.all(gv > 0)
