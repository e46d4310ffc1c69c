"""Classifier-code dataset variants + speaker-classifier smoke trainer
(reference src/utils/dataset.py:290-492; head semantics gru_vae.py:446-447)."""

import numpy as np
import pytest

from cyclevae_tpu.utils.config import ExperimentConfig, ModelConfig, TrainConfig
from cyclevae_tpu.utils.hdf5 import write_hdf5
from cyclevae_tpu.pipeline.dataset_mult import (
    MultSpkEvalClsDataset,
    MultSpkTrainClsDataset,
    eval_pair_schedule,
    proc_multspk_data_random_cls,
)


@pytest.fixture(scope="module")
def cls_corpus(tmp_path_factory):
    """3-speaker corpus with speaker-dependent feature offsets so a
    classifier can actually separate them."""
    root = tmp_path_factory.mktemp("cls")
    rng = np.random.default_rng(0)
    spks = ["S_A", "S_B", "S_C"]
    files = {s: [] for s in spks}
    eval_files = {s: [] for s in spks}
    for k, spk in enumerate(spks):
        for kind, lst, n in (("tr", files, 4), ("ev", eval_files, 2)):
            for i in range(n):
                f = str(root / kind / spk / f"u{i}.h5")
                T = 100 + 15 * i
                t = np.arange(T)[:, None]
                feats = (np.sin(t * 0.05 + np.arange(54)[None])
                         + 2.0 * k          # speaker-identifying offset
                         + 0.1 * rng.normal(size=(T, 54)))
                write_hdf5(f, "/feat_org_lf0", feats)
                write_hdf5(f, "/spcidx_range", np.arange(5, T - 5)[None])
                for other in spks:
                    if other != spk:
                        write_hdf5(f, f"/cvuvlogf0fil_ap_{other}",
                                   feats[:, :4] + 0.1)
                lst[spk].append(f)
    stats = str(root / "stats_jnt.h5")
    write_hdf5(stats, "/mean_feat_org_lf0_jnt", np.full(54, 2.0))
    write_hdf5(stats, "/scale_feat_org_lf0_jnt", np.full(54, 1.5))
    return {"train": files, "eval": eval_files, "stats": stats,
            "spks": spks}


def test_proc_multspk_cls_codes(cls_corpus):
    src_list, trg_list = ["S_A"], ["S_B", "S_C"]
    rng = np.random.default_rng(3)
    f = cls_corpus["train"]["S_A"][0]
    cv, trg_codes, spk, fpair, pairs, src_cls, trg_cls = \
        proc_multspk_data_random_cls(f, src_list, trg_list, 2, rng)
    assert spk == "S_A"
    assert (src_cls == 0).all()                 # S_A is class 0
    for i in range(2):
        j = 1 + trg_list.index(pairs[i])        # classes follow src+trg order
        assert (trg_cls[i] == j).all()
        assert trg_codes[i][:, j].all()
    # a target-group utterance converts toward the source group
    f_b = cls_corpus["train"]["S_B"][0]
    _, _, spk_b, _, pairs_b, src_cls_b, trg_cls_b = \
        proc_multspk_data_random_cls(f_b, src_list, trg_list, 1, rng)
    assert spk_b == "S_B" and (src_cls_b == 1).all()
    assert pairs_b[0] == "S_A" and (trg_cls_b[0] == 0).all()


def test_train_cls_dataset_items(cls_corpus):
    files = sum(cls_corpus["train"].values(), [])
    ds = MultSpkTrainClsDataset(files, ["S_A"], ["S_B", "S_C"], n_cyc=2,
                                seed=0)
    u = ds[0]
    assert u.src_class_code.shape == (u.flen,)
    assert len(u.trg_class_codes) == 2
    assert u.src_class_code.dtype == np.int64


def test_eval_pair_schedule_matches_reference_interleave():
    """Hand-traced expectations of the reference's even/odd scheme
    (dataset.py:407-429)."""
    assert eval_pair_schedule(4, 3) == [1, 0, 1, 2]
    assert eval_pair_schedule(2, 1) == [0, 0]
    assert eval_pair_schedule(3, 2) == [1, 0, 1]
    assert eval_pair_schedule(1, 4) == [1]


def test_eval_cls_dataset(cls_corpus):
    ds = MultSpkEvalClsDataset(
        [cls_corpus["eval"]["S_A"]],
        [cls_corpus["eval"]["S_B"], cls_corpus["eval"]["S_C"]],
        ["S_A"], ["S_B", "S_C"])
    # 1 src speaker x 2 eval utts; schedule pairs S_A with S_C (index 1)
    assert len(ds) == 2
    assert ds.count_spk_pair_cv["S_A"]["S_C"] == 2
    item = ds[0]
    src, trg = item["src"], item["trg"]
    assert (src["class_code"] == 0).all()
    assert (src["pair_class_code"] == 2).all()
    assert (trg["class_code"] == 2).all()
    assert src["code"][:, 0].all() and src["pair_code"][:, 2].all()
    assert src["cv_excit"].shape[1] == 4


def test_speaker_classifier_smoke_train(cls_corpus, tmp_path):
    """The classifier trainer learns to separate the synthetic speakers
    through the softmax head + masked CE (frame accuracy >> chance)."""
    from cyclevae_tpu.pipeline.train_stage_cls import run_train_cls
    exp = ExperimentConfig(
        model=ModelConfig(hidden_units=16, lat_dim=8, do_prob=0.0),
        train=TrainConfig(batch_size=40, batch_size_utt=4, epoch_count=3,
                          lr=5e-3))
    files = sum(cls_corpus["train"].values(), [])
    res = run_train_cls(
        exp, files,
        [cls_corpus["eval"]["S_A"]],
        [cls_corpus["eval"]["S_B"], cls_corpus["eval"]["S_C"]],
        ["S_A"], ["S_B", "S_C"], cls_corpus["stats"],
        str(tmp_path / "exp_cls"))
    h = res["history"]
    assert h[-1]["train"]["loss"] < h[0]["train"]["loss"]
    assert h[-1]["eval_acc"] > 0.8      # 3-way chance = 0.33
