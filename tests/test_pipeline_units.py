"""Unit tests for pipeline components: features helpers, stats, datasets,
checkpoint round-trip, summary."""

import json
import os

import h5py
import numpy as np
import pytest

from cyclevae_tpu.pipeline.dataset import bucket_len, make_batch, padding
from cyclevae_tpu.pipeline.features import (
    convert_continuos_f0,
    convert_f0,
    extfrm,
    spc2npow,
)
from cyclevae_tpu.pipeline.stats import StreamingMeanScale
from cyclevae_tpu.pipeline.summary import summarize


def test_streaming_mean_scale_matches_numpy():
    rng = np.random.default_rng(0)
    chunks = [rng.normal(size=(n, 5)) for n in (17, 3, 40)]
    s = StreamingMeanScale()
    for c in chunks:
        s.partial_fit(c)
    allx = np.concatenate(chunks)
    np.testing.assert_allclose(s.mean, allx.mean(0), atol=1e-10)
    np.testing.assert_allclose(s.scale, allx.std(0), atol=1e-10)


def test_convert_continuos_f0():
    f0 = np.array([0.0, 0, 100, 0, 0, 200, 0], dtype=np.float64)
    uv, cont = convert_continuos_f0(f0)
    np.testing.assert_array_equal(uv, [0, 0, 1, 0, 0, 1, 0])
    assert cont[0] == 100 and cont[-1] == 200
    # linear interpolation between the voiced anchors
    np.testing.assert_allclose(cont[2:6], [100, 100 + 100 / 3,
                                           100 + 200 / 3, 200])


def test_convert_f0_log_gaussian():
    f0 = np.array([0.0, 100.0, 200.0])
    cv = convert_f0(f0, np.log(100), 0.2, np.log(150), 0.2)
    assert cv[0] == 0.0
    np.testing.assert_allclose(cv[1], 150.0, rtol=1e-9)
    np.testing.assert_allclose(cv[2], 300.0, rtol=1e-9)


def test_spc2npow_flat():
    sp = np.ones((4, 9))
    npow = spc2npow(sp)
    np.testing.assert_allclose(npow, 0.0, atol=1e-9)  # all frames == mean


def test_extfrm():
    data = np.arange(10).reshape(5, 2).astype(float)
    npow = np.array([-30.0, -10, -25, -5, -50])
    ext, idx = extfrm(data, npow, power_threshold=-20)
    np.testing.assert_array_equal(idx[0], [1, 3])
    np.testing.assert_array_equal(ext, data[[1, 3]])


def test_padding_and_bucket():
    x = np.ones((10, 3))
    assert padding(x, 15).shape == (15, 3)
    assert padding(x, 5).shape == (10, 3)  # no truncation
    assert bucket_len(100, 80, 7) == 560
    assert bucket_len(561, 80, 7) == 1120


def test_summary_renders(tmp_path):
    hist = {"history": [{"epoch": 1, "train": {"loss": 100.0},
                         "eval": {"mcdpow_cv_mean": 9.0, "criterion": 20.0}}],
            "best": {"criterion": 20.0, "epoch": 1}}
    p = tmp_path / "history.json"
    p.write_text(json.dumps(hist))
    out = summarize(str(p), keys=["mcdpow_cv_mean", "criterion"])
    assert "#min=20.000 @epoch 1" in out
    assert "100.00" in out


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    from cyclevae_tpu.vi.checkpoint import (
        load_checkpoint, restore_np_rng, save_checkpoint)

    params = {"w": jnp.arange(4.0), "nested": [{"b": jnp.ones((2, 2))}]}
    np_rng = np.random.default_rng(42)
    np_rng.normal()  # advance
    key = jax.random.PRNGKey(7)
    path = save_checkpoint(str(tmp_path), params, {"opt": jnp.zeros(3)},
                           key, np_rng, epoch=5)
    ck = load_checkpoint(path)
    assert ck["epoch"] == 5
    np.testing.assert_array_equal(ck["params"]["w"], np.arange(4.0))
    rng2 = restore_np_rng(ck["np_rng_state"])
    # restored generator continues the exact same stream
    assert rng2.normal() == np_rng.normal()


def test_mult_dataset_surface(tmp_path):
    """Many-to-many dataset contract on synthetic h5 files."""
    from cyclevae_tpu.pipeline.dataset_mult import (
        MultSpkEvalDataset, MultSpkTrainDataset, validate_length)
    from cyclevae_tpu.utils.hdf5 import write_hdf5

    spks = ["SPK_A", "SPK_B", "SPK_C"]
    files = []
    rng = np.random.default_rng(0)
    for spk in spks:
        d = tmp_path / spk
        f = str(d / "u1.h5")
        T = 20
        write_hdf5(f, "/feat_org_lf0", rng.normal(size=(T, 54)))
        write_hdf5(f, "/spcidx_range", np.arange(T)[None])
        for other in spks:
            if other != spk:
                write_hdf5(f, f"/cvuvlogf0fil_ap_{other}",
                           rng.normal(size=(T, 4)))
        files.append(f)

    ds = MultSpkTrainDataset(files, ["SPK_A"], ["SPK_B", "SPK_C"], n_cyc=2,
                             seed=1)
    u = ds[0]  # SPK_A utterance
    assert u.src_code.shape == (20, 3)
    assert u.src_code[0, 0] == 1
    assert len(u.trg_codes) == 2 and len(u.cv_excits) == 2
    for code, spk in zip(u.trg_codes, u.pair_spks):
        assert spk in ("SPK_B", "SPK_C")
        assert code[0, spks.index(spk)] == 1
    u_b = ds[1]  # SPK_B -> must pair into the src group
    assert all(s == "SPK_A" for s in u_b.pair_spks)

    ev = MultSpkEvalDataset(files, ["SPK_A"], ["SPK_B", "SPK_C"], n_cyc=2)
    assert ev[0].pair_spks[0] == "SPK_B"  # deterministic

    x = np.zeros(1003)
    y = np.zeros((12, 3))
    xv, yv = validate_length(x, y, upsampling_factor=100)
    assert xv.shape[0] == 1000 and yv.shape[0] == 10


def test_config_json_roundtrip(tmp_path):
    from cyclevae_tpu.utils.config import (
        ExperimentConfig, ModelConfig, TrainConfig, load_config, save_config)
    exp = ExperimentConfig(
        model=ModelConfig(hidden_units=77, spk_src="X", spk_trg="Y",
                          use_pallas=True, compute_dtype="bfloat16"),
        train=TrainConfig(lr=3e-4, epoch_count=9, eval_interval=3))
    p = str(tmp_path / "model.json")
    save_config(exp, p)
    back = load_config(p)
    assert back.model.hidden_units == 77
    assert back.model.spk_src == "X"
    assert back.model.use_pallas and back.model.compute_dtype == "bfloat16"
    assert back.train.lr == 3e-4
    assert back.train.eval_interval == 3
    assert back.name() == exp.name()
    # a pre-perf-knob config (missing keys) loads with parity defaults
    import json
    d = json.load(open(p))
    del d["model"]["use_pallas"], d["model"]["compute_dtype"]
    json.dump(d, open(p, "w"))
    old = load_config(p)
    assert not old.model.use_pallas
    assert old.model.compute_dtype == "float32"
    # the trainers honor the knobs end-to-end in the model config
    from cyclevae_tpu.pipeline.train_stage import model_config
    assert model_config(back).use_pallas
    assert model_config(back).compute_dtype == "bfloat16"


def test_read_spk_conf_files(tmp_path):
    from cyclevae_tpu.pipeline.recipe import _read_spk_conf
    (tmp_path / "SPKZ.f0").write_text("111 333\n")
    (tmp_path / "SPKZ.pow").write_text("-27.5\n")
    sc = _read_spk_conf(str(tmp_path), "SPKZ")
    assert sc.minf0 == 111 and sc.maxf0 == 333 and sc.pow_threshold == -27.5
    # falls back to defaults for unknown speakers
    sc2 = _read_spk_conf(str(tmp_path), "NOPE")
    assert sc2.minf0 > 0


def test_train_lists_nonparallel_split(tmp_path, monkeypatch):
    """Reference split (run.sh:222-237): src trains on head, trg on tail;
    pair lists are the opposite halves (sentence-parallel counterparts)."""
    from cyclevae_tpu.pipeline.recipe import RecipePaths, run_stages
    from cyclevae_tpu.utils.config import ExperimentConfig

    # build fake h5 listing structure
    for spk in ("AAA", "BBB"):
        d = tmp_path / "hdf5" / spk
        os.makedirs(d)
        for i in range(6):
            (d / f"u{i}.h5").write_bytes(b"")
    paths = RecipePaths(wav_root=str(tmp_path), work=str(tmp_path), n_train=4)
    src = paths.h5s("AAA")
    trg = paths.h5s("BBB")
    # reproduce train_lists() logic
    src_head, src_tail = src[:4], src[4:]
    trg_head, trg_tail = trg[:4], trg[4:]
    assert len(src_head) == 4 and len(src_tail) == 2
    # the invariant under test: train_trg comes from the TAIL
    # (disjoint sentences from train_src's head indices)
    assert set(s.split("/")[-1] for s in trg_tail) == {"u4.h5", "u5.h5"}


def test_vocoder_sample_clips():
    from cyclevae_tpu.models.wavernn import WaveRNNConfig
    from cyclevae_tpu.pipeline.vocoder_stage import sample_clips

    class FakeDS:
        def __len__(self):
            return 2
        def __getitem__(self, i):
            F = 10 if i == 0 else 3
            return {"feat": np.arange(F * 2, dtype=np.float32).reshape(F, 2),
                    "x": np.arange(F * 5, dtype=np.float32) / 100}

    cfg = WaveRNNConfig(hop=5.0)
    rng = np.random.default_rng(0)
    feats, wavs = sample_clips(FakeDS(), [0, 1], clip_frames=5, cfg=cfg,
                               rng=rng)
    assert feats.shape == (2, 5, 2)
    assert wavs.shape == (2, 25)
    # short item (3 frames) zero-padded to 5
    assert float(feats[1, 4].sum()) == 0.0


def test_vocoder_sample_clips_fractional_hop_no_drift():
    # 441/4 samples per frame: clip starts align to den=4 frames so the
    # frame->sample map is exact (models/wavernn.py:42-56)
    from cyclevae_tpu.models.wavernn import (
        WaveRNNConfig, hop_fraction, n_samples_for)
    from cyclevae_tpu.pipeline.vocoder_stage import sample_clips

    cfg = WaveRNNConfig()          # hop=110.25
    assert hop_fraction(cfg) == (441, 4)

    F = 200
    n_samp = n_samples_for(cfg, F)

    class FakeDS:
        def __len__(self):
            return 1
        def __getitem__(self, i):
            return {"feat": np.zeros((F, 2), np.float32),
                    "x": np.arange(n_samp, dtype=np.float32)}

    rng = np.random.default_rng(3)
    for _ in range(5):
        feats, wavs = sample_clips(FakeDS(), [0], clip_frames=8, cfg=cfg,
                                   rng=rng)
        assert wavs.shape == (1, n_samples_for(cfg, 8))
        # first sample of the crop must be exactly start*441/4 — integer,
        # since start is aligned to a multiple of 4
        s0 = float(wavs[0, 0])
        assert s0 == int(s0)
        assert (int(s0) * 4) % 441 == 0


def test_background_generator_prefetch_and_errors():
    from cyclevae_tpu.utils.prefetch import BackgroundGenerator, background

    assert list(BackgroundGenerator(iter(range(5)), max_prefetch=2)) == \
        [0, 1, 2, 3, 4]

    @background(max_prefetch=1)
    def gen():
        yield from "abc"

    assert list(gen()) == ["a", "b", "c"]

    def bad():
        yield 1
        raise ValueError("boom")

    it = BackgroundGenerator(bad())
    assert next(it) == 1
    with pytest.raises(ValueError):
        list(it)


def test_latest_checkpoint_resolution(tmp_path):
    """Rolling checkpoint-latest.pkl wins; else the highest-numbered;
    an empty dir raises."""
    import os

    import jax
    import pytest

    from cyclevae_tpu.vi.checkpoint import latest_checkpoint, save_checkpoint
    rng = np.random.default_rng(0)
    d = str(tmp_path / "ck")
    save_checkpoint(d, {"w": np.ones(2)}, {}, jax.random.PRNGKey(0), rng, 3)
    save_checkpoint(d, {"w": np.ones(2)}, {}, jax.random.PRNGKey(0), rng, 12)
    assert latest_checkpoint(d).endswith("checkpoint-12.pkl")
    save_checkpoint(d, {"w": np.ones(2)}, {}, jax.random.PRNGKey(0), rng, 12,
                    name="checkpoint-latest.pkl")
    assert latest_checkpoint(d).endswith("checkpoint-latest.pkl")
    empty = str(tmp_path / "empty")
    os.makedirs(empty)
    with pytest.raises(FileNotFoundError):
        latest_checkpoint(empty)


def test_decode_interpolated_shapes():
    """Speaker-interpolated decode through the fused Codec path."""
    import jax
    import numpy as np

    from cyclevae_tpu.pipeline.decode import Codec, decode_interpolated
    from cyclevae_tpu.vi.train import CycleVAEConfig, init_cyclevae

    cfg = CycleVAEConfig(hidden_units=16, lat_dim=4, n_spk=2, do_prob=0.0)
    params = init_cyclevae(jax.random.PRNGKey(0), cfg,
                           np.zeros(54, np.float32),
                           np.ones(54, np.float32))
    codec = Codec(params, cfg, n_smpl_dec=3)
    T = 37
    feat = np.random.default_rng(0).normal(size=(T, 54)).astype(np.float32)
    cv = decode_interpolated(codec, jax.random.PRNGKey(1), feat, [0.3, 0.7])
    assert cv.shape == (T, cfg.out_dim)
    assert np.isfinite(cv).all()


def test_codec_pallas_routing_parity():
    """Stage-5/6 decode rides the model's fast path: a Codec built from a
    use_pallas config must produce the same outputs as the XLA-scan Codec
    (on CPU the Pallas route falls back to the bit-identical XLA kernel via
    the custom-VJP wrapper, so this locks the routing plumbing; the TPU A/B
    timing lives in tools/bench_decode_fusion.py)."""
    import jax
    import numpy as np

    from cyclevae_tpu.pipeline.decode import Codec
    from cyclevae_tpu.vi.train import CycleVAEConfig, init_cyclevae

    rng = np.random.default_rng(7)
    feat = rng.normal(size=(53, 54)).astype(np.float32)
    params = None
    outs = {}
    for pallas in (False, True):
        cfg = CycleVAEConfig(hidden_units=16, lat_dim=4, n_spk=2,
                             do_prob=0.0, use_pallas=pallas)
        if params is None:
            params = init_cyclevae(jax.random.PRNGKey(0), cfg,
                                   np.zeros(54, np.float32),
                                   np.ones(54, np.float32))
        codec = Codec(params, cfg, n_smpl_dec=3)
        lat = codec.encode(feat)
        code = np.tile(np.array([1.0, 0.0], np.float32), (len(feat), 1))
        z = codec.latent_mean(jax.random.PRNGKey(1), lat)[:, :cfg.lat_dim]
        cv = codec.decode(code, z)
        lats, zs = codec.encode_mean(jax.random.PRNGKey(1), [feat, feat[:40]])
        cvb = codec.decode_batch([(code, z), (code[:40], z[:40])])
        outs[pallas] = (lat, cv, lats[1], cvb[1])
    for a, b in zip(outs[False], outs[True]):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-5)
