"""Correctness tests for the native DSP library (C++ via ctypes).

The reference verifies DSP empirically (analysis-synthesis audit wavs,
SURVEY.md §4); here we pin down the math with synthetic golden checks:
round-trips, known-F0 signals, and DTW on constructed alignments.
"""

import numpy as np
import pytest

from cyclevae_tpu.dsp import dtw, sptk, world

FS = 22050
FFTL = 1024


def sawtooth(f0_hz, dur_s, fs=FS):
    t = np.arange(int(dur_s * fs)) / fs
    ph = (t * f0_hz) % 1.0
    return (2.0 * ph - 1.0) * 1000.0


# ---------------------------------------------------------------------------
# mel-cepstrum ops
# ---------------------------------------------------------------------------

def test_sp2mc_mc2sp_roundtrip_alpha0_exact():
    rng = np.random.default_rng(0)
    # alpha=0 (no warping): order fftl/2 cepstrum round-trips exactly
    base = np.abs(np.fft.rfft(rng.normal(size=64), FFTL)) + 1.0
    ps = (base ** 2)[None, :]
    mc = sptk.sp2mc(ps, FFTL // 2, 0.0)
    ps_rec = sptk.mc2sp(mc, 0.0, FFTL)
    np.testing.assert_allclose(ps_rec, ps, rtol=1e-6)


def test_sp2mc_mc2sp_roundtrip_warped_close():
    rng = np.random.default_rng(0)
    # alpha=0.455: finite-order warped cepstrum is an approximation; a smooth
    # spectrum at generous order should reconstruct closely in log domain
    base = np.abs(np.fft.rfft(rng.normal(size=24), FFTL)) + 1.0
    ps = (base ** 2)[None, :]
    mc = sptk.sp2mc(ps, 255, 0.455)
    ps_rec = sptk.mc2sp(mc, 0.455, FFTL)
    err = np.abs(np.log(ps_rec) - np.log(ps)).mean()
    assert err < 0.02, err


def test_sp2mc_mc2sp_roundtrip_order49_smooths():
    rng = np.random.default_rng(1)
    half = FFTL // 2 + 1
    ps = (np.abs(np.fft.rfft(rng.normal(size=32), FFTL)) + 1.0)[None, :] ** 2
    mc = sptk.sp2mc(ps, 49, 0.455)
    assert mc.shape == (1, 50)
    ps_rec = sptk.mc2sp(mc, 0.455, FFTL)
    # order-49 warped cepstrum should reconstruct a smooth spectrum close in
    # log domain (the input is already smooth)
    err = np.abs(np.log(ps_rec) - np.log(ps)).mean()
    assert err < 0.3, err


def test_freqt_roundtrip():
    rng = np.random.default_rng(2)
    c = rng.normal(size=30)
    # the warped representation needs ~4x the order to capture the tail
    w = sptk.freqt(c, 120, 0.455)
    back = sptk.freqt(w, 29, -0.455)
    np.testing.assert_allclose(back, c, atol=1e-9)


def test_freqt_alpha0_identity():
    c = np.arange(5.0)
    np.testing.assert_allclose(sptk.freqt(c, 4, 0.0), c)


def test_mc2b_b2mc_roundtrip():
    rng = np.random.default_rng(3)
    mc = rng.normal(size=(4, 20))
    b = sptk.mc2b(mc, 0.455)
    mc_rec = sptk.b2mc(b, 0.455)
    np.testing.assert_allclose(mc_rec, mc, atol=1e-10)


def test_mc2e_flat_spectrum_gain():
    # mc representing a flat log-spectrum of value g: energy = exp(g)^2
    for g in (0.0, 1.0):
        mc = np.zeros((1, 25))
        mc[0, 0] = g
        e = sptk.mc2e(mc, alpha=0.455, irlen=256)[0]
        assert abs(e - np.exp(2 * g)) < 1e-6


def test_mc2e_fft_matches_direct_recursion():
    # The FFT fast path (frequency-domain Parseval energy, 2*irlen grid)
    # must agree with the O(irlen^2) c2ir recursion on speech-like mceps —
    # they differ only by circular aliasing of the IR tail beyond 2*irlen.
    rng = np.random.default_rng(11)
    # realistic envelope scale: c0 ~ a few, higher coeffs decaying
    mc = rng.normal(size=(8, 50)) * (0.5 / (1.0 + np.arange(50)))
    mc[:, 0] += rng.uniform(-2.0, 4.0, size=8)
    e_fft = sptk.mc2e(mc, alpha=0.455, irlen=1024)
    e_dir = sptk.mc2e_direct(mc, alpha=0.455, irlen=1024)
    np.testing.assert_allclose(e_fft, e_dir, rtol=1e-8)


def test_mlsadf_flat_gain():
    # b == mc with only c0 set -> pure gain exp(c0)
    x = np.sin(np.arange(2000) * 0.1)
    mc = np.zeros((10, 25))
    mc[:, 0] = 0.7
    b = sptk.mc2b(mc, 0.455)
    y = sptk.mlsadf(x, b, 0.455, hop=200)
    np.testing.assert_allclose(y, x * np.exp(0.7), rtol=1e-6)


def test_mlsadf_matches_target_spectrum():
    """Filter white noise through MLSA with a known mcep; the output spectrum
    should follow mc2sp(mc) (amplitude ~ sqrt of power ratio)."""
    rng = np.random.default_rng(4)
    x = rng.normal(size=FS)  # 1 s white noise
    mc = np.zeros((1, 30))
    mc[0, 0] = 0.3
    mc[0, 1] = 0.8
    mc[0, 2] = -0.4
    b = sptk.mc2b(mc, 0.455)
    y = sptk.mlsadf(x, np.repeat(b, 10, axis=0), 0.455, hop=len(x) // 10)
    # compare average periodograms
    from scipy.signal import welch
    f, pxx = welch(x, fs=FS, nperseg=FFTL)
    f, pyy = welch(y[2000:], fs=FS, nperseg=FFTL)
    ratio_db = 10 * np.log10(pyy / pxx)
    target = sptk.mc2sp(mc, 0.455, FFTL)[0]
    # welch bins ~ rfft bins of FFTL
    tgt_db = 10 * np.log10(target)
    # ignore edges
    sel = slice(10, len(f) - 10)
    err = np.abs(ratio_db[sel] - tgt_db[sel]).mean()
    assert err < 1.5, err


# ---------------------------------------------------------------------------
# pitch
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("f0_true", [110.0, 220.0, 330.0])
def test_estimate_f0_on_sawtooth(f0_true):
    x = sawtooth(f0_true, 0.6)
    f0, t = world.harvest(x, FS, f0_floor=60.0, f0_ceil=700.0)
    mid = f0[10:-10]
    voiced = mid[mid > 0]
    assert len(voiced) > 0.9 * len(mid)
    med = np.median(voiced)
    assert abs(med - f0_true) / f0_true < 0.02, med


def test_estimate_f0_silence_is_unvoiced():
    x = np.zeros(FS // 2)
    f0, _ = world.harvest(x, FS)
    assert np.all(f0 == 0.0)


def test_refine_f0_improves_or_keeps():
    f0_true = 207.0
    x = sawtooth(f0_true, 0.6)
    f0, t = world.harvest(x, FS)
    f0_r = world.stonemask(x, f0, t, FS)
    v = (f0 > 0) & (f0_r > 0)
    err_raw = np.median(np.abs(f0[v] - f0_true))
    err_ref = np.median(np.abs(f0_r[v] - f0_true))
    assert err_ref <= err_raw + 0.5


# ---------------------------------------------------------------------------
# envelope / aperiodicity / synthesis
# ---------------------------------------------------------------------------

def test_envelope_shape_and_positive():
    x = sawtooth(150.0, 0.4)
    f0, t = world.harvest(x, FS)
    sp = world.cheaptrick(x, f0, t, FS, FFTL)
    assert sp.shape == (len(f0), FFTL // 2 + 1)
    assert np.all(sp > 0)


def test_aperiodicity_voiced_vs_noise():
    xv = sawtooth(150.0, 0.4)
    rng = np.random.default_rng(5)
    xn = rng.normal(size=len(xv)) * 300.0
    f0v, tv = world.harvest(xv, FS)
    apv = world.d4c(xv, f0v, tv, FS, FFTL)
    # fake a voiced track on pure noise to probe the band estimator
    f0n = np.full_like(f0v, 150.0)
    apn = world.d4c(xn, f0n, tv, FS, FFTL)
    v = f0v > 0
    assert apv[v].mean() < 0.5          # harmonic signal: low aperiodicity
    assert apn.mean() > 0.8             # noise: high aperiodicity


def test_code_decode_aperiodicity_roundtrip():
    rng = np.random.default_rng(6)
    n_frames = 7
    # piecewise-linear ap across frequency is representable by the 2-band code
    ap = np.clip(rng.uniform(0.05, 0.9, size=(n_frames, 2)), 0.001, 0.999)
    full = world.decode_aperiodicity(ap_to_coded_roundtrip_input(ap), FS, FFTL)
    coded = world.code_aperiodicity(full, FS)
    full2 = world.decode_aperiodicity(coded, FS, FFTL)
    np.testing.assert_allclose(full2, full, atol=1e-6)


def ap_to_coded_roundtrip_input(ap_bands):
    return 20.0 * np.log10(ap_bands)


def test_analysis_synthesis_roundtrip_f0_and_energy():
    """Synthesize from analysis of a harmonic signal; re-analysis should
    recover F0, and energy should be in the same ballpark (the reference's
    stage-1 audit, feature_extract_vc.py:398-402, done numerically)."""
    f0_true = 160.0
    x = sawtooth(f0_true, 0.5)
    f0, t = world.harvest(x, FS)
    f0 = world.stonemask(x, f0, t, FS)
    sp = world.cheaptrick(x, f0, t, FS, FFTL)
    ap = world.d4c(x, f0, t, FS, FFTL)
    y = world.synthesize(f0, sp, ap, FS, 5.0)
    assert len(y) >= len(x) - FS // 100
    f0y, ty = world.harvest(y, FS)
    vy = f0y[10:-10]
    vy = vy[vy > 0]
    assert abs(np.median(vy) - f0_true) / f0_true < 0.03
    e_ratio = (np.sum(y[:len(x)] ** 2) + 1e-9) / (np.sum(x ** 2) + 1e-9)
    assert 0.25 < e_ratio < 4.0, e_ratio


# ---------------------------------------------------------------------------
# DTW / MCD
# ---------------------------------------------------------------------------

def test_calc_mcd_known_value():
    x = np.zeros((3, 4))
    y = np.ones((3, 4)) * 0.1
    mean, per = dtw.calc_mcd(x, y)
    expected = (10.0 / np.log(10)) * np.sqrt(2 * 4 * 0.01)
    np.testing.assert_allclose(per, expected, rtol=1e-12)
    np.testing.assert_allclose(mean, expected, rtol=1e-12)


def test_dtw_identity():
    rng = np.random.default_rng(7)
    a = rng.normal(size=(20, 5))
    aligned, twf, mean, per = dtw.dtw_org_to_trg(a, a)
    np.testing.assert_array_equal(twf, np.arange(20))
    assert mean < 1e-9


def test_dtw_recovers_time_stretch():
    """org = trg with every frame doubled; DTW must map each trg frame to one
    of its two copies (zero distortion)."""
    rng = np.random.default_rng(8)
    trg = rng.normal(size=(15, 5))
    org = np.repeat(trg, 2, axis=0)
    aligned, twf, mean, per = dtw.dtw_org_to_trg(org, trg)
    assert mean < 1e-9
    np.testing.assert_allclose(aligned, trg, atol=1e-12)
    assert np.all(np.diff(twf) >= 0)


# ---------------------------------------------------------------------------
# Analytic-truth goldens (VERDICT r1 #3): estimators vs closed-form targets,
# not self-recorded values.
# ---------------------------------------------------------------------------

def _harmonic_complex(f0, env_fn, dur=1.0, fs=FS, seed=0):
    """Sum of harmonics with per-harmonic amplitude sqrt(env_fn(k*f0)) and
    random phases — the true envelope at frequency f is exactly env_fn(f)."""
    n = int(dur * fs)
    t = np.arange(n) / fs
    x = np.zeros(n)
    rng = np.random.default_rng(seed)
    k = 1
    while k * f0 < fs / 2:
        x += np.sqrt(env_fn(k * f0)) * np.cos(
            2 * np.pi * k * f0 * t + rng.uniform(0, 2 * np.pi))
        k += 1
    return x


def _two_formant_env(f):
    f = np.asarray(f, dtype=float)
    return (1.0 / (1 + ((f - 500) / 400) ** 2)
            + 0.3 / (1 + ((f - 2500) / 600) ** 2) + 1e-3)


@pytest.mark.parametrize("f0_true,lsd_max", [(100.0, 0.5), (220.0, 0.8),
                                             (440.0, 1.0)])
def test_envelope_analytic_lsd(f0_true, lsd_max):
    """cheaptrick-class envelope vs the closed-form two-formant envelope:
    gain-normalized log-spectral distance must stay below ~0.3-1.0 dB
    (measured headroom ~1.5x; was 1.5-2.9 dB before the DC-correction and
    window-averaging fixes)."""
    fftl = 1024
    x = _harmonic_complex(f0_true, _two_formant_env)
    f0, tax = world.harvest(x, FS)
    f0 = world.stonemask(x, f0, tax, FS)
    sp = world.cheaptrick(x, f0, tax, FS, fftl)
    freqs = np.arange(fftl // 2 + 1) * FS / fftl
    envb = _two_formant_env(freqs)
    d = 10 * np.log10(sp[20:-20]) - 10 * np.log10(envb[None])
    d = d - d.mean(axis=1, keepdims=True)
    lsd = np.sqrt((d ** 2).mean())
    assert lsd < lsd_max, lsd


@pytest.mark.parametrize("a_true", [0.05, 0.1, 0.3])
def test_aperiodicity_analytic_hnr(a_true):
    """d4c-class band aperiodicity on harmonics + white noise with known noise
    fraction a^2 per band: coded-band estimates must track a_true within 20%
    (relative) — the density-ratio estimator it replaces read 2-5x high."""
    f0c = 150.0
    rng = np.random.default_rng(1)
    xh = _harmonic_complex(f0c, lambda f: np.ones_like(np.asarray(f, float)))
    dens_h = 0.5 / f0c
    v = dens_h * a_true ** 2 / (1 - a_true ** 2) * (FS / 2)
    x = xh + np.sqrt(v) * rng.normal(size=len(xh))
    f0, tax = world.harvest(x, FS)
    f0 = world.stonemask(x, f0, tax, FS)
    ap = world.d4c(x, f0, tax, FS, 1024)
    cap = world.code_aperiodicity(ap, FS)
    a_est = 10 ** (np.median(cap[20:-20], axis=0) / 20)
    np.testing.assert_allclose(a_est, a_true, rtol=0.25)


def test_octave_error_corrected():
    """stonemask must pull an octave-low track back to the fundamental on a
    clean harmonic complex (NCCF peaks equally at T0 and 2*T0)."""
    f0c = 220.0
    x = _harmonic_complex(f0c, lambda f: np.ones_like(np.asarray(f, float)))
    tax = np.arange(0.1, 0.9, 0.005)
    bad = np.full(len(tax), f0c / 2)
    fixed = world.stonemask(x, bad, tax, FS)
    assert np.mean(np.abs(fixed - f0c) < 0.05 * f0c) > 0.95


def test_anasyn_audit_mcd_bound():
    """End-to-end analysis->synthesis->re-analysis MCD (power-excluded) on a
    real utterance stays under 2.8 dB (reference audit artifact:
    feature_extract_vc.py:398-402; 4.2 dB in round 1, 2.27 measured after
    the period-correlation aperiodicity + low-band fix)."""
    import os
    wav = "/root/reference/egs/one-to-one/wav/VCC2TF1/10001.wav"
    if not os.path.exists(wav):
        pytest.skip("bundled corpus not available")
    from scipy.io import wavfile
    _, x = wavfile.read(wav)
    x = x.astype(np.float64) / 32768.0
    fftl = 1024
    f0, tax = world.harvest(x, FS)
    f0 = world.stonemask(x, f0, tax, FS)
    sp = world.cheaptrick(x, f0, tax, FS, fftl)
    ap = world.d4c(x, f0, tax, FS, fftl)
    y = world.synthesize(f0, sp, ap, FS)
    f0y, taxy = world.harvest(y, FS)
    f0y = world.stonemask(y, f0y, taxy, FS)
    spy = world.cheaptrick(y, f0y, taxy, FS, fftl)
    n = min(len(sp), len(spy))
    mcx = sptk.sp2mc(sp[:n], 24, 0.455)
    mcy = sptk.sp2mc(spy[:n], 24, 0.455)
    d = mcx[:, 1:] - mcy[:, 1:]
    mcd = (10.0 / np.log(10)) * np.sqrt(2.0) * np.sqrt((d ** 2).sum(-1)).mean()
    assert mcd < 2.8, mcd


def test_aperiodicity_chirped_fixture():
    """Band aperiodicity under f0 CHIRP + vibrato (the case that killed the
    spectral-sampling estimator: harmonic k smears by k*df0, reading voiced
    speech as ~0.85 aperiodic).  The period-correlation estimator must track
    the known noise fraction with only a small chirp floor."""
    rng = np.random.default_rng(0)
    n = int(1.2 * FS)
    t = np.arange(n) / FS
    f0t = 200 + 40 * t + 6 * np.sin(2 * np.pi * 5 * t)
    theta = 2 * np.pi * np.cumsum(f0t) / FS
    for a_true, tol in ((0.1, 0.12), (0.3, 0.08), (0.6, 0.08)):
        x = np.zeros(n)
        for k in range(1, int(FS / 2 / f0t.max())):
            x += np.cos(k * theta + rng.uniform(0, 2 * np.pi))
        dens = 0.5 / 200.0
        v = dens * a_true ** 2 / (1 - a_true ** 2) * (FS / 2)
        x = x + np.sqrt(v) * rng.normal(size=n)
        f0, tax = world.harvest(x, FS)
        f0 = world.stonemask(x, f0, tax, FS)
        ap = world.d4c(x, f0, tax, FS, 1024)
        voiced = f0 > 0
        est = np.median(ap[voiced][:, [139, 279]], axis=0)  # 3k / 6k bins
        assert np.all(np.abs(est - a_true) < tol), (a_true, est)


def test_anasyn_f0_retrack_quality():
    """Resynthesized speech must stay TRACKABLE: re-analysis of the anasyn
    output recovers the original F0 track (>=85% of commonly-voiced frames
    within 10%) and keeps voiced frames voiced (<10% v->u loss).  Guards the
    voiced-noise balance end-to-end (over-noised synthesis reads breathy and
    untrackable; this failed badly with the spectral-sampling estimator)."""
    import os
    wav = "/root/reference/egs/one-to-one/wav/VCC2SF1/10002.wav"
    if not os.path.exists(wav):
        pytest.skip("bundled corpus not available")
    from scipy.io import wavfile
    _, x = wavfile.read(wav)
    x = x.astype(np.float64) / 32768.0
    f0, tax = world.harvest(x, FS)
    f0 = world.stonemask(x, f0, tax, FS)
    sp = world.cheaptrick(x, f0, tax, FS, 1024)
    ap = world.d4c(x, f0, tax, FS, 1024)
    y = world.synthesize(f0, sp, ap, FS)
    f0y, taxy = world.harvest(y, FS)
    f0y = world.stonemask(y, f0y, taxy, FS)
    n = min(len(f0), len(f0y))
    vo, vy = f0[:n] > 0, f0y[:n] > 0
    both = vo & vy
    ratio = f0y[:n][both] / f0[:n][both]
    assert np.mean(np.abs(ratio - 1) < 0.1) > 0.85
    assert np.mean(vo & ~vy) < 0.10


def test_aperiodicity_time_varying_hnr_ramp():
    """Band aperiodicity must TRACK a time-varying noise fraction (VERDICT r2
    #9: the constant-a fixtures above can be satisfied by a temporally-blurred
    estimator).  Chirped harmonics + white noise whose per-band fraction ramps
    smoothly 0.1 -> 0.55 -> 0.1; the per-frame 3k/6k-bin estimate must follow
    the local analytic truth a(t) within an absolute 0.12 over the middle 80%
    of the utterance (windowing limits time resolution at the edges)."""
    rng = np.random.default_rng(3)
    n = int(1.6 * FS)
    t = np.arange(n) / FS
    f0t = 180 + 30 * t                      # mild chirp, keeps it non-trivial
    theta = 2 * np.pi * np.cumsum(f0t) / FS
    x = np.zeros(n)
    for k in range(1, int(FS / 2 / f0t.max())):
        x += np.cos(k * theta + rng.uniform(0, 2 * np.pi))
    a_t = 0.1 + 0.45 * np.sin(np.pi * t / t[-1]) ** 2       # 0.1->0.55->0.1
    dens = 0.5 / 180.0
    v_t = dens * a_t ** 2 / (1 - a_t ** 2) * (FS / 2)
    x = x + np.sqrt(v_t) * rng.normal(size=n)

    f0, tax = world.harvest(x, FS)
    f0 = world.stonemask(x, f0, tax, FS)
    ap = world.d4c(x, f0, tax, FS, 1024)
    a_true = 0.1 + 0.45 * np.sin(np.pi * tax / t[-1]) ** 2
    lo, hi = int(0.1 * len(tax)), int(0.9 * len(tax))
    sel = (f0 > 0)
    sel[:lo] = False
    sel[hi:] = False
    est = ap[:, [139, 279]].mean(axis=1)                    # 3k / 6k bins
    err = est[sel] - a_true[sel]
    # median |err| tight; allow a small tail of outlier frames
    assert np.median(np.abs(err)) < 0.08, np.median(np.abs(err))
    assert np.mean(np.abs(err) < 0.2) > 0.9, np.mean(np.abs(err) < 0.2)


def test_aperiodicity_noise_burst_localized():
    """A 250 ms noise burst over clean harmonics must read HIGH inside the
    burst and stay LOW >=80 ms outside it — time LOCALIZATION of the
    aperiodicity estimate, the regime a long-window estimator smears."""
    rng = np.random.default_rng(4)
    n = int(1.5 * FS)
    t = np.arange(n) / FS
    f0c = 200.0
    theta = 2 * np.pi * f0c * t
    x = np.zeros(n)
    for k in range(1, int(FS / 2 / f0c)):
        x += np.cos(k * theta + rng.uniform(0, 2 * np.pi))
    burst = (t > 0.6) & (t < 0.85)
    a_in = 0.6
    dens = 0.5 / f0c
    v = dens * a_in ** 2 / (1 - a_in ** 2) * (FS / 2)
    x = x + np.where(burst, np.sqrt(v), 0.0) * rng.normal(size=n)

    f0, tax = world.harvest(x, FS)
    f0 = world.stonemask(x, f0, tax, FS)
    ap = world.d4c(x, f0, tax, FS, 1024)
    est = ap[:, [139, 279]].mean(axis=1)
    voiced = f0 > 0
    inside = voiced & (tax > 0.64) & (tax < 0.81)
    outside = voiced & (((tax > 0.15) & (tax < 0.52)) |
                        ((tax > 0.93) & (tax < 1.35)))
    assert inside.sum() > 10 and outside.sum() > 20
    assert np.median(est[inside]) > 0.45, np.median(est[inside])
    assert np.median(est[outside]) < 0.15, np.median(est[outside])
