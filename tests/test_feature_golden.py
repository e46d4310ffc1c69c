"""Golden regression lock on feature extraction over a real VCC2018 wav.

Locks the full stage-1 chain (highpass -> F0 -> envelope -> mcep -> npow)
against accidental numerical changes.  Values recorded from the current
implementation (not the reference's pyworld outputs — those deps aren't
installable here; cross-implementation parity is covered by the semantic
tests in test_dsp.py).  Skipped when the bundled corpus is absent.
"""

import os

import numpy as np
import pytest

WAV = "/root/reference/egs/one-to-one/wav/VCC2SF1/10001.wav"

pytestmark = pytest.mark.skipif(not os.path.exists(WAV),
                                reason="bundled corpus not available")


def test_feature_extraction_golden(tmp_path):
    from cyclevae_tpu.pipeline.features import extract_one
    from cyclevae_tpu.utils.config import FeatureConfig
    from cyclevae_tpu.utils.hdf5 import read_hdf5

    h5 = str(tmp_path / "u.h5")
    n_frames = extract_one(WAV, h5, None, FeatureConfig(), 130.0, 427.0, -40.0)
    assert n_frames == 1228

    feat = read_hdf5(h5, "/feat_org_lf0")
    assert feat.shape == (1228, 54)
    f0r = read_hdf5(h5, "/f0_range")
    spc = read_hdf5(h5, "/spcidx_range")[0]

    # structural goldens (stable across compilers): voicing rate, F0 stats,
    # speech-frame count, uv flag consistency
    voiced = f0r > 0
    assert abs(voiced.mean() - 0.61) < 0.03
    assert abs(np.median(f0r[voiced]) - 218.0) < 5.0
    assert 900 < len(spc) < 950
    np.testing.assert_array_equal(feat[:, 0], voiced.astype(feat.dtype))
    # log-F0 channel within physical range on voiced frames
    lf0 = feat[voiced, 1]
    assert np.all(lf0 > np.log(100.0)) and np.all(lf0 < np.log(500.0))
    # mcep c0 (power) dynamic range sane
    c0 = feat[:, 4]
    assert c0.max() - c0.min() > 3.0
