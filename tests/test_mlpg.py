"""MLPG (native banded-Cholesky solver) vs dense analytic truth.

The reference pins mlpg_c (tools/requirements.txt:10) but never imports it;
our op is validated against an in-test dense solve of the same normal
equations — analytic truth, not a recorded golden.
"""

import numpy as np
import pytest

from cyclevae_tpu.dsp.mlpg import (
    DEFAULT_WINDOWS, WIN_ACCEL, WIN_DELTA, WIN_STATIC, apply_delta_windows,
    mlpg)


def dense_mlpg(mean, var, windows):
    """Dense reference: build W (T*n_win, T) per dim, solve the full normal
    equations with numpy."""
    T = mean.shape[0]
    n_win = len(windows)
    dim = mean.shape[1] // n_win
    rows = []
    for w in windows:
        l = (len(w) - 1) // 2
        Wk = np.zeros((T, T))
        for t in range(T):
            for o, c in zip(range(-l, l + 1), w):
                if 0 <= t + o < T:
                    Wk[t, t + o] += c
        rows.append(Wk)
    W = np.concatenate(rows, axis=0)  # (n_win*T, T), window-major blocks
    out = np.zeros((T, dim))
    for d in range(dim):
        mu = np.concatenate([mean[:, k * dim + d] for k in range(n_win)])
        v = np.concatenate([var[:, k * dim + d] for k in range(n_win)])
        P = np.where(v > 0, 1.0 / np.maximum(v, 1e-300), 0.0)
        A = W.T @ (P[:, None] * W)
        b = W.T @ (P * mu)
        out[:, d] = np.linalg.solve(A, b)
    return out


def test_static_only_identity():
    rng = np.random.default_rng(0)
    mean = rng.normal(size=(31, 4))
    var = np.abs(rng.normal(size=(31, 4))) + 0.1
    out = mlpg(mean, var, windows=[WIN_STATIC])
    np.testing.assert_allclose(out, mean, atol=1e-10)


@pytest.mark.parametrize("windows", [
    DEFAULT_WINDOWS,
    (WIN_STATIC, WIN_DELTA, WIN_ACCEL),
])
def test_matches_dense_solve(windows):
    rng = np.random.default_rng(1)
    T, dim = 53, 3
    n_win = len(windows)
    mean = rng.normal(size=(T, n_win * dim))
    var = np.abs(rng.normal(size=(T, n_win * dim))) + 0.05
    out = mlpg(mean, var, windows=windows)
    ref = dense_mlpg(mean, var, windows)
    np.testing.assert_allclose(out, ref, rtol=1e-8, atol=1e-8)


def test_recovers_smooth_trajectory():
    """Observations built from a known trajectory by the forward window
    operator -> MLPG recovers it (well-posed inverse with tight variances)."""
    rng = np.random.default_rng(2)
    T = 64
    t = np.arange(T)
    c = np.stack([np.sin(t * 0.2), np.cos(t * 0.13) * 2.0], axis=1)
    mean = apply_delta_windows(c, DEFAULT_WINDOWS)
    var = np.full_like(mean, 1e-4)
    out = mlpg(mean, var, windows=DEFAULT_WINDOWS)
    np.testing.assert_allclose(out, c, atol=1e-6)
    # and smoothing actually smooths: noisy static means + clean deltas pull
    # the solution toward the true trajectory
    noisy = mean.copy()
    noisy[:, :2] += 0.3 * rng.normal(size=(T, 2))
    var2 = np.concatenate([np.full((T, 2), 0.09), np.full((T, 2), 1e-3)], 1)
    sm = mlpg(noisy, var2, windows=DEFAULT_WINDOWS)
    err_raw = np.sqrt(np.mean((noisy[:, :2] - c) ** 2))
    err_mlpg = np.sqrt(np.mean((sm - c) ** 2))
    assert err_mlpg < 0.5 * err_raw, (err_mlpg, err_raw)


def test_unobserved_rows_dropped():
    """var <= 0 marks a row unobserved: zero-variance delta rows reduce the
    solve to the static-only identity."""
    rng = np.random.default_rng(3)
    T, dim = 17, 2
    mean = rng.normal(size=(T, 2 * dim))
    var = np.concatenate([np.ones((T, dim)), np.zeros((T, dim))], axis=1)
    out = mlpg(mean, var, windows=DEFAULT_WINDOWS)
    np.testing.assert_allclose(out, mean[:, :dim], atol=1e-10)


def test_singular_normal_matrix_fails_loudly():
    """A column with every frame unobserved (var<=0 in all windows) makes
    the normal matrix singular; the solver must raise, not emit garbage
    (advisor r3: mlpg.cc degenerate-pivot clamp)."""
    import pytest

    T, dim = 9, 1
    mean = np.zeros((T, 2 * dim))
    var = np.zeros((T, 2 * dim))  # all unobserved
    with pytest.raises(ValueError, match="singular"):
        mlpg(mean, var, windows=DEFAULT_WINDOWS)
