"""Pallas fused Welch kernel (interpret mode on CPU) vs the standard paths."""
import numpy as np
import pytest

import pyfft_tpu as ft
from pyfft_tpu.ops.pallas_welch import welch_power_pallas


def test_kernel_matches_numpy():
    rng = np.random.default_rng(0)
    B, nwins, nch, nny = 37, 256, 3, 128
    xfr = rng.standard_normal((B, nwins)).astype(np.float32)
    yfr = rng.standard_normal((nch, B, nwins)).astype(np.float32)
    win = np.hanning(nwins + 1)[:-1]
    Pxx, Pyy, Pr, Pi = welch_power_pallas(xfr, yfr, win, nny, interpret=True)
    X = np.fft.fft(xfr * win, axis=-1)[:, :nny]
    Y = np.fft.fft(yfr * win, axis=-1)[..., :nny]
    np.testing.assert_allclose(np.asarray(Pxx),
                               np.sum(np.abs(X) ** 2, axis=0),
                               rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(Pyy),
                               np.sum(np.abs(Y) ** 2, axis=1),
                               rtol=2e-5, atol=1e-4)
    rPxy = np.sum(Y * np.conj(X)[None], axis=1)
    np.testing.assert_allclose(np.asarray(Pr) + 1j * np.asarray(Pi), rPxy,
                               rtol=2e-5, atol=1e-4)


def test_fft_pwelch_pallas_backend_matches_xla():
    rng = np.random.default_rng(1)
    N = 2 ** 13
    t = np.arange(N) / 1e3
    x = np.sin(2 * np.pi * 97.0 * t) + 0.1 * rng.standard_normal(N)
    y = np.sin(2 * np.pi * 97.0 * t - 0.5) + 0.1 * rng.standard_normal(N)
    args = dict(tbounds=[t[1], t[-2]], Navr=8, windowfunction="hanning",
                detrend_style=1, plotit=False, verbose=False)
    f1, Pxy1, Pxx1, *_ = ft.fft_pwelch(t, x, y, fft_backend="xla", **args)
    f2, Pxy2, Pxx2, *_ = ft.fft_pwelch(t, x, y, fft_backend="pallas", **args)
    np.testing.assert_allclose(f1, f2, atol=1e-9)
    np.testing.assert_allclose(np.asarray(Pxx2), np.asarray(Pxx1),
                               rtol=5e-5, atol=1e-9)
    np.testing.assert_allclose(np.asarray(Pxy2), np.asarray(Pxy1),
                               rtol=5e-5, atol=1e-9)


def test_pallas_backend_falls_back_for_complex():
    rng = np.random.default_rng(2)
    N = 4096
    t = np.arange(N) / 1e3
    z = (rng.standard_normal(N) + 1j * rng.standard_normal(N))
    f, Pxy, Pxx, *_ = ft.fft_pwelch(t, z, z, tbounds=[t[1], t[-2]], Navr=8,
                                    fft_backend="pallas", plotit=False,
                                    verbose=False)
    assert np.all(np.isfinite(np.asarray(Pxx)))
    assert len(f) == np.asarray(Pxx).shape[0]
