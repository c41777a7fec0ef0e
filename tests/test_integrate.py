"""Statistics toolbox golden parity vs the genuine reference."""
import numpy as np
import pytest

import pyfft_tpu as ft
from pyfft_tpu.integrate import (integratespectra, varcoh, varphi, mean_angle,
                                 unwrap_tol, monticoh, montiphi, getNpeaks)


def _spectra(n=200, nch=1, seed=0):
    rng = np.random.default_rng(seed)
    freq = np.linspace(0, 500, n)
    shape = (n,) if nch == 1 else (n, nch)
    Pxx = 1.0 + rng.random(shape)
    Pyy = 1.0 + rng.random(shape)
    Pxy = (rng.random(shape) - 0.5) + 1j * (rng.random(shape) - 0.5)
    varPxx = 0.01 * rng.random(shape)
    varPyy = 0.01 * rng.random(shape)
    varPxy = 0.01 * (rng.random(shape) + 1j * rng.random(shape))
    return freq, Pxy, Pxx, Pyy, varPxy, varPxx, varPyy


def test_varcoh_golden(ref_fft):
    _, Pxy, Pxx, Pyy, vxy, vxx, vyy = _spectra()
    for ms in (True, False):
        o = varcoh(Pxy, vxy, Pxx, vxx, Pyy, vyy, meansquared=ms)
        r = ref_fft.varcoh(Pxy, vxy, Pxx, vxx, Pyy, vyy, meansquared=ms)
        np.testing.assert_allclose(o[0], r[0], rtol=1e-12)
        np.testing.assert_allclose(o[1], r[1], rtol=1e-12)


def test_varphi_golden(ref_fft):
    _, Pxy, _, _, vxy, _, _ = _spectra()
    for ar in (np.pi, 0.4):
        o = varphi(Pxy.real, Pxy.imag, vxy.real, vxy.imag, angle_range=ar)
        r = ref_fft.varphi(Pxy.real, Pxy.imag, vxy.real, vxy.imag,
                           angle_range=ar)
        np.testing.assert_allclose(o[0], r[0], rtol=1e-12)
        np.testing.assert_allclose(o[1], r[1], rtol=1e-12)


def test_mean_angle_golden(ref_fft):
    rng = np.random.default_rng(1)
    phi = rng.uniform(-np.pi, np.pi, (16, 5))
    vphi = 0.01 * rng.random((16, 5))
    o = mean_angle(phi, vphi, dim=0)
    r = ref_fft.mean_angle(phi, vphi, dim=0)
    np.testing.assert_allclose(o[0], r[0], rtol=1e-12)
    np.testing.assert_allclose(o[1], r[1], rtol=1e-12)


def test_unwrap_tol_golden(ref_fft):
    rng = np.random.default_rng(2)
    ph = np.cumsum(rng.uniform(-0.5, 0.7, 300))
    wrapped = np.angle(np.exp(1j * ph))
    o = unwrap_tol(wrapped.copy())
    r = ref_fft.unwrap_tol(wrapped.copy())
    np.testing.assert_allclose(o, r, rtol=1e-10, atol=1e-12)


def test_integratespectra_golden(ref_fft):
    freq, Pxy, Pxx, Pyy, vxy, vxx, vyy = _spectra()
    frange = [100.0, 300.0]
    o = integratespectra(freq, Pxy, Pxx, Pyy, frange, vxy, vxx, vyy)
    r = ref_fft.integratespectra(freq, Pxy.copy(), Pxx.copy(), Pyy.copy(),
                                 frange, vxy, vxx, vyy)
    for i, name in [(0, "Pxy_i"), (1, "Pxx_i"), (2, "Pyy_i"), (3, "Cxy_i"),
                    (4, "ph_i")]:
        np.testing.assert_allclose(np.ravel(o[i]), np.ravel(r[i]),
                                   rtol=1e-9, atol=1e-12, err_msg=name)
    np.testing.assert_allclose(np.ravel(o[5].varph_i),
                               np.ravel(r[5].varph_i), rtol=1e-9)


def test_integratespectra_default_variances():
    # the reference crashes on omitted variances (np.size_like); ours works
    freq, Pxy, Pxx, Pyy, *_ = _spectra()
    out = integratespectra(freq, Pxy, Pxx, Pyy, [100, 300])
    assert np.isfinite(out[0]).all()


def test_integrate_recovers_known_power():
    # integral of a flat unit PSD over [f0, f1] = f1 - f0
    freq = np.linspace(0, 100, 1001)
    P = np.ones_like(freq)
    Pxy = P.astype(complex)
    out = integratespectra(freq, Pxy, P, P, [20.0, 60.0])
    np.testing.assert_allclose(np.real(out[1]).ravel(), 40.0, rtol=1e-3)


def test_monticoh_montiphi_statistics():
    rng = np.random.default_rng(3)
    _, Pxy, Pxx, Pyy, vxy, vxx, vyy = _spectra(n=32)
    g2, vg2 = monticoh(Pxy, vxy, Pxx, vxx, Pyy, vyy, nmonti=400, rng=rng)
    assert g2.shape == Pxy.shape and np.isfinite(g2).all()
    ph, vph = montiphi(Pxy, vxy, nmonti=400, rng=rng)
    direct = np.arctan2(Pxy.imag, Pxy.real)
    # MC mean phase tracks the direct phase within MC noise
    assert np.median(np.abs(np.angle(np.exp(1j * (ph - direct))))) < 0.2


def test_getNpeaks_finds_planted_tones():
    fs = 1e3
    t = np.arange(2 ** 13) / fs
    x = (np.sin(2 * np.pi * 100 * t) + 0.5 * np.sin(2 * np.pi * 222 * t)
         + 0.25 * np.sin(2 * np.pi * 333 * t))
    peaks = getNpeaks(3, t, x, x, Navr=8, plotit=False, verbose=False)
    freqs = sorted(p[1] for p in peaks)
    assert abs(freqs[0] - 100) < 5
    assert abs(freqs[1] - 222) < 5
    assert abs(freqs[2] - 333) < 5


def test_getNpeaks_golden_vs_reference(ref_fft):
    """Golden parity of the peak-picker incl. the edge-blanking branches
    (reference getNpeaks, fft_analysis.py:940-1027): one tone near DC so a
    blanking window clips the start of the range, one near Nyquist."""
    rng = np.random.default_rng(4)
    fs, N = 1e3, 2 ** 12
    t = np.arange(N) / fs
    x = (1.0 * np.sin(2 * np.pi * 12.0 * t)          # near-DC peak
         + 0.8 * np.sin(2 * np.pi * 180.0 * t)
         + 0.6 * np.sin(2 * np.pi * 480.0 * t)       # near Nyquist
         + 0.01 * rng.standard_normal(N))
    kw = dict(tbounds=[t[1], t[-2]], Navr=8, plotit=False, verbose=False)
    ours = getNpeaks(3, t, x, x, **kw)
    ref = ref_fft.getNpeaks(3, t, x, x, **kw)
    assert len(ours) == len(ref) == 3
    for (a1, f1, p1), (a2, f2, p2) in zip(ours, ref):
        np.testing.assert_allclose(f1, f2, atol=1e-9)
        np.testing.assert_allclose(a1, a2, rtol=1e-7)
        np.testing.assert_allclose(p1, p2, atol=1e-7)


def test_getNpeaks_fmin_fmax_and_minsep(ref_fft):
    """Range restriction + minsep blanking parity."""
    rng = np.random.default_rng(5)
    fs, N = 1e3, 2 ** 12
    t = np.arange(N) / fs
    x = (np.sin(2 * np.pi * 100.0 * t) + 0.7 * np.sin(2 * np.pi * 110.0 * t)
         + 0.01 * rng.standard_normal(N))
    kw = dict(tbounds=[t[1], t[-2]], Navr=8, plotit=False, verbose=False,
              fmin=50.0, fmax=400.0, minsep=3)
    ours = getNpeaks(2, t, x, x, **kw)
    ref = ref_fft.getNpeaks(2, t, x, x, **kw)
    for (a1, f1, p1), (a2, f2, p2) in zip(ours, ref):
        np.testing.assert_allclose(f1, f2, atol=1e-9)
        np.testing.assert_allclose(a1, a2, rtol=1e-7)


def test_getNpeaks_plateau_and_span_parity(ref_fft):
    """Plateau peaks (two equal-power adjacent bins from a tone exactly
    between bin centers) and even/odd integration spans must match the
    reference's refinement bin-for-bin (fft_analysis.py:940-1027)."""
    fs, N = 1e3, 2 ** 12
    t = np.arange(N) / fs
    # tone exactly between two Welch bins -> flat-top (plateau) peak
    plan_df = fs / 512.0
    f_half = 100.0 + plan_df / 2.0
    x = (np.sin(2 * np.pi * f_half * t)
         + 0.5 * np.sin(2 * np.pi * 333.0 * t))
    for minsep in (2, 3):                       # even + odd blank spans
        kw = dict(tbounds=[t[1], t[-2]], Navr=8, plotit=False,
                  verbose=False, minsep=minsep)
        ours = getNpeaks(2, t, x, x, **kw)
        ref = ref_fft.getNpeaks(2, t, x, x, **kw)
        assert len(ours) == len(ref) == 2
        for (a1, f1, p1), (a2, f2, p2) in zip(ours, ref):
            np.testing.assert_allclose(f1, f2, atol=1e-9)
            np.testing.assert_allclose(a1, a2, rtol=1e-7)
            np.testing.assert_allclose(p1, p2, atol=1e-7)
