"""scipy.signal as an independent oracle (SURVEY §4 test plan (c)).

The reference-golden tests pin bit-level parity; these pin the *physics*
against a third implementation with different internals: scipy's Welch /
CSD / coherence must agree with ours bin-for-bin (up to the framework's
last-retained-bin convention) when segmentation and detrending match.
"""
import numpy as np
from scipy import signal as sps

import pyfft_tpu as ft
from pyfft_tpu import segmentation as seg
from pyfft_tpu.spectral import welch_cross_spectra


def _signals():
    fs = 1.0e4
    nwins, overlap = 1024, 0.5
    hop = nwins - seg.get_noverlap(nwins, overlap)
    navr = 12
    n = (navr - 1) * hop + nwins        # exact segment fit
    t = np.arange(n) / fs
    rng = np.random.default_rng(3)
    x = np.sin(2 * np.pi * 777.0 * t) + 0.2 * rng.standard_normal(n)
    y = 0.5 * np.sin(2 * np.pi * 777.0 * t - 0.6) \
        + 0.2 * rng.standard_normal(n)
    # remove means up front: scipy's 'constant' detrend is per-segment,
    # the framework's (reference semantics) is global-span — with zero-mean
    # inputs and detrending off, the two pipelines compute the same thing
    x -= x.mean()
    y -= y.mean()
    return fs, nwins, overlap, navr, t, x, y


def test_welch_psd_matches_scipy():
    fs, nwins, overlap, navr, t, x, y = _signals()
    plan = seg.plan_segments(len(x), nwins=nwins, windowoverlap=overlap)
    assert plan.navr == navr
    win = np.hanning(nwins + 1)[:-1]

    out = welch_cross_spectra(x, y[None, :], win, plan, fs=fs,
                              onesided=True, detrend_style=0)
    f_sp, P_sp = sps.welch(x, fs=fs, window=win, nperseg=nwins,
                           noverlap=plan.noverlap, detrend=False,
                           scaling="density")
    nny = plan.nnyquist
    np.testing.assert_allclose(out["freq"][:nny - 1], f_sp[:nny - 1],
                               rtol=1e-12)
    # interior bins (the frameworks differ on the final retained bin)
    np.testing.assert_allclose(np.real(out["Pxx"])[1:nny - 1],
                               P_sp[1:nny - 1], rtol=1e-7, atol=1e-12)


def test_csd_and_coherence_match_scipy():
    fs, nwins, overlap, navr, t, x, y = _signals()
    plan = seg.plan_segments(len(x), nwins=nwins, windowoverlap=overlap)
    win = np.hanning(nwins + 1)[:-1]
    out = welch_cross_spectra(x, y[None, :], win, plan, fs=fs,
                              onesided=True, detrend_style=0)
    nny = plan.nnyquist

    _, C_sp = sps.csd(x, y, fs=fs, window=win, nperseg=nwins,
                      noverlap=plan.noverlap, detrend=False,
                      scaling="density")
    # scipy csd = E[conj(X) Y]; the framework follows the reference's
    # Pxy = Y conj(X)... both equal here up to conjugation convention
    ours = out["Pxy"][:, 0] if out["Pxy"].ndim == 2 else out["Pxy"]
    ours = np.asarray(ours).reshape(-1)[:nny]
    np.testing.assert_allclose(np.abs(ours[1:nny - 1]),
                               np.abs(C_sp[1:nny - 1]), rtol=1e-7,
                               atol=1e-12)
    np.testing.assert_allclose(np.abs(np.angle(ours[1:nny - 1])),
                               np.abs(np.angle(C_sp[1:nny - 1])),
                               rtol=1e-5, atol=1e-8)

    _, coh_sp = sps.coherence(x, y, fs=fs, window=win, nperseg=nwins,
                              noverlap=plan.noverlap, detrend=False)
    Pxx = np.real(out["Pxx"]).reshape(-1)[:nny]
    Pyy = np.real(out["Pyy"]).reshape(-1)[:nny]
    coh_ours = np.abs(ours) ** 2 / (Pxx * Pyy)
    np.testing.assert_allclose(coh_ours[1:nny - 1], coh_sp[1:nny - 1],
                               rtol=1e-6, atol=1e-9)


def test_stft_matches_scipy_spectrogram_track():
    """Chirp ridge from our STFT equals scipy's spectrogram ridge."""
    fs, n = 8000.0, 1 << 15
    t = np.arange(n) / fs
    f_inst = 200.0 + (3000.0 - 200.0) * t / t[-1]
    x = np.sin(2 * np.pi * np.cumsum(f_inst) / fs)

    plan = seg.plan_segments(n, nwins=512, windowoverlap=0.5)
    win = np.hanning(513)[:-1]
    from pyfft_tpu.fftanal import stft_segments
    tt, freq, X, pseg = stft_segments(x, t, win, plan, fs, onesided=True)
    ridge_ours = freq[np.argmax(np.abs(X), axis=-1)]

    f_sp, t_sp, S = sps.spectrogram(x, fs=fs, window=win, nperseg=512,
                                    noverlap=plan.noverlap,
                                    detrend="constant")
    ridge_sp = f_sp[np.argmax(S, axis=0)]
    # same number of segments, ridges agree within one bin nearly always
    m = min(len(ridge_ours), len(ridge_sp))
    close = np.abs(ridge_ours[:m] - ridge_sp[:m]) <= (freq[1] - freq[0])
    assert np.mean(close) > 0.95
