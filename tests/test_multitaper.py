"""Multitaper estimator: Parseval, line recovery, scipy-oracle agreement,
leakage advantage over the periodogram, cross-spectrum phase."""
import numpy as np
import pytest

from pyfft_tpu.multitaper import multitaper_psd, multitaper_csd


FS, N = 1.0e4, 8192


@pytest.fixture(scope="module")
def tone():
    rng = np.random.default_rng(11)
    t = np.arange(N) / FS
    x = np.sin(2 * np.pi * 1250.0 * t) + 0.05 * rng.standard_normal(N)
    y = 0.6 * np.sin(2 * np.pi * 1250.0 * t - 0.7) \
        + 0.05 * rng.standard_normal(N)
    return t, x, y


@pytest.mark.parametrize("weighting", ["unity", "eigen", "adaptive"])
def test_parseval_and_peak(tone, weighting):
    _, x, _ = tone
    freq, S = multitaper_psd(x, fs=FS, NW=4, weighting=weighting)
    df = freq[1] - freq[0]
    assert abs(np.sum(S) * df - np.var(x)) < 0.05 * np.var(x)
    assert abs(freq[int(np.argmax(S))] - 1250.0) < 4 * df * 4  # within 2NW bins


def test_matches_scipy_multitaper_shape(tone):
    """Against a hand-rolled scipy-windows oracle (same tapers, unity)."""
    from scipy.signal.windows import dpss as sp_dpss

    _, x, _ = tone
    K = 7
    tapers = sp_dpss(N, 4, Kmax=K, sym=False)
    Sk = np.abs(np.fft.rfft(tapers * x[None, :], axis=-1)) ** 2
    # framework one-sided convention (reference fft_analysis.py:414-421):
    # nny = nfft/2 retained bins for even nfft, [1:-1] doubled
    nny = N // 2
    scale = np.ones(nny)
    scale[1:-1] = 2.0
    want = Sk.mean(axis=0)[:nny] * scale / FS

    freq, got = multitaper_psd(x, fs=FS, NW=4, K=K, weighting="unity")
    assert len(got) == nny
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-12)


def test_adaptive_beats_periodogram_leakage():
    """A strong line + weak line 40 dB down: adaptive multitaper resolves
    the weak line above the leakage floor better than a raw periodogram."""
    rng = np.random.default_rng(5)
    t = np.arange(N) / FS
    x = (np.sin(2 * np.pi * 1000.3 * t)
         + 1e-2 * np.sin(2 * np.pi * 3000.0 * t)
         + 1e-4 * rng.standard_normal(N))
    freq, S = multitaper_psd(x, fs=FS, NW=4)
    i_weak = int(np.argmin(np.abs(freq - 3000.0)))
    # local SNR of the weak line vs the surrounding floor
    floor = np.median(S[i_weak - 200:i_weak - 50])
    assert S[i_weak] / floor > 100.0


def test_csd_phase_and_coherence(tone):
    _, x, y = tone
    freq, Pxy, Pxx, Pyy, Cxy2, phi = multitaper_csd(x, y, fs=FS, NW=4)
    ipk = int(np.argmax(np.abs(Pxy)))
    assert abs(freq[ipk] - 1250.0) < 20.0
    assert Cxy2[ipk] > 0.95
    assert abs(phi[ipk] + 0.7) < 0.05
    with pytest.raises(ValueError):
        multitaper_csd(x, y[:-1], fs=FS)
