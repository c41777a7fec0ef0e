"""Correlation toolbox, Doppler/COG, PCA, and pedagogical DFT tests."""
import numpy as np
import pytest

from pyfft_tpu import ccf_mod
from pyfft_tpu import doppler, pca
from pyfft_tpu import dft as dft_mod


# ------------------------------ ccf ---------------------------------------- #

def test_ccf_known_phase_lag():
    # reference ccf_test (ccf.py:139-156): 50-degree lag at 1 kHz
    fs = 1e5
    N = 2048
    f = 1e3
    phi = 50 * np.pi / 180
    rng = np.random.default_rng(0)
    t = np.arange(0, N) / fs
    x1 = np.sin(2 * np.pi * f * t) + 0.1 * rng.standard_normal(N)
    x2 = np.sin(2 * np.pi * f * t + phi) + 0.1 * rng.standard_normal(N)
    tau, co = ccf_mod.ccf(x1, x2, fs)
    expected = -phi / (2 * np.pi * f)
    lag_at_peak = tau[np.argmax(co)]
    assert abs(lag_at_peak - expected) < 2.0 / fs


def test_ccf_matches_numpy_correlate():
    rng = np.random.default_rng(1)
    x1 = rng.standard_normal(500)
    x2 = rng.standard_normal(500)
    tau, co = ccf_mod.ccf(x1, x2, 1.0)
    ref = np.correlate(x1 - x1.mean(), x2 - x2.mean(), mode="full")
    ref = ref / (len(x1) * x1.std() * x2.std())
    np.testing.assert_allclose(co, ref, rtol=1e-8, atol=1e-10)


def test_ccf_sh_shapes_and_average():
    fs = 1e4
    rng = np.random.default_rng(2)
    x = rng.standard_normal(2048)
    y = np.roll(x, 3)
    tau, csh = ccf_mod.ccf_sh(x, y, fs, nav=64)
    assert csh.shape == tau.shape
    assert np.isfinite(csh).all()


def test_align_signals_recovers_shift():
    rng = np.random.default_rng(3)
    a = rng.standard_normal(512)
    for true_shift in (0, 5, 17):
        b = np.concatenate([np.zeros(true_shift), a])[:len(a)]
        est = ccf_mod.align_signals(a, b)
        assert abs(abs(est) - true_shift) <= 1


def test_conv_corr_identities():
    x = [1.0, 2.0, 3.0]
    y = [0.5, -1.0, 2.0, 1.0]
    np.testing.assert_allclose(ccf_mod.conv(x, y), np.convolve(x, y))
    # corr layout: [t=0..Q-1] + [t=-(P-1)..-1] with R(t)=sum x[i] y[i+t]
    out = ccf_mod.corr(x, y)
    P, Q = len(x), len(y)
    direct = []
    for t in list(range(Q)) + list(range(-(P - 1), 0)):
        direct.append(sum(x[i] * y[i + t] for i in range(P)
                          if 0 <= i + t < Q))
    np.testing.assert_allclose(out, direct)


def test_fftconv_fftcorr():
    rng = np.random.default_rng(4)
    n = 32
    x = np.zeros(n)
    y = np.zeros(n)
    x[:12] = rng.standard_normal(12)
    y[:10] = rng.standard_normal(10)
    np.testing.assert_allclose(np.real(ccf_mod.fftconv(x, y)),
                               np.convolve(x, y)[:n], atol=1e-8)
    ref = np.real(np.fft.ifft(np.conj(np.fft.fft(x)) * np.fft.fft(y)))
    np.testing.assert_allclose(np.real(ccf_mod.fftcorr(x, y)), ref, atol=1e-8)


# ------------------------------ doppler / cog ------------------------------ #

def test_cog_of_pure_tone():
    fs = 1e4
    t = np.arange(4096) / fs
    x = np.exp(2j * np.pi * 1500.0 * t)     # analytic tone at +1.5 kHz
    c = doppler.cog(x, fs)
    assert abs(c - 1500.0) < 5.0


def test_cog_band_selection():
    fs = 1e4
    t = np.arange(4096) / fs
    x = np.exp(2j * np.pi * 1500.0 * t) + np.exp(2j * np.pi * 300.0 * t)
    c = doppler.cog(x, fs, fmin=1000.0, fmax=3000.0)
    assert abs(c - 1500.0) < 10.0


def test_cogspec_runs():
    fs = 1e4
    t = np.arange(2 ** 14) / fs
    x = np.sin(2 * np.pi * (1000 + 300 * np.sin(2 * np.pi * 3 * t)) * t)
    out = doppler.cogspec(t, x, fs, win=64, plotit=0)
    assert out["cogspec"].shape[1] == len(out["cogspecf"])
    assert np.isfinite(out["cog"]).all()


@pytest.mark.slow
def test_doppler_chain_recovers_shift():
    # config #5 oracle: the synthetic SSB chain demodulates to z = -j e^{j
    # (2 pi fsig t + psig)} -> the Doppler line appears at +fsig
    ft_obj = doppler.test_DopplerSignal(N=2 ** 19, plotit=False)
    freq = np.asarray(ft_obj.freq)
    Lxx = np.abs(np.asarray(ft_obj.Lxx))
    pk = freq[np.argmax(Lxx)]
    binw = freq[1] - freq[0]
    assert abs(pk - 10e3) < 1.1 * binw


# ------------------------------ pca ---------------------------------------- #

def test_pca_variance_ordering():
    data = pca.test_data(np.random.default_rng(5))
    U, E, V = pca.basic_pca(data.copy(), 3)
    assert E[0] >= E[1] >= E[2]
    assert U.shape == (150, 3)


def test_pca_reconstruction():
    rng = np.random.default_rng(6)
    data = rng.standard_normal((100, 4)) @ np.diag([5.0, 2.0, 0.5, 0.1])
    trans, evals, evecs = pca.PCA(data.copy(), dims_rescaled_data=4)
    centered = data - data.mean(axis=0)
    recon = trans @ evecs.T
    np.testing.assert_allclose(recon, centered, atol=1e-8)


def test_cov_normalization():
    rng = np.random.default_rng(7)
    d = rng.standard_normal((50, 3))
    d -= d.mean(axis=0)
    np.testing.assert_allclose(pca.cov(d), (d.T @ d) / 50, atol=1e-12)


# ------------------------------ pedagogical dft ---------------------------- #

def test_dft_matches_numpy():
    rng = np.random.default_rng(8)
    x = rng.standard_normal(16) + 1j * rng.standard_normal(16)
    np.testing.assert_allclose(dft_mod.dft(list(x)), np.fft.fft(x), atol=1e-9)
    np.testing.assert_allclose(dft_mod.idft(dft_mod.dft(list(x))), x,
                               atol=1e-9)


def test_fft_basic_matches_numpy():
    rng = np.random.default_rng(9)
    n = 64
    xr = list(rng.standard_normal(n))
    xi = list(rng.standard_normal(n))
    ref = np.fft.fft(np.asarray(xr) + 1j * np.asarray(xi))
    dft_mod.fft_basic(xr, xi, n)
    np.testing.assert_allclose(xr, ref.real, atol=1e-9)
    np.testing.assert_allclose(xi, ref.imag, atol=1e-9)


def test_cooley_tukey_fft_matches_numpy():
    rng = np.random.default_rng(10)
    x = rng.standard_normal(32) + 1j * rng.standard_normal(32)
    np.testing.assert_allclose(dft_mod.fft(list(x)), np.fft.fft(x), atol=1e-9)
    np.testing.assert_allclose(dft_mod.ifft(dft_mod.fft(list(x))), x,
                               atol=1e-9)


def test_forward_inverse_dft():
    x = [1.0, 2.0, 0.5, -1.0]
    F = dft_mod.ForwardDFT(x)
    back = dft_mod.InverseDFT(F)
    np.testing.assert_allclose(np.real(back), x, atol=1e-12)


def test_ccf_golden_vs_genuine_reference():
    """ccf / ccf_sh / align_signals vs the GENUINE reference ccf module."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "refshim"))
    import FFT.ccf as refc
    from pyfft_tpu.ccf import ccf, ccf_sh, align_signals
    rng = np.random.default_rng(13)
    fs, nt = 1e4, 4096
    t = np.arange(nt) / fs
    x = np.sin(2 * np.pi * 500 * t) + 0.05 * rng.standard_normal(nt)
    y = np.roll(x, 37) + 0.05 * rng.standard_normal(nt)
    tau1, c1 = ccf(x, y, fs)
    tau2, c2 = refc.ccf(x, y, fs)
    np.testing.assert_allclose(np.asarray(tau1), tau2, atol=1e-12)
    np.testing.assert_allclose(np.asarray(c1), c2, rtol=1e-6, atol=1e-9)
    t1, c1s = ccf_sh(x, y, fs, nav=512)
    t2, c2s = refc.ccf_sh(x, y, fs, nav=512)
    np.testing.assert_allclose(np.asarray(c1s), c2s, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(t1), t2, atol=1e-12)


def test_pca_golden_vs_genuine_reference():
    """basic_pca / PCA vs the GENUINE reference PCA module (eigh of the
    covariance of standardized data; sign convention normalized)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "refshim"))
    import FFT.PCA as refp
    from pyfft_tpu.pca import basic_pca, PCA as ourPCA
    rng = np.random.default_rng(14)
    data = rng.standard_normal((300, 5)) @ np.diag([3, 2, 1, 0.5, 0.1])
    U1, E1, V1 = basic_pca(data.copy(), pc_count=3)
    U2, E2, V2 = refp.basic_pca(data.copy(), pc_count=3)
    np.testing.assert_allclose(np.asarray(E1), E2, rtol=1e-9)
    pr1 = np.asarray(U1)
    pr2 = np.asarray(U2)
    # eigenvector signs are arbitrary: compare column-wise up to sign
    for k in range(pr1.shape[1]):
        s = np.sign(np.dot(pr1[:, k], pr2[:, k])) or 1.0
        np.testing.assert_allclose(pr1[:, k], s * pr2[:, k], rtol=1e-7,
                                   atol=1e-9)
