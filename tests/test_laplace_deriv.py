"""Laplace transform and spectral derivative tests."""
import numpy as np
import pytest

from pyfft_tpu.laplace import laplace_1d
from pyfft_tpu.deriv import fft_deriv, rescale, unscale
from pyfft_tpu.utils.interp import rect


def _ref_laplace(uin, interval):
    """Direct transcription of the reference loop (laplace.py:93-113)."""
    uin = np.array(uin)[::-1]
    d = []
    for sigma in interval:
        e = np.exp(sigma * np.arange(len(uin), dtype=float))
        e /= np.sum(e)
        d.append((e * uin)[::-1])
    return np.array([np.fft.rfft(k) for k in d])


def test_laplace_golden():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(64)
    interval = np.arange(-1, 1.01, 0.1)
    ours = laplace_1d(x, real_sigma_interval=interval)
    ref = _ref_laplace(x, interval)
    np.testing.assert_allclose(ours, ref, rtol=1e-8, atol=1e-10)


def test_laplace_default_grid_shape():
    x = np.sin(np.linspace(0, 6.28, 32))
    out = laplace_1d(x)
    assert out.shape == (2001, 17)
    assert np.all(np.isfinite(out))


def test_laplace_sigma_zero_is_rfft():
    x = np.sin(np.linspace(0, 6.28, 32))
    out = laplace_1d(x, real_sigma_interval=np.array([0.0]))
    np.testing.assert_allclose(out[0], np.fft.rfft(x) / 32.0, atol=1e-10)


def test_rescale_roundtrip():
    x = np.linspace(3, 9, 50)
    y = np.sin(x) * 5 + 2
    xs, ys, scl = rescale(x, y)
    xb, yb = unscale(xs, ys, scl)
    np.testing.assert_allclose(xb, x, atol=1e-12)
    np.testing.assert_allclose(yb, y, atol=1e-12)


@pytest.mark.parametrize("modified", [True, False])
def test_fft_deriv_periodic_sine(modified):
    # reference case 5 (fft_analysis.py:1629-1636): periodic sine
    N = 2000
    L = 13.0
    dx = L / N
    xx = dx * np.arange(N)
    xx = 6.0 * np.pi * xx / L
    yy = np.sin(xx)
    dy = np.cos(xx)
    xx, yy, dy = xx[:-1], yy[:-1], dy[:-1]
    dydt, xo = fft_deriv(yy, xx, modified=modified)
    core = slice(5, -5)
    err = np.abs(dydt[core] - dy[core])
    if modified:
        assert err.max() < 5e-2
    else:
        # the unmodified wavenumber rings near the edges (the reason the
        # modified variant exists); the bulk is still accurate
        assert np.median(err) < 1e-2


def test_fft_deriv_gaussian():
    # reference case 2: gaussian and its analytic derivative
    N = 2000
    L = 13.0
    dx = L / N
    xx = dx * np.arange(N)
    yy = np.exp(-0.5 * (xx / L) ** 2 / 0.0625)
    dy = (-(xx / L) / L / 0.0625) * yy
    dydt, xo = fft_deriv(yy, xx, modified=True)
    core = slice(20, -20)
    err = np.max(np.abs(dydt[core] - dy[core])) / np.max(np.abs(dy))
    assert err < 0.05


def test_fft_deriv_line():
    # reference case 3: linear ramp -> constant derivative in the interior
    N = 2000
    xx = np.linspace(0, 13.0, N, endpoint=False)
    yy = np.linspace(-1.2, 11.3, num=N, endpoint=True)
    a = (yy[-1] - yy[0]) / (xx[-1] - xx[0])
    dydt, _ = fft_deriv(yy, xx, modified=True)
    core = slice(N // 4, -N // 4)
    assert abs(np.median(dydt[core]) - a) / a < 0.05


def test_rect_helper():
    np.testing.assert_array_equal(rect(np.array([-1.0, -0.5, 0.0, 0.5, 1.0])),
                                  [0.0, 0.5, 1.0, 0.5, 0.0])


def test_laplace_golden_vs_genuine_reference():
    """laplace_1d vs the GENUINE reference module (not a transcription)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "refshim"))
    import FFT.laplace as refl
    rng = np.random.default_rng(12)
    x = (np.exp(-0.002 * np.arange(600)) * np.sin(0.21 * np.arange(600))
         + 0.01 * rng.standard_normal(600))
    interval = np.arange(-0.5, 0.5, 0.01)
    ours = np.asarray(laplace_1d(x, interval))
    ref = np.asarray(refl.laplace_1d(x, interval))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-6,
                               atol=1e-9 * np.max(np.abs(ref)))


def test_laplace_sigma_chunking_parity():
    """sigma-block chunking must be bit-identical to the single-block
    path (rows are independent), and the auto block size must bound the
    (block, N) weight intermediate at production signal lengths."""
    from pyfft_tpu.laplace import laplace_1d
    rng = np.random.default_rng(0)
    x = rng.standard_normal(513)
    sig = np.linspace(-0.4, 0.4, 23)
    whole = laplace_1d(x, real_sigma_interval=sig, sigma_block=23)
    chunked = laplace_1d(x, real_sigma_interval=sig, sigma_block=5)
    np.testing.assert_array_equal(np.asarray(whole), np.asarray(chunked))
    auto = laplace_1d(x, real_sigma_interval=sig)
    np.testing.assert_array_equal(np.asarray(whole), np.asarray(auto))


def test_laplace_large_signal_bounded_memory():
    """A 2^21-sample signal with a sigma grid: the auto block keeps the
    weight intermediate at <= 2^25 float64 elements (256 MB) per block
    instead of nsigma*N (the reference's default grid would need ~34 GB),
    and the pole row still dominates."""
    from pyfft_tpu.laplace import laplace_1d
    N = 1 << 21
    fs = 1e5
    t = np.arange(N) / fs
    d, f0 = 40.0, 9e3
    x = (np.exp(-d * t) * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
    sig = np.linspace(-2e-3, 2e-3, 9) / fs * fs   # small grid, big N
    LP = laplace_1d(x, real_sigma_interval=sig)
    assert LP.shape == (9, N // 2 + 1)
    # auto block must bound the intermediate: block*N <= 2^25
    assert max(1, (1 << 25) // N) * N <= (1 << 25)
    ipk = int(np.argmax(np.abs(LP[4])))
    assert abs(ipk * fs / N - f0) < 3 * fs / N
