"""Parity demo/test functions appended to each module (reference test_*)."""
import numpy as np

import pyfft_tpu as ft
import pyfft_tpu.fft_analysis as fftmod


def test_fft_deriv_cases():
    out = fftmod.test_fft_deriv(modified=True)
    assert set(out) == {"box", "gaussian", "line", "sine_aperiodic",
                        "sine_periodic"}
    # the periodic sine derivative matches cos tightly
    xx, yy, dy, dyf = out["sine_periodic"]
    assert np.max(np.abs(dyf - dy)) < 1e-3      # modified wavenumber ~ O(k dx^2)
    # the gaussian derivative matches to reasonable accuracy
    xx, yy, dy, dyf = out["gaussian"]
    # boundary ringing (aperiodic gaussian) bounds the absolute error
    assert np.max(np.abs(dyf - dy)) < 0.05


def test_hilbert_oracle():
    z = ft.hilbert_mod.test_hilbert()
    assert z.shape == (1024,)


def test_laplace_demo():
    sigma, freq, LP = ft.laplace_mod.test_laplace()
    assert LP.shape == (len(sigma), len(freq))
    # the pole row (sigma matching the damping) has the sharpest line:
    # peak |L| over the grid lands near f0 = 120 Hz
    i, j = np.unravel_index(np.argmax(np.abs(LP)), LP.shape)
    assert abs(freq[j] - 120.0) < 10.0


def test_ccf_demos():
    tau, co, expected = ft.ccf_mod.ccf_test()
    pk = tau[int(np.argmax(co))]
    assert abs(pk - expected) < 5e-5          # noisy eyeball oracle (ref :148)
    tau2, co2, expected2 = ft.ccf_mod.ccf_sh_test()
    assert abs(tau2[int(np.argmax(co2))] - expected2) < 2e-4


def test_spectrogram_demos():
    out = ft.spectrogram.test_stft(Nper=11, npts=4e3)
    assert out is not None
    tspec, fAxis, S = ft.spectrogram.test_specgram(Nper=11, npts=4e3)
    S = np.asarray(S)
    assert S.ndim == 2 and np.all(np.isfinite(S))


def test_smooth_demo():
    out = ft.filters.smooth_demo()
    assert set(out) == {"flat", "hanning", "hamming", "bartlett",
                        "blackman"}
    for y in out.values():
        # reference's odd-window slicing returns n+1 samples (:285)
        assert y.shape == (101,) and np.all(np.isfinite(y))
