"""The runnable example surface (reference test_* parity demos)."""
import numpy as np

import pyfft_tpu.fft_analysis as fft


def test_test_fftpwelch_runs_and_peaks():
    out1, out2 = fft.test_fftpwelch(nargout=2)
    freq, Pxy = out1[0], np.asarray(out1[1])
    ipk = int(np.argmax(np.abs(Pxy)))
    assert abs(freq[ipk] - 150.0) < 10.0          # df*30 = 150 Hz line
    # second parameterization (minFreq=75) also resolves the line
    f2, P2 = out2[0], np.asarray(out2[1])
    assert abs(f2[int(np.argmax(np.abs(P2)))] - 150.0) < 75.0


def test_test_fftanal_runs():
    ft = fft.test_fftanal(nargout=1, N=2 ** 15, seed=0)
    ipk = int(np.argmax(np.abs(np.asarray(ft.Pxy))))
    dfbin = ft.freq[1] - ft.freq[0]
    assert abs(ft.freq[ipk] - 150.0) <= dfbin
    assert abs(np.angle(np.asarray(ft.Pxy))[ipk] + np.pi / 4) < 0.3


def test_create_turb_spectra_shapes():
    lags, Rxy, freq, Pxy = fft.create_turb_spectra()
    assert lags.shape == Rxy.shape == freq.shape == Pxy.shape
    # Gaussian correlation -> Gaussian-ish spectrum centered at 0
    assert abs(freq[int(np.argmax(np.abs(Pxy)))]) < 1e3


def test_cross_validation_agreement():
    home, orac = fft.test()
    fh, Ph = home[0], np.asarray(home[2])
    fo, Po = orac[0], np.asarray(orac[2])
    ih, io = int(np.argmax(np.abs(Ph))), int(np.argmax(np.abs(Po)))
    assert abs(fh[ih] - fo[io]) < 2 * (fh[1] - fh[0])
    # PSD peak magnitudes agree between independent implementations
    np.testing.assert_allclose(np.abs(Ph[ih]), np.abs(Po[io]), rtol=0.05)
