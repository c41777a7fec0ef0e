"""Pin the long-tail reference API surface: fftanal._plot* statics
(fft_analysis.py:2643-2810), PCA demo functions (PCA.py:43-137),
dft.test/print_list (dft.py:136-236), heatpulse.fit_neprofile
(HeatPulse_Funcs.py:72) and the reference dunder class names."""
import numpy as np
import pytest

import pyfft_tpu
from pyfft_tpu import dft, heatpulse, pca
from pyfft_tpu.fftanal import fftanal


def test_fftanal_plot_statics_smoke():
    import matplotlib
    matplotlib.use("Agg", force=True)
    import matplotlib.pyplot as plt
    freq = np.linspace(0.0, 5e3, 64)
    P = np.abs(np.random.default_rng(0).standard_normal(64)) + 1e-3
    Cxy = 0.9 * np.exp(1j * 0.1 * np.arange(64))
    for fn in (fftanal._plotCoherence, fftanal._plotRMSCoherence,
               fftanal._plotMeanSquaredCoherence):
        ax = fn(freq, Cxy, Navr=8)
        assert ax is not None
    for fn in (fftanal._plotAmp, fftanal._plotlogAmp, fftanal._plotsemilogAmp):
        assert fn(freq, P, P, P) is not None
    assert fftanal._plotPhase(freq, np.angle(Cxy)) is not None
    t = np.linspace(0, 1, 128)
    assert fftanal._plotSignal(t, np.sin(t) + 1j * np.cos(t),
                               tbounds=[0.1, 0.9]) is not None
    assert fftanal._plotSignal([t, t], [np.sin(t), np.cos(t)]) is not None
    tseg = np.linspace(0, 1, 16)
    Pseg = np.abs(np.random.default_rng(1).standard_normal((16, 64))) + 1e-3
    assert fftanal._plotspec(tseg, freq, Pseg) is not None
    assert fftanal._plot_quantity(freq, P, scl=1e-6) is not None
    plt.close("all")


def test_pca_demos():
    data = pca.test_data(np.random.default_rng(3))
    trans = pca.test(data, plotit=False)
    assert trans.shape == (150, 3)
    # the two planted clusters must separate along some retained PC
    sep = np.abs(np.mean(trans[:50], 0) - np.mean(trans[50:], 0))
    assert np.max(sep) > 0.5
    orig, rec = pca.test_PCA(data, plotit=False)
    assert rec.shape == (150, 2)


def test_dft_demo_roundtrip():
    (a, f, p), found = dft.test(np.random.default_rng(5), verbose=False)
    hits = [(i, amp) for i, amp, _ in found if i == int(f)]
    assert hits and abs(hits[0][1] - a) < 1e-6


def test_print_list(capsys):
    dft.print_list([1, 2])
    out = capsys.readouterr().out
    assert out.splitlines() == ["[2]: {", "1", "2", "}"]


def test_fit_neprofile_contract():
    rng = np.random.default_rng(0)
    roa = np.linspace(0.05, 0.95, 25)
    ne = (6e19 * (1 - roa**2) ** 1.5 + 1e18) * np.exp(
        0.02 * rng.standard_normal(25))
    q = dict(roa=roa, ne=ne, varne=(0.02 * ne) ** 2)
    rvec = np.linspace(0.1, 0.9, 50)
    logne, varlogne, dln, vardln = heatpulse.fit_neprofile(q, rvec)
    truth = np.log(6e19 * (1 - rvec**2) ** 1.5 + 1e18)
    assert np.max(np.abs(logne - truth)) < 0.04      # 2 sigma of the noise
    assert np.all(varlogne >= 0) and np.all(vardln >= 0)
    _, _, dn, _ = heatpulse.fit_neprofile(q, rvec, loggradient=False)
    mid = rvec > 0.3
    ana = -3.0 * rvec * np.sqrt(1 - rvec**2) * 6e19
    assert np.all(dn[mid] < 0)
    assert np.max(np.abs(dn[mid] - ana[mid]) / np.abs(ana[mid])) < 0.15


def test_reference_dunder_class_names():
    assert heatpulse.__HeatPulse_base__ is heatpulse.HeatPulseBase
    assert heatpulse.__HeatPulse_FFTbase__ is heatpulse.HeatPulseFFT
