"""Heat-pulse driver: golden parity vs the genuine reference
``__HeatPulse_FFTbase__`` plus standalone behavior tests (physics sanity,
sorting/filtering, HDF5 round-trip, usesegs mode).
"""
import numpy as np
import pytest

import pyfft_tpu.heatpulse as hp


RUNINFO = dict(
    fmod=33.0, harms=np.asarray([1, 2]), intno2per=2, overlap=0.5,
    winfun="hanning", fwid=8.0, tbounds=np.asarray([0.25, 3.75]),
    DutyCycle=0.5, usesegs=False, igch=None, plotit=False, verbose=False,
    saveit=False, useMLAB=False, savedir=".", sfilename="hp", vmcfil="",
    xpname="synth",
)


@pytest.fixture(scope="module")
def data():
    return hp.synth_heatpulse_data(nch=6, fmod=33.0, fs=16.0e3, T=4.0)


@pytest.fixture(scope="module")
def ours(data):
    drv = hp.HeatPulseFFT(dict(RUNINFO), dict(data))
    drv.PreCheck()
    drv.run()
    return drv


def _run_reference(data):
    """Drive the genuine upstream __HeatPulse_FFTbase__ per-channel loop."""
    import FFT.HeatPulse_Funcs as refhp
    from pybaseutils import Struct

    runinfo = dict(RUNINFO)
    runinfo["afont"] = Struct({"fontname": "Arial", "fontsize": 14})
    hpdata = dict(data)
    hpdata["_refsig"] = hpdata.pop("refsig")
    hpdata["_sig"] = hpdata.pop("sig")

    drv = refhp.__HeatPulse_FFTbase__(runinfo=Struct(runinfo),
                                      HPdata=Struct(hpdata))
    drv.PreCheck()
    drv._PWELCH_chloop()
    return drv


def test_golden_vs_reference(data, ours):
    ref = _run_reference(data)
    assert ours.nwins == ref.nwins
    assert int(ours.Navr) == int(ref.Navr)
    np.testing.assert_array_equal(ours._ifk, ref._ifk)
    np.testing.assert_allclose(ours.fmods, ref.fmods, rtol=1e-12)
    # spectra captured identically (batched device call vs per-channel loop)
    np.testing.assert_allclose(ours.Pxy, ref.Pxy, rtol=1e-7, atol=1e-12)
    np.testing.assert_allclose(ours.Pyy, ref.Pyy, rtol=1e-7, atol=1e-12)
    # per-harmonic integrals and the full post-processing chain
    for fld in ("Txx", "Txy", "Vxy", "Amp", "varA", "Coh", "varC",
                "Phase", "varP", "Tnn", "RMSECHpower", "ModECHpower"):
        np.testing.assert_allclose(
            np.asarray(getattr(ours, fld)),
            np.asarray(getattr(ref, fld)), rtol=1e-6, atol=1e-10,
            err_msg=fld)


def test_physics_sanity(ours):
    # diffusive pulse: log-amplitude decreases and phase lag grows outward
    amp1 = ours.Amp[:, 0]
    assert np.all(np.diff(amp1) < 0), "fundamental amplitude must decay"
    # unwrap the (-2pi-0.3, 0.3]-branch profile: per-channel lag increment
    # must match the synthetic tau_lag (2 ms at 33 Hz -> 0.4147 rad)
    dlag = np.diff(np.unwrap(ours.Phase[:, 0]))
    np.testing.assert_allclose(dlag, 2 * np.pi * 33.0 * 2.0e-3, rtol=0.05)
    # fundamental harmonic pinned near fmod
    assert abs(ours.fmods[0] - 33.0) < 2.0
    # coherence near 1 on-harmonic for the cleanest channel
    assert ours.Coh[0, 0] > 0.95


def test_sort_and_filter(ours):
    # reversing a sorted order must reverse the per-channel results
    amp_orig = ours.Amp.copy()
    order = ours._sortECEdat_(sortby="RF")
    rev = order[::-1]
    ours.__sortECEdat__(rev)
    np.testing.assert_array_equal(ours.Amp, amp_orig[rev])
    ours.__sortECEdat__(np.argsort(rev))  # restore
    np.testing.assert_array_equal(ours.Amp, amp_orig)

    ours.usech = np.ones(int(ours.nch), dtype=bool)
    ours.usech[2] = False
    kept = ours.__chfilter__()
    assert kept.nch == int(ours.nch) - 1
    np.testing.assert_array_equal(
        kept.Amp, amp_orig[ours.usech])
    ours.usech[:] = True


def test_hdf5_roundtrip(tmp_path, ours):
    f = str(tmp_path / "hp.hdf5")
    fftres = ours._mkfftdict_()
    hp.save_hdf5(f, {"FFTResults": fftres})
    back = hp.loadFFTdata(f)
    np.testing.assert_allclose(back["Amp"], ours.Amp)
    np.testing.assert_allclose(back["Phase"], ours.Phase)
    np.testing.assert_allclose(back["fmods"], ours.fmods)
    # nested Inputs group round-trips scalars and strings
    hp.save_hdf5(f, {"Inputs": {"fmod": 33.0, "winfun": "hanning"}})
    inputs = hp.load_hdf5(f, "Inputs")
    assert inputs["fmod"] == 33.0 and inputs["winfun"] == "hanning"


def test_usesegs_smoke(data):
    runinfo = dict(RUNINFO)
    runinfo["usesegs"] = True
    drv = hp.HeatPulseFFT(runinfo, dict(data))
    drv.PreCheck()
    drv.run()
    assert drv.Amp.shape == (6, 2, int(drv.Navr))
    assert np.all(np.isfinite(drv.Coh))
    # segment-resolved fundamental amplitude still decays with radius
    assert np.all(np.diff(np.nanmean(drv.Amp[:, 0, :], axis=1)) < 0)


def test_igch_masks_channels(data):
    runinfo = dict(RUNINFO)
    runinfo["igch"] = np.asarray([2])        # 1-based channel number
    drv = hp.HeatPulseFFT(runinfo, dict(data))
    drv.PreCheck()
    assert not drv.usech[1] and drv.usech.sum() == 5


def test_perchannel_matches_batched(data):
    """The API-parity per-channel path (``_PWELCH_ch``, reference :532-574)
    must reproduce the batched ``_PWELCH_all`` device call exactly."""
    a = hp.HeatPulseFFT(dict(RUNINFO), dict(data))
    a.PreCheck()
    a._PWELCH_settings_()
    a._PWELCH_preallocate()
    a._PWELCH_all()

    b = hp.HeatPulseFFT(dict(RUNINFO), dict(data))
    b.PreCheck()
    b._PWELCH_settings_()
    b._PWELCH_preallocate()
    for ii in range(int(b.nch)):
        b._PWELCH_ch(ii)

    for name in ("Pxy", "Pyy", "Txy", "Amp", "Coh", "Phase", "Tnn",
                 "Txx", "Vxy", "varA", "varC", "varP"):
        got, want = getattr(b, name), getattr(a, name)
        np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-12,
                                   err_msg=name)


def test_integrate_spectra_usesegs_shapes(data):
    runinfo = dict(RUNINFO)
    runinfo["usesegs"] = True
    drv = hp.HeatPulseFFT(runinfo, dict(data))
    drv.PreCheck()
    drv._PWELCH_settings_()
    drv._PWELCH_preallocate()
    fftinfo = drv._PWELCH_all()
    navr = int(drv.Navr)
    # single-channel fftinfo for the per-channel compat API
    import pyfft_tpu.spectral as spectral
    [_, _, _, _, _, _, fi] = spectral.fft_pwelch(
        np.asarray(drv.tt), np.asarray(drv.refsig),
        np.asarray(drv.sig)[:, 0], np.asarray(drv.tbounds),
        Navr=navr, windowoverlap=drv.overlap, windowfunction=drv.winfun,
        plotit=False, verbose=False)
    freq = np.asarray(fi.freq)
    frange = np.asarray([freq[drv._ifk[0] - drv._ifw],
                         freq[drv._ifk[0] + drv._ifw]])
    out = drv.integrate_spectra(fi, frange)
    assert len(out) == 10
    assert all(np.shape(o) == (navr, 1) for o in out)


def test_fit_neprofile_plot_smoke(tmp_path):
    import matplotlib
    matplotlib.use("Agg", force=True)
    rng = np.random.default_rng(1)
    roa = np.linspace(0.1, 0.9, 15)
    ne = 5e19 * (1 - roa**2) + 5e17
    q = dict(roa=roa, ne=ne)
    out = hp.fit_neprofile(q, np.linspace(0.2, 0.8, 20), plotit=True)
    assert len(out) == 4
