"""Spectrogram / STFT tests: golden parity with the reference specgram loop
and chirp tracking."""
import numpy as np
import pytest

from pyfft_tpu import spectrogram as sg


def _ref_specgram(t, s, wl, hanning=True, overlap=True):
    """Direct numpy transcription of the reference hop loop
    (spectrogram.py:70-133) as a golden oracle."""
    s = np.asarray(s).flatten()
    n = len(s)
    if overlap:
        nW = 2 * (n - (n % wl)) // wl - 1
    else:
        nW = (n - (n % wl)) // wl - 1
    out = np.zeros((wl, nW))
    for i in range(nW):
        idx1 = i * wl // 2 if overlap else i * wl
        seg = s[idx1:idx1 + wl]
        if hanning:
            out[:, i] = np.sqrt(8.0 / 3.0) * np.abs(
                np.fft.fft(np.hanning(wl) * seg)) ** 2 / wl
        else:
            out[:, i] = np.abs(np.fft.fft(seg)) ** 2 / wl
    return out


@pytest.mark.parametrize("hanning", [True, False])
@pytest.mark.parametrize("overlap", [True, False])
def test_specgram_golden(hanning, overlap):
    tt, y = sg.test_case(case=3, npts=2000)
    wl = 128
    time, f, spec = sg.specgram(tt, y, wl=wl, hanning=hanning, overlap=overlap)
    ref = _ref_specgram(tt, y, wl, hanning=hanning, overlap=overlap)
    assert spec.shape == ref.shape
    np.testing.assert_allclose(spec, ref, rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(f, np.fft.fftfreq(wl, tt[1] - tt[0]), atol=1e-9)


def test_specgram_window_average():
    tt, y = sg.test_case(case=3, npts=4000)
    time, f, spec = sg.specgram(tt, y, wl=128, windowAverage=4)
    t2, f2, full = sg.specgram(tt, y, wl=128, overlap=False)
    assert spec.shape[1] == full.shape[1] // 4
    np.testing.assert_allclose(spec[:, 0], full[:, :4].mean(axis=1),
                               rtol=1e-9, atol=1e-12)


def test_specgram_tracks_chirp():
    tt, y = sg.test_case(case=3, npts=8000)
    wl = 512
    time, f, spec = sg.specgram(tt, y, wl=wl)
    # peak frequency should sweep upward from ~100 to ~200 Hz
    pos = f >= 0
    peaks = [abs(f[pos][np.argmax(spec[pos, i])]) for i in range(spec.shape[1])]
    assert peaks[0] < peaks[-1]
    assert 80 < peaks[0] < 140
    assert 160 < peaks[-1] < 220


def test_stft_wrapper_class_and_tuple():
    tt, y = sg.test_case(case=1, npts=2000)
    cls = sg.stft(tt, y, tper=0.1, returnclass=True)
    assert hasattr(cls, "Xseg")
    twin, freq, Xseg = sg.stft(tt, y, tper=0.1, returnclass=False)
    assert Xseg.shape[0] == cls.Navr
    np.testing.assert_allclose(np.asarray(Xseg), np.asarray(cls.Xseg))
    # the test-case-1 tone lands on the expected bin
    dt = tt[2] - tt[1]
    f0 = 0.1 / dt
    pk = abs(freq[np.argmax(np.mean(np.abs(Xseg) ** 2, axis=0))])
    assert abs(pk - f0) < 2.0 / 0.1  # within a couple of bins


def test_stft_class_helper():
    tt, y = sg.test_case(case=1, npts=2000)
    st = sg.STFT(y, fs=2000, win_size=256, fft_size=256)
    res = st.stft(scale="linear")
    assert res.shape == (st.total_segments, 256)
    assert np.all(np.isfinite(res))


def test_specgram_golden_vs_genuine_reference():
    """specgram vs the GENUINE reference module (not a transcription):
    Hanning power correction, hop-wl/2 overlap, window averaging."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "refshim"))
    import FFT.spectrogram as refspec
    rng = np.random.default_rng(7)
    fs, nt = 1e4, 1 << 13
    tt = np.arange(nt) / fs
    y = np.sin(2 * np.pi * 1.5e3 * tt) + 0.1 * rng.standard_normal(nt)
    # windowAverage is excluded: that branch of the genuine reference is
    # py2-broken (float shape, spectrogram.py:118) — a documented latent
    # defect; our fixed behavior is covered against the transcription in
    # test_specgram_window_average.
    for kw in [dict(), dict(hanning=False), dict(overlap=False)]:
        t1, f1, S1 = sg.specgram(tt, y, 256, **kw)
        t2, f2, S2 = refspec.specgram(tt, y, 256, **kw)
        np.testing.assert_allclose(np.asarray(S1), S2, rtol=1e-7,
                                   atol=1e-10 * np.max(np.abs(S2)))
        np.testing.assert_allclose(np.asarray(f1), f2, atol=1e-9)
