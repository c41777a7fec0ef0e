"""Window suite and ROV dispatcher tests: parity vs the genuine reference
dispatcher (via the shim) and vs scipy.signal.windows."""
import numpy as np
import pytest
import scipy.signal.windows as sw

from pyfft_tpu import windows as win_dispatch
from pyfft_tpu import windows_mod as W


NAMES = ["Hanning", "hamming", "blackmanharris", "SFT3F", "SFT4F", "SFT5F",
         "SFT3M", "SFT4M", "SFT5M", "Nuttall3", "Nuttall3a", "Nuttall3b",
         "Nuttall4", "Nuttall4a", "Nuttall4b", "Nuttall4c", "welch",
         "bartlett", "box"]


@pytest.mark.parametrize("name", NAMES)
@pytest.mark.parametrize("nwins", [64, 255])
def test_window_matches_reference(ref_windows, name, nwins):
    ours, (t1, t2) = win_dispatch(name, nwins=nwins, verbose=False, msgout=True)
    ref, (rt1, rt2) = ref_windows.windows(name, nwins=nwins, verbose=False,
                                          msgout=True)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-14)
    assert t1 == rt1
    assert t2 == rt2


@pytest.mark.parametrize("name", NAMES)
def test_rov_matches_reference(ref_windows, name):
    ours = win_dispatch(name, verbose=False)
    ref = ref_windows.windows(name, verbose=False)
    assert ours == ref


def test_kaiser_dispatch(ref_windows):
    ours = win_dispatch("kaiser", nwins=128, beta=8.6, verbose=False)
    ref = ref_windows.windows("kaiser", nwins=128, beta=8.6, verbose=False)
    np.testing.assert_allclose(ours, ref, atol=1e-14)
    assert win_dispatch("kaiser", beta=8.6, verbose=False) == 2.0 / 3.0


@pytest.mark.parametrize("sym", [True, False])
@pytest.mark.parametrize("fn,args", [
    ("boxcar", ()), ("triang", ()), ("parzen", ()), ("bohman", ()),
    ("blackman", ()), ("nuttall", ()), ("blackmanharris", ()),
    ("flattop", ()), ("bartlett", ()), ("hann", ()), ("barthann", ()),
    ("hamming", ()), ("cosine", ()),
    ("tukey", (0.4,)), ("kaiser", (8.6,)), ("gaussian", (7.0,)),
    ("general_gaussian", (1.5, 7.0)), ("general_hamming", (0.61,)),
    ("chebwin", (100,)),
])
@pytest.mark.parametrize("M", [64, 65])
def test_suite_matches_scipy(fn, args, sym, M):
    ours = getattr(W, fn)(M, *args, sym=sym)
    ref = getattr(sw, fn)(M, *args, sym=sym)
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-12)


def test_exponential_matches_scipy():
    np.testing.assert_allclose(W.exponential(65, tau=10.0),
                               sw.exponential(65, tau=10.0), atol=1e-13)
    np.testing.assert_allclose(W.exponential(64, center=10, tau=5.0, sym=False),
                               sw.exponential(64, center=10, tau=5.0, sym=False),
                               atol=1e-13)


def test_dpss_matches_scipy():
    ours = W.dpss(128, 3.0, Kmax=4)
    ref = sw.dpss(128, 3.0, Kmax=4)
    # eigenvectors defined up to sign; the standard convention fixes it
    np.testing.assert_allclose(ours, ref, rtol=1e-8, atol=1e-10)


def test_get_window():
    np.testing.assert_allclose(W.get_window("hann", 64),
                               sw.get_window("hann", 64), atol=1e-13)
    np.testing.assert_allclose(W.get_window(("kaiser", 8.6), 64),
                               sw.get_window(("kaiser", 8.6), 64), atol=1e-13)
    np.testing.assert_allclose(W.get_window(8.6, 64),
                               sw.get_window(8.6, 64), atol=1e-13)
    np.testing.assert_allclose(W.get_window("boxcar", 17, fftbins=False),
                               np.ones(17), atol=0)


def test_periodic_convention():
    # periodic = func(n+1)[:-1]  (reference windows.py:278-279)
    w = win_dispatch("hanning", nwins=64, verbose=False)
    np.testing.assert_allclose(w, np.hanning(65)[:-1], atol=0)
