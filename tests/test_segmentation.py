"""Segmentation arithmetic parity vs the genuine reference fftanal statics."""
import numpy as np
import jax.numpy as jnp
import pytest

from pyfft_tpu import segmentation as seg


@pytest.mark.parametrize("nsig,navr,ov", [
    (2 ** 14, 8, 0.5), (2 ** 12, 8, 0.5), (10000, 7, 0.33),
    (4096, 1, 0.0), (513, 4, 0.25), (2 ** 19, 8, 0.5),
])
def test_counts_match_reference(ref_fft, nsig, navr, ov):
    fa = ref_fft.fftanal
    nwins = seg.get_nwins(nsig, navr, ov)
    assert nwins == fa._getNwins(nsig, navr, ov)
    nov = seg.get_noverlap(nwins, ov)
    assert nov == fa._getNoverlap(nwins, ov)
    assert seg.get_navr(nsig, nwins, nov) == fa._getNavr(nsig, nwins, nov)


@pytest.mark.parametrize("nfft", [8, 9, 1024, 1025])
def test_nnyquist(ref_fft, nfft):
    assert seg.get_nnyquist(nfft) == ref_fft.fftanal._getNnyquist(nfft)


def test_norms_match_reference(ref_fft):
    win = np.hanning(257)[:-1]
    nny = seg.get_nnyquist(256)
    s1, s2, nenbw, enbw = seg.get_norms(win, nny, 1e3)
    r1, r2, rn, re = ref_fft.fftanal._getNorms(win, nny, 1e3)
    assert np.allclose([s1, s2, nenbw, enbw], [r1, r2, rn, re])


def test_cola_helpers(ref_fft):
    fa = ref_fft.fftanal
    for (nsig, nwins) in [(1024, 256), (1000, 300)]:
        for nov in [0, 50, 128, 200]:
            if nov < nwins:
                assert seg.check_cola(nsig, nwins, nov) == fa._checkCOLA(nsig, nwins, nov)
        assert seg.get_min_overlap(nsig, nwins, 4) == fa._getMINoverlap(nsig, nwins, 4)
        assert seg.get_max_overlap(nsig, nwins, 4) == fa._getMAXoverlap(nsig, nwins, 4)


def test_frame_signal_matches_loop():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(1000)
    nwins, nov, navr = 256, 128, seg.get_navr(1000, 256, 128)
    fr = np.asarray(seg.frame_signal(jnp.asarray(x), nwins, nwins - nov, navr))
    for g in range(navr):
        s0 = g * (nwins - nov)
        np.testing.assert_array_equal(fr[g], x[s0:s0 + nwins])


def test_frame_signal_batched():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 1000))
    fr = np.asarray(seg.frame_signal(jnp.asarray(x), 100, 50, 5))
    assert fr.shape == (3, 5, 100)
    np.testing.assert_array_equal(fr[1, 2], x[1, 100:200])


def test_reflect_extend_matches_reference():
    x = np.arange(20.0)
    nwins = 5
    ref = np.concatenate((x[nwins - 1:0:-1], x, x[-1:-nwins:-1]))
    np.testing.assert_array_equal(np.asarray(seg.reflect_extend(jnp.asarray(x), nwins)), ref)
    # 2-D, time on axis 0
    x2 = np.stack([x, 2 * x], axis=1)
    ref2 = np.concatenate((x2[nwins - 1:0:-1], x2, x2[-1:-nwins:-1]), axis=0)
    np.testing.assert_array_equal(
        np.asarray(seg.reflect_extend(jnp.asarray(x2), nwins, axis=0)), ref2)


def test_plan_segments():
    p = seg.plan_segments(2 ** 14, navr=8, windowoverlap=0.5)
    assert p.navr == 8 and p.nfft == p.nwins
    assert p.starts()[-1] + p.nwins <= p.nsig
    p2 = seg.plan_segments(1000, nwins=2000, windowoverlap=0.5)
    assert p2.navr == 1 and p2.nwins == 1000
