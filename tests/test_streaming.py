"""StreamingWelch: batch equivalence, split-invariance, checkpoint/resume."""
import numpy as np
import pytest

import pyfft_tpu as ft
from pyfft_tpu.streaming import StreamingWelch
from pyfft_tpu import segmentation as seg


FS, N, NCH, NW = 1.0e4, 1 << 15, 3, 1024


@pytest.fixture(scope="module")
def signals():
    rng = np.random.default_rng(7)
    t = np.arange(N) / FS
    x = np.sin(2 * np.pi * 313.0 * t) + 0.1 * rng.standard_normal(N) + 0.7
    y = np.stack([0.5 * np.sin(2 * np.pi * 313.0 * t - 0.4 * (k + 1))
                  + 0.1 * rng.standard_normal(N) + 0.2 * k
                  for k in range(NCH)])
    return x, y


def _stream(x, y, blocks, detrend="mean", **kw):
    sw = StreamingWelch(nwins=NW, fs=FS, nch=NCH, windowoverlap=0.5,
                        detrend=detrend, **kw)
    for sl in blocks:
        sw.push(x[sl], y[:, sl])
    return sw


def _splits(sizes):
    out, i = [], 0
    for s in sizes:
        out.append(slice(i, min(i + s, N)))
        i += s
        if i >= N:
            break
    if i < N:
        out.append(slice(i, N))
    return out


def test_matches_batch_fft_pwelch(signals):
    """Streamed == batch fft_pwelch on the same span (no reflect-extend).

    Sub-span ``tbounds`` keeps the batch path off the reflect-extension
    branch; the stream consumes exactly the analyzed span, so the segment
    grids coincide sample-for-sample.
    """
    x, y = signals
    t = np.arange(N) / FS
    xs, ys = x[1:N - 1], y[:, 1:N - 1]          # the analyzed span

    sw = StreamingWelch(nwins=NW, fs=FS, nch=NCH, windowoverlap=0.5)
    i = 0
    while i < xs.size:
        j = min(i + 4096, xs.size)
        sw.push(xs[i:j], ys[:, i:j])
        i = j
    res = sw.result()

    freq, Pxy, Pxx, Pyy, Cxy, phi, info = ft.fft_pwelch(
        t, x, y.T, tbounds=[t[1], t[-2]], windowoverlap=0.5,
        windowfunction="hanning", plotit=False, verbose=False,
        detrend_style=1, tper=NW / FS)
    assert res.Navr == info.Navr
    np.testing.assert_allclose(res.freq, freq, rtol=1e-12)
    np.testing.assert_allclose(res.Pxx, np.real(Pxx), rtol=1e-9, atol=1e-13)
    np.testing.assert_allclose(res.Pyy, np.real(Pyy).T, rtol=1e-9,
                               atol=1e-13)
    np.testing.assert_allclose(res.Pxy, Pxy.T, rtol=1e-8, atol=1e-13)


def test_split_invariance(signals):
    """Any block partition gives identical sums (associativity)."""
    x, y = signals
    a = _stream(x, y, _splits([N])).result()            # one shot
    b = _stream(x, y, _splits([1000] * 40)).result()    # ragged blocks
    c = _stream(x, y, _splits([NW // 2] * 200)).result()
    for r in (b, c):
        np.testing.assert_allclose(r.Pxx, a.Pxx, rtol=1e-10, atol=1e-15)
        np.testing.assert_allclose(r.Pxy, a.Pxy, rtol=1e-10, atol=1e-15)
        assert r.Navr == a.Navr


def test_checkpoint_resume_bit_identical(tmp_path, signals):
    x, y = signals
    blocks = _splits([3000] * 12)
    full = _stream(x, y, blocks)

    half = _stream(x, y, blocks[:6])
    p = half.checkpoint(str(tmp_path / "welch_ckpt.npz"))
    resumed = StreamingWelch.restore(p)
    for sl in blocks[6:]:
        resumed.push(x[sl], y[:, sl])

    a, b = full.result(), resumed.result()
    assert a.Navr == b.Navr
    np.testing.assert_array_equal(a.Pxx, b.Pxx)
    np.testing.assert_array_equal(a.Pyy, b.Pyy)
    np.testing.assert_array_equal(a.Pxy, b.Pxy)


def test_parseval(signals):
    x, y = signals
    res = _stream(x, y, _splits([8192] * 4)).result()
    df = res.freq[1] - res.freq[0]
    # detrend-mean streaming: total one-sided power ~ variance of x
    assert abs(np.sum(res.Pxx) * df - np.var(x)) < 0.02 * np.var(x)


def test_errors():
    with pytest.raises(ValueError, match="linear"):
        StreamingWelch(nwins=64, detrend="linear")
    sw = StreamingWelch(nwins=64, nch=2)
    with pytest.raises(ValueError, match="shape"):
        sw.push(np.zeros(100), np.zeros((3, 100)))
    with pytest.raises(ValueError, match="segment"):
        sw.result()


def test_twosided_complex_matches_batch():
    """Complex IQ stream (onesided=False) == batch fft_pwelch two-sided."""
    fs, n, nw = 1.0e4, 1 << 14, 512
    t = np.arange(n) / fs
    rng = np.random.default_rng(9)
    z = (np.exp(1j * (2 * np.pi * (-1200.0) * t + 0.4))
         + 0.05 * (rng.standard_normal(n) + 1j * rng.standard_normal(n)))
    w = 0.7 * np.exp(1j * (2 * np.pi * (-1200.0) * t - 0.5)) \
        + 0.05 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))

    zs, ws = z[1:n - 1], w[1:n - 1]
    sw = StreamingWelch(nwins=nw, fs=fs, nch=1, windowoverlap=0.5,
                        onesided=False)
    i = 0
    while i < zs.size:
        j = min(i + 3000, zs.size)
        sw.push(zs[i:j], ws[None, i:j])
        i = j
    res = sw.result()

    freq, Pxy, Pxx, Pyy, Cxy, phi, info = ft.fft_pwelch(
        t, z, w, tbounds=[t[1], t[-2]], windowoverlap=0.5,
        windowfunction="hanning", plotit=False, verbose=False,
        detrend_style=1, tper=nw / fs)
    assert res.Navr == info.Navr
    np.testing.assert_allclose(res.freq, freq, rtol=1e-12)
    np.testing.assert_allclose(np.real(res.Pxx), np.real(Pxx),
                               rtol=1e-9, atol=1e-13)
    np.testing.assert_allclose(res.Pxy[0], Pxy, rtol=1e-8, atol=1e-13)
    # the line sits at -1200 Hz only (complex one-tone)
    pk = int(np.argmax(np.real(res.Pxx)))
    assert abs(res.freq[pk] + 1200.0) < fs / nw
    # checkpoint round-trip preserves complex state exactly
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = sw.checkpoint(os.path.join(d, "c.npz"))
        back = StreamingWelch.restore(p)
        np.testing.assert_array_equal(back.result().Pxy, res.Pxy)
