"""Filtering and resampling (TPU-native).

Role of the reference ``filters.py`` (up/downsampling via Butterworth
filtfilt + linear interpolation, smoothing, Butterworth band/low-pass
helpers, complex filtfilt) — rebuilt for TPU:

* **IIR design** (Butterworth, ``filters.py:58,143,323-341``) is pure
  host-side NumPy math (poles/bilinear transform), numerically matching
  ``scipy.signal.butter``.
* **IIR application** is a transposed-direct-form-II recurrence under
  ``jax.lax.scan`` — the exact zero-phase ``filtfilt`` semantics of the
  reference (odd extension, ``lfilter_zi`` initial conditions) are kept.
  A sequential scan is not where a TPU shines, so for production streaming
  the framework also provides:
* **FIR overlap-save convolution** — frames + rFFT multiply + inverse,
  batched on device (MXU path on TPU), with :func:`firwin` windowed-sinc
  design and :func:`iir_to_fir` (truncated-impulse-response equivalence,
  documented tolerance) to map the reference's IIR specs onto the streaming
  FIR path.  This is the kernel the time-sharded halo-exchange pipeline
  (:mod:`pyfft_tpu.parallel`) distributes.
"""
from __future__ import annotations

from functools import partial, lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .utils.interp import interp
from . import segmentation as seg
from .ops import mxu_fft


__all__ = ["butter", "butter_lowpass", "butter_bandpass",
           "butter_lowpass_filter", "complex_filtfilt", "lfilter",
           "lfilter_zi", "filtfilt", "upsample", "downsample",
           "downsample_efficient", "smooth", "firwin", "freqz",
           "oaconvolve", "fir_filter", "fir_filtfilt", "iir_to_fir",
           "resample_poly"]


# --------------------------------------------------------------------------- #
# Butterworth design (host-side NumPy; matches scipy.signal.butter)
# --------------------------------------------------------------------------- #

def _poly_from_roots(roots):
    p = np.array([1.0 + 0.0j])
    for r in roots:
        p = np.convolve(p, np.array([1.0, -r]))
    return p


def butter(order, Wn, btype="low"):
    """Digital Butterworth design: returns ``(b, a)``.

    ``Wn`` is normalized to Nyquist (as scipy): scalar for low/high, pair
    for band.  Analog prototype poles -> frequency transform -> bilinear.
    """
    order = int(order)
    Wn = np.atleast_1d(np.asarray(Wn, dtype=np.float64))
    if np.any(Wn <= 0) or np.any(Wn >= 1):
        raise ValueError("Wn must be in (0, 1) (normalized to Nyquist)")

    # analog lowpass prototype: poles on the unit circle, no zeros
    k = np.arange(1, order + 1)
    theta = np.pi * (2 * k - 1) / (2 * order)
    p = -np.sin(theta) + 1j * np.cos(theta)
    z = np.array([], dtype=complex)

    fs = 2.0
    warped = 2 * fs * np.tan(np.pi * Wn / fs)

    if btype in ("low", "lowpass"):
        p = p * warped[0]
    elif btype in ("high", "highpass"):
        p = warped[0] / p
        z = np.zeros(order, dtype=complex)
    elif btype in ("band", "bandpass"):
        bw = warped[1] - warped[0]
        w0 = np.sqrt(warped[0] * warped[1])
        p_lp = p * bw / 2
        p = np.concatenate([p_lp + np.sqrt(p_lp ** 2 - w0 ** 2 + 0j),
                            p_lp - np.sqrt(p_lp ** 2 - w0 ** 2 + 0j)])
        z = np.zeros(order, dtype=complex)
    elif btype in ("stop", "bandstop"):
        bw = warped[1] - warped[0]
        w0 = np.sqrt(warped[0] * warped[1])
        p_hp = (bw / 2) / p
        p = np.concatenate([p_hp + np.sqrt(p_hp ** 2 - w0 ** 2 + 0j),
                            p_hp - np.sqrt(p_hp ** 2 - w0 ** 2 + 0j)])
        z = np.concatenate([1j * w0 * np.ones(order),
                            -1j * w0 * np.ones(order)])
    else:
        raise ValueError(f"unknown btype {btype!r}")

    # bilinear transform; zeros at infinity map to z = -1
    fs2 = 2.0 * fs
    z_b = (fs2 + z) / (fs2 - z)
    p_b = (fs2 + p) / (fs2 - p)
    z_b = np.concatenate([z_b, -np.ones(len(p) - len(z))])

    b = np.real(_poly_from_roots(z_b))
    a = np.real(_poly_from_roots(p_b))

    # fix the overall gain exactly at a known unit-gain frequency:
    # DC (low/stop), Nyquist (high), or the warped geometric center (band)
    if btype in ("high", "highpass"):
        wtest = np.pi
    elif btype in ("band", "bandpass"):
        wtest = 2 * np.arctan(np.sqrt(np.prod(np.tan(np.pi * Wn / 2))))
    else:
        wtest = 0.0
    ejw = np.exp(-1j * wtest * np.arange(max(len(b), len(a))))
    resp = np.abs(np.dot(b, ejw[:len(b)]) / np.dot(a, ejw[:len(a)]))
    b = b / resp
    return b, a


def butter_lowpass(cutoff, fnyq, order=5):
    """Reference helper (``filters.py:336-341``): ``Wn = cutoff/fnyq``."""
    return butter(order, cutoff / fnyq, btype="low")


def butter_bandpass(x, fs=4e6, lf=1000, hf=500e3, order=3, disp=0):
    """Causal Butterworth band-pass of a signal (reference ``:323-333``)."""
    nyq = 0.5 * fs
    b, a = butter(order, [lf / nyq, hf / nyq], btype="band")
    return np.asarray(lfilter(b, a, x))


def butter_lowpass_filter(data, cutoff, fs, order=5, axis=0):
    """Zero-phase Butterworth low-pass (reference ``:344-348``).

    Note the reference passes the sampling frequency as the ``fnyq`` argument
    of ``butter_lowpass`` — preserved for parity.
    """
    b, a = butter_lowpass(cutoff, fs, order=order)
    return filtfilt(b, a, data, axis=axis)


def complex_filtfilt(filt_n, filt_d, data):
    """filtfilt on real and imaginary parts separately (reference ``:351``)."""
    data = np.asarray(data)
    dRR = filtfilt(filt_n, filt_d, data.real)
    dII = filtfilt(filt_n, filt_d, data.imag)
    return np.asarray(dRR) + 1j * np.asarray(dII)


# --------------------------------------------------------------------------- #
# IIR application: lax.scan transposed direct form II
# --------------------------------------------------------------------------- #

@partial(jax.jit, static_argnames=("order",))
def _lfilter_scan(b, a, x, zi, *, order):
    """Batched IIR filter along the last axis via lax.scan.

    ``x``: (..., nt); ``zi``: (..., order) initial state.  Transposed
    direct-form II; ``a[0]`` must be 1.
    """

    def step(z, xn):
        yn = b[0] * xn + z[..., 0]
        znew = jnp.concatenate(
            [(b[1:order] * xn[..., None] + z[..., 1:order]
              - a[1:order] * yn[..., None]),
             (b[order] * xn - a[order] * yn)[..., None]], axis=-1)
        return znew, yn

    xT = jnp.moveaxis(x, -1, 0)
    zf, yT = lax.scan(step, zi, xT)
    return jnp.moveaxis(yT, 0, -1), zf


def lfilter(b, a, x, zi=None, axis=-1):
    """Causal IIR filter (scipy-compatible semantics, device scan inside)."""
    b = np.asarray(b, dtype=np.float64)
    a = np.asarray(a, dtype=np.float64)
    n = max(len(a), len(b))
    b = np.pad(b, (0, n - len(b))) / a[0]
    a = np.pad(a, (0, n - len(a))) / a[0]
    x = np.asarray(x)
    order = n - 1
    if order == 0:
        y = b[0] * x
        return (y, np.zeros(x.shape[:-1] + (0,))) if zi is not None else y
    xm = np.moveaxis(x, axis, -1)
    if zi is None:
        z0 = np.zeros(xm.shape[:-1] + (order,))
        return_zi = False
    else:
        z0 = np.broadcast_to(np.moveaxis(np.asarray(zi), axis, -1),
                             xm.shape[:-1] + (order,))
        return_zi = True
    y, zf = _lfilter_scan(jnp.asarray(b), jnp.asarray(a),
                          jnp.asarray(xm, dtype=jnp.result_type(xm.dtype, b.dtype)),
                          jnp.asarray(z0), order=order)
    y = np.moveaxis(np.asarray(y), -1, axis)
    if return_zi:
        return y, np.asarray(zf)
    return y


def lfilter_zi(b, a):
    """Steady-state initial conditions for a step input (scipy-compatible)."""
    b = np.asarray(b, dtype=np.float64)
    a = np.asarray(a, dtype=np.float64)
    n = max(len(a), len(b))
    b = np.pad(b, (0, n - len(b))) / a[0]
    a = np.pad(a, (0, n - len(a))) / a[0]
    # companion matrix of a
    comp = np.zeros((n - 1, n - 1))
    comp[0, :] = -a[1:]
    comp[1:, :-1] = np.eye(n - 2)
    IminusA = np.eye(n - 1) - comp.T
    B = b[1:] - a[1:] * b[0]
    return np.linalg.solve(IminusA, B)


def filtfilt(b, a, x, axis=-1):
    """Zero-phase forward-backward IIR filter.

    scipy-compatible (``method='pad'``, ``padtype='odd'``,
    ``padlen = 3 * max(len(a), len(b))``) — the semantics the reference
    relies on throughout its resampling chain (``filters.py:99,191,347``).
    """
    b = np.asarray(b, dtype=np.float64)
    a = np.asarray(a, dtype=np.float64)
    x = np.asarray(x)
    xm = np.moveaxis(x, axis, -1)
    nt = xm.shape[-1]
    padlen = 3 * max(len(a), len(b))
    if nt <= padlen:
        raise ValueError(f"The length of the input vector x must be greater "
                         f"than padlen, which is {padlen}.")
    # odd extension
    left = 2 * xm[..., :1] - xm[..., padlen:0:-1]
    right = 2 * xm[..., -1:] - xm[..., -2:-padlen - 2:-1]
    ext = np.concatenate([left, xm, right], axis=-1)

    zi = lfilter_zi(b, a)
    zi_shape = (1,) * (ext.ndim - 1) + (len(zi),)
    zi = zi.reshape(zi_shape)

    y, _ = lfilter(b, a, ext, zi=zi * ext[..., :1])
    y = y[..., ::-1]
    y, _ = lfilter(b, a, y, zi=zi * y[..., :1])
    y = y[..., ::-1]
    y = y[..., padlen:padlen + nt]
    return np.moveaxis(y, -1, axis)


# --------------------------------------------------------------------------- #
# Resampling (reference filters.py:20-218)
# --------------------------------------------------------------------------- #

def upsample(u_t, Fs, Fs_new, plotit=False):
    """Linear-interpolation upsampling (reference ``upsample``, :20-34)."""
    u_t = np.asarray(u_t)
    nt = len(u_t)
    tt = np.arange(0, nt, 1) / Fs
    ti = np.arange(tt[0], tt[-1], 1 / Fs_new)
    return np.asarray(interp(tt, u_t, ei=None, xo=ti))


def downsample(u_t, Fs, Fs_new, plotit=False):
    """LPF (Butterworth-2 filtfilt) then interpolate to the new rate.

    Behavior-parity with reference ``downsample`` (:36-121): always returns
    a 2-D ``(nt_new, nch)`` array.
    """
    tau = 2 / Fs_new
    u_t = np.asarray(u_t, dtype=np.float64)
    nt = len(u_t)
    tt = np.arange(0, nt, 1) / Fs
    if u_t.ndim == 1:
        u_t = u_t.reshape(nt, 1)
    lowpass_n, lowpass_d = butter(2, 2.0 / (Fs * tau), btype="low")
    ti = np.arange(0, nt / Fs, 1 / Fs_new)
    filtered = filtfilt(lowpass_n, lowpass_d, u_t, axis=0)
    u_n = np.asarray(interp(tt, filtered, ei=None, xo=ti))
    return u_n


def downsample_efficient(u_t, Fs, Fs_new, plotit=False, halforder=2,
                         lowpass=None):
    """Vectorized LPF + resample (reference ``downsample_efficient``,
    :123-218)."""
    if lowpass is None:
        lowpass = 0.5 * Fs_new
    u_t = np.asarray(u_t, dtype=np.float64)
    nt = len(u_t)
    squeeze = u_t.ndim == 1
    if squeeze:
        u_t = u_t.reshape(nt, 1)
    lowpass_n, lowpass_d = butter(halforder, 2.0 * lowpass / Fs, btype="low")
    filtered = filtfilt(lowpass_n, lowpass_d, u_t, axis=0)
    out = np.asarray(interp(xi=np.arange(0, nt, 1) / Fs, yi=filtered,
                            ei=None, xo=np.arange(0, nt / Fs, 1 / Fs_new)))
    return out[:, 0] if squeeze else out


def smooth(x, window_len=11, window="hanning"):
    """Windowed moving average with reflected ends (reference ``smooth``,
    :226-285; the reference's float-slice py3 bug is fixed with integer
    slicing, preserving the intended output length == input length)."""
    x = np.asarray(x)
    if x.ndim != 1:
        raise ValueError("smooth only accepts 1 dimension arrays.")
    if x.size < window_len:
        raise ValueError("Input vector needs to be bigger than window size.")
    if window_len < 3:
        return x
    if window not in ["flat", "hanning", "hamming", "bartlett", "blackman"]:
        raise ValueError("Window is one of 'flat', 'hanning', 'hamming', "
                         "'bartlett', 'blackman'")
    s = np.r_[x[window_len - 1:0:-1], x, x[-1:-window_len:-1]]
    if window == "flat":
        w = np.ones(window_len, "d")
    else:
        w = getattr(np, window)(window_len)
    y = oaconvolve(s, w / w.sum(), mode="valid")
    return y[(window_len // 2 - 1):-(window_len // 2)]


# --------------------------------------------------------------------------- #
# FIR design
# --------------------------------------------------------------------------- #

def firwin(numtaps, cutoff, window="hamming", pass_zero=True, fs=2.0):
    """Windowed-sinc FIR design (scipy.signal.firwin-compatible subset).

    ``cutoff`` scalar -> low-pass (or high-pass with ``pass_zero=False``);
    pair -> band-stop (``pass_zero=True``) or band-pass (``False``).
    """
    from .windows import get_window

    numtaps = int(numtaps)
    cutoff = np.atleast_1d(np.asarray(cutoff, dtype=np.float64)) / (fs / 2.0)
    if np.any(cutoff <= 0) or np.any(cutoff >= 1):
        raise ValueError("cutoff must be inside (0, fs/2)")

    pass_nyquist = bool(len(cutoff) % 2) ^ bool(pass_zero)
    if pass_nyquist and numtaps % 2 == 0:
        raise ValueError("A filter with an even number of taps cannot pass "
                         "the Nyquist frequency.")

    bands = np.concatenate([[0.0] if pass_zero else [],
                            cutoff,
                            [1.0] if pass_nyquist else []])
    bands = bands.reshape(-1, 2)

    alpha = 0.5 * (numtaps - 1)
    m = np.arange(numtaps) - alpha
    h = np.zeros(numtaps)
    for left, right in bands:
        h += right * np.sinc(right * m)
        h -= left * np.sinc(left * m)

    win = get_window(window, numtaps, fftbins=False)
    h *= win

    # normalize unit gain at the center of the first passband
    left, right = bands[0]
    if left == 0:
        scale_frequency = 0.0
    elif right == 1:
        scale_frequency = 1.0
    else:
        scale_frequency = 0.5 * (left + right)
    c = np.cos(np.pi * m * scale_frequency)
    h /= np.sum(h * c)
    return h


def freqz(b, a=1.0, worN=512, fs=2 * np.pi):
    """Frequency response of a digital filter (host-side)."""
    b = np.atleast_1d(np.asarray(b, dtype=np.float64))
    a = np.atleast_1d(np.asarray(a, dtype=np.float64))
    if np.ndim(worN) == 0:
        w = np.linspace(0, np.pi, int(worN), endpoint=False)
    else:
        w = 2 * np.pi * np.asarray(worN) / fs
    zm = np.exp(-1j * np.outer(w, np.arange(max(len(b), len(a)))))
    h = zm[:, :len(b)] @ b / (zm[:, :len(a)] @ a)
    return w * fs / (2 * np.pi), h


def iir_to_fir(b, a, ntaps=None, tol=1e-8):
    """Truncated-impulse-response FIR equivalent of a stable IIR filter.

    The reference's zero-phase IIR (filtfilt) has no clean streaming TPU
    form; applying this FIR (forward) or its zero-phase variant
    (:func:`fir_filtfilt`) reproduces the IIR magnitude response within
    ``tol`` (the truncation point is chosen where the impulse response has
    decayed below ``tol`` relative to its peak).
    """
    b = np.asarray(b, dtype=np.float64)
    a = np.asarray(a, dtype=np.float64)
    if ntaps is None:
        n = 64
        while n < 1 << 20:
            imp = np.zeros(n)
            imp[0] = 1.0
            h = np.asarray(lfilter(b, a, imp))
            tail = np.max(np.abs(h[-n // 8:]))
            if tail < tol * np.max(np.abs(h)):
                break
            n *= 2
        ntaps = n
    imp = np.zeros(int(ntaps))
    imp[0] = 1.0
    return np.asarray(lfilter(b, a, imp))


# --------------------------------------------------------------------------- #
# Overlap-save FIR convolution (device kernel)
# --------------------------------------------------------------------------- #

def _os_plan(nx, ntaps, nfft=None):
    if nfft is None:
        nfft = 1
        while nfft < 8 * ntaps or nfft < 1024:
            nfft *= 2
        nfft = min(nfft, 1 << 18)
        while nfft < 2 * ntaps:
            nfft *= 2
    hop = nfft - (ntaps - 1)
    nblocks = int(np.ceil(nx / hop))
    return nfft, hop, nblocks


@partial(jax.jit, static_argnames=("nfft", "hop", "nblocks", "ntaps"))
def _os_core_xla(x, H, *, nfft, hop, nblocks, ntaps):
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1)
                 + [(ntaps - 1, nblocks * hop - x.shape[-1] + nfft)])
    fr = seg.frame_signal(xp, nfft, hop, nblocks)
    Y = jnp.fft.irfft(jnp.fft.rfft(fr, axis=-1) * H, n=nfft, axis=-1)
    y = Y[..., ntaps - 1:]
    return y.reshape(y.shape[:-2] + (nblocks * hop,))


@partial(jax.jit, static_argnames=("nfft", "hop", "nblocks", "ntaps"))
def _os_core_mxu(x, Hr, Hi, *, nfft, hop, nblocks, ntaps):
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1)
                 + [(ntaps - 1, nblocks * hop - x.shape[-1] + nfft)])
    fr = seg.frame_signal(xp, nfft, hop, nblocks)
    Fr, Fi = mxu_fft.rfft_pair(fr, n=nfft, axis=-1)
    Yr = Fr * Hr - Fi * Hi
    Yi = Fr * Hi + Fi * Hr
    Y = mxu_fft.irfft_pair(Yr, Yi, nfft, axis=-1)
    y = Y[..., ntaps - 1:]
    return y.reshape(y.shape[:-2] + (nblocks * hop,))


def oaconvolve(x, taps, mode="full", nfft=None):
    """Overlap-save FIR convolution along the last axis (device-batched).

    The streaming-convolution kernel of the framework: block the input,
    rFFT each block, multiply by the tap response, inverse-transform, and
    discard the ``ntaps-1`` wrap-around samples — all batched over blocks
    (and channels) on the device.  ``mode`` follows numpy.convolve.
    """
    from .spectral import backend_supports_complex

    x = np.asarray(x)
    taps = np.asarray(taps, dtype=np.float64)
    ntaps = len(taps)
    nx = x.shape[-1]
    nfull = nx + ntaps - 1
    nfft, hop, nblocks = _os_plan(nfull, ntaps, nfft)

    # widest dtype the backend actually supports (f32 unless x64 is enabled)
    dtype = (jax.dtypes.canonicalize_dtype(np.float64)
             if backend_supports_complex() else np.float32)
    if backend_supports_complex():
        H = np.fft.rfft(taps, n=nfft)
        y = _os_core_xla(jnp.asarray(x, dtype=dtype), jnp.asarray(H),
                         nfft=nfft, hop=hop, nblocks=nblocks, ntaps=ntaps)
    else:
        H = np.fft.rfft(taps.astype(np.float64), n=nfft)
        y = _os_core_mxu(jnp.asarray(x, dtype=dtype),
                         jnp.asarray(H.real.astype(dtype)),
                         jnp.asarray(H.imag.astype(dtype)),
                         nfft=nfft, hop=hop, nblocks=nblocks, ntaps=ntaps)
    y = np.asarray(y)[..., :nfull]
    if mode == "full":
        return y
    if mode == "same":
        start = (ntaps - 1) // 2
        return y[..., start:start + nx]
    if mode == "valid":
        return y[..., ntaps - 1:nx]
    raise ValueError(f"unknown mode {mode!r}")


def fir_filter(x, taps, axis=-1, backend=None):
    """Causal FIR filtering ('same' alignment as lfilter).

    ``backend``: 'os' (overlap-save, default) or 'pallas' (single-pass
    fused kernel, taps <= 1024; see :mod:`pyfft_tpu.ops.pallas_fir`).
    """
    x = np.moveaxis(np.asarray(x), axis, -1)
    if backend == "pallas":
        from .ops.pallas_fir import fir_pallas
        lead = x.shape[:-1]
        y = np.asarray(fir_pallas(x.reshape(-1, x.shape[-1]), taps))
        y = y.reshape(lead + (x.shape[-1],)).astype(x.dtype, copy=False)
    else:
        y = oaconvolve(x, taps, mode="full")[..., :x.shape[-1]]
    return np.moveaxis(y, -1, axis)


def fir_filter_tiled(xr, taps, precision=None):
    """Causal FIR filtering on the TPU kernel-native row view — the
    zero-retile entry for chained pipelines.

    ``xr (nch, nrows, 128)`` comes from :func:`tile_rows`; the result is
    in the same layout (chain more filters, or feed the v3 Welch kernel),
    and :func:`untile_rows` returns to ``(nch, nt)``.  A rank-2 call
    (:func:`fir_filter` with ``backend='pallas'``) pays a physical
    retiling pass on each side of the kernel (~35% of its wall at
    8 x 2^24 on v5e); crossing the layout boundary once per *pipeline*
    instead runs the filter at the DMA roofline.  Same numerics as
    ``np.convolve(x, taps, 'full')[:nt]`` per channel.
    """
    from .ops.pallas_fir import fir_pallas_tiled
    return fir_pallas_tiled(xr, taps, precision=precision)


def tile_rows(x, block_rows=512):
    """See :func:`pyfft_tpu.ops.pallas_fir.tile_rows` (layout boundary)."""
    from .ops.pallas_fir import tile_rows as _tile
    return _tile(x, block_rows)


def untile_rows(xr, nt):
    """Inverse of :func:`tile_rows`."""
    from .ops.pallas_fir import untile_rows as _untile
    return _untile(xr, nt)


def fir_filtfilt(x, taps, axis=-1):
    """Zero-phase FIR filtering with reflected-edge padding.

    For a symmetric (linear-phase) ``taps`` this applies the filter once and
    removes the group delay; the TPU-native stand-in for the reference's
    IIR ``filtfilt`` intent (apply :func:`iir_to_fir` twice via squared
    response for an exact |H|^2 match).
    """
    x = np.moveaxis(np.asarray(x), axis, -1)
    ntaps = len(taps)
    pad = ntaps
    left = 2 * x[..., :1] - x[..., pad:0:-1]
    right = 2 * x[..., -1:] - x[..., -2:-pad - 2:-1]
    ext = np.concatenate([left, x, right], axis=-1)
    y = oaconvolve(ext, taps, mode="full")
    delay = (ntaps - 1) // 2
    y = y[..., pad + delay:pad + delay + x.shape[-1]]
    return np.moveaxis(y, -1, axis)



def resample_poly(x, up, down, axis=-1, taps=None):
    """Polyphase rational-rate resampling (scipy ``resample_poly`` parity).

    The polyphase decomposition maps onto the device batch axis: phase
    sub-filter ``h_p[i] = h[i*up + p]`` is applied with the overlap-save
    kernel (one batched conv per phase, ``up`` phases), and the outputs
    interleave/decimate to the ``up/down`` rate — no zero-stuffed signal is
    ever materialized.  ``taps=None`` designs the scipy default anti-alias
    filter (Kaiser beta=5.0, 10*max(up,down) taps per side, gain ``up``).
    """
    from math import gcd

    x = np.asarray(x)
    up, down = int(up), int(down)
    if up <= 0 or down <= 0:
        raise ValueError("up and down must be positive")
    g = gcd(up, down)
    up //= g
    down //= g
    if up == down == 1:
        return x.copy()

    xm = np.moveaxis(x, axis, -1)
    n_in = xm.shape[-1]
    if taps is None:
        max_rate = max(up, down)
        f_c = 1.0 / (2 * max_rate)
        half_len = 10 * max_rate
        from .windows import kaiser
        ntaps = 2 * half_len + 1
        m = np.arange(ntaps) - half_len
        h = 2 * f_c * np.sinc(2 * f_c * m) * kaiser(ntaps, 5.0)
        h = h / h.sum() * up
    else:
        h = np.asarray(taps, dtype=np.float64)
    ntaps = len(h)

    # scipy output alignment: n_out samples, group delay (ntaps-1)//2
    n_out = -(-n_in * up // down)
    offset = (ntaps - 1) // 2

    # phase sub-filters h_p[i] = h[i*up + p] applied per phase
    lead = xm.shape[:-1]
    x2 = xm.reshape(-1, n_in)
    y_full_len = n_in * up + ntaps - 1
    phases = []
    for p in range(up):
        hp = h[p::up]
        if len(hp) == 0:
            hp = np.zeros(1)
        yp = np.asarray(oaconvolve(x2, hp, mode="full"))
        phases.append(yp)
    # interleave: y_full[q*up + p] = phases[p][q]
    qmax = max(ph.shape[-1] for ph in phases)
    y_full = np.zeros(x2.shape[:-1] + (qmax * up,), dtype=phases[0].dtype)
    for p, yp in enumerate(phases):
        y_full[..., p::up][..., :yp.shape[-1]] = yp
    y = y_full[..., offset:offset + n_out * down:down]
    if y.shape[-1] < n_out:
        y = np.concatenate(
            [y, np.zeros(y.shape[:-1] + (n_out - y.shape[-1],),
                         dtype=y.dtype)], axis=-1)
    y = y.reshape(lead + (n_out,))
    return np.moveaxis(y, -1, axis)


def smooth_demo(plotit=False):
    """Window-comparison demo for :func:`smooth` (reference ``smooth_demo``,
    filters.py:287-320).  Returns ``{window_name: smoothed}``."""
    rng = np.random.default_rng(0)
    t = np.linspace(-4, 4, 100)
    x = np.sin(t)
    xn = x + rng.standard_normal(len(t)) * 0.1
    ws = 31
    names = ["flat", "hanning", "hamming", "bartlett", "blackman"]
    out = {w: np.asarray(smooth(xn, ws, w)) for w in names}
    if plotit:  # pragma: no cover
        import matplotlib.pyplot as plt
        plt.figure("smooth_demo")
        plt.plot(x, "k-", label="signal")
        plt.plot(xn, ".", label="noisy")
        for w, y in out.items():
            plt.plot(y, label=w)
        plt.legend()
    return out
