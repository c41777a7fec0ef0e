"""Analytic signal via the Hilbert transform (TPU-native).

Role of the reference ``hilbert.py``: zero the negative-frequency half of the
spectrum, double the positive half, inverse-transform
(reference ``hilbert.py:22-67`` and the mask variant ``:70-112``).

The spectral mask convention matches the reference exactly: with
``nyq = nfft//2`` (even) / ``(nfft+1)//2`` (odd), bins ``1..nyq-1`` are
doubled, bin ``nyq`` is kept at unit gain, bins ``nyq+1..`` are zeroed
(reference ``hilbert.py:63-64`` == ``:105-109``).

The whole transform (FFT -> mask -> IFFT) is one fused jitted computation;
on TPU it runs through the real-pair MXU FFT stack.
"""
from __future__ import annotations

from functools import partial, lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from .ops import mxu_fft


__all__ = ["hilbert", "hilbert_1d", "analytic_mask", "envelope_phase"]


@lru_cache(maxsize=None)
def analytic_mask(nfft: int) -> np.ndarray:
    """The analytic-signal spectral mask (reference ``hilbert.py:105-109``)."""
    nyq = (nfft + 1) // 2 if nfft % 2 else nfft // 2
    h = np.zeros(nfft)
    h[0] = 1.0
    h[1:nyq] = 2.0
    h[nyq] = 1.0
    return h


@partial(jax.jit, static_argnames=("nfft", "axis"))
def _hilbert_xla(u, *, nfft, axis):
    U = jnp.fft.fft(u, n=nfft, axis=axis)
    h = jnp.asarray(analytic_mask(nfft), dtype=U.real.dtype)
    shape = [1] * U.ndim
    shape[axis % U.ndim] = nfft
    return jnp.fft.ifft(U * h.reshape(shape), n=nfft, axis=axis)


@partial(jax.jit, static_argnames=("nfft", "axis"))
def _hilbert_mxu(u, *, nfft, axis):
    # NOTE (measured, do not "optimize"): routing this through the
    # half-spectrum rfft_pair/irfft_pair looks like a 2x MXU saving on
    # paper, but their even/odd packing is a lane-stride-2 de-interleave —
    # a pathological relayout on TPU that measured ~60x SLOWER than the
    # full transform for 2^23-sample demod (460 ms vs 7 ms on v5e).  The
    # full-length real-input path (first-stage matmuls already halve via
    # im=None) is the fast one on this hardware.
    Ur, Ui = mxu_fft.fft_pair(u, None, n=nfft, axis=axis)
    h = jnp.asarray(analytic_mask(nfft), dtype=Ur.dtype)
    shape = [1] * Ur.ndim
    shape[axis % Ur.ndim] = nfft
    h = h.reshape(shape)
    return mxu_fft.ifft_pair(Ur * h, Ui * h, n=nfft, axis=axis)


def hilbert(uin, nfft=None, axes=-1):
    """Return the analytic signal ``u + j H[u]`` (numpy complex, squeezed).

    API-parity with reference ``hilbert.hilbert`` (``hilbert.py:22``);
    batched over any leading axes, transform along ``axes``.
    """
    from .spectral import backend_supports_complex

    uin = np.atleast_1d(np.asarray(uin))
    if nfft is None:
        nfft = uin.shape[axes]
    if np.iscomplexobj(uin):
        # reference applies the same mask to complex inputs
        if backend_supports_complex():
            out = _hilbert_xla(jnp.asarray(uin), nfft=int(nfft), axis=axes)
            return np.asarray(out).squeeze()
        Ur, Ui = mxu_fft.fft_pair(jnp.asarray(uin.real),
                                  jnp.asarray(uin.imag), n=int(nfft),
                                  axis=axes)
        h = analytic_mask(int(nfft))
        shape = [1] * Ur.ndim
        shape[axes % Ur.ndim] = int(nfft)
        h = jnp.asarray(h, dtype=Ur.dtype).reshape(shape)
        zr, zi = mxu_fft.ifft_pair(Ur * h, Ui * h, n=int(nfft), axis=axes)
        return (np.asarray(zr) + 1j * np.asarray(zi)).squeeze()
    if backend_supports_complex():
        out = _hilbert_xla(jnp.asarray(uin), nfft=int(nfft), axis=axes)
        return np.asarray(out).squeeze()
    zr, zi = _hilbert_mxu(jnp.asarray(uin), nfft=int(nfft), axis=axes)
    return (np.asarray(zr) + 1j * np.asarray(zi)).squeeze()


@partial(jax.jit, static_argnames=("nfft", "axis"))
def _envelope_phase_dev(u, *, nfft, axis):
    if jax.default_backend() == "cpu":
        z = _hilbert_xla(u, nfft=nfft, axis=axis)
        zr, zi = jnp.real(z), jnp.imag(z)
    else:
        zr, zi = _hilbert_mxu(u, nfft=nfft, axis=axis)
    return jnp.sqrt(zr * zr + zi * zi), jnp.arctan2(zi, zr)


def envelope_phase(uin, nfft=None, axes=-1):
    """AM/PM demodulation via the analytic signal, reduced ON DEVICE.

    Returns ``(envelope, phase)`` as real arrays — the quantities the
    reference's demod chains actually consume (``Doppler.py:214-225``
    I/Q magnitude, ``hilbert`` docstring's instantaneous amplitude/phase)
    — without ever materializing the complex analytic signal on the host
    (a 2x transfer saving, and the TPU backend cannot ship complex
    buffers at all).
    """
    uin = np.atleast_1d(np.asarray(uin, dtype=np.float32))
    if nfft is None:
        nfft = uin.shape[axes]
    env, ph = _envelope_phase_dev(jnp.asarray(uin), nfft=int(nfft),
                                  axis=axes)
    return np.asarray(env).squeeze(), np.asarray(ph).squeeze()


def hilbert_1d(uin, nfft=None):
    """Mask-vector variant (reference ``hilbert.py:70-112``) — same result."""
    uin = np.atleast_1d(np.asarray(uin))
    if nfft is None:
        nfft = len(uin)
    return hilbert(uin, nfft=nfft, axes=-1)


def test_hilbert(plotit=False):
    """The reference's strongest oracle (hilbert.py:115-179): the analytic
    signal of sin must have imaginary part -cos (and agree with the
    scipy.fftpack.hilbert convention).  Raises on disagreement; returns
    the analytic signal."""
    t = np.linspace(0, 2 * np.pi, 1024, endpoint=False)
    x = np.sin(t)
    z = np.asarray(hilbert(x))
    want_imag = -np.cos(t)
    if not np.allclose(np.imag(z), want_imag, atol=1e-6):
        raise AssertionError("hilbert(sin) imaginary part != -cos")
    try:
        from scipy.fftpack import hilbert as sp_hilbert
        if not np.allclose(-sp_hilbert(x), np.imag(z), atol=1e-6):
            raise AssertionError("disagrees with scipy.fftpack.hilbert")
    except ImportError:  # pragma: no cover
        pass
    if plotit:  # pragma: no cover
        import matplotlib.pyplot as plt
        plt.figure("test_hilbert")
        plt.plot(t, x, t, np.imag(z), t, np.abs(z))
        plt.legend(["sin", "H(sin)", "envelope"])
    return z
