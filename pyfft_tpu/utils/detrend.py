"""Detrending primitives (JAX).

Role of ``pybaseutils.utils.detrend_mean/none/linear`` in the reference
(imported at reference ``fft_analysis.py:23``), with the reference's selection
convention ``detrend_style > 0 -> mean, == 0 -> none, < 0 -> linear``
(reference ``fft_analysis.py:2539-2549``).

All functions are pure, jit-able, and operate along a chosen axis with full
batching (the reference applies them over axis 0 of ``(nt, nch)`` arrays).
"""
from __future__ import annotations

import jax.numpy as jnp


def detrend_none(x, axis=0):
    """Identity detrend."""
    return x


def detrend_mean(x, axis=0):
    """Remove the mean along ``axis``."""
    x = jnp.asarray(x)
    return x - jnp.mean(x, axis=axis, keepdims=True)


def detrend_linear(x, axis=0):
    """Remove a least-squares linear fit along ``axis``.

    Matches ``matplotlib.mlab.detrend_linear`` semantics: fit ``y = a t + b``
    on a unit-spaced grid and subtract it.
    """
    x = jnp.asarray(x)
    n = x.shape[axis]
    t = jnp.arange(n, dtype=jnp.result_type(x.dtype, jnp.float32))
    # center t so the normal equations are diagonal
    t = t - jnp.mean(t)
    shape = [1] * x.ndim
    shape[axis] = n
    tb = t.reshape(shape)
    denom = jnp.sum(t * t)
    xm = jnp.mean(x, axis=axis, keepdims=True)
    slope = jnp.sum((x - xm) * tb, axis=axis, keepdims=True) / denom
    return x - xm - slope * tb


def detrend_func(detrend_style=None):
    """Map the reference's integer detrend-style flag to a function.

    Mirrors reference ``fft_analysis.py:2539-2549`` (``fftanal._detrend_func``):
    ``None -> 0``; ``>0 -> mean``; ``<0 -> linear``; ``0 -> none``.
    """
    if detrend_style is None:
        detrend_style = 0
    if detrend_style > 0:
        return detrend_mean
    elif detrend_style < 0:
        return detrend_linear
    return detrend_none
