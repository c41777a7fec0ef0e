"""Pallas TPU kernel: single-pass streaming FIR convolution (MXU matmul).

Role of the reference's filtering hot path (``scipy.signal.filtfilt`` /
``np.convolve`` inside ``filters.py:36-123`` and ``smooth`` :226) — SURVEY
§7.5's second Pallas primitive.

Design: causal FIR as a *banded-Toeplitz matmul* per time block.  For an
output block ``y[b*T : (b+1)*T]`` the kernel reads the input window
``w = xp[b*T : b*T + T + K - 1]`` (current block plus the head of the next
— delivered by a second, offset BlockSpec on the same array: no separate
halo pass) and computes

    y_block = w @ B,     B[i, j] = h_rev[i - j]   (banded, (T+K-1, T))

one dense MXU contraction per block; channels ride the sublane axis in
groups of 8.  HBM traffic is one read of ``x`` and one write of ``y``; the
band matrix is a small constant resident in VMEM.  Compared with the
FFT overlap-save path this spends ~``T/K``x more MXU FLOPs to stay
single-pass and fusion-free — a win whenever the chain is memory-bound
(K <= ~256), which is the regime of every filter the reference designs
(2nd-4th order Butterworth equivalents, notch biquads, smoothing kernels).
"""
from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


__all__ = ["fir_pallas", "PALLAS_FIR_MAX_TAPS"]

PALLAS_FIR_MAX_TAPS = 256


@lru_cache(maxsize=8)
def _band_matrix(taps_key, block_t, dtype=np.float32):
    """Banded Toeplitz ``B[i, j] = h_rev[i - j]`` (device-resident)."""
    h_rev = np.asarray(taps_key, dtype=np.float64)[::-1]
    ntaps = h_rev.size
    B = np.zeros((block_t + ntaps - 1, block_t), dtype=dtype)
    for j in range(block_t):
        B[j:j + ntaps, j] = h_rev
    return jax.device_put(B)


def _fir_kernel(cur_ref, nxt_ref, band_ref, out_ref, *, ntaps, block_t):
    """One (8, block_t) output tile: window = cur ++ head(next)."""
    win = jnp.concatenate(
        [cur_ref[...], nxt_ref[:, :ntaps - 1]], axis=1)  # (8, T+K-1)
    out_ref[...] = jnp.dot(win, band_ref[...],
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("ntaps", "block_t", "interpret"))
def _fir_call(xp, band, *, ntaps, block_t, interpret):
    ncb, L = xp.shape[0] // 8, xp.shape[1]
    nb = L // block_t - 1                    # last block is the zero tail
    grid = (ncb, nb)
    kern = partial(_fir_kernel, ntaps=ntaps, block_t=block_t)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, block_t), lambda c, b: (c, b)),
            pl.BlockSpec((8, block_t), lambda c, b: (c, b + 1)),
            pl.BlockSpec(band.shape, lambda c, b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((8, block_t), lambda c, b: (c, b)),
        out_shape=jax.ShapeDtypeStruct((ncb * 8, nb * block_t), xp.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * ncb * 8 * nb * (block_t + ntaps - 1) * block_t,
            bytes_accessed=4 * (xp.size + ncb * 8 * nb * block_t
                                + band.size),
            transcendentals=0),
        interpret=interpret,
    )(xp, xp, band)


def fir_pallas(x, taps, block_t=512, interpret=None):
    """Causal FIR filter of ``x (nch, nt)`` (or ``(nt,)``) with ``taps``.

    Matches ``np.convolve(x, taps, mode='full')[:nt]`` per channel (the
    convention of :func:`pyfft_tpu.filters.fir_filter`).  Channels are
    padded to a multiple of 8 (sublanes), time to a block multiple plus a
    zero tail block that serves as the final halo.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    taps = np.asarray(taps, dtype=np.float64)
    ntaps = taps.size
    if ntaps > PALLAS_FIR_MAX_TAPS:
        raise ValueError(
            f"{ntaps} taps > {PALLAS_FIR_MAX_TAPS}; use the overlap-save "
            "path (filters.oaconvolve) for long filters")
    x = jnp.asarray(x, jnp.float32)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None, :]
    nch, nt = x.shape

    block_t = max(128, min(block_t, 1024))
    nb = -(-nt // block_t)                       # ceil
    L = (nb + 1) * block_t                       # + zero tail block
    ncb = -(-nch // 8)

    xp = jnp.zeros((ncb * 8, L), jnp.float32)
    xp = xp.at[:nch, ntaps - 1:ntaps - 1 + nt].set(x)

    band = _band_matrix(tuple(taps.tolist()), block_t)
    y = _fir_call(xp, band, ntaps=ntaps, block_t=block_t,
                  interpret=bool(interpret))
    y = y[:nch, :nt]
    return y[0] if squeeze else y
