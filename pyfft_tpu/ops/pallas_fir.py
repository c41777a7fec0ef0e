"""Pallas TPU kernel: single-pass streaming FIR convolution.

Role of the reference's filtering hot path (``scipy.signal.filtfilt`` /
``np.convolve`` inside ``filters.py:36-123`` and ``smooth`` :226) — SURVEY
§7.5's second Pallas primitive.

Design: causal direct convolution ``y[n] = sum_k h[k] x[n-k]`` evaluated
as ``ntaps`` unrolled vector FMAs over *static lane slices* of a
VMEM-resident window.  Channels ride the sublane axis (blocks of 8
channels x ``block_t`` lanes), so each FMA is a full (8, block_t) VPU op.
The inter-block halo (``ntaps - 1`` samples) is satisfied by reading the
*next* time block of the same input with a second BlockSpec — no separate
halo exchange, no intermediate arrays: HBM traffic is exactly one read of
``x`` and one write of ``y``.

Memory-bound for small tap counts (the common 2nd-4th-order-equivalent
designs); for ``ntaps`` beyond ~256 the FFT overlap-save path
(``filters.oaconvolve``) has the better FLOP profile and remains the
default there.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


__all__ = ["fir_pallas", "PALLAS_FIR_MAX_TAPS"]

PALLAS_FIR_MAX_TAPS = 256


def _fir_kernel(cur_ref, nxt_ref, h_ref, out_ref, *, ntaps, block_t):
    """One (8, block_t) output tile: window = cur ++ head(next)."""
    cur = cur_ref[...]                       # (8, block_t)
    nxt = nxt_ref[...]
    win = jnp.concatenate([cur, nxt[:, :ntaps - 1]], axis=1)
    h = h_ref[...]                           # (1, ntaps) reversed taps
    acc = win[:, 0:block_t] * h[0, 0]
    for j in range(1, ntaps):                # unrolled static lane slices
        acc = acc + win[:, j:j + block_t] * h[0, j]
    out_ref[...] = acc


@partial(jax.jit, static_argnames=("ntaps", "block_t", "interpret"))
def _fir_call(xp, h_rev, *, ntaps, block_t, interpret):
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
            pl.BlockSpec((1, ntaps), lambda c, b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((8, block_t), lambda c, b: (c, b)),
        out_shape=jax.ShapeDtypeStruct((ncb * 8, nb * block_t), xp.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * ncb * 8 * nb * block_t * ntaps,
            bytes_accessed=4 * (xp.size + ncb * 8 * nb * block_t),
            transcendentals=0),
        interpret=interpret,
    )(xp, xp, h_rev)


def fir_pallas(x, taps, block_t=2048, interpret=None):
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

    block_t = min(block_t, max(512, ntaps))
    nb = -(-nt // block_t)                       # ceil
    L = (nb + 1) * block_t                       # + zero tail block
    ncb = -(-nch // 8)

    xp = jnp.zeros((ncb * 8, L), jnp.float32)
    xp = xp.at[:nch, ntaps - 1:ntaps - 1 + nt].set(x)

    h_rev = jnp.asarray(taps[::-1].copy(), jnp.float32).reshape(1, ntaps)
    y = _fir_call(xp, h_rev, ntaps=ntaps, block_t=block_t,
                  interpret=bool(interpret))
    y = y[:nch, :nt]
    return y[0] if squeeze else y
