"""Pallas TPU kernel: single-pass streaming FIR convolution (MXU matmul).

Role of the reference's filtering hot path (``scipy.signal.filtfilt`` /
``np.convolve`` inside ``filters.py:36-123`` and ``smooth`` :226) — SURVEY
§7.5's second Pallas primitive.

Design: the signal is viewed as **rows of 128 lanes** ``x (nch, nrows,
128)``; one grid step produces a tile of ``R`` output rows for one channel
as a sum of banded matmuls over row-shifted views,

    y_rows[l] = sum_s  x_all[l + s] @ B_s,     s = 0..m

where ``x_all = [halo (m rows), tile (R rows)]`` and ``B_s (128, 128)``
are the row-blocks of the banded-Toeplitz matrix ``B[i, j] =
taps_rev[i - j]`` built from the taps **right-padded** to ``m*128 + 1``
(trailing zeros leave the convolution alignment unchanged, so the output
needs no offset slice).  The ``m = ceil((K-1)/128)`` halo rows a tile
needs *before* its own rows are delivered as a tiny side array (zeros for
the first tile — they stand in for the K-1 leading zeros of a causal
'full' convolution), so HBM traffic is exactly one read of ``x``, one
write of ``y``, and a negligible halo stream — while every matmul runs
with M = R >= 256 rows, saturating the 128x128 MXU (a per-channel M=8
tiling would waste 16x of the systolic array).

Compared with the FFT overlap-save path this spends ~(m+1)*128/K more MXU
FLOPs to stay single-pass and transpose-free — the right trade whenever
the chain is memory-bound (K <= ~1024), which covers every filter the
reference designs (2nd-4th order Butterworth equivalents, notch biquads,
smoothing kernels).

Precision: in-kernel ``bf16x3`` (3 bf16 passes, f32 accumulate; the band
constants are pre-split host-side) by default on TPU — ~1e-5 relative,
half the MXU passes of HIGHEST.  See :mod:`pyfft_tpu.ops.precision`.
"""
from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .precision import dot_bf16x3, resolve_kernel_precision

__all__ = ["fir_pallas", "PALLAS_FIR_MAX_TAPS"]

PALLAS_FIR_MAX_TAPS = 1024  # m = 8 shifted matmuls; beyond this use overlap-save

_LANES = 128


@lru_cache(maxsize=16)
def _band_blocks(taps_key, kprec):
    """Row-blocks ``B_s`` of the banded Toeplitz matrix (host numpy —
    pure, so it is safe to call under a trace; jit closes over the values).

    The taps are right-padded to ``K' = m*128 + 1`` so that ``K'-1`` is an
    exact row count; ``B[i, j] = taps'_rev[i - j]``, split into ``m+1``
    ``(128, 128)`` blocks.  Each entry is ``(B_s,)`` for f32 modes or
    ``(B_s_hi, B_s_lo)`` for the bf16x3 split.
    """
    import ml_dtypes
    bf16 = ml_dtypes.bfloat16
    taps = np.asarray(taps_key, dtype=np.float64)
    K = taps.size
    m = -(-(K - 1) // _LANES)
    Kp = m * _LANES + 1
    taps_rev = np.zeros(Kp)
    taps_rev[Kp - K:] = taps[::-1]          # right-pad taps = left-pad reversal
    B = np.zeros(((m + 1) * _LANES, _LANES), dtype=np.float32)
    for j in range(_LANES):
        B[j:j + Kp, j] = taps_rev
    blocks = []
    for s in range(m + 1):
        Bs = B[s * _LANES:(s + 1) * _LANES]
        if kprec == "bf16x3":
            hi = Bs.astype(bf16)
            lo = (Bs - hi.astype(np.float32)).astype(bf16)
            blocks.append((hi, lo))
        elif kprec == "bf16":
            blocks.append((Bs.astype(bf16),))
        else:
            blocks.append((Bs,))
    return tuple(blocks)


def _fir_kernel(x_ref, halo_ref, *refs, m, rows, kprec):
    """One (1, R, 128) output tile: shifted banded matmuls over m+R rows."""
    band_refs, out_ref = refs[:-1], refs[-1]
    x = jnp.concatenate([halo_ref[0, 0], x_ref[0]], axis=0)  # (m+R, 128)
    acc = None
    for s in range(m + 1):
        xs = x[s:rows + s]
        if kprec == "bf16x3":
            t = dot_bf16x3(xs, band_refs[2 * s][...], band_refs[2 * s + 1][...])
        elif kprec == "bf16":
            t = jnp.dot(xs.astype(jnp.bfloat16), band_refs[s][...],
                        preferred_element_type=jnp.float32)
        else:
            t = jnp.dot(xs, band_refs[s][...],
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
        acc = t if acc is None else acc + t
    out_ref[...] = acc[None]


def _fir_call(xr, halo, bands_flat, *, m, rows, kprec, interpret):
    nch, nrows, _ = xr.shape
    nrb = nrows // rows
    grid = (nch, nrb)
    band_specs = [pl.BlockSpec(b.shape, lambda c, r: (0, 0))
                  for b in bands_flat]
    return pl.pallas_call(
        partial(_fir_kernel, m=m, rows=rows, kprec=kprec),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rows, _LANES), lambda c, r: (c, r, 0)),
            pl.BlockSpec((1, 1, m, _LANES), lambda c, r: (c, r, 0, 0)),
            *band_specs,
        ],
        out_specs=pl.BlockSpec((1, rows, _LANES), lambda c, r: (c, r, 0)),
        out_shape=jax.ShapeDtypeStruct((nch, nrows, _LANES), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * nch * nrows * _LANES * (m + 1) * _LANES,
            bytes_accessed=4 * (2 * xr.size + halo.size),
            transcendentals=0),
        interpret=interpret,
    )(xr, halo, *bands_flat)


@partial(jax.jit,
         static_argnames=("K", "m", "rows", "kprec", "interpret"))
def _fir_pipeline(x, bands_flat, *, K, m, rows, kprec, interpret):
    """Row view -> halo gather -> kernel; one device dispatch.

    HBM passes: (optional) tail pad of ``x``, one kernel read+write, and
    (optional) tail trim — the pad/trim vanish when ``nt`` is already a
    multiple of ``rows*128`` (the common power-of-two case).
    """
    nch, nt = x.shape
    nrows_sig = -(-nt // _LANES)
    nrows = -(-nrows_sig // rows) * rows
    L = nrows * _LANES
    if L != nt:
        x = jnp.pad(x, [(0, 0), (0, L - nt)])
    xr = x.reshape(nch, nrows, _LANES)

    # halo for tile b: rows [b*R - m, b*R); zeros for b=0 (causal lead-in)
    nrb = nrows // rows
    idx = (np.arange(nrb) * rows)[:, None] + np.arange(-m, 0)[None, :]
    halo = jnp.take(xr, jnp.asarray(np.maximum(idx.reshape(-1), 0)), axis=1)
    halo = halo.reshape(nch, nrb, m, _LANES)
    halo = halo.at[:, 0].set(0.0)

    y = _fir_call(xr, halo, bands_flat, m=m, rows=rows, kprec=kprec,
                  interpret=interpret)
    y = y.reshape(nch, L)
    return y if L == nt else y[:, :nt]


def fir_pallas(x, taps, block_rows=512, interpret=None, precision=None):
    """Causal FIR filter of ``x (nch, nt)`` (or ``(nt,)``) with ``taps``.

    Matches ``np.convolve(x, taps, mode='full')[:nt]`` per channel (the
    convention of :func:`pyfft_tpu.filters.fir_filter`).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    kprec = resolve_kernel_precision(precision)
    taps = np.asarray(taps, dtype=np.float64)
    K = taps.size
    if K > PALLAS_FIR_MAX_TAPS:
        raise ValueError(
            f"{K} taps > {PALLAS_FIR_MAX_TAPS}; use the overlap-save "
            "path (filters.oaconvolve) for long filters")
    x = jnp.asarray(x, jnp.float32)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None, :]
    m = -(-(K - 1) // _LANES)
    rows = int(max(8, min(block_rows, 1024)))

    bands = _band_blocks(tuple(taps.tolist()), kprec)
    bands_flat = tuple(b for blk in bands for b in blk)
    y = _fir_pipeline(x, bands_flat, K=K, m=m, rows=rows,
                      kprec=kprec, interpret=bool(interpret))
    return y[0] if squeeze else y
