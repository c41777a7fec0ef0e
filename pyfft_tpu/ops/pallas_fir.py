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

__all__ = ["fir_pallas", "fir_pallas_tiled", "tile_rows", "untile_rows",
           "fir_transpose_pallas", "fir_transpose_blocking",
           "PALLAS_FIR_MAX_TAPS"]

PALLAS_FIR_MAX_TAPS = 1024  # m = 8 shifted matmuls; beyond this use overlap-save

_LANES = 128

# scoped-VMEM budget for one grid step's double-buffered blocks.  The chip
# limit is 16 MiB and Mosaic charges ~2x (in + out) for the pipelined
# blocks; leave headroom for the band tables, halos, and stack.
_VMEM_BUDGET = 14 * 1024 * 1024


def _fit_block_rows(rows, G, m):
    """Largest halving-reduced ``rows <= rows_in`` whose grid step fits
    the scoped-VMEM budget (``G`` channel blocks in + out,
    double-buffered), always a multiple of 8 (the inline-halo window
    height — every caller relies on this invariant).

    Without the clamp, ``block_rows=1024`` at 8 grouped channels
    dispatches a 16.8 MiB step and the Mosaic compile fails with a
    scoped-vmem OOM (observed on TPU v5e); clamping trades blocking
    granularity for a guaranteed compile."""
    step_bytes = lambda r: 2 * (2 * G * r * _LANES * 4           # noqa: E731
                                + G * max(m, 1) * _LANES * 4)
    rows = max(8, int(rows) // 8 * 8)
    while rows > 8 and step_bytes(rows) > _VMEM_BUDGET:
        rows = max(8, rows // 2 // 8 * 8)
    return rows


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


def _band_dot(a, s, band_refs, kprec):
    """``a @ B_s`` with the flat pre-split band-table layout."""
    if kprec == "bf16x3":
        return dot_bf16x3(a, band_refs[2 * s][...], band_refs[2 * s + 1][...])
    if kprec == "bf16":
        return jnp.dot(a.astype(jnp.bfloat16), band_refs[s][...],
                       preferred_element_type=jnp.float32)
    return jnp.dot(a, band_refs[s][...],
                   precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)


def _banded_matmul(x, h, band_refs, m, rows, kprec):
    """``sum_s x_all[s:rows+s] @ B_s`` with ``x_all = [h (m rows); x]``.

    Shift-after-product form: every band multiplies the UNSLICED tile
    (``P_s = x @ B_s``) and alignment happens on the outputs —
    ``contribution_s = [H_s[s:m]; P_s[:rows-(m-s)]]`` with ``H_s = h @
    B_s`` tiny halo products.  The naive form (concatenate halo+tile,
    three sublane-shifted input slices per channel) cost more VPU shuffle
    time than the matmuls themselves: measured on-chip, the whole kernel
    ran at the serial sum of DMA and shuffle (~4.6 ms for 8x2^24) while
    an identical kernel without the slices hit the DMA roofline (~2.9 ms,
    compute fully hidden).  This form keeps one m-row concat per band
    instead of a full-tile concat plus per-band slices."""
    acc = None
    for s in range(m + 1):
        P = _band_dot(x, s, band_refs, kprec)                # (rows, 128)
        if s == m:
            c = P
        else:
            H = _band_dot(h, s, band_refs, kprec)            # (m, 128)
            c = jnp.concatenate([H[s:], P[:rows - (m - s)]], axis=0)
        acc = c if acc is None else acc + c
    return acc


def _fir_kernel(x_ref, halo_ref, *refs, m, rows, kprec, transposed, G=1,
                inline_halo=False):
    """One grid step: ``G`` channels of one row block (channel-grouped
    steps move ~G x (rows, 128) per DMA — per-channel tiny steps measured
    well below the achievable HBM rate).

    ``inline_halo``: the halo block is an 8-row window of the INPUT array
    itself (the tail of the previous row block, index-mapped by the
    BlockSpec), masked to zero on the first block.  Measured on v5e: a
    host-side ``jnp.take`` halo gather in the same jit as the kernel
    forced a full-array pass (227 GB/s end-to-end vs 378 kernel-only,
    8 x 2^24); the windowed read costs one extra 4 KB DMA per step and
    restores the kernel-only rate."""
    band_refs, out_ref = refs[:-1], refs[-1]
    for g in range(G):
        if m == 0:
            h = None
        elif inline_halo:
            r = pl.program_id(1)
            h = halo_ref[g, 8 - m:] * jnp.where(r > 0, 1.0, 0.0)
        else:
            h = halo_ref[g, 0]
        acc = _banded_matmul(x_ref[g], h, band_refs, m, rows, kprec)
        if transposed:
            out_ref[...] = acc
        else:
            out_ref[g] = acc


def _fir_call(xr, halo, bands_flat, *, m, rows, kprec, interpret,
              transposed=False, inline_halo=False):
    nch, nrows, _ = xr.shape
    nrb = nrows // rows
    if inline_halo and not transposed:
        # halo = the last 8 rows of the previous row block, read as a
        # windowed BlockSpec over the input itself (m <= 8 always: taps
        # are capped at 1024).  No gather pass; the r = 0 window is
        # clamped in-bounds and masked to zero in the kernel.
        assert m <= 8 and rows % 8 == 0
        G = min(nch, 8)
        ncg = -(-nch // G)
        grid = (ncg, nrb)
        band_specs = [pl.BlockSpec(b.shape, lambda c, r: (0, 0))
                      for b in bands_flat]
        rb8 = rows // 8
        in_specs = [
            pl.BlockSpec((G, rows, _LANES), lambda c, r: (c, r, 0)),
            pl.BlockSpec((G, 8, _LANES),
                         lambda c, r: (c, jnp.maximum(r * rb8 - 1, 0), 0)),
            *band_specs,
        ]
        out_specs = pl.BlockSpec((G, rows, _LANES), lambda c, r: (c, r, 0))
        out_shape = jax.ShapeDtypeStruct((nch, nrows, _LANES), jnp.float32)
        return pl.pallas_call(
            partial(_fir_kernel, m=m, rows=rows, kprec=kprec,
                    transposed=False, G=G, inline_halo=True),
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            cost_estimate=pl.CostEstimate(
                flops=2 * nch * nrows * _LANES * (m + 1) * _LANES,
                bytes_accessed=4 * 2 * xr.size,
                transcendentals=0),
            interpret=interpret,
        )(xr, xr, *bands_flat)
    if transposed:
        # write y[row, c*128:(c+1)*128]: the channel-major -> row-major
        # relayout the downstream consumer wants happens through the
        # output DMA for free (lane-blocked output BlockSpec).
        grid = (nch, nrb)
        band_specs = [pl.BlockSpec(b.shape, lambda c, r: (0, 0))
                      for b in bands_flat]
        in_specs = [
            pl.BlockSpec((1, rows, _LANES), lambda c, r: (c, r, 0)),
            pl.BlockSpec((1, 1, max(m, 1), _LANES),
                         lambda c, r: (c, r, 0, 0)),
            *band_specs,
        ]
        out_specs = pl.BlockSpec((rows, _LANES), lambda c, r: (r, c))
        out_shape = jax.ShapeDtypeStruct((nrows, nch * _LANES), jnp.float32)
        G = 1
    else:
        # channel-grouped: grid over (channel groups, row blocks); the
        # trailing group may be partial (out-of-bounds lanes are masked
        # on write, garbage reads never leave the kernel)
        G = min(nch, 8)
        ncg = -(-nch // G)
        grid = (ncg, nrb)
        band_specs = [pl.BlockSpec(b.shape, lambda c, r: (0, 0))
                      for b in bands_flat]
        in_specs = [
            pl.BlockSpec((G, rows, _LANES), lambda c, r: (c, r, 0)),
            pl.BlockSpec((G, 1, max(m, 1), _LANES),
                         lambda c, r: (c, r, 0, 0)),
            *band_specs,
        ]
        out_specs = pl.BlockSpec((G, rows, _LANES), lambda c, r: (c, r, 0))
        out_shape = jax.ShapeDtypeStruct((nch, nrows, _LANES), jnp.float32)
    return pl.pallas_call(
        partial(_fir_kernel, m=m, rows=rows, kprec=kprec,
                transposed=transposed, G=G),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * nch * nrows * _LANES * (m + 1) * _LANES,
            bytes_accessed=4 * (2 * xr.size + halo.size),
            transcendentals=0),
        interpret=interpret,
    )(xr, halo, *bands_flat)


def _tile_halo(xr, m, rows):
    """Per-tile causal halos for the row view ``xr (nch, nrows, 128)``:
    tile ``b`` gets rows ``[b*rows - m, b*rows)``, zeros for ``b = 0``
    (they stand in for the K-1 leading zeros of a 'full' convolution).
    A tiny on-device gather (``nrb * m`` rows per channel)."""
    nch, nrows, _ = xr.shape
    nrb = nrows // rows
    if m == 0:
        return jnp.zeros((nch, nrb, 1, _LANES), xr.dtype)  # unread dummy
    idx = (np.arange(nrb) * rows)[:, None] + np.arange(-m, 0)[None, :]
    halo = jnp.take(xr, jnp.asarray(np.maximum(idx.reshape(-1), 0)),
                    axis=1)
    halo = halo.reshape(nch, nrb, m, _LANES)
    return halo.at[:, 0].set(0.0)


@partial(jax.jit,
         static_argnames=("K", "m", "rows", "kprec", "interpret",
                          "transposed"))
def _fir_pipeline(x, bands_flat, *, K, m, rows, kprec, interpret,
                  transposed=False):
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

    # non-transposed: halos ride a windowed BlockSpec (inline_halo); the
    # transposed feeder keeps the explicit gather (its grid is per-channel)
    halo = _tile_halo(xr, m, rows) if transposed else None
    y = _fir_call(xr, halo, bands_flat, m=m, rows=rows, kprec=kprec,
                  interpret=interpret, transposed=transposed,
                  inline_halo=not transposed)
    if transposed:
        return y                      # (nrows, nch*128), padded rows kept
    y = y.reshape(nch, L)
    return y if L == nt else y[:, :nt]


def fir_pallas(x, taps, block_rows=512, interpret=None, precision=None,
               transposed_out=False):
    """Causal FIR filter of ``x (nch, nt)`` (or ``(nt,)``) with ``taps``.

    Matches ``np.convolve(x, taps, mode='full')[:nt]`` per channel (the
    convention of :func:`pyfft_tpu.filters.fir_filter`).  With
    ``transposed_out=True`` the result is returned as the row-major
    ``(nrows, nch*128)`` tile layout (padded rows included) consumed by
    the v3 fused Welch kernel — the transpose rides the output DMA.
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
    # G mirrors _fir_call's channel grouping (1 when transposed);
    # _fit_block_rows returns a multiple of 8 (the inline-halo window)
    rows = _fit_block_rows(int(max(8, min(block_rows, 1024))),
                           1 if transposed_out else min(x.shape[0], 8), m)

    bands = _band_blocks(tuple(taps.tolist()), kprec)
    bands_flat = tuple(b for blk in bands for b in blk)
    y = _fir_pipeline(x, bands_flat, K=K, m=m, rows=rows,
                      kprec=kprec, interpret=bool(interpret),
                      transposed=bool(transposed_out))
    if transposed_out:
        return y
    return y[0] if squeeze else y


# --------------------------------------------------------------------------- #
# Tiled-layout entry: keep the data in the kernel-native row view
# --------------------------------------------------------------------------- #
#
# On TPU a rank-changing reshape ``(nch, nt) -> (nch, nt/128, 128)`` is a
# PHYSICAL retiling (the (8, 128) tile assignment changes), costing one
# full read+write pass of the signal on each side of the kernel — measured
# ~35% of ``fir_pallas``'s end-to-end wall at 8 x 2^24 on v5e (round-4
# commit 6b4bdce).  A pipeline that filters more than once, or feeds the
# v3 Welch kernel, should cross the layout boundary ONCE via
# ``tile_rows`` / ``untile_rows`` and chain ``fir_pallas_tiled`` calls on
# the row view in between; the kernel itself then runs at the DMA roofline
# (one read of x, one write of y, a negligible on-device halo gather).


def tile_rows(x, block_rows=512):
    """``x (nch, nt) | (nt,) -> (xr (nch, nrows, 128), nt)``: the
    kernel-native row view, zero-padded so ``nrows`` is a multiple of
    ``block_rows`` (rounded up to a multiple of 8 — the inline-halo
    window height, so the view always admits a legal blocking).  Time
    sample ``t`` of channel ``c`` lives at ``xr[c, t // 128, t % 128]``.
    Pay this retiling pass once per pipeline, not once per filter call."""
    x = jnp.asarray(x, jnp.float32)
    if x.ndim == 1:
        x = x[None]
    nch, nt = x.shape
    block_rows = max(8, int(block_rows) + (-int(block_rows)) % 8)
    nrows = -(-nt // (block_rows * _LANES)) * block_rows
    L = nrows * _LANES
    if L != nt:
        x = jnp.pad(x, [(0, 0), (0, L - nt)])
    return x.reshape(nch, nrows, _LANES), nt


def untile_rows(xr, nt):
    """Inverse of :func:`tile_rows`: ``(nch, nrows, 128) -> (nch, nt)``."""
    nch = xr.shape[0]
    return xr.reshape(nch, -1)[:, :nt]


def fir_pallas_tiled(xr, taps, interpret=None, precision=None):
    """Causal FIR filter on the kernel-native row view, in -> out same
    layout (``(nch, nrows, 128)``), zero retiling passes.

    Semantics match :func:`fir_pallas` on ``untile_rows(xr, nt)``: channel
    ``c`` becomes ``np.convolve(x[c], taps, 'full')[:nt]`` (the padded
    tail rows carry the convolution ring-out into the padding — harmless,
    trimmed by ``untile_rows``).  ``nrows`` must admit a row blocking
    ``rows > ceil((K-1)/128)`` (guaranteed by :func:`tile_rows`).
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
    xr = jnp.asarray(xr, jnp.float32)
    if xr.ndim != 3 or xr.shape[-1] != _LANES:
        raise ValueError(f"expected (nch, nrows, {_LANES}) from tile_rows, "
                         f"got {xr.shape}")
    nch, nrows, _ = xr.shape
    m = -(-(K - 1) // _LANES)
    # largest multiple of 8 (the inline-halo window height) that divides
    # nrows and fits the VMEM budget
    cap = _fit_block_rows(int(min(1024, nrows)), min(nch, 8), m)
    rows = 0
    for r in range(cap // 8 * 8, 7, -8):
        if nrows % r == 0:
            rows = r
            break
    if not rows or rows <= m:
        raise ValueError(
            f"nrows={nrows} admits no multiple-of-8 row blocking > m={m}; "
            "re-tile with tile_rows(x) (default blocking)")
    bands = _band_blocks(tuple(taps.tolist()), kprec)
    bands_flat = tuple(b for blk in bands for b in blk)
    return _fir_tiled_pipeline(xr, bands_flat, m=m, rows=rows, kprec=kprec,
                               interpret=bool(interpret))


@partial(jax.jit, static_argnames=("m", "rows", "kprec", "interpret"))
def _fir_tiled_pipeline(xr, bands_flat, *, m, rows, kprec, interpret):
    return _fir_call(xr, None, bands_flat, m=m, rows=rows, kprec=kprec,
                     interpret=interpret, inline_halo=True)


# --------------------------------------------------------------------------- #
# FIR + transpose fused feeder for the v3 Welch kernel
# --------------------------------------------------------------------------- #
#
# ``fir_transpose_pallas`` reads the ORIGINAL ``x (nt,)`` / ``y (nch, nt)``
# arrays (free row views — no concatenate, no pad: XLA materializes each of
# those as a full-signal HBM copy, which profiling showed cost more than the
# FIR itself) and writes the filtered, channel-interleaved ``(nrows_out,
# (nch+1)*128)`` layout the v3 kernel streams.  Tail rows past the signal
# are zero-filled by dedicated grid steps; input index maps clamp in-bounds.


def _fir_t_kernel(x_ref, y_ref, xh_ref, yh_ref, srow_ref, *refs, m, rows,
                  kprec, nrb_sig, C, sub):
    """One grid step = ALL channels of one row block: the per-channel
    banded matmuls write lane-group slices of the (rows, C*128) output
    block.  One step therefore moves ~C x (rows, 128) in and one
    (rows, C*128) out — few large DMAs instead of a (C, nrb) grid of tiny
    ones (which profiled ~5x slower than HBM should allow)."""
    band_refs, out_ref = refs[:-1], refs[-1]
    r = pl.program_id(0)

    @pl.when(r >= nrb_sig)
    def _tail():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(r < nrb_sig)
    def _body():
        for c in range(C):
            blk = x_ref[...] if c == 0 else y_ref[c - 1]     # (rows, 128)
            if m:
                h = xh_ref[0] if c == 0 else yh_ref[c - 1, 0]
            else:
                h = None
            acc = _banded_matmul(blk, h, band_refs, m, rows, kprec)
            if sub:
                acc = acc - srow_ref[:, c * _LANES:(c + 1) * _LANES]
            out_ref[:, c * _LANES:(c + 1) * _LANES] = acc


@partial(jax.jit, static_argnames=("K", "m", "rows", "nrows_out", "kprec",
                                   "interpret", "C"))
def _fir_t_pipeline(x, y, bands_flat, sub_row, *, K, m, rows, nrows_out,
                    kprec, interpret, C=None):
    nch, nt = y.shape
    if C is None:
        C = nch + 1
    nr = nt // _LANES
    nrb_sig = nr // rows
    nrb_out = nrows_out // rows
    xr = x.reshape(nr, _LANES)
    yr = y.reshape(nch, nr, _LANES)

    sub = sub_row is not None
    if sub_row is None:
        sub_row = jnp.zeros((1, C * _LANES), jnp.float32)

    # per-tile causal halos (tiny gathers; zeros for the first tile)
    if m:
        idx = (np.arange(nrb_sig) * rows)[:, None] + np.arange(-m, 0)[None]
        gidx = jnp.asarray(np.maximum(idx.reshape(-1), 0))
        xh = jnp.take(xr, gidx, axis=0).reshape(nrb_sig, m, _LANES)
        xh = xh.at[0].set(0.0)
        yh = jnp.take(yr, gidx, axis=1).reshape(nch, nrb_sig, m, _LANES)
        yh = yh.at[:, 0].set(0.0)
    else:
        xh = jnp.zeros((nrb_sig, 1, _LANES), jnp.float32)
        yh = jnp.zeros((nch, nrb_sig, 1, _LANES), jnp.float32)
    mh = max(m, 1)

    cl = nrb_sig - 1                       # clamp for the zero-tail steps
    return pl.pallas_call(
        partial(_fir_t_kernel, m=m, rows=rows, kprec=kprec,
                nrb_sig=nrb_sig, C=C, sub=sub),
        grid=(nrb_out,),
        in_specs=[
            pl.BlockSpec((rows, _LANES), lambda r: (jnp.minimum(r, cl), 0)),
            pl.BlockSpec((max(nch, 1), rows, _LANES),
                         lambda r: (0, jnp.minimum(r, cl), 0)),
            pl.BlockSpec((1, mh, _LANES),
                         lambda r: (jnp.minimum(r, cl), 0, 0)),
            pl.BlockSpec((max(nch, 1), 1, mh, _LANES),
                         lambda r: (0, jnp.minimum(r, cl), 0, 0)),
            pl.BlockSpec((1, C * _LANES), lambda r: (0, 0)),
            *[pl.BlockSpec(b.shape, lambda r: (0, 0))
              for b in bands_flat],
        ],
        out_specs=pl.BlockSpec((rows, C * _LANES), lambda r: (r, 0)),
        out_shape=jax.ShapeDtypeStruct((nrows_out, C * _LANES), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * C * nrows_out * _LANES * (m + 1) * _LANES,
            bytes_accessed=8 * C * nrows_out * _LANES,
            transcendentals=0),
        interpret=interpret,
    )(xr, yr, xh, yh, sub_row, *bands_flat)


def fir_transpose_blocking(nt, nrows_out, ntaps, block_rows=512):
    """Largest row blocking ``fir_transpose_pallas`` can use for this
    geometry, or ``None`` when no legal blocking exists (``nt % 128``,
    or every common divisor of ``nt//128`` and ``nrows_out`` at or below
    ``block_rows`` is <= the halo row count ``m`` — e.g. ``nt = 128*998``
    with 200 taps).  Callers must fall back to the padded
    :func:`fir_pallas` path when this returns ``None``."""
    if nt % _LANES:
        return None
    nr = nt // _LANES
    m = -(-(ntaps - 1) // _LANES)
    rows = int(max(1, min(block_rows, 1024)))
    while nr % rows or nrows_out % rows:
        rows //= 2
        if rows < 1:
            return None
    return rows if rows > m else None


def fir_transpose_pallas(x, y, taps, nrows_out, interpret=None,
                         precision=None, block_rows=512, sub_row=None):
    """Filter ``[x; y]`` and emit the v3 row-major ``(nrows_out, C*128)``
    signal layout in one kernel, reading ``x``/``y`` in place.

    Requires ``nt % 128 == 0`` (callers fall back to
    :func:`fir_pallas` + explicit padding otherwise).  Rows past the
    signal are zeros.  ``taps=(1.0,)`` gives a pure transpose/interleave.
    ``sub_row`` (``(1, C*128)``): optional per-lane value subtracted from
    every *signal* row after filtering (tail rows stay exactly zero) — the
    fused global-mean detrend of the downstream Welch kernels.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    kprec = resolve_kernel_precision(precision)
    taps = np.asarray(taps, dtype=np.float64)
    K = taps.size
    if K > PALLAS_FIR_MAX_TAPS:
        raise ValueError(f"{K} taps > {PALLAS_FIR_MAX_TAPS}")
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    nt = x.shape[-1]
    C = y.shape[0] + 1
    if y.shape[0] == 0:
        # single-signal case: the y BlockSpec still needs an array to map
        # into, but the kernel only ever selects x (c == 0 always)
        y = jnp.zeros((1, nt), jnp.float32)
        C = 1
    if nt % _LANES:
        raise ValueError("fir_transpose_pallas needs nt % 128 == 0")
    m = -(-(K - 1) // _LANES)
    rows = fir_transpose_blocking(nt, nrows_out, K, block_rows)
    # VMEM fit: one step moves C blocks in + one (rows, C*128) out,
    # double-buffered.  Shrink via fir_transpose_blocking so the
    # divisibility invariants it guarantees survive (a bare halving of an
    # odd row count from a non-power-of-two block_rows would not).
    while rows is not None and 2 * (2 * C * rows * _LANES * 4) > _VMEM_BUDGET:
        rows = fir_transpose_blocking(nt, nrows_out, K, rows // 2)
    if rows is None:
        raise ValueError(
            f"no row blocking > m={m} divides nr={nt // _LANES} and "
            f"nrows_out={nrows_out}; use fir_pallas with padding instead")
    bands = _band_blocks(tuple(taps.tolist()), kprec)
    bands_flat = tuple(b for blk in bands for b in blk)
    return _fir_t_pipeline(x, y, bands_flat, sub_row, K=K, m=m, rows=rows,
                           nrows_out=nrows_out, kprec=kprec,
                           interpret=bool(interpret), C=C)
