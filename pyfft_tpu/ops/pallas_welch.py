"""Pallas TPU kernel: fused windowed-DFT cross-power accumulation.

The framework's native kernel tier (role of the compiled hot loop the
reference delegates to NumPy's pocketfft; SURVEY §2.2/§7.5).  The Welch
inner product

    Pyy[f] = sum_g |(w * y_g) . W[:, f]|^2
    Pxy[f] = sum_g (w * y_g) . W[:, f] * conj(X0_g[f])

is evaluated as a tiled MXU matmul with the window *folded into the DFT
matrix* (``W_w = diag(w) @ W``) and the per-segment powers accumulated in
VMEM across the segment-grid dimension — the (navr, nfreq) STFT is never
materialized in HBM.  Memory traffic is one read of the framed signal and
one tiny write of the accumulated spectra; arithmetic is dense
``(seg_tile, nwins) @ (nwins, freq_tile)`` contractions on the 128x128 MXU.

Used by the ``fft_backend='pallas'`` fast path for one-sided real-input
Welch estimation with moderate segment lengths (direct DFT is O(nwins) work
per sample; favored for ``nwins <= ~4096`` where it beats the multi-pass
four-step recursion by avoiding its HBM-bound transposes).

:func:`welch_pallas_fused` is the production entry: detrend -> frame ->
reference-channel STFT -> fused accumulation in ONE jitted dispatch (the
remote-TPU tunnel charges ~2 ms per dispatch, so eager stage glue costs
more than the math).  Precision: in-kernel ``bf16x3`` by default on TPU
(3 bf16 passes, f32 accumulate, tables pre-split host-side; ~1e-6
relative on averaged spectra) — see :mod:`pyfft_tpu.ops.precision`.
"""
from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .precision import dot_bf16x3, resolve_kernel_precision


__all__ = ["welch_power_pallas", "welch_pallas_fused", "stft_matmul_tables",
           "pallas_welch_applicable"]


def _round_up(x, m):
    return ((x + m - 1) // m) * m


# Scoped VMEM per-core is 16MB on v5e; stay under it with headroom for the
# compiler's own scratch.
_VMEM_BUDGET = 11 * 1024 * 1024


def _vmem_bytes(nwins, freq_tile, seg_tile):
    """Double-buffered VMEM footprint of one grid step (f32-equivalent;
    the bf16x3 split swaps 2 f32 tables for 4 bf16 ones — same bytes)."""
    tables = 2 * (2 * nwins * freq_tile)          # Wr+Wi blocks, x2 buffers
    frames = 2 * (seg_tile * nwins)               # y block
    ref = 2 * (2 * seg_tile * freq_tile)          # x0r+x0i blocks
    outs = 2 * (3 * freq_tile)
    return 4 * (tables + frames + ref + outs)


def _choose_tiles(nwins, nfreq, B, seg_tile, freq_tile):
    """Shrink (seg_tile, freq_tile) until the VMEM footprint fits.

    Returns ``None`` when even the minimal (8, 128) tiling exceeds the
    budget (very long segments) — callers fall back to the mxu path.
    """
    seg_tile = min(seg_tile, _round_up(B, 8))
    freq_tile = min(freq_tile, _round_up(nfreq, 128))
    while _vmem_bytes(nwins, freq_tile, seg_tile) > _VMEM_BUDGET:
        if freq_tile > 128:
            freq_tile -= 128
        elif seg_tile > 8:
            seg_tile = max(8, seg_tile // 2)
        else:
            return None
    return seg_tile, freq_tile


def pallas_welch_applicable(nwins, nfreq=None, B=1):
    """Whether the fused kernel can tile ``nwins``-sample segments in VMEM."""
    nfreq = nfreq if nfreq is not None else nwins // 2 + 1
    return _choose_tiles(nwins, nfreq, B, 128, 256) is not None


@lru_cache(maxsize=None)
def stft_matmul_tables(nwins: int, nfreq: int, win_key, dtype=np.float32):
    """Window-folded one-sided DFT matrices ``W_w[n, f]`` (cos, -sin)."""
    win = np.asarray(win_key, dtype=np.float64)
    n = np.arange(nwins)
    f = np.arange(nfreq)
    ang = (2.0 * np.pi / nwins) * np.outer(n, f)
    C = (np.cos(ang) * win[:, None]).astype(dtype)
    S = (-np.sin(ang) * win[:, None]).astype(dtype)
    return C, S


@lru_cache(maxsize=8)
def _host_tables(nwins: int, nfreq: int, win_key, kprec: str):
    """Window-folded DFT tables pre-split for ``kprec`` (host numpy —
    pure, so safe to build under a trace).

    Returns a flat tuple: f32 ``(Wr, Wi)`` plus, for bf16x3/bf16, the
    kernel-side bf16 variants ``(Wr_hi, Wr_lo, Wi_hi, Wi_lo)`` /
    ``(Wr_b, Wi_b)``.
    """
    import ml_dtypes
    bf16 = ml_dtypes.bfloat16
    C, S = stft_matmul_tables(nwins, nfreq, win_key)
    out = [C, S]
    if kprec == "bf16x3":
        for T in (C, S):
            hi = T.astype(bf16)
            lo = (T - hi.astype(np.float32)).astype(bf16)
            out += [hi, lo]
    elif kprec == "bf16":
        out += [C.astype(bf16), S.astype(bf16)]
    return tuple(out)


@lru_cache(maxsize=8)
def _device_cache(nwins: int, nfreq: int, win_key, kprec: str):
    out = tuple(jax.device_put(t) for t in
                _host_tables(nwins, nfreq, win_key, kprec))
    jax.block_until_ready(out)
    return out


def _device_tables(nwins: int, nfreq: int, win_key, kprec: str):
    """Device-resident tables when called eagerly (cached — re-uploading
    O(nwins*nfreq) tables over the remote-TPU tunnel dominates warm-call
    latency); raw numpy under a trace (they become jit closure constants,
    uploaded once with the compiled executable) — ``device_put`` under a
    trace would leak tracers through the cache."""
    try:
        clean = jax.core.trace_state_clean()
    except AttributeError:  # pragma: no cover - jax internals moved
        clean = False
    if clean:
        return _device_cache(nwins, nfreq, win_key, kprec)
    return _host_tables(nwins, nfreq, win_key, kprec)


def _accum_kernel(y_ref, x0r_ref, x0i_ref, *refs, kprec):
    """Grid (nc, nf, nb); accumulates over the b (segment-block) dimension."""
    (table_refs, pyy_ref, pxyr_ref, pxyi_ref) = (refs[:-3],) + refs[-3:]
    b = pl.program_id(2)

    y = y_ref[0]                       # (Bt, nwins)
    if kprec == "bf16x3":
        yr = dot_bf16x3(y, table_refs[0][...], table_refs[1][...])
        yi = dot_bf16x3(y, table_refs[2][...], table_refs[3][...])
    elif kprec == "bf16":
        yb = y.astype(jnp.bfloat16)
        yr = jnp.dot(yb, table_refs[0][...],
                     preferred_element_type=jnp.float32)
        yi = jnp.dot(yb, table_refs[1][...],
                     preferred_element_type=jnp.float32)
    else:
        yr = jnp.dot(y, table_refs[0][...],
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
        yi = jnp.dot(y, table_refs[1][...],
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)

    x0r = x0r_ref[...]                 # (Bt, Ft)
    x0i = x0i_ref[...]

    ft = yr.shape[-1]
    pyy = jnp.sum(yr * yr + yi * yi, axis=0).reshape(1, 1, ft)
    pxyr = jnp.sum(yr * x0r + yi * x0i, axis=0).reshape(1, 1, ft)
    pxyi = jnp.sum(yi * x0r - yr * x0i, axis=0).reshape(1, 1, ft)

    @pl.when(b == 0)
    def _init():
        pyy_ref[...] = pyy
        pxyr_ref[...] = pxyr
        pxyi_ref[...] = pxyi

    @pl.when(b != 0)
    def _accum():
        pyy_ref[...] += pyy
        pxyr_ref[...] += pxyr
        pxyi_ref[...] += pxyi


def _welch_power_call(yfr, x0r, x0i, ktables, *, seg_tile, freq_tile,
                      kprec, interpret):
    nch, B, nwins = yfr.shape
    nfreq = ktables[0].shape[1]
    nb = B // seg_tile
    nf = nfreq // freq_tile

    grid = (nch, nf, nb)
    # outputs are (nch, 1, nfreq): the trailing (1, freq_tile) block then
    # satisfies the TPU (sublane, lane) tiling rule via dim-equality
    out_shape = [jax.ShapeDtypeStruct((nch, 1, nfreq), jnp.float32)] * 3

    flops = 4 * nch * B * nwins * nfreq + 8 * nch * B * nfreq
    bytes_accessed = (yfr.size + x0r.size * 2 * nf + 3 * nch * nfreq) * 4

    pyy, pxyr, pxyi = pl.pallas_call(
        partial(_accum_kernel, kprec=kprec),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, seg_tile, nwins), lambda c, f, b: (c, b, 0)),
            pl.BlockSpec((seg_tile, freq_tile), lambda c, f, b: (b, f)),
            pl.BlockSpec((seg_tile, freq_tile), lambda c, f, b: (b, f)),
            *[pl.BlockSpec((nwins, freq_tile), lambda c, f, b: (0, f))
              for _ in ktables],
        ],
        out_specs=[
            pl.BlockSpec((1, 1, freq_tile), lambda c, f, b: (c, 0, f)),
            pl.BlockSpec((1, 1, freq_tile), lambda c, f, b: (c, 0, f)),
            pl.BlockSpec((1, 1, freq_tile), lambda c, f, b: (c, 0, f)),
        ],
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        interpret=interpret,
    )(yfr, x0r, x0i, *ktables)
    return pyy[:, 0], pxyr[:, 0], pxyi[:, 0]


_XLA_PREC = {"highest": "highest", "bf16x3": "high", "bf16": "default"}


@partial(jax.jit, static_argnames=("navr", "nwins", "hop", "detrend_style",
                                   "seg_tile", "freq_tile", "kprec",
                                   "interpret"))
def _fused_pipeline(x, y, norm, tables, *, navr, nwins, hop, detrend_style,
                    seg_tile, freq_tile, kprec, interpret):
    """detrend -> frame -> pad -> x0 STFT -> fused accumulate, one dispatch."""
    from .. import segmentation as seg
    from ..utils.detrend import detrend_func

    B_p = _round_up(navr, seg_tile)
    det = detrend_func(detrend_style)
    xfr = seg.frame_signal(det(x, axis=-1), nwins, hop, navr)
    yfr = seg.frame_signal(det(y, axis=-1), nwins, hop, navr)
    xfr = jnp.pad(xfr, [(0, B_p - navr), (0, 0)])
    yfr = jnp.pad(yfr, [(0, 0), (0, B_p - navr), (0, 0)])

    Wr, Wi = tables[0], tables[1]
    prec = _XLA_PREC[kprec]
    x0r = jnp.dot(xfr, Wr, precision=prec, preferred_element_type=jnp.float32)
    x0i = jnp.dot(xfr, Wi, precision=prec, preferred_element_type=jnp.float32)
    Pxx = jnp.sum(x0r * x0r + x0i * x0i, axis=0)

    ktables = tables[2:] if kprec in ("bf16x3", "bf16") else tables[:2]
    Pyy, Pxy_re, Pxy_im = _welch_power_call(
        yfr, x0r, x0i, ktables, seg_tile=seg_tile, freq_tile=freq_tile,
        kprec=kprec, interpret=interpret)
    return Pxx * norm, Pyy * norm, Pxy_re * norm, Pxy_im * norm


def welch_pallas_fused(x, y, win, nfreq, norm, *, navr, nwins, noverlap,
                       detrend_style=1, precision=None, interpret=None):
    """One-sided real-input Welch cross-powers, fully fused on-device.

    ``x (nt,)`` reference channel, ``y (nch, nt)`` channels; returns
    device arrays ``(Pxx (nfreq,), Pyy (nch, nfreq), Pxy_re, Pxy_im)``
    already scaled by ``norm`` (caller folds one-sided/S1^2/ENBW/navr
    factors into that scalar).  Raises ValueError when the segment length
    cannot be tiled in VMEM (fall back to the 'mxu' path).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    kprec = resolve_kernel_precision(precision)
    tiles = _choose_tiles(nwins, nfreq, navr, 128, 256)
    if tiles is None:
        raise ValueError(
            f"pallas welch kernel: nwins={nwins} segment blocks do not fit "
            f"in VMEM; use the 'mxu' backend for very long segments")
    seg_tile, freq_tile = tiles
    nfreq_p = _round_up(nfreq, freq_tile)

    win_key = tuple(np.asarray(win, dtype=np.float64).tolist())
    tables = _device_tables(nwins, nfreq_p, win_key, kprec)

    Pxx, Pyy, Pxy_re, Pxy_im = _fused_pipeline(
        jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
        jnp.float32(norm), tables, navr=navr, nwins=nwins,
        hop=nwins - noverlap, detrend_style=int(detrend_style),
        seg_tile=seg_tile, freq_tile=freq_tile, kprec=kprec,
        interpret=bool(interpret))
    return (Pxx[:nfreq], Pyy[:, :nfreq], Pxy_re[:, :nfreq],
            Pxy_im[:, :nfreq])


def welch_power_pallas(xfr, yfr, win, nfreq, *, seg_tile=128, freq_tile=256,
                       precision=None, interpret=None):
    """Accumulated one-sided Welch cross-powers from framed signals.

    ``xfr (B, nwins)``, ``yfr (nch, B, nwins)`` — un-windowed frames; the
    window is folded into the DFT tables.  Returns segment-***summed***
    ``(Pxx (nfreq,), Pyy (nch,nfreq), Pxy_re, Pxy_im)`` — the caller divides
    by ``navr`` and applies the one-sided/normalization scales.

    Frames are zero-padded to tile multiples (zero segments contribute
    nothing to the sums, so padding is exact).  Prefer
    :func:`welch_pallas_fused` for signal inputs — it fuses the framing
    and reference STFT into the same dispatch.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    kprec = resolve_kernel_precision(precision)
    xfr = jnp.asarray(xfr, jnp.float32)
    yfr = jnp.asarray(yfr, jnp.float32)
    B, nwins = xfr.shape
    nch = yfr.shape[0]

    tiles = _choose_tiles(nwins, nfreq, B, seg_tile, freq_tile)
    if tiles is None:
        raise ValueError(
            f"pallas welch kernel: nwins={nwins} segment blocks do not fit "
            f"in VMEM; use the 'mxu' backend for very long segments")
    seg_tile, freq_tile = tiles
    nfreq_p = _round_up(nfreq, freq_tile)
    B_p = _round_up(B, seg_tile)

    win_key = tuple(np.asarray(win, dtype=np.float64).tolist())
    tables = _device_tables(nwins, nfreq_p, win_key, kprec)
    Wr, Wi = tables[0], tables[1]

    if B_p != B:
        pad = [(0, B_p - B), (0, 0)]
        xfr = jnp.pad(xfr, pad)
        yfr = jnp.pad(yfr, [(0, 0)] + pad)

    # stage 1: reference-channel STFT (one dense matmul, XLA)
    prec = _XLA_PREC[kprec]
    x0r = jnp.dot(xfr, Wr, precision=prec, preferred_element_type=jnp.float32)
    x0i = jnp.dot(xfr, Wi, precision=prec, preferred_element_type=jnp.float32)
    Pxx = jnp.sum(x0r * x0r + x0i * x0i, axis=0)

    # stage 2: fused per-channel cross-power accumulation (Pallas)
    ktables = tables[2:] if kprec in ("bf16x3", "bf16") else tables[:2]
    Pyy, Pxy_re, Pxy_im = _welch_power_call(
        yfr, x0r, x0i, ktables, seg_tile=seg_tile, freq_tile=freq_tile,
        kprec=kprec, interpret=bool(interpret))

    return (Pxx[:nfreq], Pyy[:, :nfreq], Pxy_re[:, :nfreq],
            Pxy_im[:, :nfreq])
