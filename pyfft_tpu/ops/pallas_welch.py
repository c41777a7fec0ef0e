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
           "pallas_welch_applicable", "welch_fir_pallas_fused",
           "pallas_welch2_applicable"]


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


# =========================================================================== #
# v2: factored-DFT fused kernel (FIR -> frame -> detrend -> window ->
#     two-stage MXU FFT -> cross-power accumulate, one dispatch)
# =========================================================================== #
#
# The v1 kernel above evaluates the windowed DFT as ONE dense
# (seg, nwins) @ (nwins, nfreq) contraction — O(nwins) MXU work per sample,
# already at the MXU roofline for its algorithm.  v2 keeps the fusion but
# factors the transform Cooley-Tukey style so the arithmetic drops ~2.7x
# (and the optional FIR stage rides along for free):
#
#   segment (nwins,) == rows (R, 128) with R = nwins/128, sample n = 128 r + l
#   stage A:  A[q, l] = sum_r W_R^{qr} x[r, l]         R-point DFT over rows,
#             evaluated as a BLOCK-DIAGONAL (128,128) matmul over G = 128/R
#             segments at once (the small factor would waste the MXU alone)
#   twiddle:  B[q, l] = A[q, l] * W_nwins^{lq}         elementwise (VPU)
#   stage B:  X[q, p] = sum_l B[q, l] W_128^{lp}       128-point DFT over
#             lanes, a dense (S*R, 128) @ (128, 128) matmul
#
# giving bin k = q + R*p at [q, p] — the natural-order spectrum is just a
# transpose.  Powers are accumulated across segments in VMEM; only the
# (nch, nwins) averaged spectra ever reach HBM.  The signal enters as raw
# (nch+1, rows, 128) tiles — no framed copy in HBM — with segment overlap
# handled by also mapping each grid step's *neighbor* row-blocks
# (prev/next) into VMEM.  Channel 0 is the reference x: its spectrum is
# computed once per block and shared by every y channel in the same step.

_LANES2 = 128


@lru_cache(maxsize=8)
def _factored_tables_host(nwins: int, kprec: str):
    """Stage/twiddle matrices for the factored kernel (host numpy).

    Returns ``(mxu_tables, vpu_tables)``: the first are pre-split per
    ``kprec`` for MXU matmuls (D_re, D_im, C, S), the second stay f32
    (T_re, T_im twiddles, applied elementwise).
    """
    import ml_dtypes
    bf16 = ml_dtypes.bfloat16
    R = nwins // _LANES2
    G = _LANES2 // R
    q = np.arange(R)
    ang = 2.0 * np.pi * np.outer(q, q) / R
    D = np.zeros((_LANES2, _LANES2)); Di = np.zeros((_LANES2, _LANES2))
    for g in range(G):
        sl = slice(g * R, (g + 1) * R)
        D[sl, sl] = np.cos(ang)
        Di[sl, sl] = -np.sin(ang)
    l = np.arange(_LANES2)
    tang = 2.0 * np.pi * np.outer(q, l) / nwins
    Tr = np.tile(np.cos(tang), (G, 1)).astype(np.float32)
    Ti = np.tile(-np.sin(tang), (G, 1)).astype(np.float32)
    bang = 2.0 * np.pi * np.outer(l, l) / _LANES2
    C = np.cos(bang); S = -np.sin(bang)

    mxu = []
    for M in (D, Di, C, S):
        M32 = M.astype(np.float32)
        if kprec == "bf16x3":
            hi = M32.astype(bf16)
            mxu += [hi, (M32 - hi.astype(np.float32)).astype(bf16)]
        elif kprec == "bf16":
            mxu.append(M32.astype(bf16))
        else:
            mxu.append(M32)
    return tuple(mxu), (Tr, Ti)


def _kdot(a, tabs, i, kprec):
    """MXU product of f32 ``a`` with pre-split constant table ``i``."""
    if kprec == "bf16x3":
        return dot_bf16x3(a, tabs[2 * i][...], tabs[2 * i + 1][...])
    if kprec == "bf16":
        return jnp.dot(a.astype(jnp.bfloat16), tabs[i][...],
                       preferred_element_type=jnp.float32)
    return jnp.dot(a, tabs[i][...], precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)


def _kdot_left(tabs, i, a, kprec):
    """MXU product of constant table ``i`` (left operand) with f32 ``a``."""
    if kprec == "bf16x3":
        hi, lo = tabs[2 * i][...], tabs[2 * i + 1][...]
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        d = lambda p, r: jnp.dot(p, r, preferred_element_type=jnp.float32)
        return d(hi, a_hi) + d(lo, a_hi) + d(hi, a_lo)
    if kprec == "bf16":
        return jnp.dot(tabs[i][...], a.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    return jnp.dot(tabs[i][...], a, precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)


def _factored_kernel(*refs, nch, Sseg, R, hr, navr, detrend, kprec, m_fir,
                     nbands):
    """Grid ``(nb,)``; all channels of one segment block per step."""
    b = pl.program_id(0)
    nsig = 3 if m_fir else 2
    sig_refs = refs[:nsig]
    w_ref = refs[nsig]
    tw_r, tw_i = refs[nsig + 1], refs[nsig + 2]
    ntab = nsig + 3
    band_refs = refs[ntab:ntab + nbands]
    stage_refs = refs[ntab + nbands:-4]
    pxx_ref, pyy_ref, pxyr_ref, pxyi_ref = refs[-4:]

    blk = Sseg * hr
    if m_fir:
        prev, cur, nxt = (r[...] for r in sig_refs)
        head = prev[:, -m_fir:, :] * (b != 0).astype(jnp.float32)
        rows = jnp.concatenate([head, cur, nxt[:, :R, :]], axis=1)
        L = blk + R
        acc = None
        for s in range(m_fir + 1):
            t = _kdot(rows[:, s:s + L, :].reshape(-1, _LANES2),
                      band_refs, s, kprec)
            acc = t if acc is None else acc + t
        rows = acc.reshape(nch + 1, L, _LANES2)
    else:
        cur, nxt = (r[...] for r in sig_refs)
        rows = jnp.concatenate([cur, nxt[:, :R, :]], axis=1)

    # segment validity mask for this block (padded tail segments are zero
    # but would otherwise perturb detrend-free power averages)
    sidx = b * Sseg + jax.lax.broadcasted_iota(
        jnp.int32, (Sseg, R, _LANES2), 0)
    mk = (sidx < navr).astype(jnp.float32)

    w = w_ref[...]
    nck = (Sseg * R) // _LANES2

    def spectra(ch_rows):
        st = jnp.concatenate(
            [jax.lax.slice_in_dim(ch_rows, s * hr, s * hr + R, 1, 0)
             for s in range(Sseg)])                         # (S*R, 128)
        if detrend == 1:
            f2 = st.reshape(Sseg, R * _LANES2)
            st = (f2 - jnp.mean(f2, axis=-1, keepdims=True)).reshape(
                Sseg * R, _LANES2)
        st = st.reshape(Sseg, R, _LANES2) * w[None]
        st = st.reshape(Sseg * R, _LANES2)
        a_chunks = st.reshape(nck, _LANES2, _LANES2)
        Ar = jnp.concatenate([_kdot_left(stage_refs, 0, a_chunks[g], kprec)
                              for g in range(nck)])
        Ai = jnp.concatenate([_kdot_left(stage_refs, 1, a_chunks[g], kprec)
                              for g in range(nck)])
        Tr = tw_r[...]; Ti = tw_i[...]
        Ar3 = Ar.reshape(nck, _LANES2, _LANES2)
        Ai3 = Ai.reshape(nck, _LANES2, _LANES2)
        Br = (Ar3 * Tr[None] - Ai3 * Ti[None]).reshape(Sseg * R, _LANES2)
        Bi = (Ar3 * Ti[None] + Ai3 * Tr[None]).reshape(Sseg * R, _LANES2)
        Xr = _kdot(Br, stage_refs, 2, kprec) - _kdot(Bi, stage_refs, 3, kprec)
        Xi = _kdot(Br, stage_refs, 3, kprec) + _kdot(Bi, stage_refs, 2, kprec)
        return (Xr.reshape(Sseg, R, _LANES2) * mk,
                Xi.reshape(Sseg, R, _LANES2) * mk)

    Xr, Xi = spectra(rows[0])
    pxx = jnp.sum(Xr * Xr + Xi * Xi, axis=0)[None]
    pyy_l, pxyr_l, pxyi_l = [], [], []
    for c in range(nch):
        Yr, Yi = spectra(rows[c + 1])
        pyy_l.append(jnp.sum(Yr * Yr + Yi * Yi, axis=0))
        pxyr_l.append(jnp.sum(Yr * Xr + Yi * Xi, axis=0))
        pxyi_l.append(jnp.sum(Yi * Xr - Yr * Xi, axis=0))
    pyy = jnp.stack(pyy_l)
    pxyr = jnp.stack(pxyr_l)
    pxyi = jnp.stack(pxyi_l)

    @pl.when(b == 0)
    def _init():
        pxx_ref[...] = pxx
        pyy_ref[...] = pyy
        pxyr_ref[...] = pxyr
        pxyi_ref[...] = pxyi

    @pl.when(b != 0)
    def _accum():
        pxx_ref[...] += pxx
        pyy_ref[...] += pyy
        pxyr_ref[...] += pxyr
        pxyi_ref[...] += pxyi


def _v2_geometry(nwins, noverlap, navr, nch, taps=None, seg_block=None):
    """(R, hr, Sseg, m_fir) when the factored kernel applies, else None."""
    if nwins % _LANES2:
        return None
    R = nwins // _LANES2
    if _LANES2 % R:
        return None
    hop = nwins - noverlap
    if hop % _LANES2 or hop <= 0:
        return None
    hr = hop // _LANES2
    m_fir = 0
    if taps is not None:
        m_fir = -(-(len(taps) - 1) // _LANES2)
    # segments per block: stacked rows must chunk into (128, 128) tiles
    Sseg = seg_block or max(_LANES2 // R, -(-16 // hr))
    while (Sseg * R) % _LANES2:
        Sseg += 1
    blk = Sseg * hr
    if m_fir > blk:
        return None
    # VMEM: 3 neighbor blocks + filtered rows + frames/stages, double-buffered
    per_step = (nch + 1) * (3 * blk + (blk + R)) * _LANES2 * 4
    # constant tables: 4 stage matrices (+bf16 splits ~ same bytes), 2
    # twiddles, and m+1 FIR band blocks, each (128, 128)
    work = (10 * Sseg * R * _LANES2 * 4
            + (10 + 2 * (m_fir + 1 if m_fir else 0)) * _LANES2**2 * 4)
    if 2 * per_step + work > _VMEM_BUDGET:
        return None
    return R, hr, Sseg, m_fir


def pallas_welch2_applicable(nwins, noverlap, navr, nch=8, taps=None,
                             detrend_style=1):
    """Whether :func:`welch_fir_pallas_fused` supports this geometry."""
    from .pallas_fir import PALLAS_FIR_MAX_TAPS
    from .pallas_welch3 import pallas_welch3_applicable
    if taps is not None and np.size(taps) > PALLAS_FIR_MAX_TAPS:
        return False
    return pallas_welch3_applicable(nwins, noverlap, navr, min(nch, 15),
                                    detrend_style)


@partial(jax.jit, static_argnames=("navr", "nwins", "noverlap", "taps_key",
                                   "detrend_style", "kprec", "interpret"))
def _v2_pipeline(x, y, win, norm, *, navr, nwins, noverlap, taps_key,
                 detrend_style, kprec, interpret):
    nch, nt = y.shape
    taps = np.asarray(taps_key, dtype=np.float64) if taps_key else None
    R, hr, Sseg, m_fir = _v2_geometry(nwins, noverlap, navr, nch, taps)
    blk = Sseg * hr
    nb = -(-navr // Sseg)
    nrows = (nb + 1) * blk                      # one zero block of tail slack
    L = nrows * _LANES2

    sig = jnp.concatenate([x[None], y], axis=0)
    sig = jnp.pad(sig, [(0, 0), (0, L - nt)]).reshape(nch + 1, nrows, _LANES2)

    mxu_tabs, (Tr, Ti) = _factored_tables_host(nwins, kprec)
    band_flat = ()
    if m_fir:
        from .pallas_fir import _band_blocks
        bands = _band_blocks(tuple(taps.tolist()), kprec)
        band_flat = tuple(bb for bblk in bands for bb in bblk)
    nbands = len(band_flat)

    win2 = win.reshape(R, _LANES2)
    cdim = lambda i: (lambda b: (0, i(b), 0))
    sig_specs = [pl.BlockSpec((nch + 1, blk, _LANES2),
                              cdim(lambda b: jnp.maximum(b - 1, 0))),
                 pl.BlockSpec((nch + 1, blk, _LANES2), cdim(lambda b: b)),
                 pl.BlockSpec((nch + 1, blk, _LANES2), cdim(lambda b: b + 1))]
    if not m_fir:
        sig_specs = sig_specs[1:]
    const2 = lambda shp: pl.BlockSpec(shp, lambda b: (0, 0))
    in_specs = [*sig_specs, const2((R, _LANES2)),
                const2((_LANES2, _LANES2)), const2((_LANES2, _LANES2)),
                *[const2(bb.shape) for bb in band_flat],
                *[const2(tt.shape) for tt in mxu_tabs]]
    out_specs = [pl.BlockSpec((1, R, _LANES2), lambda b: (0, 0, 0)),
                 pl.BlockSpec((nch, R, _LANES2), lambda b: (0, 0, 0)),
                 pl.BlockSpec((nch, R, _LANES2), lambda b: (0, 0, 0)),
                 pl.BlockSpec((nch, R, _LANES2), lambda b: (0, 0, 0))]
    out_shape = [jax.ShapeDtypeStruct((1, R, _LANES2), jnp.float32)] + \
                [jax.ShapeDtypeStruct((nch, R, _LANES2), jnp.float32)] * 3

    # MXU flops: stage A (block-diag) + stage B + FIR band matmuls
    nseg_tot = nb * Sseg * (nch + 1)
    flops = nseg_tot * (2 * nwins * _LANES2 + 4 * nwins * _LANES2 * 2)
    if m_fir:
        flops += 2 * (nch + 1) * nrows * _LANES2 * nbands * _LANES2
    args = [sig] * len(sig_specs) + [win2, jnp.asarray(Tr), jnp.asarray(Ti),
                                     *map(jnp.asarray, band_flat),
                                     *map(jnp.asarray, mxu_tabs)]
    pxx, pyy, pxyr, pxyi = pl.pallas_call(
        partial(_factored_kernel, nch=nch, Sseg=Sseg, R=R, hr=hr, navr=navr,
                detrend=detrend_style, kprec=kprec, m_fir=m_fir,
                nbands=nbands),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=4 * sig.size * (3 if m_fir else 2),
            transcendentals=0),
        interpret=interpret,
    )(*args)

    # bin k = q + R*p lives at [q, p]: natural order is the transpose
    def natural(o):
        return o.transpose(0, 2, 1).reshape(o.shape[0], nwins) * norm
    return natural(pxx)[0], natural(pyy), natural(pxyr), natural(pxyi)


def welch_fir_pallas_fused(x, y, win, nfreq, norm, *, navr, nwins, noverlap,
                           taps=None, detrend_style=1, precision=None,
                           interpret=None):
    """One-sided Welch cross-powers with an optional fused FIR pre-filter.

    ``x (nt,)`` reference, ``y (nch, nt)`` channels, optional ``taps``
    applied causally (``np.convolve(sig, taps, 'full')[:nt]``) to ALL
    channels on-device.  Returns ``(Pxx (nfreq,), Pyy (nch, nfreq),
    Pxy_re, Pxy_im)`` scaled by ``norm`` (segment-averaged when ``norm``
    folds ``1/navr``); the caller applies the one-sided bin doubling (as
    with :func:`welch_pallas_fused`).  Detrend is the **global** mean of
    the (filtered) analyzed span, matching the reference's pre-loop
    detrend (fft_analysis.py:357-358) and the mxu/xla cores.

    Dispatches to the v3 all-matmul kernel
    (:func:`pyfft_tpu.ops.pallas_welch3.welch_fir_pallas3`, channel-grouped
    for wide arrays); the in-kernel-FIR v2 path below is retained for
    direct benchmarking but no longer covers any geometry v3 does not.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    kprec = resolve_kernel_precision(precision)
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    if y.ndim == 1:
        y = y[None]
    # prefer the all-matmul v3 kernel whenever its geometry holds.  Large
    # channel counts run v3 in groups (the VMEM cap is per-dispatch); the
    # reference spectrum is recomputed per group, a negligible overhead.
    from .pallas_welch3 import pallas_welch3_applicable, welch_fir_pallas3
    _V3_MAX_CH = 15
    if pallas_welch3_applicable(nwins, noverlap, navr,
                                min(y.shape[0], _V3_MAX_CH), detrend_style):
        def _v3(yy):
            return welch_fir_pallas3(
                x, yy, win, nfreq, norm, navr=navr, nwins=nwins,
                noverlap=noverlap, taps=taps, detrend_style=detrend_style,
                precision=precision, interpret=interpret)
        if y.shape[0] <= _V3_MAX_CH:
            return _v3(y)
        outs = [_v3(y[i:i + _V3_MAX_CH])
                for i in range(0, y.shape[0], _V3_MAX_CH)]
        Pxx = outs[0][0]
        return (Pxx, jnp.concatenate([o[1] for o in outs], axis=0),
                jnp.concatenate([o[2] for o in outs], axis=0),
                jnp.concatenate([o[3] for o in outs], axis=0))
    taps_key = (tuple(np.asarray(taps, np.float64).tolist())
                if taps is not None else None)
    if _v2_geometry(nwins, noverlap, navr, y.shape[0],
                    None if taps is None else np.asarray(taps)) is None:
        raise ValueError(
            f"factored welch kernel: unsupported geometry nwins={nwins} "
            f"noverlap={noverlap} nch={y.shape[0]}; use welch_pallas_fused "
            "or the mxu backend")
    if detrend_style not in (0, 1):
        raise ValueError("factored welch kernel supports detrend mean/none")
    Pxx, Pyy, Pxy_re, Pxy_im = _v2_pipeline(
        x, y, jnp.asarray(np.asarray(win, np.float32)), jnp.float32(norm),
        navr=navr, nwins=nwins, noverlap=noverlap, taps_key=taps_key,
        detrend_style=int(detrend_style), kprec=kprec,
        interpret=bool(interpret))
    return (Pxx[:nfreq], Pyy[:, :nfreq], Pxy_re[:, :nfreq],
            Pxy_im[:, :nfreq])
