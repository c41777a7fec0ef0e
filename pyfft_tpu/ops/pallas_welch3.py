"""Pallas TPU kernel v3: all-matmul fused Welch cross-power pipeline.

Third-generation fused Welch kernel (role of the reference's hot segment
loop, ``fft_analysis.py:362-388``).  Same factored-transform math as the v2
kernel in :mod:`pyfft_tpu.ops.pallas_welch` — sample ``n = 128 r + l``,
stage A = R-point DFT over rows, twiddle, stage B = 128-point DFT over
lanes, bin ``k = q + R p`` — but restructured so that every data-movement
step that v2 did with VPU shuffles is a dense MXU matmul, and every
channel is batched into the same matmul instead of looped:

- the signal lives in HBM as ``(nrows, C*128)`` — time rows outer,
  channels tiled along lanes (the FIR kernel writes this layout directly
  via a transposed output BlockSpec, so the relayout is free);
- segment **gather** (v2: per-segment ``lax.slice`` + ``concatenate``) is
  a 0/1 banded matmul ``st = G @ rows`` — exact in two bf16 passes
  because G is 0/1 and the f32 operand is hi/lo split;
- stage A is ONE block-diagonal ``(128,128) @ (128, C*128)`` product for
  all channels and all ``Sseg`` segments of the step;
- stage B uses the 3-multiplication (Karatsuba) complex product
  ``m1 = Br C, m2 = Bi S, m3 = (Br+Bi)(C+S)`` — 25% fewer MXU passes
  than the 4-product form;
- cross/auto powers accumulate in VMEM across the grid; only the
  ``(R, C, 128)`` averaged spectra ever reach HBM.

Detrend semantics: **global** mean removal, exactly like the reference
(``fft_analysis.py:357-358`` detrends the full analyzed span before the
segment loop; the per-segment variant there is commented out) and like
the framework's mxu/xla cores.  The means are computed in the XLA
prologue (zero-padding keeps device sums exact) and subtracted in-kernel
as a per-channel broadcast, so the kernel itself stays mean-free.

Geometry: ``nwins % 128 == 0``, ``128 % (nwins/128) == 0``, and
``hop % 128 == 0`` (the 50%-overlap power-of-two configs of BASELINE).
Other geometries fall back to v2 / v1 / the mxu path.
"""
from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .precision import (split_bf16, resolve_kernel_precision,
                        KERNEL_PASSES)

__all__ = ["welch_fir_pallas3", "pallas_welch3_applicable",
           "welch_pallas3_twosided", "pallas_welch3_cplx_applicable",
           "stft_pallas3", "welch_auto_packed", "packed_parts_geometry"]

_LANES = 128

# grid-step unroll: chunks per grid step sharing one table residency.  More
# unroll amortizes per-step pipeline overhead; the cap keeps the double-
# buffered `cur` window comfortably inside VMEM next to the tables.
_UNROLL_CAP = 8
_UNROLL_VMEM = 6 * 1024 * 1024


# --------------------------------------------------------------------------- #
# Geometry
# --------------------------------------------------------------------------- #

def _v3_geometry(nwins, noverlap, nch):
    """(R, hr, Sseg, blk, L) when the v3 kernel applies, else None."""
    if nwins % _LANES:
        return None
    R = nwins // _LANES
    if _LANES % R:
        return None
    hop = nwins - noverlap
    if hop <= 0 or hop % _LANES:
        return None
    hr = hop // _LANES
    Sseg = _LANES // R
    blk = Sseg * hr
    L = blk + R
    if L > 2 * _LANES:          # keep the gather contraction <= 2 K-tiles
        return None
    if blk % max(R, 8):         # head BlockSpec addresses in Rh-row blocks
        return None             # (>= 8 sublanes, the Mosaic tile minimum)
    if nch + 1 > 16:            # VMEM: ~18 live f32 (128, C*128) buffers
        return None
    return R, hr, Sseg, blk, L


def pallas_welch3_applicable(nwins, noverlap, navr, nch=8, detrend_style=1):
    """Whether :func:`welch_fir_pallas3` supports this configuration."""
    return (detrend_style in (0, 1)
            and _v3_geometry(nwins, noverlap, nch) is not None)


# --------------------------------------------------------------------------- #
# Constant tables (host numpy; jit closes over them)
# --------------------------------------------------------------------------- #

def _split(M, kprec):
    """Table -> tuple of per-precision operands (f32 | bf16 | bf16 hi/lo)."""
    import ml_dtypes
    bf16 = ml_dtypes.bfloat16
    M32 = np.asarray(M, np.float64).astype(np.float32)
    if kprec == "highest":
        return (M32,)
    if kprec == "bf16":
        return (M32.astype(bf16),)
    hi = M32.astype(bf16)
    return (hi, (M32 - hi.astype(np.float32)).astype(bf16))


@lru_cache(maxsize=8)
def _v3_tables_host(nwins, hr, C, win_key, kprec):
    """All constant operands for the v3 kernel, flattened with a layout map.

    Returns ``(flat_tables, counts)`` where counts records how many
    operands each logical table contributed (for unflattening in-kernel).
    """
    import ml_dtypes
    R = nwins // _LANES
    Sseg = _LANES // R
    blk = Sseg * hr
    L = blk + R
    win = np.asarray(win_key, np.float64)

    # gather: G[s*R + r, s*hr + r] = 1 (0/1: exact in a single bf16 table)
    G = np.zeros((_LANES, L))
    for s in range(Sseg):
        for r in range(R):
            G[s * R + r, s * hr + r] = 1.0
    Gt = (G.astype(np.float32),) if kprec == "highest" else \
         (G.astype(ml_dtypes.bfloat16),)
    groups = [("G", Gt)]

    # stage A: block-diagonal R-point DFT over the Sseg segment blocks
    q = np.arange(R)
    ang = 2.0 * np.pi * np.outer(q, q) / R
    D = np.zeros((_LANES, _LANES))
    Di = np.zeros((_LANES, _LANES))
    for s in range(Sseg):
        sl = slice(s * R, (s + 1) * R)
        D[sl, sl] = np.cos(ang)
        Di[sl, sl] = -np.sin(ang)
    groups += [("D", _split(D, kprec)), ("Di", _split(Di, kprec))]

    # elementwise constants, tiled to the (128, C*128) layout (f32, VPU)
    l = np.arange(_LANES)
    Wrl = win.reshape(R, _LANES)                       # w[128 r + l]
    W_big = np.tile(np.tile(Wrl, (Sseg, 1)), (1, C)).astype(np.float32)
    tang = 2.0 * np.pi * np.outer(q, l) / nwins        # W_N^{l q}
    Tr = np.tile(np.tile(np.cos(tang), (Sseg, 1)), (1, C)).astype(np.float32)
    Ti = np.tile(np.tile(-np.sin(tang), (Sseg, 1)), (1, C)).astype(np.float32)
    groups += [("W", (W_big,)), ("Tr", (Tr,)), ("Ti", (Ti,))]

    # stage B: 128-point DFT over lanes, Karatsuba 3-product tables
    bang = 2.0 * np.pi * np.outer(l, l) / _LANES
    Cb = np.cos(bang)
    Sb = -np.sin(bang)
    groups += [("Cb", _split(Cb, kprec)), ("Sb", _split(Sb, kprec)),
               ("CpS", _split(Cb + Sb, kprec))]

    flat = tuple(t for _, ts in groups for t in ts)
    counts = tuple((name, len(ts)) for name, ts in groups)
    return flat, counts


# --------------------------------------------------------------------------- #
# Kernel
# --------------------------------------------------------------------------- #

def _d(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _ldot_const(tabs, xh, xl, kprec):
    """``T @ x`` with constant T (pre-split) and runtime x (pre-split)."""
    if kprec == "highest":
        return jnp.dot(tabs[0][...], xh, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
    if kprec == "bf16":
        return _d(tabs[0][...], xh)
    Th, Tl = tabs[0][...], tabs[1][...]
    return _d(Th, xh) + _d(Tl, xh) + _d(Th, xl)


def _rdot_const(xh, xl, tabs, kprec):
    """``x @ T`` with constant T (pre-split) and runtime x (pre-split)."""
    if kprec == "highest":
        return jnp.dot(xh, tabs[0][...], precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
    if kprec == "bf16":
        return _d(xh, tabs[0][...])
    Th, Tl = tabs[0][...], tabs[1][...]
    return _d(xh, Th) + _d(xh, Tl) + _d(xl, Th)


def _rsplit(x, kprec):
    """Runtime operand split matching the table convention."""
    if kprec == "highest":
        return x, None
    if kprec == "bf16":
        return x.astype(jnp.bfloat16), None
    return split_bf16(x)


def _chunk_spectra(cur_ref, head_ref, mrow_ref, tabs, b, k, *, C, R, Sseg,
                   navr, blk, unroll, kprec, cplx, pre=False, kv=0, hr=None,
                   vmask=False):
    """One chunk of the factored transform: gather -> detrend/window/mask ->
    stage A -> twiddle -> stage B -> (optional) complex recombination.
    Returns per-segment spectra ``(X3r, X3i)`` shaped ``(Co, Sseg, R, 128)``
    in channel-major layout (bin ``k = q + R p`` at ``[q, p]``)."""
    lo = k * blk
    if k < unroll - 1:
        rows = cur_ref[lo:lo + blk + R]
    else:
        rows = jnp.concatenate([cur_ref[lo:lo + blk], head_ref[:R]],
                               axis=0)                       # (L, N)
    return _chunk_math(rows, mrow_ref, tabs, b, k, C=C, R=R, Sseg=Sseg,
                       navr=navr, unroll=unroll, kprec=kprec, cplx=cplx,
                       pre=pre, kv=kv, hr=hr, vmask=vmask)


def _chunk_math(rows, mrow_ref, tabs, b, k, *, C, R, Sseg, navr, unroll,
                kprec, cplx, pre=False, kv=0, hr=None, vmask=False):
    """The factored-transform math on an in-VMEM ``(L, N)`` row window."""
    # gather Sseg segments of all C channels: (128, N), row = s*R + r
    if hr is not None and R % 8 == 0 and hr % 8 == 0:
        # sublane-aligned overlap: the gather is Sseg contiguous (R, N)
        # row copies — exact, no matmul passes, no operand split
        st = jnp.concatenate([rows[ss * hr:ss * hr + R]
                              for ss in range(Sseg)], axis=0)
    elif kprec == "highest":
        st = jnp.dot(tabs["G"][0][...], rows,
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
    else:
        rh, rl = _rsplit(rows, kprec)
        st = _d(tabs["G"][0][...], rh)
        if rl is not None:
            st = st + _d(tabs["G"][0][...], rl)

    if pre and vmask:
        # virtual-channel packing: every lane group is a different time
        # part with its own valid-segment count, carried per-lane in the
        # (otherwise unused) mrow operand — mask EVERY chunk slot
        rowseg = (jax.lax.broadcasted_iota(jnp.int32, (_LANES, 1), 0) // R
                  + (b * unroll + k) * Sseg)
        mask = (rowseg.astype(jnp.float32) < mrow_ref[...])
        stw = st * tabs["W"][0][...] * mask.astype(jnp.float32)
    elif pre and k < kv:
        # feeder already subtracted the global mean; chunk slots below kv
        # can never contain a segment index >= navr, so no mask either
        stw = st * tabs["W"][0][...]
    elif pre:
        # tail chunk slot: mask out segments past navr (they gather a mix
        # of live signal rows and zero tail rows -> nonzero garbage)
        rowseg = (jax.lax.broadcasted_iota(jnp.int32, (_LANES, 1), 0) // R
                  + (b * unroll + k) * Sseg)
        mask = (rowseg < navr).astype(jnp.float32)
        stw = st * tabs["W"][0][...] * mask
    else:
        # global-mean detrend (per-channel broadcast), window, validity mask
        rowseg = (jax.lax.broadcasted_iota(jnp.int32, (_LANES, 1), 0) // R
                  + (b * unroll + k) * Sseg)
        mask = (rowseg < navr).astype(jnp.float32)
        stw = (st - mrow_ref[...]) * tabs["W"][0][...] * mask

    # stage A: block-diagonal R-point DFT (all segments, all channels)
    sh, sl = _rsplit(stw, kprec)
    Ar = _ldot_const(tabs["D"], sh, sl, kprec)
    Ai = _ldot_const(tabs["Di"], sh, sl, kprec)

    # twiddle (VPU elementwise, tiled constants)
    Trt = tabs["Tr"][0][...]
    Tit = tabs["Ti"][0][...]
    Br = Ar * Trt - Ai * Tit
    Bi = Ar * Tit + Ai * Trt

    # stage B input: per-channel lane-group slices stacked channel-major
    # — pure (128,128) tile copies, no lane-crossing shuffles (the
    # row-major reshape would interleave channels into rows: a relayout)
    Br2 = jnp.concatenate(
        [Br[:, c * _LANES:(c + 1) * _LANES] for c in range(C)], axis=0)
    Bi2 = jnp.concatenate(
        [Bi[:, c * _LANES:(c + 1) * _LANES] for c in range(C)], axis=0)

    # stage B: 128-point DFT over lanes, 3-product complex multiply
    bh, bl = _rsplit(Br2, kprec)
    ch, cl = _rsplit(Bi2, kprec)
    m1 = _rdot_const(bh, bl, tabs["Cb"], kprec)
    m2 = _rdot_const(ch, cl, tabs["Sb"], kprec)
    ssum = Br2 + Bi2
    sh2, sl2 = _rsplit(ssum, kprec)
    m3 = _rdot_const(sh2, sl2, tabs["CpS"], kprec)
    Xr = m1 - m2
    Xi = m3 - m1 - m2

    # channel-major: rows are (c, s, q), so the reshape only splits
    # untiled leading dims; broadcasts ride untiled axes
    X3r = Xr.reshape(C, Sseg, R, _LANES)
    X3i = Xi.reshape(C, Sseg, R, _LANES)
    if cplx:
        # channels arrive as interleaved (re, im) pairs of complex
        # signals; F(re + j im) = F(re) + j F(im), recombined here by
        # splitting the *untiled* channel axis (a reshape + static index —
        # a stride-2 slice would lower to a >2D gather Mosaic rejects)
        X5r = X3r.reshape(C // 2, 2, Sseg, R, _LANES)
        X5i = X3i.reshape(C // 2, 2, Sseg, R, _LANES)
        X3r = X5r[:, 0] - X5i[:, 1]                        # (C/2, S, R, 128)
        X3i = X5i[:, 0] + X5r[:, 1]
    return X3r, X3i


def _pair_reduce(X3r, X3i, C):
    """Pairwise reductions for interleaved (x_part, y_part) channels:
    ``auto = (Pxx, Pyy)`` from the even/odd planes, ``Pxy = y conj(x)``
    within each pair, all summed over the part and segment axes."""
    X5r = X3r.reshape(C // 2, 2, X3r.shape[1], X3r.shape[2], _LANES)
    X5i = X3i.reshape(C // 2, 2, X3i.shape[1], X3i.shape[2], _LANES)
    auto = jnp.sum(X5r * X5r + X5i * X5i, axis=(0, 2))      # (2, R, 128)
    xre = jnp.sum(X5r[:, 1] * X5r[:, 0]
                  + X5i[:, 1] * X5i[:, 0], axis=(0, 1))[None]
    xim = jnp.sum(X5i[:, 1] * X5r[:, 0]
                  - X5r[:, 1] * X5i[:, 0], axis=(0, 1))[None]
    return auto, xre, xim


def _unpack_tabs(refs, counts):
    tabs = {}
    i = 0
    for name, n in counts:
        tabs[name] = refs[i:i + n]
        i += n
    return tabs, refs[i:]


def _v3_kernel(cur_ref, head_ref, mrow_ref, *refs, counts, C, R, Sseg, navr,
               blk, unroll, kprec, cplx=False, pre=False, kv=0,
               auto_only=False, vmask=False, paircross=False):
    """Grid ``(nb,)``: ``unroll`` chunks of Sseg segments x C channels per
    step, all-matmul.  The unroll amortizes per-grid-step pipeline overhead
    (measured ~5us/step) over several chunks sharing one table residency.
    ``auto_only`` skips the cross-spectra reductions (PSD-only callers,
    e.g. the virtual-channel packed path).  ``paircross``: channels arrive
    as interleaved ``(x_part, y_part)`` virtual-channel pairs; the
    epilogue reduces pairwise — ``Pxx``/``Pyy`` from the even/odd planes
    and ``Pxy = y conj(x)`` within each pair — summed over the part axis
    (the single-cross-channel analogue of the packed auto path)."""
    tabs, outs = _unpack_tabs(refs, counts)
    if auto_only:
        auto_ref, = outs[:1]
    else:
        auto_ref, xre_ref, xim_ref = outs[:3]
    b = pl.program_id(0)

    def chunk(k):
        X3r, X3i = _chunk_spectra(cur_ref, head_ref, mrow_ref, tabs, b, k,
                                  C=C, R=R, Sseg=Sseg, navr=navr, blk=blk,
                                  unroll=unroll, kprec=kprec, cplx=cplx,
                                  pre=pre, kv=kv, hr=blk // Sseg,
                                  vmask=vmask)
        if paircross:
            return _pair_reduce(X3r, X3i, C)
        auto = jnp.sum(X3r * X3r + X3i * X3i, axis=1)      # (Co, R, 128)
        if auto_only:
            return auto, None, None
        xr0 = X3r[0]                                       # reference (c=0)
        xi0 = X3i[0]
        xre = jnp.sum(X3r * xr0[None] + X3i * xi0[None], axis=1)
        xim = jnp.sum(X3i * xr0[None] - X3r * xi0[None], axis=1)
        return auto, xre, xim

    auto, xre, xim = chunk(0)
    for k in range(1, unroll):
        a, re, im = chunk(k)
        auto += a
        if not auto_only:
            xre += re
            xim += im

    @pl.when(b == 0)
    def _init():
        auto_ref[...] = auto
        if not auto_only:
            xre_ref[...] = xre
            xim_ref[...] = xim

    @pl.when(b != 0)
    def _accum():
        auto_ref[...] += auto
        if not auto_only:
            xre_ref[...] += xre
            xim_ref[...] += xim


def _assemble_rows(xm_ref, xe_ref, xh_ref, ym_ref, ye_ref, yh_ref,
                   srow_ref, band_refs, b, *, C, R, blk, unroll, kprec, m,
                   nbands, nrv, sub, inline_halo=False):
    """The feeder kernel's body, inlined: FIR + detrend + interleave the
    step's ``(unroll*blk + R, C*128)`` row window entirely in VMEM.

    ``inline_halo``: the FIR halo refs are 8-row windowed BlockSpecs into
    the signal arrays themselves (tail of the previous step's rows),
    masked to zero on the first step — a ``jnp.take`` halo gather in the
    same jit as the kernel forces a full-array XLA pass (measured on the
    FIR kernel: 227 vs 378 GB/s end-to-end)."""
    from .precision import dot_bf16x3

    rows_out = unroll * blk + R
    base = b * (unroll * blk)
    # logical row ids: rows at/after the signal end are forced to exact
    # zero (jnp.where, so undefined out-of-bounds reads cannot leak NaNs);
    # over-gathered tail segments then contribute nothing to the sums
    rowids = jax.lax.broadcasted_iota(jnp.int32, (rows_out, 1), 0) + base
    rowmask = rowids < nrv
    cols = []
    for c in range(C):
        mainc = xm_ref[...] if c == 0 else ym_ref[c - 1]
        headc = (xe_ref[...] if c == 0 else ye_ref[c - 1])[:R]
        if nbands == 0:
            acc = jnp.concatenate([mainc, headc], axis=0)
        else:
            if m:
                if inline_halo:
                    hb = jnp.where(b > 0, 1.0, 0.0)
                    haloc = (xh_ref[8 - m:] if c == 0
                             else yh_ref[c - 1, 8 - m:]) * hb
                else:
                    haloc = xh_ref[0] if c == 0 else yh_ref[c - 1, 0]
                ext = jnp.concatenate([haloc, mainc, headc], axis=0)
            else:
                ext = jnp.concatenate([mainc, headc], axis=0)
            acc = None
            for s in range(m + 1):
                xs = ext[s:rows_out + s]
                if kprec == "bf16x3":
                    t = dot_bf16x3(xs, band_refs[2 * s][...],
                                   band_refs[2 * s + 1][...])
                elif kprec == "bf16":
                    t = jnp.dot(xs.astype(jnp.bfloat16), band_refs[s][...],
                                preferred_element_type=jnp.float32)
                else:
                    t = jnp.dot(xs, band_refs[s][...],
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
                acc = t if acc is None else acc + t
        if sub:
            acc = acc - srow_ref[:, c * _LANES:(c + 1) * _LANES]
        cols.append(jnp.where(rowmask, acc, 0.0))
    return jnp.concatenate(cols, axis=1)              # (rows_out, N)


def _v3_fused_kernel(xm_ref, xe_ref, xh_ref, ym_ref, ye_ref, yh_ref,
                     srow_ref, *refs, counts, C, R, Sseg, navr, blk,
                     unroll, kprec, cplx, kv, m, nbands, nrv, sub,
                     auto_only=False, vmask=False, paircross=False,
                     inline_halo=False):
    """Single-dispatch chain: FIR + channel interleave + detrend + Welch.

    Reads the ORIGINAL ``x (nr, 128)`` / ``y (nch, nr, 128)`` row views —
    no intermediate ``(nrows, C*128)`` array ever touches HBM.  Each grid
    step assembles its FIR-filtered, mean-subtracted, channel-interleaved
    ``(unroll*blk + R, C*128)`` row window in VMEM (the feeder kernel's
    body, inlined), then runs the ``unroll`` factored-transform chunks on
    it.  On hardware where HBM streams ~5x slower than the MXU ceiling
    (measured on this chip), removing the feeder's extra write+read of the
    interleaved signal is worth ~40% of the chain's wall time.
    """
    band_refs = refs[:nbands]
    tabs, outs = _unpack_tabs(refs[nbands:], counts)
    if auto_only:
        auto_ref, = outs[:1]
    else:
        auto_ref, xre_ref, xim_ref = outs[:3]
    b = pl.program_id(0)
    rows_all = _assemble_rows(xm_ref, xe_ref, xh_ref, ym_ref, ye_ref,
                              yh_ref, srow_ref, band_refs, b, C=C, R=R,
                              blk=blk, unroll=unroll, kprec=kprec, m=m,
                              nbands=nbands, nrv=nrv, sub=sub,
                              inline_halo=inline_halo)

    def chunk(k):
        rows = rows_all[k * blk:k * blk + blk + R]
        X3r, X3i = _chunk_math(rows, srow_ref, tabs, b, k, C=C, R=R,
                               Sseg=Sseg, navr=navr, unroll=unroll,
                               kprec=kprec, cplx=cplx, pre=True, kv=kv,
                               hr=blk // Sseg, vmask=vmask)
        if paircross:
            return _pair_reduce(X3r, X3i, C)
        auto = jnp.sum(X3r * X3r + X3i * X3i, axis=1)
        if auto_only:
            return auto, None, None
        if X3r.shape[0] == 1:
            # auto-PSD only (no channels): X x conj(X) == |X|^2 exactly
            return auto, auto, jnp.zeros_like(auto)
        xr0 = X3r[0]
        xi0 = X3i[0]
        xre = jnp.sum(X3r * xr0[None] + X3i * xi0[None], axis=1)
        xim = jnp.sum(X3i * xr0[None] - X3r * xi0[None], axis=1)
        return auto, xre, xim

    auto, xre, xim = chunk(0)
    for k in range(1, unroll):
        a, re, im = chunk(k)
        auto += a
        if not auto_only:
            xre += re
            xim += im

    @pl.when(b == 0)
    def _init():
        auto_ref[...] = auto
        if not auto_only:
            xre_ref[...] = xre
            xim_ref[...] = xim

    @pl.when(b != 0)
    def _accum():
        auto_ref[...] += auto
        if not auto_only:
            xre_ref[...] += xre
            xim_ref[...] += xim


# --------------------------------------------------------------------------- #
# Pipeline
# --------------------------------------------------------------------------- #

@partial(jax.jit, static_argnames=("navr", "nwins", "noverlap", "taps_key",
                                   "win_key", "detrend_style", "kprec",
                                   "interpret", "cplx", "auto_only",
                                   "vmask", "unroll_cap", "paircross"))
def _v3_pipeline(x, y, norm, vrow=None, *, navr, nwins, noverlap, taps_key,
                 win_key, detrend_style, kprec, interpret, cplx=False,
                 auto_only=False, vmask=False, unroll_cap=None,
                 paircross=False):
    nch, nt = y.shape
    C = nch + 1
    N = C * _LANES
    R, hr, Sseg, blk, L = _v3_geometry(nwins, noverlap, nch)
    nchunks = -(-navr // Sseg)
    # amortize per-grid-step pipeline overhead over several chunks, but not
    # past the point where the cur block stops fitting VMEM comfortably.
    # Narrow channel counts leave the per-step fixed cost dominant (at C=1
    # a chunk is a single 128-wide matmul tier), so the cap scales inversely
    # with C; `unroll_cap` overrides for experiments.
    cap = unroll_cap if unroll_cap else max(_UNROLL_CAP, 64 // C)
    unroll = max(1, min(cap, nchunks,
                        _UNROLL_VMEM // (2 * 4 * blk * N)))
    nb = -(-nchunks // unroll)
    need_rows = (nb * unroll + 1) * blk         # head of the last step
    nrows = -(-need_rows // 512) * 512          # FIR kernel block multiple
    Ltot = nrows * _LANES

    from .pallas_fir import fir_pallas

    # global-mean detrend moments of the *filtered* span, computed on the
    # cheap (C, nt) layout before the FIR and corrected exactly for the
    # causal convolution:  sum(conv(x, t)[:nt]) = sum_k t_k (S - T_k)
    # with T_k the sum of the last k samples
    taps_np = np.asarray(taps_key if taps_key else (1.0,), np.float64)
    K = taps_np.size
    if detrend_style == 1:
        S = jnp.concatenate([jnp.sum(x[:nt])[None],
                             jnp.sum(y[:, :nt], axis=-1)])   # (C,)
        if K > 1:
            sig_tail = jnp.concatenate(
                [x[None, nt - (K - 1):nt], y[:, nt - (K - 1):nt]], axis=0)
            tail = sig_tail[:, ::-1]                         # (C, K-1)
            T = jnp.concatenate(
                [jnp.zeros((C, 1), jnp.float32), jnp.cumsum(tail, axis=-1)],
                axis=-1)                                     # (C, K)
            m_ch = ((S[:, None] - T)
                    @ jnp.asarray(taps_np, jnp.float32)) / nt
        else:
            m_ch = S * (np.float32(taps_np[0]) / nt)
        m_row = jnp.repeat(m_ch, _LANES, total_repeat_length=N)[None]
    else:
        m_row = jnp.zeros((1, N), jnp.float32)
    if vmask:
        # packed virtual channels: the mrow operand carries per-lane
        # valid-segment counts instead (detrend is pre-applied by the
        # packer, so the slot is free).  Only the fused lane-aligned
        # branch interprets the slot this way — the padded fallback's
        # kernel would subtract the counts as a channel mean.
        if nt % _LANES:
            raise ValueError(
                f"vmask requires a lane-aligned signal (nt={nt} % "
                f"{_LANES} != 0); the packer always produces one")
        m_row = jnp.asarray(vrow, jnp.float32).reshape(1, N)

    # the banded-matmul FIR writes the (nrows, C*128) row-major layout
    # directly through its output BlockSpec (identity taps when no filter
    # is requested — far cheaper than an XLA transpose of the signal).
    # The in-place feeder avoids every concatenate/pad copy of the signal;
    # lane-unaligned nt — or an nt/128 whose divisors are all <= the halo
    # row count (e.g. nt = 128*998 with 200 taps) — falls back to the
    # padded path, whose 512-row blocking always works.
    # first chunk slot that can contain a segment index >= navr (it lives
    # at the last grid step); only slots >= kv need the validity mask when
    # the signal is pre-detrended/zero-tailed
    kv = max(0, navr // Sseg - (nb - 1) * unroll)
    tables, counts = _v3_tables_host(nwins, hr, C, win_key, kprec)
    Co = C // 2 if cplx else C
    if paircross:
        out_cos = (2, 1, 1)           # (Pxx|Pyy, Pxy_re, Pxy_im)
    elif auto_only:
        out_cos = (Co,)
    else:
        out_cos = (Co, Co, Co)
    out_specs = [pl.BlockSpec((co, R, _LANES), lambda b: (0, 0, 0))
                 for co in out_cos]
    out_shape = [jax.ShapeDtypeStruct((co, R, _LANES), jnp.float32)
                 for co in out_cos]
    passes = KERNEL_PASSES[kprec]
    mm = (2 + 2 * passes + 3 * passes) * _LANES * _LANES * N
    flops = 2 * nb * unroll * mm
    # the head block needs >= 8 sublanes on TPU; blk is a multiple of 8
    # for every legal geometry, so Rh-row addressing stays block-aligned
    Rh = max(R, 8)
    const_specs = [pl.BlockSpec(t.shape, lambda b: tuple(0 for _ in t.shape))
                   for t in tables]

    if nt % _LANES == 0:
        # fused single-dispatch path: FIR + interleave + detrend inside
        # the welch kernel, reading x/y row views in place
        nr = nt // _LANES
        m = -(-(K - 1) // _LANES) if taps_key else 0
        if taps_key:
            from .pallas_fir import _band_blocks
            bands = _band_blocks(tuple(taps_np.tolist()), kprec)
            bands_flat = tuple(bb for bblk in bands for bb in bblk)
        else:
            bands_flat = ()
        xr2 = x.reshape(nr, _LANES)
        nchy = max(nch, 1)
        yr2 = (y.reshape(nch, nr, _LANES) if nch
               else jnp.zeros((1, nr, _LANES), jnp.float32))
        mh = max(m, 1)
        ub = unroll * blk
        if m:
            # FIR halos as 8-row windowed BlockSpecs into the signal row
            # views themselves (m <= 8 always; ub is a multiple of 8): a
            # jnp.take halo gather in the same jit forced a full-array
            # XLA pass (measured: 227 vs 378 GB/s on the FIR kernel)
            assert m <= 8 and ub % 8 == 0, (m, ub)
            rb8 = ub // 8
            xh, yh = xr2, yr2
            xh_spec = pl.BlockSpec(
                (8, _LANES), lambda b: (jnp.maximum(b * rb8 - 1, 0), 0))
            yh_spec = pl.BlockSpec(
                (nchy, 8, _LANES),
                lambda b: (0, jnp.maximum(b * rb8 - 1, 0), 0))
        else:
            xh = jnp.zeros((nb, 1, _LANES), jnp.float32)
            yh = jnp.zeros((nchy, nb, 1, _LANES), jnp.float32)
            xh_spec = pl.BlockSpec((1, mh, _LANES), lambda b: (b, 0, 0))
            yh_spec = pl.BlockSpec((nchy, 1, mh, _LANES),
                                   lambda b: (0, b, 0, 0))
        # clamp block indices so no block starts past the array (a fully
        # out-of-bounds block index faults Mosaic; trailing partial blocks
        # are fine, and misread rows are zeroed by the logical row mask)
        bm = max(-(-nr // ub) - 1, 0)
        bh = max(-(-nr // Rh) - 1, 0)
        in_specs = [
            pl.BlockSpec((ub, _LANES), lambda b: (jnp.minimum(b, bm), 0)),
            pl.BlockSpec((Rh, _LANES),
                         lambda b: (jnp.minimum((b + 1) * ub // Rh, bh), 0)),
            xh_spec,
            pl.BlockSpec((nchy, ub, _LANES),
                         lambda b: (0, jnp.minimum(b, bm), 0)),
            pl.BlockSpec((nchy, Rh, _LANES),
                         lambda b: (0, jnp.minimum((b + 1) * ub // Rh, bh),
                                    0)),
            yh_spec,
            pl.BlockSpec((1, N), lambda b: (0, 0)),
            *[pl.BlockSpec(bb.shape, lambda b: (0, 0))
              for bb in bands_flat],
            *const_specs,
        ]
        if taps_key:
            flops += 2 * (m + 1) * passes * C * (nb * ub) * _LANES * _LANES
        outs = pl.pallas_call(
            partial(_v3_fused_kernel, counts=counts, C=C, R=R, Sseg=Sseg,
                    navr=navr, blk=blk, unroll=unroll, kprec=kprec,
                    cplx=cplx, kv=kv, m=m, nbands=len(bands_flat), nrv=nr,
                    sub=detrend_style == 1, auto_only=auto_only,
                    vmask=vmask, paircross=paircross,
                    inline_halo=bool(m)),
            grid=(nb,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            cost_estimate=pl.CostEstimate(
                flops=flops, bytes_accessed=4 * C * nt, transcendentals=0),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(xr2, xr2, xh, yr2, yr2, yh, m_row,
          *map(jnp.asarray, bands_flat), *map(jnp.asarray, tables))
    else:
        # lane-unaligned nt: padded feeder + sig2-reading kernel
        sig = jnp.concatenate([x[None], y], axis=0)
        sig = jnp.concatenate(
            [sig, jnp.zeros((C, Ltot - nt), jnp.float32)], axis=1)
        sig2 = fir_pallas(sig, taps_np, interpret=interpret,
                          transposed_out=True, precision=kprec)
        in_specs = [
            pl.BlockSpec((unroll * blk, N), lambda b: (b, 0)),
            pl.BlockSpec((Rh, N),
                         lambda b: ((b + 1) * unroll * blk // Rh, 0)),
            pl.BlockSpec((1, N), lambda b: (0, 0)),
            *const_specs,
        ]
        outs = pl.pallas_call(
            partial(_v3_kernel, counts=counts, C=C, R=R, Sseg=Sseg,
                    navr=navr, blk=blk, unroll=unroll, kprec=kprec,
                    cplx=cplx, pre=False, kv=kv, auto_only=auto_only,
                    vmask=vmask, paircross=paircross),
            grid=(nb,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            cost_estimate=pl.CostEstimate(
                flops=flops, bytes_accessed=4 * (nb + 1) * blk * N,
                transcendentals=0),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(sig2, sig2, m_row, *map(jnp.asarray, tables))

    # natural order: bin k = q + R p lives at [q, p]
    def natural(o):                              # (co, R, 128) -> (co, nwins)
        return o.transpose(0, 2, 1).reshape(o.shape[0], nwins) * norm
    if auto_only:
        return natural(outs[0])
    auto, xre, xim = outs
    A = natural(auto)
    Re = natural(xre)
    Im = natural(xim)
    if paircross:
        # A = (Pxx, Pyy); Re/Im are the pair-summed cross already
        return A[0], A[1:2], Re, Im
    return A[0], A[1:], Re[1:], Im[1:]


def welch_fir_pallas3(x, y, win, nfreq, norm, *, navr, nwins, noverlap,
                      taps=None, detrend_style=1, precision=None,
                      interpret=None, unroll_cap=None):
    """One-sided Welch cross-powers + optional fused FIR, v3 kernel.

    Same contract as :func:`pyfft_tpu.ops.pallas_welch.welch_fir_pallas_fused`
    (which prefers this implementation whenever the geometry allows):
    ``x (nt,)`` reference, ``y (nch, nt)``; returns ``(Pxx, Pyy, Pxy_re,
    Pxy_im)`` scaled by ``norm``, with ``taps`` applied causally
    (``np.convolve(sig, taps, 'full')[:nt]``) to every channel first and
    **global** mean/none detrend of the filtered signals (reference
    ``fft_analysis.py:357-358``).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    kprec = resolve_kernel_precision(precision)
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    if y.ndim == 1:
        y = y[None]
    if _v3_geometry(nwins, noverlap, y.shape[0]) is None:
        raise ValueError(
            f"v3 welch kernel: unsupported geometry nwins={nwins} "
            f"noverlap={noverlap} nch={y.shape[0]}")
    if detrend_style not in (0, 1):
        raise ValueError("v3 welch kernel supports detrend mean/none")
    taps_key = (tuple(np.asarray(taps, np.float64).tolist())
                if taps is not None else None)
    win_key = tuple(np.asarray(win, np.float64).tolist())
    Pxx, Pyy, Pxy_re, Pxy_im = _v3_pipeline(
        x, y, jnp.float32(norm), navr=navr, nwins=nwins, noverlap=noverlap,
        taps_key=taps_key, win_key=win_key,
        detrend_style=int(detrend_style), kprec=kprec,
        interpret=bool(interpret), unroll_cap=unroll_cap)
    return (Pxx[:nfreq], Pyy[:, :nfreq], Pxy_re[:, :nfreq],
            Pxy_im[:, :nfreq])


# --------------------------------------------------------------------------- #
# Virtual-channel packing (single-signal lane fill)
# --------------------------------------------------------------------------- #

def packed_parts_geometry(navr, nwins, noverlap, parts=16):
    """``(P, q, Lp)`` for virtual-channel packing, or ``None``.

    A single signal leaves the kernel's ``C*128`` lane dimension one tile
    wide (MXU operands 128 columns — measured ~10% utilization).  Packing
    splits the *segment range* into ``P`` time-parts fed as kernel
    channels: part ``p`` owns segments ``p*q .. p*q+q-1`` and spans
    ``Lp = (q-1)*hop + nwins`` samples starting at ``p*q*hop`` — the
    intra-chip analogue of the SP/CP time-sharding in
    ``pyfft_tpu.parallel.welch`` (SURVEY §2.3), with the part overlap
    playing the halo role.
    """
    hop = nwins - noverlap
    P = int(min(parts, navr, 16))
    if P <= 1:
        return None
    q = -(-navr // P)
    P = -(-navr // q)                       # drop fully-empty parts
    if P <= 1 or _v3_geometry(nwins, noverlap, P - 1) is None:
        return None
    Lp = (q - 1) * hop + nwins
    return P, q, Lp


def _pack_parts(x, mean, navr, nwins, noverlap, P, q, Lp):
    """Stack the P part views ``(P, Lp)``, mean-subtracted and zero-masked.

    Full parts are plain strided slices of ``x - mean``; the (single)
    partial part is masked past its last valid segment's end so padded
    tail segments are *exactly zero* (and therefore contribute nothing to
    the PSD sums with the kernel's detrend disabled).
    """
    hop = nwins - noverlap
    nt = x.shape[-1]
    maxend = (P - 1) * q * hop + Lp
    if maxend > nt:
        x = jnp.concatenate([x, jnp.zeros(maxend - nt, jnp.float32)])
    rows = []
    for p in range(P):
        lo = p * q * hop
        part = lax.slice(x, (lo,), (lo + Lp,)) - mean
        v = min(q, navr - p * q)
        if v < q:
            lim = (v - 1) * hop + nwins
            part = jnp.where(jnp.arange(Lp) < lim, part, 0.0)
        rows.append(part)
    return jnp.stack(rows)


@partial(jax.jit, static_argnames=("navr", "nwins", "noverlap", "taps_key",
                                   "win_key", "detrend_style", "kprec",
                                   "interpret", "geom"))
def _packed_auto_pipeline(x, norm, *, navr, nwins, noverlap, taps_key,
                          win_key, detrend_style, kprec, interpret, geom):
    P, q, Lp = geom
    nt = x.shape[-1]
    if taps_key is not None:
        from .pallas_fir import fir_pallas
        pad = -(-nt // (512 * _LANES)) * (512 * _LANES) - nt
        xp = jnp.concatenate([x, jnp.zeros(pad, jnp.float32)]) if pad else x
        x = fir_pallas(xp[None], np.asarray(taps_key, np.float64),
                       interpret=interpret, precision=kprec)[0][:nt]
    mean = (jnp.sum(x) / nt if detrend_style == 1
            else jnp.float32(0.0))
    partsarr = _pack_parts(x, mean, navr, nwins, noverlap, P, q, Lp)
    # per-part valid-segment counts, tiled per lane: segments past a
    # part's count overlap REAL samples of its last valid segment, so
    # zero-masking the data alone cannot silence them — the kernel masks
    # them per lane group instead (vmask)
    v = np.minimum(q, navr - q * np.arange(P)).astype(np.float32)
    vrow = np.repeat(v, _LANES).reshape(1, P * _LANES)
    A = _v3_pipeline(partsarr[0], partsarr[1:], jnp.float32(1.0), vrow,
                     navr=q, nwins=nwins, noverlap=noverlap, taps_key=None,
                     win_key=win_key, detrend_style=0, kprec=kprec,
                     interpret=interpret, auto_only=True, vmask=True)
    return jnp.sum(A, axis=0) * norm


def welch_auto_packed(x, win, nfreq, norm, *, navr, nwins, noverlap,
                      taps=None, detrend_style=1, precision=None,
                      interpret=None, parts=16):
    """Single-signal Welch auto-PSD with virtual-channel lane packing.

    Same math as ``welch_fir_pallas3(x, zeros((0, nt)), ...)`` — causal
    FIR, global-mean detrend, one-sided ``norm`` scaling applied by the
    caller — with the segment range spread across the kernel's lane
    dimension as virtual channels (see :func:`packed_parts_geometry`).
    Returns ``Pxx (nfreq,)``.

    Status: OPT-IN.  Measured on TPU v5e (nt=2^23, nwins=4096) the v3
    kernel's wall time is dominated by per-dispatch and per-call fixed
    costs, not by the lane-starved matmuls this path widens, so packing
    plus its XLA gather pass came out ~15% *slower* end-to-end than the
    plain C=1 kernel.  Kept as the correctness-proven building block for
    in-kernel lane spreading; not dispatched automatically.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    kprec = resolve_kernel_precision(precision)
    x = jnp.asarray(x, jnp.float32)
    geom = packed_parts_geometry(navr, nwins, noverlap, parts)
    if geom is None:
        raise ValueError("packing not applicable for this geometry")
    if detrend_style not in (0, 1):
        raise ValueError("v3 welch kernel supports detrend mean/none")
    taps_key = (tuple(np.asarray(taps, np.float64).tolist())
                if taps is not None else None)
    win_key = tuple(np.asarray(win, np.float64).tolist())
    Pxx = _packed_auto_pipeline(
        x, jnp.float32(norm), navr=navr, nwins=nwins, noverlap=noverlap,
        taps_key=taps_key, win_key=win_key,
        detrend_style=int(detrend_style), kprec=kprec,
        interpret=bool(interpret), geom=geom)
    return Pxx[:nfreq]


def packed_pair_geometry(navr, nwins, noverlap, parts=8):
    """``(P, q, Lp)`` for PAIRED virtual-channel packing, or ``None``.

    Like :func:`packed_parts_geometry`, but each part occupies TWO kernel
    channels (x_part, y_part), so ``P <= 8`` (C = 2P <= 16)."""
    hop = nwins - noverlap
    P = int(min(parts, navr, 8))
    if P <= 1:
        return None
    q = -(-navr // P)
    P = -(-navr // q)
    if P <= 1 or _v3_geometry(nwins, noverlap, 2 * P - 1) is None:
        return None
    return P, q, (q - 1) * hop + nwins


@partial(jax.jit, static_argnames=("navr", "nwins", "noverlap", "taps_key",
                                   "win_key", "detrend_style", "kprec",
                                   "interpret", "geom"))
def _packed_pair_pipeline(x, y, norm, *, navr, nwins, noverlap, taps_key,
                          win_key, detrend_style, kprec, interpret, geom):
    P, q, Lp = geom
    nt = x.shape[-1]
    if taps_key is not None:
        from .pallas_fir import fir_pallas
        pad = -(-nt // (512 * _LANES)) * (512 * _LANES) - nt
        sig = jnp.stack([x, y])
        if pad:
            sig = jnp.concatenate(
                [sig, jnp.zeros((2, pad), jnp.float32)], axis=-1)
        sig = fir_pallas(sig, np.asarray(taps_key, np.float64),
                         interpret=interpret, precision=kprec)[:, :nt]
        x, y = sig[0], sig[1]
    mx = jnp.sum(x) / nt if detrend_style == 1 else jnp.float32(0.0)
    my = jnp.sum(y) / nt if detrend_style == 1 else jnp.float32(0.0)
    px = _pack_parts(x, mx, navr, nwins, noverlap, P, q, Lp)
    py = _pack_parts(y, my, navr, nwins, noverlap, P, q, Lp)
    inter = jnp.stack([px, py], axis=1).reshape(2 * P, Lp)
    v = np.minimum(q, navr - q * np.arange(P)).astype(np.float32)
    vrow = np.repeat(np.repeat(v, 2), _LANES).reshape(1, 2 * P * _LANES)
    return _v3_pipeline(inter[0], inter[1:], norm, vrow,
                        navr=q, nwins=nwins, noverlap=noverlap,
                        taps_key=None, win_key=win_key, detrend_style=0,
                        kprec=kprec, interpret=interpret, vmask=True,
                        paircross=True)


def welch_pair_packed(x, y, win, nfreq, norm, *, navr, nwins, noverlap,
                      taps=None, detrend_style=1, precision=None,
                      interpret=None, parts=8):
    """Single-cross-channel Welch with paired virtual-channel packing.

    Same math as ``welch_fir_pallas3(x, y[None], ...)`` at nch=1 — causal
    FIR, global-mean detrend, caller-applied one-sided scaling — with the
    segment range spread over the lane dimension as interleaved
    ``(x_part, y_part)`` channel pairs, so the C=2 lane-starved kernel
    becomes a C=2P one (see :func:`packed_pair_geometry`).  Returns
    ``(Pxx (nfreq,), Pyy (1, nfreq), Pxy_re (1, nfreq), Pxy_im (1,
    nfreq))``.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    kprec = resolve_kernel_precision(precision)
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32).reshape(-1)
    geom = packed_pair_geometry(navr, nwins, noverlap, parts)
    if geom is None:
        raise ValueError("pair packing not applicable for this geometry")
    if detrend_style not in (0, 1):
        raise ValueError("v3 welch kernel supports detrend mean/none")
    taps_key = (tuple(np.asarray(taps, np.float64).tolist())
                if taps is not None else None)
    win_key = tuple(np.asarray(win, np.float64).tolist())
    Pxx, Pyy, Re, Im = _packed_pair_pipeline(
        x, y, jnp.float32(norm), navr=navr, nwins=nwins, noverlap=noverlap,
        taps_key=taps_key, win_key=win_key,
        detrend_style=int(detrend_style), kprec=kprec,
        interpret=bool(interpret), geom=geom)
    return Pxx[:nfreq], Pyy[:, :nfreq], Re[:, :nfreq], Im[:, :nfreq]


def v3_dispatched_flops(nwins, noverlap, navr, nch, ntaps=0,
                        kprec="bf16x3"):
    """MXU FLOPs the v3 chain actually dispatches (for MFU accounting).

    Counts every bf16 pass at its dense matmul size — including the
    structural zeros of the block-diagonal stage A, the K-dim padding of
    the gather, and the hi/lo compensation passes — because that is the
    work the systolic array performs; the achieved-TFLOP/s over this
    count versus the device bf16 peak is the kernel's true MXU
    utilization.  The algorithmic (5 N log2 N) count is far lower; both
    are reported in BASELINE.md.
    """
    geom = _v3_geometry(nwins, noverlap, min(nch, 15))
    if geom is None:
        return None
    R, hr, Sseg, blk, L = geom
    C = nch + 1
    N = C * _LANES
    passes = KERNEL_PASSES[kprec]
    nchunks = -(-navr // Sseg)
    # welch kernel: gather (2 exact passes — zero when the sublane-aligned
    # slice gather applies) + stage A (2 logical) + stage B (3, Karatsuba)
    gather = 0 if (R % 8 == 0 and hr % 8 == 0) else 2
    per_chunk = (gather + (2 + 3) * passes) * _LANES * _LANES * N
    welch = 2.0 * nchunks * per_chunk
    # in-kernel FIR: (m+1) band matmuls over every row of every channel
    # (taps only — the fused kernel assembles unfiltered signals with pure
    # tile copies, no identity matmul)
    if ntaps > 1:
        m = -(-(ntaps - 1) // _LANES)
        nrows = nchunks * blk + blk
        fir = 2.0 * (m + 1) * passes * C * nrows * _LANES * _LANES
    else:
        fir = 0.0
    return welch + fir


def pallas_welch3_cplx_applicable(nwins, noverlap, navr, nchz=1,
                                  detrend_style=1):
    """Whether the complex two-sided kernel covers this configuration
    (``nchz`` complex channels -> ``2*(nchz+1)`` real kernel channels)."""
    return (detrend_style in (0, 1)
            and _v3_geometry(nwins, noverlap, 2 * nchz + 1) is not None)


def welch_pallas3_twosided(x, y, win, norm, *, navr, nwins, noverlap,
                           taps=None, detrend_style=1, precision=None,
                           interpret=None):
    """Two-sided Welch cross-powers of COMPLEX signals, fully fused.

    The Doppler IQ configuration (reference ``fft_analysis.py:423-427``,
    ``Doppler.py:164-281``): ``x (nt,)`` complex reference, ``y (nchz,
    nt)`` complex channels.  Each complex signal rides the real v3 kernel
    as an interleaved (re, im) channel pair — the transform stages are
    unchanged and the hermitian recombination happens in the powers
    epilogue — so the cost is exactly two real channels per complex one.

    Returns ``(Pxx (nwins,), Pyy (nchz, nwins), Pxy_re, Pxy_im)`` over the
    FULL two-sided spectrum in natural (DFT) bin order, scaled by
    ``norm``; callers apply ``fftshift``.  Optional ``taps`` filter every
    channel causally; detrend is the global (complex) mean.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    kprec = resolve_kernel_precision(precision)
    # split complex HOST arrays with numpy — the axon TPU backend has no
    # complex dtype, so a complex jnp.asarray would fail before the kernel
    if not isinstance(x, jax.Array):
        x = np.atleast_1d(np.asarray(x))
    if not isinstance(y, jax.Array):
        y = np.atleast_2d(np.asarray(y))
    if y.ndim == 1:
        y = y[None]
    nchz = y.shape[0]
    if _v3_geometry(nwins, noverlap, 2 * nchz + 1) is None:
        raise ValueError(
            f"v3 two-sided kernel: unsupported geometry nwins={nwins} "
            f"noverlap={noverlap} nchz={nchz}")
    if detrend_style not in (0, 1):
        raise ValueError("v3 welch kernel supports detrend mean/none")

    def _parts(a):
        if isinstance(a, jax.Array):
            return (jnp.real(a).astype(jnp.float32),
                    jnp.imag(a).astype(jnp.float32))
        return (jnp.asarray(np.ascontiguousarray(np.real(a)), jnp.float32),
                jnp.asarray(np.ascontiguousarray(np.imag(a)), jnp.float32))

    # interleave (re, im) channel pairs: [x_re | x_im, y0_re, y0_im, ...]
    xr, xi = _parts(x)
    rest = [xi]
    for c in range(nchz):
        yr_c, yi_c = _parts(y[c])
        rest.append(yr_c)
        rest.append(yi_c)
    y_all = jnp.stack(rest)
    taps_key = (tuple(np.asarray(taps, np.float64).tolist())
                if taps is not None else None)
    win_key = tuple(np.asarray(win, np.float64).tolist())
    return _v3_pipeline(
        xr, y_all, jnp.float32(norm), navr=navr, nwins=nwins,
        noverlap=noverlap, taps_key=taps_key, win_key=win_key,
        detrend_style=int(detrend_style), kprec=kprec,
        interpret=bool(interpret), cplx=True)


# --------------------------------------------------------------------------- #
# STFT variant: per-segment spectra written to HBM (no power accumulation)
# --------------------------------------------------------------------------- #

def _stft_store(xr_ref, xi_ref, X3r, X3i, k, *, Sseg, R, natural):
    """Write one chunk's per-segment spectra.

    ``natural=True`` transposes the (R, 128) bin tile IN VMEM so element
    ``k = q + R p`` lands at lane position ``k`` of a ``(.., Sseg, nwins)``
    output — the C-order flatten of the transposed ``(128, R)`` tile is
    exactly natural DFT order.  This removes the whole-array XLA transpose
    the host epilogue otherwise materializes (a full HBM round-trip of the
    (navr, nwins) result, which dominated the STFT config's wall time).
    """
    if natural:
        # transposed tile (.., 128, R): its row-major flatten IS natural
        # DFT order, so the host reshape to (.., nwins) is a free bitcast.
        # (The in-kernel (128, R) -> nwins flatten itself is an unsupported
        # Mosaic shape cast — leave the collapse to XLA.)
        xr_ref[:, k * Sseg:(k + 1) * Sseg] = jnp.swapaxes(X3r, -1, -2)
        xi_ref[:, k * Sseg:(k + 1) * Sseg] = jnp.swapaxes(X3i, -1, -2)
    else:
        xr_ref[:, k * Sseg:(k + 1) * Sseg] = X3r
        xi_ref[:, k * Sseg:(k + 1) * Sseg] = X3i


def _v3_stft_kernel(cur_ref, head_ref, mrow_ref, *refs, counts, C, R, Sseg,
                    navr, blk, unroll, kprec, cplx=False, pre=False, kv=0,
                    natural=False):
    """Grid ``(nb,)``: every step writes its ``unroll * Sseg`` segments'
    spectra straight out — the role of ``fftanal.fft_win``'s hot loop
    (reference ``fft_analysis.py:2126-2176``) with the same all-matmul
    pipeline as the Welch kernel."""
    tabs, outs = _unpack_tabs(refs, counts)
    xr_ref, xi_ref = outs[:2]
    b = pl.program_id(0)
    for k in range(unroll):
        X3r, X3i = _chunk_spectra(cur_ref, head_ref, mrow_ref, tabs, b, k,
                                  C=C, R=R, Sseg=Sseg, navr=navr, blk=blk,
                                  unroll=unroll, kprec=kprec, cplx=cplx,
                                  pre=pre, kv=kv, hr=blk // Sseg)
        _stft_store(xr_ref, xi_ref, X3r, X3i, k, Sseg=Sseg, R=R,
                    natural=natural)


def _v3_fused_stft_kernel(xm_ref, xe_ref, xh_ref, ym_ref, ye_ref, yh_ref,
                          srow_ref, *refs, counts, C, R, Sseg, navr, blk,
                          unroll, kprec, cplx, kv, m, nbands, nrv, sub,
                          natural=False):
    """Fused STFT: interleave + detrend in VMEM, per-segment spectra out."""
    band_refs = refs[:nbands]
    tabs, outs = _unpack_tabs(refs[nbands:], counts)
    xr_ref, xi_ref = outs[:2]
    b = pl.program_id(0)
    rows_all = _assemble_rows(xm_ref, xe_ref, xh_ref, ym_ref, ye_ref,
                              yh_ref, srow_ref, band_refs, b, C=C, R=R,
                              blk=blk, unroll=unroll, kprec=kprec, m=m,
                              nbands=nbands, nrv=nrv, sub=sub)
    for k in range(unroll):
        rows = rows_all[k * blk:k * blk + blk + R]
        X3r, X3i = _chunk_math(rows, srow_ref, tabs, b, k, C=C, R=R,
                               Sseg=Sseg, navr=navr, unroll=unroll,
                               kprec=kprec, cplx=cplx, pre=True, kv=kv,
                               hr=blk // Sseg)
        _stft_store(xr_ref, xi_ref, X3r, X3i, k, Sseg=Sseg, R=R,
                    natural=natural)


@partial(jax.jit, static_argnames=("navr", "nwins", "noverlap", "win_key",
                                   "detrend_style", "kprec", "interpret",
                                   "cplx", "natural"))
def _v3_stft_pipeline(x, y, norm, *, navr, nwins, noverlap, win_key,
                      detrend_style, kprec, interpret, cplx=False,
                      natural=True):
    nch, nt = y.shape
    C = nch + 1
    N = C * _LANES
    R, hr, Sseg, blk, L = _v3_geometry(nwins, noverlap, nch)
    # the transposed in-kernel natural store makes the output tile's minor
    # dim R; Mosaic pads that to the 128-lane width, so for R < 128 the
    # VMEM output window inflates 128/R-fold (OOM at production unrolls)
    # and the store DMA moves 128/R x the useful bytes.  Measured on-chip
    # (amortized in-jit repeats), the legacy layout + XLA transpose
    # epilogue already runs at a healthy fraction of the achievable HBM
    # rate, so the natural store only pays when it is pad-free.
    natural = natural and R == _LANES
    nchunks = -(-navr // Sseg)
    unroll = max(1, min(max(_UNROLL_CAP, 64 // C), nchunks,
                        _UNROLL_VMEM // (2 * 4 * blk * N)))
    nb = -(-nchunks // unroll)
    need_rows = (nb * unroll + 1) * blk
    nrows = -(-need_rows // 512) * 512
    Co = C // 2 if cplx else C
    nseg_pad = nb * unroll * Sseg

    from .pallas_fir import fir_pallas
    if detrend_style == 1:
        S = jnp.concatenate([jnp.sum(x[:nt])[None],
                             jnp.sum(y[:, :nt], axis=-1)])
        m_ch = S / nt
        m_row = jnp.repeat(m_ch, _LANES, total_repeat_length=N)[None]
    else:
        m_row = jnp.zeros((1, N), jnp.float32)
    # invalid segments are sliced off the output, so the pre-detrended
    # path never needs a validity mask (kv = unroll: every slot maskless)
    kv = unroll

    tables, counts = _v3_tables_host(nwins, hr, C, win_key, kprec)
    Rh = max(R, 8)
    const_specs = [pl.BlockSpec(t.shape, lambda b: tuple(0 for _ in t.shape))
                   for t in tables]
    seg_blk = unroll * Sseg
    if natural:
        out_specs = [pl.BlockSpec((Co, seg_blk, _LANES, R),
                                  lambda b: (0, b, 0, 0))] * 2
        out_shape = [jax.ShapeDtypeStruct((Co, nseg_pad, _LANES, R),
                                          jnp.float32)] * 2
    else:
        out_specs = [pl.BlockSpec((Co, seg_blk, R, _LANES),
                                  lambda b: (0, b, 0, 0))] * 2
        out_shape = [jax.ShapeDtypeStruct((Co, nseg_pad, R, _LANES),
                                          jnp.float32)] * 2

    if nt % _LANES == 0:
        nr = nt // _LANES
        nchy = max(nch, 1)
        xr2 = x.reshape(nr, _LANES)
        yr2 = (y.reshape(nch, nr, _LANES) if nch
               else jnp.zeros((1, nr, _LANES), jnp.float32))
        xh = jnp.zeros((nb, 1, _LANES), jnp.float32)
        yh = jnp.zeros((nchy, nb, 1, _LANES), jnp.float32)
        ub = unroll * blk
        bm = max(-(-nr // ub) - 1, 0)
        bh = max(-(-nr // Rh) - 1, 0)
        in_specs = [
            pl.BlockSpec((ub, _LANES), lambda b: (jnp.minimum(b, bm), 0)),
            pl.BlockSpec((Rh, _LANES),
                         lambda b: (jnp.minimum((b + 1) * ub // Rh, bh), 0)),
            pl.BlockSpec((1, 1, _LANES), lambda b: (b, 0, 0)),
            pl.BlockSpec((nchy, ub, _LANES),
                         lambda b: (0, jnp.minimum(b, bm), 0)),
            pl.BlockSpec((nchy, Rh, _LANES),
                         lambda b: (0, jnp.minimum((b + 1) * ub // Rh, bh),
                                    0)),
            pl.BlockSpec((nchy, 1, 1, _LANES), lambda b: (0, b, 0, 0)),
            pl.BlockSpec((1, N), lambda b: (0, 0)),
            *const_specs,
        ]
        Xr, Xi = pl.pallas_call(
            partial(_v3_fused_stft_kernel, counts=counts, C=C, R=R,
                    Sseg=Sseg, navr=navr, blk=blk, unroll=unroll,
                    kprec=kprec, cplx=cplx, kv=kv, m=0, nbands=0, nrv=nr,
                    sub=detrend_style == 1, natural=natural),
            grid=(nb,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(xr2, xr2, xh, yr2, yr2, yh, m_row, *map(jnp.asarray, tables))
    else:
        Ltot = nrows * _LANES
        sig = jnp.concatenate([x[None], y], axis=0)
        sig = jnp.concatenate(
            [sig, jnp.zeros((C, Ltot - nt), jnp.float32)], axis=1)
        sig2 = fir_pallas(sig, (1.0,), interpret=interpret,
                          transposed_out=True, precision=kprec)
        in_specs = [
            pl.BlockSpec((unroll * blk, N), lambda b: (b, 0)),
            pl.BlockSpec((Rh, N),
                         lambda b: ((b + 1) * unroll * blk // Rh, 0)),
            pl.BlockSpec((1, N), lambda b: (0, 0)),
            *const_specs,
        ]
        Xr, Xi = pl.pallas_call(
            partial(_v3_stft_kernel, counts=counts, C=C, R=R, Sseg=Sseg,
                    navr=navr, blk=blk, unroll=unroll, kprec=kprec,
                    cplx=cplx, pre=False, kv=kv, natural=natural),
            grid=(nb,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(sig2, sig2, m_row, *map(jnp.asarray, tables))

    if natural:
        # the kernel wrote transposed (128, R) tiles whose row-major
        # flatten is natural DFT order: the reshape collapses contiguous
        # trailing dims (a bitcast), so only slice + scale cost anything
        Xr = Xr[:, :navr].reshape(Co, navr, nwins)
        Xi = Xi[:, :navr].reshape(Co, navr, nwins)
        return Xr * norm, Xi * norm
    # natural order: (Co, nseg, R, 128)[c, s, q, p] -> bin k = q + R p
    Xr = Xr[:, :navr].transpose(0, 1, 3, 2).reshape(Co, navr, nwins) * norm
    Xi = Xi[:, :navr].transpose(0, 1, 3, 2).reshape(Co, navr, nwins) * norm
    return Xr, Xi


def stft_pallas3(x, y=None, win=None, norm=1.0, *, navr, nwins, noverlap,
                 detrend_style=1, precision=None, interpret=None):
    """Fused per-segment STFT of real or complex signals, v3 kernel.

    ``x (nt,)`` (plus optional extra channels ``y (nch, nt)``) -> natural-
    order DFT coefficients ``(Xr, Xi)`` of shape ``(C, navr, nwins)``
    scaled by ``norm``; complex inputs ride the kernel as (re, im) channel
    pairs.  Detrend is the global mean (reference fft_analysis.py:357).
    Callers apply one-sided slicing / fftshift and the fft_win scaling
    conventions (reference :2179-2202).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    kprec = resolve_kernel_precision(precision)
    # keep complex HOST arrays in numpy until split — the axon TPU backend
    # has no complex dtype, so a complex jnp.asarray would fail outright
    if not isinstance(x, jax.Array):
        x = np.atleast_1d(np.asarray(x))
    if y is None:
        ys = []
    elif isinstance(y, jax.Array):
        ys = list(jnp.atleast_2d(y))
    else:
        ys = list(np.atleast_2d(np.asarray(y)))
    cplx = any(np.iscomplexobj(a) for a in [x] + ys)

    def _f32(a):
        if isinstance(a, jax.Array):
            return a.astype(jnp.float32)
        return jnp.asarray(np.ascontiguousarray(a), jnp.float32)

    if cplx:
        chans = []
        for a in [x] + ys:
            if isinstance(a, jax.Array):
                chans.append(jnp.real(a).astype(jnp.float32))
                chans.append(jnp.imag(a).astype(jnp.float32))
            else:
                chans.append(_f32(np.real(a)))
                chans.append(_f32(np.imag(a)))
        nch_k = len(chans) - 1
    else:
        chans = [_f32(a) for a in [x] + ys]
        nch_k = len(chans) - 1
    if _v3_geometry(nwins, noverlap, max(nch_k, 1)) is None:
        raise ValueError(
            f"v3 stft kernel: unsupported geometry nwins={nwins} "
            f"noverlap={noverlap}")
    if detrend_style not in (0, 1):
        raise ValueError("v3 stft kernel supports detrend mean/none")
    x0 = chans[0]
    y_all = (jnp.stack(chans[1:]) if len(chans) > 1
             else jnp.zeros((0, x0.shape[-1]), jnp.float32))
    win_key = tuple(np.asarray(win, np.float64).tolist())
    Xr, Xi = _v3_stft_pipeline(
        x0, y_all, jnp.float32(norm), navr=navr, nwins=nwins,
        noverlap=noverlap, win_key=win_key,
        detrend_style=int(detrend_style), kprec=kprec,
        interpret=bool(interpret), cplx=cplx)
    nsig = len(chans) // 2 if cplx else len(chans)
    return Xr[:nsig], Xi[:nsig]
