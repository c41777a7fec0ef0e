"""Sharded STFT: segment spectra computed where the samples live.

Spectrogram workloads keep every segment (no Welch average), so the output
stays big — ``(navr, nfreq)``.  Each device computes the segments whose
start falls in its time block (ppermute halo for stragglers, exactly like
:mod:`pyfft_tpu.parallel.welch`), applies the reference ``fft_win``
coefficient scaling (sqrt2-amplitude one-sided, ``1/(S1 sqrt(ENBW))``), and
the host compacts the per-device (M, nfreq) tiles into global segment
order.  Matches :func:`pyfft_tpu.fftanal.stft_segments` bit-for-bit up to
collective reassociation (asserted in tests).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .. import segmentation as seg
from ..ops import mxu_fft
from ..spectral import _onesided_amp_scale, resolve_fft_backend
from .mesh import shard_map, P
from .welch import plan_shard_segments, _detrend_sharded, _halo_right, \
    _MeshBox

__all__ = ["stft_sharded"]


@partial(jax.jit, static_argnames=("navr", "nwins", "hop", "nfft",
                                   "nnyquist", "onesided", "detrend_style",
                                   "backend", "B", "M", "mesh_static",
                                   "cplx", "raw"))
def _stft_sharded_jit(x, tvec, win, s1, sqrt_enbw, *, navr, nwins, hop,
                      nfft, nnyquist, onesided, detrend_style, backend, B,
                      M, mesh_static, cplx=False, raw=False):
    mesh = mesh_static.mesh

    def step(x_l, t_l, win_l, s1_l, senbw_l):
        # complex signals arrive as a stacked (re, im) leading axis of 2
        x_l = _detrend_sharded(x_l, detrend_style, "t")
        halo = nwins - 1
        x_h = _halo_right(x_l, halo, "t")
        t_h = _halo_right(t_l, halo, "t")

        d = lax.axis_index("t")
        g0 = (d * B + hop - 1) // hop
        g_ids = g0 + jnp.arange(M)
        valid = (g_ids * hop < (d + 1) * B) & (g_ids < navr)
        starts = jnp.clip(g_ids * hop - d * B, 0, B + halo - nwins)

        idx = starts[:, None] + jnp.arange(nwins)[None, :]
        xw = x_h[..., idx] * win_l               # ([2,] M, nwins)
        tt = jnp.mean(t_h[idx], axis=-1)

        re, im = (xw[0], xw[1]) if cplx else (xw, None)
        if backend == "xla":
            X = jnp.fft.fft(re if im is None else lax.complex(re, im),
                            n=nfft, axis=-1)
            Xr, Xi = jnp.real(X), jnp.imag(X)
        else:
            Xr, Xi = mxu_fft.fft_pair(re, im, n=nfft, axis=-1)
        if raw:
            # the Welch core's Xfft_seg contract (fft_analysis.py:391-393):
            # full-nfft, natural bin order, no coefficient scaling
            scale = jnp.ones((), Xr.dtype)
        elif onesided:
            amp = jnp.asarray(_onesided_amp_scale(nfft, nnyquist),
                              dtype=Xr.dtype)
            Xr = Xr[..., :nnyquist] * amp
            Xi = Xi[..., :nnyquist] * amp
            scale = 1.0 / (s1_l * senbw_l)
        else:
            Xr = jnp.fft.fftshift(Xr, axes=-1)
            Xi = jnp.fft.fftshift(Xi, axes=-1)
            scale = 1.0 / (s1_l * senbw_l)
        return (Xr * scale, Xi * scale, tt,
                g_ids * valid - (1 - valid))     # -1 marks padding rows

    return shard_map(
        step, mesh,
        in_specs=(P(None, "t") if cplx else P("t"), P("t"), P(), P(), P()),
        out_specs=(P("t", None), P("t", None), P("t"), P("t")),
        check_vma=False,
    )(x, tvec, win, s1, sqrt_enbw)


def stft_sharded(x, tvec, win, plan: seg.SegmentPlan, fs, mesh, *,
                 onesided=True, detrend_style=1, fft_backend=None,
                 raw=False):
    """Distributed STFT of ``x (nt,)`` over the ``'t'`` mesh axis.

    Real or complex input (complex rides as a stacked (re, im) pair and is
    normally analyzed two-sided, matching :func:`stft_segments`).  Returns
    host numpy ``(tt (navr,), freq, Xfft (navr, nfreq) complex)`` with the
    exact :func:`stft_segments` scaling contract.

    ``raw=True`` returns the Welch core's per-segment convention instead
    (full ``nfft`` bins, natural order, no coefficient scaling — the
    ``Xfft_seg`` contract of reference ``fft_analysis.py:391-393``); used
    by the distributed lazy segment fill so per-segment arrays never
    require the signal to fit one device.
    """
    backend = resolve_fft_backend(fft_backend)
    if backend == "pallas":
        backend = "mxu"
    tshards = mesh.shape["t"]
    hop = plan.nwins - plan.noverlap
    B, M = plan_shard_segments(len(np.asarray(x)), plan.nwins, hop,
                               plan.navr, tshards)

    win_np = np.asarray(win, dtype=np.float64)
    s1 = seg.get_s1(win_np)
    enbw = seg.get_enbw(fs, s1, seg.get_s2(win_np))

    # widest dtype the backend actually supports (f32 unless x64 is enabled)
    wdt = jax.dtypes.canonicalize_dtype(np.float64)
    x_np = np.asarray(x)
    cplx = np.iscomplexobj(x_np)
    if cplx:
        # stacked (re, im) pair — no complex dtype reaches the device
        x_np = np.stack([np.ascontiguousarray(x_np.real),
                         np.ascontiguousarray(x_np.imag)])
    with mesh:
        Xr, Xi, tt, gid = _stft_sharded_jit(
            jnp.asarray(x_np, wdt), jnp.asarray(tvec, wdt),
            jnp.asarray(win_np), jnp.asarray(s1),
            jnp.asarray(np.sqrt(enbw)), navr=plan.navr, nwins=plan.nwins,
            hop=hop, nfft=plan.nfft, nnyquist=plan.nnyquist,
            onesided=bool(onesided), detrend_style=int(detrend_style),
            backend=backend, B=B, M=M, mesh_static=_MeshBox(mesh),
            cplx=cplx, raw=bool(raw))

    Xr, Xi = np.asarray(Xr), np.asarray(Xi)
    tt, gid = np.asarray(tt), np.asarray(gid)
    keep = gid >= 0
    order = np.argsort(gid[keep], kind="stable")
    X = (Xr[keep] + 1j * Xi[keep])[order]
    tt = tt[keep][order]
    nfreq = plan.nfft if raw else (plan.nnyquist if onesided
                                   else plan.nfft)
    freq = np.fft.fftfreq(plan.nfft, 1.0 / fs)
    if not raw:
        freq = (freq[:plan.nnyquist] if onesided
                else np.fft.fftshift(freq))
    assert X.shape == (plan.navr, nfreq)
    return tt, freq, X
