"""Welch-averaged auto-/cross-spectral estimation — the TPU-native core.

This module provides the role of the reference's ``fft_pwelch``
(reference ``fft_analysis.py:36-791``), redesigned TPU-first:

* the per-segment Python loop (reference ``fft_analysis.py:362-388``) becomes
  a single batched ``frame -> window -> FFT -> power`` pipeline under one
  ``jax.jit`` — XLA fuses the window multiply and power into the FFT's
  prologue/epilogue, and the segment axis becomes a clean batch dimension;
* all shape arithmetic (segment counts, overlap, one-sided bin selection) is
  resolved statically at trace time (:mod:`pyfft_tpu.segmentation`);
* normalization contract is bin-for-bin identical to the reference homebrew
  path: one-sided energy doubling on interior bins (``fft_analysis.py:402-421``),
  ``1/S1^2`` RMS-power scaling then ``1/ENBW`` density scaling
  (``fft_analysis.py:432-440``), Bendat'78 coherence variance
  (``fft_analysis.py:496-514``), lag-domain correlations (``:544-597``).

The public entry point :func:`fft_pwelch` keeps the reference's exact calling
convention and its output tuple ``(freq, Pxy, Pxx, Pyy, Cxy, phi_xy, info)``.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .utils.structure import Struct
from .utils.detrend import detrend_func
from .windows import windows
from . import segmentation as seg


__all__ = ["fft_pwelch", "fftinfosc", "Cxy_Cxy2", "welch_cross_spectra",
           "csd_oracle"]


# --------------------------------------------------------------------------- #
# Output schema (reference fft_analysis.py:796-828)
# --------------------------------------------------------------------------- #

class fftinfosc(Struct):
    """Result container with the reference's output schema.

    Field list mirrors reference ``fftinfosc`` (``fft_analysis.py:796-828``):
    window norms (S1, S2, NENBW, ENBW), averaged spectra, coherence/phase with
    propagated variances, linear amplitude spectra, and per-segment arrays.
    """

    def __init__(self):
        self.S1 = None
        self.S2 = None
        self.NENBW = None
        self.ENBW = None
        self.freq = None
        self.Pxx = None
        self.Pyy = None
        self.Pxy = None
        self.Cxy = None
        self.varcoh = None
        self.phi_xy = None
        self.varphi = None
        self.Lxx = None
        self.Lyy = None
        self.Lxy = None
        self.varLxx = None
        self.varLyy = None
        self.varLxy = None
        self.Pxx_seg = None
        self.Pyy_seg = None
        self.Pxy_seg = None
        self.Xfft_seg = None
        self.Yfft_seg = None


# --------------------------------------------------------------------------- #
# Coherence (reference fft_analysis.py:1662-1688)
# --------------------------------------------------------------------------- #

def Cxy_Cxy2(Pxx, Pyy, Pxy, ibg=None):
    """Complex coherence and mean-squared coherence.

    ``Cxy = Pxy / sqrt(|Pxx| |Pyy|)``; ``Cxy2 = Pxy conj(Pxy)/(|Pxx||Pyy|)``
    (reference ``fft_analysis.py:1672-1677``).  With ``ibg`` given, returns
    the imaginary coherence and background-subtracted coherence instead
    (reference ``:1683-1688``).
    """
    Pxx = jnp.asarray(Pxx)
    Pyy = jnp.asarray(Pyy)
    Pxy = jnp.asarray(Pxy)
    if Pxx.ndim < Pyy.ndim:
        Pxx = Pxx.reshape(Pxx.shape + (1,) * (Pyy.ndim - Pxx.ndim))
    denom = jnp.abs(Pxx) * jnp.abs(Pyy)
    Cxy2 = Pxy * jnp.conj(Pxy) / denom
    Cxy = Pxy / jnp.sqrt(denom)
    if ibg is None:
        return Cxy, Cxy2
    iCxy = jnp.imag(Cxy) / (1.0 - jnp.real(Cxy))
    bg = jnp.mean(Cxy[:, ibg], axis=-1, keepdims=True)
    Cprime = jnp.real(Cxy - bg) / (1.0 - jnp.real(Cxy - bg))
    return iCxy, Cprime


# --------------------------------------------------------------------------- #
# Jitted segment pipeline
# --------------------------------------------------------------------------- #

def _onesided_power_scale(nfft: int, nnyquist: int) -> np.ndarray:
    """Energy-doubling vector for one-sided *power* spectra.

    Reproduces reference ``fft_analysis.py:414-421``: interior bins doubled
    via ``[1:-1]`` on the retained array, plus the last retained bin when
    ``nfft`` is odd.
    """
    s = np.ones(nnyquist)
    s[1:-1] = 2.0
    if nfft % 2:
        s[-1] = 2.0
    return s


def _onesided_amp_scale(nfft: int, nnyquist: int) -> np.ndarray:
    """sqrt(2) doubling for one-sided *amplitude* (FFT-coefficient) spectra.

    Reproduces reference ``fft_analysis.py:2186-2189`` (``fft_win``).
    """
    s = np.ones(nnyquist)
    s[1:-1] = np.sqrt(2.0)
    if nfft % 2:
        s[-1] = np.sqrt(2.0)
    return s


@partial(jax.jit, static_argnames=("navr", "nwins", "noverlap", "nfft",
                                   "nnyquist", "onesided", "detrend_style",
                                   "ntmodel"))
def _welch_segment_spectra(x, y, win, s1sq_enbw, *, navr, nwins, noverlap,
                           nfft, nnyquist, onesided, detrend_style, ntmodel):
    """Batched Welch segment spectra (device side, fully static shapes).

    Inputs: ``x (nt,)``, ``y (nch, nt)``, ``win (nwins,)``,
    ``s1sq_enbw`` = ``S1^2 * ENBW`` (traced scalar so window changes do not
    recompile).  Returns per-segment and averaged auto-/cross-spectra plus the
    raw segment FFTs.
    """
    det = detrend_func(detrend_style)
    x = det(x, axis=-1)
    y = det(y, axis=-1)
    hop = nwins - noverlap

    if ntmodel:
        xfr = x[None, :nwins]
    else:
        xfr = seg.frame_signal(x, nwins, hop, navr)          # (navr, nwins)
    yfr = seg.frame_signal(y, nwins, hop, navr)              # (nch, navr, nwins)

    w = win.astype(xfr.real.dtype)
    X = jnp.fft.fft(xfr * w, n=nfft, axis=-1)
    Y = jnp.fft.fft(yfr * w, n=nfft, axis=-1)
    if ntmodel:
        X = jnp.broadcast_to(X, (navr, nfft))

    Pxx = X * jnp.conj(X)                                    # (navr, nfft)
    Pyy = Y * jnp.conj(Y)                                    # (nch, navr, nfft)
    Pxy = Y * jnp.conj(X)                                    # (nch, navr, nfft)

    if onesided:
        scale = jnp.asarray(_onesided_power_scale(nfft, nnyquist),
                            dtype=Pxx.real.dtype)
        Pxx = Pxx[..., :nnyquist] * scale
        Pyy = Pyy[..., :nnyquist] * scale
        Pxy = Pxy[..., :nnyquist] * scale
    else:
        Pxx = jnp.fft.fftshift(Pxx, axes=-1)
        Pyy = jnp.fft.fftshift(Pyy, axes=-1)
        Pxy = jnp.fft.fftshift(Pxy, axes=-1)

    # RMS power then spectral density (reference :432-440)
    norm = 1.0 / s1sq_enbw
    Pxx = Pxx * norm
    Pyy = Pyy * norm
    Pxy = Pxy * norm

    return dict(
        Pxx_seg=Pxx, Pyy_seg=Pyy, Pxy_seg=Pxy,
        Xfft_seg=X, Yfft_seg=Y,
        Pxx=jnp.mean(Pxx, axis=0),
        Pyy=jnp.mean(Pyy, axis=1).T,     # (nfreq, nch)
        Pxy=jnp.mean(Pxy, axis=1).T,
    )


def welch_cross_spectra(x, y, win, plan: seg.SegmentPlan, fs: float, *,
                        onesided=True, detrend_style=1, ntmodel=False):
    """Functional core: averaged auto-/cross-spectral densities.

    Thin convenience wrapper over the jitted segment pipeline; returns a dict
    with ``freq`` plus the outputs of :func:`_welch_segment_spectra`.
    """
    win = jnp.asarray(win)
    s1 = seg.get_s1(np.asarray(win))
    enbw = seg.get_enbw(fs, s1, seg.get_s2(np.asarray(win)))
    y2 = jnp.atleast_2d(jnp.asarray(y))
    out = _welch_segment_spectra(
        jnp.asarray(x), y2, win, jnp.asarray(s1 ** 2 * enbw),
        navr=plan.navr, nwins=plan.nwins, noverlap=plan.noverlap,
        nfft=plan.nfft, nnyquist=plan.nnyquist, onesided=bool(onesided),
        detrend_style=int(detrend_style), ntmodel=bool(ntmodel))
    freq = np.fft.fftfreq(plan.nfft, 1.0 / fs)
    if onesided:
        freq = freq[:plan.nnyquist]
    else:
        freq = np.fft.fftshift(freq)
    out["freq"] = jnp.asarray(freq)
    return out


# --------------------------------------------------------------------------- #
# Independent-oracle CSD path (role of matplotlib.mlab.csd; reference :288-303)
# --------------------------------------------------------------------------- #

def csd_oracle(x, y, nfft, fs, detrend=None, window=None, noverlap=0,
               sides="onesided"):
    """NumPy cross-spectral density with matplotlib.mlab conventions.

    Role of the reference's ``useMLAB`` cross-check path
    (``fft_analysis.py:288-303``): per-segment detrend, window, FFT,
    ``conj(X) * Y`` averaged, scaled by ``1/(Fs * S2)``, with one-sided
    doubling of non-DC/non-Nyquist bins.  Kept in NumPy on purpose — it is
    the *independent* implementation used to validate the TPU path.
    """
    x = np.asarray(x)
    y = np.asarray(y)
    if window is None:
        window = np.hanning(nfft)
    win = np.asarray(window)
    if detrend is None:
        detrend = lambda d: d  # noqa: E731

    step = nfft - noverlap
    starts = np.arange(0, len(x) - nfft + 1, step)
    navr = len(starts)
    acc = 0.0
    for s0 in starts:
        xs = detrend(x[s0:s0 + nfft]) * win
        ys = detrend(y[s0:s0 + nfft]) * win
        X = np.fft.fft(xs, n=nfft)
        Y = np.fft.fft(ys, n=nfft)
        acc = acc + np.conj(X) * Y
    Pxy = acc / navr
    Pxy /= fs * (win ** 2).sum()

    freqs = np.fft.fftfreq(nfft, 1.0 / fs)
    if sides == "onesided":
        nret = nfft // 2 + 1
        Pxy = Pxy[:nret].copy()
        if nfft % 2:
            Pxy[1:] *= 2.0
        else:
            Pxy[1:-1] *= 2.0
        freqs = np.abs(freqs[:nret])
        freqs[-1] = abs(fs / 2.0) if nfft % 2 == 0 else freqs[-1]
    else:
        Pxy = np.fft.fftshift(Pxy)
        freqs = np.fft.fftshift(freqs)
    return Pxy, freqs


# --------------------------------------------------------------------------- #
# fft_pwelch — full-parity public API
# --------------------------------------------------------------------------- #

def fft_pwelch(tvec, sigx, sigy, tbounds=None, Navr=None, windowoverlap=None,
               windowfunction=None, useMLAB=None, plotit=None, verbose=None,
               detrend_style=None, onesided=None, **kwargs):
    """Welch-averaged cross-spectral analysis of two signals.

    Computes the cross- and auto-power spectral densities, coherence,
    cross-phase (with propagated uncertainties), linear amplitude spectra and
    lag-domain correlations of ``sigx`` against (possibly multi-channel)
    ``sigy``.

    Calling convention, defaulting rules and outputs are behavior-compatible
    with the reference ``fft_pwelch`` (``fft_analysis.py:36-791``):

    - ``windowfunction`` default 'Hanning'; ``windowoverlap`` defaults to the
      window's recommended overlap (``:104-111``);
    - ``minFreq``/``tper`` kwargs override the segment length
      (``nwins = int(Fs * tper)``, ``tper = 2/minFreq``; ``:180-183``);
    - ``onesided`` defaults to False for complex inputs (``:123-128``);
    - ``detrend_style``: 1 mean (default), 0 none, -1 linear;
    - full-span inputs are reflect-extended at the boundaries (``:196-205``);
    - ``useMLAB=True`` runs the independent NumPy oracle path instead of the
      TPU pipeline (role of ``matplotlib.mlab.csd``; ``:288-303``).

    Returns ``(freq, Pxy, Pxx, Pyy, Cxy, phi_xy, fftinfo)``.

    Deviation from the reference (documented): when segment arithmetic after
    reflect-extension would index past the analyzed span (a crash in the
    reference for ``minFreq`` + full-span inputs), ``Navr`` is clamped to the
    largest count that fits.
    """
    calcNavr = Navr is None
    if windowfunction is None:
        windowfunction = "Hanning"
    if windowoverlap is None:
        windowoverlap = windows(windowfunction, verbose=False)
    if useMLAB is None:
        useMLAB = False
    if plotit is None:
        plotit = True
    if verbose is None:
        verbose = False
    if detrend_style is None:
        detrend_style = 1
    tvec = np.asarray(tvec)
    if tbounds is None:
        tbounds = [tvec[0], tvec[-1]]

    sigx = np.asarray(sigx)
    sigy = np.asarray(sigy)
    if onesided is None:
        onesided = not (np.iscomplexobj(sigx) or np.iscomplexobj(sigy))

    Fs = (len(tvec) - 1) / (tvec[-1] - tvec[0])

    i0 = int(np.floor(Fs * (tbounds[0] - tvec[0])))
    i1 = int(np.floor(1 + Fs * (tbounds[1] - tvec[0])))
    nsig = np.size(tvec[i0:i1])

    # --- shape handling: sigy -> (nt, nch) (reference :163-167)
    sigy = np.atleast_2d(sigy)
    if sigy.shape[1] == len(tvec):
        sigy = sigy.T
    nch = sigy.shape[1]

    # --- segment-length resolution (reference :170-191)
    nTmodel = np.size(sigx, axis=0) != np.size(sigy, axis=0)
    if nTmodel:
        if calcNavr:
            nwins = np.size(sigx, axis=0)
        else:
            nwins = seg.get_nwins(nsig, Navr, windowoverlap)
    else:
        if "minFreq" in kwargs:
            kwargs["tper"] = 2.0 / kwargs["minFreq"]
        if "tper" in kwargs:
            nwins = int(Fs * kwargs["tper"])
        else:
            if Navr is None:
                Navr = 8
            calcNavr = False
            nwins = seg.get_nwins(nsig, Navr, windowoverlap)

    noverlap = seg.get_noverlap(nwins, windowoverlap)

    # --- reflect-extension at full span (reference :196-205)
    reflecting = False
    if i0 == 0 and i1 == len(tvec):
        reflecting = True
        if not nTmodel:
            sigx = np.concatenate(
                (sigx[nwins - 1:0:-1, ...], sigx, sigx[-1:-nwins:-1, ...]), axis=0)
        sigy = np.concatenate(
            (sigy[nwins - 1:0:-1, ...], sigy, sigy[-1:-nwins:-1, ...]), axis=0)
        nsig = sigy.shape[0]

    if calcNavr:
        Navr = seg.get_navr(nsig, nwins, noverlap)

    if nwins >= nsig:
        Navr = 1
        nwins = nsig
    nfft = nwins
    Nnyquist = seg.get_nnyquist(nfft)

    # --- window + norms (reference :231-246)
    win, winparams = windows(windowfunction, nwins=nwins, verbose=verbose,
                             msgout=True, **({"beta": kwargs["beta"]}
                                             if "beta" in kwargs else {}))

    fftinfo = fftinfosc()
    fftinfo.win = win
    fftinfo.winparams = winparams
    fftinfo.windowoverlap = windowoverlap
    fftinfo.ibnds = [i0, i1]
    fftinfo.S1 = seg.get_s1(win)
    fftinfo.S2 = seg.get_s2(win)
    fftinfo.NENBW = seg.get_nenbw(Nnyquist, fftinfo.S1, fftinfo.S2)
    fftinfo.ENBW = seg.get_enbw(Fs, fftinfo.S1, fftinfo.S2)

    detrend = detrend_func(detrend_style)

    # --- analyzed spans (reference :282-283, :346-354)
    if nTmodel:
        x_in = sigx
        y_in = sigy[i0:i1, :]
    else:
        x_in = sigx[i0:i1]
        y_in = sigy[i0:i1, :]

    # clamp Navr so all segments fit the analyzed span (see docstring)
    max_navr = seg.get_navr(y_in.shape[0], nwins, noverlap)
    if Navr > max_navr:
        Navr = max_navr

    if useMLAB:
        sides = "onesided" if onesided else "twosided"
        if verbose:
            print("using the independent NumPy oracle path for spectra")

        def _det(d):
            return np.asarray(detrend(jnp.asarray(d), axis=0))

        xm = x_in
        if nTmodel:
            while xm.shape[0] < y_in.shape[0]:
                xm = np.r_[xm, xm[-1:-nwins:-1]]
            if xm.shape[0] > y_in.shape[0]:
                xm = xm[:y_in.shape[0]]
        Pxx, freq = csd_oracle(xm, xm, nfft, fs=Fs, detrend=_det, window=win,
                               noverlap=noverlap, sides=sides)
        Pyy = np.zeros((nch, len(freq)), dtype=np.float64)
        Pxy = np.zeros((nch, len(freq)), dtype=np.complex128)
        for ii in range(nch):
            Pyy[ii, :], _ = csd_oracle(y_in[:, ii], y_in[:, ii], nfft, fs=Fs,
                                       detrend=_det, window=win,
                                       noverlap=noverlap, sides=sides)
            Pxy[ii, :], _ = csd_oracle(xm, y_in[:, ii], nfft, fs=Fs,
                                       detrend=_det, window=win,
                                       noverlap=noverlap, sides=sides)
        if onesided:
            freq = freq[:Nnyquist]
            Pxx = Pxx[:Nnyquist]
            Pyy = Pyy[:, :Nnyquist]
            Pxy = Pxy[:, :Nnyquist]
        Pyy = jnp.asarray(Pyy.T)
        Pxy = jnp.asarray(Pxy.T)
        Pxx = jnp.asarray(Pxx)
        freq = jnp.asarray(freq)
    else:
        if verbose:
            print("using the batched TPU Welch pipeline for spectra")
        out = _welch_segment_spectra(
            jnp.asarray(x_in),
            jnp.asarray(y_in.T),                 # (nch, nt)
            jnp.asarray(win),
            jnp.asarray(fftinfo.S1 ** 2 * fftinfo.ENBW),
            navr=int(Navr), nwins=int(nwins), noverlap=int(noverlap),
            nfft=int(nfft), nnyquist=int(Nnyquist), onesided=bool(onesided),
            detrend_style=int(detrend_style), ntmodel=bool(nTmodel))

        freq = np.fft.fftfreq(nfft, 1.0 / Fs)
        if onesided:
            freq = freq[:Nnyquist]
        else:
            freq = np.fft.fftshift(freq)
        freq = jnp.asarray(freq)

        Pxx = out["Pxx"]
        Pyy = out["Pyy"]
        Pxy = out["Pxy"]

        fftinfo.Pxx_seg = out["Pxx_seg"]
        fftinfo.Pyy_seg = out["Pyy_seg"]
        fftinfo.Pxy_seg = out["Pxy_seg"]
        fftinfo.Xfft_seg = out["Xfft_seg"]
        fftinfo.Yfft_seg = out["Yfft_seg"]
        fftinfo.phixy_seg = jnp.angle(out["Pxy_seg"])
        fftinfo.varphi_seg = jnp.zeros_like(fftinfo.phixy_seg)

    # ---------------- shared post-processing (reference :489-648) ----------
    Cxy, Cxy2 = Cxy_Cxy2(Pxx, Pyy, Pxy)

    # Bendat'78-derived coherence variance (reference :496-498)
    fftinfo.varCxy = ((1.0 - Cxy * jnp.conj(Cxy)) / np.sqrt(2 * Navr)) ** 2.0
    fftinfo.varCxy2 = 4.0 * Cxy2 * fftinfo.varCxy

    fftinfo.varPxx = (Pxx / np.sqrt(Navr)) ** 2.0
    fftinfo.varPyy = (Pyy / np.sqrt(Navr)) ** 2.0
    fftinfo.varPxy = (Pxy / np.sqrt(Navr)) ** 2.0

    # A.E. White, Phys. Plasmas 17 056103 (2010) phase variance; reference :514
    # evaluates to sqrt(1-|C2|) / (2 Navr sqrt(|C2|)) via operator precedence
    fftinfo.varPhxy = jnp.sqrt(1.0 - jnp.abs(Cxy2)) / (2.0 * Navr * jnp.sqrt(jnp.abs(Cxy2)))

    phi_xy = jnp.arctan2(Pxy.imag, Pxy.real)

    # Linear amplitude spectra (reference :526-540)
    Lxx = jnp.sqrt(jnp.abs(fftinfo.ENBW * Pxx))
    Lyy = jnp.sqrt(jnp.abs(fftinfo.ENBW * Pyy))
    Lxy = jnp.sqrt(jnp.abs(fftinfo.ENBW * Pxy))
    if onesided:
        amp = _onesided_amp_scale(nfft, Nnyquist)
        Lxx = Lxx * jnp.asarray(amp, dtype=Lxx.dtype)
        Lyy = Lyy * jnp.asarray(amp, dtype=Lyy.dtype)[:, None]
        Lxy = Lxy * jnp.asarray(amp, dtype=Lxy.dtype)[:, None]
    fftinfo.Lxx, fftinfo.Lyy, fftinfo.Lxy = Lxx, Lyy, Lxy

    # Lag-domain correlations from the spectra (reference :544-597)
    if onesided:
        half = _onesided_power_scale(nfft, Nnyquist)
        inv = jnp.asarray(1.0 / half)

        def _to_lags(P):
            sc = inv if P.ndim == 1 else inv[:, None]
            return jnp.fft.irfft(P * sc, n=nfft, axis=0)

        Rxx = _to_lags(Pxx)
        Ryy = _to_lags(Pyy)
        Rxy = _to_lags(Pxy)
        iCxy = jnp.fft.irfft(Cxy, n=nfft, axis=0)
    else:
        def _to_lags2(P):
            return jnp.fft.ifft(jnp.fft.ifftshift(P, axes=0), n=nfft, axis=0)

        Rxx = _to_lags2(Pxx)
        Ryy = _to_lags2(Pyy)
        Rxy = _to_lags2(Pxy)
        iCxy = _to_lags2(Cxy)

    rt = np.sqrt(nfft)
    Rxx = Rxx * rt
    Ryy = Ryy * rt
    Rxy = Rxy * rt
    iCxy = iCxy * rt

    Ex = Rxx[0, ...]
    Ey = Ryy[0, ...]
    corrcoef = Rxy / jnp.sqrt(Ex * Ey)

    fftinfo.Rxx = jnp.fft.fftshift(Rxx, axes=0)
    fftinfo.Ryy = jnp.fft.fftshift(Ryy, axes=0)
    fftinfo.Rxy = jnp.fft.fftshift(Rxy, axes=0)
    fftinfo.iCxy = jnp.fft.fftshift(iCxy, axes=0)
    fftinfo.corrcoef = jnp.fft.fftshift(corrcoef, axes=0)
    fftinfo.Ex = Ex
    fftinfo.Ey = Ey
    fftinfo.lags = (np.arange(1, nfft + 1) - Nnyquist) / Fs

    fftinfo.varLxx = (Lxx ** 2) * (fftinfo.varPxx / jnp.abs(Pxx) ** 2)
    fftinfo.varLyy = (Lyy ** 2) * (fftinfo.varPyy / jnp.abs(Pyy) ** 2)
    fftinfo.varLxy = (Lxy ** 2) * (fftinfo.varPxy / jnp.abs(Pxy) ** 2)

    if nch == 1:
        Pyy = Pyy.flatten()
        Pxy = Pxy.flatten()
        Cxy = Cxy.flatten()
        Cxy2 = Cxy2.flatten()
        phi_xy = phi_xy.flatten()
        for name in ("Rxx", "Ryy", "Rxy", "corrcoef", "iCxy", "Lxx", "Lyy",
                     "Lxy", "varLxx", "varLyy", "varLxy", "varCxy", "varCxy2",
                     "varPxx", "varPyy", "varPxy", "varPhxy"):
            setattr(fftinfo, name, getattr(fftinfo, name).flatten())
        fftinfo.lags = fftinfo.lags.flatten()

    fftinfo.nch = nch
    fftinfo.Fs = Fs
    fftinfo.Navr = Navr
    fftinfo.nwins = nwins
    fftinfo.nfft = nfft
    fftinfo.Nnyquist = Nnyquist
    fftinfo.noverlap = noverlap
    fftinfo.overlap = windowoverlap
    fftinfo.window = windowfunction
    fftinfo.minFreq = 2.0 * Fs / nwins
    fftinfo.freq = freq
    fftinfo.Pxx = Pxx
    fftinfo.Pyy = Pyy
    fftinfo.Pxy = Pxy
    fftinfo.Cxy = Cxy
    fftinfo.Cxy2 = Cxy2
    fftinfo.phi_xy = phi_xy

    if plotit:  # pragma: no cover - plotting side effects
        from . import plotting
        plotting.plot_pwelch_summary(tvec, sigx, sigy, tbounds, freq, Pxx,
                                     Pyy, Pxy, Cxy2, phi_xy, fftinfo,
                                     onesided=onesided, reflecting=reflecting,
                                     nwins=nwins, navr=Navr, **kwargs)

    return freq, Pxy, Pxx, Pyy, Cxy, phi_xy, fftinfo
