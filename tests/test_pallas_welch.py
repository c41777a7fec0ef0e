"""Pallas fused Welch kernel (interpret mode on CPU) vs the standard paths."""
import numpy as np
import pytest

import pyfft_tpu as ft
from pyfft_tpu.ops.pallas_welch import welch_power_pallas


def test_kernel_matches_numpy():
    rng = np.random.default_rng(0)
    B, nwins, nch, nny = 37, 256, 3, 128
    xfr = rng.standard_normal((B, nwins)).astype(np.float32)
    yfr = rng.standard_normal((nch, B, nwins)).astype(np.float32)
    win = np.hanning(nwins + 1)[:-1]
    Pxx, Pyy, Pr, Pi = welch_power_pallas(xfr, yfr, win, nny, interpret=True)
    X = np.fft.fft(xfr * win, axis=-1)[:, :nny]
    Y = np.fft.fft(yfr * win, axis=-1)[..., :nny]
    np.testing.assert_allclose(np.asarray(Pxx),
                               np.sum(np.abs(X) ** 2, axis=0),
                               rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(Pyy),
                               np.sum(np.abs(Y) ** 2, axis=1),
                               rtol=2e-5, atol=1e-4)
    rPxy = np.sum(Y * np.conj(X)[None], axis=1)
    np.testing.assert_allclose(np.asarray(Pr) + 1j * np.asarray(Pi), rPxy,
                               rtol=2e-5, atol=1e-4)


def test_fft_pwelch_pallas_backend_matches_xla():
    rng = np.random.default_rng(1)
    N = 2 ** 13
    t = np.arange(N) / 1e3
    x = np.sin(2 * np.pi * 97.0 * t) + 0.1 * rng.standard_normal(N)
    y = np.sin(2 * np.pi * 97.0 * t - 0.5) + 0.1 * rng.standard_normal(N)
    args = dict(tbounds=[t[1], t[-2]], Navr=8, windowfunction="hanning",
                detrend_style=1, plotit=False, verbose=False)
    f1, Pxy1, Pxx1, *_ = ft.fft_pwelch(t, x, y, fft_backend="xla", **args)
    f2, Pxy2, Pxx2, *_ = ft.fft_pwelch(t, x, y, fft_backend="pallas", **args)
    np.testing.assert_allclose(f1, f2, atol=1e-9)
    np.testing.assert_allclose(np.asarray(Pxx2), np.asarray(Pxx1),
                               rtol=5e-5, atol=1e-9)
    np.testing.assert_allclose(np.asarray(Pxy2), np.asarray(Pxy1),
                               rtol=5e-5, atol=1e-9)


def test_pallas_backend_falls_back_for_complex():
    rng = np.random.default_rng(2)
    N = 4096
    t = np.arange(N) / 1e3
    z = (rng.standard_normal(N) + 1j * rng.standard_normal(N))
    f, Pxy, Pxx, *_ = ft.fft_pwelch(t, z, z, tbounds=[t[1], t[-2]], Navr=8,
                                    fft_backend="pallas", plotit=False,
                                    verbose=False)
    assert np.all(np.isfinite(np.asarray(Pxx)))
    assert len(f) == np.asarray(Pxx).shape[0]


# --------------------------------------------------------------------------- #
# v2: factored-transform fused kernel (FIR -> frame -> window -> two-stage
# MXU FFT -> accumulate)
# --------------------------------------------------------------------------- #

from pyfft_tpu.ops.pallas_welch import (welch_fir_pallas_fused,
                                        pallas_welch2_applicable)


def _welch_oracle(x, y, win, navr, nwins, hop, taps=None, detrend=1):
    nt = len(x)
    if taps is not None:
        x = np.convolve(x, taps, "full")[:nt]
        if len(y):
            y = np.stack([np.convolve(c, taps, "full")[:nt] for c in y])
    nch = y.shape[0]
    if detrend:
        # global-mean detrend of the filtered span, as the reference does
        # before its segment loop (fft_analysis.py:357-358)
        x = x - x.mean()
        y = y - y.mean(axis=-1, keepdims=True)
    Pxx = np.zeros(nwins)
    Pyy = np.zeros((nch, nwins))
    Pxy = np.zeros((nch, nwins), complex)
    for s in range(navr):
        sl = slice(s * hop, s * hop + nwins)
        X = np.fft.fft(win * x[sl])
        Pxx += np.abs(X) ** 2
        for c in range(nch):
            Y = np.fft.fft(win * y[c, sl])
            Pyy[c] += np.abs(Y) ** 2
            Pxy[c] += Y * np.conj(X)
    return Pxx, Pyy, Pxy


@pytest.mark.parametrize("nch,nt,nwins,hop,ntaps,detrend", [
    (3, 1 << 15, 2048, 1024, 0, 1),     # bench geometry, no FIR
    (3, 1 << 15, 2048, 1024, 129, 1),   # fused FIR
    (2, 1 << 14, 1024, 512, 129, 0),    # no detrend
    (1, 1 << 14, 2048, 2048, 0, 1),     # zero overlap
    (2, 1 << 14, 512, 128, 63, 1),      # 75% overlap, short taps
    (3, 40000, 2048, 1024, 129, 1),     # non-multiple nt, odd navr
    # nt%128==0 but nt/128 = 2*499: no FIR-transpose row blocking > m
    # exists, so the fused path must fall back to the padded feeder
    # (round-2 advisor crash repro)
    (2, 128 * 998, 512, 256, 200, 1),
])
def test_factored_kernel_vs_oracle(nch, nt, nwins, hop, ntaps, detrend):
    from pyfft_tpu.filters import firwin
    rng = np.random.default_rng(nch * nt % 7919)
    taps = (np.asarray(firwin(ntaps, [0.05, 0.45], pass_zero=False))
            if ntaps else None)
    x = rng.standard_normal(nt).astype(np.float32)
    y = rng.standard_normal((nch, nt)).astype(np.float32)
    win = np.hanning(nwins + 1)[:-1]
    navr = (nt - (nwins - hop)) // hop
    nov = nwins - hop
    assert pallas_welch2_applicable(nwins, nov, navr, nch, taps, detrend)
    nf = nwins // 2 + 1
    Pxx, Pyy, Pr, Pi = welch_fir_pallas_fused(
        x, y, win, nf, 1.0, navr=navr, nwins=nwins, noverlap=nov,
        taps=taps, detrend_style=detrend, precision="highest",
        interpret=True)
    PxxN, PyyN, PxyN = _welch_oracle(np.float64(x), np.float64(y), win,
                                     navr, nwins, hop, taps, detrend)
    scl = np.max(np.abs(PxxN))
    np.testing.assert_allclose(np.asarray(Pxx), PxxN[:nf],
                               rtol=2e-5, atol=3e-5 * scl)
    np.testing.assert_allclose(np.asarray(Pyy), PyyN[:, :nf],
                               rtol=2e-5, atol=3e-5 * scl)
    np.testing.assert_allclose(np.asarray(Pr) + 1j * np.asarray(Pi),
                               PxyN[:, :nf], rtol=2e-5, atol=3e-5 * scl)


def test_factored_kernel_auto_only():
    """nch=0 (empty y): PSD of the reference signal alone, C=1 — the
    single-channel BASELINE config 1 path with no duplicated channel."""
    rng = np.random.default_rng(3)
    nt, nwins, nov = 1 << 15, 2048, 1024
    hop = nwins - nov
    navr = (nt - nov) // hop
    x = rng.standard_normal(nt).astype(np.float32)
    win = np.hanning(nwins + 1)[:-1]
    Pxx, Pyy, Pr, Pi = welch_fir_pallas_fused(
        x, np.zeros((0, nt), np.float32), win, nwins // 2 + 1, 1.0 / navr,
        navr=navr, nwins=nwins, noverlap=nov, detrend_style=1,
        precision="highest", interpret=True)
    assert np.asarray(Pyy).shape[0] == 0
    PxxN, _, _ = _welch_oracle(np.float64(x), np.zeros((0, nt)), win,
                               navr, nwins, hop, None, 1)
    PxxN /= navr
    nf = np.asarray(Pxx).shape[0]
    np.testing.assert_allclose(np.asarray(Pxx), PxxN[:nf], rtol=2e-5,
                               atol=3e-5 * PxxN.max())


def test_factored_kernel_wide_channel_grouping():
    """nch > 15 runs the v3 kernel in channel groups; results must be
    identical to two independent narrow calls."""
    rng = np.random.default_rng(9)
    nt, nwins, nov = 1 << 14, 1024, 512
    hop = nwins - nov
    navr = (nt - nov) // hop
    nch = 20
    x = rng.standard_normal(nt).astype(np.float32)
    y = rng.standard_normal((nch, nt)).astype(np.float32)
    win = np.hanning(nwins + 1)[:-1]
    kw = dict(navr=navr, nwins=nwins, noverlap=nov, detrend_style=1,
              precision="highest", interpret=True)
    Pxx, Pyy, Pr, Pi = welch_fir_pallas_fused(
        x, y, win, nwins // 2 + 1, 1.0, **kw)
    assert Pyy.shape[0] == nch
    _, Pyy0, Pr0, _ = welch_fir_pallas_fused(
        x, y[:15], win, nwins // 2 + 1, 1.0, **kw)
    _, Pyy1, _, _ = welch_fir_pallas_fused(
        x, y[15:], win, nwins // 2 + 1, 1.0, **kw)
    np.testing.assert_allclose(np.asarray(Pyy[:15]), np.asarray(Pyy0),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(Pyy[15:]), np.asarray(Pyy1),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(Pr[:15]), np.asarray(Pr0),
                               rtol=1e-6)


def test_factored_kernel_applicability_gates():
    taps = np.ones(129)
    assert pallas_welch2_applicable(2048, 1024, 100, 8, taps)
    assert not pallas_welch2_applicable(2000, 1000, 100, 8)     # not %128
    assert not pallas_welch2_applicable(2048, 1000, 100, 8)     # hop not %128
    assert not pallas_welch2_applicable(2048, 1024, 100, 8,
                                        detrend_style=-1)       # linear
    assert not pallas_welch2_applicable(384, 256, 100, 8)       # R=3 !| 128
    # wide channel arrays run the v3 kernel in groups (VMEM is per-call)
    assert pallas_welch2_applicable(2048, 1024, 100, 512)
    # overlong FIRs exceed the banded-matmul kernel; overlap-save instead
    assert not pallas_welch2_applicable(2048, 1024, 100, 8, np.ones(2049))


def test_factored_kernel_rejects_bad_geometry():
    with pytest.raises(ValueError, match="unsupported geometry"):
        welch_fir_pallas_fused(np.zeros(4096, np.float32),
                               np.zeros((1, 4096), np.float32),
                               np.hanning(2001)[:-1], 1000, 1.0,
                               navr=3, nwins=2000, noverlap=1000,
                               interpret=True)


# --------------------------------------------------------------------------- #
# v3 complex two-sided kernel (the Doppler IQ configuration)
# --------------------------------------------------------------------------- #

def test_pallas_twosided_complex_matches_core():
    """fft_backend='pallas' on a complex signal must agree with the generic
    core (reference two-sided convention, fft_analysis.py:423-427)."""
    from pyfft_tpu.spectral import welch_cross_spectra
    from pyfft_tpu import segmentation as sgm
    rng = np.random.default_rng(3)
    nt, nwins = 1 << 14, 512
    t = np.arange(nt) / 1e3
    z = (np.exp(1j * (2 * np.pi * 97.0 * t + 0.4))
         + 0.1 * (rng.standard_normal(nt) + 1j * rng.standard_normal(nt)))
    y = 0.5 * z * np.exp(-1j * 0.3) + 0.05 * (
        rng.standard_normal(nt) + 1j * rng.standard_normal(nt))
    plan = sgm.plan_segments(nt, nwins=nwins, windowoverlap=0.5)
    win = np.hanning(nwins + 1)[:-1]
    ref = welch_cross_spectra(z, y, win, plan, 1e3, onesided=False,
                              detrend_style=1, fft_backend="xla")
    out = welch_cross_spectra(z, y, win, plan, 1e3, onesided=False,
                              detrend_style=1, fft_backend="pallas")
    assert out["Pxx_seg"] is None          # fused path: no per-segment data
    s = np.abs(np.asarray(ref["Pxx"])).max()
    np.testing.assert_allclose(np.asarray(out["Pxx"]), np.asarray(ref["Pxx"]),
                               rtol=2e-4, atol=2e-5 * s)
    np.testing.assert_allclose(np.asarray(out["Pxy"]), np.asarray(ref["Pxy"]),
                               rtol=2e-4, atol=2e-5 * s)
    # the Doppler line must sit at +97 Hz with the injected -0.3 phase
    ipk = int(np.argmax(np.abs(np.asarray(out["Pxx"]))))
    assert abs(out["freq"][ipk] - 97.0) < 1e3 / nwins
    ph = np.angle(np.asarray(out["Pxy"])[ipk])
    assert abs(ph + 0.3) < 2e-2


def test_pallas_twosided_with_taps_vs_oracle():
    """Complex two-sided kernel with a fused (real) FIR: both the re and
    the im channel ride the in-kernel banded matmul."""
    from pyfft_tpu.ops.pallas_welch3 import welch_pallas3_twosided
    from pyfft_tpu.filters import firwin
    rng = np.random.default_rng(11)
    nt, nwins, nov = 1 << 14, 512, 256
    hop = nwins - nov
    navr = (nt - nov) // hop
    z = (rng.standard_normal(nt)
         + 1j * rng.standard_normal(nt)).astype(np.complex64)
    taps = np.asarray(firwin(97, 0.3))
    win = np.hanning(nwins + 1)[:-1]
    Pz, _, _, _ = welch_pallas3_twosided(
        z, np.zeros((0, nt), np.complex64), win, 1.0 / navr, navr=navr,
        nwins=nwins, noverlap=nov, taps=taps, detrend_style=1,
        precision="highest", interpret=True)
    zf = np.convolve(z.astype(np.complex128), taps, "full")[:nt]
    zf -= zf.mean()
    P = np.zeros(nwins)
    for g in range(navr):
        Z = np.fft.fft(win * zf[g * hop:g * hop + nwins])
        P += np.abs(Z) ** 2
    P /= navr
    np.testing.assert_allclose(np.asarray(Pz), P, rtol=2e-5,
                               atol=3e-5 * P.max())


def test_pallas_twosided_rejects_bad_geometry():
    from pyfft_tpu.ops.pallas_welch3 import welch_pallas3_twosided
    z = np.zeros(4096, np.complex64)
    with pytest.raises(ValueError, match="unsupported geometry"):
        welch_pallas3_twosided(z, z[None], np.hanning(500), 1.0,
                               navr=8, nwins=500, noverlap=250)


def test_v3_covers_large_windows_v1_rejects():
    """nwins=8192 exceeds the v1 kernel's VMEM tiling but the factored v3
    kernel takes it (the VERDICT 'nwins > 4096 falls back' gap)."""
    from pyfft_tpu.ops.pallas_welch import pallas_welch_applicable
    from pyfft_tpu.ops.pallas_welch3 import (pallas_welch3_applicable,
                                             welch_fir_pallas3)
    nwins, nov = 8192, 4096
    assert not pallas_welch_applicable(nwins, nwins // 2 + 1, 16)
    assert pallas_welch3_applicable(nwins, nov, 16, 2)
    rng = np.random.default_rng(0)
    nt = 1 << 16
    navr = (nt - nov) // (nwins - nov)
    x = rng.standard_normal(nt).astype(np.float32)
    y = rng.standard_normal((2, nt)).astype(np.float32)
    win = np.hanning(nwins + 1)[:-1]
    Pxx, *_ = welch_fir_pallas3(x, y, win, nwins // 2 + 1, 1.0 / navr,
                                navr=navr, nwins=nwins, noverlap=nov,
                                detrend_style=1, precision="highest",
                                interpret=True)
    xd = x.astype(np.float64) - x.astype(np.float64).mean()
    P = np.zeros(nwins)
    for g in range(navr):
        X = np.fft.fft(win * xd[g * nov:g * nov + nwins])
        P += np.abs(X) ** 2
    P /= navr
    np.testing.assert_allclose(np.asarray(Pxx), P[:nwins // 2 + 1],
                               rtol=2e-5, atol=2e-5 * P.max())


@pytest.mark.parametrize("seed", range(6))
def test_fused_kernel_random_geometry_fuzz(seed):
    """Property test over random legal geometries (R | 128, hop % 128 == 0,
    random channel counts, lane-aligned and unaligned nt, optional taps,
    both detrend styles) — guards the fused kernel's block-index clamping,
    logical row masking, and tail-slot segment masking."""
    from pyfft_tpu.ops.pallas_welch3 import pallas_welch3_applicable
    from pyfft_tpu.filters import firwin
    rng = np.random.default_rng(100 + seed)
    # rejection-sample a random LEGAL geometry (deterministic per seed);
    # out-of-domain shapes have their own explicit applicability test below
    for _ in range(64):
        R = int(rng.choice([2, 4, 8, 16, 32]))
        nwins = 128 * R
        hop = 128 * int(rng.integers(max(R // 2, 1), R + 1))
        nov = nwins - hop
        nch = int(rng.integers(0, 4))
        detrend = int(rng.choice([0, 1]))
        if pallas_welch3_applicable(nwins, nov, 8, max(nch, 1), detrend):
            break
    else:  # pragma: no cover - 64 straight rejections would be a regression
        raise AssertionError("no legal geometry found in 64 draws")
    navr_want = int(rng.integers(3, 40))
    nt = nov + navr_want * hop + int(rng.integers(0, 300))
    navr = (nt - nov) // hop
    ntaps = int(rng.choice([0, 33, 129]))
    taps = np.asarray(firwin(ntaps, 0.3)) if ntaps else None
    x = rng.standard_normal(nt).astype(np.float32)
    y = rng.standard_normal((nch, nt)).astype(np.float32)
    win = np.hanning(nwins + 1)[:-1]
    Pxx, Pyy, Pr, Pi = welch_fir_pallas_fused(
        x, y, win, nwins // 2 + 1, 1.0, navr=navr, nwins=nwins,
        noverlap=nov, taps=taps, detrend_style=detrend,
        precision="highest", interpret=True)
    PxxN, PyyN, PxyN = _welch_oracle(np.float64(x), np.float64(y), win,
                                     navr, nwins, hop, taps, detrend)
    nf = np.asarray(Pxx).shape[0]
    scl = np.max(np.abs(PxxN))
    np.testing.assert_allclose(np.asarray(Pxx), PxxN[:nf], rtol=2e-5,
                               atol=3e-5 * scl)
    if nch:
        np.testing.assert_allclose(np.asarray(Pyy), PyyN[:, :nf],
                                   rtol=2e-5, atol=3e-5 * scl)
        np.testing.assert_allclose(np.asarray(Pr) + 1j * np.asarray(Pi),
                                   PxyN[:, :nf], rtol=2e-5, atol=3e-5 * scl)


def test_v3_applicability_rejects_out_of_domain_shapes():
    """Shapes the kernel must NOT claim: the fuzz test above only samples
    legal geometries, so pin the rejection logic explicitly here (a future
    applicability regression cannot hide in an expected skip)."""
    from pyfft_tpu.ops.pallas_welch3 import pallas_welch3_applicable
    # R=32 with hr=17: blk = 4*17 = 68 not a multiple of max(R, 8) = 32
    assert not pallas_welch3_applicable(4096, 4096 - 128 * 17, 8, 1)
    # lane-unaligned hop
    assert not pallas_welch3_applicable(512, 200, 8, 1)
    # lane-unaligned nwins
    assert not pallas_welch3_applicable(500, 250, 8, 1)
    # channel count past the VMEM budget (nch + 1 > 16)
    assert not pallas_welch3_applicable(512, 256, 8, 16)
    # linear detrend is outside the kernel's domain
    assert not pallas_welch3_applicable(512, 256, 8, 1, detrend_style=-1)


@pytest.mark.parametrize("nwins,nov,nt,ntaps,det", [
    (512, 256, 1 << 15, 0, 1),
    (512, 256, 1 << 15, 33, 1),
    (1024, 512, 1 << 16, 0, 0),
    (512, 384, 40960, 0, 1),
    (256, 128, 9 * 128 * 30 + 128, 65, 1),
])
def test_welch_auto_packed_matches_unpacked(nwins, nov, nt, ntaps, det):
    """Virtual-channel packing (welch_auto_packed) == plain v3 auto-PSD,
    including partial parts masked per lane group via vmask."""
    from pyfft_tpu.ops.pallas_welch3 import (welch_auto_packed,
                                             welch_fir_pallas3,
                                             packed_parts_geometry)
    import jax.numpy as jnp
    rng = np.random.default_rng(7)
    hop = nwins - nov
    navr = (nt - nov) // hop
    assert packed_parts_geometry(navr, nwins, nov) is not None
    x = rng.standard_normal(nt).astype(np.float32)
    win = np.hanning(nwins + 1)[:-1]
    taps = None
    if ntaps:
        t_ = np.hanning(ntaps)
        taps = t_ / t_.sum()
    y0 = jnp.zeros((0, nt), jnp.float32)
    ref = welch_fir_pallas3(x, y0, win, nwins // 2 + 1, 1.0, navr=navr,
                            nwins=nwins, noverlap=nov, taps=taps,
                            detrend_style=det)[0]
    got = welch_auto_packed(x, win, nwins // 2 + 1, 1.0, navr=navr,
                            nwins=nwins, noverlap=nov, taps=taps,
                            detrend_style=det)
    scl = float(np.max(np.abs(np.asarray(ref))))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6 * scl)


@pytest.mark.parametrize("nwins,nov,nt,ntaps,det", [
    (512, 256, 1 << 15, 0, 1),
    (512, 256, 1 << 15, 33, 1),
    (1024, 512, 1 << 16, 0, 0),
    (256, 128, 9 * 128 * 30 + 128, 65, 1),
])
def test_welch_pair_packed_matches_unpacked(nwins, nov, nt, ntaps, det):
    """Paired virtual-channel packing (welch_pair_packed) == plain v3 at
    nch=1: interleaved (x_part, y_part) channel pairs with the pairwise
    cross epilogue, partial parts masked per lane group."""
    from pyfft_tpu.ops.pallas_welch3 import (welch_pair_packed,
                                             welch_fir_pallas3,
                                             packed_pair_geometry)
    rng = np.random.default_rng(3)
    hop = nwins - nov
    navr = (nt - nov) // hop
    assert packed_pair_geometry(navr, nwins, nov) is not None
    x = rng.standard_normal(nt).astype(np.float32)
    y = rng.standard_normal(nt).astype(np.float32)
    win = np.hanning(nwins + 1)[:-1]
    taps = None
    if ntaps:
        t_ = np.hanning(ntaps)
        taps = t_ / t_.sum()
    ref = welch_fir_pallas3(x, y[None], win, nwins // 2 + 1, 1.0 / navr,
                            navr=navr, nwins=nwins, noverlap=nov, taps=taps,
                            detrend_style=det)
    got = welch_pair_packed(x, y, win, nwins // 2 + 1, 1.0 / navr,
                            navr=navr, nwins=nwins, noverlap=nov, taps=taps,
                            detrend_style=det)
    for a, b in zip(got, ref):
        scl = float(np.max(np.abs(np.asarray(b)))) + 1e-30
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5 * scl)
