"""Benchmark: Welch PSD + FIR chain throughput (samples/sec/chip).

Runs the flagship pipeline on the default JAX device (the real TPU under
the driver): a multi-channel FIR band-pass (overlap-save, device-batched)
followed by Welch cross-spectral estimation (batched frame->window->MXU-FFT
->power->average), and compares against the reference's serial NumPy
algorithm (per-segment Python loop over ``numpy.fft``, plus
``scipy.signal``-style filtering) on the same workload.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "samples/s/chip", "vs_baseline": R}
"""
import json
import time

import numpy as np


def _tpu_chain(x, y, taps, win, plan, iters=20):
    import jax
    import jax.numpy as jnp
    from functools import partial
    from pyfft_tpu import segmentation as seg
    from pyfft_tpu.spectral import _welch_core_mxu, resolve_fft_backend
    from pyfft_tpu.filters import _os_plan, _os_core_mxu, _os_core_xla
    from pyfft_tpu.ops import mxu_fft  # noqa: F401

    backend = resolve_fft_backend(None)
    nch, nt = y.shape
    ntaps = len(taps)
    nfull = nt + ntaps - 1
    nfft_os, hop_os, nblocks = _os_plan(nfull, ntaps)
    H = np.fft.rfft(taps, n=nfft_os)

    s1 = seg.get_s1(win)
    enbw = seg.get_enbw(1e6, s1, seg.get_s2(win))
    norm = np.float32(s1 ** 2 * enbw)
    win_j = jnp.asarray(win.astype(np.float32))
    Hr = jnp.asarray(H.real.astype(np.float32))
    Hi = jnp.asarray(H.imag.astype(np.float32))

    use_pallas = backend == "mxu"  # real TPU: fused single-pass kernels
    use_v2 = False
    if use_pallas:
        from pyfft_tpu.ops.pallas_fir import fir_pallas
        from pyfft_tpu.ops.pallas_welch import (welch_pallas_fused,
                                                welch_fir_pallas_fused,
                                                pallas_welch_applicable,
                                                pallas_welch2_applicable)
        use_v2 = pallas_welch2_applicable(plan.nwins, plan.noverlap,
                                          plan.navr, nch, taps)
        use_pallas = use_v2 or pallas_welch_applicable(
            plan.nwins, plan.nnyquist, plan.navr)

    @partial(jax.jit, static_argnames=())
    def step(x_d, y_d):
        if use_pallas:
            from pyfft_tpu.spectral import _onesided_power_scale
            knorm = np.float32(1.0 / (norm * plan.navr))
            scale = jnp.asarray(
                _onesided_power_scale(plan.nfft, plan.nnyquist)
                .astype(np.float32))
            if use_v2:
                # the whole chain in ONE kernel: banded-matmul FIR ->
                # frame -> detrend -> window -> factored MXU FFT ->
                # cross-power accumulate (Pallas, bf16x3)
                Pxx, Pyy, Pxy_re, Pxy_im = welch_fir_pallas_fused(
                    x_d, y_d, win, plan.nnyquist, knorm, navr=plan.navr,
                    nwins=plan.nwins, noverlap=plan.noverlap, taps=taps,
                    detrend_style=1, interpret=False)
            else:
                # stage 1: single-pass banded-matmul FIR (Pallas, bf16x3)
                sig = jnp.concatenate([x_d[None], y_d], axis=0)
                f = fir_pallas(sig, taps, interpret=False)
                # stage 2: fused frame->windowed-DFT->cross-power (Pallas)
                Pxx, Pyy, Pxy_re, Pxy_im = welch_pallas_fused(
                    f[0], f[1:], win, plan.nnyquist, knorm, navr=plan.navr,
                    nwins=plan.nwins, noverlap=plan.noverlap,
                    detrend_style=1, interpret=False)
            out = dict(Pxx=Pxx * scale, Pyy=Pyy * scale,
                       Pxy_re=Pxy_re * scale, Pxy_im=Pxy_im * scale)
        else:
            # portable path: overlap-save FIR + four-step MXU/XLA Welch
            if backend == "xla":
                Hc = Hr + 1j * Hi
                yf = _os_core_xla(y_d, Hc, nfft=nfft_os, hop=hop_os,
                                  nblocks=nblocks, ntaps=ntaps)[..., :nt]
                xf = _os_core_xla(x_d[None], Hc, nfft=nfft_os, hop=hop_os,
                                  nblocks=nblocks, ntaps=ntaps)[0, :nt]
            else:
                yf = _os_core_mxu(y_d, Hr, Hi, nfft=nfft_os, hop=hop_os,
                                  nblocks=nblocks, ntaps=ntaps)[..., :nt]
                xf = _os_core_mxu(x_d[None], Hr, Hi, nfft=nfft_os,
                                  hop=hop_os, nblocks=nblocks,
                                  ntaps=ntaps)[0, :nt]
            out = _welch_core_mxu(
                xf, None, yf, None, win_j, norm,
                navr=plan.navr, nwins=plan.nwins, noverlap=plan.noverlap,
                nfft=plan.nfft, nnyquist=plan.nnyquist, onesided=True,
                detrend_style=1, ntmodel=False)
        # scalar checksum: a reliable stream-sync point on the tunnel
        # backend (block_until_ready alone under-reports there)
        chk = (jnp.sum(out["Pxx"]) + jnp.sum(out["Pyy"])
               + jnp.sum(out["Pxy_re"]))
        return chk, (out["Pxx"], out["Pyy"], out["Pxy_re"], out["Pxy_im"])

    x_d = jax.device_put(x)
    y_d = jax.device_put(y)
    for _ in range(3):          # warm the compile cache AND the tunnel
        chk, r = step(x_d, y_d)
    float(chk)
    t0 = time.perf_counter()
    for _ in range(iters):
        chk, r = step(x_d, y_d)
    float(chk)
    dt = (time.perf_counter() - t0) / iters
    return dt, r


def _numpy_reference_chain(x, y, taps, win, plan):
    """The reference's serial algorithm: per-channel FIR convolution plus a
    Python loop over Welch segments with numpy.fft (the hot loop at
    reference fft_analysis.py:362-388)."""
    nch, nt = y.shape
    yf = np.empty_like(y)
    for c in range(nch):
        yf[c] = np.convolve(y[c], taps, mode="full")[:nt]
    xf = np.convolve(x, taps, mode="full")[:nt]

    hop = plan.nwins - plan.noverlap
    xf = xf - xf.mean()
    yf = yf - yf.mean(axis=-1, keepdims=True)
    Pxx = np.zeros(plan.nfft)
    Pyy = np.zeros((nch, plan.nfft))
    Pxy = np.zeros((nch, plan.nfft), dtype=complex)
    for g in range(plan.navr):
        s0 = g * hop
        xs = np.fft.fft(win * xf[s0:s0 + plan.nwins], n=plan.nfft)
        for c in range(nch):
            ys = np.fft.fft(win * yf[c, s0:s0 + plan.nwins], n=plan.nfft)
            Pyy[c] += np.abs(ys) ** 2
            Pxy[c] += ys * np.conj(xs)
        Pxx += np.abs(xs) ** 2
    return Pxx / plan.navr, Pyy / plan.navr, Pxy / plan.navr


def main():
    from pyfft_tpu import segmentation as seg
    from pyfft_tpu.filters import firwin

    nch = 8
    nt = 1 << 21
    nwins = 2048
    fs = 1e6

    rng = np.random.default_rng(0)
    x = (np.sin(2 * np.pi * 97e3 * np.arange(nt) / fs)
         + 0.3 * rng.standard_normal(nt)).astype(np.float32)
    y = (x[None, :] * (1 + np.arange(nch))[:, None] * 0.25
         + 0.3 * rng.standard_normal((nch, nt))).astype(np.float32)

    plan = seg.plan_segments(nt, nwins=nwins, windowoverlap=0.5)
    win = np.hanning(nwins + 1)[:-1]
    taps = firwin(129, [0.05, 0.45], pass_zero=False)

    dt, _ = _tpu_chain(x, y, taps, win.astype(np.float32), plan)
    samples = nch * nt
    tpu_rate = samples / dt

    # reference-style serial NumPy baseline on a slice, scaled linearly
    base_nt = 1 << 18
    base_plan = seg.plan_segments(base_nt, nwins=nwins, windowoverlap=0.5)
    t0 = time.perf_counter()
    _numpy_reference_chain(x[:base_nt].astype(np.float64),
                           y[:, :base_nt].astype(np.float64),
                           taps, win, base_plan)
    base_dt = (time.perf_counter() - t0) * (nt / base_nt)
    base_rate = samples / base_dt

    print(json.dumps({
        "metric": "welch_psd_fir_chain_throughput",
        "value": round(tpu_rate, 1),
        "unit": "samples/s/chip",
        "vs_baseline": round(tpu_rate / base_rate, 2),
    }))


if __name__ == "__main__":
    import sys
    import traceback
    try:
        main()
    except Exception:
        # the driver records stdout; never leave it empty
        traceback.print_exc(file=sys.stderr)
        print(json.dumps({
            "metric": "welch_psd_fir_chain_throughput",
            "value": 0.0,
            "unit": "samples/s/chip",
            "vs_baseline": 0.0,
            "error": "bench failed; see stderr",
        }))
        sys.exit(0)
