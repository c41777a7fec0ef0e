"""BASELINE.json's five configs, measured on the current device.

Prints one JSON line per config: samples/s, wall time, and a roofline
fraction where the FLOP model applies.  ``python scripts/bench_configs.py``
(on TPU under the driver; on CPU it still runs, numbers are just CPU
numbers).
"""
import json
import time

import numpy as np


def _sync(x):
    return float(np.sum(np.abs(np.asarray(x))))


def timeit(fn, iters=5, warmup=1):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import pyfft_tpu as ft
    from pyfft_tpu import segmentation as seg
    from pyfft_tpu.spectral import _welch_core_mxu, resolve_fft_backend
    from pyfft_tpu.utils import profiling as prof

    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind} backend={jax.default_backend()}",
          flush=True)
    backend = resolve_fft_backend(None)
    rng = np.random.default_rng(0)
    results = []

    # ---- config 1: single-channel Welch PSD (Hann, 50%) ----
    fs, nt, nwins = 1e6, 1 << 22, 4096
    t = (np.arange(nt) / fs).astype(np.float32)
    x = (np.sin(2 * np.pi * 97e3 * t)
         + 0.3 * rng.standard_normal(nt)).astype(np.float32)
    plan = seg.plan_segments(nt, nwins=nwins, windowoverlap=0.5)
    win = np.hanning(nwins + 1)[:-1].astype(np.float32)
    s1 = seg.get_s1(win)
    norm = np.float32(s1 ** 2 * seg.get_enbw(fs, s1, seg.get_s2(win)))
    import jax.numpy as jnp
    win_j = jnp.asarray(win)
    xd = jax.device_put(x)

    import functools

    @jax.jit
    def welch1(xd):
        out = _welch_core_mxu(xd, None, xd[None], None, win_j, norm,
                              navr=plan.navr, nwins=plan.nwins,
                              noverlap=plan.noverlap, nfft=plan.nfft,
                              nnyquist=plan.nnyquist, onesided=True,
                              detrend_style=1, ntmodel=False)
        return out["Pxx"]

    dt = timeit(lambda: _sync(welch1(xd)))
    fl = prof.welch_flops(plan.navr, nwins, nch=1)
    results.append({"config": 1, "what": "welch_psd_1ch",
                    "samples_per_s": nt / dt, "wall_s": dt,
                    "roofline": prof.roofline(fl, 8 * nt, dt)})

    # ---- config 2: COLA STFT spectrogram of a chirp ----
    f_inst = 1e3 + (200e3 - 1e3) * np.arange(nt) / nt
    chirp = np.sin(2 * np.pi * np.cumsum(f_inst) / fs).astype(np.float32)
    from pyfft_tpu.fftanal import stft_segments
    plan2 = seg.plan_segments(nt, nwins=2048, windowoverlap=0.5)
    win2 = np.hanning(2049)[:-1]

    def stft_run():
        tt, freq, Xfft, pseg = stft_segments(chirp, t, win2, plan2, fs,
                                             onesided=True)
        return _sync(Xfft)

    dt = timeit(stft_run, iters=3)
    results.append({"config": 2, "what": "stft_chirp",
                    "samples_per_s": nt / dt, "wall_s": dt})

    # ---- config 3: FIR band-pass + notch chain (8 channels) ----
    nch = 8
    y = (np.tile(x, (nch, 1))
         + 0.1 * rng.standard_normal((nch, nt))).astype(np.float32)
    bp = ft.filters.firwin(129, [0.05, 0.45], pass_zero=False)
    b_n, a_n = ft.iirnotch(0.2, 30.0)
    notch_fir = ft.filters.iir_to_fir(b_n, a_n, ntaps=129)
    chain_taps = np.convolve(bp, notch_fir)

    def fir_run():
        return _sync(ft.filters.oaconvolve(y, chain_taps, mode="full")
                     [..., :nt])

    dt = timeit(fir_run, iters=3)
    fl = prof.fir_flops(nt, len(chain_taps), nch=nch)
    results.append({"config": 3, "what": "fir_bandpass_notch_8ch",
                    "samples_per_s": nch * nt / dt, "wall_s": dt,
                    "roofline": prof.roofline(fl, 8 * nch * nt, dt)})

    # ---- config 4: Hilbert envelope/phase demod of an AM tone ----
    am = ((1 + 0.5 * np.sin(2 * np.pi * 500 * t))
          * np.sin(2 * np.pi * 50e3 * t)).astype(np.float32)

    def hilb_run():
        z = ft.hilbert(am)
        return _sync(np.abs(z))

    dt = timeit(hilb_run, iters=3)
    results.append({"config": 4, "what": "hilbert_demod",
                    "samples_per_s": nt / dt, "wall_s": dt})

    # ---- config 5: multi-channel cross-coherence + Doppler COG ----
    def xcoh_run():
        out = ft.welch_cross_spectra(x, y, win, plan, fs=fs, onesided=True,
                                     detrend_style=1)
        return _sync(out["Pxy"])

    dt = timeit(xcoh_run, iters=3)
    results.append({"config": 5, "what": "cross_coherence_8ch",
                    "samples_per_s": nch * nt / dt, "wall_s": dt})

    for r in results:
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
