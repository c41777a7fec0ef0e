"""BASELINE.json's five configs, measured on the current device.

Prints one JSON line per config: samples/s, wall time, and a roofline
fraction where the FLOP model applies.  ``python scripts/bench_configs.py``
(on TPU under the driver; on CPU it still runs, numbers are just CPU
numbers).

Synchronization is via an on-device scalar checksum (one float crosses
the wire per call): the remote-TPU tunnel in this environment moves
device->host data at ~30 MB/s, so timing ``np.asarray(big_result)``
would measure the tunnel, not the framework.  Each config notes the
result size a real deployment would DMA out.
"""
import json
import time

import numpy as np


def timeit(fn, iters=10, warmup=3):
    for _ in range(warmup):
        r = fn()
    float(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    float(r)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    import pyfft_tpu as ft
    from pyfft_tpu import segmentation as seg
    from pyfft_tpu.spectral import resolve_fft_backend
    from pyfft_tpu.utils import profiling as prof

    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind} backend={jax.default_backend()}",
          flush=True)
    on_tpu = jax.default_backend() != "cpu"
    rng = np.random.default_rng(0)
    results = []

    fs, nt = 1e6, 1 << 22
    t = (np.arange(nt) / fs).astype(np.float32)
    x = (np.sin(2 * np.pi * 97e3 * t)
         + 0.3 * rng.standard_normal(nt)).astype(np.float32)
    xd = jax.device_put(x)

    # ---- config 1: single-channel Welch PSD (Hann, 50%) ----
    nwins = 4096
    plan = seg.plan_segments(nt, nwins=nwins, windowoverlap=0.5)
    win = np.hanning(nwins + 1)[:-1].astype(np.float32)
    s1 = seg.get_s1(win)
    norm = np.float32(1.0 / (s1 ** 2 * seg.get_enbw(fs, s1, seg.get_s2(win))
                             * plan.navr))

    from pyfft_tpu.ops.pallas_welch import (welch_fir_pallas_fused,
                                            pallas_welch2_applicable)
    assert pallas_welch2_applicable(plan.nwins, plan.noverlap, plan.navr, 1)

    @jax.jit
    def welch1(xd):
        Pxx, _, _, _ = welch_fir_pallas_fused(
            xd, xd[None], win, plan.nnyquist, norm, navr=plan.navr,
            nwins=plan.nwins, noverlap=plan.noverlap, detrend_style=1,
            interpret=not on_tpu)
        return jnp.sum(Pxx)

    dt = timeit(lambda: welch1(xd))
    fl = prof.welch_flops(plan.navr, nwins, nch=1)
    results.append({"config": 1, "what": "welch_psd_1ch",
                    "samples_per_s": nt / dt, "wall_s": dt,
                    "result_bytes": 4 * plan.nnyquist,
                    "roofline": prof.roofline(fl, 8 * nt, dt)})

    # ---- config 2: COLA STFT spectrogram of a chirp ----
    f_inst = 1e3 + (200e3 - 1e3) * np.arange(nt) / nt
    chirp = (np.sin(2 * np.pi * np.cumsum(f_inst) / fs)).astype(np.float32)
    from pyfft_tpu.fftanal import _stft_core_mxu
    plan2 = seg.plan_segments(nt, nwins=2048, windowoverlap=0.5)
    win2 = np.hanning(2049)[:-1]
    s1_2 = seg.get_s1(win2)
    s2_2 = seg.get_s2(win2)
    enbw2 = seg.get_enbw(fs, s1_2, s2_2)
    cd = jax.device_put(chirp)
    td = jax.device_put(t)

    @jax.jit
    def stft_run(cd, td):
        tt, Xr, Xi, pseg = _stft_core_mxu(
            cd, None, td, jnp.asarray(win2), jnp.asarray(s1_2),
            jnp.asarray(s2_2), jnp.asarray(np.sqrt(enbw2)),
            navr=plan2.navr, nwins=plan2.nwins, noverlap=plan2.noverlap,
            nfft=plan2.nfft, nnyquist=plan2.nnyquist, onesided=True,
            detrend_style=1, detrendwin=False)
        return jnp.sum(Xr) + jnp.sum(Xi) + jnp.sum(pseg)

    dt = timeit(lambda: stft_run(cd, td))
    results.append({"config": 2, "what": "stft_chirp",
                    "samples_per_s": nt / dt, "wall_s": dt,
                    "result_bytes": 12 * plan2.navr * plan2.nnyquist})

    # ---- config 3: FIR band-pass + notch chain (8 channels) ----
    nch = 8
    y = (np.tile(x, (nch, 1))
         + 0.1 * rng.standard_normal((nch, nt))).astype(np.float32)
    yd = jax.device_put(y)
    bp = ft.filters.firwin(129, [0.05, 0.45], pass_zero=False)
    b_n, a_n = ft.iirnotch(0.2, 30.0)
    notch_fir = ft.filters.iir_to_fir(b_n, a_n, ntaps=129)
    chain_taps = np.convolve(bp, notch_fir)

    from pyfft_tpu.ops.pallas_fir import fir_pallas

    @jax.jit
    def fir_run(yd):
        return jnp.sum(fir_pallas(yd, chain_taps, interpret=not on_tpu))

    dt = timeit(lambda: fir_run(yd))
    fl = prof.fir_flops(nt, len(chain_taps), nch=nch)
    results.append({"config": 3, "what": "fir_bandpass_notch_8ch",
                    "samples_per_s": nch * nt / dt, "wall_s": dt,
                    "result_bytes": 4 * nch * nt,
                    "roofline": prof.roofline(fl, 8 * nch * nt, dt)})

    # ---- config 4: Hilbert envelope/phase demod of an AM tone ----
    am = ((1 + 0.5 * np.sin(2 * np.pi * 500 * t))
          * np.sin(2 * np.pi * 50e3 * t)).astype(np.float32)
    amd = jax.device_put(am)
    from pyfft_tpu.hilbert import _envelope_phase_dev

    @jax.jit
    def hilb_run(amd):
        env, ph = _envelope_phase_dev(amd, nfft=nt, axis=-1)
        return jnp.sum(env) + jnp.sum(ph)

    dt = timeit(lambda: hilb_run(amd))
    results.append({"config": 4, "what": "hilbert_demod",
                    "samples_per_s": nt / dt, "wall_s": dt,
                    "result_bytes": 8 * nt})

    # ---- config 5: multi-channel cross-coherence + Doppler COG ----
    assert pallas_welch2_applicable(plan.nwins, plan.noverlap, plan.navr,
                                    nch)

    @jax.jit
    def xcoh_run(xd, yd):
        Pxx, Pyy, Pr, Pi = welch_fir_pallas_fused(
            xd, yd, win, plan.nnyquist, norm, navr=plan.navr,
            nwins=plan.nwins, noverlap=plan.noverlap, detrend_style=1,
            interpret=not on_tpu)
        # mean-squared coherence and the PSD-weighted COG frequency, all
        # on-device (reference Cxy_Cxy2 fft_analysis.py:1662, cog
        # Doppler.py:43)
        C2 = (Pr * Pr + Pi * Pi) / (Pxx[None] * Pyy)
        f = jnp.arange(plan.nnyquist, dtype=jnp.float32)
        cog = jnp.sum(Pyy * f, axis=-1) / jnp.sum(Pyy, axis=-1)
        return jnp.sum(C2) + jnp.sum(cog)

    dt = timeit(lambda: xcoh_run(xd, yd))
    fl = prof.welch_flops(plan.navr, nwins, nch=nch + 1)
    results.append({"config": 5, "what": "cross_coherence_8ch",
                    "samples_per_s": nch * nt / dt, "wall_s": dt,
                    "result_bytes": 4 * (2 * nch + 1) * plan.nnyquist,
                    "roofline": prof.roofline(fl, 8 * nch * nt, dt)})

    for r in results:
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
