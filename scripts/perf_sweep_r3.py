"""Round-3 on-chip sweeps: unroll knobs for the v3 Welch/STFT kernels.

Monkey-patches pallas_welch3._UNROLL_CAP/_UNROLL_VMEM between runs and
re-times the bench configs so tuning is driven by measured wall time.
Run on the real TPU: `python scripts/perf_sweep_r3.py`.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, iters=8, warmup=3):
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
    from pyfft_tpu.ops import pallas_welch3 as pw3
    from pyfft_tpu.ops.pallas_welch import welch_fir_pallas_fused
    from pyfft_tpu.ops.pallas_welch3 import stft_pallas3, v3_dispatched_flops
    from pyfft_tpu.utils import profiling as prof

    on_tpu = jax.default_backend() != "cpu"
    mm_peak = prof.device_peaks()[0]
    rng = np.random.default_rng(0)
    fs = 1e6
    nt = 1 << 23 if on_tpu else 1 << 18
    t = (np.arange(nt) / fs).astype(np.float32)
    x = (np.sin(2 * np.pi * 97e3 * t)
         + 0.3 * rng.standard_normal(nt)).astype(np.float32)
    xd = jax.device_put(x)
    nch = 8
    y = (np.tile(x, (nch, 1))
         + 0.1 * rng.standard_normal((nch, nt))).astype(np.float32)
    yd = jax.device_put(y)

    # headline geometry
    nt_h = 2 * nt
    xd_h = jax.device_put(np.concatenate([x, x]))
    yd_h = jax.device_put(np.concatenate([y, y], axis=1))
    plan_h = seg.plan_segments(nt_h, nwins=2048, windowoverlap=0.5)
    win_h = np.hanning(2049)[:-1]
    taps_h = ft.filters.firwin(129, [0.05, 0.45], pass_zero=False)

    # config 1 geometry (1 channel, nwins=4096)
    plan1 = seg.plan_segments(nt, nwins=4096, windowoverlap=0.5)
    win1 = np.hanning(4097)[:-1]
    y_empty = jnp.zeros((0, nt), jnp.float32)

    # config 2 geometry (STFT)
    plan2 = seg.plan_segments(nt, nwins=2048, windowoverlap=0.5)
    win2 = np.hanning(2049)[:-1]

    def run_headline():
        f = jax.jit(lambda a, b: sum(
            jnp.sum(o) for o in welch_fir_pallas_fused(
                a, b, win_h, plan_h.nnyquist, 1.0, navr=plan_h.navr,
                nwins=plan_h.nwins, noverlap=plan_h.noverlap, taps=taps_h,
                detrend_style=1, interpret=not on_tpu)))
        return timeit(lambda: f(xd_h, yd_h))

    def run_c1():
        f = jax.jit(lambda a: jnp.sum(welch_fir_pallas_fused(
            a, y_empty, win1, plan1.nnyquist, 1.0, navr=plan1.navr,
            nwins=plan1.nwins, noverlap=plan1.noverlap, detrend_style=1,
            interpret=not on_tpu)[0]))
        return timeit(lambda: f(xd))

    def run_c2():
        f = jax.jit(lambda a: (lambda Xr, Xi: jnp.sum(Xr * Xr + Xi * Xi))(
            *stft_pallas3(a, None, win2, 1.0, navr=plan2.navr,
                          nwins=plan2.nwins, noverlap=plan2.noverlap,
                          detrend_style=1, interpret=not on_tpu)))
        return timeit(lambda: f(xd))

    fl_h = v3_dispatched_flops(plan_h.nwins, plan_h.noverlap, plan_h.navr,
                               nch, len(taps_h))
    fl_1 = v3_dispatched_flops(plan1.nwins, plan1.noverlap, plan1.navr, 0, 1)
    fl_2 = v3_dispatched_flops(plan2.nwins, plan2.noverlap, plan2.navr, 1, 1)

    base = (pw3._UNROLL_CAP, pw3._UNROLL_VMEM)
    for cap, vmem_mb in [(4, 3), (8, 6), (8, 12), (16, 12), (16, 24),
                         (2, 3), (32, 24)]:
        pw3._UNROLL_CAP, pw3._UNROLL_VMEM = cap, vmem_mb * 1024 * 1024
        # bust jit caches that captured the old geometry
        pw3._v3_pipeline.clear_cache()
        pw3._v3_stft_pipeline.clear_cache()
        try:
            dt_h = run_headline()
            dt_1 = run_c1()
            dt_2 = run_c2()
            print(f"cap={cap:3d} vmem={vmem_mb:3d}MB | "
                  f"headline {dt_h*1e3:7.2f} ms ({fl_h/dt_h/1e12/mm_peak:5.1%}) | "
                  f"c1 {dt_1*1e3:7.2f} ms ({fl_1/dt_1/1e12/mm_peak:5.1%}) | "
                  f"c2 {dt_2*1e3:7.2f} ms ({fl_2/dt_2/1e12/mm_peak:5.1%})",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"cap={cap} vmem={vmem_mb}MB FAILED: {e}", flush=True)
    pw3._UNROLL_CAP, pw3._UNROLL_VMEM = base


if __name__ == "__main__":
    main()
