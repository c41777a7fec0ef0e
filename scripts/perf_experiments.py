"""On-chip perf experiments for the v3 fused Welch kernel (headline config).

Sweeps tuning knobs (grid-step unroll, feeder path) and prints wall/call +
MXU utilization for each variant so kernel changes are driven by measured
numbers, not guesses.  Run on the real TPU: `python scripts/perf_experiments.py`.
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
    from pyfft_tpu.ops.pallas_welch3 import v3_dispatched_flops
    from pyfft_tpu.utils import profiling as prof

    on_tpu = jax.default_backend() != "cpu"
    mm_peak = prof.device_peaks()[0]
    rng = np.random.default_rng(0)

    fs = 1e6
    nt = 1 << 24
    nch = 8
    t32 = (np.arange(1 << 23) / fs).astype(np.float32)
    x0 = (np.sin(2 * np.pi * 97e3 * t32)
          + 0.3 * rng.standard_normal(1 << 23)).astype(np.float32)
    x = np.concatenate([x0, x0])
    y = np.tile(x, (nch, 1)) + 0.1 * rng.standard_normal(
        (nch, nt)).astype(np.float32)
    xd = jax.device_put(x)
    yd = jax.device_put(jnp.asarray(y, jnp.float32))

    nwins = 2048
    plan = seg.plan_segments(nt, nwins=nwins, windowoverlap=0.5)
    win = np.hanning(nwins + 1)[:-1]
    s1 = seg.get_s1(win)
    norm = np.float32(1.0 / (s1 ** 2 * seg.get_enbw(fs, s1, seg.get_s2(win))
                             * plan.navr))
    taps = ft.filters.firwin(129, [0.05, 0.45], pass_zero=False)
    fl = v3_dispatched_flops(plan.nwins, plan.noverlap, plan.navr, nch,
                             len(taps))

    @jax.jit
    def chain(xd, yd):
        Pxx, Pyy, Pr, Pi = welch_fir_pallas_fused(
            xd, yd, win, plan.nnyquist, norm, navr=plan.navr,
            nwins=plan.nwins, noverlap=plan.noverlap, taps=taps,
            detrend_style=1, interpret=not on_tpu)
        return jnp.sum(Pxx) + jnp.sum(Pyy) + jnp.sum(Pr)

    baseline = None
    for cap, vmem in [(4, 3 << 20), (8, 8 << 20), (16, 16 << 20),
                      (32, 32 << 20)]:
        pw3._UNROLL_CAP = cap
        pw3._UNROLL_VMEM = vmem
        # new jit cache entry per cap: unroll is folded into the traced fn,
        # but the jit cache key doesn't see the module global -> clear it
        pw3._v3_pipeline.clear_cache()
        chain.clear_cache()
        try:
            dt = timeit(lambda: chain(xd, yd))
        except Exception as e:  # VMEM overflow etc.
            print(f"unroll cap {cap:3d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:500]}", flush=True)
            continue
        util = fl / dt / 1e12 / mm_peak
        if baseline is None:
            baseline = dt
        print(f"unroll cap {cap:3d}: {dt * 1e3:7.2f} ms  "
              f"mxu {100 * util:5.1f}%  speedup {baseline / dt:5.2f}x",
              flush=True)
    pw3._UNROLL_CAP = 4
    pw3._UNROLL_VMEM = 3 << 20


if __name__ == "__main__":
    main()
