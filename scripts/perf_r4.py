"""Round-4 perf experiments on the real chip (one subcommand per run).

Usage: python scripts/perf_r4.py <packed|stft|fir|hilb>
Each subcommand prints compact timing lines; keep invocations short so a
wedged tunnel can be killed without losing other results.
"""
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


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
    which = sys.argv[1] if len(sys.argv) > 1 else "packed"
    if which == "all":
        for w in ("packed", "stft", "fir", "hilb"):
            sys.argv[1:] = [w]
            main()
        return
    import jax
    if os.environ.get("PERF_CPU"):
        # sitecustomize pins JAX_PLATFORMS=axon; only the config API wins
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(HERE, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from pyfft_tpu import segmentation as seg
    from pyfft_tpu.utils import profiling as prof

    on_tpu = jax.default_backend() != "cpu"
    print("device:", jax.devices()[0], flush=True)

    @jax.jit
    def _scal(a):
        return a + 1.0

    floor = timeit(lambda: _scal(jnp.float32(1.0)), iters=16, warmup=4)
    print(f"dispatch floor (jitted scalar add): {floor * 1e3:.3f} ms",
          flush=True)
    mm_peak = prof.device_peaks()[0]
    rng = np.random.default_rng(0)
    fs = 1e6
    nt = 1 << 23 if on_tpu else 1 << 19
    x = (np.sin(2 * np.pi * 97e3 * np.arange(nt) / fs)
         + 0.3 * rng.standard_normal(nt)).astype(np.float32)
    xd = jax.device_put(x)

    if which == "packed":
        from pyfft_tpu.ops.pallas_welch import welch_fir_pallas_fused
        from pyfft_tpu.ops.pallas_welch3 import (
            welch_auto_packed, v3_dispatched_flops, packed_parts_geometry,
            _packed_auto_pipeline, _pack_parts)
        nwins = 4096
        plan = seg.plan_segments(nt, nwins=nwins, windowoverlap=0.5)
        win = np.hanning(nwins + 1)[:-1]
        s1 = seg.get_s1(win)
        norm = np.float32(1.0 / (s1 ** 2
                                 * seg.get_enbw(fs, s1, seg.get_s2(win))
                                 * plan.navr))
        y0 = jnp.zeros((0, nt), jnp.float32)

        @jax.jit
        def plain(xd):
            Pxx, _, _, _ = welch_fir_pallas_fused(
                xd, y0, win, plan.nnyquist, norm, navr=plan.navr,
                nwins=plan.nwins, noverlap=plan.noverlap, detrend_style=1,
                interpret=not on_tpu)
            return jnp.sum(Pxx)

        dt = timeit(lambda: plain(xd))
        fl = v3_dispatched_flops(plan.nwins, plan.noverlap, plan.navr, 0, 1)
        print(f"plain C=1: {dt * 1e3:.3f} ms  {nt / dt:.3e} samp/s  "
              f"util {fl / dt / 1e12 / mm_peak:.3f}", flush=True)

        for parts in (16,):
            geom = packed_parts_geometry(plan.navr, plan.nwins,
                                         plan.noverlap, parts)
            if geom is None:
                print(f"parts={parts}: not applicable", flush=True)
                continue

            @jax.jit
            def packed(xd, parts=parts):
                return jnp.sum(welch_auto_packed(
                    x=xd, win=win, nfreq=plan.nnyquist, norm=norm,
                    navr=plan.navr, nwins=plan.nwins,
                    noverlap=plan.noverlap, detrend_style=1,
                    interpret=not on_tpu, parts=parts))

            dt_p = timeit(lambda: packed(xd))
            P, q, Lp = geom
            print(f"packed P={P} q={q}: {dt_p * 1e3:.3f} ms  "
                  f"{nt / dt_p:.3e} samp/s", flush=True)

            # isolate: gather only
            @jax.jit
            def gather_only(xd, geom=geom):
                P, q, Lp = geom
                mean = jnp.sum(xd) / nt
                parr = _pack_parts(xd, mean, plan.navr, plan.nwins,
                                   plan.noverlap, P, q, Lp)
                return jnp.sum(parr)

            dt_g = timeit(lambda: gather_only(xd))
            print(f"  gather only: {dt_g * 1e3:.3f} ms", flush=True)

        # paired packing at nch=1 (x vs y cross) vs plain C=2
        from pyfft_tpu.ops.pallas_welch3 import (welch_pair_packed,
                                                 welch_fir_pallas3,
                                                 packed_pair_geometry)
        y1 = jax.device_put((0.7 * x + 0.3 * rng.standard_normal(nt)
                             ).astype(np.float32))

        @jax.jit
        def plain_c2(xd, y1):
            out = welch_fir_pallas3(xd, y1[None], win, plan.nnyquist, norm,
                                    navr=plan.navr, nwins=plan.nwins,
                                    noverlap=plan.noverlap, detrend_style=1,
                                    interpret=not on_tpu)
            return sum(jnp.sum(o) for o in out)

        dt_c2 = timeit(lambda: plain_c2(xd, y1))
        print(f"plain C=2 cross: {dt_c2 * 1e3:.3f} ms", flush=True)
        if packed_pair_geometry(plan.navr, plan.nwins, plan.noverlap):

            @jax.jit
            def paired(xd, y1):
                out = welch_pair_packed(xd, y1, win, plan.nnyquist, norm,
                                        navr=plan.navr, nwins=plan.nwins,
                                        noverlap=plan.noverlap,
                                        detrend_style=1,
                                        interpret=not on_tpu)
                return sum(jnp.sum(o) for o in out)

            dt_pp = timeit(lambda: paired(xd, y1))
            print(f"pair-packed cross: {dt_pp * 1e3:.3f} ms", flush=True)

    elif which == "stft":
        from pyfft_tpu.ops.pallas_welch3 import (stft_pallas3,
                                                 v3_dispatched_flops)
        plan = seg.plan_segments(nt, nwins=2048, windowoverlap=0.5)
        win2 = np.hanning(2049)[:-1]

        @jax.jit
        def stft_run(xd):
            Xr, Xi = stft_pallas3(xd, None, win2, 1.0, navr=plan.navr,
                                  nwins=plan.nwins, noverlap=plan.noverlap,
                                  detrend_style=1, interpret=not on_tpu)
            return jnp.sum(Xr * Xr + Xi * Xi)

        dt = timeit(lambda: stft_run(xd))
        out_b = 8.0 * plan.navr * plan.nfft
        fl = v3_dispatched_flops(plan.nwins, plan.noverlap, plan.navr, 1, 1)
        print(f"stft(natural): {dt * 1e3:.3f} ms  {nt / dt:.3e} samp/s  "
              f"out {out_b / 1e6:.0f} MB  wr {out_b / dt / 1e9:.0f} GB/s  "
              f"util {fl / dt / 1e12 / mm_peak:.3f}", flush=True)

        # legacy layout + XLA transpose epilogue, for comparison
        from pyfft_tpu.ops.pallas_welch3 import _v3_stft_pipeline
        import jax.numpy as jnp2
        wk = tuple(np.asarray(win2, np.float64).tolist())

        @jax.jit
        def stft_legacy(xd):
            Xr, Xi = _v3_stft_pipeline(
                xd, jnp2.zeros((0, nt), jnp2.float32), 1.0,
                navr=plan.navr, nwins=plan.nwins, noverlap=plan.noverlap,
                win_key=wk, detrend_style=1, kprec="bf16x3",
                interpret=not on_tpu, natural=False)
            return jnp2.sum(Xr * Xr + Xi * Xi)

        dt_l = timeit(lambda: stft_legacy(xd))
        print(f"stft(legacy+xla-T): {dt_l * 1e3:.3f} ms  "
              f"wr {out_b / dt_l / 1e9:.0f} GB/s", flush=True)

    elif which == "fir":
        from pyfft_tpu.ops.pallas_fir import fir_pallas
        import pyfft_tpu as ft
        nch = 8
        y = (np.tile(x, (nch, 1))
             + 0.1 * rng.standard_normal((nch, nt))).astype(np.float32)
        yd = jax.device_put(y)
        bp = ft.filters.firwin(129, [0.05, 0.45], pass_zero=False)
        b_n, a_n = ft.iirnotch(0.2, 30.0)
        taps = np.convolve(bp, ft.filters.iir_to_fir(b_n, a_n, ntaps=129))

        @jax.jit
        def run(yd):
            return jnp.sum(fir_pallas(yd, taps, interpret=not on_tpu))

        dt = timeit(lambda: run(yd))
        bb = 8.0 * nch * nt
        print(f"fir ntaps={len(taps)}: {dt * 1e3:.3f} ms  "
              f"{nch * nt / dt:.3e} samp/s  {bb / dt / 1e9:.0f} GB/s",
              flush=True)
        for br in (1024, 256):

            @jax.jit
            def run_br(yd, br=br):
                return jnp.sum(fir_pallas(yd, taps, block_rows=br,
                                          interpret=not on_tpu))

            dtb = timeit(lambda: run_br(yd))
            print(f"fir block_rows={br}: {dtb * 1e3:.3f} ms  "
                  f"{bb / dtb / 1e9:.0f} GB/s", flush=True)
            break                    # one alternative blocking is enough

    elif which == "hilb":
        from pyfft_tpu.hilbert import (_envelope_phase_dev,
                                       analytic_flops_bytes)
        am = ((1 + 0.5 * np.sin(2 * np.pi * 500 * np.arange(nt) / fs))
              * np.sin(2 * np.pi * 50e3 * np.arange(nt) / fs)
              ).astype(np.float32)
        amd = jax.device_put(am)

        @jax.jit
        def run(amd):
            env, ph = _envelope_phase_dev(amd, nfft=nt, axis=-1)
            return jnp.sum(env) + jnp.sum(ph)

        dt = timeit(lambda: run(amd))
        fl, bb = analytic_flops_bytes(nt)
        print(f"hilbert: {dt * 1e3:.3f} ms  {nt / dt:.3e} samp/s  "
              f"util {fl / dt / 1e12 / mm_peak:.3f}  "
              f"hbm {bb / dt / 1e9:.0f} GB/s", flush=True)

        @jax.jit
        def run_slab(amd):
            env, ph = _envelope_phase_dev(amd, nfft=nt, axis=-1, slab=True)
            return jnp.sum(env) + jnp.sum(ph)

        try:
            dts = timeit(lambda: run_slab(amd))
            print(f"hilbert slab: {dts * 1e3:.3f} ms  {nt / dts:.3e} samp/s",
                  flush=True)
        except Exception as e:
            print(f"hilbert slab FAILED: {type(e).__name__}: {e}",
                  flush=True)
        # envelope-only variant cost (is arctan2 the bottleneck?)

        @jax.jit
        def run_env(amd):
            from pyfft_tpu.ops.mxu_fft import balanced3_factorization
            from pyfft_tpu.hilbert import _analytic_factored
            fac = balanced3_factorization(nt)
            zr, zi = _analytic_factored(amd, nfft=nt, factors=fac,
                                        prec="bf16x3")
            return jnp.sum(jnp.sqrt(zr * zr + zi * zi))

        dt2 = timeit(lambda: run_env(amd))
        print(f"hilbert env-only: {dt2 * 1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
