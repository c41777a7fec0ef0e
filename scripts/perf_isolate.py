"""Isolate the headline chain's cost components on the real TPU.

Measures: pure-matmul MXU ceiling through this runtime, the FIR feeder
alone (identity and real taps), and the full fused chain with/without
taps — so welch-kernel time = chain(no taps) - feeder(identity).
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
    from pyfft_tpu.ops.pallas_welch import welch_fir_pallas_fused
    from pyfft_tpu.ops.pallas_fir import fir_transpose_pallas
    from pyfft_tpu.ops.pallas_welch3 import v3_dispatched_flops
    from pyfft_tpu.utils import profiling as prof

    on_tpu = jax.default_backend() != "cpu"
    mm_peak = prof.device_peaks()[0]
    rng = np.random.default_rng(0)

    # ---- pure matmul ceiling (XLA, bf16) ----
    A = jax.device_put(jnp.asarray(
        rng.standard_normal((4096, 4096)), jnp.bfloat16))
    B = jax.device_put(jnp.asarray(
        rng.standard_normal((4096, 4096)), jnp.bfloat16))

    @jax.jit
    def mm(A, B):
        C = A
        for _ in range(8):
            C = jnp.dot(C, B, preferred_element_type=jnp.bfloat16)
        return jnp.sum(C.astype(jnp.float32))

    dt = timeit(lambda: mm(A, B))
    fl = 8 * 2 * 4096.0 ** 3
    print(f"matmul ceiling : {dt*1e3:7.2f} ms  {fl/dt/1e12:6.1f} TF/s "
          f"({100*fl/dt/1e12/mm_peak:.0f}% of book peak)", flush=True)

    # ---- headline shapes ----
    fs = 1e6
    nt = 1 << 24
    nch = 8
    x = rng.standard_normal(nt).astype(np.float32)
    y = rng.standard_normal((nch, nt)).astype(np.float32)
    xd = jax.device_put(x)
    yd = jax.device_put(y)
    nwins = 2048
    plan = seg.plan_segments(nt, nwins=nwins, windowoverlap=0.5)
    win = np.hanning(nwins + 1)[:-1]
    taps = np.asarray(ft.filters.firwin(129, [0.05, 0.45],
                                        pass_zero=False))
    blk = 64
    nchunks = -(-plan.navr // 8)
    unroll = 4
    nb = -(-nchunks // unroll)
    nrows = -(-((nb * unroll + 1) * blk) // 512) * 512

    @jax.jit
    def feeder_id(xd, yd):
        return jnp.sum(fir_transpose_pallas(xd, yd, (1.0,), nrows,
                                            interpret=not on_tpu))

    @jax.jit
    def feeder_fir(xd, yd):
        return jnp.sum(fir_transpose_pallas(xd, yd, tuple(taps), nrows,
                                            interpret=not on_tpu))

    def chain(taps_):
        @jax.jit
        def run(xd, yd):
            Pxx, Pyy, Pr, Pi = welch_fir_pallas_fused(
                xd, yd, win, plan.nnyquist, np.float32(1.0 / plan.navr),
                navr=plan.navr, nwins=plan.nwins, noverlap=plan.noverlap,
                taps=taps_, detrend_style=1, interpret=not on_tpu)
            return jnp.sum(Pxx) + jnp.sum(Pyy) + jnp.sum(Pr)
        return run

    t_fid = timeit(lambda: feeder_id(xd, yd))
    t_ffir = timeit(lambda: feeder_fir(xd, yd))
    run_nt = chain(None)
    t_chain0 = timeit(lambda: run_nt(xd, yd))
    run_t = chain(taps)
    t_chain1 = timeit(lambda: run_t(xd, yd))

    C = nch + 1
    gb = 4 * (C * nt + nrows * C * 128) / 1e9
    print(f"feeder identity: {t_fid*1e3:7.2f} ms  "
          f"{gb/t_fid:5.0f} GB/s eff", flush=True)
    print(f"feeder 129taps : {t_ffir*1e3:7.2f} ms", flush=True)
    print(f"chain no-taps  : {t_chain0*1e3:7.2f} ms  "
          f"welch-only ~ {(t_chain0-t_fid)*1e3:6.2f} ms", flush=True)
    fl_w = v3_dispatched_flops(plan.nwins, plan.noverlap, plan.navr, nch, 0)
    print(f"  welch-only mxu ~ "
          f"{100*fl_w/( (t_chain0-t_fid))/1e12/mm_peak:.0f}%", flush=True)
    print(f"chain 129taps  : {t_chain1*1e3:7.2f} ms", flush=True)

    # ---- PP overlap record (real hardware) ----
    r = prof.measure_pipeline_overlap(interpret=not on_tpu)
    print("pipeline overlap:", {k: round(v, 4) for k, v in r.items()},
          flush=True)


if __name__ == "__main__":
    main()
