"""Benchmark: the five BASELINE configs + the headline Welch+FIR chain.

Measured on the default JAX device (the real TPU chip under the driver).
For every config this reports samples/s and, where the kernel tier has an
exact dispatched-FLOP model, the achieved fraction of the device's bf16
matmul peak ("mxu_util" — the MFU-style number BASELINE.json asks for)
alongside the algorithmic 5*N*log2(N) roofline fraction.

Artifacts:
- prints ONE JSON line (the headline chain metric) for the driver:
  {"metric": "...", "value": N, "unit": "samples/s/chip", "vs_baseline": R}
- writes all per-config rows to BENCH_FULL.json
- rewrites the measured table in BASELINE.md between the
  ``<!-- measured:begin -->`` / ``<!-- measured:end -->`` markers.

Timing notes: the remote-TPU tunnel charges ~1 ms of host overhead per
dispatch and ~30 MB/s for device->host copies, so workloads are sized to
make one dispatch many milliseconds of device work, and synchronization
happens through a scalar checksum (one float crosses the wire).
"""
import json
import os
import time

import numpy as np


def timeit(fn, iters=8, warmup=3, reps=2):
    """Best-of-``reps`` mean wall time (the remote tunnel's per-dispatch
    latency drifts by milliseconds between runs; min-of-means rejects
    transient stalls)."""
    best = float("inf")
    for _ in range(reps):
        for _ in range(warmup):
            r = fn()
        float(r)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        float(r)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def _repeat_jit(f, n):
    """jit of ``f`` applied ``n`` times inside a ``fori_loop``, so ONE
    dispatch carries ``n`` x the device work at constant compile cost.

    The inputs are loop-CARRIED through an ``optimization_barrier``: the
    barrier in the carry chain stops XLA's while-loop invariant code
    motion from proving the body invariant and hoisting it (a barrier
    merely *tied* to the loop counter gets split per-operand and the
    compute still hoists — verified on-chip: timings went flat in n), and
    unlike an additive ``big + eps`` perturbation it moves no bytes, so
    bandwidth-bound kernels are not inflated by input-copy traffic.
    Linearity of t(n) was verified on-chip (n = 1/5/15)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def g(*arrs):
        def body(_, carry):
            acc, arrs_c = carry
            arrs_b = lax.optimization_barrier(arrs_c)
            return (acc + f(*arrs_b), arrs_b)
        acc, _ = lax.fori_loop(0, n, body,
                               (jnp.float32(0.0), tuple(arrs)))
        return acc
    return g


def measure(f, *arrs, iters=4, nrep=9, target_s=0.12):
    """(wall_s, device_s) for one application of ``f(*arrs) -> scalar``.

    wall is the honest per-call time through the runtime.  device is
    ``t_n / n`` for an in-jit ``fori_loop`` n-repeat with ``n`` scaled so
    one dispatch carries ~``target_s`` of device work: the remote tunnel's
    per-dispatch cost is both large and *unstable* (2-7 ms between runs),
    so differencing two separately-timed programs is noise; the amortized
    single-program estimate is a strict upper bound biased by only
    rtt/n (<5%).  Falls back to wall when the repeat variant fails to
    compile (e.g. VMEM pressure)."""
    g1 = _repeat_jit(f, 1)
    t1 = timeit(lambda: g1(*arrs), iters=iters, reps=3)
    try:
        gn = _repeat_jit(f, nrep)
        tn = timeit(lambda: gn(*arrs), iters=2, warmup=1)
        dev = tn / nrep
        n2 = int(min(max(nrep, round(target_s / max(dev, 1e-5))), 400))
        if n2 > 2 * nrep:
            # a failed scale-up (e.g. VMEM pressure at large n2) must not
            # discard the already-valid tn/nrep estimate
            try:
                gn2 = _repeat_jit(f, n2)
                tn2 = timeit(lambda: gn2(*arrs), iters=2, warmup=1)
                dev = tn2 / n2
            except Exception:
                pass
    except Exception:
        dev = t1
    return t1, min(dev, t1)


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


def run_configs():
    """Measure the five BASELINE configs; returns (rows, headline)."""
    import jax
    import jax.numpy as jnp
    import pyfft_tpu as ft
    from pyfft_tpu import segmentation as seg
    from pyfft_tpu.ops.pallas_welch import (welch_fir_pallas_fused,
                                            pallas_welch2_applicable)
    from pyfft_tpu.ops.pallas_welch3 import v3_dispatched_flops
    from pyfft_tpu.ops.pallas_fir import fir_pallas
    from pyfft_tpu.utils import profiling as prof

    dev = jax.devices()[0]
    on_tpu = jax.default_backend() != "cpu"
    kind = getattr(dev, "device_kind", "cpu")
    mm_peak = prof.device_peaks()[0]
    rng = np.random.default_rng(0)
    rows = []

    # fixed per-call dispatch cost of this runtime (the remote tunnel adds
    # ~1.5 ms to EVERY call — measured with a jitted scalar add).  Reported
    # per row as the overhead-corrected device utilization next to the
    # honest wall-clock numbers.
    @jax.jit
    def _scal(a):
        return a + 1.0

    dispatch_s = timeit(lambda: _scal(jnp.float32(1.0)), iters=16, warmup=4)

    fs = 1e6
    nt = 1 << 24 if on_tpu else 1 << 19
    t = (np.arange(nt) / fs).astype(np.float32)
    x = (np.sin(2 * np.pi * 97e3 * t)
         + 0.3 * rng.standard_normal(nt)).astype(np.float32)
    xd = jax.device_put(x)

    def mfu(flops, dt):
        return round(flops / dt / 1e12 / mm_peak, 4)

    def finish(row, fl=None, bb=None):
        """Attach device-side rates (from repeat differencing) to a row."""
        dt = row["wall_s"]
        dev = row.get("device_s", dt)
        row["samples_per_s_device"] = round(
            row["samples_per_s"] * dt / dev, 1)
        if fl:
            row["mxu_util_device"] = mfu(fl, dev)
        if bb:
            row["hbm_gbs_device"] = round(bb / dev / 1e9, 1)
        rows.append(row)

    # achievable HBM streaming ceiling through this runtime, measured the
    # same way the rows are (device-differenced elementwise pass over 256MB)
    import jax.numpy as _jnp
    big = jax.device_put(np.zeros((1 << 26,), np.float32))
    _, ceil_dev = measure(lambda a: _jnp.sum(a * 1.000001 + 1.0), big)
    hbm_ceiling_gbs = round(4.0 * big.size / ceil_dev / 1e9, 1)
    del big

    # ---- config 1: single-channel Welch PSD (Hann, 50% overlap) --------- #
    nwins = 4096
    plan1 = seg.plan_segments(nt, nwins=nwins, windowoverlap=0.5)
    win1 = np.hanning(nwins + 1)[:-1]
    s1 = seg.get_s1(win1)
    norm1 = np.float32(1.0 / (s1 ** 2
                              * seg.get_enbw(fs, s1, seg.get_s2(win1))
                              * plan1.navr))
    assert pallas_welch2_applicable(plan1.nwins, plan1.noverlap, plan1.navr, 1)
    y_empty = jnp.zeros((0, nt), jnp.float32)

    def welch1(xd):
        # auto-PSD only: empty channel set -> C=1, no duplicated channel
        Pxx, _, _, _ = welch_fir_pallas_fused(
            xd, y_empty, win1, plan1.nnyquist, norm1, navr=plan1.navr,
            nwins=plan1.nwins, noverlap=plan1.noverlap, detrend_style=1,
            interpret=not on_tpu)
        return jnp.sum(Pxx)

    dt_plain, dev_plain = measure(welch1, xd)
    # the virtual-channel packed variant (lane-filled C=P kernel): measure
    # both and keep the better — the winner depends on how the per-chunk
    # fixed costs compare to the packing gather on this chip/runtime
    from pyfft_tpu.ops.pallas_welch3 import (welch_auto_packed,
                                             packed_parts_geometry)
    dt_packed = dev_packed = err_packed = None
    if packed_parts_geometry(plan1.navr, plan1.nwins, plan1.noverlap):

        def welch1_packed(xd):
            return jnp.sum(welch_auto_packed(
                x=xd, win=win1, nfreq=plan1.nnyquist, norm=norm1,
                navr=plan1.navr, nwins=plan1.nwins,
                noverlap=plan1.noverlap, detrend_style=1,
                interpret=not on_tpu))

        try:
            dt_packed, dev_packed = measure(welch1_packed, xd)
        except Exception as e:   # record WHY, never a silent null
            dt_packed = dev_packed = None
            err_packed = f"{type(e).__name__}: {e}"[:300]
    if dt_packed is not None and dt_packed < dt_plain:
        dt, dev, variant = dt_packed, dev_packed, "packed"
    else:
        dt, dev, variant = dt_plain, dev_plain, "plain"
    fl = v3_dispatched_flops(plan1.nwins, plan1.noverlap, plan1.navr, 0, 1)
    algo = prof.welch_flops(plan1.navr, nwins, nch=1)
    row1 = {"config": 1, "what": "welch_psd_1ch_hann50",
            "samples_per_s": round(nt / dt, 1), "wall_s": dt,
            "device_s": dev,
            "mxu_util": mfu(fl, dt),
            "algo_tflops": round(algo / dt / 1e12, 3),
            "variant": variant, "wall_plain_s": dt_plain,
            "wall_packed_s": dt_packed,
            "result_bytes": 4 * plan1.nnyquist}
    if err_packed:
        row1["variant_error"] = err_packed
    finish(row1, fl=fl)

    # ---- config 2: COLA STFT spectrogram of a chirp --------------------- #
    from pyfft_tpu.ops.pallas_welch3 import stft_pallas3
    f_inst = 1e3 + (200e3 - 1e3) * np.arange(nt) / nt
    chirp = (np.sin(2 * np.pi * np.cumsum(f_inst) / fs)).astype(np.float32)
    plan2 = seg.plan_segments(nt, nwins=2048, windowoverlap=0.5)
    win2 = np.hanning(2049)[:-1]
    cd = jax.device_put(chirp)

    def stft_run(cd):
        Xr, Xi = stft_pallas3(cd, None, win2, 1.0, navr=plan2.navr,
                              nwins=plan2.nwins, noverlap=plan2.noverlap,
                              detrend_style=1, interpret=not on_tpu)
        return jnp.sum(Xr * Xr + Xi * Xi)

    dt, dev = measure(stft_run, cd)
    fl2 = v3_dispatched_flops(plan2.nwins, plan2.noverlap, plan2.navr, 1, 1)
    # STFT keeps every segment: the (navr, nfft) re+im result dominates the
    # traffic (kernel store + one natural-order relayout pass = 3 passes
    # over the result), so the honest roofline is HBM bandwidth
    stft_bytes = 3 * 8.0 * plan2.navr * plan2.nfft + 4.0 * nt
    finish({"config": 2, "what": "stft_chirp_cola",
            "samples_per_s": round(nt / dt, 1), "wall_s": dt,
            "device_s": dev,
            "mxu_util": mfu(fl2, dt),
            "hbm_gbs": round(stft_bytes / dt / 1e9, 1),
            "roofline": "hbm",
            "result_bytes": 8 * plan2.navr * plan2.nwins},
           fl=fl2, bb=stft_bytes)

    # ---- config 3: FIR band-pass + notch chain, 8 channels -------------- #
    nch = 8
    y = (np.tile(x, (nch, 1))
         + 0.1 * rng.standard_normal((nch, nt))).astype(np.float32)
    yd = jax.device_put(y)
    bp = ft.filters.firwin(129, [0.05, 0.45], pass_zero=False)
    b_n, a_n = ft.iirnotch(0.2, 30.0)
    notch_fir = ft.filters.iir_to_fir(b_n, a_n, ntaps=129)
    chain_taps = np.convolve(bp, notch_fir)

    def fir_run(yd):
        return jnp.sum(fir_pallas(yd, chain_taps, interpret=not on_tpu))

    dt_r2, dev_r2 = measure(fir_run, yd)
    # tiled-layout end-to-end: the DOCUMENTED chain entry (tile_rows once
    # per pipeline, fir_pallas_tiled in between, untile once at the end) —
    # no per-call API-boundary retiling pass, on-device halo gather
    # included.  This is the rate a filtering pipeline actually sees; the
    # rank-2 single-call wall (which pays the physical
    # (nch, nt) -> (nch, nt/128, 128) retile both ways) is kept alongside.
    from pyfft_tpu.ops.pallas_fir import fir_pallas_tiled, tile_rows
    dt_tiled = dev_tiled = err_tiled = None
    try:
        yr3 = jax.device_put(np.asarray(tile_rows(y)[0]))

        def fir_tiled(yr3):
            return jnp.sum(fir_pallas_tiled(yr3, chain_taps,
                                            interpret=not on_tpu))

        dt_tiled, dev_tiled = measure(fir_tiled, yr3)
    except Exception as e:   # record WHY, never a silent null
        err_tiled = f"{type(e).__name__}: {e}"[:300]
    if dt_tiled is not None and dt_tiled < dt_r2:
        dt, dev, variant3 = dt_tiled, dev_tiled, "tiled"
    else:
        dt, dev, variant3 = dt_r2, dev_r2, "rank2"
    m3 = -(-(len(chain_taps) - 1) // 128)
    fl = 2.0 * 3 * (m3 + 1) * nch * nt * 128        # bf16x3 banded matmuls
    row3 = {"config": 3, "what": "fir_bandpass_notch_8ch",
            "samples_per_s": round(nch * nt / dt, 1), "wall_s": dt,
            "device_s": dev,
            "mxu_util": mfu(fl, dt),
            "hbm_gbs": round(8 * nch * nt / dt / 1e9, 1),
            "roofline": "hbm", "variant": variant3,
            "wall_rank2_s": dt_r2, "wall_tiled_s": dt_tiled,
            "result_bytes": 4 * nch * nt}
    if dev_tiled:
        row3["kernel_gbs"] = round(8.0 * nch * nt / dev_tiled / 1e9, 1)
    if err_tiled:
        row3["variant_error"] = err_tiled
    finish(row3, fl=fl, bb=8.0 * nch * nt)

    # ---- config 4: Hilbert envelope/phase demodulation ------------------ #
    am = ((1 + 0.5 * np.sin(2 * np.pi * 500 * t))
          * np.sin(2 * np.pi * 50e3 * t)).astype(np.float32)
    amd = jax.device_put(am)
    from pyfft_tpu.hilbert import _envelope_phase_dev

    def hilb_run(amd):
        env, ph = _envelope_phase_dev(amd, nfft=nt, axis=-1)
        return jnp.sum(env) + jnp.sum(ph)

    dt, dev = measure(hilb_run, amd)
    # slab-fused middle section: measure too, keep the winner (falls back
    # cleanly if Mosaic rejects the kernel on this toolchain)
    dt_slab = dev_slab = err_slab = None
    if on_tpu:
        def hilb_slab(amd):
            env, ph = _envelope_phase_dev(amd, nfft=nt, axis=-1, slab=True)
            return jnp.sum(env) + jnp.sum(ph)

        try:
            dt_slab, dev_slab = measure(hilb_slab, amd)
        except Exception as e:   # a Mosaic rejection must be VISIBLE in
            dt_slab = dev_slab = None   # the row, not a silent null
            err_slab = f"{type(e).__name__}: {e}"[:300]
    variant4 = "slab" if dt_slab is not None and dt_slab < dt else "xla-mid"
    dt4 = dt if dt_slab is None else min(dt, dt_slab)
    dev4 = dev if variant4 == "xla-mid" else dev_slab
    from pyfft_tpu.hilbert import analytic_flops_bytes
    fl4, bb4 = analytic_flops_bytes(nt, variant=variant4)
    # the slab variant strips 12 of the 28 byte-passes, which flips the
    # governing roofline from HBM to the MXU at the bench size (565 GFLOP
    # dispatched vs ~1 GB moved — see BASELINE.md round-5 note)
    row4 = {"config": 4, "what": "hilbert_demod",
            "samples_per_s": round(nt / dt4, 1), "wall_s": dt4,
            "device_s": dev4,
            "roofline": "hbm" if variant4 == "xla-mid" else "mxu",
            "variant": variant4,
            "wall_xla_mid_s": dt, "wall_slab_s": dt_slab,
            "result_bytes": 8 * nt}
    if err_slab:
        row4["variant_error"] = err_slab
    bb = None
    if fl4:
        row4["mxu_util"] = mfu(fl4, dt4)
        # bytes model: the slab variant removes 4 of the 6 stage round
        # trips (12U of 28U)
        bb = bb4 if variant4 == "xla-mid" else bb4 - 12 * 4.0 * nt
        row4["hbm_gbs"] = round(bb / dt4 / 1e9, 1)
    finish(row4, fl=fl4, bb=bb)

    # ---- config 5: multi-channel cross-coherence + Doppler COG ---------- #
    assert pallas_welch2_applicable(plan1.nwins, plan1.noverlap, plan1.navr,
                                    nch)

    def xcoh_run(xd, yd):
        Pxx, Pyy, Pr, Pi = welch_fir_pallas_fused(
            xd, yd, win1, plan1.nnyquist, norm1, navr=plan1.navr,
            nwins=plan1.nwins, noverlap=plan1.noverlap, detrend_style=1,
            interpret=not on_tpu)
        # coherence + PSD-weighted COG frequency on-device (reference
        # Cxy_Cxy2 fft_analysis.py:1662, cog Doppler.py:43)
        C2 = (Pr * Pr + Pi * Pi) / (Pxx[None] * Pyy)
        f = jnp.arange(plan1.nnyquist, dtype=jnp.float32)
        cog = jnp.sum(Pyy * f, axis=-1) / jnp.sum(Pyy, axis=-1)
        return jnp.sum(C2) + jnp.sum(cog)

    dt, dev = measure(xcoh_run, xd, yd)
    fl = v3_dispatched_flops(plan1.nwins, plan1.noverlap, plan1.navr, nch, 1)
    algo = prof.welch_flops(plan1.navr, plan1.nwins, nch=nch)
    finish({"config": 5, "what": "cross_coherence_cog_8ch",
            "samples_per_s": round(nch * nt / dt, 1), "wall_s": dt,
            "device_s": dev,
            "mxu_util": mfu(fl, dt),
            "algo_tflops": round(algo / dt / 1e12, 3),
            "result_bytes": 4 * (2 * nch + 1) * plan1.nnyquist}, fl=fl)

    # ---- headline: the full Welch+FIR chain (FIR fused into the path) --- #
    # 2x the shared signal: one dispatch carries ~16 ms of device work, so
    # the ~1 ms tunnel dispatch overhead costs <7% of the reading
    nt_h = 2 * nt
    x_h = np.concatenate([x, x])
    y_h = np.concatenate([y, y], axis=1)
    xd_h = jax.device_put(x_h)
    yd_h = jax.device_put(y_h)
    nwins_h = 2048
    plan_h = seg.plan_segments(nt_h, nwins=nwins_h, windowoverlap=0.5)
    win_h = np.hanning(nwins_h + 1)[:-1]
    s1h = seg.get_s1(win_h)
    norm_h = np.float32(1.0 / (s1h ** 2
                               * seg.get_enbw(fs, s1h, seg.get_s2(win_h))
                               * plan_h.navr))
    taps_h = ft.filters.firwin(129, [0.05, 0.45], pass_zero=False)
    from pyfft_tpu.spectral import _onesided_power_scale
    scale_h = jnp.asarray(
        _onesided_power_scale(plan_h.nfft, plan_h.nnyquist)
        .astype(np.float32))

    def chain(xd, yd):
        Pxx, Pyy, Pr, Pi = welch_fir_pallas_fused(
            xd, yd, win_h, plan_h.nnyquist, norm_h, navr=plan_h.navr,
            nwins=plan_h.nwins, noverlap=plan_h.noverlap, taps=taps_h,
            detrend_style=1, interpret=not on_tpu)
        return (jnp.sum(Pxx * scale_h) + jnp.sum(Pyy * scale_h)
                + jnp.sum(Pr * scale_h))

    dt, dev = measure(chain, xd_h, yd_h, nrep=5)
    fl = v3_dispatched_flops(plan_h.nwins, plan_h.noverlap, plan_h.navr,
                             nch, len(taps_h))
    headline = {"dt": dt, "samples": nch * nt_h,
                "mxu_util": mfu(fl, dt), "device": kind,
                "dispatch_overhead_s": dispatch_s,
                "hbm_ceiling_gbs": hbm_ceiling_gbs}
    finish({"config": 0, "what": "welch_fir_chain_8ch (headline)",
            "samples_per_s": round(nch * nt_h / dt, 1), "wall_s": dt,
            "device_s": dev,
            "mxu_util": headline["mxu_util"],
            "result_bytes": 4 * (2 * nch + 1) * plan_h.nnyquist}, fl=fl)

    # reference-style serial NumPy baseline on a slice, scaled linearly.
    # Best-of-3: a single measurement drifted ~2x between rounds (host
    # load), which made the vs_baseline ratio noisier than the TPU number
    base_nt = 1 << 18
    base_plan = seg.plan_segments(base_nt, nwins=nwins_h, windowoverlap=0.5)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _numpy_reference_chain(x[:base_nt].astype(np.float64),
                               y[:, :base_nt].astype(np.float64),
                               taps_h, win_h, base_plan)
        best = min(best, time.perf_counter() - t0)
    base_dt = best * (nt_h / base_nt)
    headline["base_rate"] = nch * nt_h / base_dt
    return rows, headline


_MD_BEGIN = "<!-- measured:begin -->"
_MD_END = "<!-- measured:end -->"


def update_baseline_md(rows, headline, path="BASELINE.md"):
    """Rewrite the measured table between the markers (idempotent)."""
    import datetime
    if not os.path.exists(path):
        return
    with open(path) as f:
        txt = f.read()
    ceil = headline.get("hbm_ceiling_gbs", 494.0)
    lines = [f"{_MD_BEGIN}",
             f"### Measured ({datetime.date.today().isoformat()}, "
             f"{headline.get('device', '?')}, 1 chip)", "",
             "MXU util = achieved TFLOP/s over the chip's bf16 matmul peak,",
             "counting the FLOPs the kernels actually dispatch (bf16x3",
             "compensation passes and structural padding included).",
             "Rows marked `hbm` are bandwidth-bound: their governing",
             f"roofline is the measured {ceil:.0f} GB/s achievable HBM",
             "streaming rate through this runtime (book 819), quoted in",
             "the notes.",
             f"The remote tunnel charges a variable "
             f"{headline.get('dispatch_overhead_s', 0.0015) * 1e3:.2f} ms "
             "per dispatch (measured via a jitted scalar add).  Device",
             "time per row is measured by in-jit repeat differencing",
             "(an n-repeat fori_loop vs a single call, slope = device",
             "time), which is immune to that variable fixed cost; 'dev",
             "util' is the utilization a local (untunneled) runtime",
             "would see.",
             "",
             "| config | samples/s/chip | wall/call | MXU util | notes |",
             "|---|---|---|---|---|"]
    for r in sorted(rows, key=lambda r: r["config"] or 99):
        util = r.get("mxu_util")
        note = f"result {r['result_bytes'] / 1e6:.2g} MB"
        if r.get("hbm_gbs"):
            gbs = r.get("hbm_gbs_device", r["hbm_gbs"])
            note += f"; {gbs:.0f} GB/s dev"
            if r.get("roofline") == "hbm":
                note += (f" = {min(100.0, 100 * gbs / ceil):.0f}% of "
                         "achievable HBM (bound)")
        if r.get("kernel_gbs"):
            note += (f"; tiled-path {r['kernel_gbs']:.0f} GB/s "
                     "(no API-boundary retile)")
        if r.get("mxu_util_device") is not None:
            note += f"; dev util {100 * r['mxu_util_device']:.0f}%"
        if r.get("variant"):
            note += f"; {r['variant']}"
        lines.append(
            f"| {r['what']} | {r['samples_per_s']:.3g} | "
            f"{r['wall_s'] * 1e3:.2f} ms | "
            f"{'' if util is None else f'{100 * util:.0f}%'} | "
            f"{note} |")
    lines.append(f"| serial NumPy reference chain | "
                 f"{headline['base_rate']:.3g} | | | measured on a "
                 f"2^18-sample slice, scaled |")
    lines.append(_MD_END)
    block = "\n".join(lines)
    if _MD_BEGIN in txt:
        pre = txt[:txt.index(_MD_BEGIN)]
        post = txt[txt.index(_MD_END) + len(_MD_END):]
        txt = pre + block + post
    else:
        txt = txt.rstrip() + "\n\n" + block + "\n"
    with open(path, "w") as f:
        f.write(txt)


def wait_for_device(max_wait_s=2700, poll_s=20):
    """Block until the accelerator answers a trivial probe (the remote
    tunnel wedges transiently; a wedged first call would otherwise hang
    inside the process forever).  Probes in subprocesses so they are
    killable; returns False if the device never comes up."""
    import subprocess
    import sys as _sys
    probe = ("import jax, jax.numpy as jnp;"
             "print(float((jnp.ones((64,64))@jnp.ones((64,64))).sum()))")
    t0 = time.time()
    while time.time() - t0 < max_wait_s:
        try:
            r = subprocess.run([_sys.executable, "-c", probe], timeout=240,
                               capture_output=True, text=True)
            if r.returncode == 0 and "262144" in r.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        print("bench: device not ready (%.0fs)" % (time.time() - t0),
              file=__import__("sys").stderr, flush=True)
        time.sleep(poll_s)
    return False


def _install_watchdog(seconds=4500):
    """If the tunnel wedges mid-run the process would hang inside a device
    call forever and the driver would record NO output at all; a SIGALRM
    watchdog guarantees the one JSON line the driver needs.  Exits
    non-zero so a driver that checks status can tell a wedge from a
    measured 0; re-armed after device acquisition (``_rearm_watchdog``) so
    a slow-but-healthy wait_for_device + compile phase is not misreported
    as wedged."""
    import signal

    def _fire(signum, frame):
        print(json.dumps({
            "metric": "welch_psd_fir_chain_throughput",
            "value": 0.0,
            "unit": "samples/s/chip",
            "vs_baseline": 0.0,
            "error": f"bench watchdog: device wedged (> {seconds}s)",
        }), flush=True)
        os._exit(3)

    try:
        signal.signal(signal.SIGALRM, _fire)
        signal.alarm(seconds)
    except (ValueError, AttributeError, OSError):
        pass                      # non-main thread / non-posix: no watchdog


def _rearm_watchdog(seconds=4500):
    """Restart the watchdog clock (after the unbounded-but-legitimate
    device wait, and again after the compile-heavy health pass)."""
    import signal
    try:
        signal.alarm(seconds)
    except (ValueError, AttributeError, OSError):
        pass


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    _install_watchdog()
    try:
        # persist compiled executables across processes — the remote-tunnel
        # compile path is slow (minutes per kernel on a bad day), so a warm
        # cache is the difference between a 2-minute and a 40-minute bench
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(here, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    wait_for_device()
    _rearm_watchdog()        # the device wait is unbounded-but-legitimate
    # keep TPU_KERNELS.json fresh: run the consolidated kernel verify
    # before measuring, so a kernel that cannot compile on this chip shows
    # up in the round artifacts with its error string instead of silently
    # losing the timing race (round-4 lesson: the slab kernel was dark for
    # a full round because nothing re-verified post-commit)
    if os.environ.get("PYFFT_BENCH_NO_VERIFY", "0") != "1":
        try:
            import sys as _sys
            import jax as _jax
            if _jax.default_backend() != "cpu":
                if here not in _sys.path:
                    _sys.path.insert(0, here)
                from scripts.tpu_verify_kernels import run_checks
                run_checks()
                _rearm_watchdog()
        except Exception as e:
            print("bench: kernel verify pass failed: %r" % (e,),
                  file=__import__("sys").stderr, flush=True)
    rows, headline = run_configs()
    with open(os.path.join(here, "BENCH_FULL.json"), "w") as f:
        json.dump(rows, f, indent=1)
    try:
        update_baseline_md(rows, headline, os.path.join(here, "BASELINE.md"))
    except Exception:
        pass
    rate = headline["samples"] / headline["dt"]
    print(json.dumps({
        "metric": "welch_psd_fir_chain_throughput",
        "value": round(rate, 1),
        "unit": "samples/s/chip",
        "vs_baseline": round(rate / headline["base_rate"], 2),
        # denominator of vs_baseline, so cross-round ratios stay
        # interpretable: the reference's serial NumPy chain, measured on a
        # 2^18-sample slice this run and scaled linearly to the bench size
        "baseline_samples_per_s": round(headline["base_rate"], 1),
        "baseline_what": "serial NumPy FIR+Welch chain, 2^18-sample slice, "
                         "scaled",
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
