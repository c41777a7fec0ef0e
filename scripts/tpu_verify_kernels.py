"""Consolidated real-TPU kernel verification + timing (run by the session
driver when the tunnel is up, and by ``bench.py`` at the top of every
bench so ``TPU_KERNELS.json`` can never go stale).

Every kernel check is independently guarded: a failure records
``{"error": ...}`` for that kernel and the remaining checks still run, and
the results file is written even if the process dies mid-way — a broken
kernel must show up in round artifacts with its error string, never as a
silent absence (round-4 lesson)."""
import json
import os
import sys
import time

import numpy as np

# runnable as `python scripts/tpu_verify_kernels.py` from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def wait_for_tpu(max_wait_s=7200, poll_s=60):
    """Probe with short-lived subprocesses: a wedged tunnel blocks inside
    the first device call forever, so the probe must be killable without
    taking this process down."""
    import subprocess
    probe = ("import jax, jax.numpy as jnp;"
             "print(float((jnp.ones((64,64))@jnp.ones((64,64))).sum()))")
    t0 = time.time()
    while time.time() - t0 < max_wait_s:
        try:
            r = subprocess.run([sys.executable, "-c", probe], timeout=360,
                               capture_output=True, text=True)
            if r.returncode == 0 and "262144" in r.stdout:
                print("TPU ready after %.0fs" % (time.time() - t0),
                      flush=True)
                return True
        except subprocess.TimeoutExpired:
            pass
        print("TPU not ready (%.0fs elapsed)" % (time.time() - t0),
              flush=True)
        time.sleep(poll_s)
    return False


def run_checks(out_path=None):
    """Run every kernel check on the current default device; returns the
    results dict (also written to ``out_path``, default
    ``<repo>/TPU_KERNELS.json``).  Call only when a TPU is reachable."""
    import jax
    from pyfft_tpu.ops.pallas_fir import fir_pallas
    from pyfft_tpu import filters as flt
    from pyfft_tpu import segmentation as seg
    import pyfft_tpu as ft

    rng = np.random.default_rng(0)
    results = {"device": getattr(jax.devices()[0], "device_kind", "?"),
               "kernels": {}}

    def section(name, fn):
        try:
            results["kernels"][name] = fn()
        except Exception as e:
            print("%s FAILED: %s: %s" % (name, type(e).__name__, e),
                  flush=True)
            results["kernels"][name] = {
                "error": f"{type(e).__name__}: {e}"[:300]}

    # ---- pallas FIR (banded-matmul) ----
    def check_fir():
        x = rng.standard_normal((8, 1 << 16)).astype(np.float32)
        taps = flt.firwin(129, 0.3).astype(np.float32)
        t0 = time.time()
        y = np.asarray(fir_pallas(x, taps))
        t1 = time.time()
        np.asarray(fir_pallas(x, taps))
        t2 = time.time()
        want = np.stack([np.convolve(x[c], taps, mode="full")[:x.shape[1]]
                         for c in range(8)])
        err = np.max(np.abs(y - want)) / np.max(np.abs(want))
        print("pallas FIR: compile %.1fs warm %.3fs rel-err %.2e"
              % (t1 - t0, t2 - t1, err), flush=True)
        assert err < 5e-5, err
        results["fir_rel_err"] = float(err)
        return {"rel_err": float(err), "warm_s": round(t2 - t1, 4)}

    section("fir_pallas", check_fir)

    # ---- pallas welch warm latency with device-cached tables ----
    fs, N = 10e3, 2 ** 14
    t = (np.arange(N) / fs).astype(np.float32)
    xs = (np.sin(2 * np.pi * 150.0 * t)
          + 0.01 * rng.standard_normal(N)).astype(np.float32)
    ys = (0.5 * np.sin(2 * np.pi * 150.0 * t - np.pi / 4)
          + 0.01 * rng.standard_normal(N)).astype(np.float32)
    args = dict(tbounds=[t[1], t[-2]], Navr=8, windowfunction="hanning",
                plotit=False, verbose=False)

    def check_welch(be):
        def run():
            t0 = time.time()
            out = ft.fft_pwelch(t, xs, ys, fft_backend=be, **args)
            t1 = time.time()
            ft.fft_pwelch(t, xs, ys, fft_backend=be, **args)
            t2 = time.time()
            freq, Pxy, phi = out[0], np.asarray(out[1]), out[5]
            ipk = int(np.argmax(np.abs(Pxy)))
            print("%s welch: compile %.1fs warm %.3fs fpk=%.1f phi=%.4f"
                  % (be, t1 - t0, t2 - t1, freq[ipk], phi[ipk]), flush=True)
            assert abs(freq[ipk] - 150) < 2 * (freq[1] - freq[0])
            assert abs(phi[ipk] + np.pi / 4) < 2e-3
            return {"compile_s": round(t1 - t0, 2),
                    "warm_s": round(t2 - t1, 4),
                    "f_peak": float(freq[ipk]), "phi_peak": float(phi[ipk])}
        return run

    for be in ("mxu", "pallas"):
        section(f"welch_{be}", check_welch(be))

    # shared geometry for the v3-kernel checks
    nt3 = 1 << 17
    x3 = rng.standard_normal(nt3).astype(np.float32)
    y3 = rng.standard_normal((2, nt3)).astype(np.float32)
    plan3 = seg.plan_segments(nt3, nwins=2048, windowoverlap=0.5)
    win3 = np.hanning(2049)[:-1]
    taps3 = flt.firwin(129, [0.05, 0.45], pass_zero=False)
    hop3 = plan3.nwins - plan3.noverlap

    # ---- v3 fused chain (FIR + welch) numeric accuracy vs f64 numpy ----
    def check_v3_chain():
        from pyfft_tpu.ops.pallas_welch import welch_fir_pallas_fused
        Pxx, Pyy, Pr, Pi = welch_fir_pallas_fused(
            x3, y3, win3, plan3.nnyquist, 1.0 / plan3.navr, navr=plan3.navr,
            nwins=plan3.nwins, noverlap=plan3.noverlap, taps=taps3,
            detrend_style=1, interpret=False)
        xf = np.convolve(x3.astype(np.float64), taps3, "full")[:nt3]
        xf -= xf.mean()
        P = np.zeros(plan3.nwins)
        for g in range(plan3.navr):
            X = np.fft.fft(win3 * xf[g * hop3:g * hop3 + plan3.nwins])
            P += np.abs(X) ** 2
        P /= plan3.navr
        err3 = float(np.abs(np.asarray(Pxx)
                            - P[:plan3.nnyquist]).max() / P.max())
        print("v3 welch+fir chain: rel-err %.2e" % err3, flush=True)
        assert err3 < 5e-5, err3
        return {"rel_err_vs_f64": err3}

    section("welch_v3_chain", check_v3_chain)

    # ---- v3 two-sided complex kernel (Doppler IQ) ----
    def check_twosided():
        from pyfft_tpu.ops.pallas_welch3 import welch_pallas3_twosided
        z = (np.exp(1j * 2 * np.pi * 0.11 * np.arange(nt3))
             + 0.1 * (rng.standard_normal(nt3)
                      + 1j * rng.standard_normal(nt3))).astype(np.complex64)
        Pz, _, _, _ = welch_pallas3_twosided(
            z, z[None], win3, 1.0 / plan3.navr, navr=plan3.navr,
            nwins=plan3.nwins, noverlap=plan3.noverlap, detrend_style=1,
            interpret=False)
        zd = z.astype(np.complex128) - z.astype(np.complex128).mean()
        Pref = np.zeros(plan3.nwins)
        for g in range(plan3.navr):
            Z = np.fft.fft(win3 * zd[g * hop3:g * hop3 + plan3.nwins])
            Pref += np.abs(Z) ** 2
        Pref /= plan3.navr
        errz = float(np.abs(np.asarray(Pz) - Pref).max() / Pref.max())
        print("v3 two-sided complex: rel-err %.2e" % errz, flush=True)
        assert errz < 5e-5, errz
        return {"rel_err_vs_f64": errz}

    section("welch_v3_twosided", check_twosided)

    # ---- v3 STFT kernel ----
    def check_stft():
        from pyfft_tpu.ops.pallas_welch3 import stft_pallas3
        Xr, Xi = stft_pallas3(x3, None, win3, 1.0, navr=plan3.navr,
                              nwins=plan3.nwins, noverlap=plan3.noverlap,
                              detrend_style=1, interpret=False)
        xd3 = x3.astype(np.float64) - x3.astype(np.float64).mean()
        g = plan3.navr // 2
        Xg = np.fft.fft(win3 * xd3[g * hop3:g * hop3 + plan3.nwins])
        errs = float(max(
            np.abs(np.asarray(Xr[0, g]) - Xg.real).max(),
            np.abs(np.asarray(Xi[0, g]) - Xg.imag).max())
            / np.abs(Xg).max())
        print("v3 stft: rel-err %.2e" % errs, flush=True)
        assert errs < 5e-5, errs
        return {"rel_err_vs_f64": errs}

    section("stft_v3", check_stft)

    # ---- packed variants ----
    from pyfft_tpu.ops.pallas_welch3 import (welch_auto_packed,
                                             welch_pair_packed,
                                             packed_parts_geometry,
                                             packed_pair_geometry,
                                             welch_fir_pallas3)
    nt4 = 1 << 17
    x4 = rng.standard_normal(nt4).astype(np.float32)
    y4 = rng.standard_normal(nt4).astype(np.float32)
    plan4 = seg.plan_segments(nt4, nwins=2048, windowoverlap=0.5)
    win4 = np.hanning(2049)[:-1]

    def check_auto_packed():
        assert packed_parts_geometry(plan4.navr, plan4.nwins, plan4.noverlap)
        ref_auto = welch_fir_pallas3(
            x4, np.zeros((0, nt4), np.float32), win4, plan4.nnyquist,
            1.0 / plan4.navr, navr=plan4.navr, nwins=plan4.nwins,
            noverlap=plan4.noverlap, detrend_style=1, interpret=False)[0]
        got_auto = welch_auto_packed(
            x4, win4, plan4.nnyquist, 1.0 / plan4.navr, navr=plan4.navr,
            nwins=plan4.nwins, noverlap=plan4.noverlap, detrend_style=1,
            interpret=False)
        errp = float(np.abs(np.asarray(got_auto)
                            - np.asarray(ref_auto)).max()
                     / np.abs(np.asarray(ref_auto)).max())
        print("packed auto welch: rel-err %.2e" % errp, flush=True)
        assert errp < 1e-4, errp
        return {"rel_err_vs_v3": errp}

    section("welch_auto_packed", check_auto_packed)

    def check_pair_packed():
        assert packed_pair_geometry(plan4.navr, plan4.nwins, plan4.noverlap)
        ref_pair = welch_fir_pallas3(
            x4, y4[None], win4, plan4.nnyquist, 1.0 / plan4.navr,
            navr=plan4.navr, nwins=plan4.nwins, noverlap=plan4.noverlap,
            detrend_style=1, interpret=False)
        got_pair = welch_pair_packed(
            x4, y4, win4, plan4.nnyquist, 1.0 / plan4.navr,
            navr=plan4.navr, nwins=plan4.nwins, noverlap=plan4.noverlap,
            detrend_style=1, interpret=False)
        errq = max(float(np.abs(np.asarray(a) - np.asarray(b)).max()
                         / (np.abs(np.asarray(b)).max() + 1e-30))
                   for a, b in zip(got_pair, ref_pair))
        print("pair-packed cross welch: rel-err %.2e" % errq, flush=True)
        assert errq < 1e-4, errq
        return {"rel_err_vs_v3": errq}

    section("welch_pair_packed", check_pair_packed)

    # ---- slab-fused analytic-signal middle section ----
    from pyfft_tpu.hilbert import _analytic_factored, _analytic_factored_slab
    from pyfft_tpu.ops.mxu_fft import balanced3_factorization
    import jax.numpy as jnp

    def slab_err(nfft):
        fac = balanced3_factorization(nfft)
        xh = rng.standard_normal(nfft).astype(np.float32)
        zr0, zi0 = _analytic_factored(jnp.asarray(xh), nfft=nfft,
                                      factors=fac, prec="bf16x3")
        t0 = time.time()
        zr1, zi1 = _analytic_factored_slab(jnp.asarray(xh), nfft=nfft,
                                           factors=fac, prec="bf16x3",
                                           interpret=False)
        jax.block_until_ready((zr1, zi1))
        t1 = time.time()
        jax.block_until_ready(_analytic_factored_slab(
            jnp.asarray(xh), nfft=nfft, factors=fac, prec="bf16x3",
            interpret=False))
        t2 = time.time()
        scl = float(np.abs(np.asarray(zr0)).max())
        err = max(float(np.abs(np.asarray(zr1) - np.asarray(zr0)).max()),
                  float(np.abs(np.asarray(zi1)
                               - np.asarray(zi0)).max())) / scl
        return err, fac, t1 - t0, t2 - t1

    def check_slab():
        # 2^24 -> (256, 256, 256): the production lane-aligned geometry the
        # gate (hilbert._envelope_phase_dev) routes through the slab kernel
        errh, fac, tc, tw = slab_err(1 << 24)
        print("slab hilbert: compile %.1fs warm %.3fs rel-err %.2e"
              % (tc, tw, errh), flush=True)
        assert errh < 1e-3, errh
        return {"rel_err_vs_xla_mid": errh, "warm_s": round(tw, 4)}

    section("hilbert_slab", check_slab)

    def check_slab64():
        # non-lane-aligned geometry (2^18 -> (64, 64, 64)): all BlockSpecs
        # equal their array dims post twiddle-hoist, so this should be
        # Mosaic-legal — recorded to justify/relax the production perf gate
        errh, fac, tc, tw = slab_err(1 << 18)
        print("slab hilbert %s: rel-err %.2e" % (fac, errh), flush=True)
        assert errh < 1e-3, errh
        return {"rel_err_vs_xla_mid": errh, "factors": list(fac),
                "warm_s": round(tw, 4)}

    section("hilbert_slab_64", check_slab64)

    if out_path is None:
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        out_path = os.path.join(here, "TPU_KERNELS.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    bad = [k for k, v in results["kernels"].items() if "error" in v]
    print("TPU KERNEL VERIFY %s" % ("OK" if not bad else
                                    "FAILED: %s" % ", ".join(bad)),
          flush=True)
    return results, not bad


def main():
    if not wait_for_tpu():
        print("TPU never became available", flush=True)
        return 1
    import jax
    try:
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(here, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    _, ok = run_checks()
    return 0 if ok else 2


if __name__ == "__main__":
    sys.exit(main())
