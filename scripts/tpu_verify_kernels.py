"""Consolidated real-TPU kernel verification + timing (run by the session
driver when the tunnel is up; patient by design — first waits for device
availability, then compiles each kernel once)."""
import sys
import time

import numpy as np


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
            r = subprocess.run([sys.executable, "-c", probe], timeout=90,
                               capture_output=True, text=True)
            if r.returncode == 0 and "4096" in r.stdout:
                print("TPU ready after %.0fs" % (time.time() - t0),
                      flush=True)
                return True
        except subprocess.TimeoutExpired:
            pass
        print("TPU not ready (%.0fs elapsed)" % (time.time() - t0),
              flush=True)
        time.sleep(poll_s)
    return False


def main():
    # NOTE: probing with a tiny matmul; if the tunnel is wedged this blocks
    # inside the first device call, so the wait loop runs in this process.
    if not wait_for_tpu():
        print("TPU never became available", flush=True)
        return 1

    import jax
    from pyfft_tpu.ops.pallas_fir import fir_pallas
    from pyfft_tpu import filters as flt
    import pyfft_tpu as ft

    rng = np.random.default_rng(0)

    # ---- pallas FIR (banded-matmul) ----
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

    # ---- pallas welch warm latency with device-cached tables ----
    fs, N = 10e3, 2 ** 14
    t = (np.arange(N) / fs).astype(np.float32)
    xs = (np.sin(2 * np.pi * 150.0 * t)
          + 0.01 * rng.standard_normal(N)).astype(np.float32)
    ys = (0.5 * np.sin(2 * np.pi * 150.0 * t - np.pi / 4)
          + 0.01 * rng.standard_normal(N)).astype(np.float32)
    args = dict(tbounds=[t[1], t[-2]], Navr=8, windowfunction="hanning",
                plotit=False, verbose=False)
    for be in ("mxu", "pallas"):
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

    print("TPU KERNEL VERIFY OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
