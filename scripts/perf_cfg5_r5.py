"""Round-5 probe: config 5 (8-channel cross-coherence + COG) marginal
rate vs fixed cost — same affine-fit methodology as config 1
(scripts/perf_cfg1_r5.py)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(here, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import measure
from pyfft_tpu import segmentation as seg
from pyfft_tpu.ops.pallas_welch import welch_fir_pallas_fused
from pyfft_tpu.ops.pallas_welch3 import v3_dispatched_flops
from pyfft_tpu.utils import profiling as prof

mm_peak = prof.device_peaks()[0]
rng = np.random.default_rng(0)
nwins, nch = 4096, 8
pts = []
for lg in (22, 23, 24, 25):
    nt = 1 << lg
    plan = seg.plan_segments(nt, nwins=nwins, windowoverlap=0.5)
    win = np.hanning(nwins + 1)[:-1]
    s1 = seg.get_s1(win)
    norm = np.float32(1.0 / (s1 ** 2
                             * seg.get_enbw(1e6, s1, seg.get_s2(win))
                             * plan.navr))
    x = rng.standard_normal(nt).astype(np.float32)
    y = rng.standard_normal((nch, nt)).astype(np.float32)
    xd, yd = jax.device_put(x), jax.device_put(y)

    def xcoh(xd, yd):
        Pxx, Pyy, Pr, Pi = welch_fir_pallas_fused(
            xd, yd, win, plan.nnyquist, norm, navr=plan.navr,
            nwins=plan.nwins, noverlap=plan.noverlap, detrend_style=1,
            interpret=False)
        C2 = (Pr * Pr + Pi * Pi) / (Pxx[None] * Pyy)
        f = jnp.arange(plan.nnyquist, dtype=jnp.float32)
        cog = jnp.sum(Pyy * f, axis=-1) / jnp.sum(Pyy, axis=-1)
        return jnp.sum(C2) + jnp.sum(cog)

    fl = v3_dispatched_flops(plan.nwins, plan.noverlap, plan.navr, nch, 1)
    wt, dt = measure(xcoh, xd, yd)
    util = fl / dt / 1e12 / mm_peak
    print("nt=2^%d: wall %.2f dev %.3f ms util %.1f%%"
          % (lg, wt * 1e3, dt * 1e3, 100 * util), flush=True)
    pts.append((nt, dt, fl))

nts = np.array([p[0] for p in pts], float)
dts = np.array([p[1] for p in pts], float)
fls = np.array([p[2] for p in pts], float)
b, a = np.polyfit(nts, dts, 1)
marg = (fls[-1] - fls[0]) / (dts[-1] - dts[0]) / 1e12 / mm_peak
print("config5: fixed a=%.0f us, marginal %.1f%% util" % (a * 1e6,
                                                          100 * marg),
      flush=True)
