"""Round-5 probe: where does config 1 (single-channel Welch) lose its
MXU util?  Sweep nt and fit t_dev = a + b*nt: `a` is the per-dispatch
fixed cost (grid prologue/epilogue), `b` the marginal per-sample rate —
if marginal util matches the headline (~60%), config 1's 53% is fixed
cost at its small 1.2 ms scale, which is a floor, not a kernel defect."""
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
from pyfft_tpu.ops.pallas_welch3 import (v3_dispatched_flops,
                                         welch_auto_packed,
                                         packed_parts_geometry)
from pyfft_tpu.utils import profiling as prof

mm_peak = prof.device_peaks()[0]
rng = np.random.default_rng(0)
nwins = 4096

pts = {"plain": [], "packed": []}
for lg in (22, 23, 24, 25):
    nt = 1 << lg
    plan = seg.plan_segments(nt, nwins=nwins, windowoverlap=0.5)
    win = np.hanning(nwins + 1)[:-1]
    s1 = seg.get_s1(win)
    norm = np.float32(1.0 / (s1 ** 2
                             * seg.get_enbw(1e6, s1, seg.get_s2(win))
                             * plan.navr))
    x = rng.standard_normal(nt).astype(np.float32)
    xd = jax.device_put(x)
    y_empty = jnp.zeros((0, nt), jnp.float32)

    def welch1(xd):
        Pxx, _, _, _ = welch_fir_pallas_fused(
            xd, y_empty, win, plan.nnyquist, norm, navr=plan.navr,
            nwins=plan.nwins, noverlap=plan.noverlap, detrend_style=1,
            interpret=False)
        return jnp.sum(Pxx)

    fl = v3_dispatched_flops(plan.nwins, plan.noverlap, plan.navr, 0, 1)
    wt, dt = measure(welch1, xd)
    util = fl / dt / 1e12 / mm_peak
    print("nt=2^%d plain : wall %.2f dev %.3f ms util %.1f%% (navr=%d)"
          % (lg, wt * 1e3, dt * 1e3, 100 * util, plan.navr), flush=True)
    pts["plain"].append((nt, dt, fl))

    if packed_parts_geometry(plan.navr, plan.nwins, plan.noverlap):
        def welch1p(xd):
            return jnp.sum(welch_auto_packed(
                x=xd, win=win, nfreq=plan.nnyquist, norm=norm,
                navr=plan.navr, nwins=plan.nwins, noverlap=plan.noverlap,
                detrend_style=1, interpret=False))
        wt, dt = measure(welch1p, xd)
        util = fl / dt / 1e12 / mm_peak
        print("nt=2^%d packed: wall %.2f dev %.3f ms util %.1f%%"
              % (lg, wt * 1e3, dt * 1e3, 100 * util), flush=True)
        pts["packed"].append((nt, dt, fl))

for name, rows in pts.items():
    if len(rows) < 2:
        continue
    nts = np.array([r[0] for r in rows], float)
    dts = np.array([r[1] for r in rows], float)
    fls = np.array([r[2] for r in rows], float)
    b, a = np.polyfit(nts, dts, 1)
    marg_util = (fls[-1] - fls[0]) / (dts[-1] - dts[0]) / 1e12 / mm_peak
    print("%s: fixed a=%.0f us, marginal %.1f%% util "
          "(fit over nt=%s)" % (name, a * 1e6, 100 * marg_util,
                                [int(np.log2(n)) for n in nts]), flush=True)
