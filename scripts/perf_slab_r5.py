"""Round-5 probe: slab-fused vs unfused factored analytic-signal chain on
the real chip, device-resident inputs, amortized timing (bench.measure).
Decides (a) whether slab becomes the default, (b) the perf gate for
non-lane-aligned factors."""
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
from pyfft_tpu.hilbert import _analytic_factored, _analytic_factored_slab
from pyfft_tpu.ops.mxu_fft import balanced3_factorization

rng = np.random.default_rng(0)

for nfft in (1 << 24, 1 << 23, 1 << 18):
    fac = balanced3_factorization(nfft)
    x = rng.standard_normal(nfft).astype(np.float32)
    xd = jax.device_put(x)

    def unfused(xd):
        zr, zi = _analytic_factored(xd, nfft=nfft, factors=fac,
                                    prec="bf16x3")
        return jnp.sum(zr) + jnp.sum(zi)

    def slab(xd):
        zr, zi = _analytic_factored_slab(xd, nfft=nfft, factors=fac,
                                         prec="bf16x3", interpret=False)
        return jnp.sum(zr) + jnp.sum(zi)

    wu, du = measure(unfused, xd)
    ws, ds = measure(slab, xd)
    # byte models: unfused ~28 passes, slab ~16 passes of 4*nfft
    print("nfft=2^%d fac=%s" % (int(np.log2(nfft)), fac), flush=True)
    print("  unfused: wall %.2f ms dev %.2f ms -> %.0f GB/s (28U model)"
          % (wu * 1e3, du * 1e3, 28 * 4.0 * nfft / du / 1e9), flush=True)
    print("  slab:    wall %.2f ms dev %.2f ms -> %.0f GB/s (16U model)"
          % (ws * 1e3, ds * 1e3, 16 * 4.0 * nfft / ds / 1e9), flush=True)
    print("  slab/unfused dev ratio: %.3f" % (ds / du), flush=True)
