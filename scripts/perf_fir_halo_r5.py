"""Round-5 probe: is the on-device halo gather what separates the tiled
FIR entry (232 GB/s this bench) from the round-4 kernel-only rate
(364 GB/s, host-precomputed halos)?  Times (a) kernel with device-resident
precomputed halos, (b) fir_pallas_tiled (in-jit jnp.take gather),
(c) the gather alone, (d) rank-2 fir_pallas."""
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
from pyfft_tpu import filters as flt
from pyfft_tpu.ops.pallas_fir import (_band_blocks, _fir_call, _tile_halo,
                                      fir_pallas, fir_pallas_tiled)

rng = np.random.default_rng(0)
nch, nt = 8, 1 << 24
y = rng.standard_normal((nch, nt)).astype(np.float32)
bp = flt.firwin(129, [0.05, 0.45], pass_zero=False)
from pyfft_tpu import iirnotch
b_n, a_n = iirnotch(0.2, 30.0)
taps = np.convolve(bp, flt.iir_to_fir(b_n, a_n, ntaps=129))
m = -(-(len(taps) - 1) // 128)
rows = 512
yr = jax.device_put(y.reshape(nch, nt // 128, 128))
bands = _band_blocks(tuple(np.asarray(taps, np.float64).tolist()), "bf16x3")
bands_j = tuple(jax.device_put(np.asarray(b)) for blk in bands for b in blk)
halo_dev = jax.device_put(np.asarray(
    jax.jit(lambda a: _tile_halo(a, m, rows))(yr)))

gb = 8.0 * nch * nt / 1e9


def run(name, f, *arrs):
    wt, dt = measure(f, *arrs)
    print("%-28s wall %.2f ms dev %.3f ms -> %.0f GB/s"
          % (name, wt * 1e3, dt * 1e3, gb / dt), flush=True)
    return dt


run("kernel, precomputed halos",
    lambda a, h, *b: jnp.sum(_fir_call(a, h, b, m=m, rows=rows,
                                       kprec="bf16x3", interpret=False)),
    yr, halo_dev, *bands_j)
run("tiled (in-jit halo gather)",
    lambda a: jnp.sum(fir_pallas_tiled(a, taps)), yr)
run("halo gather alone",
    lambda a: jnp.sum(_tile_halo(a, m, rows)), yr)
run("rank-2 fir_pallas",
    lambda a: jnp.sum(fir_pallas(a, taps)), jax.device_put(y))
