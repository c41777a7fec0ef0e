"""Time-sharded overlap-save FIR filtering with halo exchange.

The distributed form of :func:`pyfft_tpu.filters.oaconvolve` (config #3 of
the benchmark suite): the time axis is partitioned over the ``'t'`` mesh
axis, each device receives the trailing ``ntaps - 1`` samples of its *left*
neighbor via ``lax.ppermute`` (the causal convolution halo; role of the
reference's reflect-padding in ``smooth``, ``filters.py:273``), then runs
the batched block-FFT overlap-save kernel locally.  No other communication
is needed — the output block is exactly the device's slice of the global
causal convolution.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .. import segmentation as seg
from ..ops import mxu_fft
from ..spectral import resolve_fft_backend
from .mesh import shard_map, P, NamedSharding
from ..filters import _os_plan


__all__ = ["fir_filter_sharded"]


def _halo_left(v, halo, axis_name):
    """Prepend the last ``halo`` samples of the left neighbor (zeros at the
    global left edge, matching zero-padded causal convolution)."""
    nshards = lax.psum(1, axis_name)
    tail = v[..., -halo:]
    perm = [(i, i + 1) for i in range(nshards - 1)]
    recv = lax.ppermute(tail, axis_name, perm)
    return jnp.concatenate([recv, v], axis=-1)


@partial(jax.jit, static_argnames=("ntaps", "nfft", "hop", "nblocks",
                                   "backend", "mesh_static"))
def _fir_sharded_jit(x, Hr, Hi, *, ntaps, nfft, hop, nblocks, backend,
                     mesh_static):
    mesh = mesh_static.mesh

    def step(x_l, Hr_l, Hi_l):
        halo = ntaps - 1
        xh = _halo_left(x_l, halo, "t")         # (nch_l, B + halo)
        Bl = x_l.shape[-1]
        pad = [(0, 0)] * (xh.ndim - 1) + [(0, nblocks * hop - Bl)]
        xh = jnp.pad(xh, pad)
        fr = seg.frame_signal(xh, nfft, hop, nblocks)
        if backend == "xla":
            H = Hr_l + 1j * Hi_l
            Y = jnp.fft.irfft(jnp.fft.rfft(fr, axis=-1) * H, n=nfft, axis=-1)
        else:
            Fr, Fi = mxu_fft.rfft_pair(fr, n=nfft, axis=-1)
            Y = mxu_fft.irfft_pair(Fr * Hr_l - Fi * Hi_l,
                                   Fr * Hi_l + Fi * Hr_l, nfft, axis=-1)
        y = Y[..., halo:]
        return y.reshape(y.shape[:-2] + (nblocks * hop,))[..., :Bl]

    return shard_map(step, mesh,
                     in_specs=(P("ch", "t"), P(), P()),
                     out_specs=P("ch", "t"),
                     check_vma=False)(x, Hr, Hi)


def fir_filter_sharded(x, taps, mesh, *, fft_backend=None, nfft=None):
    """Causal FIR filtering of ``x (nch, nt)`` distributed over the mesh.

    Equivalent to ``lfilter(taps, [1], x)`` / ``fir_filter`` — asserted
    against the single-device path in the test-suite.
    """
    x = np.atleast_2d(np.asarray(x))
    taps = np.asarray(taps, dtype=np.float64)
    ntaps = len(taps)
    dt_shards = mesh.shape["t"]
    nt = x.shape[-1]
    if nt % dt_shards:
        raise ValueError(f"time axis {nt} not divisible by {dt_shards}")
    B = nt // dt_shards
    if ntaps - 1 > B:
        raise ValueError(f"taps {ntaps} exceed block {B}; fewer time shards")
    if x.shape[0] % mesh.shape["ch"]:
        raise ValueError(f"nch={x.shape[0]} not divisible by ch shards")

    backend = resolve_fft_backend(fft_backend)
    # widest dtype the backend actually supports (f32 unless x64 is enabled)
    dtype = (jax.dtypes.canonicalize_dtype(np.float64)
             if backend == "xla" else np.float32)
    # per-device overlap-save plan over B (+halo) samples
    nfft_, hop, nblocks = _os_plan(B + ntaps - 1, ntaps, nfft)
    H = np.fft.rfft(taps, n=nfft_)

    from .welch import _MeshBox
    xs = jax.device_put(x.astype(dtype), NamedSharding(mesh, P("ch", "t")))
    y = _fir_sharded_jit(xs, jnp.asarray(H.real, dtype=dtype),
                         jnp.asarray(H.imag, dtype=dtype),
                         ntaps=ntaps, nfft=nfft_, hop=hop, nblocks=nblocks,
                         backend=backend, mesh_static=_MeshBox(mesh))
    return np.asarray(y)
