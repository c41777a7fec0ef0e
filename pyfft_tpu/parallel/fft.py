"""Distributed FFT: four-step decomposition over the device mesh (TP).

The reference computes every transform single-threaded through
``numpy.fft`` (the largest is 2^21 points, Doppler.py:171); a single TPU
chip covers those sizes trivially.  This module is the SURVEY §2.3 "TP /
intra-op tensor parallelism" row: transforms whose working set exceeds one
chip's HBM (or whose latency must be split across a slice) factor into
per-device radix stages with all-to-all transposes between them — the
classic four-step (Bailey / transpose) algorithm mapped onto
``shard_map`` + ``lax.all_to_all`` over the ``'t'`` mesh axis:

    N = N1 * N2,   n = n1*N2 + n2,   k = k1 + N1*k2
    X[k1 + N1*k2] = sum_{n2} W_N^{n2 k1} [ sum_{n1} x[n1*N2+n2] W_N1^{n1 k1} ]
                    * W_N2^{n2 k2}

Stage map (each device holds a contiguous 1/D block of the time axis):

    1. local reshape to (N1/D, N2) rows
    2. all-to-all  -> (N1, N2/D)  columns          [Ulysses-style axis swap]
    3. local length-N1 FFT along n1 (batched over the column block)
    4. local twiddle  W_N^{k1 * n2}
    5. all-to-all  -> (N1/D, N2)  rows of k1
    6. local length-N2 FFT along n2
    7. transpose + all-to-all -> standard-order output, contiguous on k

Local transforms go through :mod:`pyfft_tpu.ops.mxu_fft` real-pair matmul
FFTs (TPU: no complex support on the backend) or ``jnp.fft`` (CPU/GPU),
selected exactly like the single-chip pipeline.

Also exported: :func:`axis_swap` — the bare Ulysses-style re-shard
(all-to-all that trades which array axis is partitioned), usable on its own
for time-partitioned -> frequency-partitioned layout changes.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..ops import mxu_fft
from ..spectral import resolve_fft_backend
from .mesh import shard_map, P, NamedSharding

__all__ = ["fft_sharded", "ifft_sharded", "rfft_sharded", "irfft_sharded",
           "hilbert_sharded", "axis_swap", "four_step_factor"]


def four_step_factor(n: int, d: int):
    """Pick ``N1 * N2 = n`` with ``d | N1``, ``d | N2``, ``N1`` near sqrt(n).

    Both factors must be divisible by the shard count so each all-to-all
    moves equal tiles.  Raises if no such factorization exists (lengths
    with ``d^2 !| N`` go through the distributed Bluestein path instead).
    """
    if n % (d * d):
        raise ValueError(
            f"four-step FFT needs d^2={d*d} | N={n} (got remainder {n % (d*d)})")
    m = n // (d * d)
    best = None
    for m1 in range(1, int(np.sqrt(m)) + 1):
        if m % m1 == 0:
            for cand in (m1, m // m1):
                n1 = d * cand
                n2 = n // n1
                if n2 % d:
                    continue
                score = abs(n1 - np.sqrt(n))
                if best is None or score < best[0]:
                    best = (score, n1, n2)
    if best is None:
        raise ValueError(f"no valid four-step factorization of {n} over {d}")
    return best[1], best[2]


def _local_fft(re, im, backend, axis=-1):
    """Backend-dispatched local FFT of a (re, im) pair along ``axis``."""
    if backend == "mxu":
        return mxu_fft.fft_pair(re, im, axis=axis)
    z = jnp.fft.fft(lax.complex(re, im), axis=axis)
    return jnp.real(z), jnp.imag(z)


def _twiddle(k1n2, sign, dtype):
    c = jnp.cos(k1n2)
    s = jnp.sin(k1n2)
    return c.astype(dtype), (sign * s).astype(dtype)


def _fourstep_local(xr, xi, *, n, n1, n2, d, axis_name, backend, sign):
    """Per-device body: xr/xi are the local (..., n/d) time blocks."""
    dev = lax.axis_index(axis_name)
    lead = xr.shape[:-1]

    def a2a(a, split, concat):
        # shift axes past the leading batch dims
        off = len(lead)
        return lax.all_to_all(a, axis_name, split_axis=off + split,
                              concat_axis=off + concat, tiled=True)

    # 1. local rows: (..., n1/d, n2)
    xr = xr.reshape(*lead, n1 // d, n2)
    xi = xi.reshape(*lead, n1 // d, n2)
    # 2. axis swap -> full n1, column block (..., n1, n2/d)
    xr = a2a(xr, 1, 0)
    xi = a2a(xi, 1, 0)
    # 3. FFT along n1 (move to last axis for the batched transform)
    xr = jnp.swapaxes(xr, -1, -2)
    xi = jnp.swapaxes(xi, -1, -2)
    xr, xi = _local_fft(xr, xi, backend, axis=-1)   # (..., n2/d, n1)
    # 4. twiddle W_N^{sign * k1 * n2}; local n2 = dev*(n2/d) + j
    k1 = jnp.arange(n1)
    n2loc = dev * (n2 // d) + jnp.arange(n2 // d)
    ang = (2.0 * np.pi / n) * (n2loc[:, None] * k1[None, :])
    twr, twi = _twiddle(ang, sign, xr.dtype)        # (n2/d, n1)
    xr, xi = (xr * twr - xi * twi, xr * twi + xi * twr)
    # 5. back to rows of k1: (..., n2/d, n1) -> swap -> (..., n1, n2/d)
    xr = jnp.swapaxes(xr, -1, -2)
    xi = jnp.swapaxes(xi, -1, -2)
    #    all-to-all -> (..., n1/d, n2)
    xr = a2a(xr, 0, 1)
    xi = a2a(xi, 0, 1)
    # 6. FFT along n2
    xr, xi = _local_fft(xr, xi, backend, axis=-1)   # (..., n1/d, n2)
    # 7. standard order: k = k1 + n1*k2 -> transpose to (k2, k1) and
    #    re-shard so device d'' holds the contiguous k block
    xr = jnp.swapaxes(xr, -1, -2)                   # (..., n2, n1/d)
    xi = jnp.swapaxes(xi, -1, -2)
    xr = a2a(xr, 0, 1)                              # (..., n2/d, n1)
    xi = a2a(xi, 0, 1)
    return (xr.reshape(*lead, (n1 * n2) // d),
            xi.reshape(*lead, (n1 * n2) // d))


@partial(jax.jit,
         static_argnames=("n", "n1", "n2", "d", "axis_name", "backend",
                          "sign", "mesh"))
def _fourstep_jit(xr, xi, *, n, n1, n2, d, axis_name, backend, sign, mesh):
    spec = P(*([None] * (xr.ndim - 1) + [axis_name]))
    body = partial(_fourstep_local, n=n, n1=n1, n2=n2, d=d,
                   axis_name=axis_name, backend=backend, sign=sign)
    return shard_map(body, mesh, in_specs=(spec, spec),
                     out_specs=(spec, spec))(xr, xi)


def _bluestein_sharded(xr, xi, mesh, axis_name, backend):
    """Distributed chirp-z transform for lengths with ``d^2 !| N``.

    Re-expresses the length-``N`` DFT as an ``M``-point circular
    convolution (``M = d^2 * 2^k >= 2N-1``, so the four-step always
    factors): chirp-multiply, two four-step transforms of length M,
    chirp-multiply back.  ~4x the arithmetic of a native four-step, in
    exchange for supporting every N; the collective pattern (two
    all-to-all rounds per transform) is unchanged.  The whole chain —
    chirp multiplies, V-multiply, both transforms — stays device-resident
    and sharded; only the tiny chirp *tables* are host-built (exact
    float64 angle reduction mod 2N).
    """
    n = np.shape(xr)[-1]
    d = mesh.shape[axis_name]
    dd = d * d
    M = dd * max(1, 1 << int(np.ceil(np.log2(max((2 * n - 1) / dd, 1)))))
    sq = (np.arange(n, dtype=np.int64) ** 2) % (2 * n)
    ang = np.pi * sq.astype(np.float64) / n
    a_re, a_im = np.cos(ang), -np.sin(ang)
    v = np.exp(1j * ang)
    v_ext = np.zeros(M, dtype=np.complex128)
    v_ext[:n] = v
    if n > 1:
        v_ext[M - n + 1:] = v[1:][::-1]
    V = np.fft.fft(v_ext)

    lead = np.shape(xr)[:-1]
    spec_n = P(*([None] * len(lead) + [axis_name]))
    sh_n = NamedSharding(mesh, spec_n)
    sh_M = NamedSharding(mesh, P(axis_name))
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    xr = jax.device_put(jnp.asarray(xr, dtype), sh_n)
    xi = jax.device_put(jnp.asarray(xi, dtype), sh_n)
    sh_1n = NamedSharding(mesh, P(axis_name))
    ar = jax.device_put(jnp.asarray(a_re, dtype), sh_1n)
    ai = jax.device_put(jnp.asarray(a_im, dtype), sh_1n)
    Vr = jax.device_put(jnp.asarray(V.real, dtype), sh_M)
    Vi = jax.device_put(jnp.asarray(V.imag, dtype), sh_M)

    pad = [(0, 0)] * len(lead) + [(0, M - n)]
    ur = jnp.pad(xr * ar - xi * ai, pad)
    ui = jnp.pad(xr * ai + xi * ar, pad)

    Ur, Ui = _fourstep_run(ur, ui, mesh, axis_name, backend, inverse=False)
    Wr = Ur * Vr - Ui * Vi
    Wi = Ur * Vi + Ui * Vr
    wr, wi = _fourstep_run(Wr, Wi, mesh, axis_name, backend, inverse=True)
    wr = wr[..., :n]
    wi = wi[..., :n]
    yr = wr * ar - wi * ai
    yi = wr * ai + wi * ar
    return (jax.device_put(yr, sh_n), jax.device_put(yi, sh_n))


def _fourstep_run(xr, xi, mesh, axis_name, backend, inverse):
    """Four-step transform of device/host ``(re, im)``; requires
    ``d^2 | N``.  Returns sharded device arrays (even frequency tiles)."""
    d = mesh.shape[axis_name]
    n = np.shape(xr)[-1]
    n1, n2 = four_step_factor(n, d)

    spec = P(*([None] * (np.ndim(xr) - 1) + [axis_name]))
    sh = NamedSharding(mesh, spec)
    xr = jax.device_put(jnp.asarray(xr), sh)
    xi = jax.device_put(jnp.asarray(xi), sh)

    # inverse via conjugation: ifft(z) = conj(fft(conj(z))) / N — every
    # stage (local FFTs *and* twiddles) stays the forward kernel
    if inverse:
        xi = -xi
    yr, yi = _fourstep_jit(xr, xi, n=n, n1=n1, n2=n2, d=d,
                           axis_name=axis_name, backend=backend,
                           sign=-1.0, mesh=mesh)
    if inverse:
        return yr / n, -yi / n
    return yr, yi


def _run_pair(xr, xi, mesh, axis_name, backend, inverse):
    """Transform dispatch on a real (re, im) pair: four-step when
    ``d^2 | N``, distributed Bluestein otherwise (the inverse rides the
    conjugation identity ``ifft(z) = conj(fft(conj(z))) / n`` on the
    Bluestein route; the four-step handles it natively)."""
    d = mesh.shape[axis_name]
    n = np.shape(xr)[-1]
    if n % (d * d):
        if inverse:
            yr, yi = _bluestein_sharded(xr, -jnp.asarray(xi), mesh,
                                        axis_name, backend)
            return yr / n, -yi / n
        return _bluestein_sharded(xr, xi, mesh, axis_name, backend)
    return _fourstep_run(xr, xi, mesh, axis_name, backend, inverse)


def _resolve_pair_backend(backend):
    backend = resolve_fft_backend(backend)
    return "mxu" if backend == "pallas" else backend


def _run(x, mesh, axis_name, backend, inverse):
    backend = _resolve_pair_backend(backend)
    x = np.asarray(x) if not isinstance(x, jax.Array) else x
    if np.iscomplexobj(x):
        xr, xi = np.real(x), np.imag(x)
    else:
        xr, xi = x, np.zeros_like(x)
    return _run_pair(xr, xi, mesh, axis_name, backend, inverse)


def fft_sharded(x, mesh, axis_name="t", backend=None):
    """Distributed forward FFT along the last axis of ``x``.

    ``x``: real or complex array whose last axis (length ``N``, with
    ``D^2 | N`` for ``D`` shards) is partitioned over ``mesh[axis_name]``.
    Returns ``(re, im)`` device arrays sharded contiguously over the
    frequency axis.  Use ``re + 1j*im`` on host for a complex view.
    """
    return _run(x, mesh, axis_name, backend, inverse=False)


def ifft_sharded(x, mesh, axis_name="t", backend=None):
    """Distributed inverse FFT (1/N normalized) along the last axis."""
    return _run(x, mesh, axis_name, backend, inverse=True)


def rfft_sharded(x, mesh, axis_name="t", backend=None):
    """Distributed real-input FFT: the ``n//2 + 1`` non-negative bins.

    Runs the full distributed transform and returns the sliced half
    spectrum as host numpy ``(re, im)`` (the output no longer tiles evenly
    over the mesh, so it is gathered; the heavy lifting — the transform
    itself — is what runs distributed).
    """
    yr, yi = fft_sharded(np.asarray(x), mesh, axis_name, backend)
    keep = np.shape(x)[-1] // 2 + 1
    return np.asarray(yr)[..., :keep], np.asarray(yi)[..., :keep]


def irfft_sharded(re, im, n, mesh, axis_name="t", backend=None):
    """Distributed inverse of :func:`rfft_sharded` (length-``n`` real out).

    The hermitian extension of the ``n//2 + 1``-bin input happens on the
    host (numpy), the ``n``-point inverse transform runs distributed.
    Matches ``numpy.fft.irfft`` semantics including zero-padding of short
    inputs (reference ``fft_analysis.py:548``).
    """
    re = np.array(re, dtype=np.float64)
    im = np.array(im, dtype=np.float64)
    need = n // 2 + 1
    if re.shape[-1] < need:
        pad = [(0, 0)] * (re.ndim - 1) + [(0, need - re.shape[-1])]
        re = np.pad(re, pad)
        im = np.pad(im, pad)
    else:
        re = re[..., :need]
        im = im[..., :need]
    im[..., 0] = 0.0
    if n % 2 == 0:
        im[..., -1] = 0.0
    body = slice(1, need - 1) if n % 2 == 0 else slice(1, need)
    full = np.concatenate([re + 1j * im,
                           (re[..., body] - 1j * im[..., body])[..., ::-1]],
                          axis=-1)
    yr, _ = ifft_sharded(full, mesh, axis_name, backend)
    return np.asarray(yr)


def axis_swap(x, mesh, axis_name, sharded_axis, target_axis):
    """Ulysses-style re-shard: move the partitioned dimension of ``x`` from
    ``sharded_axis`` to ``target_axis`` with one all-to-all.

    Both axes must be divisible by the shard count.  Returns a device array
    sharded on ``target_axis``; values are unchanged.
    """
    d = mesh.shape[axis_name]
    sharded_axis = sharded_axis % x.ndim
    target_axis = target_axis % x.ndim
    if sharded_axis == target_axis:
        return x
    if x.shape[sharded_axis] % d or x.shape[target_axis] % d:
        raise ValueError(
            f"axes {x.shape[sharded_axis]}, {x.shape[target_axis]} must both "
            f"divide by {d} shards")

    in_spec = [None] * x.ndim
    in_spec[sharded_axis] = axis_name
    out_spec = [None] * x.ndim
    out_spec[target_axis] = axis_name

    def body(xb):
        return lax.all_to_all(xb, axis_name, split_axis=target_axis,
                              concat_axis=sharded_axis, tiled=True)

    x = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P(*in_spec)))
    with mesh:
        return shard_map(body, mesh, in_specs=(P(*in_spec),),
                         out_specs=P(*out_spec))(x)


def hilbert_sharded(x, mesh, axis_name="t", backend=None):
    """Distributed analytic signal ``x + j H[x]`` along the last axis.

    The reference's Hilbert transform (``hilbert.py:22-67``) at beyond-
    one-chip lengths: distributed forward FFT (four-step, or Bluestein
    when ``d^2 !| N``), the analytic spectral mask applied ELEMENTWISE on
    the contiguous frequency shards where they live (no gather), then the
    distributed inverse — everything stays a sharded real pair on device.
    Returns ``(zr, zi)`` sharded along ``axis_name``.
    """
    backend = _resolve_pair_backend(backend)
    n = np.shape(x)[-1]
    yr, yi = fft_sharded(x, mesh, axis_name, backend)

    from ..hilbert import analytic_mask
    # the 1-D mask shards along the frequency axis and broadcasts over
    # any leading batch axes of yr/yi
    hj = jax.device_put(jnp.asarray(analytic_mask(n), yr.dtype),
                        NamedSharding(mesh, P(axis_name)))
    return _run_pair(yr * hj, yi * hj, mesh, axis_name, backend,
                     inverse=True)
