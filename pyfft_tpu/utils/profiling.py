"""Tracing / profiling / roofline accounting (SURVEY §5.1).

The reference's only observability is ``verbose`` prints
(fft_analysis.py:263-265) and an ASCII progress bar (spectrogram.py:82-97).
This module provides the TPU-native replacements the survey specifies:

- :func:`stage`: ``jax.named_scope`` + wall-clock context manager, so
  pipeline stages show up named in XLA traces and in host logs;
- :func:`trace`: one-call ``jax.profiler`` capture around a callable,
  writing a TensorBoard-loadable trace directory;
- FLOP/byte accounting for the framework's hot kernels
  (:func:`fft_flops`, :func:`welch_flops`, :func:`fir_flops`) and
  :func:`roofline` — achieved fraction of a device's peak given measured
  wall time (the BASELINE "≥80% of roofline" metric);
- :func:`measure`: robust wall-time of a jitted callable with compile-call
  separation and device synchronization via a scalar checksum (the remote
  TPU tunnel under-reports with ``block_until_ready`` alone).
"""
from __future__ import annotations

import contextlib
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["stage", "trace", "fft_flops", "welch_flops", "fir_flops",
           "roofline", "measure", "device_peaks",
           "measure_pipeline_overlap"]


_LOG = []


@contextlib.contextmanager
def stage(name, log=True):
    """Named pipeline stage: shows up in XLA/profiler traces and records
    host wall-clock into the module log (``profiling._LOG``)."""
    t0 = time.perf_counter()
    with jax.named_scope(name):
        yield
    dt = time.perf_counter() - t0
    if log:
        _LOG.append({"stage": name, "wall_s": dt})


def stage_log():
    """The accumulated [(stage, wall_s)] records (host-side, append-only)."""
    return list(_LOG)


@contextlib.contextmanager
def trace(logdir):
    """Capture a ``jax.profiler`` trace of the enclosed block."""
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# --------------------------------------------------------------------------- #
# FLOP models (complex FFT: 5 N log2 N, the standard radix-2 count)
# --------------------------------------------------------------------------- #

def fft_flops(n, batch=1, real=False):
    """FLOPs of one (batched) length-``n`` FFT; real transforms halve."""
    f = 5.0 * n * np.log2(max(n, 2))
    return batch * (f / 2.0 if real else f)


def welch_flops(navr, nwins, nch=1):
    """Welch chain: window multiply + rFFT + power + accumulate per segment
    for the reference channel and ``nch`` signal channels."""
    per_seg = (nwins                      # window multiply
               + fft_flops(nwins, real=True)
               + 4 * (nwins // 2 + 1))    # |X|^2 + cross-power terms
    return navr * per_seg * (1 + nch)


def fir_flops(nt, ntaps, nch=1, method="overlap-save"):
    """FIR filtering cost: direct is 2*nt*ntaps; overlap-save is the
    two-FFT-per-block form."""
    if method == "direct":
        return 2.0 * nt * ntaps * nch
    nfft = 2 ** int(np.ceil(np.log2(4 * ntaps)))
    hop = nfft - ntaps + 1
    nblocks = int(np.ceil(nt / hop))
    per_block = 2 * fft_flops(nfft) + 6 * nfft
    return nblocks * per_block * nch


_PEAKS = {
    # (bf16 matmul TFLOP/s, f32 vector TFLOP/s, HBM GB/s) per chip.
    # NOTE: these are the *bf16* MXU peaks — v5e advertises 394 TOPS only
    # for int8; its bf16 matmul peak is 197 TFLOP/s.  Using the int8 number
    # would flatter every roofline fraction by 2x.
    "v5e": (197.0, 0.9 * 98.5, 819.0),
    "v5p": (459.0, 0.9 * 229.0, 2765.0),
    "v4": (275.0, 0.9 * 137.0, 1228.0),
    "cpu": (0.2, 0.1, 50.0),
}


def device_peaks(kind=None):
    """(matmul TFLOP/s, vector TFLOP/s, HBM GB/s) for the current device."""
    if kind is None:
        dev = jax.devices()[0]
        kind = getattr(dev, "device_kind", "cpu").lower()
        for key in _PEAKS:
            if key in kind:
                kind = key
                break
        else:
            kind = "cpu" if dev.platform == "cpu" else "v5e"
    return _PEAKS[kind]


# Interconnect book values: (ICI one-way GB/s per link, DCN GB/s per host).
# ICI from the public per-generation specs (v5e 2-D torus, 45 GB/s/link
# one-way; v5p 3-D torus, 90 GB/s/link); DCN assumes a 100 Gbps host NIC —
# conservative for projection purposes.
_LINK_PEAKS = {
    "v5e": (45.0, 12.5),
    "v5p": (90.0, 12.5),
    "v4": (45.0, 12.5),
    "cpu": (10.0, 10.0),
}


def interconnect_peaks(kind=None):
    """(ICI one-way GB/s per link, DCN GB/s per host) for ``kind`` (defaults
    to the current device family; virtual CPU meshes project as 'v5e'
    because that is the hardware the framework targets — pass
    ``kind='cpu'`` explicitly for the host-interconnect entry)."""
    if kind is None:
        dev = jax.devices()[0]
        dk = getattr(dev, "device_kind", "cpu").lower()
        for key in _LINK_PEAKS:
            if key != "cpu" and key in dk:
                return _LINK_PEAKS[key]
        return _LINK_PEAKS["v5e"]      # cpu / unknown: project the target HW
    return _LINK_PEAKS[kind]


def roofline(flops, bytes_moved, wall_s, kind=None, unit="matmul"):
    """Achieved fraction of the device's compute/memory roofline.

    Returns a dict with achieved TFLOP/s, GB/s, the bound ('compute' or
    'memory') and ``fraction`` of the relevant peak — the BASELINE's
    ≥0.8-of-roofline acceptance metric.
    """
    mm, vec, bw = device_peaks(kind)
    peak = mm if unit == "matmul" else vec
    tflops = flops / wall_s / 1e12
    gbs = bytes_moved / wall_s / 1e9
    # which wall is closer at this arithmetic intensity?
    ai = flops / max(bytes_moved, 1)
    knee = peak * 1e12 / (bw * 1e9)
    bound = "compute" if ai >= knee else "memory"
    frac = (tflops / peak) if bound == "compute" else (gbs / bw)
    return {"achieved_tflops": tflops, "achieved_gbs": gbs,
            "bound": bound, "fraction": frac,
            "peak_tflops": peak, "peak_gbs": bw}


def measure(fn, *args, iters=10, warmup=2):
    """Wall-time a device callable; syncs through a scalar checksum."""
    def run_once():
        out = fn(*args)
        leaves = jax.tree_util.tree_leaves(out)
        chk = sum(jnp.sum(jnp.abs(x)) for x in leaves
                  if hasattr(x, "dtype"))
        return float(chk)

    for _ in range(warmup):
        run_once()
    t0 = time.perf_counter()
    for _ in range(iters):
        run_once()
    return (time.perf_counter() - t0) / iters


def measure_pipeline_overlap(nrows=65536, N=1152, rows_blk=512, passes=12,
                             iters=8, interpret=None):
    """Measure the Pallas grid pipeline's DMA/compute overlap (the PP row
    of SURVEY §2.3: intra-device pipelining, double-buffered block streaming
    overlapping the next block's HBM DMA with the current block's matmuls —
    the role the reference's staged detrend→window→FFT→average chain plays
    serially, fft_pwelch body fft_analysis.py:250-505).

    Times three kernels with identical grid/blocking over an
    ``(nrows, N)`` f32 array:

    - ``mem``   — streams every block from HBM, accumulates a row-sum
      (pure DMA; gives achieved HBM read bandwidth);
    - ``mxu``   — the same matmul chain the fused kernels run per block,
      but over a single VMEM-resident block (pure compute);
    - ``fused`` — streams AND computes (the production shape).

    With a double-buffered pipeline ``t_fused ≈ max(t_mem, t_mxu)``; with
    no overlap ``t_fused ≈ t_mem + t_mxu``.  Returns the three times, the
    implied bandwidth/TFLOPs, and ``overlap_fraction`` =
    ``(t_mem + t_mxu - t_fused) / min(t_mem, t_mxu)`` (1.0 = full overlap).
    """
    from functools import partial
    from jax.experimental import pallas as pl

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    assert nrows % rows_blk == 0 and rows_blk % 128 == 0
    nb = nrows // rows_blk
    groups = rows_blk // 128
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((nrows, N)), jnp.float32)
    T = jnp.asarray(
        np.random.default_rng(1).standard_normal((128, 128)) / 16.0,
        jnp.bfloat16)

    def mem_kernel(x_ref, t_ref, o_ref):
        b = pl.program_id(0)
        acc = jnp.sum(x_ref[...], axis=0, keepdims=True)

        @pl.when(b == 0)
        def _():
            o_ref[...] = acc

        @pl.when(b != 0)
        def _():
            o_ref[...] += acc

    def work(blk, T):
        acc = jnp.zeros((128, N), jnp.float32)
        for g in range(groups):
            y = blk[g * 128:(g + 1) * 128].astype(jnp.bfloat16)
            for _ in range(passes):
                y = jnp.dot(T, y, preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16)
            acc = acc + y.astype(jnp.float32)
        return jnp.sum(acc, axis=0, keepdims=True)

    def fused_kernel(x_ref, t_ref, o_ref):
        b = pl.program_id(0)
        acc = work(x_ref[...], t_ref[...])

        @pl.when(b == 0)
        def _():
            o_ref[...] = acc

        @pl.when(b != 0)
        def _():
            o_ref[...] += acc

    def call(kernel, index_map):
        return pl.pallas_call(
            kernel, grid=(nb,),
            in_specs=[pl.BlockSpec((rows_blk, N), index_map),
                      pl.BlockSpec((128, 128), lambda b: (0, 0))],
            out_specs=pl.BlockSpec((1, N), lambda b: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
            interpret=interpret)

    stream = lambda b: (b, 0)
    resident = lambda b: (0, 0)          # same block each step: no DMA wall
    t_mem = measure(jax.jit(lambda a: call(mem_kernel, stream)(a, T)), x,
                    iters=iters)
    t_mxu = measure(jax.jit(lambda a: call(fused_kernel, resident)(a, T)),
                    x, iters=iters)
    t_fused = measure(jax.jit(lambda a: call(fused_kernel, stream)(a, T)),
                      x, iters=iters)
    bytes_read = 4 * nrows * N
    flops = 2.0 * nb * groups * passes * 128 * 128 * N
    overlap = (t_mem + t_mxu - t_fused) / max(min(t_mem, t_mxu), 1e-12)
    return {
        "t_mem_s": t_mem, "t_mxu_s": t_mxu, "t_fused_s": t_fused,
        "read_gbs": bytes_read / t_mem / 1e9,
        "mxu_tflops": flops / t_mxu / 1e12,
        "fused_vs_serial": t_fused / (t_mem + t_mxu),
        "overlap_fraction": float(np.clip(overlap, 0.0, 1.0)),
    }


def report(entries, path=None):
    """Write one-JSON-line perf records (samples/s, roofline fractions)."""
    lines = [json.dumps(e) for e in entries]
    if path is not None:
        with open(path, "a") as f:
            f.write("\n".join(lines) + "\n")
    return lines
