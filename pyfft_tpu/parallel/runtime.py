"""Multi-host runtime bootstrap (SURVEY §5.8).

The reference is a single NumPy process; the TPU framework's communication
backend is the JAX distributed runtime: ``jax.distributed.initialize()``
per host, a ``('host', 'ch', 't')`` mesh whose leading axis spans hosts
(collectives over it ride DCN; the inner axes stay within a slice on ICI).

- :func:`init_distributed`: idempotent wrapper over
  ``jax.distributed.initialize`` (env-driven on TPU pods, explicit
  coordinator for CPU/GPU clusters);
- :func:`make_host_mesh`: the three-axis mesh with hosts outermost, so
  channel-DP crosses hosts (embarrassingly parallel, DCN-tolerant) while
  time-axis halos (ppermute) and segment psums stay intra-host on ICI;
- :func:`scaling_report`: per-axis device counts + the collective->link
  mapping, for the observability log.
"""
from __future__ import annotations

import time

import numpy as np
import jax
from jax.sharding import Mesh

__all__ = ["init_distributed", "make_host_mesh", "scaling_report",
           "measure_scaling"]

_initialized = False


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Initialize the JAX distributed runtime (idempotent).

    On TPU pods all arguments come from the environment; pass them
    explicitly for CPU/GPU multi-process runs.  Single-process (the common
    dev case) is a no-op.
    """
    global _initialized
    if _initialized:
        return
    if num_processes is None and coordinator_address is None:
        if jax.process_count() == 1:
            _initialized = True
            return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True


def make_host_mesh(ch=1, t=None):
    """``('host', 'ch', 't')`` mesh: hosts outermost (DCN), ch/t within a
    host (ICI).  ``t`` defaults to all remaining local devices."""
    devices = jax.devices()
    nproc = jax.process_count()
    per_host = len(devices) // nproc
    if t is None:
        t = per_host // ch
    if ch * t != per_host:
        raise ValueError(
            f"ch*t = {ch * t} != {per_host} devices per host")
    arr = np.array(devices).reshape(nproc, ch, t)
    return Mesh(arr, axis_names=("host", "ch", "t"))


def scaling_report(mesh, measure=False, **measure_kw):
    """Axis sizes, the collective->link mapping, and (optionally) a
    *measured* scaling-efficiency table from :func:`measure_scaling`."""
    sizes = dict(mesh.shape)
    rep = {
        "axes": sizes,
        "devices": int(np.prod(list(sizes.values()))),
        "collectives": {
            "psum(welch average)": "ICI ('t')"
            if "t" in sizes else "n/a",
            "ppermute(segment/FIR halo)": "ICI ('t')"
            if "t" in sizes else "n/a",
            "all_to_all(four-step FFT)": "ICI ('t')"
            if "t" in sizes else "n/a",
            "all_gather(final spectra)": "DCN ('host')"
            if "host" in sizes else "n/a",
        },
    }
    if measure:
        rep["measured"] = measure_scaling(**measure_kw)
    return rep


def measure_scaling(nt=1 << 20, nch=4, nwins=1024, iters=5, shard_counts=None,
                    fft_backend=None):
    """Measure Welch throughput vs time-shard count; returns an efficiency
    table (the BASELINE ">=85% at 2 hosts" acceptance harness).

    Runs :func:`pyfft_tpu.parallel.welch_psd_sharded` on ``('ch'=1,
    't'=d)`` meshes for each ``d`` in ``shard_counts`` (default: powers of
    two up to the device count) and reports samples/s plus efficiency
    relative to linear scaling from the smallest count.  On a virtual CPU
    mesh the devices share physical cores, so the efficiency numbers there
    only validate the harness; quote real numbers from multi-chip runs.
    """
    from .. import segmentation as seg
    from .mesh import make_mesh
    from .welch import welch_psd_sharded

    ndev = len(jax.devices())
    if shard_counts is None:
        shard_counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= ndev]
    rng = np.random.default_rng(0)
    x = rng.standard_normal(nt).astype(np.float32)
    y = rng.standard_normal((nch, nt)).astype(np.float32)
    plan = seg.plan_segments(nt, nwins=nwins, windowoverlap=0.5)
    win = np.hanning(nwins + 1)[:-1].astype(np.float32)

    rows = []
    for d in shard_counts:
        mesh = make_mesh(ch=1, t=d, devices=jax.devices()[:d])
        welch_psd_sharded(x, y, win, plan, 1e6, mesh,
                          fft_backend=fft_backend)        # warm compile
        t0 = time.perf_counter()
        for _ in range(iters):
            welch_psd_sharded(x, y, win, plan, 1e6, mesh,
                              fft_backend=fft_backend)
        dt = (time.perf_counter() - t0) / iters
        rows.append({"t_shards": d, "samples_per_s": nch * nt / dt,
                     "wall_s": dt})
    base = rows[0]
    for r in rows:
        ideal = base["samples_per_s"] * (r["t_shards"] / base["t_shards"])
        r["efficiency"] = round(r["samples_per_s"] / ideal, 3)
    return rows
