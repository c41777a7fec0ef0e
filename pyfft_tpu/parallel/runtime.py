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

import numpy as np
import jax
from jax.sharding import Mesh

__all__ = ["init_distributed", "make_host_mesh", "scaling_report"]

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


def scaling_report(mesh):
    """Axis sizes + which link each collective rides (for logs)."""
    sizes = dict(mesh.shape)
    return {
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
