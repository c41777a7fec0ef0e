"""Multi-chip scaling layer: mesh construction, sharded Welch (SP/DP with
ppermute halos + psum averaging), and time-sharded overlap-save FIR."""

from .mesh import make_mesh, shard_map, P, Mesh, NamedSharding
from .welch import welch_psd_sharded, plan_shard_segments
from .fir import fir_filter_sharded

__all__ = ["make_mesh", "shard_map", "P", "Mesh", "NamedSharding",
           "welch_psd_sharded", "plan_shard_segments", "fir_filter_sharded"]
