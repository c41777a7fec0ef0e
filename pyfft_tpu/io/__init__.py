"""IO tier: native streaming shot-file loader + HDF5 persistence hooks."""

from .loader import ShotLoader, stream_welch, native_available

__all__ = ["ShotLoader", "stream_welch", "native_available"]
