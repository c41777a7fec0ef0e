# The reference's Doppler.py imports `FFT.stft.stft`, a module that never
# shipped (the function lives in spectrogram.py — reference Doppler.py:24).
# This shim satisfies the import with the genuine spectrogram source.
from .spectrogram import stft  # noqa: F401
