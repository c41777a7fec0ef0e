# Import-satisfying stand-in for the reference's pedagogical dft module,
# whose genuine source is py2-broken (print statement dft.py:200, undefined
# bitrev :268) and cannot exec under py3.  Only ccf.fftconv/fftcorr consume
# these names; numpy's FFT is a behavior-identical oracle for them.
import numpy as _np

def fft(x, *a, **k):
    return _np.fft.fft(_np.asarray(x))

def ifft(x, *a, **k):
    return _np.fft.ifft(_np.asarray(x))
