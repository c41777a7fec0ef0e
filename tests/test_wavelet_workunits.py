"""Wavelet CWT (ridge frequency, reconstruction, chirp tracking) and the
retriable WorkQueue."""
import numpy as np
import pytest

from pyfft_tpu import wavelet as wv
from pyfft_tpu.utils.workunits import WorkQueue


def test_cwt_ridge_frequency():
    fs, n, f0 = 1000.0, 4096, 50.0
    t = np.arange(n) / fs
    x = np.sin(2 * np.pi * f0 * t)
    W, scales, freqs, coi = wv.cwt(x, dt=1 / fs)
    power = wv.global_spectrum(W)
    fpk = freqs[int(np.argmax(power))]
    assert abs(fpk - f0) / f0 < 0.1          # within the dj=1/8 scale step
    assert W.shape == (len(scales), n)
    assert coi.shape == (n,) and coi[0] == 0.0


def test_icwt_reconstruction():
    fs, n = 500.0, 2048
    rng = np.random.default_rng(0)
    t = np.arange(n) / fs
    x = (np.sin(2 * np.pi * 20 * t) + 0.5 * np.sin(2 * np.pi * 60 * t))
    W, scales, freqs, _ = wv.cwt(x, dt=1 / fs, dj=0.05)
    xr = wv.icwt(W, scales, dt=1 / fs, dj=0.05)
    # interior (COI-free) reconstruction within a few percent RMS
    core = slice(n // 4, 3 * n // 4)
    err = np.sqrt(np.mean((xr[core] - x[core]) ** 2)) / np.std(x[core])
    assert err < 0.1


def test_cwt_tracks_chirp():
    fs, n = 2000.0, 8192
    t = np.arange(n) / fs
    f_inst = 40.0 + 60.0 * t / t[-1]
    x = np.sin(2 * np.pi * np.cumsum(f_inst) / fs)
    W, scales, freqs, _ = wv.cwt(x, dt=1 / fs)
    # ridge frequency at 1/4 and 3/4 through the record
    for frac in (0.25, 0.75):
        idx = int(frac * n)
        fr = freqs[int(np.argmax(np.abs(W[:, idx])))]
        assert abs(fr - f_inst[idx]) / f_inst[idx] < 0.15


def test_workqueue_retry_resume(tmp_path):
    manifest = str(tmp_path / "m.jsonl")
    calls = {"n": 0}

    def flaky(item):
        calls["n"] += 1
        if item == "b" and calls["n"] < 3:
            raise RuntimeError("transient")
        if item == "c":
            raise RuntimeError("permanent")
        return item.upper()

    q = WorkQueue(manifest, retries=2)
    res = q.run(["a", "b", "c"], flaky)
    assert res == {"a": "A", "b": "B"}
    assert q.failed() == {"c"}

    # resume: done items skipped, failed item retried (still failing)
    calls2 = {"n": 0}

    def count_only(item):
        calls2["n"] += 1
        raise RuntimeError("still broken")

    q2 = WorkQueue(manifest, retries=0)
    q2.run(["a", "b", "c"], count_only)
    assert calls2["n"] == 1                  # only 'c' re-attempted
