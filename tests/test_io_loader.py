"""Native shot-file loader: C++ vs NumPy parity, decimation, streaming."""
import numpy as np
import pytest

from pyfft_tpu.io import ShotLoader, stream_welch, native_available


NCH, NT = 4, 50000


@pytest.fixture(scope="module", params=["int16", "float32", "float64"])
def shotfile(request, tmp_path_factory):
    dtype = request.param
    rng = np.random.default_rng(hash(dtype) % 2 ** 31)
    sig = rng.standard_normal((NT, NCH)) * 100.0
    arr = sig.astype({"int16": np.int16, "float32": np.float32,
                      "float64": np.float64}[dtype])
    path = tmp_path_factory.mktemp("shots") / f"shot_{dtype}.bin"
    header = b"DAQHDR\x00\x01" * 4          # 32-byte fake header
    with open(path, "wb") as f:
        f.write(header)
        f.write(arr.tobytes())               # interleaved frames
    return str(path), dtype, arr


def test_native_lib_builds():
    assert native_available(), "g++ toolchain present; native build failed"


def test_read_parity_native_vs_numpy(shotfile):
    path, dtype, arr = shotfile
    with ShotLoader(path, NCH, dtype, header_bytes=32) as nat, \
            ShotLoader(path, NCH, dtype, header_bytes=32,
                       force_numpy=True) as ref:
        assert nat.native and not ref.native
        assert nat.nsamples == ref.nsamples == NT
        for start, count, decim in [(0, NT, 1), (1000, 8192, 1),
                                    (17, 9999, 3), (0, NT, 8)]:
            a = nat.read(start, count, decim)
            b = ref.read(start, count, decim)
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-4)


def test_read_values(shotfile):
    path, dtype, arr = shotfile
    with ShotLoader(path, NCH, dtype, header_bytes=32) as ld:
        blk = ld.read(100, 50)
        np.testing.assert_allclose(
            blk, arr[100:150].astype(np.float32).T, rtol=1e-6)
        # decimation = boxcar mean of frames
        dec = ld.read(0, 40, decim=4)
        want = arr[:40].astype(np.float32).reshape(10, 4, NCH).mean(1).T
        np.testing.assert_allclose(dec, want, rtol=1e-5, atol=1e-3)


def test_stream_covers_file(shotfile):
    path, dtype, arr = shotfile
    with ShotLoader(path, NCH, dtype, header_bytes=32) as ld:
        total = 0
        for blk in ld.stream(block=9000):
            assert blk.shape[0] == NCH
            total += blk.shape[1]
        assert total == NT


def test_stream_welch_end_to_end(tmp_path):
    """Synthesize a tone capture, stream it through Welch, find the line."""
    fs, nt, nch = 5e4, 1 << 17, 2
    t = np.arange(nt) / fs
    rng = np.random.default_rng(0)
    sig = np.stack([np.sin(2 * np.pi * 2500.0 * t),
                    0.5 * np.sin(2 * np.pi * 2500.0 * t - 0.9)], axis=1)
    sig = (1000 * (sig + 0.02 * rng.standard_normal((nt, nch))))
    path = tmp_path / "tone.bin"
    with open(path, "wb") as f:
        f.write(sig.astype(np.int16).tobytes())

    with ShotLoader(str(path), nch, "int16") as ld:
        res = stream_welch(ld, nwins=4096, fs=fs, block=1 << 15)
    pk = int(np.argmax(res.Pxx))
    assert abs(res.freq[pk] - 2500.0) < fs / 4096
    assert res.Cxy2[1, pk].real > 0.95
    assert abs(res.phi_xy[1, pk] + 0.9) < 0.02


@pytest.mark.parametrize("force_numpy", [False, True])
@pytest.mark.parametrize("decim", [1, 4])
def test_stream_prefetch_matches_sync(shotfile, force_numpy, decim):
    """Async prefetch (C++ ring buffer on the native path, reader thread on
    the numpy path) must yield bit-identical blocks to the synchronous
    stream, including the short trailing block."""
    path, dtype, arr = shotfile
    with ShotLoader(path, NCH, dtype, header_bytes=32,
                    force_numpy=force_numpy) as ld:
        sync = list(ld.stream(block=9000, decim=decim))
        pre = list(ld.stream(block=9000, decim=decim, prefetch=3))
    assert len(sync) == len(pre)
    for a, b in zip(sync, pre):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stream_welch_prefetch(tmp_path):
    """stream_welch over a prefetching stream gives the same spectra."""
    fs, nt, nch = 5e4, 1 << 16, 2
    t = np.arange(nt) / fs
    sig = np.stack([np.sin(2 * np.pi * 2500.0 * t),
                    0.5 * np.sin(2 * np.pi * 2500.0 * t - 0.9)], axis=1)
    path = tmp_path / "tone2.bin"
    with open(path, "wb") as f:
        f.write((1000 * sig).astype(np.int16).tobytes())
    from pyfft_tpu.streaming import StreamingWelch
    with ShotLoader(str(path), nch, "int16") as ld:
        sw = StreamingWelch(nwins=2048, fs=fs, nch=nch)
        for blk in ld.stream(block=1 << 14, prefetch=2):
            sw.push(blk[0], blk)
        res = sw.result()
    pk = int(np.argmax(res.Pxx))
    assert abs(res.freq[pk] - 2500.0) < fs / 2048
