"""Distributed four-step FFT: sharded == single-device numpy.fft, exactly
(the §4 test-plan multi-device criterion), plus the Ulysses axis-swap."""
import numpy as np
import pytest

import jax

from pyfft_tpu.parallel import mesh as pmesh
from pyfft_tpu.parallel.fft import (fft_sharded, ifft_sharded, axis_swap,
                                    four_step_factor)


needs8 = pytest.mark.skipif(len(jax.devices()) < 8,
                            reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def tmesh():
    return pmesh.make_mesh(ch=1, t=len(jax.devices()))


def _join(pair):
    return np.asarray(pair[0]) + 1j * np.asarray(pair[1])


def test_four_step_factor():
    n1, n2 = four_step_factor(1024, 8)
    assert n1 * n2 == 1024 and n1 % 8 == 0 and n2 % 8 == 0
    with pytest.raises(ValueError):
        four_step_factor(1000, 8)          # 64 does not divide 1000


@needs8
@pytest.mark.parametrize("n", [1024, 4096, 2 * 64 * 9])   # incl. non-pow2
def test_fft_sharded_matches_numpy(tmesh, n):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    got = _join(fft_sharded(x, tmesh))
    np.testing.assert_allclose(got, np.fft.fft(x), rtol=1e-9, atol=1e-7)


@needs8
def test_fft_sharded_real_input_batched(tmesh):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 1024))
    got = _join(fft_sharded(x, tmesh))
    np.testing.assert_allclose(got, np.fft.fft(x, axis=-1),
                               rtol=1e-9, atol=1e-7)


@needs8
def test_ifft_roundtrip(tmesh):
    rng = np.random.default_rng(2)
    x = rng.standard_normal(4096) + 1j * rng.standard_normal(4096)
    X = _join(fft_sharded(x, tmesh))
    back = _join(ifft_sharded(X, tmesh))
    np.testing.assert_allclose(back, x, rtol=1e-9, atol=1e-8)


@needs8
def test_axis_swap_values_and_sharding(tmesh):
    rng = np.random.default_rng(3)
    x = rng.standard_normal((16, 24)).astype(np.float32)
    y = axis_swap(x, tmesh, "t", sharded_axis=0, target_axis=1)
    np.testing.assert_array_equal(np.asarray(y), x)
    # the partitioned dim moved: shard shape is full rows, 1/8 columns
    shard = y.addressable_shards[0].data
    assert shard.shape == (16, 3)

    with pytest.raises(ValueError):
        axis_swap(rng.standard_normal((16, 7)), tmesh, "t", 0, 1)


@needs8
def test_fft_sharded_bluestein_non_d2_length():
    """Lengths without a d^2 factorization route through the distributed
    Bluestein chirp-z path and still match numpy exactly."""
    rng = np.random.default_rng(9)
    mesh = pmesh.make_mesh(ch=1, t=8)
    for n in (1000, 768 + 64):      # 1000 = 8 * 125 (8^2 !| 1000), 832
        z = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        yr, yi = fft_sharded(z, mesh)
        ref = np.fft.fft(z)
        np.testing.assert_allclose(np.asarray(yr), ref.real, rtol=1e-9,
                                   atol=1e-8 * np.abs(ref).max())
        np.testing.assert_allclose(np.asarray(yi), ref.imag, rtol=1e-9,
                                   atol=1e-8 * np.abs(ref).max())
        xr, xi = ifft_sharded(np.asarray(yr) + 1j * np.asarray(yi), mesh)
        np.testing.assert_allclose(np.asarray(xr), z.real, atol=1e-9)
        np.testing.assert_allclose(np.asarray(xi), z.imag, atol=1e-9)


@needs8
def test_rfft_irfft_sharded_roundtrip():
    rng = np.random.default_rng(10)
    mesh = pmesh.make_mesh(ch=1, t=8)
    n = 4096
    x = rng.standard_normal(n)
    from pyfft_tpu.parallel.fft import rfft_sharded, irfft_sharded
    re, im = rfft_sharded(x, mesh)
    ref = np.fft.rfft(x)
    np.testing.assert_allclose(re, ref.real, rtol=1e-9,
                               atol=1e-8 * np.abs(ref).max())
    np.testing.assert_allclose(im, ref.imag, rtol=1e-9,
                               atol=1e-8 * np.abs(ref).max())
    xb = irfft_sharded(re, im, n, mesh)
    np.testing.assert_allclose(xb, x, atol=1e-9)
    # truncated-spectrum zero-pad semantics (numpy irfft contract)
    xt = irfft_sharded(re[:n // 4], im[:n // 4], n, mesh)
    np.testing.assert_allclose(
        xt, np.fft.irfft(ref[:n // 4], n=n), atol=1e-9)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("n", [64 * 64, 800])   # four-step and Bluestein
def test_hilbert_sharded_matches_scipy(n):
    """Distributed analytic signal (mask applied on the frequency shards
    between the distributed forward and inverse transforms) must match
    scipy.signal.hilbert and the single-device pyfft_tpu.hilbert."""
    from scipy.signal import hilbert as sp_hilbert
    from pyfft_tpu.parallel import hilbert_sharded, make_mesh
    from pyfft_tpu.hilbert import hilbert as h1
    rng = np.random.default_rng(3)
    x = rng.standard_normal(n)
    mesh = make_mesh(ch=1, t=8)
    zr, zi = hilbert_sharded(x, mesh)
    z = np.asarray(zr) + 1j * np.asarray(zi)
    want = sp_hilbert(x)
    scl = np.abs(want).max()
    np.testing.assert_allclose(z, want, atol=1e-8 * scl)
    np.testing.assert_allclose(z, np.asarray(h1(x)), atol=1e-8 * scl)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_envelope_phase_mesh_matches_single():
    """Public envelope_phase(mesh=...) == single-device demod."""
    from pyfft_tpu.parallel import make_mesh
    from pyfft_tpu.hilbert import envelope_phase
    n = 64 * 64
    t = np.linspace(0, 6 * np.pi, n, endpoint=False)
    x = ((1 + 0.4 * np.sin(t)) * np.sin(60 * t)).astype(np.float32)
    env1, ph1 = envelope_phase(x)
    mesh = make_mesh(ch=1, t=8)
    env2, ph2 = envelope_phase(x, mesh=mesh)
    np.testing.assert_allclose(env2, env1, atol=2e-5 * np.abs(env1).max())
    # compare phase modulo 2*pi (f32 jitter at the +/-pi branch cut)
    dphi = np.angle(np.exp(1j * (ph2.astype(np.float64)
                                 - ph1.astype(np.float64))))
    np.testing.assert_allclose(dphi, 0.0, atol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_envelope_phase_mesh_multichannel():
    """Multi-channel input on the mesh path must batch over leading axes
    (round-5 review finding: it silently flattened to channel 0)."""
    from pyfft_tpu.parallel import make_mesh
    from pyfft_tpu.hilbert import envelope_phase
    n = 64 * 64
    t = np.linspace(0, 6 * np.pi, n, endpoint=False)
    x = np.stack([(1 + 0.4 * np.sin(t)) * np.sin(60 * t),
                  (1 + 0.2 * np.sin(2 * t)) * np.sin(80 * t)]
                 ).astype(np.float32)
    mesh = make_mesh(ch=1, t=8)
    env1, ph1 = envelope_phase(x)
    env2, ph2 = envelope_phase(x, mesh=mesh)
    assert env2.shape == env1.shape == (2, n)
    np.testing.assert_allclose(env2, env1, atol=2e-5 * np.abs(env1).max())
    # non-last transform axis is rejected loudly, not silently wrong
    import pytest as _pytest
    with _pytest.raises(ValueError, match="LAST axis"):
        envelope_phase(x.T, axes=0, mesh=mesh)
