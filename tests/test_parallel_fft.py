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
