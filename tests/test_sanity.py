"""Sanitizer utilities + the jit/eager and sharded/single consistency of
the framework's own Welch core (the §5.2 acceptance check)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyfft_tpu.utils import sanity
from pyfft_tpu import segmentation as seg
from pyfft_tpu import parallel as par


def test_check_jit_eager_pass_and_fail():
    sanity.check_jit_eager(lambda x: (x * 2).sum(), jnp.arange(8.0))

    # a function whose jit/eager results genuinely differ
    state = {"n": 0}

    def impure(x):
        state["n"] += 1
        return x + state["n"]

    with pytest.raises(AssertionError):
        sanity.check_jit_eager(impure, jnp.zeros(3))


def test_assert_finite_paths():
    sanity.assert_finite({"a": np.ones(3)})
    with pytest.raises(FloatingPointError, match="a"):
        sanity.assert_finite({"a": np.array([1.0, np.nan])})


def test_nan_guard():
    with pytest.raises(FloatingPointError):
        with sanity.nan_guard():
            jnp.log(jnp.asarray(-1.0)) + 1.0
    assert not jax.config.jax_debug_nans


def test_welch_core_jit_eager_consistent():
    """The flagship kernel computes identically traced and eager."""
    from pyfft_tpu.streaming import _block_sums

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(2048))
    y = jnp.asarray(rng.standard_normal((2, 2048)))
    win = jnp.asarray(np.hanning(257)[:-1])

    def core(x, y, win):
        return _block_sums(x, y, win, navr=15, nwins=256, hop=128,
                           nnyquist=129, backend="xla")

    out_eager = core(x, y, win)
    out_jit = jax.jit(core)(x, y, win)
    for a, b in zip(out_jit, out_eager):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-12)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_welch_matches_single():
    rng = np.random.default_rng(1)
    nt, nch = 2048, 2
    x = rng.standard_normal(nt)
    y = rng.standard_normal((nch, nt))
    plan = seg.plan_segments(nt, nwins=128, windowoverlap=0.5)
    win = np.hanning(plan.nwins + 1)[:-1]
    mesh = par.make_mesh(ch=2, t=4)

    def sharded():
        _, Pxx, Pyy, Pxy = par.welch_psd_sharded(
            x, y, win, plan, fs=1e3, mesh=mesh, onesided=True,
            detrend_style=1)
        return np.asarray(Pxx), np.asarray(Pyy), np.asarray(Pxy)

    def single():
        from pyfft_tpu.spectral import welch_cross_spectra
        out = welch_cross_spectra(x, y, win, fs=1e3, plan=plan,
                                  onesided=True, detrend_style=1)
        # (nf, nch) -> channel-first to match the sharded layout
        return (np.real(out["Pxx"]), np.real(out["Pyy"]).T, out["Pxy"].T)

    sanity.check_sharded_consistency(sharded, single, rtol=1e-9, atol=1e-12)
