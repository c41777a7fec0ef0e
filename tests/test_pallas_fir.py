"""Pallas streaming FIR kernel: parity vs numpy.convolve (interpret mode)."""
import numpy as np
import pytest

from pyfft_tpu.ops.pallas_fir import fir_pallas, PALLAS_FIR_MAX_TAPS
from pyfft_tpu import filters as flt


@pytest.mark.parametrize("ntaps", [7, 33, 129])
@pytest.mark.parametrize("nch,nt", [(1, 5000), (3, 4096), (9, 2048 * 3 + 17)])
def test_matches_numpy_convolve(ntaps, nch, nt):
    rng = np.random.default_rng(ntaps + nch)
    x = rng.standard_normal((nch, nt)).astype(np.float32)
    taps = flt.firwin(ntaps, 0.3).astype(np.float32)
    got = np.asarray(fir_pallas(x, taps))
    want = np.stack([np.convolve(x[c], taps, mode="full")[:nt]
                     for c in range(nch)])
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_1d_and_fir_filter_backend():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(3000).astype(np.float32)
    taps = flt.firwin(65, [0.1, 0.4], pass_zero=False)
    got = np.asarray(fir_pallas(x, taps))
    assert got.shape == (3000,)
    want = np.convolve(x, taps, mode="full")[:3000]
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    via_filter = flt.fir_filter(x, taps, backend="pallas")
    np.testing.assert_allclose(via_filter, got, rtol=1e-6, atol=1e-6)
    via_os = flt.fir_filter(x, taps)
    np.testing.assert_allclose(via_filter, via_os, rtol=2e-4, atol=2e-4)


def test_too_many_taps_raises():
    with pytest.raises(ValueError, match="overlap-save"):
        fir_pallas(np.zeros(100), np.zeros(PALLAS_FIR_MAX_TAPS + 1))


def test_block_rows_clamped_to_vmem_budget():
    """block_rows=1024 at 8 grouped channels would dispatch a 16.8 MiB
    double-buffered grid step — over the 16 MiB scoped-VMEM limit (observed
    Mosaic compile OOM on TPU v5e).  The clamp must shrink the blocking,
    and the result must stay exact."""
    from pyfft_tpu.ops.pallas_fir import _fit_block_rows
    assert _fit_block_rows(1024, 8, 2) <= 512
    assert _fit_block_rows(512, 8, 2) == 512      # production default fits
    assert _fit_block_rows(1024, 1, 2) == 1024    # single channel fits

    rng = np.random.default_rng(7)
    nch, nt = 8, 4096
    x = rng.standard_normal((nch, nt)).astype(np.float32)
    taps = flt.firwin(257, 0.3).astype(np.float32)
    got = np.asarray(fir_pallas(x, taps, block_rows=1024))
    want = np.stack([np.convolve(x[c], taps, mode="full")[:nt]
                     for c in range(nch)])
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fir_pallas_tiled_matches_rank2():
    """The tiled entry (fir_pallas_tiled on the tile_rows row view) must
    equal fir_pallas on the rank-2 layout — same kernel, zero retiling
    passes — including a non-multiple-of-128 signal length (padding) and
    a chained two-filter pipeline (causality: the padded ring-out never
    reaches t < nt)."""
    from pyfft_tpu.ops.pallas_fir import (fir_pallas_tiled, tile_rows,
                                          untile_rows)
    rng = np.random.default_rng(3)
    taps1 = flt.firwin(129, [0.05, 0.45], pass_zero=False)
    taps2 = flt.firwin(65, 0.3)
    for nch, nt in [(1, 1 << 16), (8, 1 << 16), (3, 100_000)]:
        x = rng.standard_normal((nch, nt)).astype(np.float32)
        xr, nt_out = tile_rows(x)
        assert nt_out == nt
        got = untile_rows(fir_pallas_tiled(xr, taps1), nt)
        want = np.asarray(fir_pallas(x, taps1))
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=2e-5, atol=2e-5)
        # chained: filter twice on the row view, compare to twice rank-2
        got2 = untile_rows(
            fir_pallas_tiled(fir_pallas_tiled(xr, taps1), taps2), nt)
        want2 = np.asarray(fir_pallas(want, taps2))
        scl = np.abs(want2).max() + 1e-30
        np.testing.assert_allclose(np.asarray(got2) / scl, want2 / scl,
                                   atol=5e-5)


def test_fir_pallas_tiled_rejects_bad_layout():
    from pyfft_tpu.ops.pallas_fir import fir_pallas_tiled
    with pytest.raises(ValueError, match="tile_rows"):
        fir_pallas_tiled(np.zeros((2, 100)), np.ones(5))


def test_fir_block_rows_not_multiple_of_8():
    """Non-multiple-of-8 block_rows must still compute correctly (the
    inline-halo window needs 8-row alignment — rows are sanitized, not
    asserted; round-5 review finding)."""
    rng = np.random.default_rng(5)
    nch, nt = 2, 20_000
    x = rng.standard_normal((nch, nt)).astype(np.float32)
    taps = flt.firwin(65, 0.25)
    want = np.stack([np.convolve(x[c], taps, "full")[:nt]
                     for c in range(nch)])
    for br in (100, 12, 7):
        got = np.asarray(fir_pallas(x, taps, block_rows=br))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    # tiled entry with an awkward tile_rows blocking
    from pyfft_tpu.ops.pallas_fir import (fir_pallas_tiled, tile_rows,
                                          untile_rows)
    xr, nt_out = tile_rows(x, block_rows=100)       # rounded up to 104
    got = np.asarray(untile_rows(fir_pallas_tiled(xr, taps), nt_out))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
