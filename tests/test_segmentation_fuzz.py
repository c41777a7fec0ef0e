"""Property-based fuzzing of the segmentation arithmetic against the
genuine reference formulas (fftanal._getNwins/_getNoverlap/_getNavr) and
the framing invariants the pipelines rely on."""
import numpy as np
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

from pyfft_tpu import segmentation as seg  # noqa: E402


@st.composite
def seg_params(draw):
    nsig = draw(st.integers(min_value=64, max_value=1 << 18))
    overlap = draw(st.sampled_from([0.0, 0.25, 0.5, 0.6180339887, 0.75,
                                    0.9]))
    navr = draw(st.integers(min_value=1, max_value=64))
    return nsig, overlap, navr


@given(seg_params())
@settings(max_examples=200, deadline=None)
def test_matches_reference_formulas(params):
    """Bit-exact vs reference fft_analysis.py:2412-2425 arithmetic."""
    nsig, overlap, navr = params
    nwins = seg.get_nwins(nsig, navr, overlap)
    # reference: nwins = floor(nsig / (Navr - Navr*ov + ov))
    ref_nwins = int(np.floor(nsig / (navr - navr * overlap + overlap)))
    assert nwins == ref_nwins
    if nwins < 2:
        return
    nov = seg.get_noverlap(nwins, overlap)
    assert nov == int(np.ceil(overlap * nwins))
    if nwins - nov <= 0:
        return
    navr_back = seg.get_navr(nsig, nwins, nov)
    assert navr_back == (nsig - nov) // (nwins - nov)
    # derived Navr can exceed the requested one only via flooring slack
    assert navr_back >= navr or nwins < 2


@given(seg_params())
@settings(max_examples=100, deadline=None)
def test_segments_stay_in_bounds(params):
    nsig, overlap, navr = params
    try:
        plan = seg.plan_segments(nsig, navr=navr, windowoverlap=overlap)
    except (ValueError, ZeroDivisionError):
        return
    if plan.navr < 1 or plan.nwins < 1:
        return
    hop = plan.nwins - plan.noverlap
    last_start = (plan.navr - 1) * hop
    assert last_start + plan.nwins <= nsig, (plan, nsig)
    assert plan.nnyquist == seg.get_nnyquist(plan.nfft)


@given(st.integers(min_value=8, max_value=4096),
       st.sampled_from([0.0, 0.25, 0.5, 0.75]))
@settings(max_examples=100, deadline=None)
def test_frame_signal_matches_manual_slices(nwins, overlap):
    import jax.numpy as jnp

    nov = seg.get_noverlap(nwins, overlap)
    hop = nwins - nov
    if hop <= 0:
        return
    navr = 5
    nsig = (navr - 1) * hop + nwins
    x = np.arange(nsig, dtype=np.float64)
    fr = np.asarray(seg.frame_signal(jnp.asarray(x), nwins, hop, navr))
    for g in range(navr):
        np.testing.assert_array_equal(fr[g], x[g * hop:g * hop + nwins])
