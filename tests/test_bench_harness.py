"""Unit tests for bench.py's pure-Python pieces (no device needed).

The bench is the driver's only window into performance; its artifact
writer and serial reference chain deserve the same regression protection
as the library.
"""
import importlib.util
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(HERE, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_update_baseline_md_idempotent(tmp_path):
    bench = _load_bench()
    path = tmp_path / "BASELINE.md"
    path.write_text("# header\n\nprose before\n")
    rows = [
        {"config": 1, "what": "welch", "samples_per_s": 2.5e9,
         "wall_s": 6.7e-3, "mxu_util": 0.10, "mxu_util_device": 0.50,
         "variant": "packed", "result_bytes": 8192},
        {"config": 3, "what": "fir", "samples_per_s": 1.4e10,
         "wall_s": 9.8e-3, "mxu_util": 0.16, "hbm_gbs": 231.0,
         "hbm_gbs_device": 231.3, "kernel_gbs": 382.1,
         "roofline": "hbm", "result_bytes": 4 * 8 * (1 << 20)},
    ]
    headline = {"device": "TPU v5 lite", "base_rate": 8.1e6,
                "dispatch_overhead_s": 2.3e-3, "hbm_ceiling_gbs": 507.0}
    bench.update_baseline_md(rows, headline, str(path))
    txt1 = path.read_text()
    assert txt1.count(bench._MD_BEGIN) == 1
    assert "welch" in txt1 and "fir" in txt1
    assert "tiled-path 382 GB/s" in txt1
    assert "% of achievable HBM" in txt1
    # fraction is capped at 100 even if a row beats the measured ceiling
    rows[1]["hbm_gbs_device"] = 999.0
    bench.update_baseline_md(rows, headline, str(path))
    txt2 = path.read_text()
    assert txt2.count(bench._MD_BEGIN) == 1, "markers must not duplicate"
    assert "= 100% of achievable HBM" in txt2
    assert txt2.startswith("# header"), "prose outside markers preserved"


def test_numpy_reference_chain_matches_direct_welch():
    """The serial baseline denominator must compute the textbook chain."""
    bench = _load_bench()
    sys.path.insert(0, HERE)
    from pyfft_tpu import segmentation as seg

    rng = np.random.default_rng(0)
    nt, nch = 4096, 2
    x = rng.standard_normal(nt)
    y = rng.standard_normal((nch, nt))
    taps = rng.standard_normal(9)
    plan = seg.plan_segments(nt, nwins=512, windowoverlap=0.5)
    win = np.hanning(513)[:-1]
    Pxx, Pyy, Pxy = bench._numpy_reference_chain(x, y, taps, win, plan)
    assert Pxx.shape == (plan.nfft,)
    assert Pyy.shape == (nch, plan.nfft)
    # cross-check one channel against a direct segment loop
    yf = np.convolve(y[0], taps, mode="full")[:nt]
    yf = yf - yf.mean()
    hop = plan.nwins - plan.noverlap
    acc = np.zeros(plan.nfft)
    for g in range(plan.navr):
        s = np.fft.fft(win * yf[g * hop:g * hop + plan.nwins], plan.nfft)
        acc += np.abs(s) ** 2
    np.testing.assert_allclose(Pyy[0], acc / plan.navr, rtol=1e-10)


def test_tpu_kernels_json_all_healthy():
    """Every kernel in the committed TPU_KERNELS.json must carry a rel-err
    (or latency) record, never an ``error`` key: a kernel that cannot
    compile on the chip must be fixed or removed, not shipped dark
    (round-4 lesson — the hilbert slab kernel sat broken at HEAD for a
    full round behind a silent ``except``)."""
    import json
    path = os.path.join(HERE, "TPU_KERNELS.json")
    assert os.path.exists(path), "TPU_KERNELS.json missing from the repo"
    with open(path) as f:
        results = json.load(f)
    known_dark = set()          # add names here ONLY with a linked issue
    bad = {name: entry["error"]
           for name, entry in results["kernels"].items()
           if "error" in entry and name not in known_dark}
    assert not bad, f"dark kernels shipped at HEAD: {bad}"
    for name, entry in results["kernels"].items():
        if name in known_dark:
            continue
        assert any(k.startswith("rel_err") or k in ("warm_s", "compile_s")
                   for k in entry), (name, entry)


def test_fit_block_rows_budget_model():
    from pyfft_tpu.ops.pallas_fir import _fit_block_rows, _VMEM_BUDGET
    for G in (1, 2, 4, 8):
        rows = _fit_block_rows(1024, G, 2)
        step = 2 * (2 * G * rows * 128 * 4 + G * 2 * 128 * 4)
        assert step <= _VMEM_BUDGET
        assert rows >= 8
