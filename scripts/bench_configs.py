"""Thin wrapper: run the five BASELINE configs via the root bench module.

``bench.py`` owns the measurements now (the driver runs it and it updates
BASELINE.md / BENCH_FULL.json); this script just prints the per-config rows
for interactive use: ``PYTHONPATH=. python scripts/bench_configs.py``.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    rows, headline = bench.run_configs()
    for r in rows:
        print(json.dumps(r), flush=True)
    print(json.dumps({"headline_mxu_util": headline["mxu_util"],
                      "vs_serial_numpy":
                      round(headline["samples"] / headline["dt"]
                            / headline["base_rate"], 1)}))


if __name__ == "__main__":
    main()
