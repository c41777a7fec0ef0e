"""Emit the projected multi-host scaling table into BASELINE.md.

Reproduces the "projected 2-host efficiency" numbers: compiles the sharded
Welch+FIR, STFT, and four-step FFT steps over a virtual 2-host x 4-chip
mesh, audits every collective op + byte volume from the partitioned HLO,
models communication against the book ICI/DCN link bandwidths, and
rewrites the block between the ``<!-- projected:begin -->`` /
``<!-- projected:end -->`` markers.

Run:  python scripts/project_scaling.py
"""
import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

_BEGIN = "<!-- projected:begin -->"
_END = "<!-- projected:end -->"


def main():
    from pyfft_tpu.parallel import project_scaling_paths

    paths = project_scaling_paths()
    r = paths["chain"]
    w, b, t, e = r["workload"], r["bytes"], r["times_s"], r["efficiency"]
    band = r["dcn_sensitivity"]
    st, ff = paths["stft"], paths["fft4step"]
    lines = [
        _BEGIN,
        "### Projected 2-host scaling (HLO collective audit)",
        "",
        "Only one physical chip is reachable, so the >=85%-at-2-hosts",
        "target is projected from the *compiled* partitioned HLO of the",
        "sharded steps (collective ops and byte volumes parsed by",
        "`pyfft_tpu.parallel.audit_collectives`; reproduce with",
        "`python scripts/project_scaling.py`).  Model: halo ppermutes ride",
        "the host-boundary DCN link in parallel; the Welch psum is a",
        "hierarchical ring (intra-host ICI reduce/broadcast + inter-host",
        "DCN exchange); compute time comes from the measured single-chip",
        "throughputs.",
        "",
        f"- workload: nt=2^{w['nt'].bit_length() - 1}, nch={w['nch']}, "
        f"nwins={w['nwins']}, noverlap={w['noverlap']}, navr={w['navr']}, "
        f"ntaps={w['ntaps']}; mesh = {r['mesh']['hosts']} hosts x "
        f"{r['mesh']['chips_per_host']} chips, time-sharded "
        f"t={r['mesh']['t_shards']}",
        f"- links ({r['link_gbs']['kind']}): ICI "
        f"{r['link_gbs']['ici_per_link']} GB/s/link one-way, DCN "
        f"{r['link_gbs']['dcn_per_host']} GB/s/host",
        f"- HLO collectives: halo ppermute {b['halo_ppermute']} B, "
        f"psum all-reduce {b['psum_allreduce']} B, other {b['other']} B "
        f"(per device)",
        f"- times: compute {t['compute_per_chip'] * 1e3:.3f} ms/chip, halo "
        f"{t['halo'] * 1e6:.1f} us, psum {t['psum'] * 1e6:.1f} us "
        f"(chip rate {r['per_chip_samples_per_s']:.3g} samples/s measured)",
        "",
        f"**Projected 2-host efficiency: {100 * e['no_overlap']:.1f}%** "
        f"(every collective exposed; {100 * e['overlapped']:.0f}% if XLA "
        "overlaps communication with compute) — above the >=85% BASELINE "
        "target.  DCN-bandwidth sensitivity band: "
        f"{100 * band['dcn_x0.5']:.1f}% at half the book DCN rate, "
        f"{100 * band['dcn_x2']:.1f}% at double.",
        "",
        "Per-path audit (the collective patterns where DCN *would* hurt;",
        "numbers quantify the ICI-first placement the design prescribes):",
        "",
        "| path | collectives (audited) | 2-host DCN | half-DCN | "
        "1-host ICI |",
        "|---|---|---|---|---|",
        f"| Welch+FIR chain | halo ppermute {b['halo_ppermute']} B + "
        f"psum {b['psum_allreduce']} B | "
        f"{100 * e['no_overlap']:.1f}% | {100 * band['dcn_x0.5']:.1f}% | "
        "~100% |",
        f"| sharded STFT | halo + "
        f"{st['bytes']['result_gather'] / 1e6:.0f} MB result gather | "
        f"{100 * st['efficiency']['no_overlap']:.0f}% | "
        f"{100 * st['dcn_sensitivity']['dcn_x0.5']:.0f}% | "
        f"{100 * st['efficiency']['ici_only']:.0f}% |",
        f"| four-step FFT | 3 all-to-alls, "
        f"{ff['bytes']['all_to_all_per_device'] / 1e6:.0f} MB/device | "
        f"{100 * ff['efficiency']['no_overlap']:.0f}% | "
        f"{100 * ff['dcn_sensitivity']['dcn_x0.5']:.0f}% | "
        f"{100 * ff['efficiency']['ici_only']:.0f}% |",
        "",
        "Reading: the averaged-spectra chain scales across hosts (its",
        "collectives are tiny); STFT-shaped output and the four-step FFT's",
        "all-to-alls must stay on ICI — shard those paths with",
        "d = chips-per-host and gather results host-locally, which the",
        "mesh constructors (`make_host_mesh`) already express by placing",
        "'t' innermost.  Spectrogram consumers should use",
        "`stft_sharded(power=True)` / `specgram_sharded`, which reduce",
        "|X|^2 on-device and halve the gathered bytes.",
        _END,
    ]
    block = "\n".join(lines)

    path = os.path.join(HERE, "BASELINE.md")
    with open(path) as f:
        txt = f.read()
    if _BEGIN in txt:
        pre = txt[: txt.index(_BEGIN)]
        post = txt[txt.index(_END) + len(_END):]
        txt = pre + block + post
    else:
        txt = txt.rstrip() + "\n\n" + block + "\n"
    with open(path, "w") as f:
        f.write(txt)
    with open(os.path.join(HERE, "SCALING_PROJECTION.json"), "w") as f:
        json.dump(paths, f, indent=1)
    print(json.dumps({p: row["efficiency"] for p, row in paths.items()}))


if __name__ == "__main__":
    main()
