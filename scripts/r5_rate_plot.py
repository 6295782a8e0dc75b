#!/usr/bin/env python
"""Plot the round-5 rate-control result: measured container bpp and
bitstream-decode PSNR vs target bpp, for the faithful ('reference') schedule
and the rate-responsive ('fixed') schedule side by side.

Inputs are the two scripts/eval_bitstream.py --out JSONs produced by
scripts/r5_tpu_queue.sh; output is runs/r5_rate_control/rate_control.png plus
a monotonicity summary line per series (Spearman-style sign counts).

A third series (the from-scratch `rate_mode='fixed'` + branch_recon_weight
twin, `runs/r5_zero_fixed`) is added automatically when its sweep JSON exists
— that twin is the one whose QUALITY axis is expected to respond to rate,
because both generator branches are trained (BASELINE.md round-5 annex).

Usage: python scripts/r5_rate_plot.py [fixed.json reference.json out.png [branch.json]]
"""

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def monotone_stats(xs, ys):
    """(rising_pairs, falling_pairs) over consecutive points."""
    up = sum(1 for a, b in zip(ys, ys[1:]) if b > a)
    dn = sum(1 for a, b in zip(ys, ys[1:]) if b < a)
    return up, dn


def main():
    fixed_p = Path(sys.argv[1]) if len(sys.argv) > 1 else (
        REPO / "runs/r5_rate_control/fixed_sweep.json")
    ref_p = Path(sys.argv[2]) if len(sys.argv) > 2 else (
        REPO / "runs/r5_rate_control/reference_sweep.json")
    out_p = Path(sys.argv[3]) if len(sys.argv) > 3 else (
        REPO / "runs/r5_rate_control/rate_control.png")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    branch_p = Path(sys.argv[4]) if len(sys.argv) > 4 else (
        REPO / "runs/r5_rate_control/fixed_branchtrained_sweep.json")

    series = {}
    inputs = [("fixed", fixed_p), ("reference", ref_p)]
    if branch_p.exists():
        inputs.append(("fixed+branch_recon", branch_p))
    for name, p in inputs:
        d = json.loads(p.read_text())
        rows = d["rows"]
        series[name] = {
            "target": [r["target_bpp"] for r in rows],
            "bpp": [r["container_bpp"] for r in rows],
            "psnr": [r["bitstream_decode_psnr"] for r in rows],
            "model_dir": d["model_dir"],
        }

    fig, axes = plt.subplots(1, 3, figsize=(15, 4.5))
    colors = {"fixed": "tab:green", "reference": "tab:red",
              "fixed+branch_recon": "tab:blue"}
    for name, s in series.items():
        up_b, dn_b = monotone_stats(s["target"], s["bpp"])
        up_p, dn_p = monotone_stats(s["target"], s["psnr"])
        print(f"{name}: container bpp {s['bpp'][0]:.3f} -> {s['bpp'][-1]:.3f} "
              f"({up_b} rising / {dn_b} falling pairs), "
              f"PSNR {s['psnr'][0]:.2f} -> {s['psnr'][-1]:.2f} dB "
              f"({up_p} rising / {dn_p} falling pairs)  [{s['model_dir']}]")
        lbl = f"rate_mode='{name}'"
        axes[0].plot(s["target"], s["bpp"], "o-", color=colors[name], label=lbl)
        axes[1].plot(s["target"], s["psnr"], "o-", color=colors[name], label=lbl)
        axes[2].plot(s["bpp"], s["psnr"], "o-", color=colors[name], label=lbl)
    axes[0].set_xlabel("target bpp"); axes[0].set_ylabel("measured container bpp")
    axes[0].set_title("rate response (bytes on disk)")
    axes[1].set_xlabel("target bpp"); axes[1].set_ylabel("bitstream-decode PSNR (dB)")
    axes[1].set_title("fidelity response")
    axes[2].set_xlabel("measured container bpp"); axes[2].set_ylabel("PSNR (dB)")
    axes[2].set_title("RD plane (bytes -> image)")
    for ax in axes:
        ax.grid(True, alpha=0.3); ax.legend()
    fig.suptitle("Rate control on the REAL bitstream axis: faithful vs fixed schedule")
    fig.tight_layout()
    fig.savefig(out_p, dpi=150)
    print(f"wrote {out_p}")


if __name__ == "__main__":
    main()
