#!/usr/bin/env python
"""Overlay rate-distortion results from two or more eval runs.

The SURVEY.md §7 contract asks for RD validation of both quantizer modes
("reference-faithful" zero-grad round vs the STE 'fixed' default); this tool
takes each run's `rate_distortion_data.csv` (written by
eval/plots.py::plot_rate_distortion_curve, format: Target BPP, Actual BPP,
Measured BPP, PSNR, SSIM, HQ Ratio) and emits a side-by-side markdown table
plus an overlay plot.

Usage:
  python scripts/compare_rd.py \
      faithful=runs/r2_faithful/test_results/rate_distortion_data.csv \
      fixed=runs/r3_fixed/test_results/rate_distortion_data.csv \
      --plot runs/r3_fixed/rd_comparison.png
"""

import argparse
import csv


def load(path):
    with open(path, newline="") as f:
        rows = list(csv.DictReader(f))
    return [
        {k: float(v) for k, v in row.items() if v != ""} for row in rows
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+", help="label=path/to/rate_distortion_data.csv")
    ap.add_argument("--plot", default=None, help="write an overlay PNG here")
    args = ap.parse_args()

    series = []
    for spec in args.runs:
        label, _, path = spec.partition("=")
        if not path:
            raise SystemExit(f"expected label=path, got {spec!r}")
        series.append((label, load(path)))

    bpps = [r["Target BPP"] for r in series[0][1]]
    print("| Target bpp | " + " | ".join(
        f"{lbl} PSNR / SSIM / HQ%" for lbl, _ in series) + " |")
    print("|---" * (1 + len(series)) + "|")
    for i, bpp in enumerate(bpps):
        cells = []
        for _, rows in series:
            r = rows[i]
            cells.append(
                f"{r['PSNR']:.2f} dB / {r['SSIM']:.3f} / "
                f"{r['HQ Ratio (%)']:.2f}%"
            )
        print(f"| {bpp} | " + " | ".join(cells) + " |")
    # deltas vs the first series
    base = series[0]
    for lbl, rows in series[1:]:
        d = [rows[i]["PSNR"] - base[1][i]["PSNR"] for i in range(len(bpps))]
        print(f"\n{lbl} - {base[0]} PSNR delta at matched target bpp: "
              + ", ".join(f"{x:+.2f} dB" for x in d))

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 3, figsize=(15, 4))
        for lbl, rows in series:
            x = [r["Target BPP"] for r in rows]
            axes[0].plot(x, [r["PSNR"] for r in rows], "o-", label=lbl)
            axes[1].plot(x, [r["SSIM"] for r in rows], "o-", label=lbl)
            axes[2].plot(x, [r["HQ Ratio (%)"] for r in rows], "o-", label=lbl)
        for ax, name in zip(axes, ("PSNR (dB)", "SSIM", "HQ ratio (%)")):
            ax.set_xlabel("target bpp")
            ax.set_ylabel(name)
            ax.grid(alpha=0.3)
            ax.legend()
        fig.suptitle("Rate-distortion comparison")
        fig.tight_layout()
        fig.savefig(args.plot, dpi=110)
        print(f"\nwrote {args.plot}")


if __name__ == "__main__":
    main()
