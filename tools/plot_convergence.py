"""Plot the training convergence curve from scalars.jsonl -> docs/convergence.png.

Usage: python tools/plot_convergence.py [scalars.jsonl] [out.png] [lr_drops]
where lr_drops is a comma-separated epoch list (default "50,100" — the
Tianchi recipe; the PTB recipe uses "40,70").
"""

import json
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def main(path="output/convergence/tf_logs/scalars.jsonl", out="docs/convergence.png",
         lr_drops="50,100"):
    rows = [json.loads(l) for l in open(path) if l.strip()]
    rows.sort(key=lambda r: r["step"])
    ep = [r["step"] for r in rows]
    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    axes[0].plot(ep, [r["train_loss_all"] for r in rows], label="train")
    axes[0].plot(ep, [r["test_loss_all"] for r in rows], label="test")
    axes[0].set_yscale("log")
    axes[0].set_title("loss")
    axes[1].plot(ep, [r["psnr_gen"] for r in rows], label="psnr_gen")
    axes[1].plot(ep, [r["psnr_reg"] for r in rows], label="psnr_reg")
    axes[1].set_title("PSNR (dB)")
    axes[2].plot(ep, [r["ssim_gen"] for r in rows], label="ssim_gen")
    axes[2].plot(ep, [r["ssim_reg"] for r in rows], label="ssim_reg")
    axes[2].set_title("SSIM")
    for ax in axes:
        ax.set_xlabel("epoch")
        ax.legend()
        ax.grid(alpha=0.3)
        for x in (int(s) for s in str(lr_drops).split(",")):  # MultiStep LR drops
            ax.axvline(x, color="0.8", ls="--", lw=0.8)
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    best = max(rows, key=lambda r: r["psnr_gen"])
    print(f"{len(rows)} epochs; best psnr_gen {best['psnr_gen']:.3f} dB @ epoch {best['step']}; -> {out}")


if __name__ == "__main__":
    main(*sys.argv[1:])
