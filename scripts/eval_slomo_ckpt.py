"""Evaluate a trained SuperSloMo checkpoint: held-out PSNR vs the
no-motion frame-average baseline.

Same protocol as tests/test_golden_ckpt.py but standalone, so full-width
checkpoints too large to commit can be validated and their metrics
recorded (tests/fixtures/README.md).  A model that learned motion
compensation must beat the frame-average baseline; random weights cannot.

Usage: python scripts/eval_slomo_ckpt.py <ckpt.npz|ckpt_dir> [--res H W]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return 99.0 if mse == 0 else 10.0 * np.log10(255.0**2 / mse)


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("ckpt")
    p.add_argument("--res", type=int, nargs=2, default=[128, 160],
                   help="held-out clip resolution (multiples of 32)")
    p.add_argument("--upsampling", type=int, default=4)
    p.add_argument("--pairs", type=int, default=4)
    p.add_argument("--seed", type=int, default=77)
    args = p.parse_args()

    from dataset_tools.make_training_videos import render_clip
    from v2e_tpu.models.slomo import SuperSloMo

    H, W = args.res
    U = args.upsampling
    rng = np.random.default_rng(args.seed)
    hi = render_clip("texture", args.pairs * U + 1, H, W, rng)
    src = hi[::U].astype(np.float32)

    slomo = SuperSloMo(model=args.ckpt, auto_upsample=False,
                       upsampling_factor=U, batch_size=args.pairs)
    base = slomo.flow_params["conv1"]["w"].shape[0]
    interp, _ = slomo.interpolate_batch(src, H, W)
    interp = np.asarray(interp)

    ps_model, ps_avg = [], []
    for pair in range(args.pairs):
        for i in range(1, U):
            gt = hi[pair * U + i]
            ps_model.append(psnr(interp[pair * U + i], gt))
            avg = ((1 - i / U) * hi[pair * U].astype(np.float64)
                   + (i / U) * hi[(pair + 1) * U].astype(np.float64))
            ps_avg.append(psnr(avg, gt))
    m, a = float(np.mean(ps_model)), float(np.mean(ps_avg))
    print(f"ckpt={args.ckpt} base={base} res={H}x{W} U={U} "
          f"pairs={args.pairs} seed={args.seed}")
    print(f"model PSNR {m:.2f} dB | frame-average baseline {a:.2f} dB | "
          f"margin {m - a:+.2f} dB")
    return 0 if m > a else 1


if __name__ == "__main__":
    sys.exit(main())
