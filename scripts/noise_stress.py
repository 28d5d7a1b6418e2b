"""Noise-model stress run: static scene, full noise model, statistics check.

The leak_event_test scenario (reference test/leak_event_test.py + the
noise.sh recipe, BASELINE config #3): feed a static image at high frame
rate with leak + shot noise (or photoreceptor noise) enabled, then verify
the observed noise-event rates against the analytic expectation.  Exits
nonzero if the rates are out of tolerance — unlike the reference script,
which requires manual inspection in jAER.

Usage:
  python scripts/noise_stress.py [--photoreceptor_noise] [--duration 10]
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--duration", type=float, default=10.0, help="seconds")
    p.add_argument("--fps", type=float, default=500.0)
    p.add_argument("--width", type=int, default=128)
    p.add_argument("--height", type=int, default=96)
    p.add_argument("--leak_rate_hz", type=float, default=0.2)
    p.add_argument("--shot_noise_rate_hz", type=float, default=10.0)
    p.add_argument("--photoreceptor_noise", action="store_true")
    p.add_argument("--cutoff_hz", type=float, default=0.0)
    p.add_argument("--sigma_thres", type=float, default=0.05)
    p.add_argument("--leak_jitter_fraction", type=float, default=0.5)
    p.add_argument("--noise_rate_cov_decades", type=float, default=0.3)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--tolerance", type=float, default=0.35,
                   help="relative tolerance on rates (FPN spreads them)")
    p.add_argument("--output_aedat", default=None,
                   help="optionally write the noise stream as AEDAT-2")
    args = p.parse_args(argv)

    from v2e_tpu.emulator import EventEmulator

    H, W = args.height, args.width
    npix = H * W
    cutoff = args.cutoff_hz if not args.photoreceptor_noise else (
        args.cutoff_hz or 30.0
    )
    em = EventEmulator(
        pos_thres=0.2, neg_thres=0.2, sigma_thres=args.sigma_thres,
        cutoff_hz=cutoff,
        leak_rate_hz=args.leak_rate_hz,
        leak_jitter_fraction=args.leak_jitter_fraction,
        noise_rate_cov_decades=args.noise_rate_cov_decades,
        shot_noise_rate_hz=args.shot_noise_rate_hz,
        photoreceptor_noise=args.photoreceptor_noise,
        seed=args.seed,
        output_folder="." if args.output_aedat else None,
        dvs_aedat2=args.output_aedat,
        output_width=W if args.output_aedat else None,
        output_height=H if args.output_aedat else None,
    )

    # static mid-gray scene like lena at fixed illumination
    frame = np.full((H, W), 128.0, np.float32)
    n_frames = int(args.duration * args.fps)
    chunk = 512
    t = 0.0
    dt = 1.0 / args.fps
    idx = 0
    while idx < n_frames:
        n = min(chunk, n_frames - idx)
        frames = np.broadcast_to(frame, (n, H, W))
        times = (idx + np.arange(n)) * dt
        em.generate_events_batch(np.ascontiguousarray(frames), times)
        idx += n
    em.cleanup()

    dur = n_frames * dt
    on_rate = em.num_events_on / dur / npix
    off_rate = em.num_events_off / dur / npix
    total_rate = on_rate + off_rate

    print(f"observed per-pixel rates over {dur:.1f}s static scene:")
    print(f"  ON  {on_rate:.3f} Hz/px   OFF {off_rate:.3f} Hz/px   "
          f"total {total_rate:.3f} Hz/px")

    ok = True
    if args.photoreceptor_noise:
        expect = args.shot_noise_rate_hz
        print(f"  expected total ~{expect:.2f} Hz/px (photoreceptor noise)")
        # photoreceptor noise rate is approximate by design
        ok &= total_rate > 0.2 * expect and total_rate < 5 * expect
    else:
        inten = (128 + 20) / 275.0
        factor = (0.25 - 1) * inten + 1  # SHOT_NOISE_INTEN_FACTOR scaling
        expect_shot_each = args.shot_noise_rate_hz / 2 * factor
        expect_on = args.leak_rate_hz + expect_shot_each
        expect_off = expect_shot_each
        print(f"  expected ON ~{expect_on:.3f} Hz/px (leak {args.leak_rate_hz} "
              f"+ shot {expect_shot_each:.3f}), OFF ~{expect_off:.3f} Hz/px")
        ok &= abs(on_rate - expect_on) / expect_on < args.tolerance
        ok &= abs(off_rate - expect_off) / expect_off < args.tolerance

    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
