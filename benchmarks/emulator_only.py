"""Emulator-only benchmark: moving_dot synthetic input, no SloMo.

BASELINE config #1 (BASELINE.md): the reference runs this CPU/GPU-agnostic
('similar performance', CHANGELOG v1.4.2, i.e. it was never GPU-bound).
Reports DVS-emulation throughput in interpolated frames/s and Mevents/s.

Usage: python benchmarks/emulator_only.py [--frames 4096] [--chunk 512]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--frames", type=int, default=4096)
    p.add_argument("--chunk", type=int, default=512)
    p.add_argument("--width", type=int, default=346)
    p.add_argument("--height", type=int, default=260)
    p.add_argument("--dt", type=float, default=100e-6)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from v2e_tpu.emulator import EventEmulator
    from v2e_tpu.synthetic.device import moving_dot_frames

    H, W = args.height, args.width
    # frames are generated ON DEVICE (pixel-exact parity with the host
    # moving_dot plugin) so the benchmark measures the emulator, not the
    # host->device link
    times = np.arange(args.frames) * args.dt
    frames = moving_dot_frames(jnp.asarray(times), W, H)
    frames.block_until_ready()
    print(f"# {args.frames} device-generated frames of {H}x{W}", file=sys.stderr)

    em = EventEmulator(
        pos_thres=0.2, neg_thres=0.2, sigma_thres=0.03,
        cutoff_hz=0.0, leak_rate_hz=0.01, shot_noise_rate_hz=0.001,
        seed=42, shuffle_events_within_iteration=False,
        compaction_capacity_hint=200_000,
    )

    C = args.chunk
    # warm: two chunks
    em.generate_events_batch(frames[: C + 1], times[: C + 1])
    em.generate_events_batch(frames[C + 1 : 2 * C + 1], times[C + 1 : 2 * C + 1])

    n_events = 0
    t0 = time.perf_counter()
    pos = 2 * C + 1
    n_meas = 0
    handles = []
    while pos + C <= len(frames):
        h = em.submit_batch(frames[pos : pos + C], times[pos : pos + C])
        handles.append(h)
        pos += C
        n_meas += C
    for h in handles:
        ev, _, _ = em.collect(h)
        n_events += ev.shape[0]
    wall = time.perf_counter() - t0

    fps = n_meas / wall
    meps = n_events / wall / 1e6
    rt = (n_meas * args.dt) / wall
    print(
        f"# emulator-only: {fps:.0f} fr/s | {meps:.2f} Meps | "
        f"{rt:.2f}x realtime at dt={args.dt}", file=sys.stderr,
    )
    print(json.dumps({
        "metric": "emulator_only_346x260_frames_per_s",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": None,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
