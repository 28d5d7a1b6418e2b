"""Event-stream fidelity gate for --warp_precision 1pass (TPU).

Converts the bench workload with warp_precision=3pass and =1pass (same
seeds, shuffle off) and compares the event streams; as a noise floor, the
3pass stream is also compared against a 3pass run with a different
emulator seed.  1pass is "below noise" if its stream delta is well under
the seed-change delta.

Run on the TPU: python scripts/warp_precision_check.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from bench import make_source_frames  # noqa: E402

from v2e_tpu.emulator import EventEmulator  # noqa: E402
from v2e_tpu.fused import FusedConverter  # noqa: E402
from v2e_tpu.models.slomo import SuperSloMo  # noqa: E402


def convert(precision: str, emu_seed: int, n_chunks: int = 6, B: int = 16):
    U = 10
    H, W = 260, 346
    src = make_source_frames(n_chunks * B + 1, H, W)
    si = 1.0 / 30.0
    slomo = SuperSloMo(model=None, auto_upsample=False, upsampling_factor=U,
                       batch_size=B, warp_precision=precision)
    em = EventEmulator(
        pos_thres=0.2, neg_thres=0.2, sigma_thres=0.03,
        cutoff_hz=300.0, leak_rate_hz=0.01, shot_noise_rate_hz=0.001,
        refractory_period_s=0.0005, seed=emu_seed,
        shuffle_events_within_iteration=False,
        compaction_capacity_hint=160_000,
    )
    fused = FusedConverter(slomo, em)
    evs = []
    for c in range(n_chunks):
        frames = src[c * B : c * B + B + 1]
        times = (c * B + np.arange(B * U, dtype=np.float64) / U) * si
        h = fused.submit(frames, times)
        if h is not None:
            ev, _, _ = em.collect(h)
            evs.append(ev)
    return np.concatenate(evs)


def stream_delta(a: np.ndarray, b: np.ndarray) -> float:
    """Fraction of events not shared between two streams (set symmetric
    difference over exact (t,x,y,p) rows, relative to the mean count)."""
    sa = {tuple(r) for r in np.round(a, 9).tolist()}
    sb = {tuple(r) for r in np.round(b, 9).tolist()}
    sym = len(sa ^ sb)
    return sym / max((len(sa) + len(sb)), 1)


def main():
    base = convert("3pass", emu_seed=42)
    fast = convert("1pass", emu_seed=42)
    reseed = convert("3pass", emu_seed=43)
    d_prec = stream_delta(base, fast)
    d_seed = stream_delta(base, reseed)
    print(f"events: 3pass={len(base)} 1pass={len(fast)} reseed={len(reseed)}")
    print(f"stream delta 1pass vs 3pass: {d_prec:.4f}")
    print(f"noise floor (seed change):   {d_seed:.4f}")
    print(f"verdict: {'BELOW NOISE' if d_prec < 0.5 * d_seed else 'ABOVE NOISE'}")


if __name__ == "__main__":
    main()
