"""Device-side cost: fused single-dispatch chunk vs staged dispatches.

Submits chunks sequentially and blocks on the packed scalars (device-
resident outputs) — no host materialization — isolating device+dispatch
time per chunk.  Warm 3x each, then interleaved rounds (TODO.md
measurement discipline).

Usage: python benchmarks/fused_vs_staged.py [B=16]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import make_source_frames  # noqa: E402

from v2e_tpu.emulator import EventEmulator  # noqa: E402
from v2e_tpu.fused import FusedConverter  # noqa: E402
from v2e_tpu.models.slomo import SuperSloMo  # noqa: E402


def make(B, U):
    slomo = SuperSloMo(model=None, auto_upsample=False, upsampling_factor=U,
                       batch_size=B)
    em = EventEmulator(
        pos_thres=0.2, neg_thres=0.2, sigma_thres=0.03,
        cutoff_hz=300.0, leak_rate_hz=0.01, shot_noise_rate_hz=0.001,
        refractory_period_s=0.0005, seed=42,
        compaction_capacity_hint=160_000,
    )
    return slomo, em


def main():
    import jax

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    U = 10
    H, W = 260, 346
    N_CHUNK = 40
    src = make_source_frames(N_CHUNK * B + 1, H, W)
    si = 1.0 / 30.0
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)

    slomo_f, em_f = make(B, U)
    fused = FusedConverter(slomo_f, em_f)
    slomo_s, em_s = make(B, U)

    def chunk_args(c):
        frames = src[c * B : c * B + B + 1]
        times = (c * B + np.arange(B * U, dtype=np.float64) / U) * si
        return frames, times

    def run_fused(c):
        frames, times = chunk_args(c)
        h = fused.submit(frames, times)
        if h is not None:
            np.asarray(h["packed"]["scalars"])  # block on device program

    def run_staged(c):
        import jax.numpy as jnp

        frames, times = chunk_args(c)
        interp, _ = slomo_s.interpolate_batch(
            jnp.asarray(frames), H, W
        )
        h = em_s.submit_batch(interp, times)
        if h is not None:
            np.asarray(h["packed"]["scalars"])

    variants = {"fused": run_fused, "staged": run_staged}
    c_next = {k: 0 for k in variants}

    for name, fn in variants.items():
        t0 = time.perf_counter()
        for _ in range(4):  # chunk 0 is init; warm 3 real chunks
            fn(c_next[name]); c_next[name] += 1
        print(f"# {name}: compile+warm {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)

    ROUNDS, REPS = 5, 3
    times = {k: [] for k in variants}
    for r in range(ROUNDS):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            for _ in range(REPS):
                fn(c_next[name]); c_next[name] += 1
            times[name].append((time.perf_counter() - t0) / REPS)

    for name, xs in times.items():
        print(f"{name}: {np.median(xs)*1e3:.0f} ms/chunk "
              f"(all: {[f'{v*1e3:.0f}' for v in xs]})")


if __name__ == "__main__":
    main()
