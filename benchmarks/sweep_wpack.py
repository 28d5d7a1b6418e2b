"""Measure dense vs width-packed UNet forwards on the TPU.

Discipline (TODO.md infra note): every variant is compiled and warmed 3x
BEFORE any measurement, then the variants are timed interleaved over
several rounds (first-measured-config penalties of 5-10x were observed on
the tunneled device); we report the per-variant median of the rounds.

Usage: python benchmarks/sweep_wpack.py [N=96]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from v2e_tpu.models.unet import UNetSpec, init_unet, unet_apply_io_nhwc
from v2e_tpu.models.unet_wpack import pack_unet_params, unet_apply_io_wpack


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    H, W = 288, 352  # snap32 of 260x346
    dt = jnp.bfloat16

    print(f"# device: {jax.devices()[0]}, batch {N}x{H}x{W}", file=sys.stderr)

    spec = UNetSpec(12, 5)
    params = jax.tree.map(lambda a: jnp.asarray(a), init_unet(jax.random.key(0), spec))
    pp = pack_unet_params(params)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, H, W, 12)).astype(np.float32))

    # block_until_ready alone has been observed returning early through the
    # axon tunnel; a scalar fetch is a real sync
    dense = jax.jit(lambda p, v: jnp.sum(unet_apply_io_nhwc(p, v, dt)))
    wpack = jax.jit(lambda p, v: jnp.sum(unet_apply_io_wpack(p, v, dt)))

    variants = {"dense": (dense, params), "wpack": (wpack, pp)}

    # compile + warm 3x each
    for name, (fn, p) in variants.items():
        t0 = time.perf_counter()
        float(fn(p, x))
        print(f"# {name}: compile+first {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        for _ in range(3):
            float(fn(p, x))

    # interleaved measurement rounds
    ROUNDS, REPS = 5, 3
    times = {k: [] for k in variants}
    for r in range(ROUNDS):
        for name, (fn, p) in variants.items():
            t0 = time.perf_counter()
            outs = [fn(p, x) for _ in range(REPS)]  # queue back to back
            for o in outs:
                float(o)  # one real sync at the end of the queue
            times[name].append((time.perf_counter() - t0) / REPS)

    for name, xs in times.items():
        med = float(np.median(xs))
        print(f"{name}: {med*1e3:.1f} ms/forward "
              f"(all: {[f'{v*1e3:.0f}' for v in xs]})")
    print(f"speedup: {np.median(times['dense'])/np.median(times['wpack']):.3f}x")


if __name__ == "__main__":
    main()
