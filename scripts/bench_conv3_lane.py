"""A/B the lane-filling 3x3 conv kernel vs XLA dense on the UNet up-tail
shapes (real TPU).

Methodology per benchmarks/README.md infra lessons: K forwards inside one
jitted scan (dispatch amortizes), every variant warmed before any timing,
interleaved rounds, p50 reported.  Shapes are the interp UNet's lane-bound
layers at the headline bench config (N=80 group batch, 256x320 snapped).

Usage: python scripts/bench_conv3_lane.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

K = 4
ROUNDS = 8

# (label, N, H, W, Ci, Co)
SHAPES = [
    ("up5.conv1  64->32 @256x320", 80, 256, 320, 64, 32),
    ("up5.conv2  64->32 @256x320", 80, 256, 320, 64, 32),
    ("up4.conv1 128->64 @128x160", 80, 128, 160, 128, 64),
    ("up4.conv2 128->64 @128x160", 80, 128, 160, 128, 64),
    ("tail      32-> 5 @256x320", 80, 256, 320, 32, 5),
    ("down2.c1  64->128 @64x80 ", 80, 64, 80, 64, 128),
]


def main() -> int:
    import jax
    import jax.numpy as jnp

    from v2e_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    from v2e_tpu.models.unet import _conv_block
    from v2e_tpu.ops.pallas.conv3 import (
        conv3x3_lane,
        conv3x3_lane_supported,
        pick_mode,
    )

    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)

    variants = {}  # (label, form) -> jitted loop
    args = {}
    shapes = [s for s in SHAPES
              if conv3x3_lane_supported((s[1], s[2], s[3], s[4]), s[5])]
    for s in SHAPES:
        if s not in shapes:
            print(f"# skipped (unsupported: Co<32 or VMEM): {s[0]}",
                  file=sys.stderr)
    for label, n, h, w, ci, co in shapes:
        x = jax.device_put(jnp.asarray(
            rng.standard_normal((n, h, w, ci)).astype(np.float32), dtype=dt))
        wt = jnp.asarray(
            (rng.standard_normal((co, ci, 3, 3)) / np.sqrt(9 * ci)).astype(
                np.float32))
        b = jnp.asarray(rng.standard_normal(co).astype(np.float32) * 0.1)
        p = {"w": wt, "b": b}
        mode = pick_mode(ci, co)

        def mk(fn):
            @jax.jit
            def loop(x):
                def body(c, s):
                    return c + jnp.sum(fn(x + s).astype(jnp.float32)), None

                acc, _ = jax.lax.scan(
                    body, jnp.float32(0), (jnp.arange(K) * 1e-3).astype(dt))
                return acc

            return loop

        variants[(label, "dense")] = mk(functools.partial(_conv_block, p=p))
        variants[(label, f"lane/{mode}")] = mk(
            functools.partial(conv3x3_lane, w=wt, b=b, mode=mode))
        args[label] = x

    for (label, form), fn in variants.items():
        t = time.perf_counter()
        for _ in range(2):
            float(fn(args[label]))
        print(f"# warmed {label} {form} in {time.perf_counter()-t:.1f}s",
              file=sys.stderr)

    times = {k: [] for k in variants}
    for r in range(ROUNDS):
        for key, fn in variants.items():
            t = time.perf_counter()
            float(fn(args[key[0]]))
            times[key].append((time.perf_counter() - t) / K * 1e3)

    print("layer                         | dense p50 | lane p50 | speedup")
    for label, n, h, w, ci, co in shapes:
        d = float(np.median(times[(label, "dense")][2:]))
        lk = [k for k in times if k[0] == label and k[1] != "dense"][0]
        l = float(np.median(times[lk][2:]))
        fl = 2 * n * h * w * ci * co * 9
        # GFLOP / ms == TF/s
        print(f"{label} | {d:7.2f} ms | {l:7.2f} ms | {d/l:4.2f}x "
              f"({lk[1]}, lane {fl/l/1e9:.0f} TF/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
