"""Per-layer conv timings for the SuperSloMo UNet on TPU (tuning tool)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    float(jnp.sum(out.ravel()[:1]))


def timeit(fn, *args, n=3, warm=1):
    for _ in range(warm):
        _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        _sync(fn(*args))
    return (time.perf_counter() - t0) / n


def conv_nchw(x, w, pad):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def conv_nhwc(x, w, pad):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def main():
    B = 80
    H, W = 256, 320
    rng = np.random.default_rng(0)
    # (ci, co, k, h, w, count_per_unet)
    layers = [
        ("conv1(12ch)", 12, 32, 7, H, W, 1),
        ("conv2", 32, 32, 7, H, W, 1),
        ("down1.c1", 32, 64, 5, H // 2, W // 2, 1),
        ("down1.c2", 64, 64, 5, H // 2, W // 2, 1),
        ("up4.c2(128->64)", 128, 64, 3, H // 2, W // 2, 2),
        ("up5.c1(64->32)", 64, 32, 3, H, W, 1),
        ("up5.c2(64->32)", 64, 32, 3, H, W, 1),
        ("conv3(32->5)", 32, 5, 3, H, W, 1),
    ]
    total = 0.0
    for name, ci, co, k, h, w, cnt in layers:
        x = jnp.asarray(rng.normal(size=(B, ci, h, w)).astype(np.float32)).astype(jnp.bfloat16)
        wt = jnp.asarray(rng.normal(size=(co, ci, k, k)).astype(np.float32)).astype(jnp.bfloat16)
        f = jax.jit(lambda a, b: conv_nchw(a, b, (k - 1) // 2))
        dt = timeit(f, x, wt)
        gf = 2 * B * h * w * ci * co * k * k / 1e9
        # NHWC comparison
        xh = jnp.moveaxis(x, 1, 3)
        wh = jnp.transpose(wt, (2, 3, 1, 0))
        fh = jax.jit(lambda a, b: conv_nhwc(a, b, (k - 1) // 2))
        dth = timeit(fh, xh, wh)
        total += dt * cnt
        print(f"{name:20s} {gf:7.1f} GF  nchw {dt*1e3:7.2f} ms ({gf/dt/1e3:6.1f} TF/s)"
              f"  nhwc {dth*1e3:7.2f} ms ({gf/dth/1e3:6.1f} TF/s)  x{cnt}",
              flush=True)
    print(f"sum(nchw, incl RTT per layer) = {total*1e3:.1f} ms")


if __name__ == "__main__":
    main()
