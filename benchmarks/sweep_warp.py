"""Sweep Pallas warp kernel configs on the real TPU.

Times bilinear_warp_pallas over (max_disp, block_h, block_w, precision)
and checks max abs error vs the XLA reference formulation. Tuning tool,
not a test.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from v2e_tpu.models.backwarp import backwarp
from v2e_tpu.ops.pallas.warp import bilinear_warp_pallas


def _sync(out):
    float(jnp.sum(out.ravel()[:1]))


def timeit(fn, *args, n=6, warm=2):
    for _ in range(warm):
        _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        _sync(fn(*args))
    return (time.perf_counter() - t0) / n


def main():
    N, H, W = 160, 256, 320
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(-0.43, 0.57, (N, H, W)).astype(np.float32))
    # smooth flows within +-10 px (fixed-U=10-like workload)
    flo_small = np.zeros((N, 2, H, W), np.float32)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    for i in range(N):
        flo_small[i, 0] = 6.0 * np.sin(xx / 37.0 + i * 0.1) * np.cos(yy / 23.0)
        flo_small[i, 1] = 6.0 * np.cos(xx / 41.0 - i * 0.05) * np.sin(yy / 29.0)
    flo = jnp.asarray(flo_small)

    ref = np.asarray(
        jax.jit(backwarp)(img[:8, None], flo[:8])
    )[:, 0]

    P = jax.lax.Precision
    cfgs = [
        (32, 8, 128, P.HIGHEST),  # round-1 default
        (32, 8, 128, "3pass"),
        (16, 8, 128, "3pass"),
        (16, 8, 256, "3pass"),
        (16, 16, 128, "3pass"),
        (16, 16, 256, "3pass"),
        (8, 8, 128, "3pass"),
        (16, 8, 128, P.DEFAULT),
        (16, 32, 256, "3pass"),
    ]
    for M, bh, bw, prec in cfgs:
        try:
            fn = lambda i, f: bilinear_warp_pallas(i, f, M, False, bh, bw, prec)
            dt = timeit(fn, img, flo)
            out = np.asarray(fn(img, flo)[:8])
            err = float(np.max(np.abs(out - ref)))
            print(f"M={M:3d} bh={bh:3d} bw={bw:4d} prec={str(prec):18s} "
                  f"{dt*1e3:8.2f} ms  maxerr={err:.2e}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"M={M:3d} bh={bh:3d} bw={bw:4d} prec={str(prec):18s} "
                  f"FAILED: {type(e).__name__} {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
