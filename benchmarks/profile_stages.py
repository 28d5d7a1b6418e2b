"""Per-stage device timing for the headline chunk (B pairs, U-fold interp).

Times each jitted stage separately with block_until_ready so we can see
where the ~500 ms chunk budget goes before/after fusion work. Run on the
real TPU. Not a test — a tuning tool.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    """Force completion on remote-attached backends: block_until_ready on
    the axon tunnel returns before execution finishes, so fetch a scalar."""
    leaves = jax.tree_util.tree_leaves(out)
    float(jnp.sum(leaves[0].ravel()[:1]))


def timeit(fn, *args, n=6, warm=2, **kw):
    for _ in range(warm):
        _sync(fn(*args, **kw))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
        _sync(out)
    dt = (time.perf_counter() - t0) / n
    return dt, out


def main():
    from v2e_tpu.emulator.config import EmulatorConfig
    from v2e_tpu.emulator.core import emulate_chunk
    from v2e_tpu.emulator.state import init_state
    from v2e_tpu.models.convert_ckpt import init_random_slomo_params
    from v2e_tpu.models.slomo import (
        compute_flow,
        interpolate_pairs,
        postprocess_frames,
        preprocess_frames,
        snap32,
    )

    H, W, B, U = 260, 346, 16, 10
    h32, w32 = snap32(H), snap32(W)
    use_pallas = jax.default_backend() == "tpu"
    print(f"device={jax.devices()[0]} h32xw32={h32}x{w32} pallas_warp={use_pallas}")

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.uniform(0, 255, (B + 1, H, W)).astype(np.float32))
    flow_p, interp_p = init_random_slomo_params(0)

    dt, x = timeit(lambda f: preprocess_frames(f, h32, w32), frames)
    print(f"preprocess        {dt*1e3:8.2f} ms")
    I0, I1 = x[:-1], x[1:]

    dt, flow_out = timeit(lambda a, b: compute_flow(flow_p, a, b), I0, I1)
    # flow unet flops: unet(2,4) at h32,w32, batch B
    print(f"flow UNet         {dt*1e3:8.2f} ms")

    dt, interp = timeit(
        lambda: interpolate_pairs(
            flow_p, interp_p, I0, I1, U, 96, jnp.bfloat16, use_pallas, 32,
            flow_out=flow_out,
        )
    )
    print(f"interpolate_pairs {dt*1e3:8.2f} ms   ({B*U} frames)")

    dt, dvs = timeit(lambda i: postprocess_frames(i, H, W), interp)
    print(f"postprocess       {dt*1e3:8.2f} ms")

    cfg = EmulatorConfig(
        pos_thres=0.2, neg_thres=0.2, sigma_thres=0.03, cutoff_hz=300.0,
        leak_rate_hz=0.01, shot_noise_rate_hz=0.001, refractory_period_s=0.0005,
    )
    key = jax.random.key(1)
    emu_params, emu_state = init_state(cfg, dvs[0], jnp.float32(0.0), key)
    times = jnp.asarray((np.arange(B * U, dtype=np.float32) + 1) / (U * 30.0))

    emulate = jax.jit(lambda p, s, f, t: emulate_chunk(cfg, p, s, f, t))
    dt, (st, outs) = timeit(emulate, emu_params, emu_state, dvs, times)
    print(f"emulate_chunk     {dt*1e3:8.2f} ms")

    total_dvs = B / 30.0
    print(f"chunk DVS time = {total_dvs*1e3:.0f} ms")


if __name__ == "__main__":
    main()


def breakdown():
    """Finer breakdown of interpolate_pairs internals."""
    from v2e_tpu.models.convert_ckpt import init_random_slomo_params
    from v2e_tpu.models.unet import unet_apply
    from v2e_tpu.models.backwarp import warp

    h32, w32 = 256, 320
    gB = 80  # g*B per group (B=16, g=5)
    rng = np.random.default_rng(0)
    flow_p, interp_p = init_random_slomo_params(0)
    x12 = jnp.asarray(rng.normal(size=(gB, 12, h32, w32)).astype(np.float32))
    img = jnp.asarray(rng.normal(size=(2 * gB, 1, h32, w32)).astype(np.float32))
    flo = jnp.asarray(2.0 * rng.normal(size=(2 * gB, 2, h32, w32)).astype(np.float32))

    unet_j = jax.jit(lambda p, x: unet_apply(p, x, jnp.bfloat16))
    dt, _ = timeit(unet_j, interp_p, x12)
    print(f"interp UNet [{gB},12,{h32},{w32}]    {dt*1e3:8.2f} ms")

    warp_pl = jax.jit(lambda i, f: warp(i, f, True, 32))
    dt, _ = timeit(warp_pl, img, flo)
    print(f"pallas warp [{2*gB}]                {dt*1e3:8.2f} ms")

    warp_xla = jax.jit(lambda i, f: warp(i, f, False, 32))
    dt, _ = timeit(warp_xla, img, flo)
    print(f"xla warp    [{2*gB}]                {dt*1e3:8.2f} ms")


if __name__ == "__main__" and os.environ.get("V2E_PROFILE_BREAKDOWN"):
    breakdown()
