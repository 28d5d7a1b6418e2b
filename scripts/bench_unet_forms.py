"""Interleaved-warm shootout of UNet conv execution forms on the real TPU.

Measures the WHOLE interp-UNet forward (the shape the headline bench runs:
a max_group batch at the bench's snapped resolution) plus the flow-UNet
forward, per conv_impl.  Methodology follows the round-2/4 lessons
(TODO.md Infra): every config is compiled and warmed before ANY timing
starts, then configs are timed in interleaved rounds so allocator/upload
warm-up and tunnel drift hit all configs equally; per-config p50 over
rounds is reported.

Usage: python scripts/bench_unet_forms.py [impl ...]
  (default impls: dense packed blocked blocked7)
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from v2e_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    from v2e_tpu.models.unet import UNetSpec, init_unet_host, unet_apply_nhwc

    impls = sys.argv[1:] or ["dense", "packed", "blocked", "blocked7"]
    N, H, W = 80, 256, 320  # bench: g*B=80 group batch at snap32(260x346)
    NF = 16                 # flow forward batch (B pairs)
    ROUNDS = 8
    dt = jnp.bfloat16

    rng = np.random.default_rng(0)
    interp_p = init_unet_host(rng, UNetSpec(12, 5, 32))
    flow_p = init_unet_host(rng, UNetSpec(2, 4, 32))
    xi = jax.device_put(
        jnp.asarray(rng.standard_normal((N, H, W, 12)).astype(np.float32), dtype=dt))
    xf = jax.device_put(
        jnp.asarray(rng.standard_normal((NF, H, W, 2)).astype(np.float32), dtype=dt))

    import functools

    @functools.partial(jax.jit, static_argnums=(2,))
    def interp_fwd(p, x, impl):
        return unet_apply_nhwc(p, x, impl)

    # compile + warm everything first (3 warm calls each)
    for impl in impls:
        t = time.perf_counter()
        for _ in range(3):
            interp_fwd(interp_p, xi, impl).block_until_ready()
            interp_fwd(flow_p, xf, impl).block_until_ready()
        print(f"# warmed {impl} in {time.perf_counter()-t:.1f}s", file=sys.stderr)

    times_i = {i: [] for i in impls}
    times_f = {i: [] for i in impls}
    for r in range(ROUNDS):
        for impl in impls:
            t = time.perf_counter()
            interp_fwd(interp_p, xi, impl).block_until_ready()
            times_i[impl].append(time.perf_counter() - t)
            t = time.perf_counter()
            interp_fwd(flow_p, xf, impl).block_until_ready()
            times_f[impl].append(time.perf_counter() - t)
        print(f"# round {r} done", file=sys.stderr)

    print(f"shapes: interp [{N},{H},{W},12] | flow [{NF},{H},{W},2] | {dt}")
    for impl in impls:
        ti = np.array(times_i[impl][2:]) * 1e3  # drop 2 more rounds
        tf = np.array(times_f[impl][2:]) * 1e3
        print(
            f"{impl:10s} interp p50 {np.median(ti):7.1f} ms "
            f"(min {ti.min():7.1f})  flow p50 {np.median(tf):6.1f} ms "
            f"(min {tf.min():6.1f})"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
