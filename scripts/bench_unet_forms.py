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

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


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

    K = 4  # forwards per timed program — amortizes dispatch/link overhead

    # block_until_ready on the tunneled backend returns before the device
    # finishes; run K forwards inside ONE jitted scan returning a scalar and
    # force completion with a host fetch (float()), like bench.py's chunks.
    @functools.partial(jax.jit, static_argnums=(2,))
    def fwd_loop(p, x, impl):
        def body(carry, c):
            y = unet_apply_nhwc(p, x + c, impl)
            return carry + jnp.sum(y.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(
            body, jnp.float32(0), (jnp.arange(K) * 1e-3).astype(x.dtype)
        )
        return acc

    # compile + warm everything first
    for impl in impls:
        t = time.perf_counter()
        for _ in range(2):
            float(fwd_loop(interp_p, xi, impl))
            float(fwd_loop(flow_p, xf, impl))
        print(f"# warmed {impl} in {time.perf_counter()-t:.1f}s", file=sys.stderr)

    times_i = {i: [] for i in impls}
    times_f = {i: [] for i in impls}
    for r in range(ROUNDS):
        for impl in impls:
            t = time.perf_counter()
            float(fwd_loop(interp_p, xi, impl))
            times_i[impl].append((time.perf_counter() - t) / K)
            t = time.perf_counter()
            float(fwd_loop(flow_p, xf, impl))
            times_f[impl].append((time.perf_counter() - t) / K)
        print(f"# round {r} done", file=sys.stderr)

    print(f"shapes: interp [{N},{H},{W},12] | flow [{NF},{H},{W},2] | {dt} "
          f"| {K} forwards per timed program, per-forward ms shown")
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
