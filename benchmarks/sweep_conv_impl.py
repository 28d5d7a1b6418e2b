"""Whole-UNet forward A/B: dense vs blocked conv execution (unet.py).

Times the real units the conversion pipeline runs — the interp UNet on a
96-frame group and the flow UNet on a 16-pair batch — at bench.py's
346x260 (snap32 -> 288x352) shapes, bf16 compute.  Interleaved rounds,
scalar-fetch sync (block_until_ready returns early through the axon
tunnel).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from v2e_tpu.models.unet import UNetSpec, init_unet_host, unet_apply_io_nhwc


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    H, W = 288, 352
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    print(f"# device: {jax.devices()[0]}, N={N}, {H}x{W}", file=sys.stderr)

    impls = sys.argv[2].split(",") if len(sys.argv) > 2 else ["dense", "blocked"]
    cases = [
        ("interp", UNetSpec(12, 5), N),
        ("flow", UNetSpec(2, 4), 16),
    ]
    if os.environ.get("V2E_SWEEP_INTERP_ONLY"):
        cases = cases[:1]
    fns = {}
    for name, spec, n in cases:
        params = init_unet_host(rng, spec, dtype=dt)
        x = jnp.asarray(
            rng.normal(size=(n, H, W, spec.in_channels)).astype(np.float32), dt
        )
        for impl in impls:
            f = jax.jit(
                lambda p, v, impl=impl: jnp.sum(
                    unet_apply_io_nhwc(p, v, None, impl).astype(jnp.float32)
                )
            )
            fns[f"{name}/{impl}"] = (f, params, x)

    for k, (f, p, x) in fns.items():
        t0 = time.perf_counter()
        float(f(p, x))
        print(f"# {k}: compile+first {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)
        for _ in range(3):
            float(f(p, x))
    times = {k: [] for k in fns}
    for _ in range(3):
        for k, (f, p, x) in fns.items():
            t0 = time.perf_counter()
            outs = [f(p, x) for _ in range(3)]
            for o in outs:
                float(o)
            times[k].append((time.perf_counter() - t0) / 3)
    for k, v in times.items():
        print(f"{k}: {np.median(v)*1e3:.1f} ms/forward "
              f"(all: {[f'{t*1e3:.0f}' for t in v]})")
    for name, _, _ in cases:
        if f"{name}/dense" not in times:
            continue
        d = np.median(times[f"{name}/dense"])
        for impl in impls:
            if impl != "dense" and f"{name}/{impl}" in times:
                b = np.median(times[f"{name}/{impl}"])
                print(f"{name}: {impl} speedup {d/b:.3f}x")


if __name__ == "__main__":
    main()
