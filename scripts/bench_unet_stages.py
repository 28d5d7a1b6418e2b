"""Per-stage device-time attribution of the interp UNet on the real TPU.

Times PREFIXES of the packed-resident forward (scripts/bench_unet_forms.py
methodology: K forwards per jitted scan, interleaved rounds, p50) and
reports per-stage cost as consecutive prefix differences, next to each
stage's analytic FLOPs — so the report shows which stages sit below the
MXU's practical ceiling and bounds what any further conv-form work could
buy (VERDICT r4 next #1 "within ~10% of its practical ceiling" evidence).

Stage boundaries mirror v2e_tpu.models.unet._unet_apply_nhwc_packed:
  head   conv1 + conv2 (7x7, packed P=4)
  down1..down5   pool + conv pair (down1 packed P=2, rest dense)
  up1..up5       bilinear x2 + conv1 + concat + conv2 (dense)
  tail   conv3 (3x3 dense)

Every prefix returns sum(x) + sum(skips) so no stage is dead-code
eliminated.  Usage: python scripts/bench_unet_stages.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

STAGES = ["head", "down1", "down2", "down3", "down4", "down5",
          "up1", "up2", "up3", "up4", "up5", "tail"]


def stage_flops(N: int, H: int, W: int, in_ch: int, out_ch: int, base: int = 32):
    """MACs*2 per stage (conv FLOPs only; pools/resizes are bandwidth)."""
    b = base
    fl = {}
    fl["head"] = 2 * N * H * W * (in_ch * b * 49 + b * b * 49)
    down = [(b, 2 * b, 5), (2 * b, 4 * b, 3), (4 * b, 8 * b, 3),
            (8 * b, 16 * b, 3), (16 * b, 16 * b, 3)]
    h, w = H, W
    for i, (ci, co, k) in enumerate(down, 1):
        h, w = h // 2, w // 2
        fl[f"down{i}"] = 2 * N * h * w * (ci * co + co * co) * k * k
    up = [(16 * b, 16 * b), (16 * b, 8 * b), (8 * b, 4 * b),
          (4 * b, 2 * b), (2 * b, b)]
    for i, (ci, co) in enumerate(up, 1):
        h, w = h * 2, w * 2
        fl[f"up{i}"] = 2 * N * h * w * (ci * co + 2 * co * co) * 9
    fl["tail"] = 2 * N * H * W * b * out_ch * 9
    return fl


def main() -> int:
    import jax
    import jax.numpy as jnp

    from v2e_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    from v2e_tpu.models.unet import (
        UNetSpec,
        _conv_block,
        _conv_block_pk,
        _avg_pool2_nhwc,
        _pool2_packed,
        _upsample2_nhwc,
        init_unet_host,
    )

    N, H, W = 80, 256, 320  # bench: g*B=80 group batch at snap32(260x346)
    ROUNDS = 8
    K = 4
    dt = jnp.bfloat16

    rng = np.random.default_rng(0)
    params = init_unet_host(rng, UNetSpec(12, 5, 32))
    xi = jax.device_put(
        jnp.asarray(rng.standard_normal((N, H, W, 12)).astype(np.float32), dtype=dt))

    def forward_prefix(p, x, upto: int):
        """Packed-resident forward through STAGES[:upto+1]; returns a scalar
        summing the live tensor and every skip so nothing is DCE'd."""
        n, h, w, cin = x.shape
        acc = jnp.float32(0)
        xp = x.reshape(n, h, w // 4, 4 * cin)
        xp = _conv_block_pk(xp, p["conv1"], 4)
        s1p = _conv_block_pk(xp, p["conv2"], 4)
        acc += jnp.sum(s1p.astype(jnp.float32))
        if upto == 0:
            return acc
        xp = _pool2_packed(s1p, 4)
        xp = _conv_block_pk(xp, p["down1.conv1"], 2)
        s2p = _conv_block_pk(xp, p["down1.conv2"], 2)
        acc += jnp.sum(s2p.astype(jnp.float32))
        if upto == 1:
            return acc
        xcur = _pool2_packed(s2p, 2)
        skips = [s1p.reshape(n, h, w, -1), s2p.reshape(n, h // 2, w // 2, -1)]
        for i in range(2, 6):
            xcur = _conv_block(xcur, p[f"down{i}.conv1"])
            xcur = _conv_block(xcur, p[f"down{i}.conv2"])
            acc += jnp.sum(xcur.astype(jnp.float32))
            if upto == i:
                return acc
            if i < 5:
                skips.append(xcur)
                xcur = _avg_pool2_nhwc(xcur)
        for i in range(1, 6):
            skip = skips[5 - i]
            xcur = _upsample2_nhwc(xcur)
            xcur = _conv_block(xcur, p[f"up{i}.conv1"])
            xcur = _conv_block(
                jnp.concatenate([xcur, skip], axis=-1), p[f"up{i}.conv2"])
            acc += jnp.sum(xcur.astype(jnp.float32))
            if upto == 5 + i:
                return acc
        return acc + jnp.sum(_conv_block(xcur, p["conv3"]).astype(jnp.float32))

    @functools.partial(jax.jit, static_argnums=(2,))
    def fwd_loop(p, x, upto):
        def body(carry, c):
            return carry + forward_prefix(p, x + c, upto), None

        acc, _ = jax.lax.scan(
            body, jnp.float32(0), (jnp.arange(K) * 1e-3).astype(x.dtype))
        return acc

    prefixes = list(range(len(STAGES)))
    for u in prefixes:
        t = time.perf_counter()
        for _ in range(2):
            float(fwd_loop(params, xi, u))
        print(f"# warmed prefix {STAGES[u]} in {time.perf_counter()-t:.1f}s",
              file=sys.stderr)

    times: dict = {u: [] for u in prefixes}
    for r in range(ROUNDS):
        for u in prefixes:
            t = time.perf_counter()
            float(fwd_loop(params, xi, u))
            times[u].append((time.perf_counter() - t) / K * 1e3)
        print(f"# round {r} done", file=sys.stderr)

    fl = stage_flops(N, H, W, 12, 5)
    p50 = {u: float(np.median(np.array(times[u][2:]))) for u in prefixes}
    print(f"interp UNet [{N},{H},{W},12] {dt} packed-resident | "
          f"prefix p50s, per-stage = consecutive difference")
    prev = 0.0
    total_fl = sum(fl.values())
    for u in prefixes:
        dtms = p50[u] - prev
        prev = p50[u]
        # GFLOP / ms == TFLOP/s; v5e bf16 peak is 197 TF/s
        tfs = fl[STAGES[u]] / max(dtms, 1e-9) / 1e9
        print(f"{STAGES[u]:6s} prefix {p50[u]:7.1f} ms | stage {dtms:6.1f} ms "
              f"| {fl[STAGES[u]]/1e9:6.1f} GFLOP | {tfs:6.0f} TF/s "
              f"({tfs/197*100:4.1f}% v5e bf16 peak)")
    tot = total_fl / p50[prefixes[-1]] / 1e9
    print(f"total  {p50[prefixes[-1]]:7.1f} ms | {total_fl/1e12:.2f} TFLOP | "
          f"{tot:.0f} TF/s ({tot/197*100:.1f}% peak)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
