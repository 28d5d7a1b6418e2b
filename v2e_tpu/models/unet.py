"""SuperSloMo UNet as a pure functional JAX model.

Architecture (matching the reference's torch modules so the pretrained
checkpoint converts 1:1, /root/reference/v2ecore/model.py:10-226):

  conv1 7x7 (in->32), conv2 7x7 (32->32)              -> skip s1
  down{1..5}: avgpool2 + conv(k) + conv(k), k=5,3,3,3,3  (32->64->128->256->512->512)
  up{1..5}:   bilinear x2 + conv3 + concat(skip) + conv3 (512->512->256->128->64->32)
  conv3 3x3 (32->out), LeakyReLU(0.1) everywhere including the output

Layout is NCHW with OIHW kernels (torch convention) — XLA re-layouts
internally for the MXU, and checkpoint tensors drop in unchanged.
Parameters are a plain nested dict: ``params[layer] = {"w": ..., "b": ...}``.
"""
from __future__ import annotations

import math
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Dict[str, jnp.ndarray]]

# (layer name, in_ch, out_ch, kernel) for each conv in definition order.
def unet_conv_specs(in_ch: int, out_ch: int) -> Sequence[Tuple[str, int, int, int]]:
    specs = [
        ("conv1", in_ch, 32, 7),
        ("conv2", 32, 32, 7),
    ]
    down_cfg = [(32, 64, 5), (64, 128, 3), (128, 256, 3), (256, 512, 3), (512, 512, 3)]
    for i, (ci, co, k) in enumerate(down_cfg, 1):
        specs.append((f"down{i}.conv1", ci, co, k))
        specs.append((f"down{i}.conv2", co, co, k))
    up_cfg = [(512, 512), (512, 256), (256, 128), (128, 64), (64, 32)]
    for i, (ci, co) in enumerate(up_cfg, 1):
        specs.append((f"up{i}.conv1", ci, co, 3))
        specs.append((f"up{i}.conv2", 2 * co, co, 3))
    specs.append(("conv3", 32, out_ch, 3))
    return specs


class UNetSpec:
    """Static description of one UNet (channel counts)."""

    def __init__(self, in_channels: int, out_channels: int):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.conv_specs = unet_conv_specs(in_channels, out_channels)


def init_unet(key: jax.Array, spec: UNetSpec, dtype=jnp.float32) -> Params:
    """Random init matching torch Conv2d defaults (uniform +-1/sqrt(fan_in))."""
    params: Params = {}
    keys = jax.random.split(key, len(spec.conv_specs))
    for k, (name, ci, co, ksz) in zip(keys, spec.conv_specs):
        fan_in = ci * ksz * ksz
        bound = 1.0 / math.sqrt(fan_in)
        kw, kb = jax.random.split(k)
        params[name] = {
            "w": jax.random.uniform(kw, (co, ci, ksz, ksz), dtype, -bound, bound),
            "b": jax.random.uniform(kb, (co,), dtype, -bound, bound),
        }
    return params


def _conv(x: jnp.ndarray, p: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    k = p["w"].shape[-1]
    pad = (k - 1) // 2
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    )
    y = y + p["b"].astype(jnp.float32)[None, :, None, None]
    return y.astype(x.dtype)


def _lrelu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.leaky_relu(x, negative_slope=0.1)


def _avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
    ) * 0.25


def _upsample2(x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear x2 with half-pixel centers (torch align_corners=False)."""
    n, c, h, w = x.shape
    return jax.image.resize(x, (n, c, 2 * h, 2 * w), method="bilinear")


def unet_apply(params: Params, x: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    """Forward pass. x: [N, in_ch, H, W] with H, W multiples of 32.

    compute_dtype: run convs/activations in this dtype (e.g. bfloat16 — the
    MXU-native precision on TPU; accumulation stays float32 via
    preferred_element_type).  Output is cast back to the input dtype.
    """
    in_dtype = x.dtype
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    x = _lrelu(_conv(x, params["conv1"]))
    s1 = _lrelu(_conv(x, params["conv2"]))
    skips = [s1]
    x = s1
    for i in range(1, 6):
        x = _avg_pool2(x)
        x = _lrelu(_conv(x, params[f"down{i}.conv1"]))
        x = _lrelu(_conv(x, params[f"down{i}.conv2"]))
        if i < 5:
            skips.append(x)
    # skips = [s1, s2, s3, s4, s5]; bottleneck x pairs with s5 first
    for i in range(1, 6):
        skip = skips[5 - i]
        x = _upsample2(x)
        x = _lrelu(_conv(x, params[f"up{i}.conv1"]))
        x = _lrelu(_conv(jnp.concatenate([x, skip], axis=1), params[f"up{i}.conv2"]))
    out = _lrelu(_conv(x, params["conv3"]))
    return out.astype(in_dtype)
