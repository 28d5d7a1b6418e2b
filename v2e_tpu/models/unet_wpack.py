"""Width-packed (strided lane-packing) UNet forward for the MXU.

The SuperSloMo UNets put most of their FLOPs in layers with 32-64 output
channels; a stride-1 conv with Cout < 128 fills only Cout of the MXU's 128
output lanes, capping those layers at 25-50% utilization (measured ~39% MFU
for the whole interp UNet, benchmarks/README.md).

This module evaluates the SAME conv exactly by packing P = 128/Cout
horizontally-adjacent output positions into the channel dimension of ONE
strided conv:

    out[n, y, xb*P + d, c] = conv_{stride (1,P)}(x, Wp)[n, y, xb, d*Cout + c]
    Wp[ky, j, ci, d*Cout + c] = w[c, ci, ky, j - d]   (0 <= j - d < k)

i.e. a block-Toeplitz embedding of the kernel along the width axis.  The
packed conv has kernel width k+P-1 and stride P: every MXU pass now fills
all 128 output lanes at the price of (k+P-1)/k more MACs — a net
(k*P)/(k+P-1) reduction in MXU passes (2.8x for the 7x7/32ch layers, 1.5x
for 3x3/32ch).  The input stays plain dense NHWC (no repacking, unlike the
space-to-depth form in unet_s2d.py, which measured slower than dense); the
output un-packs with a free reshape ([N,H,W/P,P*C] -> [N,H,W,C] merges
adjacent dims, d-major channel order).

Numerics are the original conv's up to float reassociation (the extra
Toeplitz slots have exactly-zero weights); `tests/test_unet_wpack.py`
asserts agreement with `unet_apply` and layer-level `_conv_block`.

Same model semantics as the reference SuperSloMo UNet
(/root/reference/v2ecore/model.py:10-226); this is a TPU execution
strategy, not a model change.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from v2e_tpu.models.unet import (
    Params,
    _avg_pool2_nhwc,
    _conv_block,
    _upsample2_nhwc,
)

# P per layer: 128/Cout for the lane-bound layers, capped at 4 (beyond 4 the
# (k+P-1)/k MAC overhead eats the lane win for k=3).  Layers with >=128
# output channels stay dense.
WPACK_P = {
    "conv1": 4,
    "conv2": 4,
    "down1.conv1": 2,
    "down1.conv2": 2,
    "up4.conv1": 2,
    "up4.conv2": 2,
    "up5.conv1": 4,
    "up5.conv2": 4,
    "conv3": 4,
}


def wpack_weight(w: jnp.ndarray, P: int) -> jnp.ndarray:
    """OIHW [Co,Ci,k,k] -> strided-packed HWIO [k, k+P-1, Ci, P*Co]."""
    co, ci, k, _ = w.shape
    hwio = jnp.transpose(w, (2, 3, 1, 0))  # [k,k,Ci,Co]
    wp = jnp.zeros((k, k + P - 1, ci, P, co), w.dtype)
    for d in range(P):
        wp = wp.at[:, d : d + k, :, d, :].set(hwio)
    return wp.reshape(k, k + P - 1, ci, P * co)


def conv_wpack_block(
    x: jnp.ndarray, p: Dict[str, jnp.ndarray], P: int
) -> jnp.ndarray:
    """Width-packed `_conv_block`: NHWC in/out, bias + LeakyReLU fused.

    x: [N, H, W, Cin] with W % P == 0; returns [N, H, W, Cout].
    """
    w, b = p["w"], p["b"]
    co, _, k, _ = w.shape
    pad = (k - 1) // 2
    n, h, wd, _ = x.shape
    wp = p.get("wp")
    if wp is None:
        wp = wpack_weight(w, P)
    y = jax.lax.conv_general_dilated(
        x,
        wp.astype(x.dtype),
        window_strides=(1, P),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )  # [N, H, W/P, P*Co]
    y = y + jnp.tile(b, P).astype(x.dtype)
    y = jnp.maximum(y, jnp.asarray(0.1, x.dtype) * y)
    return y.reshape(n, h, wd, co)


def pack_unet_params(params: Params) -> Params:
    """Precompute the packed kernels once (conversion-time weights are
    static; keeps the per-chunk program free of the Toeplitz scatter)."""
    out: Params = {}
    for name, p in params.items():
        q = dict(p)
        P = WPACK_P.get(name)
        if P is not None:
            q["wp"] = wpack_weight(p["w"], P)
        out[name] = q
    return out


def _block(x: jnp.ndarray, params: Params, name: str) -> jnp.ndarray:
    P = WPACK_P.get(name)
    if P is not None and x.shape[2] % P == 0:
        return conv_wpack_block(x, params[name], P)
    return _conv_block(x, params[name])


def unet_apply_wpack_nhwc(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """`unet_apply_nhwc` with the lane-bound layers width-packed.

    x: [N, H, W, in_ch] (H, W multiples of 32); returns [N, H, W, out_ch].
    """
    x = _block(x, params, "conv1")
    s1 = _block(x, params, "conv2")
    skips = [s1]
    x = s1
    for i in range(1, 6):
        x = _avg_pool2_nhwc(x)
        x = _block(x, params, f"down{i}.conv1")
        x = _block(x, params, f"down{i}.conv2")
        if i < 5:
            skips.append(x)
    for i in range(1, 6):
        skip = skips[5 - i]
        x = _upsample2_nhwc(x)
        x = _block(x, params, f"up{i}.conv1")
        x = _block(
            jnp.concatenate([x, skip], axis=-1), params, f"up{i}.conv2"
        )
    return _block(x, params, "conv3")


def unet_apply_io_wpack(
    params: Params, x: jnp.ndarray, compute_dtype=None
) -> jnp.ndarray:
    """NHWC-in/NHWC-out width-packed forward (drop-in for
    unet_apply_io_nhwc)."""
    in_dtype = x.dtype
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    return unet_apply_wpack_nhwc(params, x).astype(in_dtype)


def unet_apply_wpack(
    params: Params, x: jnp.ndarray, compute_dtype=None
) -> jnp.ndarray:
    """NCHW-in/NCHW-out width-packed forward (drop-in for unet_apply)."""
    in_dtype = x.dtype
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    x = jnp.transpose(x, (0, 2, 3, 1))
    out = unet_apply_wpack_nhwc(params, x)
    out = jnp.transpose(out, (0, 3, 1, 2))
    return out.astype(in_dtype)
