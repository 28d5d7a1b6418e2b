"""Blocked (column-packed) conv execution form == dense, layer and whole-UNet.

The blocked form (unet.py:_conv_block, conv_impl="blocked") reshapes
[N,H,W,Ci] -> [N,H,W/P,P*Ci] and convolves against a block-Toeplitz kernel
so lane-bound k>=5 layers fill all 128 TPU vector lanes.  The math is
identical to the dense stride-1 'same' conv — these tests pin that down in
float32 (tolerance = summation-order rounding only), including the edge
columns where the block padding differs from dense pixel padding.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from v2e_tpu.models.unet import (
    UNetSpec,
    _blocked_plan,
    _conv_block,
    init_unet_host,
    unet_apply_io_nhwc,
)


@pytest.mark.parametrize(
    "k,ci,co,P",
    [
        (7, 12, 32, 4),  # interp conv1
        (7, 2, 32, 4),   # flow conv1
        (7, 32, 32, 4),  # conv2
        (5, 32, 64, 2),  # down1.conv1
        (5, 64, 64, 2),  # down1.conv2
        (3, 64, 32, 1),  # k=3 stays dense
        (5, 128, 128, 1),  # wide layers stay dense
    ],
)
def test_layer_blocked_matches_dense(k, ci, co, P):
    assert _blocked_plan(k, ci, co, 64) == P
    rng = np.random.default_rng(k * 1000 + ci)
    x = jnp.asarray(rng.normal(size=(2, 24, 64, ci)).astype(np.float32))
    p = {
        "w": jnp.asarray(rng.normal(size=(co, ci, k, k)).astype(np.float32) * 0.1),
        "b": jnp.asarray(rng.normal(size=(co,)).astype(np.float32)),
    }
    dense = np.asarray(_conv_block(x, p, "dense"))
    blocked = np.asarray(_conv_block(x, p, "blocked"))
    np.testing.assert_allclose(blocked, dense, atol=2e-5, rtol=1e-5)


def test_blocked_plan_skips_unaligned_width():
    # W not divisible by P -> dense fallback, never a bad reshape
    assert _blocked_plan(7, 32, 32, 35) == 1
    assert _blocked_plan(5, 64, 64, 33) == 1


def test_unet_forward_blocked_matches_dense():
    spec = UNetSpec(12, 5)
    rng = np.random.default_rng(7)
    params = init_unet_host(rng, spec)
    x = jnp.asarray(rng.normal(size=(2, 32, 64, 12)).astype(np.float32))
    dense = np.asarray(unet_apply_io_nhwc(params, x, None, "dense"))
    blocked = np.asarray(unet_apply_io_nhwc(params, x, None, "blocked"))
    np.testing.assert_allclose(blocked, dense, atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("impl", ["packed", "packedup", "packedz"])
@pytest.mark.parametrize("base,cin,cout", [(8, 12, 5), (16, 2, 4)])
def test_unet_forward_packed_matches_dense(base, cin, cout, impl):
    """Packed-RESIDENT forms (pack once, conv pairs + pooling stay packed,
    unpack only at skip taps; packedup also runs up4/up5/conv3 packed with
    packed skip concats; packedz runs the lane-bound k=3 up-tail through
    the scatter-matmul Pallas kernel, interpret mode on CPU, with dense
    fallback on strips that don't fit — both paths exercised here) ==
    dense, whole forward."""
    spec = UNetSpec(cin, cout, base)
    rng = np.random.default_rng(11 + base)
    params = init_unet_host(rng, spec)
    x = jnp.asarray(rng.normal(size=(2, 32, 64, cin)).astype(np.float32))
    dense = np.asarray(unet_apply_io_nhwc(params, x, None, "dense"))
    packed = np.asarray(unet_apply_io_nhwc(params, x, None, impl))
    np.testing.assert_allclose(packed, dense, atol=5e-5, rtol=1e-4)


def test_pool2_packed_matches_dense_pool():
    """Packed-space 2x2 average pooling == dense pooling at both pack
    factors used by the resident path (P=4 full-res, P=2 half-res)."""
    from v2e_tpu.models.unet import _avg_pool2_nhwc, _pool2_packed

    rng = np.random.default_rng(5)
    for P, c in [(4, 8), (2, 16)]:
        x = jnp.asarray(rng.normal(size=(2, 8, 16, c)).astype(np.float32))
        dense = np.asarray(_avg_pool2_nhwc(x))
        n, h, w, _ = x.shape
        pk = _pool2_packed(x.reshape(n, h, w // P, P * c), P)
        # packed(P/2) at half-res unpacks with a plain reshape
        pk = np.asarray(pk).reshape(n, h // 2, w // 2, c)
        np.testing.assert_allclose(pk, dense, atol=1e-6, rtol=1e-6)
