"""Exactness of the lane-filling 3x3 conv kernel (ops/pallas/conv3.py)
against the dense conv form it replaces (models/unet._conv_block).

Runs the kernel in Pallas interpret mode on CPU (conftest forces
JAX_PLATFORMS=cpu); both forms accumulate in f32, so f32 inputs must agree
to float rounding and bf16 inputs within bf16 tolerance.  Shapes mirror
the UNet up-tail layers the kernel targets (up4: 128->64, up5: 64->32,
concat conv2s, tail 32->5) plus border-heavy tiny shapes that stress the
halo masking at every strip boundary.
"""
from __future__ import annotations

import numpy as np
import pytest
import jax.numpy as jnp

from v2e_tpu.models.unet import _conv_block
from v2e_tpu.ops.pallas.conv3 import (
    conv3x3_lane,
    conv3x3_lane_supported,
    pick_mode,
)


def _mk(n, h, w, ci, co, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, h, w, ci)).astype(dtype)
    wt = (rng.standard_normal((co, ci, 3, 3)) / np.sqrt(9 * ci)).astype(
        np.float32
    )
    b = rng.standard_normal(co).astype(np.float32) * 0.1
    return jnp.asarray(x), jnp.asarray(wt), jnp.asarray(b)


CASES = [
    # (n, h, w, ci, co, mode)  — up5/up4/tail-like + strip-boundary stress
    (2, 16, 24, 8, 4, "hcol"),
    (2, 16, 24, 8, 4, "zfull"),
    (1, 32, 20, 16, 8, "auto"),
    (3, 8, 12, 4, 4, "hcol"),  # single strip: both halos masked
    (1, 24, 16, 8, 16, "zfull"),
]


@pytest.mark.parametrize("n,h,w,ci,co,mode", CASES)
def test_matches_dense_f32(n, h, w, ci, co, mode):
    x, wt, b = _mk(n, h, w, ci, co, seed=h * w)
    ref = _conv_block(x, {"w": wt, "b": b})
    got = conv3x3_lane(x, wt, b, mode=mode, th=8, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_matches_dense_bf16():
    x, wt, b = _mk(1, 16, 20, 16, 8, seed=7)
    xb = x.astype(jnp.bfloat16)
    ref = _conv_block(xb, {"w": wt, "b": b})
    got = conv3x3_lane(xb, wt, b, mode="hcol", th=8, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.asarray(ref, np.float32),
        rtol=0.05,
        atol=0.05,
    )


def test_no_activation_mode():
    x, wt, b = _mk(1, 8, 12, 4, 4, seed=3)
    got = conv3x3_lane(x, wt, b, mode="zfull", neg_slope=None, th=8,
                       interpret=True)
    import jax

    ref = jax.lax.conv_general_dilated(
        x,
        jnp.transpose(wt, (2, 3, 1, 0)),
        window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_mode_picker_and_support():
    # up5: Ci=64 -> Co=32 prefers hcol; up4: Ci=128 -> Co=64 prefers zfull
    assert pick_mode(64, 32) == "hcol"
    assert pick_mode(128, 64) == "zfull"
    assert conv3x3_lane_supported((80, 256, 320, 64), 32)
    # absurdly wide image: no strip fits VMEM -> caller must fall back
    assert not conv3x3_lane_supported((1, 8, 500_000, 64), 32)
