"""Pallas warp kernels vs the XLA reference formulation (interpret mode)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from v2e_tpu.models.backwarp import backwarp
from v2e_tpu.ops.pallas.warp import bilinear_warp_pallas
from v2e_tpu.ops.pallas.warp_v2 import bilinear_warp_tiled


def reference(img, flow):
    return np.asarray(backwarp(jnp.asarray(img)[:, None], jnp.asarray(flow)))[:, 0]


class TestWarpV1:
    def test_small_flows_exact(self):
        rng = np.random.default_rng(0)
        img = rng.normal(size=(2, 20, 150)).astype(np.float32)
        flow = np.clip(rng.normal(size=(2, 2, 20, 150)) * 3, -6, 6).astype(np.float32)
        got = np.asarray(
            bilinear_warp_pallas(jnp.asarray(img), jnp.asarray(flow), 8, True)
        )
        np.testing.assert_allclose(got, reference(img, flow), atol=1e-4)

    def test_zero_padding_at_borders(self):
        img = np.ones((1, 16, 128), np.float32)
        flow = np.full((1, 2, 16, 128), -4.0, np.float32)
        got = np.asarray(
            bilinear_warp_pallas(jnp.asarray(img), jnp.asarray(flow), 8, True)
        )
        # sampling 4.5 px outside -> zeros at the leading border
        assert got[0, 0, 0] == 0.0
        assert got[0, 10, 60] == pytest.approx(1.0)


class TestWarpPrecision:
    """--warp_precision fidelity budget (VERDICT r2 #8).

    1pass (plain bf16) error vs the f32 XLA reference must stay within one
    8-bit DN (1/255 ~ 3.9e-3) on 0-1-range pixels — the pipeline quantizes
    interpolated frames to 8-bit levels downstream (reference PNG round
    trip), so sub-DN warp error is within the model's own discretization.
    """

    def test_1pass_error_within_one_dn(self):
        rng = np.random.default_rng(3)
        img = rng.random(size=(2, 24, 150)).astype(np.float32)  # 0-1 range
        flow = np.clip(rng.normal(size=(2, 2, 24, 150)) * 3, -6, 6).astype(
            np.float32
        )
        got = np.asarray(
            bilinear_warp_pallas(
                jnp.asarray(img), jnp.asarray(flow), 8, True,
                precision="1pass",
            )
        )
        err = np.abs(got - reference(img, flow))
        assert err.max() < 1.5 / 255  # strictly sub-DN after quantization
        assert np.mean(err) < 0.3 / 255

    def test_3pass_much_tighter(self):
        rng = np.random.default_rng(4)
        img = rng.random(size=(1, 16, 128)).astype(np.float32)
        flow = np.clip(rng.normal(size=(1, 2, 16, 128)) * 2, -5, 5).astype(
            np.float32
        )
        got = np.asarray(
            bilinear_warp_pallas(jnp.asarray(img), jnp.asarray(flow), 8, True)
        )
        assert np.abs(got - reference(img, flow)).max() < 1e-4


class TestWarpV2:
    def test_large_base_flow_exact(self):
        rng = np.random.default_rng(1)
        img = rng.normal(size=(2, 24, 200)).astype(np.float32)
        base = rng.uniform(-60, 60, (2, 2, 1, 1)).astype(np.float32)
        var = np.clip(rng.normal(size=(2, 2, 24, 200)) * 1.5, -5, 5).astype(np.float32)
        flow = base + var
        got = np.asarray(
            bilinear_warp_tiled(jnp.asarray(img), jnp.asarray(flow), 128, True)
        )
        np.testing.assert_allclose(got, reference(img, flow), atol=1e-4)

    def test_smooth_gradient_flow(self):
        """Smoothly varying (non-constant) flow across the image."""
        rng = np.random.default_rng(2)
        H, W = 24, 260
        img = rng.normal(size=(1, H, W)).astype(np.float32)
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        flow = np.stack(
            [20 * np.sin(xx / 90)[None], 5 * np.cos(yy / 40)[None]], axis=1
        ).astype(np.float32)
        got = np.asarray(
            bilinear_warp_tiled(jnp.asarray(img), jnp.asarray(flow), 128, True)
        )
        np.testing.assert_allclose(got, reference(img, flow), atol=1e-4)
