"""Space-to-depth UNet path must match `unet_apply` exactly (f32, CPU)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from v2e_tpu.models.unet import UNetSpec, init_unet, unet_apply
from v2e_tpu.models.unet_s2d import (
    conv_s2d_block,
    d2s_nhwc,
    phase_concat,
    phase_mean,
    s2d_nhwc,
    unet_apply_s2d,
    upsample2_s2d,
)


def rnd(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32)
    )


class TestPhasePlumbing:
    def test_s2d_roundtrip(self):
        x = rnd((2, 16, 24, 3))
        np.testing.assert_array_equal(d2s_nhwc(s2d_nhwc(x)), x)

    def test_phase_mean_is_avgpool(self):
        from v2e_tpu.models.unet import _avg_pool2_nhwc

        x = rnd((2, 16, 24, 5), 1)
        got = phase_mean(s2d_nhwc(x))
        np.testing.assert_allclose(got, _avg_pool2_nhwc(x), rtol=1e-6,
                                   atol=1e-6)

    def test_phase_concat_is_channel_concat(self):
        a = rnd((1, 8, 8, 3), 2)
        b = rnd((1, 8, 8, 2), 3)
        got = d2s_nhwc(phase_concat(s2d_nhwc(a), s2d_nhwc(b)))
        np.testing.assert_array_equal(got, jnp.concatenate([a, b], axis=-1))

    def test_upsample_fold_matches_resize(self):
        from v2e_tpu.models.unet import _upsample2_nhwc

        x = rnd((2, 7, 9, 4), 4)
        got = d2s_nhwc(upsample2_s2d(x))
        np.testing.assert_allclose(got, _upsample2_nhwc(x), atol=1e-6)


class TestConvS2d:
    @pytest.mark.parametrize("k,ci,co", [(7, 12, 32), (7, 32, 32), (3, 64, 32), (3, 32, 5)])
    def test_conv_block_equivalence(self, k, ci, co):
        from v2e_tpu.models.unet import _conv_block

        rng = np.random.default_rng(k * 100 + ci)
        p = {
            "w": jnp.asarray(rng.normal(size=(co, ci, k, k)).astype(np.float32) * 0.1),
            "b": jnp.asarray(rng.normal(size=(co,)).astype(np.float32)),
        }
        x = jnp.asarray(rng.normal(size=(2, 16, 24, ci)).astype(np.float32))
        want = _conv_block(x, p)
        got = d2s_nhwc(conv_s2d_block(s2d_nhwc(x), p))
        np.testing.assert_allclose(got, want, atol=2e-5)


class TestFullUNet:
    @pytest.mark.parametrize("cin,cout", [(2, 4), (12, 5)])
    def test_unet_apply_s2d_equals_unet_apply(self, cin, cout):
        spec = UNetSpec(cin, cout)
        params = init_unet(jax.random.key(0), spec)
        x = rnd((2, cin, 64, 96), cin)
        want = np.asarray(unet_apply(params, x))
        got = np.asarray(unet_apply_s2d(params, x))
        np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


class TestConvS2dEmbedded:
    @pytest.mark.parametrize("k,ci,co", [(7, 12, 32), (7, 32, 32), (3, 64, 32), (3, 32, 5)])
    def test_embedded_conv_block_equivalence(self, k, ci, co):
        from v2e_tpu.models.unet import _conv_block
        from v2e_tpu.models.unet_s2d import conv_s2d_block_embedded

        rng = np.random.default_rng(k * 100 + ci + 1)
        p = {
            "w": jnp.asarray(rng.normal(size=(co, ci, k, k)).astype(np.float32) * 0.1),
            "b": jnp.asarray(rng.normal(size=(co,)).astype(np.float32)),
        }
        x = jnp.asarray(rng.normal(size=(2, 16, 24, ci)).astype(np.float32))
        want = _conv_block(x, p)
        got = d2s_nhwc(conv_s2d_block_embedded(s2d_nhwc(x), p))
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_full_unet_embedded(self):
        spec = UNetSpec(12, 5)
        params = init_unet(jax.random.key(1), spec)
        x = rnd((1, 12, 64, 96), 9)
        want = np.asarray(unet_apply(params, x))
        got = np.asarray(unet_apply_s2d(params, x, embedded=True))
        np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)
