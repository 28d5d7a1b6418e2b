"""Width-packed (strided lane-packing) UNet == dense UNet, exactly.

The packed conv is the same linear map as the dense conv (extra Toeplitz
slots carry exactly-zero weights), so agreement is up to float
reassociation only.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from v2e_tpu.models.unet import (
    UNetSpec,
    _conv_block,
    init_unet,
    unet_apply,
)
from v2e_tpu.models.unet_wpack import (
    WPACK_P,
    conv_wpack_block,
    pack_unet_params,
    unet_apply_wpack,
    wpack_weight,
)


class TestWpackConv:
    @pytest.mark.parametrize(
        "k,ci,co,P",
        [(7, 2, 32, 4), (7, 32, 32, 4), (5, 32, 64, 2), (3, 64, 32, 4),
         (3, 128, 64, 2), (3, 32, 5, 4)],
    )
    def test_matches_dense_conv_block(self, k, ci, co, P):
        rng = np.random.default_rng(k * 100 + ci)
        H, W = 16, 24
        x = jnp.asarray(rng.normal(size=(2, H, W, ci)).astype(np.float32))
        p = {
            "w": jnp.asarray(
                rng.normal(size=(co, ci, k, k)).astype(np.float32) * 0.1
            ),
            "b": jnp.asarray(rng.normal(size=(co,)).astype(np.float32)),
        }
        dense = _conv_block(x, p)
        packed = conv_wpack_block(x, p, P)
        np.testing.assert_allclose(
            np.asarray(packed), np.asarray(dense), atol=2e-5, rtol=1e-5
        )

    def test_packed_weight_structure(self):
        """Zero slots are exactly zero; valid slots copy the kernel."""
        w = jnp.arange(2 * 3 * 3 * 3, dtype=jnp.float32).reshape(2, 3, 3, 3)
        wp = np.asarray(wpack_weight(w, 2))  # [3, 4, 3, 4]
        assert wp.shape == (3, 4, 3, 4)
        hwio = np.transpose(np.asarray(w), (2, 3, 1, 0))
        for d in range(2):
            for j in range(4):
                kx = j - d
                got = wp[:, j, :, d * 2 : (d + 1) * 2]
                if 0 <= kx < 3:
                    np.testing.assert_array_equal(got, hwio[:, kx])
                else:
                    np.testing.assert_array_equal(got, 0.0)


class TestWpackUNet:
    @pytest.mark.parametrize("in_ch,out_ch", [(2, 4), (12, 5)])
    def test_full_unet_matches(self, in_ch, out_ch):
        spec = UNetSpec(in_ch, out_ch)
        params = init_unet(jax.random.key(0), spec)
        rng = np.random.default_rng(1)
        x = jnp.asarray(
            rng.normal(size=(1, 32, 64, in_ch)).astype(np.float32)
        ).transpose(0, 3, 1, 2)
        dense = np.asarray(unet_apply(params, x))
        packed = np.asarray(unet_apply_wpack(params, x))
        np.testing.assert_allclose(packed, dense, atol=5e-5, rtol=1e-4)

    def test_precomputed_pack_matches(self):
        spec = UNetSpec(12, 5)
        params = init_unet(jax.random.key(2), spec)
        pp = pack_unet_params(params)
        rng = np.random.default_rng(3)
        x = jnp.asarray(
            rng.normal(size=(1, 12, 32, 64)).astype(np.float32)
        )
        a = np.asarray(unet_apply_wpack(params, x))
        b = np.asarray(unet_apply_wpack(pp, x))
        np.testing.assert_array_equal(a, b)

    def test_odd_width_falls_back_dense(self):
        """W not divisible by P runs the dense block (no wrong reshape)."""
        spec = UNetSpec(2, 4)
        params = init_unet(jax.random.key(4), spec)
        rng = np.random.default_rng(5)
        # W=32k required for the UNet itself; the fallback is per-layer and
        # exercised via conv_wpack usage in _block with an incompatible W.
        from v2e_tpu.models.unet_wpack import _block

        x = jnp.asarray(rng.normal(size=(1, 8, 10, 2)).astype(np.float32))
        out = _block(x, params, "conv1")  # 10 % 4 != 0 -> dense path
        ref = _conv_block(x, params["conv1"])
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
