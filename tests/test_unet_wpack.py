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


class TestWpackWiring:
    """unet_impl='wpack' through the conversion stack == dense."""

    def _params(self):
        from v2e_tpu.models.convert_ckpt import init_random_slomo_params

        return init_random_slomo_params()

    def test_interpolate_pairs_wpack_matches_dense(self):
        from v2e_tpu.models.slomo import interpolate_pairs

        fp, ip = self._params()
        rng = np.random.default_rng(7)
        I0 = jnp.asarray(rng.random((2, 1, 32, 64)).astype(np.float32) - 0.4)
        I1 = jnp.asarray(rng.random((2, 1, 32, 64)).astype(np.float32) - 0.4)
        dense = np.asarray(interpolate_pairs(
            fp, ip, I0, I1, 4, 16, jnp.float32, False, 32, False, "3pass",
            "dense",
        ))
        wp = np.asarray(interpolate_pairs(
            pack_unet_params(fp), pack_unet_params(ip), I0, I1, 4, 16,
            jnp.float32, False, 32, False, "3pass", "wpack",
        ))
        np.testing.assert_allclose(wp, dense, atol=5e-4, rtol=1e-3)

    def test_compute_flow_wpack_matches_dense(self):
        from v2e_tpu.models.slomo import compute_flow

        fp, _ = self._params()
        rng = np.random.default_rng(8)
        I0 = jnp.asarray(rng.random((1, 1, 32, 64)).astype(np.float32) - 0.4)
        I1 = jnp.asarray(rng.random((1, 1, 32, 64)).astype(np.float32) - 0.4)
        dense = np.asarray(compute_flow(fp, I0, I1, jnp.float32))
        wp = np.asarray(compute_flow(
            pack_unet_params(fp), I0, I1, jnp.float32, False, "wpack"
        ))
        np.testing.assert_allclose(wp, dense, atol=2e-4, rtol=1e-3)

    def test_engine_and_fused_wpack(self):
        """SuperSloMo(unet_impl='wpack') interpolates and the FusedConverter
        produces the same event stream as a dense-engine conversion."""
        from v2e_tpu.emulator import EventEmulator
        from v2e_tpu.fused import FusedConverter
        from v2e_tpu.models.slomo import SuperSloMo

        def stream(impl):
            slomo = SuperSloMo(model=None, auto_upsample=False,
                               upsampling_factor=3, batch_size=4,
                               allow_random=True, unet_impl=impl)
            em = EventEmulator(pos_thres=0.2, neg_thres=0.2, sigma_thres=0.0,
                               cutoff_hz=0.0, leak_rate_hz=0.0,
                               shot_noise_rate_hz=0.0, seed=3,
                               output_height=32, output_width=64)
            fused = FusedConverter(slomo, em)
            rng = np.random.default_rng(11)
            src = (rng.random((9, 32, 64)) * 255).astype(np.uint8)
            evs = []
            for c in range(2):
                frames = src[c * 4 : c * 4 + 5]
                times = (c * 4 + np.arange(12) / 3.0) / 30.0
                h = fused.submit(frames, times)
                if h is not None:
                    ev, _, _ = em.collect(h)
                    evs.append(ev)
            return np.concatenate(evs) if evs else np.empty((0, 4))

        # random init is seeded identically in both engines; bf16 compute
        # reassociation can flip borderline threshold crossings, so compare
        # event counts within a small tolerance rather than event-for-event
        a, b = stream("dense"), stream("wpack")
        assert abs(len(a) - len(b)) <= max(20, 0.02 * max(len(a), len(b)))
