"""SuperSloMo model tests: torch-parity of the building blocks (so the
pretrained checkpoint drops in), interpolation shapes, and the fused
slomo+emulator pipeline end-to-end."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from v2e_tpu.models import (
    SuperSloMo,
    backwarp,
    init_random_slomo_params,
    interpolate_pairs,
    unet_apply,
)
from v2e_tpu.models.slomo import (
    bucket_upsampling_factor,
    compute_flow,
    max_flow_speed,
    snap32,
)
from v2e_tpu.models.unet import UNetSpec, init_unet


class TestBackwarpTorchParity:
    def test_matches_grid_sample(self):
        """backwarp must equal torch grid_sample with the reference's grid
        construction (model.py:288-299, align_corners=False default)."""
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        N, C, H, W = 2, 3, 16, 20
        img = rng.normal(size=(N, C, H, W)).astype(np.float32)
        flow = (rng.normal(size=(N, 2, H, W)) * 3).astype(np.float32)

        got = np.asarray(backwarp(jnp.asarray(img), jnp.asarray(flow)))

        t_img = torch.tensor(img)
        t_flow = torch.tensor(flow)
        gx, gy = np.meshgrid(np.arange(W), np.arange(H))
        u = t_flow[:, 0]
        v = t_flow[:, 1]
        x = torch.tensor(gx).float().unsqueeze(0) + u
        y = torch.tensor(gy).float().unsqueeze(0) + v
        x = 2 * (x / W - 0.5)
        y = 2 * (y / H - 0.5)
        grid = torch.stack((x, y), dim=3)
        want = torch.nn.functional.grid_sample(t_img, grid, align_corners=False)
        np.testing.assert_allclose(got, want.numpy(), atol=1e-5)


class TestUNetTorchParity:
    def test_matches_torch_unet(self):
        """Full UNet forward equals a torch network of identical structure
        loaded with the same weights (validates conv padding, avgpool and
        align_corners=False bilinear upsampling semantics)."""
        torch = pytest.importorskip("torch")
        nn, F = torch.nn, torch.nn.functional

        spec = UNetSpec(2, 4)
        params = init_unet(jax.random.key(0), spec)

        convs = {}
        for name, ci, co, k in spec.conv_specs:
            conv = nn.Conv2d(ci, co, k, stride=1, padding=(k - 1) // 2)
            with torch.no_grad():
                conv.weight.copy_(torch.tensor(np.asarray(params[name]["w"])))
                conv.bias.copy_(torch.tensor(np.asarray(params[name]["b"])))
            convs[name] = conv

        def lrelu(x):
            return F.leaky_relu(x, negative_slope=0.1)

        def torch_forward(x):
            x = lrelu(convs["conv1"](x))
            s1 = lrelu(convs["conv2"](x))
            skips = [s1]
            x = s1
            for i in range(1, 6):
                x = F.avg_pool2d(x, 2)
                x = lrelu(convs[f"down{i}.conv1"](x))
                x = lrelu(convs[f"down{i}.conv2"](x))
                if i < 5:
                    skips.append(x)
            for i in range(1, 6):
                skip = skips[5 - i]
                x = F.interpolate(x, scale_factor=2, mode="bilinear",
                                  align_corners=False)
                x = lrelu(convs[f"up{i}.conv1"](x))
                x = lrelu(convs[f"up{i}.conv2"](torch.cat((x, skip), 1)))
            return lrelu(convs["conv3"](x))

        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 2, 64, 96)).astype(np.float32)
        got = np.asarray(unet_apply(params, jnp.asarray(x)))
        with torch.no_grad():
            want = torch_forward(torch.tensor(x)).numpy()
        np.testing.assert_allclose(got, want, atol=2e-4)


class TestInterpolation:
    def test_shapes_and_finiteness(self):
        flow_p, interp_p = init_random_slomo_params(3)
        rng = np.random.default_rng(2)
        I0 = jnp.asarray(rng.normal(size=(3, 1, 32, 64)).astype(np.float32))
        I1 = jnp.asarray(rng.normal(size=(3, 1, 32, 64)).astype(np.float32))
        out = interpolate_pairs(flow_p, interp_p, I0, I1, 4)
        assert out.shape == (3, 4, 1, 32, 64)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_static_scene_interpolates_to_same(self):
        """Identical frames with zero estimated flow must interpolate to
        (approximately) the same frame regardless of t."""
        flow_p, interp_p = init_random_slomo_params(4)
        # zero out the flow net so F01=F10=0 exactly
        flow_p = jax.tree_util.tree_map(jnp.zeros_like, flow_p)
        interp_p = jax.tree_util.tree_map(jnp.zeros_like, interp_p)
        img = jnp.asarray(
            np.random.default_rng(5).uniform(-0.4, 0.6, (1, 1, 32, 32)).astype(np.float32)
        )
        out = np.asarray(interpolate_pairs(flow_p, interp_p, img, img, 3))
        # zero flow + zero refinement: Ft_p = (1-t)g0 + t g1 with g the
        # half-pixel-shifted sample of the same image -> all t equal
        np.testing.assert_allclose(out[0, 0], out[0, 1], atol=1e-6)
        np.testing.assert_allclose(out[0, 1], out[0, 2], atol=1e-6)

    def test_max_flow_speed(self):
        flow = np.zeros((1, 4, 8, 8), np.float32)
        flow[0, 0, 3, 3] = 3.0
        flow[0, 1, 3, 3] = 4.0  # magnitude 5
        assert float(max_flow_speed(jnp.asarray(flow))) == pytest.approx(5.0)

    def test_buckets(self):
        assert bucket_upsampling_factor(2) == 2
        assert bucket_upsampling_factor(5) == 6
        assert bucket_upsampling_factor(10) == 12
        assert bucket_upsampling_factor(2000) == 1024
        assert snap32(346) == 320
        assert snap32(260) == 256
        assert snap32(20) == 32

    def test_interpolate_batch_contract(self):
        sm = SuperSloMo(model=None, auto_upsample=False, upsampling_factor=3)
        frames = jnp.asarray(
            np.random.default_rng(0).uniform(0, 255, (4, 48, 64)).astype(np.float32)
        )
        out, U = sm.interpolate_batch(frames, 48, 64)
        assert U == 3
        assert out.shape == (3 * 3, 48, 64)
        o = np.asarray(out)
        assert o.min() >= 0 and o.max() <= 255
        # quantized to 8-bit levels like the reference PNG round trip
        np.testing.assert_allclose(o, np.round(o))


class TestPipelineE2E:
    def test_cli_with_slomo(self, tmp_path):
        import cv2

        from v2e_tpu.cli import main

        vid = str(tmp_path / "in.avi")
        w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"XVID"), 30, (64, 48))
        rng = np.random.default_rng(0)
        for i in range(10):
            fr = np.full((48, 64, 3), 80, np.uint8)
            fr[:, 3 * i : 3 * i + 6] = 180
            w.write(fr)
        w.release()

        rc = main([
            "-i", vid,
            "--output_folder", str(tmp_path / "out"),
            "--unique_output_folder", "false", "--overwrite",
            "--timestamp_resolution", "0.01",
            "--auto_timestamp_resolution", "false",
            "--batch_size", "4",
            "--dvs_text", "ev.txt",
            "--dvs_params", "clean",
            "--skip_video_output",
            "--no_shuffle",
            "--allow_random_slomo",
        ])
        assert rc == 0
        ev = np.loadtxt(tmp_path / "out" / "ev.txt", comments="#")
        assert ev.shape[0] > 0
        assert np.all(np.diff(ev[:, 0]) >= 0)
        # interpolated timestamps are finer than the 33ms source interval
        assert np.min(np.diff(np.unique(ev[:, 0]))) < 1 / 30.0


class TestHighUpsampling:
    def test_slice_generator_bounds_memory(self):
        """Colab-scale factors must be emitted in bounded pair slices."""
        sm = SuperSloMo(model=None, auto_upsample=False, upsampling_factor=16,
                        max_out_frames=32)
        frames = jnp.asarray(
            np.random.default_rng(0).uniform(0, 255, (5, 32, 64)).astype(np.float32)
        )
        U, slices = sm.interpolate_batch_slices(frames, 32, 64)
        assert U == 16
        outs = list(slices)
        # 4 pairs x 16 frames with <=32 frames per slice -> 2 pairs/slice
        assert [o.shape[0] for o, _ in outs] == [32, 32]
        assert [off for _, off in outs] == [0, 2]
        total = np.concatenate([np.asarray(o) for o, _ in outs])
        # equals the one-shot batch result
        want, _ = sm.interpolate_batch(frames, 32, 64)
        np.testing.assert_allclose(total, np.asarray(want), atol=1e-6)

    def test_pipeline_high_u_end_to_end(self, tmp_path):
        import cv2

        from v2e_tpu.cli import main

        vid = str(tmp_path / "in.avi")
        w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"XVID"), 30, (64, 48))
        for i in range(6):
            fr = np.full((48, 64, 3), 80, np.uint8)
            fr[:, 6 * i : 6 * i + 8] = 180
            w.write(fr)
        w.release()

        rc = main([
            "-i", vid,
            "--output_folder", str(tmp_path / "out"),
            "--unique_output_folder", "false", "--overwrite",
            "--timestamp_resolution", "0.002",  # ~16x upsampling
            "--auto_timestamp_resolution", "false",
            "--batch_size", "4",
            "--dvs_text", "ev.txt",
            "--dvs_params", "clean",
            "--skip_video_output", "--no_shuffle",
            "--allow_random_slomo",
        ])
        assert rc == 0
        ev = np.loadtxt(tmp_path / "out" / "ev.txt", comments="#")
        assert ev.shape[0] > 0
        assert np.all(np.diff(ev[:, 0]) >= 0)
        assert np.min(np.diff(np.unique(ev[:, 0]))) < 0.004


class TestTrainSlomoTool:
    def test_train_two_steps_and_load(self, tmp_path):
        """dataset_tools/train_slomo end-to-end on a tiny video: loss is
        finite, checkpoints + npz export are written, and the npz loads
        back into the conversion engine (--slomo_model contract)."""
        import cv2

        vid_dir = tmp_path / "vids"
        vid_dir.mkdir()
        rng = np.random.default_rng(0)
        vw = cv2.VideoWriter(
            str(vid_dir / "a.avi"), cv2.VideoWriter_fourcc(*"XVID"),
            30, (96, 64), False,
        )
        base = rng.integers(40, 210, (64, 96), dtype=np.uint8)
        for i in range(12):
            vw.write(np.roll(base, i * 3, axis=1))
        vw.release()

        from dataset_tools.train_slomo import main

        out = tmp_path / "run"
        rc = main([
            "-i", str(vid_dir), "-o", str(out),
            "--steps", "2", "--batch_size", "2",
            "--crop", "64", "96", "--gap", "2",
            "--checkpoint_every", "2", "--log_every", "1",
        ])
        assert rc == 0
        npz = out / "slomo_trained.npz"
        assert npz.exists()
        assert (out / "ckpt" / "2").exists()

        from v2e_tpu.models.convert_ckpt import load_slomo_params

        flow_p, interp_p = load_slomo_params(str(npz))
        assert flow_p["conv1"]["w"].shape[1] == 2   # UNet(2,4)
        assert interp_p["conv1"]["w"].shape[1] == 12  # UNet(12,5)
