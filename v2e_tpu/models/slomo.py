"""SuperSloMo frame interpolation engine (JAX, device-resident).

Implements the reference's interpolation math
(/root/reference/v2ecore/slomo.py:231-495):

* flow UNet on frame pairs -> bidirectional flows F_0_1, F_1_0
* per intermediate time t=(i+0.5)/U: blend flows, backwarp both frames,
  refinement UNet -> flow residuals + visibility map, visibility-weighted
  blend.  Each batch of pairs is upsampled U-fold with a ``lax.scan`` over
  the U intermediate times (memory stays bounded at one batch of frames).
* auto-upsampling: U = ceil(max flow magnitude) so motion is <= 1 px per
  interpolated frame (slomo.py:352-379).  To keep XLA recompiles bounded,
  the data-dependent U is rounded up into a fixed bucket ladder — finer
  timestamps than requested, never coarser.

Unlike the reference there are no PNG round-trips: interpolated frames stay
on device and feed the event emulator directly (see models/pipeline.py).
A file-based ``interpolate(src_dir, out_dir, size)`` compatibility wrapper
is provided for the dataset tooling.
"""
from __future__ import annotations

import functools
import logging
import math
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from v2e_tpu.models.backwarp import backwarp, warp
from v2e_tpu.models.convert_ckpt import init_random_slomo_params, load_slomo_params
from v2e_tpu.models.unet import unet_apply, unet_apply_io_nhwc

logger = logging.getLogger(__name__)

# dataset normalization mean (reference slomo.py:148)
MEAN = 0.428

# Bucket ladder for the data-dependent auto-upsampling factor: ~1.5x steps,
# so at most ~19 distinct compiled programs and never more than 50% extra
# interpolated frames.
UPSAMPLE_BUCKETS = (
    2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128, 192, 256, 384, 512, 768, 1024,
)


def bucket_upsampling_factor(u: int) -> int:
    for b in UPSAMPLE_BUCKETS:
        if b >= u:
            return b
    return UPSAMPLE_BUCKETS[-1]


def snap32(x: int) -> int:
    """Snap a dimension down to a multiple of 32 (reference dataloader.py:46)."""
    return max(32, int(x / 32) * 32)


@functools.partial(jax.jit, static_argnums=(3, 4))
def compute_flow(
    flow_params, I0: jnp.ndarray, I1: jnp.ndarray, compute_dtype=jnp.bfloat16,
    conv_impl: str = "dense",
) -> jnp.ndarray:
    """Run the flow UNet on a batch of normalized pairs. Returns [B,4,h,w].

    (Two alternative WHOLE-UNET execution forms — space-to-depth and
    width-packed lane-packing — were built and measured SLOWER than XLA's
    dense convs on v5e: s2d 416 vs 316 ms per 160-frame interp chunk in
    round 2, wpack 114.6 vs 95.7 ms per 96-frame forward in round 4.  Both
    were removed; numbers live in benchmarks/README.md.  The per-layer
    "blocked" form (conv_impl, unet.py:_conv_block) is the one that won.)"""
    return unet_apply(
        flow_params, jnp.concatenate([I0, I1], axis=1), compute_dtype,
        conv_impl,
    )


def max_flow_speed(flow_out: jnp.ndarray) -> jnp.ndarray:
    """Max flow magnitude over both directions/batch (pixels per interframe)."""
    u01, v01 = flow_out[:, 0], flow_out[:, 1]
    u10, v10 = flow_out[:, 2], flow_out[:, 3]
    sp = jnp.maximum(u01 * u01 + v01 * v01, u10 * u10 + v10 * v10)
    return jnp.sqrt(jnp.max(sp))


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9, 10))
def interpolate_pairs(
    flow_params,
    interp_params,
    I0: jnp.ndarray,
    I1: jnp.ndarray,
    upsampling_factor: int,
    max_group: int = 96,
    compute_dtype=jnp.bfloat16,
    use_pallas_warp: bool = False,
    warp_max_disp: int = 32,
    warp_precision: str = "1pass",
    conv_impl: str = "dense",
    flow_out: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Interpolate U intermediate frames for each pair in the batch.

    Args:
      I0, I1: [B,1,h,w] normalized (0-1 minus MEAN) frame pairs.
      upsampling_factor: static U >= 2.
      max_group: target device batch for the refinement UNet.  Intermediate
        times are folded into the batch dimension in groups of
        g = max_group//B so the MXU sees large batches (the reference loops
        t one at a time, slomo.py:404); groups beyond the first run under a
        ``lax.scan`` to bound activation memory at high U.
      compute_dtype: UNet compute precision (bfloat16 = MXU native).
      flow_out: optionally reuse a precomputed flow UNet output.

    Returns [B, U, 1, h, w] normalized interpolated frames at times
    t=(i+0.5)/U between each pair (the reference's half-sample offset,
    slomo.py:405).
    """
    return _interpolate_pairs_planar(
        flow_params, interp_params, I0, I1, upsampling_factor,
        max_group, compute_dtype, use_pallas_warp, warp_max_disp,
        flow_out, warp_precision, conv_impl,
    )


def _group_split(U: int, B: int, max_group: int):
    """Split U intermediate times into n groups of g, minimizing padded
    (wasted) UNet forwards while keeping the device batch g*B near
    max_group."""
    best = None
    for n in range(1, U + 1):
        g_cand = -(-U // n)
        if g_cand * B > max(max_group, B):
            continue
        key = (n * g_cand - U, n)
        if best is None or key < best[0]:
            best = (key, n, g_cand)
    _, n_groups, g = best
    return n_groups, g


def _interpolate_pairs_planar(
    flow_params, interp_params, I0, I1, U, max_group, compute_dtype,
    use_pallas_warp, warp_max_disp, flow_out, warp_precision="1pass",
    conv_impl="dense",
):
    """The dense interpolation chain on PLANAR [N,h,w] tensors.

    Same math as the NCHW body in `interpolate_pairs` (reference
    slomo.py:404-433) with every image/flow component kept as its own
    [N,h,w] plane and the refinement UNet fed NHWC directly
    (unet_apply_io_nhwc) — no layout transposes anywhere in the group
    body (the NCHW round trips were ~22 ms per 160-frame chunk on v5e).
    """
    from v2e_tpu.models.backwarp import warp_planar

    if flow_out is None:
        flow_out = unet_apply(
            flow_params, jnp.concatenate([I0, I1], axis=1), compute_dtype,
            conv_impl,
        )
    B = I0.shape[0]
    # NCHW channel slices are contiguous planes — no transpose
    P0, P1 = I0[:, 0], I1[:, 0]
    u01, v01 = flow_out[:, 0], flow_out[:, 1]
    u10, v10 = flow_out[:, 2], flow_out[:, 3]

    ts = (jnp.arange(U, dtype=jnp.float32) + 0.5) / U
    n_groups, g = _group_split(U, B, max_group)
    pad = n_groups * g - U
    ts_groups = jnp.concatenate(
        [ts, jnp.full((pad,), 0.5, jnp.float32)]
    ).reshape(n_groups, g)

    tile = lambda p: jnp.tile(p, (g, 1, 1))  # [g*B,h,w]
    P0g, P1g = tile(P0), tile(P1)
    u01g, v01g = tile(u01), tile(v01)
    u10g, v10g = tile(u10), tile(v10)

    def group(ts_g):
        t = jnp.repeat(ts_g, B)[:, None, None]  # [g*B,1,1]
        tmp = -t * (1.0 - t)
        a, b = tmp, t * t
        c, d = (1.0 - t) * (1.0 - t), tmp
        ut0 = a * u01g + b * u10g
        vt0 = a * v01g + b * v10g
        ut1 = c * u01g + d * u10g
        vt1 = c * v01g + d * v10g
        # both directions in one batched warp call
        g01 = warp_planar(
            jnp.concatenate([P0g, P1g]),
            jnp.concatenate([ut0, ut1]),
            jnp.concatenate([vt0, vt1]),
            use_pallas_warp, warp_max_disp, warp_precision,
        )
        g0, g1 = g01[: g * B], g01[g * B :]
        # 12-channel NHWC stack (cast per plane so the casts fuse into the
        # producers); channel order matches the reference's torch.cat
        # (slomo.py:415) for checkpoint parity
        stack = jnp.stack(
            [
                p.astype(compute_dtype)
                for p in (P0g, P1g, u01g, v01g, u10g, v10g,
                          ut1, vt1, ut0, vt0, g1, g0)
            ],
            axis=-1,
        )
        intrp = unet_apply_io_nhwc(interp_params, stack, compute_dtype, conv_impl)
        intrp = intrp.astype(jnp.float32)
        ut0f = intrp[..., 0] + ut0
        vt0f = intrp[..., 1] + vt0
        ut1f = intrp[..., 2] + ut1
        vt1f = intrp[..., 3] + vt1
        V0 = jax.nn.sigmoid(intrp[..., 4])
        V1 = 1.0 - V0
        g01f = warp_planar(
            jnp.concatenate([P0g, P1g]),
            jnp.concatenate([ut0f, ut1f]),
            jnp.concatenate([vt0f, vt1f]),
            use_pallas_warp, warp_max_disp, warp_precision,
        )
        g0f, g1f = g01f[: g * B], g01f[g * B :]
        w0 = (1.0 - t) * V0
        w1 = t * V1
        Ft_p = (w0 * g0f + w1 * g1f) / (w0 + w1)
        return Ft_p.reshape(g, B, *Ft_p.shape[1:])  # [g,B,h,w]

    if n_groups == 1:
        frames = group(ts_groups[0])
    else:
        _, frames = jax.lax.scan(
            lambda _, tg: (None, group(tg)), None, ts_groups
        )
        frames = frames.reshape(n_groups * g, *frames.shape[2:])
    frames = frames[:U]  # [U,B,h,w]
    return jnp.moveaxis(frames, 0, 1)[:, :, None]  # [B,U,1,h,w]


@functools.partial(jax.jit, static_argnums=(1, 2))
def preprocess_frames(frames: jnp.ndarray, h32: int, w32: int) -> jnp.ndarray:
    """0-255 [N,H,W] -> normalized [N,1,h32,w32] (resize + scale + demean)."""
    n = frames.shape[0]
    x = frames.astype(jnp.float32) / 255.0 - MEAN
    x = x[:, None, :, :]
    if (h32, w32) != frames.shape[1:]:
        x = jax.image.resize(x, (n, 1, h32, w32), method="lanczos3")
    return x


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def postprocess_frames(
    interp: jnp.ndarray, H: int, W: int, quantize: bool = True
) -> jnp.ndarray:
    """[B,U,1,h,w] normalized -> [B*U,H,W] 0-255 float32, time-ordered.

    Resizes back to the output dimensions (bilinear, like the reference's
    PIL resize, slomo.py:438) and optionally rounds to 8-bit levels to match
    the reference's PNG round-trip quantization.
    """
    B, U = interp.shape[:2]
    x = interp.reshape(B * U, 1, interp.shape[3], interp.shape[4])
    if (interp.shape[3], interp.shape[4]) != (H, W):
        x = jax.image.resize(x, (B * U, 1, H, W), method="bilinear")
    x = (x[:, 0] + MEAN) * 255.0
    x = jnp.clip(x, 0.0, 255.0)
    if quantize:
        x = jnp.round(x)
    return x


class SuperSloMo:
    """Batched frame-pair interpolation engine.

    API mirrors the reference class (slomo.py:37-229) minus torch/PNG
    plumbing: construct with a checkpoint path (torch .ckpt or converted
    .npz; None = random weights), then either use the device API
    ``interpolate_batch`` or the file API ``interpolate``.
    """

    def __init__(
        self,
        model: Optional[str],
        auto_upsample: bool,
        upsampling_factor: Optional[int] = None,
        batch_size: int = 8,
        video_path: Optional[str] = None,
        vid_orig: Optional[str] = "original.avi",
        vid_slomo: Optional[str] = "slomo.avi",
        preview: bool = False,
        avi_frame_rate: int = 30,
        compute_dtype: str = "bfloat16",
        max_group: int = 96,
        use_pallas_warp: Optional[bool] = None,
        warp_max_disp: int = 32,
        max_out_frames: int = 4096,
        allow_random: bool = False,
        adaptive_disp: bool = True,
        warp_precision: str = "1pass",
        conv_impl: str = "auto",
    ):
        if not auto_upsample and (
            not isinstance(upsampling_factor, int) or upsampling_factor < 2
        ):
            raise ValueError(
                f"upsampling_factor={upsampling_factor} must be an int > 1 "
                "when auto_upsample=False"
            )
        self.auto_upsample = auto_upsample
        self.upsampling_factor = upsampling_factor
        self.batch_size = batch_size
        self.video_path = video_path
        self.vid_orig = vid_orig
        self.vid_slomo = vid_slomo
        self.avi_frame_rate = avi_frame_rate
        self.upsampling_sum = 0
        self.upsampling_samples = 0
        self.last_upsampling_factor: Optional[int] = None
        self.compute_dtype = jnp.dtype(compute_dtype)
        self.max_group = max_group
        if use_pallas_warp is None:
            use_pallas_warp = jax.default_backend() == "tpu"
        self.use_pallas_warp = use_pallas_warp
        self.warp_max_disp = warp_max_disp
        # flow-bucketed warp windows (see _choose_disp); per-bucket compiles
        self.adaptive_disp = adaptive_disp
        # Pallas warp matmul precision: "1pass" (plain bf16, ~4e-3 abs —
        # about one 8-bit DN, measured BELOW the seed-change noise floor on
        # the event stream, scripts/warp_precision_check.py round 4) or
        # "3pass" (bf16x3, ~1e-5 abs, 2x the warp MXU passes).  See
        # ops/pallas/warp.py.
        self.warp_precision = warp_precision
        # UNet conv execution form (unet.py).  "auto" resolves to the
        # packed-RESIDENT form plus the up4/up5 upsample+conv FOLD on TPU:
        # pack 4 columns into the lanes ONCE, keep the layout resident
        # across the lane-bound leading conv pairs and the pooling, unpack
        # only at the skip taps; on the up path, collapse the lane-bound
        # up4/up5 bilinear-x2+conv1 pairs into ONE half-res conv each with
        # the 4 output phases stacked on channels (fills the MXU lanes and
        # skips the upsampled tensor's HBM round trip).  Measured round 5
        # on v5e (scripts/bench_unet_forms.py, interleaved-warm, 80-frame
        # interp forward at 256x320): dense 91.9 ms -> packed 66.4 ms
        # (-27%) -> packedfold45 63.3 ms; flow UNet 26.5 -> 21 ms.
        # Confirmed on the FULL pipeline by the interleaved A/B
        # (scripts/bench_ab_full.py): packedfold45 beat packed in 4/4
        # windows (clean-window 2.50x vs 2.43x).  Folding ALL up levels
        # (packedfold) measured slightly worse (64.1 ms) — the >=128-channel
        # mid-levels already run at 79-100% of bf16 peak dense, so the fold
        # only pays where the lanes are underfilled.  Elsewhere
        # (CPU tests/dryruns) auto stays dense.
        if conv_impl == "auto":
            conv_impl = (
                "packedfold45" if jax.default_backend() == "tpu" else "dense"
            )
        self.conv_impl = conv_impl
        self.last_disp: Optional[int] = None  # most recent warp window
        # bound on materialized interpolated frames per device call: at the
        # Colab-scale ~800x upsampling (reference README.md:38-41) a full
        # batch would be GBs, so pairs are emitted in slices
        self.max_out_frames = max_out_frames

        if model is not None and os.path.isfile(model):
            self.flow_params, self.interp_params = load_slomo_params(model)
            logger.info(f"loaded SuperSloMo weights from {model}")
        elif model is not None and not allow_random:
            # fail loudly like the reference (slomo.py:201-204): silently
            # interpolating with random weights produces physically
            # meaningless frames
            raise FileNotFoundError(
                f"SuperSloMo model checkpoint {model} does not exist or is "
                "not readable. Convert the reference SuperSloMo39.ckpt with "
                "python -m v2e_tpu.models.convert_ckpt <ckpt> <out.npz>, or "
                "pass --allow_random_slomo to proceed with random weights "
                "(benchmarking only)."
            )
        else:
            if model is not None:
                logger.warning(
                    f"SuperSloMo checkpoint {model} not found; using random "
                    "weights (interpolation quality will be meaningless — "
                    "convert the reference ckpt with "
                    "v2e_tpu.models.convert_ckpt)"
                )
            self.flow_params, self.interp_params = init_random_slomo_params()

    # ------------------------------------------------------------------
    def choose_upsampling(self, flow_out: jnp.ndarray) -> int:
        """Pick U for this batch (auto mode: from max flow, bucketed)."""
        if not self.auto_upsample:
            u = self.upsampling_factor
        else:
            max_speed = float(max_flow_speed(flow_out))
            u = int(math.ceil(max_speed))
            if self.upsampling_factor is not None and self.upsampling_factor > u:
                u = self.upsampling_factor
            u = bucket_upsampling_factor(max(u, 2))
        u = max(u, 2)
        self.last_upsampling_factor = u
        self.upsampling_sum += u
        self.upsampling_samples += 1
        return u

    @property
    def avg_upsampling_factor(self) -> float:
        if self.upsampling_samples == 0:
            return float(self.upsampling_factor or 0)
        return self.upsampling_sum / self.upsampling_samples

    DISP_BUCKETS = (8, 16, 32)

    def _choose_disp(self, flow_out: jnp.ndarray, U: int) -> int:
        """Pick the warp kernel's displacement window for this chunk.

        The one-hot-matmul warp kernel's cost scales with its supported
        window M (region rows ~ 2M+8); real inter-frame flows are usually a
        few pixels, so M is bucketed from the chunk's measured max flow
        (1.25x + 2 px headroom for the refinement UNet's flow deltas) —
        same one-scalar host fetch auto-upsample mode already pays.  The
        bucket never exceeds flow magnitude, so nothing is clamped that the
        static window would not also clamp."""
        max_disp = self.warp_max_disp
        if self.auto_upsample and U > max_disp:
            self.last_disp = U
            return U  # flow beyond the static cap: widen (tiled kernel)
        if self.use_pallas_warp and self.adaptive_disp:
            need = float(max_flow_speed(flow_out)) * 1.25 + 2.0
            for b in self.DISP_BUCKETS:
                if need <= b <= max_disp:
                    self.last_disp = b
                    return b
        self.last_disp = max_disp
        return max_disp

    def interpolate_batch(
        self, frames: jnp.ndarray, H: int, W: int, quantize: bool = True
    ) -> Tuple[jnp.ndarray, int]:
        """Interpolate a chunk of consecutive source frames.

        Args:
          frames: [N,H,W] 0-255 source frames (N>=2); pairs are
            (0,1),(1,2),...,(N-2,N-1).

        Returns (interp [ (N-1)*U, H, W ] 0-255 float32 device array, U).
        Output frame k*U+i sits at source-unit time k + i/U; the final
        source frame is NOT included (it seeds the next chunk), matching
        the reference's chunking contract (slomo.py:243-260).
        """
        h32, w32 = snap32(H), snap32(W)
        x = preprocess_frames(frames, h32, w32)
        I0, I1 = x[:-1], x[1:]
        flow_out = compute_flow(self.flow_params, I0, I1, self.compute_dtype,
                                self.conv_impl)
        U = self.choose_upsampling(flow_out)
        max_disp = self._choose_disp(flow_out, U)

        slices = [
            s for s, _ in self._emit_slices(I0, I1, flow_out, U, max_disp, H, W, quantize)
        ]
        out = slices[0] if len(slices) == 1 else jnp.concatenate(slices)
        return out, U

    def _emit_slices(self, I0, I1, flow_out, U, max_disp, H, W, quantize=True):
        """Yield (frames [n*U,H,W], pair_offset) in pair slices bounded by
        max_out_frames — keeps device memory flat at Colab-scale (~800x)
        upsampling factors."""
        B = I0.shape[0]
        pair_slice = max(1, self.max_out_frames // U) if U > 0 else B
        for s in range(0, B, pair_slice):
            interp = interpolate_pairs(
                self.flow_params, self.interp_params,
                I0[s : s + pair_slice], I1[s : s + pair_slice], U,
                self.max_group, self.compute_dtype,
                self.use_pallas_warp, max_disp, self.warp_precision,
                self.conv_impl,
                flow_out=flow_out[s : s + pair_slice],
            )
            yield postprocess_frames(interp, H, W, quantize), s

    def interpolate_batch_slices(self, frames, H, W, quantize=True):
        """Like interpolate_batch but returns (U, generator of
        (frames_slice, pair_offset)) without materializing the whole chunk —
        device memory stays flat at very high upsampling factors."""
        h32, w32 = snap32(H), snap32(W)
        x = preprocess_frames(frames, h32, w32)
        I0, I1 = x[:-1], x[1:]
        flow_out = compute_flow(self.flow_params, I0, I1, self.compute_dtype,
                                self.conv_impl)
        U = self.choose_upsampling(flow_out)
        max_disp = self._choose_disp(flow_out, U)
        return U, self._emit_slices(I0, I1, flow_out, U, max_disp, H, W, quantize)

    # ------------------------------------------------------------------
    def interpolate(
        self, source_frame_path: str, output_folder: str, frame_size
    ) -> Tuple[np.ndarray, float]:
        """File-based compatibility API: read .npy frames from a folder,
        write interpolated PNGs numbered 0..M-1, return (interpTimes,
        avg_upsampling_factor) — the reference's contract
        (slomo.py:231-495) for the dataset tooling."""
        import cv2

        files = sorted(
            (f for f in os.listdir(source_frame_path) if f.endswith(".npy")),
            key=lambda s: int(os.path.splitext(s)[0]) if os.path.splitext(s)[0].isdigit() else 0,
        )
        if len(files) < 2:
            raise ValueError(
                f"need at least 2 source frames in {source_frame_path}"
            )
        frames = np.stack(
            [np.load(os.path.join(source_frame_path, f)) for f in files]
        ).astype(np.float32)
        W, H = frame_size
        os.makedirs(output_folder, exist_ok=True)

        interp_times = []
        out_idx = 0
        input_counter = 0
        B = self.batch_size
        for s in range(0, len(frames) - 1, B):
            chunk = frames[s : s + B + 1]
            if chunk.shape[0] < 2:
                break
            out, U = self.interpolate_batch(jnp.asarray(chunk), H, W)
            out_np = np.asarray(out).astype(np.uint8)
            n_pairs = chunk.shape[0] - 1
            for k in range(out_np.shape[0]):
                cv2.imwrite(os.path.join(output_folder, f"{out_idx}.png"), out_np[k])
                interp_times.append(input_counter + (k % U) / U + (k // U))
                out_idx += 1
            input_counter += n_pairs
        return np.array(interp_times), self.avg_upsampling_factor

    def get_interpolated_timestamps(self, ts: np.ndarray) -> np.ndarray:
        """Interpolate real timestamps U-fold with the half-sample offset
        (reference slomo.py:540-564).

        In auto-upsample mode the factor chosen for the most recent batch is
        used (the reference leaves this as a TODO, slomo.py:559: it reads
        ``self.upsampling_factor`` which is None/stale in auto mode)."""
        U = getattr(self, "last_upsampling_factor", None) or self.upsampling_factor or 2
        out = []
        for i in range(ts.shape[0] - 1):
            start, end = ts[i], ts[i + 1]
            out.append(
                np.linspace(start, end, U, endpoint=False)
                + 0.5 * (end - start) / U
            )
        return np.hstack(out)
