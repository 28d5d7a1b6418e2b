"""Single-dispatch conversion chunk: SloMo interpolation + DVS emulation +
sparse compaction in ONE jitted XLA program.

The staged pipeline (models/pipeline.py) dispatches ~5 programs per chunk
(preprocess, flow UNet, interpolation, postprocess, emulate+compact), each
materializing its output in HBM and — on remote-attached devices — paying a
dispatch round trip.  For the fixed-upsampling case every stage is shape-
static, so the whole chunk composes into one program: source frames in,
packed sparse events out, with the interpolated stack never leaving the
fusion scope.

The flow UNet's max-flow magnitude is returned in the packed scalars so the
host can adapt the Pallas warp displacement window for the NEXT chunk
(one-chunk lookahead) without a mid-chunk device sync — the same bucketing
`SuperSloMo._choose_disp` does synchronously in the staged path.

Replaces nothing in the reference (its stages are separate processes over
temp dirs, /root/reference/v2e.py:653-850); this is the TPU-native design
SURVEY.md §7 calls for ("one jit-compiled convert_chunk").
"""
from __future__ import annotations

import functools
import logging
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from v2e_tpu.emulator.core import emulate_and_compact_impl
from v2e_tpu.models.slomo import (
    SuperSloMo,
    bucket_upsampling_factor,
    interpolate_pairs,
    max_flow_speed,
    postprocess_frames,
    preprocess_frames,
    snap32,
)

logger = logging.getLogger(__name__)


@functools.partial(jax.jit, static_argnums=(0, 1, 6))
def fused_chunk(
    cfg,
    statics: Tuple,
    emu_params,
    emu_state,
    flow_params,
    interp_params,
    capacity: int,
    frames: jnp.ndarray,
    rel_times: jnp.ndarray,
):
    """frames u8/f32[B+1,H,W] + rel_times f32[B*U] -> (state, outs, packed).

    statics = (H, W, U, max_group, compute_dtype, use_pallas_warp,
    warp_max_disp, quantize, warp_precision, conv_impl); packed additionally
    carries the chunk's max flow magnitude (see `unpack_max_flow`).
    """
    (H, W, U, max_group, compute_dtype, use_pallas_warp, warp_max_disp,
     quantize, warp_precision, conv_impl) = statics
    x = preprocess_frames(frames, snap32(H), snap32(W))
    I0, I1 = x[:-1], x[1:]
    from v2e_tpu.models.unet import unet_apply

    flow_out = unet_apply(
        flow_params, jnp.concatenate([I0, I1], axis=1), compute_dtype,
        conv_impl,
    )
    interp = interpolate_pairs(
        flow_params, interp_params, I0, I1, U, max_group, compute_dtype,
        use_pallas_warp, warp_max_disp, warp_precision, conv_impl,
        flow_out=flow_out,
    )
    dvs = postprocess_frames(interp, H, W, quantize)
    state, outs, packed = emulate_and_compact_impl(
        cfg, emu_params, emu_state, dvs, rel_times, capacity
    )
    # append max-flow (bitcast f32) to the scalar buffer: one extra int32 in
    # the phase-1 fetch gives the host next chunk's warp window for free
    mf = jax.lax.bitcast_convert_type(
        max_flow_speed(flow_out).astype(jnp.float32), jnp.int32
    )
    packed["scalars"] = jnp.concatenate([packed["scalars"], mf[None]])
    return state, outs, packed


def unpack_max_flow(scalars: np.ndarray) -> float:
    """Read back the max-flow scalar appended by `fused_chunk`."""
    return float(np.asarray(scalars[-1:]).view(np.float32)[0])


class FusedConverter:
    """Drives conversion through `fused_chunk`, one program per chunk.

    Wraps a `SuperSloMo` engine and an `EventEmulator`: the first chunk runs
    the staged path (which initializes the emulator state from the first
    interpolated frame — bit-identical to the staged pipeline), subsequent
    chunks are single-dispatch.  Use `usable()` to check the configuration
    qualifies (single device, no host-side consumers of the interpolated
    frames).

    Auto-upsampling mode (`--auto_timestamp_resolution`, the CLI default)
    is fused via a ONE-CHUNK-LOOKAHEAD bucket choice: every fused chunk
    returns its max flow magnitude in the packed scalar fetch, and the next
    chunk's U is the bucketed ceil of that (the identical formula the
    staged path applies to the CURRENT chunk's flow,
    slomo.py:choose_upsampling; the reference syncs the host on every
    chunk's flow instead, slomo.py:352-379).  Flow varies smoothly between
    ~0.5 s chunks and buckets round U UP by ~1.5x, so the lag almost never
    changes the chosen bucket — and each bucket's program compiles once
    (the ladder bounds the set to ~19, slomo.py:46-55).
    """

    def __init__(self, slomo: SuperSloMo, emulator):
        self.slomo = slomo
        self.emulator = emulator
        self._disp: Optional[int] = None  # lookahead warp window
        self._next_u: Optional[int] = None  # lookahead auto-U bucket

    @staticmethod
    def usable(slomo: SuperSloMo, emulator, writes_slomo_video: bool) -> bool:
        return (
            emulator.mesh is None
            and emulator.dvs_h5 is None  # h5 sink stores the DVS frames
            and not writes_slomo_video  # vid_slomo needs frames on host
        )

    def submit_window(
        self, src_frames: np.ndarray, pair_index: int, src_frame_interval: float
    ):
        """Submit one window of source frames [B+1,H,W] whose first pair is
        global pair `pair_index`; interpolated timestamps are built from the
        chosen U.  Handles fixed AND auto upsampling (lookahead bucket).

        Returns (collect handle or None, U, times f64[(B)*U])."""
        slomo = self.slomo
        n_pairs = src_frames.shape[0] - 1
        U = self._next_u if slomo.auto_upsample else slomo.upsampling_factor

        def make_times(u: int) -> np.ndarray:
            rel = np.arange(n_pairs * u, dtype=np.float64) / u
            return (pair_index + rel) * src_frame_interval

        em = self.emulator
        if em.state is None or U is None or n_pairs * U > slomo.max_out_frames:
            handle, U = self._submit_staged(src_frames, make_times)
            return handle, U, make_times(U)
        times = make_times(U)
        slomo.last_upsampling_factor = U
        slomo.upsampling_sum += U
        slomo.upsampling_samples += 1
        return self._submit_fused(src_frames, times, U), U, times

    def submit(self, src_frames: np.ndarray, times: np.ndarray):
        """Fixed-U API: submit a chunk with precomputed interpolated
        timestamps `times` [B*U] (absolute f64).  Returns a collect handle
        (emulator.collect) or None (pure-init chunk)."""
        slomo = self.slomo
        U = slomo.upsampling_factor
        n_out = (src_frames.shape[0] - 1) * U
        if times.shape[0] != n_out:
            raise ValueError(f"times {times.shape} != (B)*U = {n_out}")
        if self.emulator.state is None or n_out > slomo.max_out_frames:
            handle, _ = self._submit_staged(src_frames, lambda u: times)
            return handle
        slomo.upsampling_sum += U
        slomo.upsampling_samples += 1
        return self._submit_fused(src_frames, times, U)

    def _submit_staged(self, src_frames, make_times):
        """Staged fallback: first chunk (state init needs the first
        interpolated frame on host; auto-U needs this chunk's own flow) or
        Colab-scale U (pair slicing keeps device memory flat).  Returns
        (handle, U)."""
        em, slomo = self.emulator, self.slomo
        H, W = em.output_height, em.output_width
        if H is None:
            H, W = src_frames.shape[1:]
        interp, U = slomo.interpolate_batch(jnp.asarray(src_frames), H, W)
        if self._disp is None and slomo.use_pallas_warp:
            self._disp = slomo.last_disp or slomo.warp_max_disp
        if slomo.auto_upsample:
            # staged handles carry no max-flow scalar, so refresh the
            # lookahead here from this chunk's own choice (otherwise a
            # Colab-scale U prediction would keep every later chunk staged)
            self._next_u = U
        return em.submit_batch(interp, make_times(U)), U

    def _submit_fused(self, src_frames, times, U: int):
        em, slomo = self.emulator, self.slomo
        H, W = em.output_height, em.output_width
        disp = self._disp if (slomo.use_pallas_warp and slomo.adaptive_disp
                              and self._disp) else slomo.warp_max_disp
        statics = (
            H, W, U, slomo.max_group, slomo.compute_dtype,
            slomo.use_pallas_warp, disp, True, slomo.warp_precision,
            slomo.conv_impl,
        )
        return em.submit_batch_fused(
            fused_chunk, statics, slomo.flow_params, slomo.interp_params,
            src_frames, times,
        )

    def note_collected(self, handle) -> None:
        """Feed back the chunk's max flow into the lookahead warp window and
        (auto mode) the next chunk's U bucket.  Call after
        emulator.collect(handle) (the scalars are fetched there)."""
        mf = handle.get("max_flow")
        if mf is None:
            return
        slomo = self.slomo
        if slomo.auto_upsample:
            # same formula choose_upsampling applies to the current chunk's
            # flow (slomo.py): at least one interpolated frame per pixel of
            # motion, floored by any explicit --timestamp_resolution
            u = int(math.ceil(mf))
            if slomo.upsampling_factor is not None:
                u = max(u, slomo.upsampling_factor)
            self._next_u = bucket_upsampling_factor(max(u, 2))
        if not slomo.use_pallas_warp:
            return
        need = mf * 1.25 + 2.0
        for b in SuperSloMo.DISP_BUCKETS:
            if need <= b <= slomo.warp_max_disp:
                self._disp = b
                return
        self._disp = slomo.warp_max_disp
