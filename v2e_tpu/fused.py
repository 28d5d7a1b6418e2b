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
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from v2e_tpu.emulator.core import emulate_and_compact_impl
from v2e_tpu.models.slomo import (
    SuperSloMo,
    _flow_apply,
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
    warp_max_disp, quantize, warp_precision, unet_impl); packed additionally
    carries the chunk's max flow magnitude (see `unpack_max_flow`).
    """
    (H, W, U, max_group, compute_dtype, use_pallas_warp, warp_max_disp,
     quantize, warp_precision, unet_impl) = statics
    x = preprocess_frames(frames, snap32(H), snap32(W))
    I0, I1 = x[:-1], x[1:]
    flow_out = _flow_apply(unet_impl)(
        flow_params, jnp.concatenate([I0, I1], axis=1), compute_dtype
    )
    interp = interpolate_pairs(
        flow_params, interp_params, I0, I1, U, max_group, compute_dtype,
        use_pallas_warp, warp_max_disp, False, warp_precision, unet_impl,
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
    """Drives fixed-U conversion through `fused_chunk`, one program per chunk.

    Wraps a `SuperSloMo` engine and an `EventEmulator`: the first chunk runs
    the staged path (which initializes the emulator state from the first
    interpolated frame — bit-identical to the staged pipeline), subsequent
    chunks are single-dispatch.  Use `usable()` to check the configuration
    qualifies (fixed U, single device, no host-side consumers of the
    interpolated frames).
    """

    def __init__(self, slomo: SuperSloMo, emulator):
        self.slomo = slomo
        self.emulator = emulator
        self._disp: Optional[int] = None  # lookahead warp window

    @staticmethod
    def usable(slomo: SuperSloMo, emulator, writes_slomo_video: bool) -> bool:
        return (
            not slomo.auto_upsample
            and not slomo.use_s2d
            and emulator.mesh is None
            and emulator.dvs_h5 is None  # h5 sink stores the DVS frames
            and not writes_slomo_video  # vid_slomo needs frames on host
        )

    def submit(self, src_frames: np.ndarray, times: np.ndarray):
        """Submit one chunk of source frames [B+1,H,W] with interpolated
        timestamps `times` [B*U] (absolute f64).  Returns a collect handle
        (emulator.collect) or None (pure-init chunk)."""
        em = self.emulator
        slomo = self.slomo
        U = slomo.upsampling_factor
        n_out = (src_frames.shape[0] - 1) * U
        if times.shape[0] != n_out:
            raise ValueError(f"times {times.shape} != (B)*U = {n_out}")

        if em.state is None or n_out > slomo.max_out_frames:
            # staged fallback: first chunk (state init needs the first
            # interpolated frame on host) or Colab-scale U (pair slicing
            # keeps device memory flat)
            H, W = em.output_height, em.output_width
            if H is None:
                H, W = src_frames.shape[1:]
            interp, u = slomo.interpolate_batch(jnp.asarray(src_frames), H, W)
            if self._disp is None and slomo.use_pallas_warp:
                self._disp = slomo.last_disp or slomo.warp_max_disp
            return em.submit_batch(interp, times)

        H, W = em.output_height, em.output_width
        disp = self._disp if (slomo.use_pallas_warp and slomo.adaptive_disp
                              and self._disp) else slomo.warp_max_disp
        statics = (
            H, W, U, slomo.max_group, slomo.compute_dtype,
            slomo.use_pallas_warp, disp, True, slomo.warp_precision,
            slomo.unet_impl,
        )
        slomo.upsampling_sum += U
        slomo.upsampling_samples += 1
        handle = em.submit_batch_fused(
            fused_chunk, statics, slomo.flow_params, slomo.interp_params,
            src_frames, times,
        )
        return handle

    def note_collected(self, handle) -> None:
        """Feed back the chunk's max flow into the lookahead warp window.
        Call after emulator.collect(handle) (the scalars are fetched there)."""
        mf = handle.get("max_flow")
        if mf is None or not self.slomo.use_pallas_warp:
            return
        need = mf * 1.25 + 2.0
        for b in SuperSloMo.DISP_BUCKETS:
            if need <= b <= self.slomo.warp_max_disp:
                self._disp = b
                return
        self._disp = self.slomo.warp_max_disp
