"""Time-segment data-parallel conversion: shard video segments over chips.

The reference is strictly single-GPU; SURVEY §5 names the TPU scale-out for
conversion throughput: split a chunk of frames into S contiguous time
segments, run all S emulator scans in parallel (one per chip over a 1-D
``seg`` mesh axis), and merge the per-frame event maps on the time axis.

Each segment is *seeded* with ``warmup`` overlap frames from before its
start: its state initializes fresh from the first overlap frame (exactly
like the emulator's first-frame init, state.py:init_state) and the overlap
frames are replayed to converge the photoreceptor IIR and re-align the
memorized base level; events from the overlap are discarded.

Exactness: per-frame RNG is counter-based (fold_in(key, absolute frame
index), core.py:141-143), so leak/shot draws are IDENTICAL to a continuous
run. The memorized base level re-synchronizes exactly whenever a pixel's
log intensity returns to a level it held at the original start frame (and
whenever a shot event resets the pixel); otherwise it can carry a residual
offset of less than one threshold, shifting events near segment boundaries
by at most one threshold crossing per pixel. The pixel-plane sharding in
parallel/mesh.py is bit-exact; this mode trades that for better scaling
when H*W is small and the frame count is large (high-upsampling regime).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from v2e_tpu.emulator.config import EmulatorConfig
from v2e_tpu.emulator.core import (
    compact_chunk,
    count_occupied,
    emulate_chunk_impl,
)
from v2e_tpu.emulator.state import EmulatorParams, EmulatorState
from v2e_tpu.ops.core import lin_log


def make_segment_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over all (or the first n) devices with axis name 'seg'."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("seg",))


def _segment_init_states(
    cfg: EmulatorConfig,
    state: EmulatorState,
    init_frames: jnp.ndarray,  # f32[S,H,W] each segment's seed frame
    init_times: jnp.ndarray,  # f32[S]
    step0: jnp.ndarray,  # i32[S] absolute frame counter at each seed
) -> EmulatorState:
    """Batched fresh states, one per segment (mirrors state.init_state's
    first-frame semantics; params/key are shared with the continuous run)."""
    S = init_frames.shape[0]
    shape = init_frames.shape
    log0 = init_frames if cfg.hdr else lin_log(init_frames)
    lp = log0
    cs = lp if cfg.csdvs_enabled else None
    base = (lp - cs) if cfg.csdvs_enabled else lp
    keys = jnp.stack([state.key] * S)
    return EmulatorState(
        base_log_frame=base,
        lp_log_frame=lp,
        photoreceptor_noise_arr=jnp.zeros(shape, jnp.float32),
        timestamp_mem=jnp.broadcast_to(
            (init_times - cfg.refractory_period_s)[:, None, None], shape
        ).astype(jnp.float32),
        t_prev=init_times.astype(jnp.float32),
        key=keys,
        step_idx=step0,
        scidvs_highpass=jnp.zeros(shape, jnp.float32) if cfg.scidvs else None,
        scidvs_previous_photo=lp if cfg.scidvs else None,
        cs_surround_frame=cs,
    )


def _plan_segments(F: int, n_segments: int) -> Tuple[int, int]:
    """(frames per segment L, padded total) for F output frames."""
    L = -(-F // n_segments)
    return L, L * n_segments


def emulate_chunk_segmented(
    cfg: EmulatorConfig,
    params: EmulatorParams,
    state: EmulatorState,
    frames: jnp.ndarray,  # [F,H,W] output frames
    times: jnp.ndarray,  # f32[F] chunk-relative
    tail_frames: jnp.ndarray,  # [W+1,H,W] frames preceding frames[0]
    tail_times: jnp.ndarray,  # f32[W+1]
    n_segments: int,
    warmup: int,
    mesh: Optional[Mesh] = None,
) -> Tuple[EmulatorState, Dict[str, jnp.ndarray]]:
    """Segment-parallel equivalent of `emulate_chunk` (same outs contract).

    frames[j] is preceded on the extended timeline by tail_frames (the
    previous chunk's last warmup+1 frames; for the first chunk, replicas of
    the init frame — replays with dt=0 are exact no-ops).

    With ``mesh`` (a 1-D 'seg' mesh) the segment axis is sharding-constrained
    so XLA SPMD-partitions the vmapped scans one-segment-per-device.
    """
    cfg = dataclasses.replace(cfg, use_pallas_scan=False)
    F = frames.shape[0]
    HW = frames.shape[1:]
    W = warmup
    S = n_segments
    L, F_pad = _plan_segments(F, S)

    frames = frames.astype(jnp.float32)
    times = times.astype(jnp.float32)
    # pad the tail of the chunk with dt=0 replays of the last frame
    if F_pad > F:
        frames = jnp.concatenate(
            [frames, jnp.broadcast_to(frames[-1], (F_pad - F, *HW))]
        )
        times = jnp.concatenate(
            [times, jnp.broadcast_to(times[-1], (F_pad - F,))]
        )

    ext = jnp.concatenate([tail_frames.astype(jnp.float32), frames])
    ext_t = jnp.concatenate([tail_times.astype(jnp.float32), times])

    # segment s: seed at ext[s*L], scan ext[s*L+1 .. s*L+W+L], keep last L
    starts = jnp.arange(S, dtype=jnp.int32) * L
    gather = starts[:, None] + jnp.arange(W + L + 1, dtype=jnp.int32)[None]
    seg_frames = ext[gather]  # [S, W+L+1, H, Wd]
    seg_times = ext_t[gather]  # [S, W+L+1]

    step0 = state.step_idx + starts - W  # absolute counter at each seed
    if mesh is not None:
        seg_sh = NamedSharding(mesh, P("seg"))
        seg_frames = jax.lax.with_sharding_constraint(seg_frames, seg_sh)
        seg_times = jax.lax.with_sharding_constraint(seg_times, seg_sh)
    seg_states = _segment_init_states(
        cfg, state, seg_frames[:, 0], seg_times[:, 0], step0
    )
    if mesh is not None:
        seg_states = jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P("seg"))
            ),
            seg_states,
        )

    def run_one(st, fr, tm):
        return emulate_chunk_impl(cfg, params, st, fr, tm)

    end_states, outs = jax.vmap(run_one)(
        seg_states, seg_frames[:, 1:], seg_times[:, 1:]
    )

    # keep only the non-warmup outputs, merge the segment/time axes, trim pad
    def merge(x):
        if x.ndim >= 2 and x.shape[:2] == (S, W + L):
            return x[:, W:].reshape(F_pad, *x.shape[2:])[:F]
        return x

    outs = jax.tree_util.tree_map(merge, outs)

    final = jax.tree_util.tree_map(lambda x: x[-1], end_states)
    # padded dt=0 replays drew no events but the counter must track the
    # continuous run for the next chunk's RNG alignment
    final = final.replace(step_idx=state.step_idx + F, key=state.key)
    return final, outs


@functools.partial(jax.jit, static_argnums=(0, 7, 8, 9, 10))
def emulate_and_compact_segmented(
    cfg: EmulatorConfig,
    params: EmulatorParams,
    state: EmulatorState,
    frames: jnp.ndarray,
    times: jnp.ndarray,
    tail_frames: jnp.ndarray,
    tail_times: jnp.ndarray,
    n_segments: int,
    warmup: int,
    capacity: int,
    mesh: Optional[Mesh] = None,
):
    """Segment-parallel mirror of core.emulate_and_compact: one program,
    same packed-output contract (the facade's collect() is agnostic)."""
    state, outs = emulate_chunk_segmented(
        cfg, params, state, frames, times, tail_frames, tail_times,
        n_segments, warmup, mesh,
    )
    sparse = compact_chunk(cfg, outs, capacity)
    n_occ = count_occupied(cfg, outs)
    scalars = jnp.concatenate(
        [
            outs["stride"].astype(jnp.int32),
            outs["K"].astype(jnp.int32),
            outs["num_on"].astype(jnp.int32),
            outs["num_off"].astype(jnp.int32),
            jax.lax.bitcast_convert_type(
                outs["t_prev"].astype(jnp.float32), jnp.int32
            ),
            jax.lax.bitcast_convert_type(
                outs["t_frame"].astype(jnp.float32), jnp.int32
            ),
            n_occ[None].astype(jnp.int32),
        ]
    )
    return state, outs, {"scalars": scalars, "sparse": sparse}


def shard_segment_inputs(mesh: Mesh, frames, times, tail_frames, tail_times):
    """Replicate chunk inputs over the segment mesh (the segment axis is
    materialized inside the program; XLA SPMD-partitions the vmapped scan
    over 'seg' via the sharding constraint in the gather's consumers)."""
    rep = NamedSharding(mesh, P())
    return tuple(
        jax.device_put(x, rep)
        for x in (frames, times, tail_frames, tail_times)
    )


def dryrun_segments(n_devices: int) -> int:
    """Tiny segmented conversion on an n-device 'seg' mesh; returns the
    total event count (driver dry-run hook)."""
    from v2e_tpu.emulator.state import init_state

    mesh = make_segment_mesh(n_devices)
    cfg = EmulatorConfig(sigma_thres=0.03, shot_noise_rate_hz=1.0)
    rng = np.random.default_rng(0)
    F, H, Wd = 4 * n_devices, 16, 32
    frames = jnp.asarray(rng.uniform(0, 255, (F + 1, H, Wd)).astype(np.float32))
    times = jnp.arange(F + 1, dtype=jnp.float32) / 100.0
    params, state = init_state(cfg, frames[0], times[0], jax.random.key(0))
    warmup = 2
    tail_frames = jnp.broadcast_to(frames[0], (warmup + 1, H, Wd))
    tail_times = jnp.broadcast_to(times[0], (warmup + 1,))
    new_state, outs = jax.jit(
        emulate_chunk_segmented, static_argnums=(0, 7, 8, 9)
    )(
        cfg, params, state, frames[1:], times[1:],
        tail_frames, tail_times, n_devices, warmup, mesh,
    )
    jax.block_until_ready(outs["ev_count"])
    assert outs["ev_count"].shape == (F, H, Wd)
    return int(np.sum(np.asarray(outs["num_on"]) + np.asarray(outs["num_off"])))
