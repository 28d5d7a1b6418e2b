"""Fused Pallas scan kernel for the DVS emulator's sequential core.

The XLA fast path (emulator/core.py) already hoists all state-free work out
of the frame scan; what remains per frame is the memorized-base update:

    diff  = lp[f] (+ noise) - base (- leak)
    pos   = floor(relu(diff)/pos_th);  neg = floor(relu(-diff)/neg_th)
    base += pos*pos_th - neg*neg_th;   base = lp[f] where shot fired

This kernel runs that whole time loop INSIDE one Pallas program per pixel
tile: the carried base frame lives in VMEM for all F frames (zero HBM
traffic for state), inputs/outputs stream through VMEM blocks.  It covers
every configuration except the refractory filter and CSDVS (3x3 halo).

The refractory filter (reference emulator.py:830-846) couples all pixels
through the global per-frame max count K (the sub-frame timestamp grid is
``dt/K``), so it cannot run in the pixel-tiled kernel above.
`emulator_scan_refractory_pallas` handles it with a different decomposition:
the grid iterates over FRAMES (TPU grid steps are sequential), the whole
padded pixel plane plus the base/timestamp state lives in VMEM scratch, and
K is an in-kernel full-plane reduction — the closed-form refractory
(ops/core.py::refractory_filter) then applies exactly, per frame, with the
per-frame inputs streaming through 1-frame VMEM blocks.  Exact vs the XLA
scan; used when the padded plane fits the VMEM budget (`refractory_plane_ok`).

Layout: the pixel plane is flattened and tiled as (SUB, LANE) = (8, 256)
per grid step; frames are pre-reshaped to [F, n_tiles, 8, 256].
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 8
LANE = 256
TILE = SUB * LANE
# frames per kernel invocation: bounds the VMEM block stack (~3 MB/segment
# with double buffering); longer chunks chain segments through the carried
# base frame
F_SEG = 128


def _kernel(lp_ref, leak_ref, shot_ref, pos_th_ref, neg_th_ref, base_ref,
            base_out_ref, count_ref, *, F, has_leak, has_shot):
    base = base_ref[0, 0]
    pos_th = pos_th_ref[0, 0]
    neg_th = neg_th_ref[0, 0]

    def body(f, base):
        lp = lp_ref[f, 0]
        if has_leak:
            base = base - leak_ref[f, 0]
        diff = lp - base
        pos = jnp.floor(jnp.maximum(diff, 0.0) / pos_th)
        neg = jnp.floor(jnp.maximum(-diff, 0.0) / neg_th)
        base = base + pos * pos_th - neg * neg_th
        if has_shot:
            base = jnp.where(shot_ref[f, 0] != 0, lp, base)
        count_ref[f, 0] = (pos - neg).astype(jnp.int16)
        return base

    base = jax.lax.fori_loop(0, F, body, base)
    base_out_ref[0, 0] = base


@functools.partial(jax.jit, static_argnums=(6,))
def emulator_scan_pallas(
    lp: jnp.ndarray,
    leak_delta: Optional[jnp.ndarray],
    shot_any: Optional[jnp.ndarray],
    pos_thres: jnp.ndarray,
    neg_thres: jnp.ndarray,
    base: jnp.ndarray,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the sequential core over all frames in one fused kernel.

    Args:
      lp: f32[F,H,W] lowpassed log frames (precomputed).
      leak_delta: f32[F,H,W] leak decrements or None.
      shot_any: bool/u8[F,H,W] shot-event mask (ON|OFF) or None.
      pos_thres, neg_thres: f32[H,W].
      base: f32[H,W] memorized log frame.

    Returns (new_base f32[H,W], signed counts i16[F,H,W]).
    """
    F, H, W = lp.shape
    if F > F_SEG:
        # chain time segments through the carried base frame
        counts_parts = []
        for s in range(0, F, F_SEG):
            base, counts_s = emulator_scan_pallas(
                lp[s : s + F_SEG],
                leak_delta[s : s + F_SEG] if leak_delta is not None else None,
                shot_any[s : s + F_SEG] if shot_any is not None else None,
                pos_thres, neg_thres, base, interpret,
            )
            counts_parts.append(counts_s)
        return base, jnp.concatenate(counts_parts)

    npix = H * W
    n_tiles = -(-npix // TILE)
    pad = n_tiles * TILE - npix

    def tile_view(x, dtype=None):
        x = x.reshape(x.shape[:-2] + (npix,))
        if pad:
            pad_width = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
            x = jnp.pad(x, pad_width, constant_values=1 if dtype == "thres" else 0)
        return x.reshape(x.shape[:-1] + (n_tiles, SUB, LANE))

    lp_t = tile_view(lp)
    pos_t = tile_view(pos_thres, "thres")[None]
    neg_t = tile_view(neg_thres, "thres")[None]
    base_t = tile_view(base)[None]
    has_leak = leak_delta is not None
    has_shot = shot_any is not None
    leak_t = tile_view(leak_delta) if has_leak else jnp.zeros(
        (1, n_tiles, SUB, LANE), jnp.float32
    )
    shot_t = (
        tile_view(shot_any.astype(jnp.uint8)) if has_shot
        else jnp.zeros((1, n_tiles, SUB, LANE), jnp.uint8)
    )

    kernel = functools.partial(
        _kernel, F=F, has_leak=has_leak, has_shot=has_shot
    )
    Fl = F if has_leak else 1
    Fs = F if has_shot else 1
    new_base, counts = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((F, 1, SUB, LANE), lambda i: (0, i, 0, 0)),
            pl.BlockSpec((Fl, 1, SUB, LANE), lambda i: (0, i, 0, 0)),
            pl.BlockSpec((Fs, 1, SUB, LANE), lambda i: (0, i, 0, 0)),
            pl.BlockSpec((1, 1, SUB, LANE), lambda i: (0, i, 0, 0)),
            pl.BlockSpec((1, 1, SUB, LANE), lambda i: (0, i, 0, 0)),
            pl.BlockSpec((1, 1, SUB, LANE), lambda i: (0, i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, SUB, LANE), lambda i: (0, i, 0, 0)),
            pl.BlockSpec((F, 1, SUB, LANE), lambda i: (0, i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_tiles, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((F, n_tiles, SUB, LANE), jnp.int16),
        ],
        interpret=interpret,
    )(lp_t, leak_t, shot_t, pos_t, neg_t, base_t)

    new_base = new_base.reshape(-1)[:npix].reshape(H, W)
    counts = counts.reshape(F, -1)[:, :npix].reshape(F, H, W)
    return new_base, counts


# ---------------------------------------------------------------------------
# refractory-capable variant: grid over frames, full plane in VMEM


def refractory_plane_ok(H: int, W: int) -> bool:
    """True if the padded plane fits the refractory kernel's VMEM budget.

    Rough accounting (bytes/pixel): 16 persistent (base, mem, pos, neg) +
    ~13x2 double-buffered streams (lp, leak, shot, count, i0) ~= 42 B/px.
    Cap at 256K pixels (~11 MB of 16 MB VMEM).
    """
    Hp = -(-H // SUB) * SUB
    Wp = -(-W // 128) * 128
    return Hp * Wp <= 256 * 1024


def _refr_kernel(
    dt_ref, tprev_ref,  # scalar prefetch [F] f32 (SMEM)
    lp_ref, leak_ref, shot_ref, pos_ref, neg_ref, base_in_ref, mem_in_ref,
    count_ref, i0_ref, k_ref, base_out_ref, mem_out_ref,
    base_s, mem_s,
    *, F, has_leak, has_shot, R,
):
    f = pl.program_id(0)

    @pl.when(f == 0)
    def _init():
        base_s[...] = base_in_ref[...]
        mem_s[...] = mem_in_ref[...]

    base = base_s[...]
    mem = mem_s[...]
    lp = lp_ref[0]
    if has_leak:
        base = base - leak_ref[0]
    pos_th = pos_ref[...]
    neg_th = neg_ref[...]
    diff = lp - base
    pos = jnp.floor(jnp.maximum(diff, 0.0) / pos_th)
    neg = jnp.floor(jnp.maximum(-diff, 0.0) / neg_th)
    count = (pos + neg).astype(jnp.int32)  # disjoint per pixel

    K = jnp.max(count)
    K_eff = jnp.maximum(K, 1)
    dt = dt_ref[f]
    t_prev = tprev_ref[f]
    ts_step = jnp.maximum(dt, 1e-12) / K_eff.astype(jnp.float32)

    # closed-form refractory — op-for-op ops/core.py::refractory_filter
    Rf = jnp.float32(R)
    active = Rf > ts_step
    q = (mem + Rf - t_prev) / ts_step
    i0_f = jnp.maximum(jnp.floor(q), 0.0)
    i0 = i0_f.astype(jnp.int32)
    m = (jnp.floor(Rf / ts_step) + 1.0).astype(jnp.int32)
    has = (count > 0) & (i0 <= count - 1)
    n_emit = jnp.where(has, (count - 1 - i0) // jnp.maximum(m, 1) + 1, 0)
    i_last = i0 + (n_emit - 1) * m
    t_last = t_prev + (i_last.astype(jnp.float32) + 1.0) * ts_step
    new_mem = jnp.where(n_emit > 0, t_last, mem)
    n_emit = jnp.where(active, n_emit, count)
    i0_out = jnp.where(active & has, i0, 0)
    new_mem = jnp.where(active, new_mem, mem)

    final_pos = jnp.where(pos > 0, n_emit, 0)
    final_neg = jnp.where(neg > 0, n_emit, 0)
    base = base + final_pos.astype(jnp.float32) * pos_th
    base = base - final_neg.astype(jnp.float32) * neg_th
    if has_shot:
        base = jnp.where(shot_ref[0] != 0, lp, base)

    count_ref[0] = (final_pos - final_neg).astype(jnp.int16)
    i0_ref[0] = i0_out.astype(jnp.int16)
    k_ref[0] = jnp.full((SUB, 128), K, jnp.int32)
    base_s[...] = base
    mem_s[...] = new_mem

    @pl.when(f == F - 1)
    def _fin():
        base_out_ref[...] = base
        mem_out_ref[...] = new_mem


@functools.partial(jax.jit, static_argnums=(9, 10))
def emulator_scan_refractory_pallas(
    lp: jnp.ndarray,
    leak_delta: Optional[jnp.ndarray],
    shot_any: Optional[jnp.ndarray],
    pos_thres: jnp.ndarray,
    neg_thres: jnp.ndarray,
    base: jnp.ndarray,
    timestamp_mem: jnp.ndarray,
    dts: jnp.ndarray,
    t_prevs: jnp.ndarray,
    refractory_period_s: float,
    interpret: bool = False,
):
    """Fused frame scan WITH the exact closed-form refractory filter.

    Args are as `emulator_scan_pallas` plus the refractory state/scalars:
      timestamp_mem: f32[H,W] per-pixel last-spike time.
      dts, t_prevs: f32[F] per-frame interval and start time.
      refractory_period_s: static R > 0.

    Returns (new_base f32[H,W], new_mem f32[H,W], signed counts i16[F,H,W],
    i0 i16[F,H,W], K i32[F]).
    """
    F, H, W = lp.shape
    Hp = -(-H // SUB) * SUB
    Wp = -(-W // 128) * 128

    def pad_plane(x, val=0.0):
        return jnp.pad(x, ((0, Hp - H), (0, Wp - W)), constant_values=val)

    def pad_frames(x, val=0.0):
        return jnp.pad(
            x, ((0, 0), (0, Hp - H), (0, Wp - W)), constant_values=val
        )

    has_leak = leak_delta is not None
    has_shot = shot_any is not None
    lp_p = pad_frames(lp)
    # huge padded thresholds zero the padded counts, keeping K exact
    pos_p = pad_plane(pos_thres, 1e30)
    neg_p = pad_plane(neg_thres, 1e30)
    base_p = pad_plane(base)
    mem_p = pad_plane(timestamp_mem)
    leak_p = pad_frames(leak_delta) if has_leak else jnp.zeros(
        (1, Hp, Wp), jnp.float32
    )
    shot_p = (
        pad_frames(shot_any.astype(jnp.uint8)) if has_shot
        else jnp.zeros((1, Hp, Wp), jnp.uint8)
    )
    Fl = F if has_leak else 1
    Fs = F if has_shot else 1

    kernel = functools.partial(
        _refr_kernel, F=F, has_leak=has_leak, has_shot=has_shot,
        R=float(refractory_period_s),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(F,),
        in_specs=[
            pl.BlockSpec((1, Hp, Wp), lambda f, dt, tp: (f, 0, 0)),
            pl.BlockSpec((1, Hp, Wp), lambda f, dt, tp: (f if Fl > 1 else 0, 0, 0)),
            pl.BlockSpec((1, Hp, Wp), lambda f, dt, tp: (f if Fs > 1 else 0, 0, 0)),
            pl.BlockSpec((Hp, Wp), lambda f, dt, tp: (0, 0)),
            pl.BlockSpec((Hp, Wp), lambda f, dt, tp: (0, 0)),
            pl.BlockSpec((Hp, Wp), lambda f, dt, tp: (0, 0)),
            pl.BlockSpec((Hp, Wp), lambda f, dt, tp: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, Hp, Wp), lambda f, dt, tp: (f, 0, 0)),
            pl.BlockSpec((1, Hp, Wp), lambda f, dt, tp: (f, 0, 0)),
            pl.BlockSpec((1, SUB, 128), lambda f, dt, tp: (f, 0, 0)),
            pl.BlockSpec((Hp, Wp), lambda f, dt, tp: (0, 0)),
            pl.BlockSpec((Hp, Wp), lambda f, dt, tp: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((Hp, Wp), jnp.float32),
            pltpu.VMEM((Hp, Wp), jnp.float32),
        ],
    )
    counts, i0, k_bcast, new_base, new_mem = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((F, Hp, Wp), jnp.int16),
            jax.ShapeDtypeStruct((F, Hp, Wp), jnp.int16),
            jax.ShapeDtypeStruct((F, SUB, 128), jnp.int32),
            jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
            jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        ],
        interpret=interpret,
    )(
        dts.astype(jnp.float32), t_prevs.astype(jnp.float32),
        lp_p, leak_p, shot_p, pos_p, neg_p, base_p, mem_p,
    )
    return (
        new_base[:H, :W],
        new_mem[:H, :W],
        counts[:, :H, :W],
        i0[:, :H, :W],
        k_bcast[:, 0, 0],
    )
