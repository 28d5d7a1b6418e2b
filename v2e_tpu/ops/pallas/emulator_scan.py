"""Fused Pallas scan kernel for the DVS emulator's sequential core.

The XLA fast path (emulator/core.py) already hoists all state-free work out
of the frame scan; what remains per frame is the memorized-base update:

    diff  = lp[f] (+ noise) - base (- leak)
    pos   = floor(relu(diff)/pos_th);  neg = floor(relu(-diff)/neg_th)
    base += pos*pos_th - neg*neg_th;   base = lp[f] where shot fired

This kernel runs that whole time loop INSIDE one Pallas program per pixel
tile: the carried base frame lives in VMEM for all F frames (zero HBM
traffic for state), inputs/outputs stream through VMEM blocks.  It covers
every configuration except the refractory filter (whose sub-frame timestamp
grid couples all pixels through the global per-frame max count — that path
stays on the XLA scan) and CSDVS (3x3 halo).

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
