"""Device-side synthetic frame generation (jitted, batched over time).

The host plugin generators (moving_dot.py etc.) draw one frame at a time in
numpy and ship every frame over the host link — for emulator benchmarking
on remote-attached TPUs that upload dominates everything else.  These
functions evaluate the same analytic stimuli directly on device for a whole
chunk of timestamps, so frames feed the emulator with ZERO host traffic.

Parity: `moving_dot_frames` reproduces the host moving_dot pixel-exactly
(same saturated-Gaussian profile, shrinking-radius circular paths, uint8
quantization).
"""
from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(
    jax.jit, static_argnums=(1, 2, 3, 4, 5, 6, 7, 8)
)
def moving_dot_frames(
    times: jnp.ndarray,
    width: int = 346,
    height: int = 260,
    num_dots: int = 5,
    contrast: float = 10.0,
    bg: float = 5.0,
    radius: float = 100.0,
    speed_pps: float = 1000.0,
    dot_sigma: float = 1.0,
) -> jnp.ndarray:
    """Render the moving_dot stimulus for a batch of timestamps on device.

    Returns f32[F,H,W] frames quantized to uint8 levels (0-255), matching
    `v2e_tpu.synthetic.moving_dot` / reference scripts/moving_dot.py:25-54.
    """
    F = times.shape[0]
    fg = float(int(bg * contrast))
    period = 2 * math.pi * radius / speed_pps
    d = int(dot_sigma * 3)

    xx = jnp.arange(width, dtype=jnp.float32)[None, None, :]
    yy = jnp.arange(height, dtype=jnp.float32)[None, :, None]
    t = times.astype(jnp.float32)[:, None, None]

    # angular position: constant angular speed; radius shrinks ~2 dot
    # diameters per cycle so the path never overlaps itself
    theta0 = (speed_pps / radius) * t
    r_t = radius - (t / period) * (d * 1.5)

    frames = jnp.full((F, height, width), bg, dtype=jnp.float32)
    for i in range(num_dots):
        theta = theta0 + (i / num_dots) * 2 * math.pi
        cx = width / 2 + r_t * jnp.cos(theta)
        cy = height / 2 + r_t * jnp.sin(theta)
        # host generator only fills a (2d)x(2d) patch around round(c):
        # replicate the cutoff by masking distance > d*sqrt(2)-ish via the
        # same intensity clip (v < 0.01 -> 0) plus the patch bound
        dx = xx - cx
        dy = yy - cy
        dist2 = dx * dx + dy * dy
        v = jnp.minimum(10.0 * jnp.exp(-dist2 / (dot_sigma * dot_sigma)), 1.0)
        v = jnp.where(v < 0.01, 0.0, v)
        in_patch = (jnp.abs(xx - jnp.round(cx)) <= d) & (
            jnp.abs(yy - jnp.round(cy)) <= d
        )
        v = jnp.where(in_patch, v, 0.0)
        frames = jnp.maximum(frames, bg + (fg - bg) * v)
    # uint8 assignment in the host generator truncates
    return jnp.floor(jnp.clip(frames, 0, 255))


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6, 7))
def single_linearly_moving_dot_frames(
    times: jnp.ndarray,
    width: int = 346,
    height: int = 260,
    contrast: float = 3.0,
    bg: float = 100.0,
    dot_sigma: float = 3.0,
    speed_pps: float = 100.0,
    gain: float = 10.0,
) -> jnp.ndarray:
    """Device version of the single linearly moving dot stimulus."""
    F = times.shape[0]
    fg = float(int(bg * contrast))
    d = int(dot_sigma * 3)
    xx = jnp.arange(width, dtype=jnp.float32)[None, None, :]
    yy = jnp.arange(height, dtype=jnp.float32)[None, :, None]
    t = times.astype(jnp.float32)[:, None, None]
    cx = t * speed_pps
    cy = jnp.full_like(cx, height / 2)
    dx = xx - cx
    dy = yy - cy
    v = jnp.minimum(gain * jnp.exp(-(dx * dx + dy * dy) / (dot_sigma**2)), 1.0)
    v = jnp.where(v < 0.01, 0.0, v)
    in_patch = (jnp.abs(xx - jnp.round(cx)) <= d) & (
        jnp.abs(yy - jnp.round(cy)) <= d
    )
    v = jnp.where(in_patch, v, 0.0)
    frames = bg + (fg - bg) * v
    return jnp.floor(jnp.clip(frames, 0, 255))


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6, 7))
def spots_frames(
    times: jnp.ndarray,
    width: int = 346,
    height: int = 260,
    contrast: float = 1.5,
    total_time: float = 1.0,
    freq_hz: float = 20.0,
    radius: float = 60.0,
    bg: float = 64.0,
) -> jnp.ndarray:
    """Device version of the spots stimulus (flashing then moving shapes)."""
    F = times.shape[0]
    gray = bg
    bright = gray * contrast
    dark = gray / contrast
    half = total_time / 2
    t = times.astype(jnp.float32)[:, None, None]
    xx = jnp.arange(width, dtype=jnp.float32)[None, None, :]
    yy = jnp.arange(height, dtype=jnp.float32)[None, :, None]

    moving = t[:, 0, 0] > half
    speed = radius / half
    dxs = jnp.where(moving, -radius + (t[:, 0, 0] - half) * speed, 0.0)[
        :, None, None
    ]
    sine = jnp.sin(t * freq_hz * jnp.pi * 2)
    flash_color = jnp.where(
        jnp.abs(sine) < 0.5, gray, jnp.where(sine > 0.5, bright, dark)
    )
    color = jnp.where(moving[:, None, None], dark, flash_color)

    # host geometry truncates float64 coordinates with python int();
    # in f32 exact values like 63.0 can land at 62.999996, so nudge before
    # truncating (coordinates here are rational with >=1e-3 spacing)
    def itrunc(x):
        return jnp.trunc(x + jnp.sign(x) * 1e-3)

    def disk(cx, cy, r):
        dx = xx - itrunc(cx)
        dy = yy - itrunc(cy)
        return dx * dx + dy * dy <= r * r

    def rect(cx, cy, r):
        return (
            (xx >= itrunc(cx - r))
            & (xx <= itrunc(cx + r))
            & (yy >= itrunc(cy - r))
            & (yy <= itrunc(cy + r))
        )

    w, h, r = width, height, radius
    cx1 = w / 4 + dxs
    cx2 = 3 * w / 4 + dxs
    mask = (
        disk(cx1, jnp.full_like(cx1, h / 4), r / 8)
        | rect(cx2, jnp.full_like(cx2, h / 4), r / 4)
        | disk(cx1, jnp.full_like(cx1, 3 * h / 4), r / 2)
        | rect(cx2, jnp.full_like(cx2, 3 * h / 4), r)
    )
    frames = jnp.where(mask, color, gray)
    return jnp.floor(jnp.clip(frames, 0, 255))


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6, 7, 8, 9))
def barberpole_frames(
    times: jnp.ndarray,
    width: int = 346,
    height: int = 260,
    contrast: float = 1.5,
    speed_pps: float = 1000.0,
    num_stripes: int = 6,
    bb_width: float = 0.8,
    bb_height: float = 0.2,
    bb_angle: float = 30.0,
    bg: float = 127.0,
) -> jnp.ndarray:
    """Device version of the barberpole stimulus (drifting diagonal stripes
    masked to a central window)."""
    F = times.shape[0]
    wavelength = (bb_width * width) / num_stripes
    low = (bg * 2) / (contrast + 1)
    diff = (contrast - 1) * low
    tan = math.tan((90 - bb_angle) * math.pi / 180)

    yy = jnp.arange(height, dtype=jnp.float32)[None, :, None]
    xx = jnp.arange(width, dtype=jnp.float32)[None, None, :]
    t = times.astype(jnp.float32)[:, None, None]
    phase = 2 * math.pi * (yy - tan * xx - t * speed_pps) / wavelength
    stripes = jnp.floor(low + diff * 0.5 * (1 + jnp.tanh(10 * jnp.sin(phase))))

    dx = (1 - bb_width) / 2
    dy = (1 - bb_height) / 2
    minx, maxx = round(width * dx), width - round(width * dx)
    miny, maxy = round(height * dy), height - round(height * dy)
    inside = (xx > minx) & (xx < maxx) & (yy > miny) & (yy < maxy)
    return jnp.where(inside, stripes, bg)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6))
def gradients_frames(
    times: jnp.ndarray,
    width: int = 346,
    height: int = 260,
    contrast: float = 2.0,
    speed_pps: float = 300.0,
    bump_width: float = 0.5,
    bg: float = 127.0,
) -> jnp.ndarray:
    """Device version of the gradients stimulus (triangular bump + edge)."""
    F = times.shape[0]
    low = (bg * 2) / (contrast + 1)
    high = contrast * low
    diff = high - low
    w2 = (bump_width * width) / 2

    x = jnp.arange(width, dtype=jnp.float32)[None, :]
    t = times.astype(jnp.float32)[:, None]
    p = w2 + t * speed_pps
    p2 = p + w2 * 2
    g = jnp.full((F, width), low, dtype=jnp.float32)
    left = (x > p - w2) & (x < p)
    g = jnp.where(left, high + (-diff / w2) * (p - x), g)
    right = (x <= p + w2) & (x >= p)
    g = jnp.where(right, high + (-diff / w2) * (x - p), g)
    g = jnp.where((x > p2) & (x <= p2 + 10), high, g)
    g = jnp.floor(jnp.clip(g, 0, 255))
    return jnp.broadcast_to(g[:, None, :], (F, height, width))


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6, 7))
def particles_frames(
    centers: jnp.ndarray,
    width: int = 346,
    height: int = 260,
    fg: float = 6.25,
    bg: float = 5.0,
    sigma: float = 1.0,
    gain: float = 2.0,
    d: int = 3,
) -> jnp.ndarray:
    """Render particle dots for a whole chunk on device.

    centers: [F, P, 2] float32 (x, y) per frame per particle — the host
    runs the (cheap) walker dynamics and ships only centers, ~150x less
    link traffic than frames.

    Parity with the host renderer (draw.fill_gaussian_dot under
    synthetic/particles.py:124-128, reference scripts/particles.py:213-240)
    including its OVERWRITE semantics: a later particle's whole
    ``[round(c)-d, round(c)+d)`` patch replaces earlier dots where patches
    overlap (even with dimmer tail values).  Order is reproduced with a
    two-pass scatter: pass 1 takes a per-pixel max of particle indices,
    pass 2 writes each entry only where it owns the pixel — deterministic
    because surviving writes have unique destinations.  Values match the
    host to f32 rounding (~1e-5; the host draws in float64 then stores
    f32), unlike the uint8-quantized stimuli which are bit-exact.
    """
    F, P, _ = centers.shape
    cx = centers[..., 0].astype(jnp.float32)  # [F,P]
    cy = centers[..., 1].astype(jnp.float32)
    x0 = jnp.round(cx)  # round-half-even == python round()
    y0 = jnp.round(cy)
    span = jnp.arange(-d, d, dtype=jnp.float32)  # patch [c-d, c+d)
    xs = x0[..., None, None] + span[None, None, None, :]  # [F,P,1,2d]
    ys = y0[..., None, None] + span[None, None, :, None]  # [F,P,2d,1]
    dx = xs - cx[..., None, None]
    dy = ys - cy[..., None, None]
    v = jnp.minimum(gain * jnp.exp(-(dx * dx + dy * dy) / (sigma * sigma)), 1.0)
    vals = jnp.clip(bg + (fg - bg) * v, 0.0, 255.0)  # [F,P,2d,2d]

    xi = xs.astype(jnp.int32)
    yi = ys.astype(jnp.int32)
    valid = (xi >= 0) & (xi < width) & (yi >= 0) & (yi < height)
    fidx = jnp.arange(F, dtype=jnp.int32)[:, None, None, None]
    size = F * height * width
    lin = (fidx * height + yi) * width + xi
    # sentinel must be >= size: negative indices WRAP (numpy semantics)
    # before mode='drop' kicks in, so -1 would hit the last pixel
    lin = jnp.where(valid, lin, size)

    prio_val = jnp.broadcast_to(
        jnp.arange(1, P + 1, dtype=jnp.int32)[None, :, None, None],
        vals.shape,
    )
    prio = jnp.zeros((size,), jnp.int32)
    prio = prio.at[lin.ravel()].max(prio_val.ravel(), mode="drop")

    # winners: entries whose particle index is the max writer of their pixel
    at_pix = jnp.where(valid, prio[jnp.clip(lin, 0, size - 1)], -1)
    win = at_pix == prio_val
    lin_w = jnp.where(win, lin, size)
    frames = jnp.full((size,), jnp.float32(bg))
    frames = frames.at[lin_w.ravel()].set(
        vals.astype(jnp.float32).ravel(), mode="drop"
    )
    return frames.reshape(F, height, width)
