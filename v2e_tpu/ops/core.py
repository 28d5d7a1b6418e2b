"""Core DVS pixel-model math as pure JAX functions.

These are the TPU-native counterparts of the reference kernels in
/root/reference/v2ecore/emulator_utils.py.  All functions are traceable,
shape-static, and free of host synchronization so the whole per-frame model
fuses into a single XLA computation when scanned over time.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

LIN_LOG_THRESHOLD = 20.0

# Rounding quantum used by the reference to stabilize the ON->OFF hysteresis
# (emulator_utils.py:42-43): y = round(y * 1e8) / 1e8 computed in float64.
_LIN_LOG_ROUNDING = 1e8


def lin_log(x: jnp.ndarray, threshold: float = LIN_LOG_THRESHOLD) -> jnp.ndarray:
    """Linear-to-log intensity mapping of 0-255 frames.

    Linear below `threshold` DN (slope log(threshold)/threshold so the map is
    continuous), natural log above (reference emulator_utils.py:18-45).

    The reference computes in float64 and rounds the result to 1e-8 so that
    ``base + thres - thres`` round-trips exactly and OFF events follow ON
    events.  On TPU we run float32; when float64 is enabled (CPU parity
    tests, ``jax.config.update('jax_enable_x64', True)``) the exact
    reference semantics including the rounding are reproduced.  In float32
    the machine epsilon at ln(255)=5.54 is ~5e-7, coarser than the 1e-8
    quantum, so the rounding is a structural no-op and is skipped.
    """
    f = (1.0 / threshold) * math.log(threshold)
    if jax.config.jax_enable_x64:
        x64 = x.astype(jnp.float64)
        y = jnp.where(x64 <= threshold, x64 * f, jnp.log(x64))
        y = jnp.round(y * _LIN_LOG_ROUNDING) / _LIN_LOG_ROUNDING
        return y.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    # Guard log(0): linear branch covers x<=threshold so the log argument is
    # only consumed where x>threshold>=1.
    safe = jnp.maximum(xf, 1e-20)
    return jnp.where(xf <= threshold, xf * jnp.float32(f), jnp.log(safe))


def rescale_intensity_frame(new_frame: jnp.ndarray) -> jnp.ndarray:
    """Rescale 0-255 intensity to the (0,1] filter-time-constant scale.

    Offset +20 avoids zero time constants; /275 limits the max time constant
    to ~1/10 of the white level (reference emulator_utils.py:48-54).
    """
    return (new_frame + 20.0) / 275.0


def low_pass_filter(
    log_new_frame: jnp.ndarray,
    lp_log_frame: jnp.ndarray,
    inten01: Optional[jnp.ndarray],
    delta_time: jnp.ndarray,
    cutoff_hz: float = 0.0,
) -> jnp.ndarray:
    """Intensity-dependent first-order IIR lowpass of the log intensity.

    ``eps = inten01 * dt / tau`` (clamped to 1 for stability), i.e. brighter
    pixels have shorter photoreceptor time constants (reference
    emulator_utils.py:57-109).  With ``cutoff_hz <= 0`` the filter is a
    passthrough.  ``cutoff_hz`` is a static Python float so the disabled
    branch compiles away entirely.
    """
    if cutoff_hz <= 0:
        return log_new_frame
    tau = 1.0 / (math.pi * 2 * cutoff_hz)
    if inten01 is not None:
        eps = inten01 * (delta_time / tau)
        eps = jnp.clip(eps, max=1.0)
    else:
        eps = delta_time / tau
    return (1.0 - eps) * lp_log_frame + eps * log_new_frame


def max_lowpass_eps(
    inten01: jnp.ndarray, delta_time: jnp.ndarray, cutoff_hz: float
) -> jnp.ndarray:
    """Largest IIR update step this frame — diagnostic for the reference's
    eps>0.3 accuracy warning (emulator_utils.py:87-95)."""
    if cutoff_hz <= 0:
        return jnp.zeros(())
    tau = 1.0 / (math.pi * 2 * cutoff_hz)
    return jnp.max(inten01) * (delta_time / tau)


def subtract_leak_current(
    base_log_frame: jnp.ndarray,
    leak_rate_hz: float,
    delta_time: jnp.ndarray,
    pos_thres: jnp.ndarray,
    leak_jitter_fraction: float,
    noise_rate_array: jnp.ndarray,
    key: jax.Array,
    logical_rows: int = 0,
) -> jnp.ndarray:
    """Leak the memorized value downward to generate leak (ON) events.

    ``dI = dt * R_l * Theta_on`` with per-pixel lognormal rate FPN and
    per-frame Gaussian jitter (reference emulator_utils.py:114-134).  The
    reference draws fresh ``randn`` per frame from global torch RNG; here the
    caller threads an explicit PRNG key.

    ``logical_rows``: when the plane carries inert mesh-padding rows
    (EmulatorConfig.pad_rows), the jitter draw uses the logical (pre-pad)
    shape so results stay bit-exact vs the unpadded run; pad rows get zero
    jitter (their rate FPN is zero anyway).
    """
    shape = noise_rate_array.shape
    if logical_rows and logical_rows < shape[0]:
        rand = jax.random.normal(
            key, (logical_rows, shape[1]), dtype=jnp.float32
        )
        rand = jnp.pad(rand, ((0, shape[0] - logical_rows), (0, 0)))
    else:
        rand = jax.random.normal(key, shape, dtype=jnp.float32)
    curr_leak_rate = leak_rate_hz * noise_rate_array * (1.0 - leak_jitter_fraction * rand)
    delta_leak = delta_time * curr_leak_rate * pos_thres
    return base_log_frame - delta_leak


def compute_event_map(
    diff_frame: jnp.ndarray,
    pos_thres: jnp.ndarray,
    neg_thres: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize the log-intensity change into per-pixel ON/OFF event counts.

    ``floor(relu(±diff) / thres)`` (reference emulator_utils.py:137-173).
    Returns int32 count maps.  ON and OFF are mutually exclusive per pixel
    because diff has a single sign.
    """
    pos_frame = jnp.maximum(diff_frame, 0.0)
    neg_frame = jnp.maximum(-diff_frame, 0.0)
    pos_evts = jnp.floor(pos_frame / pos_thres).astype(jnp.int32)
    neg_evts = jnp.floor(neg_frame / neg_thres).astype(jnp.int32)
    return pos_evts, neg_evts


def generate_shot_noise(
    key: jax.Array,
    shot_noise_rate_hz: float,
    delta_time: jnp.ndarray,
    shot_noise_inten_factor: float,
    inten01: jnp.ndarray,
    pos_thres_pre_prob: jnp.ndarray,
    neg_thres_pre_prob: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel Bernoulli shot-noise events for one frame interval.

    Probability ``(rate/2)*dt`` scaled down with intensity (factor
    ``SHOT_NOISE_INTEN_FACTOR`` at full white) and up for low-threshold
    pixels (reference emulator_utils.py:297-351).  A single uniform draw per
    pixel decides ON (draw > 1 - p_on) vs OFF (draw < p_off), so a pixel
    never emits both in one frame.

    Returns (shot_on, shot_off) boolean maps.
    """
    shot_noise_factor = ((shot_noise_rate_hz / 2.0) * delta_time) * (
        (shot_noise_inten_factor - 1.0) * inten01 + 1.0
    )
    one_minus_on_prob = 1.0 - shot_noise_factor * pos_thres_pre_prob
    off_prob = shot_noise_factor * neg_thres_pre_prob
    rand01 = jax.random.uniform(key, inten01.shape, dtype=jnp.float32)
    shot_on = rand01 > one_minus_on_prob
    shot_off = rand01 < off_prob
    return shot_on, shot_off


def refractory_filter(
    count: jnp.ndarray,
    timestamp_mem: jnp.ndarray,
    t_prev: jnp.ndarray,
    ts_step: jnp.ndarray,
    refractory_period_s: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Closed-form refractory-period filtering of a pixel's event train.

    The reference iterates ``for i in range(max_events)`` testing
    ``ts[i] - timestamp_mem > R`` and updating ``timestamp_mem`` per emitted
    event (emulator.py:810-846) — a data-dependent sequential loop.  Because
    the candidate timestamps are the uniform grid ``ts[i] = t_prev +
    (i+1)*s``, the surviving events of a pixel with ``c`` candidates form an
    arithmetic progression and admit a closed form, removing the loop:

      * first emitted index ``i0 = max(0, floor((T + R - t_prev)/s))``
        (smallest i with ``ts[i] > T + R``),
      * stride ``m = floor(R/s) + 1`` (smallest m with ``m*s > R``),
      * emitted count ``n = floor((c-1-i0)/m) + 1`` when ``i0 <= c-1``,
      * new memory ``T' = ts[i0 + (n-1)*m]``.

    Matching the reference, the filter only engages when ``R > s``; otherwise
    all candidates pass and ``timestamp_mem`` is left untouched
    (emulator.py:830).

    Args:
      count: int32 per-pixel candidate event count (ON + OFF; disjoint).
      timestamp_mem: float32 per-pixel last-spike time.
      t_prev: scalar frame-start time.
      ts_step: scalar sub-frame timestamp spacing ``s`` (> 0).
      refractory_period_s: the static refractory period ``R``.

    Returns:
      (n_emit, i0, stride, new_timestamp_mem): emitted count per pixel, the
      first emitted iteration index per pixel, the scalar iteration stride,
      and the updated per-pixel last-spike time.
    """
    R = jnp.float32(refractory_period_s)
    active = R > ts_step

    q = (timestamp_mem + R - t_prev) / ts_step
    i0_f = jnp.maximum(jnp.floor(q), 0.0)
    i0 = i0_f.astype(jnp.int32)
    m = (jnp.floor(R / ts_step) + 1.0).astype(jnp.int32)

    has = (count > 0) & (i0 <= count - 1)
    n_emit = jnp.where(has, (count - 1 - i0) // jnp.maximum(m, 1) + 1, 0)
    i_last = i0 + (n_emit - 1) * m
    t_last = t_prev + (i_last.astype(jnp.float32) + 1.0) * ts_step
    new_mem = jnp.where(n_emit > 0, t_last, timestamp_mem)

    n_emit = jnp.where(active, n_emit, count)
    i0 = jnp.where(active, jnp.where(has, i0, 0), 0)
    m = jnp.where(active, m, 1)
    new_mem = jnp.where(active, new_mem, timestamp_mem)
    return n_emit, i0, m, new_mem
