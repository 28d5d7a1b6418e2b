"""Emulator parameter and state pytrees + initialization.

`EmulatorParams` holds the per-pixel arrays that are *constant* over a run
(threshold mismatch maps, noise-rate FPN, SCIDVS time constants);
`EmulatorState` is the per-pixel dynamic state carried through the
``lax.scan`` over frames.

Initialization semantics follow the reference ``EventEmulator._init``
(/root/reference/v2ecore/emulator.py:439-511) and the first-frame branch of
``generate_events`` (:681-717).

Timestamps inside the state are kept *relative to a chunk origin* in float32
(`t_prev`, `timestamp_mem`); the host wrapper tracks the absolute origin in
float64 and calls `rebase_state` between chunks.  This keeps sub-microsecond
timing precision for arbitrarily long videos, which the reference's float32
absolute timestamps cannot (its precision degrades to >7 us past t=100 s).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from v2e_tpu.emulator.config import EmulatorConfig
from v2e_tpu.ops.core import lin_log


@struct.dataclass
class EmulatorParams:
    """Per-pixel run constants (the model's 'weights')."""

    pos_thres: jnp.ndarray  # f32[H,W] ON threshold map (clamped >= 0.01)
    neg_thres: jnp.ndarray  # f32[H,W] OFF threshold map
    pos_thres_pre_prob: jnp.ndarray  # f32[H,W] nominal/actual (shot-noise scaling)
    neg_thres_pre_prob: jnp.ndarray
    noise_rate_array: jnp.ndarray  # f32[H,W] lognormal leak/shot FPN rates
    scidvs_tau_arr: Optional[jnp.ndarray] = None  # f32[H,W] or None
    photoreceptor_noise_vrms: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros(())
    )  # f32 scalar, host-calibrated


@struct.dataclass
class EmulatorState:
    """Per-pixel dynamic state carried across frames."""

    base_log_frame: jnp.ndarray  # f32[H,W] memorized log intensity
    lp_log_frame: jnp.ndarray  # f32[H,W] lowpass filter state
    photoreceptor_noise_arr: jnp.ndarray  # f32[H,W] filtered injected noise
    timestamp_mem: jnp.ndarray  # f32[H,W] last spike time (chunk-relative)
    t_prev: jnp.ndarray  # f32 scalar, chunk-relative time of previous frame
    key: jax.Array  # PRNG key (fixed; per-frame keys derive via fold_in)
    step_idx: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros((), jnp.int32)
    )  # global frame counter for counter-based RNG derivation
    scidvs_highpass: Optional[jnp.ndarray] = None
    scidvs_previous_photo: Optional[jnp.ndarray] = None
    cs_surround_frame: Optional[jnp.ndarray] = None


def init_state(
    cfg: EmulatorConfig,
    first_frame: jnp.ndarray,
    t0: jnp.ndarray,
    key: jax.Array,
) -> Tuple[EmulatorParams, EmulatorState]:
    """Initialize params+state from the first frame (linear 0-255 or HDR log).

    Mirrors reference `_init` (emulator.py:439-511): Gaussian threshold
    mismatch clamped at 0.01, lognormal noise-rate FPN, SCIDVS lognormal tau
    map, refractory memory primed to ``-refractory_period`` so the first
    events pass, and the memorized base frame set to the (lowpassed) first
    log frame — for CSDVS the surround initializes equal to the photoreceptor
    so the initial center-minus-surround base is zero (emulator.py:713-715).
    """
    shape = first_frame.shape  # logical (pre-padding) pixel plane
    k_pos, k_neg, k_rate, k_tau, key = jax.random.split(key, 5)

    first_frame = first_frame.astype(jnp.float32)
    log_new = first_frame if cfg.hdr else lin_log(first_frame)
    lp = log_new

    if cfg.sigma_thres > 0:
        pos = cfg.pos_thres + cfg.sigma_thres * jax.random.normal(
            k_pos, shape, dtype=jnp.float32
        )
        neg = cfg.neg_thres + cfg.sigma_thres * jax.random.normal(
            k_neg, shape, dtype=jnp.float32
        )
        pos = jnp.clip(pos, min=0.01)
        neg = jnp.clip(neg, min=0.01)
    else:
        pos = jnp.full(shape, cfg.pos_thres, dtype=jnp.float32)
        neg = jnp.full(shape, cfg.neg_thres, dtype=jnp.float32)

    if cfg.leak_rate_hz > 0:
        rate = jnp.exp(
            jnp.log(10.0)
            * cfg.noise_rate_cov_decades
            * jax.random.normal(k_rate, shape, dtype=jnp.float32)
        )
    else:
        rate = jnp.ones(shape, dtype=jnp.float32)

    scidvs_tau = None
    if cfg.scidvs and cfg.scidvs_tau_cov > 0:
        scidvs_tau = cfg.scidvs_tau_s * jnp.exp(
            cfg.scidvs_tau_cov * jax.random.normal(k_tau, shape, dtype=jnp.float32)
        )
    elif cfg.scidvs:
        scidvs_tau = jnp.full(shape, cfg.scidvs_tau_s, dtype=jnp.float32)

    if cfg.pad_rows:
        # inert mesh-padding rows (EmulatorConfig.pad_rows): all RNG above
        # drew at the logical shape, so the logical pixels of a padded run
        # are bit-exact vs an unpadded one.  Pad pixels can never emit:
        # thresholds are enormous and every noise-rate map is zero.
        pad = lambda x, v=0.0: jnp.pad(
            x, ((0, cfg.pad_rows), (0, 0)), constant_values=v
        )
        pos, neg = pad(pos, 1e9), pad(neg, 1e9)
        rate = pad(rate)
        lp = pad(lp)
        if scidvs_tau is not None:
            scidvs_tau = pad(scidvs_tau, 1.0)
        shape = (shape[0] + cfg.pad_rows, shape[1])

    params = EmulatorParams(
        pos_thres=pos,
        neg_thres=neg,
        pos_thres_pre_prob=cfg.pos_thres / pos,
        neg_thres_pre_prob=cfg.neg_thres / neg,
        noise_rate_array=rate,
        scidvs_tau_arr=scidvs_tau,
        photoreceptor_noise_vrms=jnp.zeros((), dtype=jnp.float32),
    )

    cs_surround = lp if cfg.csdvs_enabled else None
    base = (lp - cs_surround) if cfg.csdvs_enabled else lp

    state = EmulatorState(
        base_log_frame=base,
        lp_log_frame=lp,
        photoreceptor_noise_arr=jnp.zeros(shape, dtype=jnp.float32),
        timestamp_mem=jnp.full(shape, -cfg.refractory_period_s, dtype=jnp.float32)
        + t0.astype(jnp.float32),
        t_prev=t0.astype(jnp.float32),
        key=key,
        step_idx=jnp.zeros((), jnp.int32),
        scidvs_highpass=jnp.zeros(shape, dtype=jnp.float32) if cfg.scidvs else None,
        scidvs_previous_photo=lp if cfg.scidvs else None,
        cs_surround_frame=cs_surround,
    )
    return params, state


def rebase_state(state: EmulatorState, shift: jnp.ndarray) -> EmulatorState:
    """Shift all chunk-relative times by ``-shift`` (new origin at old+shift)."""
    shift = jnp.asarray(shift, dtype=jnp.float32)
    return state.replace(
        timestamp_mem=state.timestamp_mem - shift,
        t_prev=state.t_prev - shift,
    )
