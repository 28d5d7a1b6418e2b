"""The DVS emulator as a pure scanned step — one XLA program per chunk.

`emulator_step` computes one inter-frame interval of the full pixel model
(lin-log, IIR photoreceptor, optional photoreceptor noise / CSDVS surround /
SCIDVS highpass, leak, event quantization, closed-form refractory filtering,
Bernoulli shot noise) and returns dense per-frame event-count maps.
`emulate_chunk` scans it over a ``[F, H, W]`` stack of frames inside one
``jit``; the only host interaction per chunk is the device-to-host copy of
the packed count maps.

This replaces the reference's per-frame Python driver and its data-dependent
per-event loop (/root/reference/v2ecore/emulator.py:619-1022) with
compiler-friendly, shape-static control flow.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from v2e_tpu.emulator.config import EmulatorConfig
from v2e_tpu.emulator.state import EmulatorParams, EmulatorState
from v2e_tpu.ops.core import (
    compute_event_map,
    generate_shot_noise,
    lin_log,
    low_pass_filter,
    refractory_filter,
    rescale_intensity_frame,
    subtract_leak_current,
)

# Termination threshold of the CSDVS Euler diffuser stepping
# (reference emulator.py:52).
CS_MAX_CHANGE = 1e-5
CS_NUM_STEPS_PER_TAU = 5
CS_MAX_STEPS = 1000  # hard bound for lax.while_loop (reference warns >1000)

# numpy, not jnp: a module-level jnp.array would initialize the JAX backend
# at import time, locking in the platform before callers (e.g. the
# multi-chip dryrun) can force CPU. jnp ops accept it and trace it as a
# constant either way.
_LAPLACIAN = np.array(
    [[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]], dtype=np.float32
)


def _csdvs_taus(cfg: EmulatorConfig) -> Tuple[float, float]:
    """Photoreceptor/horizontal-cell time constants in seconds with the
    reference's zero-tau floor (emulator.py:1069-1074)."""
    abs_min_tau_p = 1e-9
    tau_p = (
        abs_min_tau_p
        if (cfg.cs_tau_p_ms is None or cfg.cs_tau_p_ms == 0)
        else cfg.cs_tau_p_ms * 1e-3
    )
    tau_h = (
        abs_min_tau_p / (cfg.cs_lambda_pixels**2)
        if cfg.cs_tau_h_ms == 0
        else cfg.cs_tau_h_ms * 1e-3
    )
    return tau_p, tau_h


def _update_csdvs(
    cfg: EmulatorConfig,
    lp_log_frame: jnp.ndarray,
    cs_surround_frame: jnp.ndarray,
    delta_time: jnp.ndarray,
) -> jnp.ndarray:
    """Advance the horizontal-cell diffuser by ``delta_time`` — exactly.

    The reference Euler-steps ``dh/dt = (p - h)/tau_p + lap(h)/tau_h`` with
    replication padding, up to thousands of steps per frame, and its own
    TODO asks for a better method (emulator.py:1067, 1076-1121).
    Replication-padded 5-point Laplacian == zero-flux (Neumann) boundary,
    which the DCT-II basis diagonalizes with eigenvalues
    ``-4 (sin^2(pi i / 2H) + sin^2(pi j / 2W))``.  In that basis the ODE is
    a scalar linear relaxation per mode, so the transient has a closed
    form:

        h_hat(dt) = hss_hat + exp(-dt * a) * (h0_hat - hss_hat)
        a         = 1/tau_p + lam/tau_h
        hss_hat   = p_hat / (1 + lam * tau_p/tau_h)      (screened Poisson)

    This is the exact solution of the same spatially-discretized ODE for
    ANY delta_time — no step cap, no termination threshold, no lag.  The
    'instantaneous' zero-tau mode drops out naturally (exp -> 0, hss with
    lambda^2 = tau_p/tau_h fixed).
    """
    if getattr(cfg, "csdvs_solver", "exact") == "euler":
        return _update_csdvs_euler(cfg, lp_log_frame, cs_surround_frame, delta_time)
    tau_p, tau_h = _csdvs_taus(cfg)
    H, W = lp_log_frame.shape

    def dct2(x):
        y = jax.scipy.fft.dct(x, type=2, axis=0, norm="ortho")
        return jax.scipy.fft.dct(y, type=2, axis=1, norm="ortho")

    def idct2(x):
        y = jax.scipy.fft.idct(x, type=2, axis=1, norm="ortho")
        return jax.scipy.fft.idct(y, type=2, axis=0, norm="ortho")

    si = np.sin(np.pi * np.arange(H) / (2.0 * H)) ** 2
    sj = np.sin(np.pi * np.arange(W) / (2.0 * W)) ** 2
    lam = 4.0 * (si[:, None] + sj[None, :]).astype(np.float32)  # -eigenvalue

    p_hat = dct2(lp_log_frame.astype(jnp.float32))
    h_hat = dct2(cs_surround_frame.astype(jnp.float32))
    a = 1.0 / tau_p + lam / tau_h
    hss_hat = p_hat / (1.0 + lam * (tau_p / tau_h))
    decay = jnp.exp(-delta_time.astype(jnp.float32) * a)
    return idct2(hss_hat + decay * (h_hat - hss_hat))


def _update_csdvs_euler(
    cfg: EmulatorConfig,
    lp_log_frame: jnp.ndarray,
    cs_surround_frame: jnp.ndarray,
    delta_time: jnp.ndarray,
) -> jnp.ndarray:
    """Euler-step the horizontal-cell diffuser toward its steady state.

    Reference `_update_csdvs` (emulator.py:1061-1124): replication-padded 3x3
    Laplacian diffusion with early termination when the max update falls
    below CS_MAX_CHANGE.  The unbounded Python ``while`` becomes a
    ``lax.while_loop`` with a static step cap; the number of steps is
    data-dependent but shape-static.  Kept for cross-validation against the
    exact DCT solver (and the reference's own stepping).
    """
    abs_min_tau_p = 1e-9
    tau_p = abs_min_tau_p if (cfg.cs_tau_p_ms is None or cfg.cs_tau_p_ms == 0) else cfg.cs_tau_p_ms * 1e-3
    tau_h = (
        abs_min_tau_p / (cfg.cs_lambda_pixels**2)
        if cfg.cs_tau_h_ms == 0
        else cfg.cs_tau_h_ms * 1e-3
    )
    min_tau = min(tau_p, tau_h)

    num_steps = jnp.ceil((delta_time / min_tau) * CS_NUM_STEPS_PER_TAU).astype(jnp.int32)
    num_steps = jnp.minimum(jnp.maximum(num_steps, 1), CS_MAX_STEPS)
    # actual_dt derives from the UNCAPPED step count so the Euler update
    # stays unconditionally stable (alpha <= 1/CS_NUM_STEPS_PER_TAU): when
    # the cap truncates the stepping, the surround lags the frame interval
    # instead of exploding into checkerboard oscillation (the reference
    # never caps and can spend thousands of steps per frame,
    # emulator.py:1077-1121).
    actual_dt = jnp.minimum(
        delta_time / num_steps.astype(jnp.float32),
        min_tau / CS_NUM_STEPS_PER_TAU,
    )
    alpha_p = actual_dt / tau_p
    alpha_h = actual_dt / tau_h

    p = lp_log_frame

    def laplacian(h):
        hp = jnp.pad(h, 1, mode="edge")
        return jax.scipy.signal.convolve2d(hp, _LAPLACIAN, mode="valid")

    def cond(carry):
        h, steps, max_change = carry
        return (steps < num_steps) & (max_change > CS_MAX_CHANGE)

    def body(carry):
        h, steps, _ = carry
        change = alpha_p * (p - h) + alpha_h * laplacian(h)
        max_change = jnp.max(jnp.abs(change))
        return h + change, steps + 1, max_change

    h0 = cs_surround_frame
    h, _, _ = jax.lax.while_loop(cond, body, (h0, jnp.int32(0), jnp.float32(2 * CS_MAX_CHANGE)))
    return h


def _logical_shape(cfg: EmulatorConfig, shape: Tuple[int, int]) -> Tuple[int, int]:
    """The pre-padding pixel plane shape (see EmulatorConfig.pad_rows)."""
    return (shape[0] - cfg.pad_rows, shape[1])


def _pad_plane(cfg: EmulatorConfig, x: jnp.ndarray, value=0) -> jnp.ndarray:
    """Append cfg.pad_rows constant rows to the second-to-last axis."""
    if cfg.pad_rows == 0:
        return x
    widths = [(0, 0)] * (x.ndim - 2) + [(0, cfg.pad_rows), (0, 0)]
    return jnp.pad(x, widths, constant_values=value)


def _slice_logical(cfg: EmulatorConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Drop the pad rows (inverse of `_pad_plane`)."""
    if cfg.pad_rows == 0 or x is None:
        return x
    return x[..., : x.shape[-2] - cfg.pad_rows, :]


def _scidvs_dvdt(v: jnp.ndarray, tau: jnp.ndarray) -> jnp.ndarray:
    """SCIDVS highpass decay rate: sinh conductance (reference emulator.py:58-84)."""
    efold = 1.0 / 0.7
    return (1.0 / tau) * jnp.sinh(v / efold)


def emulator_step(
    cfg: EmulatorConfig,
    params: EmulatorParams,
    state: EmulatorState,
    new_frame: jnp.ndarray,
    t_frame: jnp.ndarray,
) -> Tuple[EmulatorState, Dict[str, jnp.ndarray]]:
    """One inter-frame step of the DVS model.

    Args:
      new_frame: f32[H,W] linear 0-255 intensity (or HDR log if cfg.hdr).
      t_frame: f32 scalar chunk-relative frame time (must exceed state.t_prev).

    Returns:
      (new_state, out) where out holds per-frame dense event descriptors:
        ev_count  i16[H,W]  signed final event count (+ON / -OFF, post-refractory)
        i0        i16[H,W]  first emitted sub-frame iteration per pixel
        stride    i32       iteration stride between emitted events
        K         i32       max per-pixel candidate count (defines the ts grid)
        t_prev/t_frame f32  interval bounds (chunk-relative)
        shot_on/shot_off bool[H,W] (only when simple shot noise is on)
        num_on/num_off i32  totals including shot noise (for cheap stats)
    """
    delta_time = t_frame - state.t_prev
    # counter-based per-frame RNG: chunking-invariant (a chunk of N frames
    # draws exactly the same randoms as N single-frame calls)
    frame_key = jax.random.fold_in(state.key, state.step_idx)
    k_leak, k_shot, k_pr = jax.random.split(frame_key, 3)

    new_frame = new_frame.astype(jnp.float32)
    log_new = new_frame if cfg.hdr else lin_log(new_frame)

    inten01 = rescale_intensity_frame(new_frame) if cfg.needs_inten01 else None

    lp = low_pass_filter(log_new, state.lp_log_frame, inten01, delta_time, cfg.cutoff_hz)

    pr_noise = state.photoreceptor_noise_arr
    if cfg.photoreceptor_noise:
        noise = params.photoreceptor_noise_vrms * _pad_plane(
            cfg,
            jax.random.normal(
                k_pr, _logical_shape(cfg, log_new.shape), dtype=jnp.float32
            ),
        )
        pr_noise = low_pass_filter(noise, pr_noise, None, delta_time, cfg.cutoff_hz)

    cs_surround = state.cs_surround_frame
    if cfg.csdvs_enabled:
        cs_surround = _update_csdvs(cfg, lp, cs_surround, delta_time)

    scidvs_highpass = state.scidvs_highpass
    scidvs_prev = state.scidvs_previous_photo
    if cfg.scidvs:
        scidvs_highpass = scidvs_highpass + (lp - scidvs_prev) - delta_time * _scidvs_dvdt(
            scidvs_highpass, params.scidvs_tau_arr
        )
        scidvs_prev = lp

    base = state.base_log_frame
    if cfg.leak_rate_hz > 0:
        base = subtract_leak_current(
            base,
            cfg.leak_rate_hz,
            delta_time,
            params.pos_thres,
            cfg.leak_jitter_fraction,
            params.noise_rate_array,
            k_leak,
            logical_rows=_logical_shape(cfg, base.shape)[0] if cfg.pad_rows else 0,
        )

    photoreceptor = cfg.scidvs_gain * scidvs_highpass if cfg.scidvs else lp
    if cfg.csdvs_enabled:
        c_minus_s = photoreceptor + pr_noise - cs_surround
        diff = c_minus_s - base
    else:
        diff = photoreceptor + pr_noise - base

    pos_evts, neg_evts = compute_event_map(diff, params.pos_thres, params.neg_thres)
    count = pos_evts + neg_evts  # disjoint per pixel (diff has one sign)
    K = jnp.max(count)
    K_eff = jnp.maximum(K, 1)
    # tiny floor keeps the refractory closed form finite if dt == 0
    ts_step = jnp.maximum(delta_time, 1e-12) / K_eff.astype(jnp.float32)

    if cfg.refractory_period_s > 0:
        n_emit, i0, stride, new_mem = refractory_filter(
            count, state.timestamp_mem, state.t_prev, ts_step, cfg.refractory_period_s
        )
    else:
        n_emit, i0, stride = count, jnp.zeros_like(count), jnp.int32(1)
        new_mem = state.timestamp_mem

    final_pos = jnp.where(pos_evts > 0, n_emit, 0)
    final_neg = jnp.where(neg_evts > 0, n_emit, 0)

    base = base + final_pos.astype(jnp.float32) * params.pos_thres
    base = base - final_neg.astype(jnp.float32) * params.neg_thres

    out: Dict[str, jnp.ndarray] = {}
    num_on = jnp.sum(final_pos)
    num_off = jnp.sum(final_neg)

    if cfg.simple_shot_noise:
        shot_on, shot_off = generate_shot_noise(
            k_shot,
            cfg.shot_noise_rate_hz,
            delta_time,
            cfg.shot_noise_inten_factor,
            _slice_logical(cfg, inten01),
            _slice_logical(cfg, params.pos_thres_pre_prob),
            _slice_logical(cfg, params.neg_thres_pre_prob),
        )
        shot_on = _pad_plane(cfg, shot_on)
        shot_off = _pad_plane(cfg, shot_off)
        # shot events reset the pixel memory to the current photoreceptor
        # value (reference emulator.py:940-942)
        base = jnp.where(shot_on | shot_off, lp, base)
        out["shot_on"] = shot_on
        out["shot_off"] = shot_off
        num_on = num_on + jnp.sum(shot_on)
        num_off = num_off + jnp.sum(shot_off)

    if cfg.probe is not None:
        px, py = cfg.probe  # (x, y) like the reference CLI tuple
        out["probe"] = jnp.stack(
            [
                new_frame[py, px],
                base[py, px],  # post-update, like the reference (emulator.py:992)
                lp[py, px],
                log_new[py, px],
                params.pos_thres[py, px],
                params.neg_thres[py, px],
                diff[py, px],
                final_neg[py, px].astype(jnp.float32),
                final_pos[py, px].astype(jnp.float32),
            ]
        )

    if cfg.emit_states:
        available = {
            "new_frame": new_frame,
            "log_new_frame": log_new,
            "lp_log_frame": lp,
            "photoreceptor_noise_arr": pr_noise,
            "base_log_frame": base,
            "diff_frame": diff,
        }
        if cfg.scidvs:
            available["scidvs_highpass"] = scidvs_highpass
        if cfg.csdvs_enabled:
            available["cs_surround_frame"] = cs_surround
            available["c_minus_s_frame"] = c_minus_s
        out["states"] = {
            name: available[name] for name in cfg.emit_states if name in available
        }

    signed = (final_pos - final_neg).astype(jnp.int16)
    out.update(
        ev_count=signed,
        i0=i0.astype(jnp.int16),
        stride=stride,
        K=K,
        t_prev=state.t_prev,
        t_frame=t_frame,
        num_on=num_on,
        num_off=num_off,
    )

    new_state = state.replace(
        base_log_frame=base,
        lp_log_frame=lp,
        photoreceptor_noise_arr=pr_noise,
        timestamp_mem=new_mem,
        t_prev=t_frame,
        step_idx=state.step_idx + 1,
        scidvs_highpass=scidvs_highpass,
        scidvs_previous_photo=scidvs_prev,
        cs_surround_frame=cs_surround,
    )
    return new_state, out


def blob_plan(total: int, frames: int) -> Tuple[bool, bool]:
    """Static byte-layout choices for the sparse blob, from the chunk's
    cell count and frame count (both trace-time constants).

    idx16: the sorted cell indices ship as low-16 uint16 + a uint8 jump of
    the high 16 bits (3 B/cell instead of 4).  Sorted ascending with fill
    value == total means every high-16 jump is bounded by total >> 16, so
    the encoding is lossless exactly when total <= 0xFFFFFF (16.7M cells —
    a 160-frame 346x260 chunk is 14.4M).
    i0u8: first-iteration indices fit uint8 when the chunk has <= 255
    frames (2 B/cell -> 1).

    Together: 9 B/cell -> 7 B/cell on the headline shape.  The phase-2
    fetch is the one link transfer that can't be hidden when the tunnel
    slows down (fetch p50 was measured 77 ms one day and 294 ms the next
    at identical code), so blob bytes bound the worst-case headline.
    """
    return total <= 0xFFFFFF, 0 < frames <= 255


def _sparse_blob(
    sparse: Dict[str, jnp.ndarray], capacity: int, total: int = 0,
    frames: int = 0,
) -> jnp.ndarray:
    """Serialize the sparse entry arrays into ONE uint8 buffer.

    A host fetch can pay a full link round trip per array; one contiguous
    blob makes the phase-2 fetch a single transfer.  Layout (see
    `blob_plan` for the idx16/i0u8 compression):
      idx  uint16[C] low bits + uint8[C] high-16 jumps   (or int32[C])
      count int16[C]
      i0   uint8[C]                                      (or int16[C])
      shot uint8[C]                                      (only when present)
    total/frames == 0 disables the compressed forms (plain layout).
    """
    idx16, i0u8 = blob_plan(total, frames)
    idx = sparse["idx"][:capacity]
    if idx16:
        low = (idx & 0xFFFF).astype(jnp.uint16)
        high = idx >> 16
        jump = (high - jnp.concatenate([high[:1] * 0, high[:-1]])).astype(
            jnp.uint8
        )
        parts = [
            jax.lax.bitcast_convert_type(low, jnp.uint8).reshape(-1),
            jump,
        ]
    else:
        parts = [jax.lax.bitcast_convert_type(idx, jnp.uint8).reshape(-1)]
    parts.append(
        jax.lax.bitcast_convert_type(sparse["count"][:capacity], jnp.uint8).reshape(-1)
    )
    i0 = sparse["i0"][:capacity]
    if i0u8:
        parts.append(i0.astype(jnp.uint8))
    else:
        parts.append(jax.lax.bitcast_convert_type(i0, jnp.uint8).reshape(-1))
    if "shot" in sparse:
        parts.append(sparse["shot"][:capacity])
    return jnp.concatenate(parts)


def unpack_sparse_blob(
    blob: "object", capacity: int, has_shot: bool, total: int = 0,
    frames: int = 0,
) -> Dict:
    """Host-side inverse of `_sparse_blob` (zero-copy numpy views except
    the idx16 decode, one cumsum over the occupied cells)."""
    import numpy as _np

    idx16, i0u8 = blob_plan(total, frames)
    blob = _np.asarray(blob)
    off = 0
    if idx16:
        low = blob[: 2 * capacity].view(_np.uint16)
        jump = blob[2 * capacity : 3 * capacity]
        idx = (
            _np.cumsum(jump, dtype=_np.int32) << 16
        ) + low.astype(_np.int32)
        off = 3 * capacity
    else:
        idx = blob[: 4 * capacity].view(_np.int32)
        off = 4 * capacity
    out = {
        "idx": idx,
        "count": blob[off : off + 2 * capacity].view(_np.int16),
    }
    off += 2 * capacity
    if i0u8:
        out["i0"] = blob[off : off + capacity]
        off += capacity
    else:
        out["i0"] = blob[off : off + 2 * capacity].view(_np.int16)
        off += 2 * capacity
    if has_shot:
        out["shot"] = blob[off : off + capacity]
    return out


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def slice_packed(
    sparse: Dict[str, jnp.ndarray], capacity: int, total: int = 0,
    frames: int = 0,
) -> jnp.ndarray:
    """Trim compacted sparse arrays to a smaller capacity bucket and pack
    them into one fetchable buffer (compressed per `blob_plan` when
    total/frames are given)."""
    return _sparse_blob(sparse, capacity, total, frames)


@functools.partial(jax.jit, static_argnums=(0,))
def count_occupied(cfg: EmulatorConfig, outs: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Number of (frame, pixel) cells carrying any event — the only scalar
    the host needs before choosing a compaction capacity."""
    occ = outs["ev_count"] != 0
    if cfg.simple_shot_noise:
        occ = occ | outs["shot_on"] | outs["shot_off"]
    return jnp.sum(occ.astype(jnp.int32))


def _rank_select(mask: jnp.ndarray, k: int) -> jnp.ndarray:
    """Positions of the first `k` set entries of `mask`, ascending; fill
    entries carry len(mask).  Sort-free: inclusive prefix-sum of the mask
    gives each query j the position of the (j+1)-th set bit by binary
    search (`searchsorted` side='left' on the monotone rank array) —
    log2(n) gather rounds of k indices instead of an O(n log n) device
    sort."""
    n = mask.shape[0]
    ranks = jnp.cumsum(mask.astype(jnp.int32))
    q = jnp.arange(1, k + 1, dtype=jnp.int32)
    pos = jnp.searchsorted(ranks, q, side="left").astype(jnp.int32)
    return jnp.where(pos < n, pos, n)


def _select_occupied_scan(occ: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """`_select_occupied` semantics via prefix-sum + binary search.

    Same two-phase word-packing as the top_k scheme (8 cells per word) but
    each phase's select is a `_rank_select` instead of a full sort: phase 1
    finds the first `capacity` occupied words, phase 2 the first `capacity`
    occupied cells among their 8*capacity candidates.  Measured in-chunk on
    v5e before flipping the default (scripts/bench_compaction.py).
    """
    total = occ.shape[0]
    PACK = 8
    if total % PACK or capacity >= total:
        pos = _rank_select(occ, min(capacity, total))
        idx = jnp.where(pos < total, pos, total)
        if capacity > total:
            idx = jnp.concatenate(
                [idx, jnp.full((capacity - total,), total, jnp.int32)]
            )
        return idx
    total_w = total // PACK
    bits = occ.reshape(total_w, PACK).astype(jnp.int32)
    patt = jnp.sum(bits * (1 << jnp.arange(PACK, dtype=jnp.int32)), axis=1)
    k1 = min(capacity, total_w)
    w_sel = _rank_select(patt > 0, k1)  # ascending occupied words, fill=total_w
    w_safe = jnp.minimum(w_sel, total_w - 1)
    w_patt = jnp.where(w_sel < total_w, patt[w_safe], 0)
    j = jnp.arange(PACK, dtype=jnp.int32)[None, :]
    cand = w_safe[:, None] * PACK + j  # [k1, PACK]
    valid = ((w_patt[:, None] >> j) & 1) > 0
    sel2 = _rank_select(valid.reshape(-1), capacity)  # into the candidate list
    safe2 = jnp.minimum(sel2, k1 * PACK - 1)
    return jnp.where(sel2 < k1 * PACK, cand.reshape(-1)[safe2], total)


def _select_occupied(occ: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """First `capacity` set indices of the [total] bool mask, ascending;
    fill entries carry `total`.

    Two-phase word-packed select: a straight top_k over all cells is a
    full device sort (~33 ms at 14M cells on v5e).  Packing the occupancy
    of 8 consecutive cells into one key (word_idx*256 + bitmask — ordered
    identically to word_idx, since the bits only perturb within a word)
    shrinks the first sort 8x; the selected words then expand into at most
    8*capacity candidate cells for a second, much smaller top_k.  Bit
    arithmetic only — no device gathers.  Correctness: occupied words <=
    occupied cells, so a word never falls off the first select while the
    cell capacity still has room.
    """
    total = occ.shape[0]
    PACK = 8
    if (
        total % PACK
        or (total // PACK + 1) * (1 << PACK) >= 2**31
        or capacity >= total
    ):
        # small/odd planes: single-stage select
        iota = jax.lax.iota(jnp.int32, total)
        neg = jnp.where(occ, -iota, -total)
        k = min(capacity, total)
        idx = -jax.lax.top_k(neg, k)[0]
        if k < capacity:
            idx = jnp.concatenate(
                [idx, jnp.full((capacity - k,), total, jnp.int32)]
            )
        return idx
    total_w = total // PACK
    bits = occ.reshape(total_w, PACK).astype(jnp.int32)
    patt = jnp.sum(bits * (1 << jnp.arange(PACK, dtype=jnp.int32)), axis=1)
    iota_w = jax.lax.iota(jnp.int32, total_w)
    key = jnp.where(
        patt > 0, -(iota_w * (1 << PACK) + patt), -(total_w * (1 << PACK))
    )
    k1 = min(capacity, total_w)
    sel = -jax.lax.top_k(key, k1)[0]  # ascending occupied words
    w_idx = sel >> PACK
    w_patt = sel & ((1 << PACK) - 1)
    # expand: candidate cell j of word w is valid iff bit j set
    j = jnp.arange(PACK, dtype=jnp.int32)[None, :]
    cand = w_idx[:, None] * PACK + j  # [k1, PACK]
    valid = (w_patt[:, None] >> j) & 1
    neg2 = jnp.where(valid > 0, -cand, -total).reshape(-1)
    return -jax.lax.top_k(neg2, capacity)[0]


@functools.partial(jax.jit, static_argnums=(0, 2))
def compact_chunk(
    cfg: EmulatorConfig, outs: Dict[str, jnp.ndarray], capacity: int
) -> Dict[str, jnp.ndarray]:
    """Compact the dense per-frame maps into fixed-capacity sparse arrays.

    Event density is typically <1% of pixels, but dense [F,H,W] maps cost
    ~540 KB/frame to fetch — prohibitive when the host link is slow (the
    axon tunnel here sustains ~11 MB/s D2H).  The dense maps stay in HBM;
    this kernel gathers only the occupied cells:

      idx   i32[C]  flat cell index (frame*H*W + row*W + col), sorted
      count i16[C]  signed post-refractory event count
      i0    i16[C]  first emitted sub-frame iteration
      shot  u8[C]   bit0 = shot ON, bit1 = shot OFF

    Entries beyond the true occupancy are zero-filled with idx == F*H*W.
    """
    cnt = outs["ev_count"].reshape(-1)
    total = cnt.shape[0]
    occ = cnt != 0
    if cfg.simple_shot_noise:
        on = outs["shot_on"].reshape(-1)
        off = outs["shot_off"].reshape(-1)
        occ = occ | on | off
    import os as _os

    if (cfg.select or _os.environ.get("V2E_SELECT", "topk")) == "scan":
        idx = _select_occupied_scan(occ, capacity)
    else:
        idx = _select_occupied(occ, capacity)
    valid = idx < total
    safe = jnp.minimum(idx, total - 1)
    out = {
        "idx": idx,
        "count": jnp.where(valid, cnt[safe], 0),
        "i0": jnp.where(valid, outs["i0"].reshape(-1)[safe], 0),
    }
    if cfg.simple_shot_noise:
        shot = on[safe].astype(jnp.uint8) | (off[safe].astype(jnp.uint8) << 1)
        out["shot"] = jnp.where(valid, shot, 0)
    return out


def emulate_and_compact_impl(
    cfg: EmulatorConfig,
    params: EmulatorParams,
    state: EmulatorState,
    frames: jnp.ndarray,
    times: jnp.ndarray,
    capacity: int,
):
    """Unjitted body of `emulate_and_compact`: traceable inside larger
    programs (the fully fused SloMo+emulate chunk in v2e_tpu/fused.py)."""
    state, outs = emulate_chunk_impl(cfg, params, state, frames, times)
    sparse = compact_chunk(cfg, outs, capacity)
    n_occ = count_occupied(cfg, outs)
    # ALL per-frame scalars + the occupancy in ONE int32 buffer: a host
    # fetch can pay a full link round trip per array, so phase 1 of the
    # collect is a single small transfer.
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
    packed = {"scalars": scalars, "sparse": sparse}
    if cfg.probe is not None:
        packed["probe"] = outs["probe"]
    return state, outs, packed


@functools.partial(jax.jit, static_argnums=(0, 5))
def emulate_and_compact(
    cfg: EmulatorConfig,
    params: EmulatorParams,
    state: EmulatorState,
    frames: jnp.ndarray,
    times: jnp.ndarray,
    capacity: int,
):
    """One-call chunk conversion: scan + sparse compaction fused.

    Minimizes host round trips (a dispatch through a remote-device link can
    cost tens of ms): a single program returns the new state, the dense
    per-frame outputs (left on device, only needed again on capacity
    overflow), and a 'packed' dict — sparse event entries + per-frame
    scalars + the true occupancy — that the host fetches in one go.
    """
    return emulate_and_compact_impl(cfg, params, state, frames, times, capacity)


def unpack_scalars(scalars: "object") -> Dict:
    """Host-side inverse of the scalar packing in `emulate_and_compact`."""
    import numpy as _np

    scalars = _np.asarray(scalars)
    F = (scalars.shape[0] - 1) // 6
    return {
        "stride": scalars[0:F],
        "K": scalars[F : 2 * F],
        "num_on": scalars[2 * F : 3 * F],
        "num_off": scalars[3 * F : 4 * F],
        "t_prev": scalars[4 * F : 5 * F].view(_np.float32),
        "t_frame": scalars[5 * F : 6 * F].view(_np.float32),
        "n_occ": int(scalars[-1]),
    }


def _linear_iir_scan(
    init: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray
) -> jnp.ndarray:
    """Parallel evaluation of y[f] = a[f]*y[f-1] + b[f] over the leading
    axis via associative_scan (the IIR recurrences of the model are linear
    with per-frame coefficients, so the whole chunk solves in O(log F)
    passes instead of a length-F sequential scan)."""

    def combine(c1, c2):
        a1, b1 = c1
        a2, b2 = c2
        return a1 * a2, a2 * b1 + b2

    A, B = jax.lax.associative_scan(combine, (a, b))
    return A * init[None] + B


def _emulate_chunk_fast(
    cfg: EmulatorConfig,
    params: EmulatorParams,
    state: EmulatorState,
    frames: jnp.ndarray,
    times: jnp.ndarray,
) -> Tuple[EmulatorState, Dict[str, jnp.ndarray]]:
    """Hoisted-precompute chunk evaluation (exact same math as the step
    scan, restructured for the compiler):

    * everything that doesn't depend on carried state — lin-log, intensity
      rescale, all RNG draws, shot-noise Bernoullis, leak deltas, the IIR
      lowpass coefficients — evaluates as a handful of big [F,H,W] batched
      ops instead of ~50 small ops per scan step;
    * the photoreceptor lowpass (and injected-noise lowpass) are linear
      recurrences and solve with an associative scan;
    * the remaining true sequential core (memorized base frame, refractory
      memory, SCIDVS highpass) is a ~15-op lax.scan.

    Per-frame RNG uses fold_in(key, step_idx+f), identical to the stepwise
    path.
    """
    F = frames.shape[0]
    shape = frames.shape[1:]
    frames = frames.astype(jnp.float32)
    times = times.astype(jnp.float32)
    dts = jnp.diff(times, prepend=state.t_prev[None])
    t_prevs = times - dts

    log_new = frames if cfg.hdr else lin_log(frames)
    inten01 = rescale_intensity_frame(frames) if cfg.needs_inten01 else None

    keys = jax.vmap(
        lambda i: jax.random.fold_in(state.key, state.step_idx + i)
    )(jnp.arange(F))
    subkeys = jax.vmap(lambda k: jax.random.split(k, 3))(keys)  # [F,3]

    # --- photoreceptor lowpass (linear IIR -> parallel scan) ---
    if cfg.cutoff_hz > 0:
        import math as _math

        tau = 1.0 / (_math.pi * 2 * cfg.cutoff_hz)
        eps = jnp.clip(inten01 * (dts[:, None, None] / tau), max=1.0)
        lp = _linear_iir_scan(state.lp_log_frame, 1.0 - eps, eps * log_new)
    else:
        lp = log_new

    # --- injected photoreceptor noise, lowpassed the same way ---
    if cfg.photoreceptor_noise:
        import math as _math

        tau = 1.0 / (_math.pi * 2 * cfg.cutoff_hz)
        noise = params.photoreceptor_noise_vrms * jax.vmap(
            lambda k: jax.random.normal(k, shape, dtype=jnp.float32)
        )(subkeys[:, 2])
        eps_n = (dts / tau)[:, None, None] * jnp.ones(shape, jnp.float32)
        pr_noise = _linear_iir_scan(
            state.photoreceptor_noise_arr, 1.0 - eps_n, eps_n * noise
        )
        pr_last = pr_noise[-1]
    else:
        pr_noise = None
        pr_last = state.photoreceptor_noise_arr

    # --- leak deltas (per-frame Gaussian jitter on the FPN rates) ---
    if cfg.leak_rate_hz > 0:
        rand = jax.vmap(
            lambda k: jax.random.normal(k, shape, dtype=jnp.float32)
        )(subkeys[:, 0])
        leak_delta = (
            dts[:, None, None]
            * (cfg.leak_rate_hz * params.noise_rate_array)
            * (1.0 - cfg.leak_jitter_fraction * rand)
            * params.pos_thres
        )
    else:
        leak_delta = None

    # --- Bernoulli shot noise maps ---
    if cfg.simple_shot_noise:
        def shot_one(k, dt, inten):
            return generate_shot_noise(
                k, cfg.shot_noise_rate_hz, dt, cfg.shot_noise_inten_factor,
                inten, params.pos_thres_pre_prob, params.neg_thres_pre_prob,
            )

        shot_on, shot_off = jax.vmap(shot_one)(subkeys[:, 1], dts, inten01)
    else:
        shot_on = shot_off = None

    # --- sequential core ---
    if (
        cfg.use_pallas_scan
        and cfg.refractory_period_s <= 0
        and not cfg.scidvs
        and jax.default_backend() == "tpu"
    ):
        from v2e_tpu.ops.pallas.emulator_scan import emulator_scan_pallas

        lp_eff = lp + pr_noise if cfg.photoreceptor_noise else lp
        shot_any = (shot_on | shot_off) if cfg.simple_shot_noise else None
        new_base, signed16 = emulator_scan_pallas(
            lp_eff, leak_delta, shot_any,
            params.pos_thres, params.neg_thres, state.base_log_frame,
        )
        signed_abs = jnp.abs(signed16.astype(jnp.int32))
        K_arr = jnp.max(signed_abs, axis=(1, 2))
        outs = {
            "ev_count": signed16,
            "i0": jnp.zeros_like(signed16),
            "stride": jnp.ones((F,), jnp.int32),
            "K": K_arr,
        }
        num_on = jnp.sum(jnp.maximum(signed16.astype(jnp.int32), 0), axis=(1, 2))
        num_off = jnp.sum(jnp.maximum(-signed16.astype(jnp.int32), 0), axis=(1, 2))
        if cfg.simple_shot_noise:
            num_on = num_on + jnp.sum(shot_on, axis=(1, 2))
            num_off = num_off + jnp.sum(shot_off, axis=(1, 2))
            outs["shot_on"] = shot_on
            outs["shot_off"] = shot_off
        outs.update(t_prev=t_prevs, t_frame=times, num_on=num_on, num_off=num_off)
        new_state = state.replace(
            base_log_frame=new_base,
            lp_log_frame=lp[-1],
            photoreceptor_noise_arr=pr_last,
            t_prev=times[-1],
            step_idx=state.step_idx + F,
        )
        return new_state, outs

    if (
        cfg.use_pallas_scan
        and cfg.refractory_period_s > 0
        and not cfg.scidvs
        and jax.default_backend() == "tpu"
    ):
        from v2e_tpu.ops.pallas.emulator_scan import (
            emulator_scan_refractory_pallas,
            refractory_plane_ok,
        )

        if refractory_plane_ok(*shape):
            lp_eff = lp + pr_noise if cfg.photoreceptor_noise else lp
            shot_any = (shot_on | shot_off) if cfg.simple_shot_noise else None
            new_base, new_mem, signed16, i0_16, K_arr = (
                emulator_scan_refractory_pallas(
                    lp_eff, leak_delta, shot_any,
                    params.pos_thres, params.neg_thres,
                    state.base_log_frame, state.timestamp_mem,
                    dts, t_prevs, float(cfg.refractory_period_s),
                )
            )
            # per-frame stride from K, same formula as refractory_filter
            ts_step = jnp.maximum(dts, 1e-12) / jnp.maximum(K_arr, 1).astype(
                jnp.float32
            )
            active = jnp.float32(cfg.refractory_period_s) > ts_step
            m = (jnp.floor(cfg.refractory_period_s / ts_step) + 1.0).astype(
                jnp.int32
            )
            outs = {
                "ev_count": signed16,
                "i0": i0_16,
                "stride": jnp.where(active, m, 1),
                "K": K_arr,
            }
            num_on = jnp.sum(
                jnp.maximum(signed16.astype(jnp.int32), 0), axis=(1, 2)
            )
            num_off = jnp.sum(
                jnp.maximum(-signed16.astype(jnp.int32), 0), axis=(1, 2)
            )
            if cfg.simple_shot_noise:
                num_on = num_on + jnp.sum(shot_on, axis=(1, 2))
                num_off = num_off + jnp.sum(shot_off, axis=(1, 2))
                outs["shot_on"] = shot_on
                outs["shot_off"] = shot_off
            outs.update(
                t_prev=t_prevs, t_frame=times, num_on=num_on, num_off=num_off
            )
            new_state = state.replace(
                base_log_frame=new_base,
                lp_log_frame=lp[-1],
                photoreceptor_noise_arr=pr_last,
                timestamp_mem=new_mem,
                t_prev=times[-1],
                step_idx=state.step_idx + F,
            )
            return new_state, outs

    def body(carry, inp):
        base, mem, hp, lp_prev = carry
        lp_f, pr_f, leak_f, s_on, s_off, dt, t, t_prev = inp

        if leak_f is not None:
            base = base - leak_f

        if cfg.scidvs:
            hp = hp + (lp_f - lp_prev) - dt * _scidvs_dvdt(hp, params.scidvs_tau_arr)
            photoreceptor = cfg.scidvs_gain * hp
        else:
            photoreceptor = lp_f

        diff = photoreceptor + (pr_f if pr_f is not None else 0.0) - base

        pos_evts, neg_evts = compute_event_map(
            diff, params.pos_thres, params.neg_thres
        )
        count = pos_evts + neg_evts
        K = jnp.max(count)
        ts_step = jnp.maximum(dt, 1e-12) / jnp.maximum(K, 1).astype(jnp.float32)

        if cfg.refractory_period_s > 0:
            n_emit, i0, stride, mem = refractory_filter(
                count, mem, t_prev, ts_step, cfg.refractory_period_s
            )
        else:
            n_emit, i0, stride = count, jnp.zeros_like(count), jnp.int32(1)

        final_pos = jnp.where(pos_evts > 0, n_emit, 0)
        final_neg = jnp.where(neg_evts > 0, n_emit, 0)
        base = base + final_pos.astype(jnp.float32) * params.pos_thres
        base = base - final_neg.astype(jnp.float32) * params.neg_thres
        if s_on is not None:
            base = jnp.where(s_on | s_off, lp_f, base)

        out = {
            "ev_count": (final_pos - final_neg).astype(jnp.int16),
            "i0": i0.astype(jnp.int16),
            "stride": stride,
            "K": K,
        }
        new_lp_prev = lp_f if cfg.scidvs else lp_prev
        return (base, mem, hp, new_lp_prev), out

    hp0 = state.scidvs_highpass if cfg.scidvs else jnp.zeros((), jnp.float32)
    lp_prev0 = (
        state.scidvs_previous_photo if cfg.scidvs else jnp.zeros((), jnp.float32)
    )
    inputs = (
        lp,
        pr_noise,
        leak_delta,
        shot_on,
        shot_off,
        dts,
        times,
        t_prevs,
    )
    (base, mem, hp, lp_prev), outs = jax.lax.scan(
        body, (state.base_log_frame, state.timestamp_mem, hp0, lp_prev0), inputs
    )

    # per-frame stats, vectorized post-scan
    signed = outs["ev_count"].astype(jnp.int32)
    num_on = jnp.sum(jnp.maximum(signed, 0), axis=(1, 2))
    num_off = jnp.sum(jnp.maximum(-signed, 0), axis=(1, 2))
    if shot_on is not None:
        num_on = num_on + jnp.sum(shot_on, axis=(1, 2))
        num_off = num_off + jnp.sum(shot_off, axis=(1, 2))
        outs["shot_on"] = shot_on
        outs["shot_off"] = shot_off
    outs.update(
        t_prev=t_prevs, t_frame=times, num_on=num_on, num_off=num_off
    )

    new_state = state.replace(
        base_log_frame=base,
        lp_log_frame=lp[-1],
        photoreceptor_noise_arr=pr_last,
        timestamp_mem=mem,
        t_prev=times[-1],
        step_idx=state.step_idx + F,
        scidvs_highpass=hp if cfg.scidvs else state.scidvs_highpass,
        scidvs_previous_photo=lp_prev if cfg.scidvs else state.scidvs_previous_photo,
    )
    return new_state, outs


def emulate_chunk_impl(
    cfg: EmulatorConfig,
    params: EmulatorParams,
    state: EmulatorState,
    frames: jnp.ndarray,
    times: jnp.ndarray,
) -> Tuple[EmulatorState, Dict[str, jnp.ndarray]]:
    """Unjitted chunk evaluation (see `emulate_chunk`): traceable inside
    other programs (vmap over segments, fused SloMo+emulate chunks)."""
    if not (cfg.csdvs_enabled or cfg.emit_states or cfg.probe is not None):
        return _emulate_chunk_fast(cfg, params, state, frames, times)

    def body(st, inp):
        frame, t = inp
        return emulator_step(cfg, params, st, frame, t)

    return jax.lax.scan(body, state, (frames, times))


@functools.partial(jax.jit, static_argnums=(0,))
def emulate_chunk(
    cfg: EmulatorConfig,
    params: EmulatorParams,
    state: EmulatorState,
    frames: jnp.ndarray,
    times: jnp.ndarray,
) -> Tuple[EmulatorState, Dict[str, jnp.ndarray]]:
    """Scan the emulator over a chunk of frames in one compiled program.

    Args:
      frames: f32[F,H,W] linear 0-255 intensity frames (HDR log if cfg.hdr).
      times: f32[F] chunk-relative frame times, strictly increasing, with
        times[0] > state.t_prev.

    Returns:
      (final_state, outs) with outs the per-frame outputs of `emulator_step`
      stacked along a leading F axis.

    Uses the hoisted-precompute fast path unless the configuration needs
    per-step extras it doesn't support (CSDVS diffusion, state-frame
    emission, the single-pixel probe).
    """
    return emulate_chunk_impl(cfg, params, state, frames, times)
