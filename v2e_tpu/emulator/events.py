"""Host-side materialization of AER event lists from dense count maps.

The device returns, per frame, a signed per-pixel event-count map plus the
closed-form sub-frame timing descriptors (first iteration ``i0``, stride,
grid size ``K``).  This module expands those into the reference-compatible
AER array ``[N, 4] = [t, x, y, p]`` with the same timestamp pyramid and
ordering semantics as the reference hot loop
(/root/reference/v2ecore/emulator.py:773-923):

* per frame, candidate timestamps form the uniform grid
  ``ts[i] = t_prev + (i+1) * dt/K``  (torch.linspace equivalent, :793-796),
* events are ordered iteration-major; within an iteration the reference
  shuffles randomly (:868-869) — reproduced here via a seeded permutation,
* Bernoulli shot-noise events are appended last with timestamp ``ts[-1]``
  (ON pixels in raster order, then OFF; :906-916), and labeled noise=0 when
  signal/noise labeling is requested.

Timestamps are emitted in float64 (chunk origin is tracked on the host),
improving on the reference's float32 event times.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from v2e_tpu.native import get_lib


def materialize_frame(
    ev_count: np.ndarray,
    i0: np.ndarray,
    stride: int,
    K: int,
    t_prev: float,
    t_frame: float,
    shot_on: Optional[np.ndarray] = None,
    shot_off: Optional[np.ndarray] = None,
    rng: Optional[np.random.Generator] = None,
    label_signal_noise: bool = False,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Materialize one frame's events.

    Args:
      ev_count: i16[H,W] signed final counts (+ON / -OFF).
      i0: i16[H,W] first emitted iteration per pixel.
      stride: iteration stride between a pixel's successive events.
      K: sub-frame timestamp grid size (max candidate count).
      t_prev, t_frame: absolute interval bounds in float64 seconds.
      shot_on, shot_off: optional bool[H,W] shot-noise maps.
      rng: numpy Generator for the within-iteration shuffle (None = no shuffle).
      label_signal_noise: also return a bool[N] signal(1)/noise(0) array.

    Returns:
      (events f64[N,4], labels bool[N] or None)
    """
    H, W = ev_count.shape
    dt = t_frame - t_prev
    s = dt / max(int(K), 1)

    lib = get_lib()
    if lib is not None:
        ev, lab = _materialize_frame_native(
            lib, ev_count, i0, stride, K, t_prev, s, t_frame,
            shot_on, shot_off, label_signal_noise,
        )
        if rng is not None and ev.shape[0] > 1:
            # shuffle ties: stable in time, random within equal timestamps
            # (reference shuffles within each sub-frame iteration,
            # emulator.py:868-869)
            order = np.lexsort((rng.random(ev.shape[0]), ev[:, 0]))
            ev = ev[order]
            if lab is not None:
                lab = lab[order]
        return ev, lab

    c = ev_count.ravel().astype(np.int64)
    nz = np.flatnonzero(c)
    parts = []
    labels = []

    if nz.size:
        cc = np.abs(c[nz])
        pol = np.where(c[nz] > 0, 1.0, -1.0)
        i0f = i0.ravel()[nz].astype(np.int64)
        tot = int(cc.sum())
        rep = np.repeat(np.arange(nz.size), cc)
        offsets = np.concatenate(([0], np.cumsum(cc)))
        j = np.arange(tot, dtype=np.int64) - offsets[rep]
        iteration = i0f[rep] + j * int(stride)
        if rng is not None:
            order = np.lexsort((rng.random(tot), iteration))
        else:
            order = np.argsort(iteration, kind="stable")
        pix = nz[rep][order]
        it = iteration[order]
        ev = np.empty((tot, 4), dtype=np.float64)
        ev[:, 0] = t_prev + (it + 1) * s
        ev[:, 1] = pix % W
        ev[:, 2] = pix // W
        ev[:, 3] = pol[rep][order]
        parts.append(ev)
        if label_signal_noise:
            labels.append(np.ones(tot, dtype=bool))

    if shot_on is not None:
        on_pix = np.flatnonzero(shot_on.ravel())
        off_pix = np.flatnonzero(shot_off.ravel())
        n_shot = on_pix.size + off_pix.size
        if n_shot:
            ev = np.empty((n_shot, 4), dtype=np.float64)
            ev[:, 0] = t_frame  # = ts[-1], reference emulator.py:910
            ev[: on_pix.size, 1] = on_pix % W
            ev[: on_pix.size, 2] = on_pix // W
            ev[: on_pix.size, 3] = 1.0
            ev[on_pix.size :, 1] = off_pix % W
            ev[on_pix.size :, 2] = off_pix // W
            ev[on_pix.size :, 3] = -1.0
            parts.append(ev)
            if label_signal_noise:
                labels.append(np.zeros(n_shot, dtype=bool))

    if not parts:
        empty = np.empty((0, 4), dtype=np.float64)
        return empty, (np.empty(0, dtype=bool) if label_signal_noise else None)
    events = np.concatenate(parts) if len(parts) > 1 else parts[0]
    lab = None
    if label_signal_noise:
        lab = np.concatenate(labels) if len(labels) > 1 else labels[0]
    return events, lab


def _materialize_frame_native(
    lib,
    ev_count: np.ndarray,
    i0: np.ndarray,
    stride: int,
    K: int,
    t_prev: float,
    s: float,
    t_frame: float,
    shot_on: Optional[np.ndarray],
    shot_off: Optional[np.ndarray],
    label_signal_noise: bool,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    H, W = ev_count.shape
    if shot_on is not None and shot_on.shape != ev_count.shape:
        raise ValueError(
            f"shot map shape {shot_on.shape} != count map shape {ev_count.shape}"
        )
    cmap = np.ascontiguousarray(ev_count, dtype=np.int16)
    i0map = np.ascontiguousarray(i0, dtype=np.int16)
    on_u8 = off_u8 = None
    on_ptr = off_ptr = None
    if shot_on is not None:
        on_u8 = np.ascontiguousarray(shot_on, dtype=np.uint8)
        off_u8 = np.ascontiguousarray(shot_off, dtype=np.uint8)
        on_ptr = on_u8.ctypes.data
        off_ptr = off_u8.ctypes.data
    total = int(
        lib.count_frame_events(cmap.ravel(), H * W, on_ptr, off_ptr)
    )
    out = np.empty((total, 4), dtype=np.float64)
    lab = np.empty(total, dtype=np.uint8) if label_signal_noise else None
    lab_ptr = lab.ctypes.data if lab is not None else None
    written = int(
        lib.materialize_frame(
            cmap.ravel(), i0map.ravel(), int(stride), H, W,
            float(t_prev), float(s), float(t_frame),
            on_ptr, off_ptr, int(K),
            out.reshape(-1), lab_ptr, total,
        )
    )
    if written < 0:
        raise RuntimeError("native materialize_frame capacity overflow")
    out = out[:written]
    if lab is not None:
        lab = lab[:written].astype(bool)
    return out, lab


def materialize_events_sparse(
    idx: np.ndarray,
    count: np.ndarray,
    i0: np.ndarray,
    shot: Optional[np.ndarray],
    stride: np.ndarray,
    K: np.ndarray,
    t_prev: np.ndarray,
    t_frame: np.ndarray,
    H: int,
    W: int,
    t_origin: float,
    rng: Optional[np.random.Generator] = None,
    label_signal_noise: bool = False,
) -> Tuple[np.ndarray, Optional[np.ndarray], np.ndarray]:
    """Materialize a whole chunk from device-compacted sparse entries.

    Inputs are the (host-fetched, fill-trimmed) outputs of
    `core.compact_chunk` plus the per-frame scalar arrays [F].  Events are
    produced fully vectorized across all frames in one pass: each entry
    expands into |count| events at iterations i0 + j*stride of its frame's
    timestamp grid, then a single lexsort orders the chunk by (frame,
    iteration[, random within ties]); shot-noise events sort after the
    signal events of their frame via a one-past-the-end iteration key.

    Returns (events f64[N,4], labels, frame_offsets i64[F+1]).
    """
    F = len(K)
    HW = H * W
    Kf = np.maximum(K.astype(np.int64), 1)
    dt64 = t_frame.astype(np.float64) - t_prev.astype(np.float64)
    s64 = dt64 / Kf
    t0_64 = t_origin + t_prev.astype(np.float64)
    tf_64 = t_origin + t_frame.astype(np.float64)

    lib = get_lib()
    if lib is not None:
        # single-pass C++ expansion+sort (bit-identical to the numpy path
        # below, incl. shuffle: rand tie-break keys are pre-drawn with the
        # same generator in the same event order)
        cc_n = np.abs(count.astype(np.int64))
        total_n = int(cc_n.sum())
        if shot is not None:
            total_n += int(np.count_nonzero(shot & 1))
            total_n += int(np.count_nonzero(shot & 2))
        if total_n == 0:
            empty = np.empty((0, 4), dtype=np.float64)
            lab = np.empty(0, dtype=bool) if label_signal_noise else None
            return empty, lab, np.zeros(F + 1, dtype=np.int64)
        rand_keys = rng.random(total_n) if rng is not None else None
        events = np.empty((total_n, 4), dtype=np.float64)
        lab_u8 = (
            np.empty(total_n, dtype=np.uint8) if label_signal_noise else None
        )
        offsets = np.zeros(F + 1, dtype=np.int64)
        shot_u8 = (
            np.ascontiguousarray(shot, dtype=np.uint8)
            if shot is not None else None
        )
        n = lib.materialize_sparse(
            np.ascontiguousarray(idx, dtype=np.int32),
            np.ascontiguousarray(count, dtype=np.int16),
            np.ascontiguousarray(i0, dtype=np.int16),
            shot_u8.ctypes.data if shot_u8 is not None else None,
            int(idx.shape[0]),
            np.ascontiguousarray(stride, dtype=np.int64),
            np.ascontiguousarray(K, dtype=np.int64),
            t0_64, tf_64, s64,
            F, H, W,
            rand_keys.ctypes.data if rand_keys is not None else None,
            events.reshape(-1),
            lab_u8.ctypes.data if lab_u8 is not None else None,
            offsets,
        )
        assert n == total_n, (n, total_n)
        lab = lab_u8.astype(bool) if lab_u8 is not None else None
        return events, lab, offsets

    frame_of = idx // HW
    pix = idx % HW
    cc = np.abs(count.astype(np.int64))

    # --- expand signal events ---
    total = int(cc.sum())
    parts_t = []
    parts_x = []
    parts_y = []
    parts_p = []
    parts_f = []
    parts_it = []
    parts_sub = []  # 0 signal, 1 shot-on, 2 shot-off (orders ties)
    if total:
        nz = np.flatnonzero(cc)
        cce = cc[nz]
        rep = np.repeat(nz, cce)
        offsets = np.zeros(len(nz) + 1, dtype=np.int64)
        np.cumsum(cce, out=offsets[1:])
        j = np.arange(total, dtype=np.int64) - offsets[
            np.repeat(np.arange(len(nz)), cce)
        ]
        fr = frame_of[rep]
        it = i0[rep].astype(np.int64) + j * stride[fr].astype(np.int64)
        parts_t.append(t0_64[fr] + (it + 1) * s64[fr])
        parts_x.append(pix[rep] % W)
        parts_y.append(pix[rep] // W)
        parts_p.append(np.where(count[rep] > 0, 1.0, -1.0))
        parts_f.append(fr)
        parts_it.append(it)
        parts_sub.append(np.zeros(total, dtype=np.int8))

    if shot is not None:
        for bit, pol, sub in ((1, 1.0, 1), (2, -1.0, 2)):
            sel = np.flatnonzero(shot & bit)
            if sel.size:
                fr = frame_of[sel]
                parts_t.append(tf_64[fr])
                parts_x.append(pix[sel] % W)
                parts_y.append(pix[sel] // W)
                parts_p.append(np.full(sel.size, pol))
                parts_f.append(fr)
                parts_it.append(Kf[fr])  # one past the signal grid
                parts_sub.append(np.full(sel.size, sub, dtype=np.int8))

    if not parts_t:
        empty = np.empty((0, 4), dtype=np.float64)
        lab = np.empty(0, dtype=bool) if label_signal_noise else None
        return empty, lab, np.zeros(F + 1, dtype=np.int64)

    t = np.concatenate(parts_t)
    x = np.concatenate(parts_x)
    y = np.concatenate(parts_y)
    p = np.concatenate(parts_p)
    fr = np.concatenate(parts_f)
    it = np.concatenate(parts_it)
    sub = np.concatenate(parts_sub)

    keys = [sub, it, fr] if rng is None else [rng.random(t.shape[0]), sub, it, fr]
    order = np.lexsort(tuple(keys))
    events = np.empty((t.shape[0], 4), dtype=np.float64)
    events[:, 0] = t[order]
    events[:, 1] = x[order]
    events[:, 2] = y[order]
    events[:, 3] = p[order]
    lab = None
    if label_signal_noise:
        lab = (sub[order] == 0)

    frame_offsets = np.searchsorted(fr[order], np.arange(F + 1), side="left")
    return events, lab, frame_offsets.astype(np.int64)


def materialize_events(
    outs: Dict[str, np.ndarray],
    t_origin: float,
    rng: Optional[np.random.Generator] = None,
    label_signal_noise: bool = False,
) -> Tuple[np.ndarray, Optional[np.ndarray], np.ndarray]:
    """Materialize a whole chunk of frames.

    Args:
      outs: stacked per-frame outputs of `emulate_chunk`, as numpy arrays
        (leading axis F).
      t_origin: absolute float64 time of the chunk origin — added to the
        chunk-relative device times.

    Returns:
      (events f64[N,4], labels bool[N] or None, frame_offsets i64[F+1]):
      events of all frames concatenated in time order; ``events[frame_offsets
      [f]:frame_offsets[f+1]]`` are frame ``f``'s events.
    """
    F = outs["ev_count"].shape[0]
    has_shot = "shot_on" in outs
    parts = []
    labels = []
    offsets = np.zeros(F + 1, dtype=np.int64)
    for f in range(F):
        ev, lab = materialize_frame(
            outs["ev_count"][f],
            outs["i0"][f],
            int(outs["stride"][f]),
            int(outs["K"][f]),
            t_origin + float(outs["t_prev"][f]),
            t_origin + float(outs["t_frame"][f]),
            shot_on=outs["shot_on"][f] if has_shot else None,
            shot_off=outs["shot_off"][f] if has_shot else None,
            rng=rng,
            label_signal_noise=label_signal_noise,
        )
        offsets[f + 1] = offsets[f] + ev.shape[0]
        parts.append(ev)
        if label_signal_noise:
            labels.append(lab)
    events = np.concatenate(parts) if parts else np.empty((0, 4), dtype=np.float64)
    lab = np.concatenate(labels) if (label_signal_noise and labels) else None
    return events, lab, offsets
