"""Space-to-depth UNet forward: full-MXU execution of the low-channel layers.

The SuperSloMo UNets spend most of their FLOPs in full-resolution layers
with 12-64 channels (conv1/conv2 7x7, up5/conv3 3x3).  XLA:TPU lowers such
convs to software loop-fusion emitters (observed "EmitInputBatchInLanes" at
~8 TF/s on v5e — 4% MFU) because 32 input channels cannot fill the MXU's
128-lane contraction.

This module evaluates the SAME functions exactly in space-to-depth form:
a stride-1 kxk conv on [N,H,W,C] equals a small set of convs on the
[N,H/2,W/2,4C] phase representation, with kernels that are pure
re-indexings of the original weights:

  * output phase (a,b), input phase (r,s):  taps p of the original kernel
    map to s2d taps P via  a + p - c = 2P + r  (c = k//2).  For k=7 each
    output row-phase needs a 4-tap window but at DIFFERENT offsets
    ([-2,1] for a=0, [-1,2] for a=1), so the transform emits one conv per
    output phase pair with per-phase asymmetric padding — 4 convs of
    [4Ci -> Co] each, 4x4 taps (k=7) or 2x2 taps (k=3).  MAC count grows
    49->64 (1.31x) and 9->16 (1.78x), but the contraction width grows 4x,
    moving the layer onto the MXU custom-call path.
  * avgpool2 == mean over the 4 phase blocks (free channel reduction).
  * bilinear x2 upsampling (half-pixel, edge-clamped — torch
    align_corners=False) folded INTO phase space as two shift-lerps.

Numerics are exactly the original ops' (same adds/mults per output up to
float reassociation); `tests/test_unet_s2d.py` asserts f32 agreement with
`unet_apply` to ~1e-5.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from v2e_tpu.models.unet import Params, _conv_block, _avg_pool2_nhwc, _lrelu

# ---------------------------------------------------------------------------
# phase plumbing (NHWC; phase-major channel layout: ch = (2r+s)*C + c)


def s2d_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    """[N,H,W,C] -> [N,H/2,W/2,4C] with phase-major channels."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(n, h // 2, w // 2, 4 * c)


def d2s_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `s2d_nhwc`."""
    n, h2, w2, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, h2, w2, 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(n, 2 * h2, 2 * w2, c)


def phase_mean(x: jnp.ndarray) -> jnp.ndarray:
    """avgpool2 of the full-res tensor == mean over the 4 phase blocks."""
    n, h2, w2, c4 = x.shape
    c = c4 // 4
    return jnp.mean(x.reshape(n, h2, w2, 4, c), axis=3)


def phase_concat(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Channel-concat of two full-res tensors, in phase space."""
    n, h2, w2, ca4 = a.shape
    cb4 = b.shape[-1]
    ca, cb = ca4 // 4, cb4 // 4
    a = a.reshape(n, h2, w2, 4, ca)
    b = b.reshape(n, h2, w2, 4, cb)
    return jnp.concatenate([a, b], axis=4).reshape(n, h2, w2, ca4 + cb4)


def upsample2_s2d(x: jnp.ndarray) -> jnp.ndarray:
    """s2d(bilinear x2 upsample of x) for [N,H2,W2,C] -> [N,H2,W2,4C].

    Half-pixel centers with edge clamp (jax.image.resize 'bilinear', torch
    align_corners=False): output row 2i+a samples input at i + (a-0.5)/2,
    i.e. phase a=0 is 0.25*x[i-1] + 0.75*x[i] and a=1 is
    0.75*x[i] + 0.25*x[i+1], rows clamped at the borders; same per column.
    """
    def lo(v, axis):  # x[i-1] with edge clamp
        sl = [slice(None)] * v.ndim
        sl[axis] = slice(0, 1)
        first = v[tuple(sl)]
        sl[axis] = slice(0, -1)
        return jnp.concatenate([first, v[tuple(sl)]], axis=axis)

    def hi(v, axis):  # x[i+1] with edge clamp
        sl = [slice(None)] * v.ndim
        sl[axis] = slice(-1, None)
        last = v[tuple(sl)]
        sl[axis] = slice(1, None)
        return jnp.concatenate([v[tuple(sl)], last], axis=axis)

    q, t = jnp.asarray(0.25, x.dtype), jnp.asarray(0.75, x.dtype)
    r0 = q * lo(x, 1) + t * x
    r1 = t * x + q * hi(x, 1)
    phases = []
    for r in (r0, r1):
        phases.append(q * lo(r, 2) + t * r)
        phases.append(t * r + q * hi(r, 2))
    return jnp.concatenate(phases, axis=-1)


# ---------------------------------------------------------------------------
# weight transforms (index maps built in numpy once per (k, a, b))


def _s2d_index_map(k: int, a: int, b: int):
    """For output phase (a,b) of a stride-1 kxk conv (pad k//2), return
    (Ks, pad_rows, pad_cols, entries) where entries is a list of
    (P_idx, Q_idx, r, s, p, q) mappings into a [Ks,Ks] s2d kernel."""
    c = k // 2
    vals = [a + p - c for p in range(k)]
    Ps = sorted({(v - (v % 2)) // 2 if v % 2 == 0 else (v - 1) // 2 for v in vals})
    Pmin, Pmax = min(Ps), max(Ps)
    Ks = Pmax - Pmin + 1
    pad = (-Pmin, Pmax)

    rows = []
    for p in range(k):
        v = a + p - c
        r = v & 1
        P = (v - r) // 2
        rows.append((P - Pmin, r, p))

    vals_b = [b + q - c for q in range(k)]
    Qs = [((v - (v & 1)) // 2) for v in vals_b]
    Qmin, Qmax = min(Qs), max(Qs)
    KsQ = Qmax - Qmin + 1
    pad_q = (-Qmin, Qmax)
    cols = []
    for q in range(k):
        v = b + q - c
        s = v & 1
        Q = (v - s) // 2
        cols.append((Q - Qmin, s, q))
    assert Ks == KsQ
    return Ks, pad, pad_q, rows, cols


def w_to_s2d_phase(w: jnp.ndarray, a: int, b: int):
    """Transform OIHW weights [Co,Ci,k,k] into the s2d kernel for output
    phase (a,b): HWIO [Ks,Ks,4Ci,Co] plus the (row,col) paddings.

    One gather + one scatter with numpy-precomputed index arrays: every
    original tap (p,q) lands at exactly one (P,Q,phase) slot.
    """
    co, ci, k, _ = w.shape
    Ks, pad_r, pad_c, rows, cols = _s2d_index_map(k, a, b)
    slots = []
    ps = []
    qs = []
    for Pi, r, p in rows:
        for Qi, s, q in cols:
            ph = 2 * r + s
            slots.append((Pi * Ks + Qi) * 4 + ph)
            ps.append(p)
            qs.append(q)
    slots = np.asarray(slots)
    taps = w[:, :, np.asarray(ps), np.asarray(qs)]  # [Co,Ci,T]
    taps = jnp.transpose(taps, (2, 1, 0))  # [T,Ci,Co]
    out = jnp.zeros((Ks * Ks * 4, ci, co), w.dtype)
    out = out.at[slots].set(taps)  # unique slots -> deterministic
    out = out.reshape(Ks, Ks, 4 * ci, co)
    return out, pad_r, pad_c


def conv_s2d_block(x: jnp.ndarray, p: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """s2d conv + bias + LeakyReLU for one original conv layer.

    x: [N,H2,W2,4Ci] phase-major; returns [N,H2,W2,4Co] phase-major —
    exactly s2d(conv_block(d2s(x))).
    """
    w, bias = p["w"], p["b"]
    outs = []
    for a in (0, 1):
        for b in (0, 1):
            wk, pad_r, pad_c = w_to_s2d_phase(w, a, b)
            y = jax.lax.conv_general_dilated(
                x,
                wk.astype(x.dtype),
                window_strides=(1, 1),
                padding=[pad_r, pad_c],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=x.dtype,
            )
            outs.append(y + bias.astype(x.dtype))
    y = jnp.concatenate(outs, axis=-1)
    return jnp.maximum(y, jnp.asarray(0.1, x.dtype) * y)


# ---------------------------------------------------------------------------


def unet_apply_s2d(
    params: Params, x: jnp.ndarray, compute_dtype=None, embedded: bool = False
) -> jnp.ndarray:
    """Forward pass equal to `unet_apply`, full-res stages in phase space.

    x: [N, in_ch, H, W] NCHW (H, W multiples of 32).  Returns NCHW output.
    embedded: use the single phase-embedded conv per layer (4Co=128 MXU
    output lanes, 2.04x MACs for k=7) instead of 4 per-phase convs.
    """
    conv_s2d = conv_s2d_block_embedded if embedded else conv_s2d_block
    in_dtype = x.dtype
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    x = jnp.transpose(x, (0, 2, 3, 1))  # NHWC

    x4 = s2d_nhwc(x)
    x4 = conv_s2d(x4, params["conv1"])
    s1s = conv_s2d(x4, params["conv2"])  # s2d of skip s1

    # down1 consumes avgpool2(s1) == phase mean
    x = phase_mean(s1s)
    x = _conv_block(x, params["down1.conv1"])
    x = _conv_block(x, params["down1.conv2"])
    skips = [x]  # s2
    for i in range(2, 6):
        x = _avg_pool2_nhwc(x)
        x = _conv_block(x, params[f"down{i}.conv1"])
        x = _conv_block(x, params[f"down{i}.conv2"])
        if i < 5:
            skips.append(x)
    # skips = [s2, s3, s4, s5]
    from v2e_tpu.models.unet import _upsample2_nhwc

    for i in range(1, 5):
        skip = skips[4 - i]
        x = _upsample2_nhwc(x)
        x = _conv_block(x, params[f"up{i}.conv1"])
        x = _conv_block(
            jnp.concatenate([x, skip], axis=-1), params[f"up{i}.conv2"]
        )
    # up5 entirely in phase space: upsample fold + conv + skip concat + conv
    xu = upsample2_s2d(x)
    x = conv_s2d(xu, params["up5.conv1"])
    x = conv_s2d(phase_concat(x, s1s), params["up5.conv2"])
    out = conv_s2d(x, params["conv3"])
    out = d2s_nhwc(out)
    out = jnp.transpose(out, (0, 3, 1, 2))
    return out.astype(in_dtype)


# ---------------------------------------------------------------------------
# single-conv phase embedding: all 4 output phases from ONE conv
#
# The 4-conv-per-layer form above keeps MAC overhead minimal (4x4 taps for
# k=7) but each conv has only Co output channels — on the MXU that fills
# 32/128 output lanes.  Embedding every phase kernel into the union tap
# window gives one conv [Ku,Ku,4Ci,4Co]: 4Co=128 output lanes (full MXU
# width) at the price of zero taps (k=7: 5x5 union vs 4x4 per-phase = 1.56x
# more MACs; total 2.04x the dense conv's MACs).


def _union_window(k: int):
    """Union of the per-phase P-ranges for one axis; returns (Ku, Pmin)."""
    lo = max(_s2d_index_map(k, a, 0)[1][0] for a in (0, 1))
    hi = max(_s2d_index_map(k, a, 0)[1][1] for a in (0, 1))
    return lo + hi + 1, lo


def w_to_s2d_embedded(w: jnp.ndarray):
    """OIHW [Co,Ci,k,k] -> one HWIO s2d kernel [Ku,Ku,4Ci,4Co] + padding.

    Output channel layout is phase-major ((2a+b)*Co + co), matching
    `phase_concat`/`s2d_nhwc`; taps of phase (a,b) land at union-window
    offsets, everything else stays zero.
    """
    co, ci, k, _ = w.shape
    Ku, Pshift = _union_window(k)
    out = jnp.zeros((Ku * Ku * 4, ci, 4 * co), w.dtype)
    slots = []
    taps_all = []
    ocol = []
    for a in (0, 1):
        for b in (0, 1):
            Ks, pad_r, pad_c, rows, cols = _s2d_index_map(k, a, b)
            for Pi, r, p in rows:
                for Qi, s, q in cols:
                    ph = 2 * r + s
                    # per-phase index Pi is relative to its own pad; shift
                    # into the union window
                    Pu = Pi - pad_r[0] + Pshift
                    Qu = Qi - pad_c[0] + Pshift
                    slots.append((Pu * Ku + Qu) * 4 + ph)
                    taps_all.append((p, q))
                    ocol.append(2 * a + b)
    ps = np.asarray([t[0] for t in taps_all])
    qs = np.asarray([t[1] for t in taps_all])
    slots = np.asarray(slots)
    ophase = np.asarray(ocol)
    taps = w[:, :, ps, qs]  # [Co,Ci,T]
    taps = jnp.transpose(taps, (2, 1, 0))  # [T,Ci,Co]
    out = out.at[
        slots[:, None], :, ophase[:, None] * co + np.arange(co)[None, :]
    ].set(jnp.transpose(taps, (0, 2, 1)))
    out = out.reshape(Ku, Ku, 4 * ci, 4 * co)
    return out, (Pshift, Ku - 1 - Pshift)


def conv_s2d_block_embedded(x: jnp.ndarray, p: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Same function as `conv_s2d_block` via ONE phase-embedded conv."""
    w, bias = p["w"], p["b"]
    co = w.shape[0]
    wk, pad = w_to_s2d_embedded(w)
    y = jax.lax.conv_general_dilated(
        x,
        wk.astype(x.dtype),
        window_strides=(1, 1),
        padding=[pad, pad],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    b4 = jnp.tile(bias, 4)
    y = y + b4.astype(x.dtype)
    return jnp.maximum(y, jnp.asarray(0.1, x.dtype) * y)
