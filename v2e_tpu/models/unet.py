"""SuperSloMo UNet as a pure functional JAX model.

Architecture (matching the reference's torch modules so the pretrained
checkpoint converts 1:1, /root/reference/v2ecore/model.py:10-226):

  conv1 7x7 (in->32), conv2 7x7 (32->32)              -> skip s1
  down{1..5}: avgpool2 + conv(k) + conv(k), k=5,3,3,3,3  (32->64->128->256->512->512)
  up{1..5}:   bilinear x2 + conv3 + concat(skip) + conv3 (512->512->256->128->64->32)
  conv3 3x3 (32->out), LeakyReLU(0.1) everywhere including the output

Public contract is NCHW with OIHW kernels (torch convention) so checkpoint
tensors drop in unchanged.  Internally the forward pass runs NHWC — the
TPU-native conv layout — with a single transpose at entry/exit: profiling
on v5e showed the NCHW formulation spent ~75% of its time in layout
copies, f32<->bf16 converts, and unfused where-based LeakyReLU passes, not
in the convolutions.  The epilogue (bias + LeakyReLU as max(y, 0.1y)) is a
single expression in the compute dtype so XLA fuses it into one pass, and
convs emit the compute dtype directly (MXU accumulation is f32 in hardware
regardless; preferred_element_type only picks the output dtype).
Parameters are a plain nested dict: ``params[layer] = {"w": ..., "b": ...}``.
"""
from __future__ import annotations

import functools
import math
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Dict[str, jnp.ndarray]]

# (layer name, in_ch, out_ch, kernel) for each conv in definition order.
# `base` scales every channel width (32 = the reference architecture);
# smaller bases keep the exact topology at tiny widths (multi-chip dryrun).
def unet_conv_specs(
    in_ch: int, out_ch: int, base: int = 32
) -> Sequence[Tuple[str, int, int, int]]:
    b = base
    specs = [
        ("conv1", in_ch, b, 7),
        ("conv2", b, b, 7),
    ]
    down_cfg = [(b, 2 * b, 5), (2 * b, 4 * b, 3), (4 * b, 8 * b, 3),
                (8 * b, 16 * b, 3), (16 * b, 16 * b, 3)]
    for i, (ci, co, k) in enumerate(down_cfg, 1):
        specs.append((f"down{i}.conv1", ci, co, k))
        specs.append((f"down{i}.conv2", co, co, k))
    up_cfg = [(16 * b, 16 * b), (16 * b, 8 * b), (8 * b, 4 * b),
              (4 * b, 2 * b), (2 * b, b)]
    for i, (ci, co) in enumerate(up_cfg, 1):
        specs.append((f"up{i}.conv1", ci, co, 3))
        specs.append((f"up{i}.conv2", 2 * co, co, 3))
    specs.append(("conv3", b, out_ch, 3))
    return specs


class UNetSpec:
    """Static description of one UNet (channel counts)."""

    def __init__(self, in_channels: int, out_channels: int, base: int = 32):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.base = base
        self.conv_specs = unet_conv_specs(in_channels, out_channels, base)


def init_unet(key: jax.Array, spec: UNetSpec, dtype=jnp.float32) -> Params:
    """Random init matching torch Conv2d defaults (uniform +-1/sqrt(fan_in))."""
    params: Params = {}
    keys = jax.random.split(key, len(spec.conv_specs))
    for k, (name, ci, co, ksz) in zip(keys, spec.conv_specs):
        fan_in = ci * ksz * ksz
        bound = 1.0 / math.sqrt(fan_in)
        kw, kb = jax.random.split(k)
        params[name] = {
            "w": jax.random.uniform(kw, (co, ci, ksz, ksz), dtype, -bound, bound),
            "b": jax.random.uniform(kb, (co,), dtype, -bound, bound),
        }
    return params


def init_unet_host(rng, spec: UNetSpec, dtype=jnp.float32) -> Params:
    """Numpy-drawn init (same +-1/sqrt(fan_in) uniform law as init_unet):
    no device programs, so it stays fast on oversubscribed CPU backends."""
    import numpy as np

    params: Params = {}
    for name, ci, co, ksz in spec.conv_specs:
        bound = 1.0 / math.sqrt(ci * ksz * ksz)
        params[name] = {
            "w": jnp.asarray(
                rng.uniform(-bound, bound, (co, ci, ksz, ksz)).astype(np.float32),
                dtype=dtype,
            ),
            "b": jnp.asarray(
                rng.uniform(-bound, bound, (co,)).astype(np.float32), dtype=dtype
            ),
        }
    return params


def _blocked_plan(k: int, ci: int, co: int, w_pixels: int, ks=(5, 7)) -> int:
    """Column-pack factor P for the lane-filling "blocked" conv form, or 1
    for the plain dense conv.

    Lane-bound layers (channels < the TPU's 128 vector lanes) waste most of
    each MXU pass; packing P adjacent output columns into the channel dim
    fills the lanes at a MAC overhead of nb*P/k (nb = blocked kernel width).
    Measured on v5e (CAMPAIGN.log round 4): the 7x7 32->32 full-res layer
    runs 61.5 ms dense vs 27.4 ms blocked per 96x288x352 forward — at the
    pure-matmul bound for the same output tile.  The overhead only pays for
    k >= 5 (k=3 has nb*P/k >= 2, cancelling the lane gain), so k=3 layers
    stay dense.
    """
    maxc = max(ci, co)
    if k not in ks or maxc > 64:
        return 1
    P = 4 if maxc <= 32 else 2
    return P if w_pixels % P == 0 else 1


@functools.lru_cache(maxsize=None)
def _blocked_indices(k: int, P: int):
    """Static gather indices building the block-Toeplitz kernel.

    Output-column block j covers input columns [j*P - pad, j*P + P-1 + pad];
    in block coordinates that is lb = ceil(pad/P) blocks to the left and
    rb = floor((P-1+pad)/P) to the right, so the blocked kernel spans
    nb = lb+rb+1 block columns and the conv pads (lb, rb) blocks — exactly
    the pixels dense 'same' padding would see (out-of-range taps are zeroed
    by the kernel structure below, not by the padding).
    """
    import numpy as np

    pad = (k - 1) // 2
    lb = -(-pad // P)
    rb = (P - 1 + pad) // P
    nb = lb + rb + 1
    q = np.arange(nb)[:, None, None]
    r = np.arange(P)[None, :, None]
    d = np.arange(P)[None, None, :]
    # tap column of blocked weight element [q, r (input col in block),
    # d (output col in block)] relative to the dense k-tap window
    kx = (q - lb) * P + r - d + pad
    valid = (kx >= 0) & (kx < k)
    kxc = np.clip(kx, 0, k - 1)
    return nb, lb, rb, kxc.ravel(), valid.ravel()


def _blocked_kernel(w: jnp.ndarray, P: int, dtype):
    """OIHW [Co,Ci,k,k] -> block-Toeplitz HWIO [k, nb, P*Ci, P*Co].

    Wb[ky, q, r*Ci+ci, d*Co+co] = w[co, ci, ky, (q-lb)*P + r - d + pad]
    (zero where the tap falls outside the dense kernel).  Runs inside jit —
    a static gather + select over the (tiny) weight tensor.
    """
    co, ci, k, _ = w.shape
    nb, lb, rb, kxc, valid = _blocked_indices(k, P)
    hwio = jnp.transpose(w, (2, 3, 1, 0)).astype(dtype)  # [k,k,Ci,Co]
    g = jnp.take(hwio, jnp.asarray(kxc), axis=1)  # [k, nb*P*P, Ci, Co]
    g = jnp.where(jnp.asarray(valid)[None, :, None, None], g, 0)
    g = g.reshape(k, nb, P, P, ci, co)  # [k, q, r, d, Ci, Co]
    g = jnp.transpose(g, (0, 1, 2, 4, 3, 5))  # [k, q, r, Ci, d, Co]
    return g.reshape(k, nb, P * ci, P * co), lb, rb


def _conv_block(
    x: jnp.ndarray, p: Dict[str, jnp.ndarray], conv_impl: str = "dense"
) -> jnp.ndarray:
    """NHWC conv + bias + LeakyReLU(0.1) as one fused epilogue.

    x: [N, H, W, Cin] in the compute dtype; returns same dtype.
    LeakyReLU is written max(y, 0.1*y) — equivalent for all finite y and,
    unlike the where-based form, reliably fused by XLA:TPU.

    conv_impl: "dense" runs the stride-1 NHWC conv as-is; "blocked" packs P
    adjacent columns into the channel dim for lane-bound k>=5 layers (see
    `_blocked_plan`) — identical math, ~2.2x faster on v5e for the 7x7
    full-res layers.
    """
    w = p["w"]
    co, ci, k = w.shape[0], w.shape[1], w.shape[-1]
    pad = (k - 1) // 2
    if conv_impl.startswith("blocked"):
        # "blocked" = default k set; "blocked7"/"blocked5"/"blocked57" etc.
        # restrict the form to those kernel sizes (measurement granularity)
        ks = tuple(int(c) for c in conv_impl[7:]) or (5, 7)
        P = _blocked_plan(k, ci, co, x.shape[2], ks)
    else:
        P = 1
    if P > 1:
        wb, lb, rb = _blocked_kernel(w, P, x.dtype)
        n, h, wd, _ = x.shape
        y = jax.lax.conv_general_dilated(
            x.reshape(n, h, wd // P, P * ci),  # free: W,C are trailing dims
            wb,
            window_strides=(1, 1),
            padding=[(pad, pad), (lb, rb)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype,
        )
        y = y.reshape(n, h, wd, co)
    else:
        y = jax.lax.conv_general_dilated(
            x,
            jnp.transpose(w, (2, 3, 1, 0)).astype(x.dtype),  # OIHW -> HWIO
            window_strides=(1, 1),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype,
        )
    y = y + p["b"].astype(x.dtype)
    return jnp.maximum(y, jnp.asarray(0.1, x.dtype) * y)


def _lrelu(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(x, jnp.asarray(0.1, x.dtype) * x)


# Lane-conv eligibility: XLA's dense conv puts Co on the MXU lanes, so
# k=3 layers with Co below this threshold waste >=50% of every pass; the
# scatter-matmul Pallas kernel (ops/pallas/conv3.py) reorders the taps
# onto the lane/contraction dims instead.  Applied to the up-tail by the
# "packedz" form (see unet_apply_nhwc).
_LANE3_MAX_CO = 64


def _conv_block3_lane(x: jnp.ndarray, p: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Lane-filling 3x3 conv + bias + LeakyReLU where it pays; dense
    fallback for ineligible shapes (k != 3, lane-full Co, VMEM overflow)."""
    from v2e_tpu.ops.pallas.conv3 import conv3x3_lane, conv3x3_lane_supported

    w = p["w"]
    co, k = w.shape[0], w.shape[-1]
    if (
        k == 3
        and co <= _LANE3_MAX_CO
        and conv3x3_lane_supported(x.shape, co, itemsize=x.dtype.itemsize)
    ):
        return conv3x3_lane(
            x, w, p["b"], interpret=jax.default_backend() != "tpu"
        )
    return _conv_block(x, p)


def _conv_block_pk(xp: jnp.ndarray, p: Dict[str, jnp.ndarray], P: int) -> jnp.ndarray:
    """Blocked conv + bias + LeakyReLU on an ALREADY-PACKED input.

    xp: [N, H, W/P, P*Ci] — P adjacent columns folded into the channel dim
    (lane layout col_in_block*Ci + ci, i.e. a plain reshape of NHWC).
    Returns [N, H, W/P, P*Co] in the same packed layout, so consecutive
    packed layers chain with NO reshapes in between — the round-4 per-layer
    blocked form repacked at every layer boundary and lost its isolated-layer
    win to XLA layout conversions (benchmarks/README.md dead-ends table);
    this form keeps the packed layout resident across the pair.
    """
    w = p["w"]
    k = w.shape[-1]
    pad = (k - 1) // 2
    wb, lb, rb = _blocked_kernel(w, P, xp.dtype)
    y = jax.lax.conv_general_dilated(
        xp, wb,
        window_strides=(1, 1),
        padding=[(pad, pad), (lb, rb)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=xp.dtype,
    )
    y = y + jnp.tile(p["b"], P).astype(xp.dtype)
    return jnp.maximum(y, jnp.asarray(0.1, xp.dtype) * y)


def _pool2_packed(xp: jnp.ndarray, P: int) -> jnp.ndarray:
    """2x2 average pool directly in the packed layout.

    [N, H, W/P, P*C] -> [N, H/2, W/P, (P/2)*C]: output column block wb at
    half resolution covers the same pixels as input block wb, so the block
    grid is unchanged and the pack factor halves — pooling never leaves the
    packed layout (P must be even).
    """
    n, h, wb, pc = xp.shape
    c = pc // P
    x = xp.reshape(n, h // 2, 2, wb, P // 2, 2, c)
    s = x[:, :, 0] + x[:, :, 1]
    s = s[..., 0, :] + s[..., 1, :]
    return (s * jnp.asarray(0.25, xp.dtype)).reshape(n, h // 2, wb, (P // 2) * c)


def _avg_pool2_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    # reshape-mean, not lax.reduce_window: identical values, and
    # reduce_window's reverse-mode rule fails under shard_map (the sharded
    # train step linearizes this op — parallel/dryrun.py)
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    s = (x[:, :, 0] + x[:, :, 1])
    s = s[:, :, :, 0] + s[:, :, :, 1]
    return s * jnp.asarray(0.25, x.dtype)


def _upsample2_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear x2 with half-pixel centers (torch align_corners=False)."""
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, 2 * h, 2 * w, c), method="bilinear")


# --- Folded upsample+conv ("fold" forms) -----------------------------------
#
# bilinear x2 (half-pixel, edge-clamped) followed by a 3x3 'same' conv is a
# LINEAR map from the half-res input, so the pair collapses into ONE half-res
# 3x3 conv whose 4 output phases (r, c in {0,1}^2 = full-res row/col parity)
# stack on the output-channel axis.  Both phases of a parity read the SAME
# 3-tap half-res window (up[2H+r+dy] for dy in {-1,0,1} touches exactly
# x[H-1..H+1] for r in {0,1}), so one VALID conv over an edge-padded input
# produces every phase.  This is the up-tail fix the per-op attribution
# asked for (benchmarks/README.md): Co=32 dense convs run at <=25% MXU lane
# occupancy, while the folded conv has 4*Co output channels AND skips the
# upsampled tensor's HBM round trip entirely.
#
# _UPFOLD_A[r][i][d] = coefficient of half-res tap x[H+i-1] contributed by
# dense kernel tap w[d] at output parity r, from
#   up[2h]   = 0.25 x[h-1] + 0.75 x[h]
#   up[2h+1] = 0.75 x[h]   + 0.25 x[h+1].
_UPFOLD_A = (
    ((0.75, 0.25, 0.0), (0.25, 0.75, 0.75), (0.0, 0.0, 0.25)),  # r = 0
    ((0.25, 0.0, 0.0), (0.75, 0.75, 0.25), (0.0, 0.25, 0.75)),  # r = 1
)


def _upfold_kernel(w: jnp.ndarray, dtype) -> jnp.ndarray:
    """OIHW [Co,Ci,3,3] -> folded half-res HWIO kernel [3,3,Ci,4*Co].

    Output channel order is (r, c, co) — matching the [.., 2, 2, Co] phase
    reshape of the conv result.  Fold weights combine in float32 (exact
    0.25/0.75 factors) and cast to the compute dtype once.
    """
    a = jnp.asarray(_UPFOLD_A, jnp.float32)  # [2, 3(tap i), 3(dense d)]
    wf = jnp.einsum(
        "rad,sbe,oide->rsoiab", a, a, w.astype(jnp.float32)
    )  # [r, c, Co, Ci, 3, 3]
    rc, co, ci = 4, w.shape[0], w.shape[1]
    wf = wf.reshape(rc * co, ci, 3, 3)
    return jnp.transpose(wf, (2, 3, 1, 0)).astype(dtype)  # HWIO [3,3,Ci,4Co]


def _upconv_fold_block(x: jnp.ndarray, p: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """`_conv_block(_upsample2_nhwc(x), p)` as ONE half-res conv (k=3 only).

    x: [N, Hh, Wh, Ci] half-res; returns [N, 2*Hh, 2*Wh, Co] — identical
    math to upsample-then-conv up to float reassociation (pinned by
    tests/test_unet_fold.py).

    Edge handling composes two different paddings: the bilinear CLAMPS at
    the half-res border (handled exactly by edge-padding x, because the
    bilinear tap weights sum to 1), while the conv ZERO-pads beyond the
    full-res extent.  The folded conv over the edge-padded input therefore
    over-counts exactly the conv taps that fall outside [0, 2Hh) x [0, 2Wh)
    — a 1-pixel output ring — and those spurious contributions are
    subtracted with four tiny 1-D convs (plus inclusion-exclusion add-backs
    at the corners, where row and column corrections overlap), all applied
    pre-activation in phase space.
    """
    w, b = p["w"], p["b"]
    n, hh, wh, ci = x.shape
    co = w.shape[0]
    wf = _upfold_kernel(w, x.dtype)
    xe = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    z = jax.lax.conv_general_dilated(
        xe, wf,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    ).reshape(n, hh, wh, 2, 2, co)

    wc = w.astype(x.dtype)

    def _row_corr(row, wrow):
        # row: [N, 1, Wh, Ci] half-res border row; wrow: [Co, Ci, 3] — the
        # dense-kernel H-tap that lands on the spurious out-of-range up row.
        # That row equals the border row W-upsampled (all H clamps collapse),
        # and its own out-of-range columns equal its corner pixels (edge pad).
        up = jax.image.resize(row, (n, 1, 2 * wh, ci), method="bilinear")
        up = jnp.pad(up, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge")
        k = jnp.transpose(wrow, (2, 1, 0))[None].astype(x.dtype)  # [1,3,Ci,Co]
        c = jax.lax.conv_general_dilated(
            up, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype,
        )  # [N, 1, 2Wh, Co]
        return c.reshape(n, wh, 2, co)

    def _col_corr(col, wcol):
        up = jax.image.resize(col, (n, 2 * hh, 1, ci), method="bilinear")
        up = jnp.pad(up, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="edge")
        k = jnp.transpose(wcol, (2, 1, 0))[:, None].astype(x.dtype)  # [3,1,Ci,Co]
        c = jax.lax.conv_general_dilated(
            up, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype,
        )  # [N, 2Hh, 1, Co]
        return c.reshape(n, hh, 2, co)

    # full-res row 0 is parity r=0 at H=0; row 2Hh-1 is r=1 at H=Hh-1
    z = z.at[:, 0, :, 0].add(-_row_corr(x[:, :1], w[:, :, 0, :]))
    z = z.at[:, -1, :, 1].add(-_row_corr(x[:, -1:], w[:, :, 2, :]))
    z = z.at[:, :, 0, :, 0].add(-_col_corr(x[:, :, :1], w[:, :, :, 0]))
    z = z.at[:, :, -1, :, 1].add(-_col_corr(x[:, :, -1:], w[:, :, :, 2]))
    # corners: the (out-of-range row AND column) tap was subtracted twice
    for hi, wi, r, c, dy, dx in (
        (0, 0, 0, 0, 0, 0), (0, -1, 0, 1, 0, 2),
        (-1, 0, 1, 0, 2, 0), (-1, -1, 1, 1, 2, 2),
    ):
        term = x[:, hi, wi, :] @ jnp.transpose(wc[:, :, dy, dx])  # [N, Co]
        z = z.at[:, hi, wi, r, c].add(term)

    z = z + b.astype(x.dtype)
    z = jnp.maximum(z, jnp.asarray(0.1, x.dtype) * z)
    return jnp.transpose(z, (0, 1, 3, 2, 4, 5)).reshape(n, 2 * hh, 2 * wh, co)


def unet_apply_nhwc(
    params: Params, x: jnp.ndarray, conv_impl: str = "dense"
) -> jnp.ndarray:
    """Forward pass on NHWC input [N, H, W, in_ch] (H, W multiples of 32),
    entirely in x.dtype.  Returns [N, H, W, out_ch] in x.dtype.

    conv_impl "packed" runs the two leading lane-bound conv pairs (conv1/2
    at 7x7 and down1.conv1/2 at 5x5 — together ~1/3 of the UNet's FLOPs at
    the worst MXU lane utilization) in a RESIDENT packed layout: pack once
    at entry, chain both convs of each pair packed, pool in packed space,
    and unpack only at the two skip taps.  Everything from down2 on (>=128
    channels, lane-full) runs dense.
    """
    # fold forms take an optional level suffix: "fold45"/"packedfold45"
    # folds only up4+up5 (the lane-bound tail); no suffix folds every up.
    def _fold_levels(impl: str, prefix: str):
        suffix = impl[len(prefix):]
        return frozenset(int(c) for c in suffix) if suffix else frozenset(range(1, 6))

    if (
        (
            conv_impl in ("packed", "packedup", "packedz")
            or conv_impl.startswith("packedfold")
        )
        and x.shape[2] % 4 == 0
        and x.shape[1] % 4 == 0
    ):
        return _unet_apply_nhwc_packed(
            params, x,
            up=conv_impl == "packedup",
            lane3=conv_impl == "packedz",
            fold=_fold_levels(conv_impl, "packedfold")
            if conv_impl.startswith("packedfold") else frozenset(),
        )
    fold = (
        _fold_levels(conv_impl, "fold")
        if conv_impl.startswith("fold") else frozenset()
    )
    cb = functools.partial(
        _conv_block, conv_impl="dense" if fold else conv_impl
    )
    x = cb(x, params["conv1"])
    s1 = cb(x, params["conv2"])
    skips = [s1]
    x = s1
    for i in range(1, 6):
        x = _avg_pool2_nhwc(x)
        x = cb(x, params[f"down{i}.conv1"])
        x = cb(x, params[f"down{i}.conv2"])
        if i < 5:
            skips.append(x)
    # skips = [s1, s2, s3, s4, s5]; bottleneck x pairs with s5 first
    for i in range(1, 6):
        skip = skips[5 - i]
        if i in fold:
            x = _upconv_fold_block(x, params[f"up{i}.conv1"])
        else:
            x = cb(_upsample2_nhwc(x), params[f"up{i}.conv1"])
        x = cb(jnp.concatenate([x, skip], axis=-1), params[f"up{i}.conv2"])
    return cb(x, params["conv3"])


def _cat_packed(ap: jnp.ndarray, bp: jnp.ndarray, P: int) -> jnp.ndarray:
    """Channel-concat two packed tensors without leaving the packed layout:
    interleave per column slot so the result is pack(concat(a, b))."""
    n, h, wb, pca = ap.shape
    ca, cb = pca // P, bp.shape[-1] // P
    out = jnp.concatenate(
        [ap.reshape(n, h, wb, P, ca), bp.reshape(n, h, wb, P, cb)], axis=-1
    )
    return out.reshape(n, h, wb, P * (ca + cb))


def _unet_apply_nhwc_packed(
    params: Params,
    x: jnp.ndarray,
    up: bool = False,
    lane3: bool = False,
    fold: frozenset = frozenset(),
) -> jnp.ndarray:
    """Packed-resident forward: see unet_apply_nhwc(conv_impl="packed").

    up=True additionally runs the lane-bound up-path pairs (up4 at P=2,
    up5 + conv3 at P=4) packed, concatenating with the skip taps directly
    in packed space (the down-path skips are kept packed for it).

    lane3=True ("packedz") instead runs the lane-bound k=3 up-tail layers
    (Co in [32, 64]: the up4/up5 conv pairs) through the scatter-matmul
    Pallas kernel (ops/pallas/conv3.py) — exact dense-conv MACs at full
    lane occupancy; per-stage attribution had these at 13-28% of bf16
    peak under XLA's dense lowering while the >=128-channel mid-levels
    were already at 79-100% (scripts/bench_unet_stages.py).  MEASURED
    SLOWER than dense on v5e (Mosaic tap-accumulation costs; see the
    kernel docstring) — an opt-in measurement baseline, not the default.

    fold=True ("packedfold") collapses every up-path bilinear+conv1 pair
    into one half-res phase conv (`_upconv_fold_block`) — the up-tail fix
    that actually measured faster.
    """
    n, h, w, cin = x.shape
    xp = x.reshape(n, h, w // 4, 4 * cin)
    xp = _conv_block_pk(xp, params["conv1"], 4)
    s1p = _conv_block_pk(xp, params["conv2"], 4)
    xp = _pool2_packed(s1p, 4)  # half-res, P=2
    xp = _conv_block_pk(xp, params["down1.conv1"], 2)
    s2p = _conv_block_pk(xp, params["down1.conv2"], 2)
    x = _pool2_packed(s2p, 2)  # quarter-res, unpacked
    skips = [None, None]  # s1/s2 consumed packed (up) or unpacked below
    if not up:
        skips = [s1p.reshape(n, h, w, -1), s2p.reshape(n, h // 2, w // 2, -1)]
    for i in range(2, 6):
        x = _conv_block(x, params[f"down{i}.conv1"])
        x = _conv_block(x, params[f"down{i}.conv2"])
        if i < 5:
            skips.append(x)
            x = _avg_pool2_nhwc(x)
    cb3 = _conv_block3_lane if lane3 else _conv_block
    for i in range(1, 4 if up else 6):
        skip = skips[5 - i]
        if i in fold:
            x = _upconv_fold_block(x, params[f"up{i}.conv1"])
        else:
            x = cb3(_upsample2_nhwc(x), params[f"up{i}.conv1"])
        x = cb3(jnp.concatenate([x, skip], axis=-1), params[f"up{i}.conv2"])
    if not up:
        return cb3(x, params["conv3"])
    # up4 at P=2, packed concat with s2p
    xp = _upsample2_nhwc(x).reshape(n, h // 2, w // 4, -1)
    xp = _conv_block_pk(xp, params["up4.conv1"], 2)
    xp = _conv_block_pk(_cat_packed(xp, s2p, 2), params["up4.conv2"], 2)
    # up5 + conv3 at P=4, packed concat with s1p (upsample runs unpacked:
    # bilinear mixes adjacent columns across block boundaries)
    x = xp.reshape(n, h // 2, w // 2, -1)
    xp = _upsample2_nhwc(x).reshape(n, h, w // 4, -1)
    xp = _conv_block_pk(xp, params["up5.conv1"], 4)
    xp = _conv_block_pk(_cat_packed(xp, s1p, 4), params["up5.conv2"], 4)
    xp = _conv_block_pk(xp, params["conv3"], 4)
    cout = params["conv3"]["w"].shape[0]
    return xp.reshape(n, h, w // 4, 4, cout).reshape(n, h, w, cout)


def unet_apply_io_nhwc(
    params: Params, x: jnp.ndarray, compute_dtype=None, conv_impl: str = "dense"
) -> jnp.ndarray:
    """Forward pass with NHWC input AND output — no layout transposes.

    x: [N, H, W, in_ch]; returns [N, H, W, out_ch] in x.dtype.  Used by the
    planar interpolation chain (models/slomo.py) where every tensor lives
    in [N, H, W(, C)] layout end to end.
    """
    in_dtype = x.dtype
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    return unet_apply_nhwc(params, x, conv_impl).astype(in_dtype)


def unet_apply(
    params: Params, x: jnp.ndarray, compute_dtype=None, conv_impl: str = "dense"
) -> jnp.ndarray:
    """Forward pass. x: [N, in_ch, H, W] with H, W multiples of 32.

    compute_dtype: run convs/activations in this dtype (e.g. bfloat16 — the
    MXU-native precision on TPU; the MXU still accumulates float32
    internally).  Output is cast back to the input dtype.

    conv_impl: "dense" | "blocked" — see `_conv_block`.
    """
    in_dtype = x.dtype
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC once
    out = unet_apply_nhwc(params, x, conv_impl)
    out = jnp.transpose(out, (0, 3, 1, 2))  # back to NCHW
    return out.astype(in_dtype)
