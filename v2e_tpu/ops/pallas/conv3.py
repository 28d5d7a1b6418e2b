"""Lane-filling 3x3 'same' conv for narrow-channel layers (Pallas TPU).

Why: XLA's dense conv lowering puts the OUTPUT channels on the MXU lane
dimension, so a 3x3 conv with Co <= 64 runs at <= 50% lane occupancy no
matter how large the image is.  Per-stage attribution of the SuperSloMo
interp UNet on v5e (scripts/bench_unet_stages.py, round 5) put the
lane-bound up-tail at the bottom of the utilization table while the
>=128-channel mid-levels already ran at 79-100% of bf16 peak:

    up4 (128->64, 64px)    8.7 ms   ~56 TF/s  (28% peak)
    up5 ( 64->32, 256px)  19.1 ms   ~25 TF/s  (13% peak)

This kernel reorders the conv's contraction so the taps land on the MXU
lane/contraction dims instead of wasting them:

    hcol:  z[r, c, kx*Co+o] = sum_{ky,i} xpad[r+ky, c, i] * w[o,i,ky,kx]
           y[r, c, o]       = sum_{kx} z[r, c+kx, kx*Co+o]
           matmul [M, 3*Ci] @ [3*Ci, 3*Co]
    zfull: z[r, c, t*Co+o]  = sum_{i} xpad[r, c, i] * w[o,i,ty(t),tx(t)]
           y[r, c, o]       = sum_{ky,kx} z[r+ky, c+kx, (ky*3+kx)*Co+o]
           matmul [M, Ci] @ [Ci, 9*Co]

Both forms issue EXACTLY the dense conv's MACs (no block-Toeplitz
redundancy, unlike the packed/blocked forms in models/unet.py) and keep
the z intermediate in VMEM — materialized in HBM it would be 4.5-9x the
activation and the scheme would lose to bandwidth.  The shifted-tap
accumulation, bias and LeakyReLU run on the VPU in the same program, so
HBM traffic is one read of x plus one write of y (optimal).  `mode="auto"`
picks the form with the higher MXU occupancy product
K/ceil128(K) * N/ceil128(N): hcol for Ci=64/Co=32 (0.56 vs 0.38), zfull
for Ci=128/Co=64 (0.90 vs 0.75).

Grid: (N, H/th) row strips over the batch; each program reads its strip
plus one clamped halo row from each neighbor (masked to zero at the image
border — 'same' zero padding) and pads W in VMEM.  Strips keep every
buffer a few MB for the UNet shapes this targets (346x260-class video);
if the estimated VMEM footprint exceeds the budget the caller should fall
back to the dense conv (see `conv3x3_lane_supported`).

MEASURED OUTCOME (v5e, round 5): correct but SLOWER than XLA's dense
lowering — up5-shape 27.8 ms/conv vs ~9.5 dense, up4-shape 12.2 vs ~4.4.
The MXU-occupancy win is real, but every legal tap-accumulation scheme
pays more than it saves: lane-offset slices lower to VPU lane rotates
over the (taps*Co-wide, 128-padded) z; the two alternatives that would
avoid them are Mosaic-unsupported (see the in-kernel comment), and
folding taps back into the contraction is plain im2col (N=Co, the lane
waste this kernel exists to fix).  XLA's dense conv accumulates taps
inside the MXU, which for k=3 / Co<=64 sits closer to the Pareto
frontier than any reformulation tried.  Kept as an opt-in measurement
baseline (`--unet_conv packedz`); the default conv form stays "packed".
Full numbers: benchmarks/README.md "Measured dead ends".

Reference behavior matched: torch Conv2d(k=3, stride=1, padding=1) as
used by the reference UNet blocks (/root/reference/v2ecore/model.py:10-60).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _occupancy(k: int, n: int) -> float:
    """MXU occupancy product for a [., K] @ [K, N] matmul."""
    ceil = lambda v: -(-v // 128) * 128
    return (k / ceil(k)) * (n / ceil(n))


def pick_mode(ci: int, co: int) -> str:
    return "hcol" if _occupancy(3 * ci, 3 * co) > _occupancy(ci, 9 * co) else "zfull"


def _padl(c: int) -> int:
    """Lanes Mosaic actually allocates: the last dim pads to 128."""
    return -(-c // 128) * 128


def _vmem_bytes(th: int, W: int, ci: int, co: int, mode: str, isize: int) -> int:
    """Per-program VMEM footprint with Mosaic's 128-lane padding.

    Every vector's last dim is padded to a multiple of 128 lanes, so a
    Co=5 output costs 128 lanes of f32 per temp — the naive (unpadded)
    estimate was off 25x there and the first TPU compile hit the 16 MB
    scoped-vmem limit.  Terms: double-buffered in/out blocks (the Pallas
    pipeline prefetches the next block), the concat-built halo tile and
    (hcol) column tile plus one copy each, the matmul output z, ~3 live
    f32 accumulation temps, and the pre-store y."""
    Wp = W + 2
    taps = 3 if mode == "hcol" else 9
    rows_z = (th * Wp if mode == "hcol" else (th + 2) * Wp) + 2
    b = 2 * th * W * _padl(ci) * isize        # x strip block (dbl-buffered)
    b += 2 * th * W * _padl(co) * isize       # out block (dbl-buffered)
    b += 2 * (th + 2) * Wp * _padl(ci) * isize  # xt + concat copy
    if mode == "hcol":
        b += 2 * th * Wp * _padl(3 * ci) * isize  # xcol + reshape copy
    b += rows_z * _padl(taps * co) * 4        # z
    b += 3 * th * Wp * _padl(co) * 4          # acc slice temps
    b += th * Wp * _padl(co) * 4              # y before the store cast
    return b


# Lane-padding also bounds which layers the kernel can HELP: below 32
# output channels >=75% of every vector op and the out-block DMA is
# padding waste, and the first compile of a Co=5 layer OOM'd scoped vmem.
_MIN_CO = 32


def choose_th(H: int, W: int, ci: int, co: int, mode: str,
              isize: int = 2, budget: int = 10 * 2**20) -> Optional[int]:
    """Largest strip height in {32, 16, 8, 4} dividing H that fits the
    VMEM budget, or None (caller falls back to the dense conv)."""
    for th in (32, 16, 8, 4):
        if H % th == 0 and _vmem_bytes(th, W, ci, co, mode, isize) <= budget:
            return th
    return None


def conv3x3_lane_supported(
    x_shape, co: int, mode: str = "auto", itemsize: int = 2
) -> bool:
    n, H, W, ci = x_shape
    if co < _MIN_CO:
        return False
    if mode == "auto":
        mode = pick_mode(ci, co)
    return choose_th(H, W, ci, co, mode, itemsize) is not None


def _kernel(xt_ref, xa_ref, xb_ref, w_ref, b_ref, o_ref, *,
            th: int, W: int, ci: int, co: int, mode: str,
            neg_slope: float, nbh: int):
    i = pl.program_id(1)
    dt = xa_ref.dtype
    # halo rows, zeroed at the image border ('same' padding)
    top = xt_ref[0] * (i > 0).astype(dt)
    bot = xb_ref[0] * (i < nbh - 1).astype(dt)
    xt = jnp.concatenate([top, xa_ref[0], bot], axis=0)  # [th+2, W, Ci]
    zc = jnp.zeros((th + 2, 1, ci), dt)
    xt = jnp.concatenate([zc, xt, zc], axis=1)  # [th+2, W+2, Ci]
    # The tap accumulation works on the FLATTENED [M, taps*Co] matmul
    # output: tap t's contribution to output row m lives at z row m +
    # rowshift(t), columns [t*Co, (t+1)*Co).  Junk rows (padded columns
    # c >= W and the z-row overhang) never feed a kept output: they are
    # sliced away after the final reshape.
    #
    # Mosaic constraints mapped while tuning this (round 5, see
    # benchmarks/README.md dead-ends):
    #  * z.reshape(..., taps, Co) — lane-dim split — fails
    #    infer-vector-layout;
    #  * folding the taps with a second matmul against a 0/1 selection
    #    matrix needs a row-shifted window concat on the lane dim, which
    #    fails with "result/input offset mismatch on non-concat
    #    dimension" (the three shifted slices carry different sublane
    #    offsets);
    #  * what remains — lane-dim slices at Co offsets — compiles and is
    #    exact, but lowers to lane rotates that dominate the runtime:
    #    measured 27.8 ms/conv (up5) and 12.2 ms/conv (up4) vs 9.5/4.4
    #    dense.  The kernel is kept as a measurement baseline and for
    #    re-evaluation on future TPU generations / Mosaic releases, NOT
    #    as the default (auto conv form stays "packed").
    Mo = th * (W + 2)
    if mode == "hcol":
        xcol = jnp.concatenate(
            [xt[0:th], xt[1 : th + 1], xt[2 : th + 2]], axis=-1
        )  # [th, W+2, 3Ci]
        z = jnp.dot(
            xcol.reshape(Mo, 3 * ci),
            w_ref[...],
            preferred_element_type=jnp.float32,
        )  # [Mo, 3Co]
        z = jnp.concatenate([z, jnp.zeros((2, 3 * co), jnp.float32)], axis=0)
        acc = (
            z[0:Mo, 0:co]
            + z[1 : Mo + 1, co : 2 * co]
            + z[2 : Mo + 2, 2 * co : 3 * co]
        )
    else:
        z = jnp.dot(
            xt.reshape((th + 2) * (W + 2), ci),
            w_ref[...],
            preferred_element_type=jnp.float32,
        )  # [(th+2)*(W+2), 9Co]
        z = jnp.concatenate([z, jnp.zeros((2, 9 * co), jnp.float32)], axis=0)
        acc = z[0:Mo, 0:co]
        for t in range(1, 9):
            ky, kx = divmod(t, 3)
            s = ky * (W + 2) + kx
            acc = acc + z[s : s + Mo, t * co : (t + 1) * co]
    y = acc.reshape(th, W + 2, co)[:, 0:W, :] + b_ref[...]
    if neg_slope is not None:
        y = jnp.maximum(y, jnp.float32(neg_slope) * y)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("mode", "neg_slope", "th", "interpret")
)
def conv3x3_lane(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    *,
    mode: str = "auto",
    neg_slope: Optional[float] = 0.1,
    th: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """3x3 stride-1 'same' conv + bias (+ LeakyReLU) on NHWC input.

    x: [N, H, W, Ci] (bf16/f32); w: OIHW [Co, Ci, 3, 3]; b: [Co].
    neg_slope None skips the activation.  Matches
    models/unet._conv_block(conv_impl="dense") to f32-accumulation
    reordering (both accumulate in f32; this form splits the contraction
    per tap).  Raises if no strip height fits VMEM — gate callers with
    `conv3x3_lane_supported`.
    """
    n, H, W, ci = x.shape
    co = w.shape[0]
    if mode == "auto":
        mode = pick_mode(ci, co)
    if th is None:
        th = choose_th(H, W, ci, co, mode, x.dtype.itemsize)
        if th is None:
            raise ValueError(
                f"conv3x3_lane: no strip fits VMEM for {x.shape}->{co}"
            )
    nbh = H // th
    if mode == "hcol":
        wl = jnp.transpose(w, (2, 1, 3, 0)).reshape(3 * ci, 3 * co)
    else:
        wl = jnp.transpose(w, (1, 2, 3, 0)).reshape(ci, 9 * co)
    wl = wl.astype(x.dtype)
    bf = b.astype(jnp.float32).reshape(1, co)

    kern = functools.partial(
        _kernel, th=th, W=W, ci=ci, co=co, mode=mode,
        neg_slope=neg_slope, nbh=nbh,
    )
    return pl.pallas_call(
        kern,
        grid=(n, nbh),
        in_specs=[
            # top halo row (i*th - 1, clamped; masked in-kernel at i=0)
            pl.BlockSpec(
                (1, 1, W, ci),
                lambda nn, ii: (nn, jnp.maximum(ii * th - 1, 0), 0, 0),
            ),
            # the strip itself
            pl.BlockSpec((1, th, W, ci), lambda nn, ii: (nn, ii, 0, 0)),
            # bottom halo row (i*th + th, clamped; masked at i=nbh-1)
            pl.BlockSpec(
                (1, 1, W, ci),
                lambda nn, ii: (nn, jnp.minimum(ii * th + th, H - 1), 0, 0),
            ),
            pl.BlockSpec(wl.shape, lambda nn, ii: (0, 0)),
            pl.BlockSpec((1, co), lambda nn, ii: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, W, co), lambda nn, ii: (nn, ii, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, H, W, co), x.dtype),
        interpret=interpret,
    )(x, x, x, wl, bf)
