"""Bilinear warp (grid_sample) as a Pallas TPU kernel.

Semantics match `v2e_tpu.models.backwarp.backwarp` (torch grid_sample,
align_corners=False, zero padding) for flows bounded by ``max_disp``; larger
displacements are clamped to the window edge.

Why a kernel: the natural XLA formulation is a 4-tap gather, which TPUs
execute at ~20 ns/element (measured ~70 ms per 40x256x320 warp on v5e —
the dominant cost of SuperSloMo interpolation).  Flow fields are smooth, so
each (BH, BW) output tile only reads a bounded input window around itself.
The kernel DMAs that window into VMEM and evaluates the bilinear sample as

    rows = R @ region          R: [BH*BW, RH] row-interpolation one-hots
    out  = sum(C * rows, -1)   C: [BH*BW, RW] column one-hots

i.e. one small MXU matmul plus a VPU weighted reduction per tile — dense
compute instead of scalar gathers.  The input is zero-padded by the window
margin up front, which also realizes the zero-padding boundary semantics.

Tuning (v5e, batch 160 of 256x320): the per-pixel MXU work is RH*RW MACs,
so the cost is the product of the row window (BH + 2M + 2, sublane-rounded)
and the column window (BW + 2M + 2, lane-rounded).  BH=8/BW=128 minimizes
both; matmul precision HIGH (bf16x3) halves the pass count vs HIGHEST with
~1e-6 abs error on 0-1-range pixels (the pipeline quantizes to 8-bit DN
levels downstream, reference PNG round-trip).  A tighter ``max_disp`` is
the biggest lever: M=16 fits the same lane window as BW alone.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# default output tile
BH = 8
BW = 128


def _warp_kernel_rowwise(
    img_hbm, u_ref, v_ref, out_ref, region, sem, *, M, RH, RW, bh, bw, prec
):
    """Layout-friendly variant: no tile flattening (Mosaic rejects
    (bh,bw)->(bh*bw,1) shape casts).

    Math per tile, keeping everything in native (sublane, lane) layout:
      B_i[c, j] = column one-hots of output row i       (RW, bw)
      T = region @ concat_i(B_i)                        (RH, bh*bw) one matmul
      out[i, j] = sum_r Aoh_i[r, j] * T[r, i*bw+j]      sublane reduction
    with Aoh_i the row one-hots (RH, bw) built by broadcasting the (1, bw)
    row coordinates against a (RH, bw) iota — no transposes, no reshapes.
    """
    n = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    r0 = ti * bh
    c0 = tj * bw
    dma = pltpu.make_async_copy(
        img_hbm.at[n, pl.ds(r0, RH), pl.ds(c0, RW)], region, sem
    )
    dma.start()

    u = u_ref[0]
    v = v_ref[0]
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0).astype(jnp.float32)
    cols_iota = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1).astype(jnp.float32)
    fM = jnp.float32(M)
    ly = jnp.clip(rows_iota + v - 0.5, -fM, jnp.float32(bh - 1) + fM) + jnp.float32(M + 1)
    lx = jnp.clip(cols_iota + u - 0.5, -fM, jnp.float32(bw - 1) + fM) + jnp.float32(M + 1)
    y0 = jnp.floor(ly)
    x0 = jnp.floor(lx)
    wy = ly - y0
    wx = lx - x0

    cidx = jax.lax.broadcasted_iota(jnp.int32, (RW, bw), 0).astype(jnp.float32)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (RH, bw), 0).astype(jnp.float32)

    b_blocks = []
    for i in range(bh):
        x0i = x0[i : i + 1, :]  # (1, bw) broadcasts over sublanes
        wxi = wx[i : i + 1, :]
        b_blocks.append(
            jnp.where(cidx == x0i, 1.0 - wxi, 0.0)
            + jnp.where(cidx == x0i + 1.0, wxi, 0.0)
        )
    B_all = jnp.concatenate(b_blocks, axis=1)  # (RW, bh*bw)

    dma.wait()
    if prec == "1pass":
        # Plain bf16 inputs, f32 accumulation: one MXU pass.  Error is
        # bf16 rounding of pixels AND weights (~2^-8 relative, ~4e-3 abs
        # on 0-1 pixels — the order of one 8-bit DN; the pipeline
        # quantizes to 8-bit levels downstream).  See --warp_precision.
        T = jnp.dot(
            region[:].astype(jnp.bfloat16),
            B_all.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    elif prec == "3pass":
        # Manual bf16x3: Mosaic lacks Precision.HIGH in-kernel. Error is
        # |Al @ Bl| ~ 2^-16 relative (~1e-5 abs on 0-1 pixels) at half
        # HIGHEST's MXU passes.
        reg = region[:]
        Ah = reg.astype(jnp.bfloat16)
        Al = (reg - Ah.astype(jnp.float32)).astype(jnp.bfloat16)
        Bh = B_all.astype(jnp.bfloat16)
        Bl = (B_all - Bh.astype(jnp.float32)).astype(jnp.bfloat16)
        dot = functools.partial(
            jnp.dot, preferred_element_type=jnp.float32
        )
        T = dot(Ah, Bh) + (dot(Ah, Bl) + dot(Al, Bh))
    else:
        T = jnp.dot(
            region[:], B_all,
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # (RH, bh*bw)

    out_rows = []
    for i in range(bh):
        y0i = y0[i : i + 1, :]
        wyi = wy[i : i + 1, :]
        Aoh = jnp.where(ridx == y0i, 1.0 - wyi, 0.0) + jnp.where(
            ridx == y0i + 1.0, wyi, 0.0
        )
        Ti = T[:, i * bw : (i + 1) * bw]  # (RH, bw) static lane slice
        out_rows.append(jnp.sum(Aoh * Ti, axis=0, keepdims=True))  # (1, bw)
    out_ref[0] = jnp.concatenate(out_rows, axis=0)  # (bh, bw)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def bilinear_warp_pallas(
    img: jnp.ndarray,
    flow: jnp.ndarray,
    max_disp: int = 32,
    interpret: bool = False,
    block_h: int = BH,
    block_w: int = BW,
    precision="3pass",
) -> jnp.ndarray:
    """Warp ``img`` by ``flow`` (sample at x+u-0.5, y+v-0.5, zeros padding).

    Args:
      img: [N, H, W] float32.
      flow: [N, 2, H, W] float32; displacement magnitudes beyond
        ``max_disp`` are clamped per axis.
      max_disp: static supported displacement window in pixels.
      block_h, block_w: output tile (sublane/lane multiples).
      precision: matmul precision. "3pass" (manual bf16x3, default) has
        ~1e-5 abs error on 0-1-range pixels; HIGHEST (bf16x6) ~f32-exact.

    Returns [N, H, W] float32.
    """
    N, H, W = img.shape
    M = int(max_disp)
    P = M + 1
    bh, bw = int(block_h), int(block_w)
    # region dims rounded up to the (8, 128) VMEM tiling so dynamic slices
    # stay aligned (DMA starts are tile-multiples by construction)
    RH = -(-(bh + 2 * M + 2) // 8) * 8
    RW = -(-(bw + 2 * M + 2) // 128) * 128
    # pad H, W to tile multiples, then enough margin that every tile's
    # region slice [r0, r0+RH) x [c0, c0+RW) is in bounds
    Ht = -(-H // bh) * bh
    Wt = -(-W // bw) * bw
    Hp = (Ht // bh - 1) * bh + RH
    Wp = (Wt // bw - 1) * bw + RW
    img_p = jnp.pad(img, ((0, 0), (P, Hp - H - P), (P, Wp - W - P)))
    u = jnp.pad(flow[:, 0], ((0, 0), (0, Ht - H), (0, Wt - W)))
    v = jnp.pad(flow[:, 1], ((0, 0), (0, Ht - H), (0, Wt - W)))

    kernel = functools.partial(
        _warp_kernel_rowwise, M=M, RH=RH, RW=RW, bh=bh, bw=bw, prec=precision
    )
    out = pl.pallas_call(
        kernel,
        grid=(N, Ht // bh, Wt // bw),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, bh, bw), lambda n, i, j: (n, i, j)),
            pl.BlockSpec((1, bh, bw), lambda n, i, j: (n, i, j)),
        ],
        out_specs=pl.BlockSpec((1, bh, bw), lambda n, i, j: (n, i, j)),
        out_shape=jax.ShapeDtypeStruct((N, Ht, Wt), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((RH, RW), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(img_p, u, v)
    return out[:, :H, :W]
