"""Per-layer conv formulation shootout on the TPU.

For each lane-bound UNet layer class, measure:
  dense   — stride-1 NHWC conv as unet.py runs it today
  strided — width-packed stride-(1,P) conv (unet_wpack.py)
  blocked — block-aligned packing: input reshaped [N,H,W/P,P*Ci] (free),
            stride-1 conv with kernel (k, nb), P*Co output channels
  matmul  — MXU upper bound for the same M/N with dense-exact K

Warm 3x each, interleaved rounds, scalar-fetch sync (block_until_ready
returns early through the axon tunnel).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from v2e_tpu.models.unet_wpack import wpack_weight


def blocked_weight(w, P, nb):
    """OIHW [Co,Ci,k,k] -> HWIO [k, nb, P*Ci, P*Co] block-Toeplitz:
    Wb[ky, q, r*Ci+ci, d*Co+co] = w[co,ci,ky,kx] with kx = (q-1)*P + r - d
    + pad (block pad 1 on the left)."""
    co, ci, k, _ = w.shape
    pad = (k - 1) // 2
    hwio = np.transpose(np.asarray(w, np.float32), (2, 3, 1, 0))
    wb = np.zeros((k, nb, P, ci, P, co), np.float32)
    for q in range(nb):
        for r in range(P):
            for d in range(P):
                kx = (q - 1) * P + r - d + pad
                if 0 <= kx < k:
                    wb[:, q, r, :, d, :] = hwio[:, kx]
    return jnp.asarray(wb.reshape(k, nb, P * ci, P * co))


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    H, W = 288, 352
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"# device: {dev}, N={N}", file=sys.stderr)

    # (name, k, ci, co, P, spatial_scale)
    layers = [
        ("conv2_k7_32_32", 7, 32, 32, 4, 1),
        ("down1c2_k5_64_64", 5, 64, 64, 2, 2),
        ("up4c2_k3_128_64", 3, 128, 64, 2, 2),
        ("up5c2_k3_64_32", 3, 64, 32, 4, 1),
    ]

    for name, k, ci, co, P, ss in layers:
        h, w = H // ss, W // ss
        pad = (k - 1) // 2
        nb = 3 if k >= 5 else (3 if P == 2 and k == 3 else 3)
        # block window: cols [-pad, P-1+pad] -> blocks floor(-pad/P) ..
        # floor((P-1+pad)/P); nb blocks with left pad 1 covers k<=2P+... use
        # nb = 1 + floor((P-1+pad)/P) + 1 for symmetric block pad 1
        nb = 2 + (P - 1 + pad) // P
        x = jnp.asarray(rng.normal(size=(N, h, w, ci)).astype(np.float32), dt)
        wt = jnp.asarray(rng.normal(size=(co, ci, k, k)).astype(np.float32) * 0.1)

        hwio = jnp.transpose(wt, (2, 3, 1, 0)).astype(dt)
        wp = wpack_weight(wt, P).astype(dt)
        wb = blocked_weight(wt, P, nb).astype(dt)
        xb = x.reshape(N, h, w // P, P * ci)
        M = N * h * w // P
        Kmm = k * k * ci
        a_mm = jnp.asarray(rng.normal(size=(M, Kmm)).astype(np.float32), dt)
        b_mm = jnp.asarray(rng.normal(size=(Kmm, P * co)).astype(np.float32), dt)

        # NOTE: arrays must be ARGUMENTS of the jitted fns — closure
        # constants get serialized into the HLO and the remote compiler
        # rejects the multi-hundred-MB request (HTTP 413)
        def dense(v, k):
            return jnp.sum(jax.lax.conv_general_dilated(
                v, k, (1, 1), [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=dt))

        def strided(v, k):
            return jnp.sum(jax.lax.conv_general_dilated(
                v, k, (1, P), [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=dt))

        def blocked(v, k):
            return jnp.sum(jax.lax.conv_general_dilated(
                v, k, (1, 1), [(pad, pad), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=dt))

        def matmul(a, b):
            return jnp.sum(jnp.dot(a, b, preferred_element_type=dt))

        fns = {"dense": (jax.jit(dense), x, hwio),
               "blocked": (jax.jit(blocked), xb, wb),
               "matmul": (jax.jit(matmul), a_mm, b_mm)}
        if os.environ.get("V2E_BENCH_STRIDED"):
            fns["strided"] = (jax.jit(strided), x, wp)
        for kk, (f, a, b) in fns.items():
            t0 = time.perf_counter()
            float(f(a, b))
            print(f"# {name}/{kk}: compile+first {time.perf_counter()-t0:.1f}s",
                  file=sys.stderr, flush=True)
            for _ in range(3):
                float(f(a, b))
        times = {kk: [] for kk in fns}
        for r in range(3):
            for kk, (f, a, b) in fns.items():
                t0 = time.perf_counter()
                outs = [f(a, b) for _ in range(3)]
                for o in outs:
                    float(o)
                times[kk].append((time.perf_counter() - t0) / 3)
        gflop = 2 * M * P * k * k * ci * co / 1e9
        msg = " ".join(
            f"{kk}={np.median(v)*1e3:.1f}ms" for kk, v in times.items()
        )
        tfs = gflop / np.median(times["dense"]) / 1e3
        print(f"{name} (exact {gflop:.0f} GF, dense {tfs:.0f} TF/s): {msg}")


if __name__ == "__main__":
    main()
