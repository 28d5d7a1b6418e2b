"""Pallas TPU kernels for the hot ops XLA lowers poorly.

`warp` — bilinear image warping (grid_sample): XLA lowers the per-pixel
gather to ~20 ns/element scalar loads on TPU; the Pallas kernel rewrites it
as per-tile one-hot matmuls on the MXU (see warp.py).
"""

from v2e_tpu.ops.pallas.warp import bilinear_warp_pallas

__all__ = ["bilinear_warp_pallas"]
