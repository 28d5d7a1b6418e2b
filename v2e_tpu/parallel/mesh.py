"""Device mesh construction and sharded execution of the emulator scan.

Sharding layout:
  * frames [F, H, W]  -> P(None, 'spatial', None): the time axis is the
    scan axis (sequential), rows shard across chips.
  * per-pixel state/params [H, W] -> P('spatial', None).
  * scalars/keys replicated.

Under ``jit`` the per-step global reduction (max event count, which defines
the sub-frame timestamp grid, see emulator/core.py) becomes an all-reduce
over ICI; everything else is local.  The CSDVS diffuser's 3x3 convolution
gets its one-row halo exchange inserted by XLA/SPMD automatically.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from v2e_tpu.emulator.config import EmulatorConfig
from v2e_tpu.emulator.core import emulate_chunk
from v2e_tpu.emulator.state import EmulatorParams, EmulatorState


def make_mesh(
    n_devices: Optional[int] = None, axes: Tuple[str, str] = ("data", "spatial")
) -> Mesh:
    """Build a 2D (data, spatial) mesh over the available devices.

    With n devices the shape is (n // s, s) where s = largest power of two
    <= sqrt-ish split favoring spatial sharding for the emulator.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    s = 1
    while s * 2 <= n and (n // (s * 2)) * (s * 2) == n and s * 2 <= 4:
        s *= 2
    d = n // s
    dev_array = np.array(devices[: d * s]).reshape(d, s)
    return Mesh(dev_array, axes)


def _pixel_sharding(mesh: Mesh, arr: jnp.ndarray) -> NamedSharding:
    if arr.ndim >= 2:
        spec = P(*([None] * (arr.ndim - 2)), "spatial", None)
    else:
        spec = P()
    return NamedSharding(mesh, spec)


def shard_emulator_args(mesh: Mesh, params: EmulatorParams, state: EmulatorState,
                        frames: jnp.ndarray, times: jnp.ndarray):
    """Place emulator inputs on the mesh with row (H) sharding."""

    def place(x):
        if x is None:
            return None
        if x.ndim >= 2:
            return jax.device_put(x, _pixel_sharding(mesh, x))
        return jax.device_put(x, NamedSharding(mesh, P()))

    params = jax.tree_util.tree_map(place, params)
    state = jax.tree_util.tree_map(place, state)
    frames = jax.device_put(frames, NamedSharding(mesh, P(None, "spatial", None)))
    times = jax.device_put(times, NamedSharding(mesh, P()))
    return params, state, frames, times


def emulate_chunk_sharded(
    cfg: EmulatorConfig,
    mesh: Mesh,
    params: EmulatorParams,
    state: EmulatorState,
    frames: jnp.ndarray,
    times: jnp.ndarray,
):
    """Run the emulator chunk scan with the pixel plane sharded over the mesh."""
    import dataclasses

    # Pallas kernels don't SPMD-partition: use the XLA scan when sharded
    cfg = dataclasses.replace(cfg, use_pallas_scan=False)
    params, state, frames, times = shard_emulator_args(
        mesh, params, state, frames, times
    )
    return emulate_chunk(cfg, params, state, frames, times)
