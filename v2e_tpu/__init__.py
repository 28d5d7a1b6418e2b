"""v2e_tpu — TPU-native DVS event-camera simulation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of SensorsINI/v2e
(reference: /root/reference): convert conventional intensity video into
realistic synthetic DVS event streams with fine timing resolution.

Key architectural differences from the reference (CUDA/torch) implementation:

* The stateful per-pixel DVS model runs as a pure functional step scanned with
  ``jax.lax.scan`` over a whole chunk of frames inside ONE compiled XLA
  program — no per-frame Python round trip and no data-dependent per-event
  hot loop (reference emulator.py:810-872). Event counts, refractory
  filtering and timestamps are computed in closed form on device.
* SuperSloMo optical-flow interpolation (reference slomo.py/model.py) is a
  functional JAX UNet pair fused with the emulator scan — interpolated frames
  never touch the host (the reference writes/reads PNG files between stages,
  slomo.py:436-444 → v2e.py:832).
* Events leave the device as dense per-pixel count maps and are materialized
  into AER ``[t, x, y, p]`` lists by a vectorized host kernel (numpy or C++).
* Scale-out uses ``jax.sharding.Mesh``: the pixel plane is sharded across
  chips for the emulator scan and SloMo batches are data-parallel.
"""

__version__ = "0.1.0"

from v2e_tpu.emulator.config import EmulatorConfig
from v2e_tpu.emulator.emulator import EventEmulator


def __getattr__(name):
    # heavier subsystems load lazily so `import v2e_tpu` stays cheap
    if name == "SuperSloMo":
        from v2e_tpu.models.slomo import SuperSloMo

        return SuperSloMo
    if name == "EventRenderer":
        from v2e_tpu.render.renderer import EventRenderer

        return EventRenderer
    if name == "ExposureMode":
        from v2e_tpu.render.renderer import ExposureMode

        return ExposureMode
    raise AttributeError(f"module 'v2e_tpu' has no attribute {name!r}")


__all__ = [
    "EmulatorConfig",
    "EventEmulator",
    "SuperSloMo",
    "EventRenderer",
    "ExposureMode",
    "__version__",
]
