"""Pure-functional math kernels for the DVS pixel model (JAX/jnp).

Each function is a direct, TPU-friendly counterpart of a reference kernel in
/root/reference/v2ecore/emulator_utils.py; see the per-function docstrings for
the file:line citations.
"""

from v2e_tpu.ops.core import (
    lin_log,
    rescale_intensity_frame,
    low_pass_filter,
    subtract_leak_current,
    compute_event_map,
    generate_shot_noise,
    refractory_filter,
)
from v2e_tpu.ops.noise import compute_photoreceptor_noise_voltage

__all__ = [
    "lin_log",
    "rescale_intensity_frame",
    "low_pass_filter",
    "subtract_leak_current",
    "compute_event_map",
    "generate_shot_noise",
    "refractory_filter",
    "compute_photoreceptor_noise_voltage",
]
