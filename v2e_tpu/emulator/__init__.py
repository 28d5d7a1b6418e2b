"""Stateful DVS pixel-model emulator, TPU-native.

The model itself is a pure function ``step(cfg, params, state, frame, t)``
scanned over a chunk of frames with ``jax.lax.scan`` inside a single jitted
XLA program (`v2e_tpu.emulator.core`).  Events are represented on-device as
dense per-pixel count maps and materialized into AER lists on the host
(`v2e_tpu.emulator.events`).  The `EventEmulator` class wraps this with the
reference-compatible ``generate_events(frame, t)`` API.
"""

from v2e_tpu.emulator.config import EmulatorConfig
from v2e_tpu.emulator.state import EmulatorParams, EmulatorState, init_state
from v2e_tpu.emulator.core import emulate_chunk
from v2e_tpu.emulator.events import materialize_events
from v2e_tpu.emulator.emulator import EventEmulator

__all__ = [
    "EmulatorConfig",
    "EmulatorParams",
    "EmulatorState",
    "init_state",
    "emulate_chunk",
    "materialize_events",
    "EventEmulator",
]
