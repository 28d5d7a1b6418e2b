"""Synthetic input plugin framework.

Analytically-defined stimuli used both as demo inputs and as the test
oracle for the emulator (known contrast/speed → predictable event counts).
Mirrors the plugin protocol of the reference
(/root/reference/v2ecore/base_synthetic_input.py): subclass
`base_synthetic_input`, override ``next_frame()``/``total_frames()``; the
CLI loads the class dynamically by module path.

Generators are vectorized numpy — the reference's per-pixel Numba fill
loops (scripts/moving_dot.py:25-54, particles.py:213-240) become patch
broadcasts.
"""

from v2e_tpu.synthetic.base import base_synthetic_input
from v2e_tpu.synthetic.loader import load_synthetic_input

__all__ = ["base_synthetic_input", "load_synthetic_input"]
