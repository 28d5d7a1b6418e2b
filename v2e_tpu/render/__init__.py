"""Event-frame rendering (DVS video reconstruction)."""

from v2e_tpu.render.renderer import EventRenderer, ExposureMode

__all__ = ["EventRenderer", "ExposureMode"]
