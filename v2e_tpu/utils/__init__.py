"""Host utilities: path/folder management, camera presets, video writing."""

from v2e_tpu.utils.paths import (
    check_add_suffix,
    set_output_folder,
    inputVideoFileDialog,
)
from v2e_tpu.utils.cameras import DVS_SIZES, set_size_from_camera
from v2e_tpu.utils.lowpass import check_lowpass

__all__ = [
    "check_add_suffix",
    "set_output_folder",
    "inputVideoFileDialog",
    "DVS_SIZES",
    "set_size_from_camera",
    "check_lowpass",
]
