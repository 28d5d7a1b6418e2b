"""Output folder management and path helpers.

Port of the folder-handling utilities in
/root/reference/v2ecore/v2e_utils.py:89-169 (unique output folders,
suffix checks).  GUI file dialogs are headless-stubbed.
"""
from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)


def check_add_suffix(path: str, suffix: str) -> str:
    """Append ``suffix`` unless the path already ends with it."""
    if path.endswith(suffix):
        return path
    return os.path.splitext(path)[0] + suffix


def _non_empty(folder: str) -> bool:
    return os.path.isdir(folder) and len(os.listdir(folder)) > 0


def set_output_folder(
    output_folder: Optional[str],
    input_file: Optional[str],
    unique_output_folder: bool,
    overwrite: bool,
    output_in_place: bool,
) -> str:
    """Resolve the output folder with the reference's uniquifying rules
    (v2e_utils.py:96-169)."""
    if output_in_place and input_file:
        parent = os.path.dirname(os.path.abspath(input_file))
        logger.info(f"writing output in place to {parent}")
        return parent
    folder = output_folder or "v2e-output"
    if _non_empty(folder):
        if overwrite:
            logger.warning(f"overwriting files in non-empty folder {folder}")
        elif unique_output_folder:
            base = folder
            i = 1
            while _non_empty(folder):
                folder = f"{base}-{i}"
                i += 1
            logger.info(f"using unique output folder {folder}")
        else:
            raise SystemExit(
                f"output folder {folder} is not empty; use --overwrite or "
                "--unique_output_folder"
            )
    os.makedirs(folder, exist_ok=True)
    return folder


def inputVideoFileDialog() -> Optional[str]:
    """The reference pops a tkinter/easygui chooser (v2e_utils.py:234-267);
    headless environments get a clear error instead."""
    raise SystemExit(
        "no --input specified and no display available for a file chooser; "
        "pass -i/--input"
    )


def v2e_quit(code: int = 0):
    raise SystemExit(code)
