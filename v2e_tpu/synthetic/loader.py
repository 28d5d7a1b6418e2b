"""Dynamic synthetic-input plugin loading.

The reference resolves ``--synthetic_input scripts.moving_dot`` by importing
the module and instantiating the class with the module's basename
(v2e.py:170-204).  Same protocol here, with reference-style module paths
(``scripts.X``) transparently mapped to the bundled ``v2e_tpu.synthetic.X``
generators so existing command lines keep working.
"""
from __future__ import annotations

import importlib
import logging
from typing import List, Optional, Type

logger = logging.getLogger(__name__)

_BUNDLED = {
    "moving_dot",
    "particles",
    "gradients",
    "spots",
    "barberpole",
    "single_linearly_moving_dot",
}


def load_synthetic_input(module_path: str) -> Type:
    """Import a synthetic-input class from a module path.

    The class must have the same name as the module's last component.
    """
    name = module_path.split(".")[-1]
    candidates = [module_path]
    if name in _BUNDLED:
        candidates.insert(0, f"v2e_tpu.synthetic.{name}")
    last_err: Optional[Exception] = None
    for cand in candidates:
        try:
            mod = importlib.import_module(cand)
        except ImportError as e:
            last_err = e
            continue
        cls = getattr(mod, name, None)
        if cls is None:
            raise ImportError(
                f"module {cand} has no class named {name} "
                "(the class must be named like the module)"
            )
        logger.info(f"loaded synthetic input class {name} from {cand}")
        return cls
    raise ImportError(
        f"could not import synthetic input {module_path}: {last_err}"
    )
