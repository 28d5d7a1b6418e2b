"""Neural models: the SuperSloMo optical-flow frame interpolator in JAX.

Two UNets (flow estimator 2->4ch, refinement interpolator 12->5ch) plus a
bilinear backwarp, matching the architecture the reference loads from
``SuperSloMo39.ckpt`` (/root/reference/v2ecore/model.py, slomo.py) so the
pretrained torch checkpoint converts weight-for-weight.
"""

from v2e_tpu.models.unet import UNetSpec, init_unet, unet_apply
from v2e_tpu.models.backwarp import backwarp
from v2e_tpu.models.slomo import SuperSloMo, interpolate_pairs
from v2e_tpu.models.convert_ckpt import (
    load_slomo_params,
    convert_torch_checkpoint,
    init_random_slomo_params,
)

__all__ = [
    "UNetSpec",
    "init_unet",
    "unet_apply",
    "backwarp",
    "SuperSloMo",
    "interpolate_pairs",
    "load_slomo_params",
    "convert_torch_checkpoint",
    "init_random_slomo_params",
]
