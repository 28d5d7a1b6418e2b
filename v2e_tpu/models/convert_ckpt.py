"""SuperSloMo checkpoint handling: torch .ckpt -> JAX param dicts.

The reference loads ``SuperSloMo39.ckpt`` with keys ``state_dictFC`` (flow
UNet(2,4)) and ``state_dictAT`` (interpolation UNet(12,5))
(/root/reference/v2ecore/slomo.py:225-227).  `convert_torch_checkpoint`
maps those tensors 1:1 into the functional UNet param layout (same OIHW
kernels, no transposition needed) and saves a portable ``.npz``;
`load_slomo_params` accepts either the torch file or the converted npz.
"""
from __future__ import annotations

import logging
import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from v2e_tpu.models.unet import Params, UNetSpec, init_unet, init_unet_host

logger = logging.getLogger(__name__)

FLOW_SPEC = UNetSpec(2, 4)
INTERP_SPEC = UNetSpec(12, 5)

# torch module attribute path -> our layer name is the identity apart from
# separator ('down1.conv1.weight' -> params['down1.conv1']['w'])
_TORCH_SUFFIX = {"weight": "w", "bias": "b"}


def _torch_state_to_params(state: Dict[str, "np.ndarray"], spec: UNetSpec) -> Params:
    params: Params = {}
    for name, ci, co, k in spec.conv_specs:
        w = np.asarray(state[f"{name}.weight"])
        b = np.asarray(state[f"{name}.bias"])
        if w.shape != (co, ci, k, k):
            raise ValueError(f"{name}: checkpoint shape {w.shape} != {(co, ci, k, k)}")
        # f32 master copy regardless of storage dtype (the golden fixture
        # ships f16 to halve the committed size)
        params[name] = {
            "w": jnp.asarray(w, dtype=jnp.float32),
            "b": jnp.asarray(b, dtype=jnp.float32),
        }
    return params


def convert_torch_checkpoint(ckpt_path: str, out_path: str) -> str:
    """One-time conversion of the torch checkpoint to .npz."""
    import torch

    d = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    flow_state = {k: v.numpy() for k, v in d["state_dictFC"].items()}
    interp_state = {k: v.numpy() for k, v in d["state_dictAT"].items()}
    out = {}
    for prefix, state in (("flow", flow_state), ("interp", interp_state)):
        for k, v in state.items():
            out[f"{prefix}/{k}"] = v
    np.savez(out_path, **out)
    logger.info(f"converted {ckpt_path} -> {out_path}")
    return out_path


def _npz_to_params(npz, prefix: str, spec: UNetSpec) -> Params:
    state = {
        k[len(prefix) + 1 :]: npz[k] for k in npz.files if k.startswith(prefix + "/")
    }
    return _torch_state_to_params(state, spec)


def _specs_for_npz(npz) -> Tuple[UNetSpec, UNetSpec]:
    """Infer the UNet width scale from the stored first-conv shape.

    `conv1` outputs `base` channels (unet_conv_specs), so a checkpoint
    trained at a reduced width (train_slomo --base, e.g. the committed
    golden fixture) self-describes its architecture; base=32 is the
    reference SuperSloMo39 width."""
    base = int(npz["flow/conv1.weight"].shape[0])
    if base == 32:
        return FLOW_SPEC, INTERP_SPEC
    return UNetSpec(2, 4, base), UNetSpec(12, 5, base)


def load_slomo_params(path: str) -> Tuple[Params, Params]:
    """Load (flow_params, interp_params) from .npz or torch .ckpt.

    A torch ``.ckpt`` (the format the reference CLI takes directly,
    /root/reference/v2ecore/v2e_args.py:260-263) is auto-converted on first
    use and the converted ``.npz`` cached alongside, so later runs skip the
    torch load entirely.  The cache is refreshed if the ckpt is newer.
    """
    if path.endswith(".npz"):
        npz = np.load(path)
        fspec, ispec = _specs_for_npz(npz)
        return _npz_to_params(npz, "flow", fspec), _npz_to_params(
            npz, "interp", ispec
        )

    cached = os.path.splitext(path)[0] + ".npz"
    try:
        fresh = os.path.isfile(cached) and os.path.getmtime(
            cached
        ) >= os.path.getmtime(path)
    except OSError:
        fresh = False
    if not fresh:
        try:
            convert_torch_checkpoint(path, cached)
        except OSError as e:  # read-only checkpoint dir: load without cache
            logger.warning(f"cannot cache converted checkpoint at {cached}: {e}")
            import torch

            d = torch.load(path, map_location="cpu", weights_only=False)
            flow = _torch_state_to_params(
                {k: v.numpy() for k, v in d["state_dictFC"].items()}, FLOW_SPEC
            )
            interp = _torch_state_to_params(
                {k: v.numpy() for k, v in d["state_dictAT"].items()}, INTERP_SPEC
            )
            return flow, interp
    npz = np.load(cached)
    fspec, ispec = _specs_for_npz(npz)
    return _npz_to_params(npz, "flow", fspec), _npz_to_params(
        npz, "interp", ispec
    )


def init_random_slomo_params(
    seed: int = 0, host: bool = False, base: int = 32
) -> Tuple[Params, Params]:
    """Random-initialized model (for benchmarks/tests without the ckpt).

    host=True draws with numpy instead of jax.random: one host RNG pass
    instead of ~90 tiny compiled device programs — on a 1-core CPU backend
    with 8 virtual devices those compiles alone cost ~1 min (the multi-chip
    dryrun's use case).  The two inits draw different values; both match
    torch Conv2d's +-1/sqrt(fan_in) uniform law.
    """
    fspec, ispec = FLOW_SPEC, INTERP_SPEC
    if base != 32:
        fspec = UNetSpec(fspec.in_channels, fspec.out_channels, base)
        ispec = UNetSpec(ispec.in_channels, ispec.out_channels, base)
    if host:
        rng = np.random.default_rng(seed)
        return init_unet_host(rng, fspec), init_unet_host(rng, ispec)
    k1, k2 = jax.random.split(jax.random.key(seed))
    return init_unet(k1, fspec), init_unet(k2, ispec)


def main(argv=None) -> int:
    """python -m v2e_tpu.models.convert_ckpt SuperSloMo39.ckpt [out.npz]"""
    import argparse

    p = argparse.ArgumentParser(description=convert_torch_checkpoint.__doc__)
    p.add_argument("ckpt", help="torch SuperSloMo .ckpt path")
    p.add_argument("out", nargs="?", default=None, help="output .npz path")
    a = p.parse_args(argv)
    out = a.out or os.path.splitext(a.ckpt)[0] + ".npz"
    convert_torch_checkpoint(a.ckpt, out)
    # verify the converted file round-trips into valid param shapes
    load_slomo_params(out)
    print(f"converted {a.ckpt} -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
