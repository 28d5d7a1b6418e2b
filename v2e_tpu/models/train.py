"""SuperSloMo training/fine-tuning (Super-SloMo losses, optax, sharded).

The reference runs the network inference-only from a pretrained torch
checkpoint (slomo.py:208-227); a complete framework must also be able to
(re)train it — e.g. the grayscale retraining that produced
``SuperSloMo39.ckpt`` (reference README.md:90-99).  Losses follow the
Super-SloMo paper (Jiang et al., CVPR 2018): reconstruction L1, warping L1,
and flow total-variation smoothness (the VGG perceptual term is omitted —
no pretrained VGG in this environment).

Multi-chip: the batch shards over the mesh's ``data`` axis and image rows
over ``spatial``; parameters are replicated and XLA inserts the gradient
all-reduce.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from v2e_tpu.models.backwarp import backwarp
from v2e_tpu.models.convert_ckpt import init_random_slomo_params
from v2e_tpu.models.unet import unet_apply

LAMBDA_R = 204.0
LAMBDA_W = 102.0
LAMBDA_S = 1.0


@struct.dataclass
class TrainState:
    flow_params: Any
    interp_params: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(
    seed: int = 0,
    learning_rate: float = 1e-4,
    host_init: bool = False,
    base: int = 32,
) -> Tuple[TrainState, optax.GradientTransformation]:
    flow_p, interp_p = init_random_slomo_params(seed, host=host_init, base=base)
    tx = optax.adam(learning_rate)
    opt_state = tx.init((flow_p, interp_p))
    return TrainState(flow_p, interp_p, opt_state, jnp.zeros((), jnp.int32)), tx


def _tv(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(x[..., 1:, :] - x[..., :-1, :])) + jnp.mean(
        jnp.abs(x[..., :, 1:] - x[..., :, :-1])
    )


def slomo_loss(
    flow_params,
    interp_params,
    I0: jnp.ndarray,
    I1: jnp.ndarray,
    It: jnp.ndarray,
    t: jnp.ndarray,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Super-SloMo training loss for a batch of (I0, It, I1) triples.

    Args:
      I0, I1, It: [B,1,H,W] normalized frames.
      t: [B] intermediate time of It in (0,1).
    """
    flow_out = unet_apply(flow_params, jnp.concatenate([I0, I1], axis=1))
    F01 = flow_out[:, :2]
    F10 = flow_out[:, 2:]
    tb = t[:, None, None, None]

    tmp = -tb * (1.0 - tb)
    F_t_0 = tmp * F01 + (tb * tb) * F10
    F_t_1 = ((1.0 - tb) * (1.0 - tb)) * F01 + tmp * F10
    g0 = backwarp(I0, F_t_0)
    g1 = backwarp(I1, F_t_1)
    intrp = unet_apply(
        interp_params,
        jnp.concatenate([I0, I1, F01, F10, F_t_1, F_t_0, g1, g0], axis=1),
    )
    F_t_0_f = intrp[:, 0:2] + F_t_0
    F_t_1_f = intrp[:, 2:4] + F_t_1
    V0 = jax.nn.sigmoid(intrp[:, 4:5])
    V1 = 1.0 - V0
    g0f = backwarp(I0, F_t_0_f)
    g1f = backwarp(I1, F_t_1_f)
    w0 = (1.0 - tb) * V0
    w1 = tb * V1
    It_pred = (w0 * g0f + w1 * g1f) / (w0 + w1 + 1e-8)

    l_r = jnp.mean(jnp.abs(It_pred - It))
    l_w = (
        jnp.mean(jnp.abs(backwarp(I1, F01) - I0))
        + jnp.mean(jnp.abs(backwarp(I0, F10) - I1))
        + jnp.mean(jnp.abs(g0 - It))
        + jnp.mean(jnp.abs(g1 - It))
    )
    l_s = _tv(F01) + _tv(F10)
    loss = LAMBDA_R * l_r + LAMBDA_W * l_w + LAMBDA_S * l_s
    return loss, {"loss": loss, "l_r": l_r, "l_w": l_w, "l_s": l_s}


def make_train_step(tx: optax.GradientTransformation):
    """Build the jitted training step (works single- or multi-chip: shard
    the batch before calling and XLA handles the rest)."""

    @jax.jit
    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        def loss_fn(ps):
            flow_p, interp_p = ps
            return slomo_loss(
                flow_p, interp_p, batch["I0"], batch["I1"], batch["It"], batch["t"]
            )

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            (state.flow_params, state.interp_params)
        )
        updates, opt_state = tx.update(
            grads, state.opt_state, (state.flow_params, state.interp_params)
        )
        flow_p, interp_p = optax.apply_updates(
            (state.flow_params, state.interp_params), updates
        )
        return (
            TrainState(flow_p, interp_p, opt_state, state.step + 1),
            metrics,
        )

    return train_step


def shard_batch(mesh: Mesh, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Place a batch on the mesh: batch dim over 'data', rows over 'spatial'."""
    out = {}
    for k, v in batch.items():
        if v.ndim == 4:
            sh = NamedSharding(mesh, P("data", None, "spatial", None))
        elif v.ndim == 1:
            sh = NamedSharding(mesh, P("data"))
        else:
            sh = NamedSharding(mesh, P())
        out[k] = jax.device_put(v, sh)
    return out


def replicate_state(mesh: Mesh, state: TrainState) -> TrainState:
    rep = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)
