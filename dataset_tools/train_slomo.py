"""Train / fine-tune the SuperSloMo interpolator on a folder of videos.

The reference ships only a pretrained checkpoint (its grayscale retraining
happened offline, README.md:90-99); this tool closes the loop: sample
(I0, It, I1) triplets from videos, optimize the Super-SloMo losses
(v2e_tpu/models/train.py) data-parallel across the available chips, and
checkpoint with orbax.  The resulting params load directly into the
conversion pipeline via --slomo_model <ckpt_dir or npz>.

Usage:
  python -m dataset_tools.train_slomo -i /data/videos -o slomo-run \\
      --steps 10000 --batch_size 8 --crop 256 320 --gap 2
"""
from __future__ import annotations

import argparse
import logging
import os
import sys
import time
from typing import List

import numpy as np

logger = logging.getLogger(__name__)


class TripletSampler:
    """Random (I0, It, I1) triplets from a set of videos.

    Frames I0 and I1 are `gap+1` apart; It is one of the interior frames at
    fractional time t (the Super-SloMo training regime).
    """

    def __init__(self, videos: List[str], crop, gap: int, seed: int = 0):
        import cv2

        self.videos = videos
        self.crop_h, self.crop_w = crop
        self.gap = gap
        self.rng = np.random.default_rng(seed)
        self._cv2 = cv2
        self._cache_path = None
        self._cache_frames = None

    def _load(self, path: str) -> np.ndarray:
        if path == self._cache_path:
            return self._cache_frames
        cap = self._cv2.VideoCapture(path)
        frames = []
        while True:
            ret, fr = cap.read()
            if not ret:
                break
            frames.append(self._cv2.cvtColor(fr, self._cv2.COLOR_BGR2GRAY))
        cap.release()
        self._cache_path = path
        self._cache_frames = np.stack(frames) if frames else np.zeros((0, 1, 1))
        return self._cache_frames

    def sample_batch(self, batch_size: int):
        from v2e_tpu.models.slomo import MEAN

        I0 = np.empty((batch_size, 1, self.crop_h, self.crop_w), np.float32)
        I1 = np.empty_like(I0)
        It = np.empty_like(I0)
        t = np.empty((batch_size,), np.float32)
        n = 0
        while n < batch_size:
            path = self.videos[self.rng.integers(len(self.videos))]
            frames = self._load(path)
            if frames.shape[0] < self.gap + 2:
                continue
            H, W = frames.shape[1:]
            if H < self.crop_h or W < self.crop_w:
                continue
            s = int(self.rng.integers(0, frames.shape[0] - self.gap - 1))
            k = int(self.rng.integers(1, self.gap + 1))
            y = int(self.rng.integers(0, H - self.crop_h + 1))
            x = int(self.rng.integers(0, W - self.crop_w + 1))
            sl = (slice(y, y + self.crop_h), slice(x, x + self.crop_w))
            I0[n, 0] = frames[s][sl]
            It[n, 0] = frames[s + k][sl]
            I1[n, 0] = frames[s + self.gap + 1][sl]
            t[n] = k / (self.gap + 1)
            n += 1
        I0 = I0 / 255.0 - MEAN
        I1 = I1 / 255.0 - MEAN
        It = It / 255.0 - MEAN
        return {"I0": I0, "I1": I1, "It": It, "t": t}


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-i", "--input_dir", required=True,
                   help="directory tree of training videos")
    p.add_argument("-o", "--output_dir", default="slomo-train")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--crop", type=int, nargs=2, default=[256, 320],
                   help="training crop (multiples of 32)")
    p.add_argument("--gap", type=int, default=2,
                   help="frames between I0 and I1 minus one")
    p.add_argument("--init_from", default=None,
                   help="warm start from a SuperSloMo .ckpt/.npz")
    p.add_argument("--base", type=int, default=32,
                   help="UNet width scale (32 = reference SuperSloMo "
                        "architecture; smaller trains/ships a reduced-width "
                        "model, e.g. the committed golden fixture)")
    p.add_argument("--export_dtype", default="float32",
                   choices=["float32", "float16"],
                   help="npz export precision (float16 halves fixture size; "
                        "weights are restored to f32 at load)")
    p.add_argument("--checkpoint_every", type=int, default=500)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--extensions", nargs="+", default=[".avi", ".mp4", ".mov"])
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from dataset_tools.batch_convert import find_videos
    from v2e_tpu.models.convert_ckpt import load_slomo_params
    from v2e_tpu.models.train import (
        TrainState,
        create_train_state,
        make_train_step,
        replicate_state,
        shard_batch,
    )
    from v2e_tpu.parallel.mesh import make_mesh

    videos = find_videos(args.input_dir, set(args.extensions))
    if not videos:
        logger.error(f"no videos found under {args.input_dir}")
        return 1
    logger.info(f"training on {len(videos)} videos")
    os.makedirs(args.output_dir, exist_ok=True)

    state, tx = create_train_state(args.seed, args.learning_rate,
                                   base=args.base)
    if args.init_from:
        flow_p, interp_p = load_slomo_params(args.init_from)
        state = TrainState(flow_p, interp_p, tx.init((flow_p, interp_p)),
                           state.step)
        logger.info(f"warm-started from {args.init_from}")

    n_dev = len(jax.devices())
    mesh = make_mesh() if n_dev > 1 else None
    if mesh is not None:
        state = replicate_state(mesh, state)
        logger.info(f"data-parallel over mesh {mesh.devices.shape}")

    train_step = make_train_step(tx)
    sampler = TripletSampler(videos, args.crop, args.gap, args.seed)

    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(os.path.join(args.output_dir, "ckpt"))
    checkpointer = ocp.StandardCheckpointer()

    t0 = time.time()
    for step in range(1, args.steps + 1):
        batch = sampler.sample_batch(args.batch_size)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if mesh is not None:
            batch = shard_batch(mesh, batch)
        state, metrics = train_step(state, batch)
        if step % args.log_every == 0:
            m = jax.device_get(metrics)
            rate = step * args.batch_size / (time.time() - t0)
            logger.info(
                f"step {step}: loss={float(m['loss']):.4f} "
                f"l_r={float(m['l_r']):.4f} l_w={float(m['l_w']):.4f} "
                f"l_s={float(m['l_s']):.4f} ({rate:.1f} samples/s)"
            )
        if step % args.checkpoint_every == 0 or step == args.steps:
            path = os.path.join(ckpt_dir, str(step))
            checkpointer.save(
                path,
                jax.device_get((state.flow_params, state.interp_params)),
            )
            logger.info(f"checkpointed to {path}")

    try:
        checkpointer.wait_until_finished()
        checkpointer.close()
    except Exception:
        pass

    # also export a portable npz loadable by --slomo_model
    flow_p, interp_p = jax.device_get(
        (state.flow_params, state.interp_params)
    )
    out_npz = os.path.join(args.output_dir, "slomo_trained.npz")
    exp_dt = np.dtype(args.export_dtype)
    blobs = {}
    for prefix, tree in (("flow", flow_p), ("interp", interp_p)):
        for layer, wb in tree.items():
            blobs[f"{prefix}/{layer}.weight"] = np.asarray(wb["w"], exp_dt)
            blobs[f"{prefix}/{layer}.bias"] = np.asarray(wb["b"], exp_dt)
    np.savez_compressed(out_npz, **blobs)
    logger.info(f"exported trained weights to {out_npz}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
