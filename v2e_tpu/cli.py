"""v2e command-line driver: video/synthetic input → DVS events + artifacts.

TPU-native re-implementation of the reference driver
(/root/reference/v2e.py:108-905).  The three file-system-mediated stages of
the reference (luma .npy dump → SloMo PNG dump → per-frame emulation) are
replaced by one streaming pipeline: source frames are chunked, shipped to
the device once, optionally SloMo-interpolated on device, scanned through
the emulator, and only compact event count maps return to the host.
"""
from __future__ import annotations

import argparse
import logging
import math
import sys
import time as _time
from typing import List, Optional

import numpy as np

from v2e_tpu.args import (
    v2e_args,
    v2e_check_dvs_exposure_args,
    write_args_info,
    SmartFormatter,
)
from v2e_tpu.emulator import EventEmulator
from v2e_tpu.render import EventRenderer, ExposureMode
from v2e_tpu.utils.cameras import set_size_from_camera
from v2e_tpu.utils.lowpass import check_lowpass
from v2e_tpu.utils.paths import set_output_folder

logger = logging.getLogger(__name__)


def get_args(argv: Optional[List[str]] = None):
    parser = argparse.ArgumentParser(
        description="v2e_tpu: convert video to realistic synthetic DVS events "
        "(TPU-native)",
        formatter_class=SmartFormatter,
        allow_abbrev=True,
    )
    parser = v2e_args(parser)
    try:  # shell completion, like the reference (v2e.py:99)
        import argcomplete

        argcomplete.autocomplete(parser)
    except ImportError:
        pass
    args, other_args = parser.parse_known_args(argv)
    return args, other_args


class _Stats:
    def __init__(self):
        self.t0 = _time.time()
        self.n_frames = 0
        self.first_ts: Optional[float] = None
        self.last_ts: Optional[float] = None


def _feed_renderer(renderer, events, offsets, exposure_mode, height, width,
                   skip_video):
    if skip_video or renderer is None or events is None or not len(events):
        return
    if exposure_mode == ExposureMode.SOURCE and offsets is not None:
        for f in range(len(offsets) - 1):
            ev = events[offsets[f] : offsets[f + 1]]
            if len(ev):
                renderer.render_events_to_frames(ev, height, width)
    else:
        renderer.render_events_to_frames(events, height, width)


def main(argv: Optional[List[str]] = None) -> int:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    # honor the JAX_PLATFORMS env var even when a site hook pinned a
    # different platform list via jax.config at interpreter startup
    import os

    platform_env = os.environ.get("JAX_PLATFORMS")
    if platform_env:
        import jax

        try:
            jax.config.update("jax_platforms", platform_env)
        except RuntimeError:
            pass  # backend already initialized (e.g. embedded caller)

    # persistent XLA compilation cache (host-feature-keyed: stale CPU AOT
    # artifacts from a different microarchitecture can SIGILL).  Off with
    # V2E_COMPILATION_CACHE=""; JAX ignores backends that don't support
    # serialization.
    from v2e_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache(logger)

    args, other_args = get_args(argv)

    if args.input is None and args.synthetic_input is None:
        logger.error("specify --input video/folder or --synthetic_input module")
        return 1

    output_folder = set_output_folder(
        args.output_folder,
        args.input,
        args.unique_output_folder,
        args.overwrite,
        args.output_in_place,
    )
    args.output_folder = output_folder
    write_args_info(args, output_folder, other_args, " ".join(sys.argv))

    output_width, output_height = set_size_from_camera(args)
    exposure_mode, exposure_val, area_dimension = v2e_check_dvs_exposure_args(args)

    def run() -> int:
        if args.synthetic_input is not None:
            return _run_synthetic(
                args, other_args, output_folder, output_width, output_height,
                exposure_mode, exposure_val, area_dimension,
            )
        return _run_video(
            args, output_folder, output_width, output_height,
            exposure_mode, exposure_val, area_dimension,
        )

    if args.profile:
        import os

        import jax

        trace_dir = os.path.join(output_folder, "jax-trace")
        logger.info(f"capturing JAX profiler trace to {trace_dir}")
        with jax.profiler.trace(trace_dir):
            return run()
    return run()


def _make_mesh_from_args(args, output_height):
    """Build the conversion mesh for --devices > 1 (None for single-chip).

    Returns (mesh, mode, pad_rows)."""
    devices = getattr(args, "devices", 1) or 1
    if devices <= 1:
        return None, "pixel", 0
    import jax

    avail = len(jax.devices())
    if devices > avail:
        logger.warning(
            f"--devices {devices} > {avail} available; using {avail}"
        )
        devices = avail
    if devices <= 1:
        return None, "pixel", 0
    mode = getattr(args, "parallel_mode", "pixel")
    if mode == "segment":
        from v2e_tpu.parallel.convert import make_segment_mesh

        return make_segment_mesh(devices), mode, 0

    # pixel mode shards image rows over the 'spatial' mesh axis; when H is
    # not a multiple of the device count, inert pad rows (which never emit
    # and leave the logical pixels bit-exact, EmulatorConfig.pad_rows) round
    # it up so every chip gets an equal shard and none idle
    import numpy as _np
    from jax.sharding import Mesh

    H = output_height or 260
    pad = (-H) % devices
    if pad and getattr(args, "cs_lambda_pixels", None):
        # the CSDVS surround diffusion would couple into the pad rows: fall
        # back to the largest divisor of H instead of padding
        s = max(d for d in range(1, devices + 1) if H % d == 0)
        if s <= 1:
            logger.warning(
                f"--devices {devices}: CSDVS forbids row padding and no "
                f"divisor of height {H} > 1; running single-device"
            )
            return None, "pixel", 0
        if s < devices:
            logger.warning(
                f"--devices {devices}: CSDVS forbids row padding; height "
                f"{H} shards over {s} devices, {devices - s} idle"
            )
        devices, pad = s, 0
    if pad:
        logger.info(
            f"padding height {H} -> {H + pad} with inert rows to shard "
            f"evenly over {devices} devices"
        )
    mesh = Mesh(
        _np.array(jax.devices()[:devices]).reshape(1, devices),
        ("data", "spatial"),
    )
    return mesh, mode, pad


def _make_emulator(args, output_folder, output_width, output_height):
    mesh, parallel_mode, pad_rows = _make_mesh_from_args(args, output_height)
    em = EventEmulator(
        mesh=mesh,
        parallel_mode=parallel_mode,
        pad_rows=pad_rows,
        segment_warmup=getattr(args, "segment_warmup", 8),
        compaction_capacity_hint=args.compaction_capacity,
        pos_thres=args.pos_thres,
        neg_thres=args.neg_thres,
        sigma_thres=args.sigma_thres,
        cutoff_hz=args.cutoff_hz,
        leak_rate_hz=args.leak_rate_hz,
        shot_noise_rate_hz=args.shot_noise_rate_hz,
        photoreceptor_noise=args.photoreceptor_noise,
        leak_jitter_fraction=args.leak_jitter_fraction,
        noise_rate_cov_decades=args.noise_rate_cov_decades,
        refractory_period_s=args.refractory_period,
        seed=args.dvs_emulator_seed,
        output_folder=output_folder,
        dvs_h5=args.dvs_h5,
        dvs_aedat2=args.dvs_aedat2,
        dvs_aedat4=args.dvs_aedat4,
        dvs_text=args.dvs_text,
        show_dvs_model_state=args.show_dvs_model_state,
        save_dvs_model_state=args.save_dvs_model_state,
        output_width=output_width,
        output_height=output_height,
        cs_lambda_pixels=args.cs_lambda_pixels,
        cs_tau_p_ms=args.cs_tau_p_ms,
        hdr=args.hdr,
        scidvs=args.scidvs,
        record_single_pixel_states=args.record_single_pixel_states,
        label_signal_noise=args.label_signal_noise,
        shuffle_events_within_iteration=not args.no_shuffle,
    )
    if args.dvs_params is not None:
        em.set_dvs_params(args.dvs_params)
    if args.ddd_output and em.dvs_h5 is not None:
        em.prepare_storage(None, None)  # growable DDD frame datasets
    elif args.ddd_output:
        logger.warning("--ddd_output requires --dvs_h5; ignoring")
    if args.resume_state:
        em.load_state(args.resume_state)
    return em


def _make_renderer(args, output_folder, exposure_mode, exposure_val, area_dimension):
    if args.skip_video_output or args.dvs_vid is None:
        return None
    return EventRenderer(
        full_scale_count=args.dvs_vid_full_scale,
        output_path=output_folder,
        dvs_vid=args.dvs_vid,
        preview=False,
        exposure_mode=exposure_mode,
        exposure_value=exposure_val if exposure_val is not None else 1 / 300.0,
        area_dimension=area_dimension,
        avi_frame_rate=args.avi_frame_rate,
    )


def _finish(args, emulator, renderer, stats: _Stats) -> int:
    if args.checkpoint_state:
        try:
            emulator.save_state(args.checkpoint_state)
        except RuntimeError as e:
            logger.warning(f"could not checkpoint emulator state: {e}")
    emulator.cleanup()
    if renderer is not None:
        renderer.cleanup()
    wall = _time.time() - stats.t0
    dur = (
        (stats.last_ts - stats.first_ts)
        if stats.first_ts is not None and stats.last_ts is not None
        else 0.0
    )
    total = emulator.num_events_total
    npix = (emulator.output_width or 1) * (emulator.output_height or 1)
    logger.info(
        f"processed {stats.n_frames} frames ({dur:.3f}s of DVS time) in "
        f"{wall:.2f}s wall ({stats.n_frames / max(wall, 1e-9):.1f} fr/s)"
    )
    if dur > 0:
        logger.info(
            f"events: {total:,} total ({emulator.num_events_on:,} on, "
            f"{emulator.num_events_off:,} off); rates "
            f"{total / dur / 1e6:.3f} Meps, "
            f"{total / dur / npix:.3f} Hz/pixel"
        )
        if wall > 0:
            logger.info(
                f"realtime factor: {dur / wall:.3f}x "
                f"({'faster' if dur > wall else 'slower'} than real time)"
            )
    logger.info(f"outputs are in {args.output_folder}")
    return 0


def _run_synthetic(args, other_args, output_folder, output_width, output_height,
                   exposure_mode, exposure_val, area_dimension) -> int:
    from v2e_tpu.synthetic import load_synthetic_input

    if output_width is None or output_height is None:
        output_width, output_height = 346, 260

    cls = load_synthetic_input(args.synthetic_input)
    import os

    avi_path = (
        None
        if args.skip_video_output or args.vid_orig is None
        else os.path.join(output_folder, args.vid_orig)
    )
    syn = cls(
        width=output_width,
        height=output_height,
        avi_path=avi_path,
        preview=False,
        arg_list=other_args,
        parent_args=args,
    )

    emulator = _make_emulator(args, output_folder, output_width, output_height)
    renderer = _make_renderer(args, output_folder, exposure_mode, exposure_val,
                              area_dimension)
    stats = _Stats()

    from tqdm import tqdm

    from v2e_tpu.emulator.pipeline import ChunkPipeline

    pipeline = ChunkPipeline(
        emulator,
        lambda ev, lab, off: _feed_renderer(
            renderer, ev, off, exposure_mode,
            output_height, output_width, args.skip_video_output,
        ),
    )
    chunk_frames: List[np.ndarray] = []
    chunk_times: List[float] = []
    pbar = tqdm(total=syn.total_frames(), desc="synthetic", unit="fr")

    if avi_path is None and hasattr(syn, "device_frames"):
        # pixel-exact device-side generator (synthetic/device.py): frames
        # are rendered on device per chunk and feed the emulator without a
        # host round trip (the reference renders every frame in Python,
        # e.g. scripts/moving_dot.py:25-54)
        times = np.asarray(syn.times, dtype=np.float64)
        stats.first_ts = float(times[0])
        stats.last_ts = float(times[-1])
        stats.n_frames = len(times)
        for s in range(0, len(times), args.chunk_size):
            blk = times[s : s + args.chunk_size]
            pipeline.push(syn.device_frames(blk), blk)
            pbar.update(len(blk))
        pipeline.close()
        pbar.close()
        syn.cleanup()
        return _finish(args, emulator, renderer, stats)

    def flush():
        if not chunk_frames:
            return
        pipeline.push(
            np.stack(chunk_frames), np.array(chunk_times, dtype=np.float64)
        )
        chunk_frames.clear()
        chunk_times.clear()

    while True:
        frame, t = syn.next_frame()
        if frame is None:
            break
        if stats.first_ts is None:
            stats.first_ts = t
        stats.last_ts = t
        stats.n_frames += 1
        chunk_frames.append(np.asarray(frame))
        chunk_times.append(float(t))
        if len(chunk_frames) >= args.chunk_size:
            flush()
        pbar.update(1)
    flush()
    pipeline.close()
    pbar.close()
    syn.cleanup()
    return _finish(args, emulator, renderer, stats)


def _run_video(args, output_folder, output_width, output_height,
               exposure_mode, exposure_val, area_dimension) -> int:
    from v2e_tpu.io.reader import luma_frames, open_video_input

    cap, src_fps, n_frames, in_w, in_h = open_video_input(
        args.input, args.input_frame_rate
    )
    if output_width is None or output_height is None:
        output_width, output_height = in_w, in_h
        if args.crop is not None:
            left, right, top, bottom = args.crop
            output_width -= left + right
            output_height -= top + bottom
    src_frame_interval = (1.0 / src_fps) / args.input_slowmotion_factor

    start_frame = (
        int(args.start_time * src_fps) if args.start_time is not None else 0
    )
    stop_frame = (
        int(args.stop_time * src_fps) if args.stop_time is not None else None
    )

    use_slomo = not args.disable_slomo
    upsampling_factor = 1
    auto_upsample = False
    if use_slomo:
        if args.auto_timestamp_resolution and args.timestamp_resolution is None:
            auto_upsample = True
            upsampling_factor = 2
        elif args.timestamp_resolution is not None:
            auto_upsample = bool(args.auto_timestamp_resolution)
            upsampling_factor = max(
                int(math.ceil(src_frame_interval / args.timestamp_resolution)), 2
            )
            check_lowpass(args.cutoff_hz, upsampling_factor / src_frame_interval)
        else:
            auto_upsample = True
            upsampling_factor = 2
    else:
        check_lowpass(args.cutoff_hz, 1.0 / src_frame_interval)

    emulator = _make_emulator(args, output_folder, output_width, output_height)
    renderer = _make_renderer(args, output_folder, exposure_mode, exposure_val,
                              area_dimension)
    stats = _Stats()

    frames_iter = luma_frames(
        cap, output_width, output_height, crop=args.crop,
        start_frame=start_frame, stop_frame=stop_frame, hdr=args.hdr,
    )

    if not use_slomo:
        _run_direct(args, frames_iter, src_frame_interval, emulator, renderer,
                    exposure_mode, output_width, output_height, stats)
    else:
        from v2e_tpu.models.pipeline import run_interpolated_pipeline

        run_interpolated_pipeline(
            args, frames_iter, src_frame_interval, emulator, renderer,
            exposure_mode, output_width, output_height, stats,
            upsampling_factor=upsampling_factor, auto_upsample=auto_upsample,
            feed_renderer=_feed_renderer,
        )

    cap.release()
    return _finish(args, emulator, renderer, stats)


def _run_direct(args, frames_iter, frame_interval, emulator, renderer,
                exposure_mode, width, height, stats: _Stats) -> None:
    """--disable_slomo path: source frames go straight into the emulator."""
    from tqdm import tqdm

    from v2e_tpu.emulator.pipeline import ChunkPipeline

    pipeline = ChunkPipeline(
        emulator,
        lambda ev, lab, off: _feed_renderer(
            renderer, ev, off, exposure_mode, height, width,
            args.skip_video_output,
        ),
    )
    chunk: List[np.ndarray] = []
    times: List[float] = []
    idx = 0

    def flush():
        if not chunk:
            return
        pipeline.push(np.stack(chunk), np.array(times, dtype=np.float64))
        chunk.clear()
        times.clear()

    for frame in tqdm(frames_iter, desc="dvs", unit="fr"):
        t = idx * frame_interval
        idx += 1
        if stats.first_ts is None:
            stats.first_ts = t
        stats.last_ts = t
        stats.n_frames += 1
        chunk.append(frame)
        times.append(t)
        if len(chunk) >= args.chunk_size:
            flush()
    flush()
    pipeline.close()


if __name__ == "__main__":
    sys.exit(main())
