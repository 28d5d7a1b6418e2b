"""Fused SloMo→emulator streaming pipeline.

This is the on-chip replacement for the reference's three disk-mediated
stages (v2e.py:687-850): source frames are chunked into overlapping windows
of batch_size+1, interpolated U-fold on device, and the interpolated stack
feeds the emulator scan WITHOUT returning to the host — only the compact
per-frame event count maps do.  At 800x upsampling the reference writes and
re-reads ~220k PNGs per second of video (README.md:38-41); here that
traffic simply does not exist.
"""
from __future__ import annotations

import logging
import os
from typing import Callable, Iterator, List, Optional

import jax.numpy as jnp
import numpy as np

from v2e_tpu.models.slomo import SuperSloMo

logger = logging.getLogger(__name__)


def run_interpolated_pipeline(
    args,
    frames_iter: Iterator[np.ndarray],
    src_frame_interval: float,
    emulator,
    renderer,
    exposure_mode,
    output_width: int,
    output_height: int,
    stats,
    upsampling_factor: int,
    auto_upsample: bool,
    feed_renderer: Callable,
) -> None:
    from tqdm import tqdm

    # --slomo_use_saved: replay a recorded interpolated stream (skips the
    # model entirely), or record one during this run
    cache_writer = None
    if getattr(args, "slomo_use_saved", False) and args.input is not None:
        from v2e_tpu.models.slomo_cache import (
            SlomoCacheReader,
            SlomoCacheWriter,
            cache_path_for,
        )

        cpath = cache_path_for(args, src_frame_interval, output_height,
                               output_width)
        if SlomoCacheReader.usable(cpath):
            logger.info(f"replaying saved SloMo frames from {cpath}")
            _replay_cached(
                cpath, args, emulator, renderer, exposure_mode,
                output_width, output_height, stats, feed_renderer,
            )
            return
        cache_writer = SlomoCacheWriter(cpath, output_height, output_width)
        logger.info(f"recording SloMo frames to {cpath}")

    slomo = SuperSloMo(
        model=args.slomo_model,
        auto_upsample=auto_upsample,
        upsampling_factor=upsampling_factor,
        batch_size=args.batch_size,
        allow_random=getattr(args, "allow_random_slomo", False),
        warp_precision=getattr(args, "warp_precision", "1pass"),
        conv_impl=getattr(args, "unet_conv", "auto"),
    )

    write_video = not args.skip_video_output
    orig_writer = slomo_writer = None
    if write_video and (args.vid_orig or args.vid_slomo):
        import cv2

        from v2e_tpu.utils.video import video_writer

        if args.vid_orig:
            orig_writer = video_writer(
                os.path.join(args.output_folder, args.vid_orig),
                output_height, output_width, frame_rate=args.avi_frame_rate,
            )
        if args.vid_slomo:
            slomo_writer = video_writer(
                os.path.join(args.output_folder, args.vid_slomo),
                output_height, output_width, frame_rate=args.avi_frame_rate,
            )

    window: List[np.ndarray] = []
    pair_index = 0  # global index of the first pair in the current window
    stats_u: List[tuple] = []  # (source time, upsampling factor) per chunk
    pbar = tqdm(desc="slomo+dvs", unit="src fr")

    # fixed-U chunks with no host-side consumers of the interpolated frames
    # run as ONE jitted program each (interpolate+emulate+compact fused; the
    # staged path dispatches ~5 programs per chunk with HBM round trips
    # between them)
    from v2e_tpu.fused import FusedConverter

    fused = (
        FusedConverter(slomo, emulator)
        if cache_writer is None
        and FusedConverter.usable(slomo, emulator, slomo_writer is not None)
        else None
    )
    if fused is not None:
        logger.info("using fused single-dispatch conversion chunks")

    # deep chunk pipeline with a two-stage ordered collector: the fetcher
    # thread owns the link (device wait + phase-1/2 fetches), the finalizer
    # thread owns the host (event materialization + sink writes), so chunk
    # N's fetch overlaps chunk N-1's materialization and both overlap the
    # next submission (critical on remote-attached devices)
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    # 6 chunks in flight hides link RTT/fetch jitter on remote-attached
    # devices (bench.py steady-state: 1.70x at depth 2, 1.84x at depth 6)
    DEPTH = 6
    fetcher = ThreadPoolExecutor(1)
    finalizer = ThreadPoolExecutor(1)
    pending: deque = deque()

    def _finalize(handle, ffut):
        return emulator.collect_finalize(handle, ffut.result())

    prewarmed = [False]

    def drain_one() -> None:
        fut, handle = pending.popleft()
        events, _, offsets = fut.result()
        if not prewarmed[0]:
            # front-load the neighboring occupancy buckets' slice-program
            # compiles so they never stall the stream mid-run
            prewarmed[0] = True
            emulator.prewarm_collect()
        if fused is not None and handle is not None:
            fused.note_collected(handle)  # lookahead warp window
        if events.shape[0]:
            feed_renderer(
                renderer, events, offsets, exposure_mode,
                output_height, output_width, args.skip_video_output,
            )

    def enqueue(handle) -> None:
        if handle is not None:
            ffut = fetcher.submit(emulator.collect_fetch, handle)
            pending.append((finalizer.submit(_finalize, handle, ffut), handle))
            if len(pending) > DEPTH:
                drain_one()

    def process_window() -> None:
        nonlocal pair_index
        if len(window) < 2:
            return
        chunk = np.stack(window)
        n_pairs = chunk.shape[0] - 1

        if fused is not None:
            # fixed U, or auto-U via the lookahead bucket (fused.py): either
            # way the chunk runs as one device program with no host sync
            handle, U, times = fused.submit_window(
                chunk, pair_index, src_frame_interval
            )
            stats_u.append((pair_index * src_frame_interval, U))
            enqueue(handle)
            stats.n_frames += n_pairs * U
            if stats.first_ts is None:
                stats.first_ts = times[0]
            stats.last_ts = times[-1]
        else:
            # pair slices bound device memory at very high upsampling
            # factors (the Colab-scale ~800x workload, README.md:38-41)
            U, slices = slomo.interpolate_batch_slices(
                jnp.asarray(chunk), output_height, output_width
            )
            stats_u.append((pair_index * src_frame_interval, U))
            for interp, pair_off in slices:
                n_out = interp.shape[0]
                # output frame k*U+i of pair k sits at source-unit time
                # k + i/U (reference slomo.py:389-400)
                rel = np.arange(n_out, dtype=np.float64) / U
                times = (pair_index + pair_off + rel) * src_frame_interval

                enqueue(emulator.submit_batch(interp, times))

                if slomo_writer is not None or cache_writer is not None:
                    host = np.asarray(interp).astype(np.uint8)
                    if cache_writer is not None:
                        cache_writer.append(host, times)
                    if slomo_writer is not None:
                        import cv2

                        for fr in host:
                            slomo_writer.write(
                                cv2.cvtColor(fr, cv2.COLOR_GRAY2BGR)
                            )

                stats.n_frames += n_out
                if stats.first_ts is None:
                    stats.first_ts = times[0]
                stats.last_ts = times[-1]

        if orig_writer is not None:
            import cv2

            for fr in window[:-1]:
                orig_writer.write(
                    cv2.cvtColor(fr.astype(np.uint8), cv2.COLOR_GRAY2BGR)
                )

        pair_index += n_pairs
        # carry the last source frame as the seed of the next window
        last = window[-1]
        window.clear()
        window.append(last)

    for frame in frames_iter:
        window.append(frame)
        pbar.update(1)
        if len(window) >= args.batch_size + 1:
            process_window()
    process_window()
    while pending:
        drain_one()
    fetcher.shutdown()
    finalizer.shutdown()
    pbar.close()

    if orig_writer is not None:
        orig_writer.release()
    if slomo_writer is not None:
        slomo_writer.release()
    if cache_writer is not None:
        cache_writer.finalize(slomo.avg_upsampling_factor)
    logger.info(
        f"SloMo average upsampling factor: {slomo.avg_upsampling_factor:.1f}"
    )
    if getattr(args, "slomo_stats_plot", False) and stats_u:
        _save_slomo_stats_plot(args.output_folder, stats_u)


def _replay_cached(
    cpath, args, emulator, renderer, exposure_mode, output_width,
    output_height, stats, feed_renderer,
) -> None:
    """Feed a recorded interpolated stream straight into the emulator
    (--slomo_use_saved second run: no model load, no UNets)."""
    from tqdm import tqdm

    from v2e_tpu.emulator.pipeline import ChunkPipeline
    from v2e_tpu.models.slomo_cache import SlomoCacheReader

    reader = SlomoCacheReader(cpath)
    pipeline = ChunkPipeline(
        emulator,
        lambda ev, lab, off: feed_renderer(
            renderer, ev, off, exposure_mode,
            output_height, output_width, args.skip_video_output,
        ),
    )
    slomo_writer = None
    if not args.skip_video_output and args.vid_slomo:
        from v2e_tpu.utils.video import video_writer

        slomo_writer = video_writer(
            os.path.join(args.output_folder, args.vid_slomo),
            output_height, output_width, frame_rate=args.avi_frame_rate,
        )
    pbar = tqdm(total=reader.n, desc="dvs (saved slomo)", unit="fr")
    for frames, times in reader.chunks(args.chunk_size):
        pipeline.push(frames, times)
        if slomo_writer is not None:
            import cv2

            for fr in frames.astype(np.uint8):
                slomo_writer.write(cv2.cvtColor(fr, cv2.COLOR_GRAY2BGR))
        stats.n_frames += frames.shape[0]
        if stats.first_ts is None:
            stats.first_ts = times[0]
        stats.last_ts = times[-1]
        pbar.update(frames.shape[0])
    pipeline.close()
    pbar.close()
    if slomo_writer is not None:
        slomo_writer.release()
    logger.info(
        f"SloMo average upsampling factor (saved): {reader.avg_upsampling:.1f}"
    )
    reader.close()


def _save_slomo_stats_plot(output_folder: str, stats_u) -> None:
    """Plot per-chunk upsampling factors / timestamp resolution
    (the reference shows this interactively, v2e.py:799-814)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as _np

    t, u = zip(*stats_u)
    fig, ax = plt.subplots(figsize=(8, 4))
    ax.step(t, u, where="post")
    ax.set_xlabel("source time (s)")
    ax.set_ylabel("upsampling factor")
    ax.set_title(
        f"SloMo upsampling (mean {float(_np.mean(u)):.1f})"
    )
    path = os.path.join(output_folder, "slomo-stats.png")
    fig.savefig(path, dpi=120)
    logger.info(f"wrote SloMo statistics plot to {path}")
