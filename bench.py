"""Headline benchmark: 346x260 video conversion at 10x slowdown, SloMo on.

Reproduces the reference's headline workload (README.md:33-35: 346x260
source with SuperSloMo 10x upsampling, which a GTX-1050 converts 50-200x
SLOWER than real time) on one TPU chip: source frames are interpolated
10-fold by the SuperSloMo UNets and scanned through the full DVS emulator
(threshold mismatch, lowpass, leak+shot noise), with events materialized to
AER on the host.  Each chunk runs as ONE fused device program
(v2e_tpu.fused: interpolate + emulate + compact single-dispatch).

Methodology (honest-window rules):
 * the warm phase fully drains before the clock starts, so no pre-queued
   work can inflate the window;
 * the clock runs from the first measured submission to the last collected
   chunk (the pipeline-fill idle is charged to the measurement);
 * N_MEAS >= 6x pipeline depth, and a second depth-2 window is measured and
   printed so depth sensitivity is visible;
 * events are shuffled within iterations (the CLI default host path).

Reported value is the realtime factor (DVS seconds converted per wall
second) of the depth-6 window; vs_baseline is measured against the
reference's BEST case (1/50 realtime).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def make_source_frames(n: int, H: int, W: int, seed: int = 0) -> np.ndarray:
    """Synthetic 30fps source: drifting sinusoidal texture + moving bright
    blob, so flow and events are non-trivial everywhere."""
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    frames = np.empty((n, H, W), dtype=np.uint8)
    for i in range(n):
        shift = 2.0 * i  # ~2 px/frame drift
        fr = 100 + 40 * np.sin((xx + shift) / 17.0) * np.cos(yy / 13.0)
        cx = (W / 4 + 5 * i) % W
        cy = H / 2
        blob = 80 * np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * 15.0**2)))
        frames[i] = np.clip(fr + blob, 0, 255).astype(np.uint8)
    return frames


def main() -> int:
    import os

    import jax

    # persistent compilation cache: the ~7 min of first compiles amortize
    # across bench invocations (cli.py sets the same host-keyed cache)
    from v2e_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from v2e_tpu.emulator import EventEmulator
    from v2e_tpu.fused import FusedConverter
    from v2e_tpu.models.slomo import SuperSloMo

    H, W = 260, 346
    SRC_FPS = 30.0
    U = 10  # 10x slowdown
    B = int(os.environ.get("V2E_BENCH_B", 16))  # pairs per chunk
    # env knobs for constrained runners
    N_WARM = int(os.environ.get("V2E_BENCH_WARM", 5))
    N_MEAS = int(os.environ.get("V2E_BENCH_MEAS", 36))  # >= 6x DEPTH
    DEPTH = int(os.environ.get("V2E_BENCH_DEPTH", 6))
    N_MEAS2 = int(os.environ.get("V2E_BENCH_MEAS2", 12))  # depth-2 window
    DEPTH2 = 2

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    slomo = SuperSloMo(model=None, auto_upsample=False, upsampling_factor=U,
                       batch_size=B,
                       warp_precision=os.environ.get(
                           "V2E_WARP_PRECISION", "1pass"))
    emulator = EventEmulator(
        pos_thres=0.2, neg_thres=0.2, sigma_thres=0.03,
        cutoff_hz=300.0, leak_rate_hz=0.01, shot_noise_rate_hz=0.001,
        refractory_period_s=0.0005,
        seed=42,
        compaction_capacity_hint=160_000,
    )
    fused = FusedConverter(slomo, emulator)

    n_chunks = N_WARM + N_MEAS + N_MEAS2
    src = make_source_frames(n_chunks * B + 1, H, W)
    src_interval = 1.0 / SRC_FPS

    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    pending = deque()
    # two-stage ordered collection pipeline: the fetcher thread owns the
    # link (wait + phase-1/2 fetches), the finalizer thread owns the host
    # (event materialization + shuffle); chunk N's fetch overlaps chunk
    # N-1's materialization, and both overlap the main thread's submissions
    fetcher = ThreadPoolExecutor(1)
    finalizer = ThreadPoolExecutor(1)
    chunk_counter = [0]

    # default-on: the graded JSON alone can't distinguish "device got
    # slower" from "link got slower" — the stderr percentiles can
    DIAG = bool(int(os.environ.get("V2E_BENCH_DIAG", "1")))
    diag = {"submit": [], "fetch": [], "finalize": [], "drain_wait": []}

    def _timed_fetch(handle):
        t = time.perf_counter()
        out = emulator.collect_fetch(handle)
        diag["fetch"].append(time.perf_counter() - t)
        return out

    def _timed_finalize(handle, ffut):
        fetched = ffut.result()
        t = time.perf_counter()
        out = emulator.collect_finalize(handle, fetched)
        diag["finalize"].append(time.perf_counter() - t)
        return out

    def submit(c):
        chunk = src[c * B : c * B + B + 1]
        times = (c * B + np.arange(B * U, dtype=np.float64) / U) * src_interval
        t = time.perf_counter()
        handle = fused.submit(chunk, times)
        diag["submit"].append(time.perf_counter() - t)
        if handle is not None:
            ffut = fetcher.submit(_timed_fetch, handle)
            pending.append(
                (finalizer.submit(_timed_finalize, handle, ffut), handle)
            )

    def drain_one(counters=None):
        fut, handle = pending.popleft()
        t = time.perf_counter()
        events, _, _ = fut.result()
        diag["drain_wait"].append(time.perf_counter() - t)
        fused.note_collected(handle)
        pc = chunk_counter[0]
        chunk_counter[0] += 1
        if counters is not None:
            counters[0] += events.shape[0]
            counters[1] += B * src_interval
        print(f"# chunk {pc}: {events.shape[0]} events", file=sys.stderr)

    def run_window(first_chunk, n, depth, counters=None):
        """Submit+collect chunks [first, first+n) with `depth` in flight,
        starting and ending with an empty pipeline."""
        for c in range(first_chunk, first_chunk + n):
            submit(c)
            if len(pending) > depth:
                drain_one(counters)
        while pending:
            drain_one(counters)

    # ---- warm (compiles + allocator warmup), fully drained ----
    # depth 1 (serial submit->collect), NOT the pipeline depth: the
    # submit-time pre-slice program only exists once a first chunk has
    # been collected, so a depth-D warm of N_WARM <= D chunks would push
    # its compile into the first measured submissions (observed round 5:
    # one in-window remote compile turned a 2.4x window into 0.297x)
    run_window(0, N_WARM, 1)
    # compile the neighboring occupancy buckets' slice programs too, so a
    # mid-window bucket crossing can't trigger a compile
    emulator.prewarm_collect()

    # ---- measured depth-6 window: clock from first submission ----
    meas = [0, 0.0]  # events, dvs seconds
    t0 = time.perf_counter()
    run_window(N_WARM, N_MEAS, DEPTH, meas)
    wall = time.perf_counter() - t0
    rt_factor = meas[1] / wall
    meps = meas[0] / wall / 1e6
    frames_per_s = (N_MEAS * B * U) / wall
    print(
        f"# depth-{DEPTH} window ({N_MEAS} chunks): realtime factor "
        f"{rt_factor:.3f}x | {meps:.2f} Meps | "
        f"{frames_per_s:.0f} interp fr/s | events {meas[0]:,}",
        file=sys.stderr,
    )

    # ---- depth-2 sensitivity window ----
    if N_MEAS2 > 0:
        meas2 = [0, 0.0]
        t0 = time.perf_counter()
        run_window(N_WARM + N_MEAS, N_MEAS2, DEPTH2, meas2)
        wall2 = time.perf_counter() - t0
        print(
            f"# depth-{DEPTH2} window ({N_MEAS2} chunks): realtime factor "
            f"{meas2[1] / wall2:.3f}x | {meas2[0] / wall2 / 1e6:.2f} Meps",
            file=sys.stderr,
        )

    fetcher.shutdown()
    finalizer.shutdown()
    from v2e_tpu.emulator.emulator import COLLECT_DIAG, collect_diag_summary

    if COLLECT_DIAG:
        for line in collect_diag_summary().splitlines():
            print(f"# collect {line}", file=sys.stderr)
    if DIAG:
        for name, xs in diag.items():
            if xs:
                xs = np.asarray(xs)
                print(
                    f"# diag {name}: n={len(xs)} p50={np.median(xs)*1e3:.1f}ms "
                    f"p90={np.percentile(xs, 90)*1e3:.1f}ms "
                    f"sum={xs.sum():.2f}s",
                    file=sys.stderr,
                )
    # reference best case: 50x slower than real time on GTX-1050
    vs_baseline = rt_factor / (1.0 / 50.0)
    print(json.dumps({
        "metric": "realtime_factor_346x260_10x_slomo_1chip",
        "value": round(rt_factor, 4),
        "unit": "x_realtime",
        "vs_baseline": round(vs_baseline, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
