"""In-process interleaved A/B of FULL-pipeline bench configs on real TPU.

The tunnel's link speed drifts by hours (round-4 fetch p50 77 ms vs
294 ms measured the next morning), so cross-day full-bench numbers do not
compare.  This harness builds one FusedConverter per config in ONE
process, warms all of them, then measures interleaved depth-2 windows so
tunnel drift hits every config equally.  Median realtime factor per
config over the interleaved windows is the decision number.

Usage: python scripts/bench_ab_full.py [name=conv_impl:select ...]
  default configs: dense=dense:topk packed=packed:topk pscan=packed:scan
"""
from __future__ import annotations

import os
import sys
import time
from collections import deque
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    from v2e_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax

    from bench import make_source_frames
    from v2e_tpu.emulator import EventEmulator
    from v2e_tpu.fused import FusedConverter
    from v2e_tpu.models.slomo import SuperSloMo

    specs = sys.argv[1:] or ["dense=dense:topk", "packed=packed:topk",
                             "pscan=packed:scan"]
    configs = []
    for s in specs:
        name, rest = s.split("=")
        conv, select = rest.split(":")
        configs.append((name, conv, select))

    H, W = 260, 346
    SRC_FPS = 30.0
    U = 10
    B = 16
    N_WARM = int(os.environ.get("V2E_AB_WARM", 3))
    N_MEAS = int(os.environ.get("V2E_AB_MEAS", 12))
    DEPTH = int(os.environ.get("V2E_AB_DEPTH", 2))
    REPS = int(os.environ.get("V2E_AB_REPS", 4))

    print(f"# device: {jax.devices()[0]}", file=sys.stderr)

    converters = {}
    for name, conv, select in configs:
        slomo = SuperSloMo(model=None, auto_upsample=False,
                           upsampling_factor=U, batch_size=B,
                           warp_precision="1pass", conv_impl=conv)
        emulator = EventEmulator(
            pos_thres=0.2, neg_thres=0.2, sigma_thres=0.03,
            cutoff_hz=300.0, leak_rate_hz=0.01, shot_noise_rate_hz=0.001,
            refractory_period_s=0.0005, seed=42,
            compaction_capacity_hint=160_000,
            compaction_select=select,
        )
        converters[name] = (FusedConverter(slomo, emulator), emulator)

    n_chunks = N_WARM + REPS * N_MEAS
    src = make_source_frames(n_chunks * B + 1, H, W)
    src_interval = 1.0 / SRC_FPS

    fetcher = ThreadPoolExecutor(1)
    finalizer = ThreadPoolExecutor(1)
    fetch_times: dict = {name: [] for name, _, _ in configs}

    def run_window(name, first_chunk, n, depth):
        fused, emulator = converters[name]
        pending = deque()

        def _fetch(handle):
            t = time.perf_counter()
            out = emulator.collect_fetch(handle)
            fetch_times[name].append(time.perf_counter() - t)
            return out

        def _finalize(handle, ffut):
            return emulator.collect_finalize(handle, ffut.result())

        counters = [0, 0.0]

        def drain_one():
            fut, handle = pending.popleft()
            events, _, _ = fut.result()
            fused.note_collected(handle)
            counters[0] += events.shape[0]
            counters[1] += B * src_interval

        for c in range(first_chunk, first_chunk + n):
            chunk = src[c * B : c * B + B + 1]
            times = (c * B + np.arange(B * U, dtype=np.float64) / U) * src_interval
            handle = fused.submit(chunk, times)
            if handle is not None:
                ffut = fetcher.submit(_fetch, handle)
                pending.append((finalizer.submit(_finalize, handle, ffut), handle))
            if len(pending) > depth:
                drain_one()
        while pending:
            drain_one()
        return counters

    # warm every config fully (compiles + allocator) before ANY timing
    for name, _, _ in configs:
        t = time.perf_counter()
        run_window(name, 0, N_WARM, DEPTH)
        print(f"# warmed {name} in {time.perf_counter()-t:.1f}s",
              file=sys.stderr)

    results: dict = {name: [] for name, _, _ in configs}
    chunk_base = N_WARM
    for rep in range(REPS):
        for name, _, _ in configs:
            t0 = time.perf_counter()
            counters = run_window(name, chunk_base, N_MEAS, DEPTH)
            wall = time.perf_counter() - t0
            rt = counters[1] / wall
            results[name].append(rt)
            print(f"# rep {rep} {name}: {rt:.3f}x ({counters[0]:,} events)",
                  file=sys.stderr)
        chunk_base += N_MEAS

    print(f"configs={specs} B={B} U={U} depth={DEPTH} "
          f"window={N_MEAS} chunks x {REPS} reps")
    for name, _, _ in configs:
        rts = np.array(results[name])
        ft = np.array(fetch_times[name]) * 1e3
        print(f"{name:8s} rt p50 {np.median(rts):.3f}x (min {rts.min():.3f} "
              f"max {rts.max():.3f}) | fetch p50 {np.median(ft):.0f} ms")
    fetcher.shutdown()
    finalizer.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
