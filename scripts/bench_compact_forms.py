"""Device-only in-chunk timing of the compaction select schemes on TPU.

VERDICT r4 next #6: the compaction select (~33 ms of the device program
in round-2 estimates) needed an in-chunk measurement of the alternatives
— standalone sort timings on the tunneled backend are untrustworthy
(TODO.md round-2 lesson: an isolated lax.sort "measures" 197 ms where
the same op costs 34 ms inside the traced chunk).

This times the REAL emulator chunk program (emulate_and_compact_impl at
the headline shape) in three variants, interleave-warmed:
  nocompact  emulate only (no select/pack)         — the floor
  topk       word-packed two-phase lax.top_k select (default)
  scan       prefix-sum + binary-search select

select cost = variant − nocompact.  K chunk programs run inside one
jitted scan per timing so dispatch/link overhead amortizes.

Usage: python scripts/bench_compact_forms.py [F H W]
"""
from __future__ import annotations

import dataclasses
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    from v2e_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from v2e_tpu.emulator.config import EmulatorConfig
    from v2e_tpu.emulator.core import (
        emulate_and_compact_impl,
        emulate_chunk_impl,
    )
    from v2e_tpu.emulator.state import init_state

    F, H, W = (int(a) for a in sys.argv[1:4]) if len(sys.argv) > 3 else (160, 260, 346)
    CAP = 262144
    K = 4
    ROUNDS = 8

    cfg = EmulatorConfig(
        pos_thres=0.2, neg_thres=0.2, sigma_thres=0.03, cutoff_hz=300.0,
        leak_rate_hz=0.01, shot_noise_rate_hz=0.001,
        refractory_period_s=0.0005, seed=42,
    )
    variants = {
        "nocompact": None,
        "topk": dataclasses.replace(cfg, select="topk"),
        "scan": dataclasses.replace(cfg, select="scan"),
    }

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        (rng.random((F, H, W)) * 255).astype(np.float32))
    times = jnp.asarray(np.arange(F, dtype=np.float64) / 300.0)

    params, state0 = init_state(
        cfg, frames[0], jnp.float32(0.0), jax.random.PRNGKey(cfg.seed)
    )

    @functools.partial(jax.jit, static_argnums=(0,))
    def loop_compact(c, st, fr, ts):
        def body(carry, dt):
            st2, outs, packed = emulate_and_compact_impl(
                c, params, carry, fr + dt, ts, CAP)
            return st2, jnp.sum(packed["sparse"]["idx"][:8])

        st, accs = jax.lax.scan(
            body, st, (jnp.arange(K) * 1e-3).astype(fr.dtype))
        return jnp.sum(accs)

    @jax.jit
    def loop_plain(st, fr, ts):
        def body(carry, dt):
            st2, outs = emulate_chunk_impl(cfg, params, carry, fr + dt, ts)
            return st2, jnp.sum(outs["ev_count"][0, :4].astype(jnp.int32))

        st, accs = jax.lax.scan(
            body, st, (jnp.arange(K) * 1e-3).astype(fr.dtype))
        return jnp.sum(accs)

    def run(name):
        if name == "nocompact":
            return float(loop_plain(state0, frames, times))
        return float(loop_compact(variants[name], state0, frames, times))

    for name in variants:
        t = time.perf_counter()
        run(name)
        run(name)
        print(f"# warmed {name} in {time.perf_counter()-t:.1f}s",
              file=sys.stderr)

    times_ms: dict = {name: [] for name in variants}
    for r in range(ROUNDS):
        for name in variants:
            t = time.perf_counter()
            run(name)
            times_ms[name].append((time.perf_counter() - t) / K * 1e3)
        print(f"# round {r} done", file=sys.stderr)

    print(f"chunk [{F},{H},{W}] capacity {CAP} | {K} chunks per timed "
          f"program, per-chunk ms shown")
    base = np.median(np.array(times_ms["nocompact"][2:]))
    for name in variants:
        ts = np.array(times_ms[name][2:])
        extra = "" if name == "nocompact" else (
            f"  select cost {np.median(ts)-base:+7.1f} ms")
        print(f"{name:10s} p50 {np.median(ts):7.1f} ms "
              f"(min {ts.min():7.1f}){extra}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
