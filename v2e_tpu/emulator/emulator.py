"""Reference-compatible `EventEmulator` facade over the scanned TPU core.

Keeps the library API of the reference
(/root/reference/v2ecore/emulator.py:35-1022) — construct, push frames with
``generate_events(frame, t)``, get AER arrays back, with the same output
sinks — while the actual model runs as the jitted ``lax.scan`` chunk kernel
(`v2e_tpu.emulator.core.emulate_chunk`).

For throughput, prefer the chunked API ``generate_events_batch(frames,
times)``: a whole stack of frames crosses the host↔device boundary once and
the scan amortizes dispatch overhead.  ``generate_events`` is the same code
path with a chunk of one frame.
"""
from __future__ import annotations

import logging
import os
import pickle
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from v2e_tpu.emulator.config import EmulatorConfig
from v2e_tpu.emulator.core import (
    compact_chunk,
    count_occupied,
    emulate_and_compact,
    emulate_chunk,
    slice_packed,
    unpack_scalars,
    unpack_sparse_blob,
)
from v2e_tpu.emulator.events import materialize_events_sparse
from v2e_tpu.emulator.state import init_state, rebase_state
from v2e_tpu.ops.noise import compute_photoreceptor_noise_voltage

logger = logging.getLogger(__name__)

# V2E_COLLECT_DIAG=1: per-phase wall times inside `collect` accumulate here
# (wait+phase-1 fetch / slice dispatch+phase-2 fetch / host materialization /
# sink writes) — the coarse bench diag can't attribute the collector's cost.
COLLECT_DIAG: Dict[str, List[float]] = {}
_COLLECT_DIAG_ON = bool(int(os.environ.get("V2E_COLLECT_DIAG", "0")))


def _diag_mark(phases: Optional[List[Tuple[str, float]]], name: str) -> None:
    if phases is not None:
        import time as _time

        phases.append((name, _time.perf_counter()))


def collect_diag_summary() -> str:
    import numpy as _np

    parts = []
    for name, xs in COLLECT_DIAG.items():
        a = _np.asarray(xs)
        parts.append(
            f"{name}: n={len(a)} p50={_np.median(a)*1e3:.1f}ms "
            f"p90={_np.percentile(a, 90)*1e3:.1f}ms sum={a.sum():.2f}s"
        )
    return "\n".join(parts)


# display normalization ranges for model-state video (reference emulator.py:41-50)
_L255 = float(np.log(255.0))
MODEL_STATES = {
    "new_frame": (0, 255),
    "log_new_frame": (0, _L255),
    "lp_log_frame": (0, _L255),
    "scidvs_highpass": (-_L255 / 8, _L255 / 8),
    "photoreceptor_noise_arr": (-_L255 / 8, _L255 / 8),
    "cs_surround_frame": (0, _L255),
    "c_minus_s_frame": (-_L255 / 8, _L255 / 8),
    "base_log_frame": (-_L255 / 8, _L255 / 8),
    "diff_frame": (-_L255 / 8, _L255 / 8),
}

SINGLE_PIXEL_STATES_FILENAME = "pixel-states.dat"
SINGLE_PIXEL_MAX_SAMPLES = 10000
_PROBE_KEYS = (
    "new_frame",
    "base_log_frame",
    "lp_log_frame",
    "log_new_frame",
    "pos_thres",
    "neg_thres",
    "diff_frame",
    "final_neg_evts_frame",
    "final_pos_evts_frame",
)


def _capacity_bucket(n: int) -> int:
    """Next power-of-two capacity >= n (bounds the set of compiled
    compaction programs)."""
    cap = 4096
    while cap < n:
        cap *= 2
    return cap


def _blob_statics(handle: Dict) -> Tuple[int, int]:
    """(total cells, frames) of a chunk — the trace-time constants that
    pick the sparse-blob byte layout (core.blob_plan)."""
    shape = handle["outs"]["ev_count"].shape
    return int(np.prod(shape)), int(shape[0])


class EventEmulator:
    """Stateful DVS emulator with the reference's constructor surface."""

    def __init__(
        self,
        pos_thres: float = 0.2,
        neg_thres: float = 0.2,
        sigma_thres: float = 0.03,
        cutoff_hz: float = 0.0,
        leak_rate_hz: float = 0.1,
        refractory_period_s: float = 0.0,
        shot_noise_rate_hz: float = 0.0,
        photoreceptor_noise: bool = False,
        leak_jitter_fraction: float = 0.1,
        noise_rate_cov_decades: float = 0.1,
        seed: int = 0,
        output_folder: Optional[str] = None,
        dvs_h5: Optional[str] = None,
        dvs_aedat2: Optional[str] = None,
        dvs_aedat4: Optional[str] = None,
        dvs_text: Optional[str] = None,
        show_dvs_model_state: Optional[List[str]] = None,
        save_dvs_model_state: bool = False,
        output_width: Optional[int] = None,
        output_height: Optional[int] = None,
        device: Optional[str] = None,  # accepted for API parity; unused (XLA picks)
        cs_lambda_pixels: Optional[float] = None,
        cs_tau_p_ms: Optional[float] = None,
        hdr: bool = False,
        scidvs: bool = False,
        record_single_pixel_states: Optional[Tuple[int, int]] = None,
        label_signal_noise: bool = False,
        shuffle_events_within_iteration: bool = True,
        compaction_capacity_hint: Optional[int] = None,
        compaction_select: str = "",
        mesh=None,
        parallel_mode: str = "pixel",
        segment_warmup: int = 8,
        n_segments: Optional[int] = None,
        pad_rows: int = 0,
    ):
        """`mesh`: optional jax.sharding.Mesh for multi-chip conversion.

        parallel_mode='pixel' (default): the pixel plane (image rows) shards
        over the mesh's 'spatial' axis — bit-exact vs single-device.
        parallel_mode='segment': the chunk splits into n_segments contiguous
        time segments sharded over a 1-D 'seg' mesh, each seeded with
        `segment_warmup` overlap frames (warmup events discarded) — better
        scaling for small sensors at high upsampling, events near segment
        boundaries may shift by up to one threshold crossing
        (see v2e_tpu/parallel/convert.py)."""
        if record_single_pixel_states is not None:
            if (
                not isinstance(record_single_pixel_states, tuple)
                or len(record_single_pixel_states) != 2
                or not all(isinstance(i, int) for i in record_single_pixel_states)
            ):
                raise ValueError(
                    f"record_single_pixel_states {record_single_pixel_states} must "
                    "be an (x, y) tuple of ints"
                )

        emit_states: tuple = ()
        if show_dvs_model_state is not None:
            if len(show_dvs_model_state) == 1 and show_dvs_model_state[0] == "all":
                emit_states = tuple(MODEL_STATES.keys())
            else:
                emit_states = tuple(show_dvs_model_state)

        self.cfg = EmulatorConfig(
            pos_thres=pos_thres,
            neg_thres=neg_thres,
            sigma_thres=sigma_thres,
            cutoff_hz=cutoff_hz,
            leak_rate_hz=leak_rate_hz,
            leak_jitter_fraction=leak_jitter_fraction,
            noise_rate_cov_decades=noise_rate_cov_decades,
            refractory_period_s=refractory_period_s,
            shot_noise_rate_hz=shot_noise_rate_hz,
            photoreceptor_noise=photoreceptor_noise,
            hdr=hdr,
            scidvs=scidvs,
            cs_lambda_pixels=cs_lambda_pixels,
            cs_tau_p_ms=cs_tau_p_ms,
            seed=seed,
            probe=record_single_pixel_states,
            emit_states=emit_states,
            select=compaction_select,
        )
        if mesh is not None or pad_rows:
            import dataclasses

            # Pallas kernels don't SPMD-partition over a mesh (and the scan
            # kernel's RNG is not pad-aware)
            self.cfg = dataclasses.replace(
                self.cfg, use_pallas_scan=False, pad_rows=int(pad_rows)
            )
            if pad_rows and parallel_mode == "segment":
                raise ValueError(
                    "pad_rows applies to pixel-plane sharding only "
                    "(segment mode shards time, not rows)"
                )
        if parallel_mode not in ("pixel", "segment"):
            raise ValueError(f"parallel_mode {parallel_mode!r} must be 'pixel' or 'segment'")
        if mesh is not None and parallel_mode == "segment":
            if "seg" not in mesh.axis_names:
                raise ValueError(
                    "segment-parallel mode needs a 1-D mesh with axis 'seg' "
                    "(see v2e_tpu.parallel.convert.make_segment_mesh)"
                )
            if record_single_pixel_states is not None or emit_states:
                raise ValueError(
                    "segment-parallel mode does not support the single-pixel "
                    "probe or model-state emission (use parallel_mode='pixel')"
                )
        self.parallel_mode = parallel_mode
        self.segment_warmup = int(segment_warmup)
        self.n_segments = n_segments
        self._tail_frames = None  # last warmup+1 frames (segment mode)
        self._tail_times = None  # their absolute f64 times
        self.cfg.validate()

        self.label_signal_noise = label_signal_noise
        self.shuffle = shuffle_events_within_iteration
        self.output_folder = output_folder
        self.output_width = output_width
        self.output_height = output_height
        self.show_dvs_model_state = show_dvs_model_state
        self.save_dvs_model_state = save_dvs_model_state

        # runtime state
        self.params = None
        self.state = None
        self.t_origin: float = 0.0  # absolute f64 time of the chunk origin
        self.t_previous: float = 0.0
        self.frame_counter = 0
        self.num_events_total = 0
        self.num_events_on = 0
        self.num_events_off = 0

        self.mesh = mesh
        seed_val = seed if seed != 0 else int.from_bytes(os.urandom(4), "little")
        self._key = jax.random.key(seed_val)
        self._pr_noise_pending = False
        # sparse-compaction capacity: adapts to the event rate, but each new
        # power-of-two bucket recompiles the chunk program — pass a hint for
        # steady long runs (e.g. expected events per chunk x 2)
        self._capacity = (
            _capacity_bucket(compaction_capacity_hint)
            if compaction_capacity_hint
            else 16384
        )
        self._np_rng = np.random.default_rng(seed if seed != 0 else None)
        # last collected occupied-cell count: sizes the submit-time
        # pre-sliced fetch buffer (see _pre_slice)
        self._last_nocc: Optional[int] = None
        self._last_sparse = None

        # single pixel probe storage (reference emulator.py:291-302)
        self.record_single_pixel_states = record_single_pixel_states
        self.single_pixel_sample_count = 0
        self.single_pixel_states = None
        if record_single_pixel_states is not None:
            self.single_pixel_states = {
                "time": np.full(SINGLE_PIXEL_MAX_SAMPLES, np.nan)
            }
            for k in _PROBE_KEYS:
                self.single_pixel_states[k] = np.full(SINGLE_PIXEL_MAX_SAMPLES, np.nan)

        # output sinks
        self.dvs_h5 = None
        self.dvs_aedat2 = None
        self.dvs_aedat4 = None
        self.dvs_text = None
        self._video_writers: Dict[str, object] = {}
        if output_folder is not None:
            os.makedirs(output_folder, exist_ok=True)
        from v2e_tpu.utils.paths import check_add_suffix

        if dvs_h5:
            from v2e_tpu.io.hdf5 import DVSH5Output

            path = check_add_suffix(os.path.join(output_folder or ".", dvs_h5), ".h5")
            self.dvs_h5 = DVSH5Output(path)
        if dvs_aedat2:
            from v2e_tpu.io.aedat2 import AEDat2Output

            path = check_add_suffix(
                os.path.join(output_folder or ".", dvs_aedat2), ".aedat"
            )
            self.dvs_aedat2 = AEDat2Output(
                path,
                output_width=output_width or 346,
                output_height=output_height or 260,
                label_signal_noise=label_signal_noise,
            )
        if dvs_aedat4:
            from v2e_tpu.io.aedat4 import AEDat4Output

            path = check_add_suffix(
                os.path.join(output_folder or ".", dvs_aedat4), ".aedat4"
            )
            self.dvs_aedat4 = AEDat4Output(
                path,
                output_width=output_width or 640,
                output_height=output_height or 480,
            )
        if dvs_text:
            from v2e_tpu.io.text import DVSTextOutput

            path = check_add_suffix(os.path.join(output_folder or ".", dvs_text), ".txt")
            self.dvs_text = DVSTextOutput(path, label_signal_noise=label_signal_noise)

    # ------------------------------------------------------------------
    def set_dvs_params(self, model: str) -> None:
        """Apply the 'clean'/'noisy' preset (reference emulator.py:513-556).

        Must be called before the first frame (parameters are baked into the
        compiled chunk program at initialization).
        """
        if self.state is not None:
            raise RuntimeError("set_dvs_params must be called before the first frame")
        if model == "clean":
            self.cfg = EmulatorConfig.clean(
                hdr=self.cfg.hdr,
                scidvs=self.cfg.scidvs,
                cs_lambda_pixels=self.cfg.cs_lambda_pixels,
                cs_tau_p_ms=self.cfg.cs_tau_p_ms,
                seed=self.cfg.seed,
                probe=self.cfg.probe,
                emit_states=self.cfg.emit_states,
            )
        elif model == "noisy":
            self.cfg = EmulatorConfig.noisy(
                hdr=self.cfg.hdr,
                scidvs=self.cfg.scidvs,
                cs_lambda_pixels=self.cfg.cs_lambda_pixels,
                cs_tau_p_ms=self.cfg.cs_tau_p_ms,
                seed=self.cfg.seed,
                probe=self.cfg.probe,
                emit_states=self.cfg.emit_states,
            )
        else:
            logger.warning(
                f"dvs_params '{model}' not known: using command-line options"
            )

    def reset(self) -> None:
        """Re-initialize on the next frame (reference emulator.py:558-578)."""
        self.params = None
        self.state = None
        self.t_origin = 0.0
        self.t_previous = 0.0
        self.frame_counter = 0
        self.num_events_total = 0
        self.num_events_on = 0
        self.num_events_off = 0

    # ------------------------------------------------------------------
    def _initialize(self, first_frame: np.ndarray, t0: float) -> None:
        self._key, sub = jax.random.split(self._key)
        frame = jnp.asarray(first_frame, dtype=jnp.float32)
        if self.output_height is None:
            self.output_height, self.output_width = frame.shape
        self.t_origin = float(t0)
        self.params, self.state = init_state(
            self.cfg, frame, jnp.float32(0.0), sub
        )
        if self.cfg.photoreceptor_noise:
            # amplitude calibrated once the sample rate is known (first dt)
            self._pr_noise_pending = True
        else:
            self._pr_noise_pending = False

    def _calibrate_photoreceptor_noise(self, delta_time: float) -> None:
        vrms = compute_photoreceptor_noise_voltage(
            shot_noise_rate_hz=self.cfg.shot_noise_rate_hz,
            f3db=self.cfg.cutoff_hz,
            sample_rate_hz=1.0 / delta_time,
            pos_thr=self.cfg.pos_thres,
            neg_thr=self.cfg.neg_thres,
            sigma_thr=self.cfg.sigma_thres,
            rng=self._np_rng,
        )
        self.params = self.params.replace(
            photoreceptor_noise_vrms=jnp.float32(vrms)
        )
        self._pr_noise_pending = False

    # ------------------------------------------------------------------
    def generate_events(
        self, new_frame: np.ndarray, t_frame: float
    ) -> Optional[np.ndarray]:
        """Single-frame API of the reference (emulator.py:619-1022).

        Returns float [N,4] = [t, x, y, p(+-1)] or None (first frame / no
        events).
        """
        ev = self.generate_events_batch(
            np.asarray(new_frame)[None, ...], np.array([t_frame], dtype=np.float64)
        )
        if ev is None or ev.shape[0] == 0:
            return None
        return ev

    def generate_events_batch(
        self, frames: np.ndarray, times: np.ndarray
    ) -> Optional[np.ndarray]:
        """Chunked fast path: emulate F frames in one device program.

        Args:
          frames: [F,H,W] linear 0-255 (or HDR log) frames.
          times: [F] float64 absolute times, strictly increasing.

        Returns concatenated events of the chunk (None if none).
        """
        handle = self.submit_batch(frames, times)
        if handle is None:
            return None
        events, _, _ = self.collect(handle)
        return events if events.shape[0] else None

    def submit_batch(self, frames, times) -> Optional[Dict]:
        """Dispatch a chunk to the device WITHOUT waiting for results.

        Returns an opaque handle for `collect`, or None if the chunk only
        initialized the emulator.  Submitting chunk k+1 before collecting
        chunk k overlaps device compute/transfers with host materialization
        and hides per-call link latency on remote-attached devices.  One
        fused program per chunk does scan + compaction; the host later
        fetches a single packed dict.
        """
        # device arrays (e.g. SloMo output) stay on device — no host round trip
        if not isinstance(frames, jnp.ndarray):
            frames = np.asarray(frames)
        times = np.asarray(times, dtype=np.float64)
        if frames.ndim != 3 or frames.shape[0] != times.shape[0]:
            raise ValueError("frames must be [F,H,W] matching times [F]")
        if self.frame_counter and times[0] < self.t_previous:
            raise ValueError(
                f"frame time {times[0]} is earlier than previous {self.t_previous}"
            )

        start = 0
        if self.state is None:
            self._initialize(frames[0], times[0])
            self.t_previous = float(times[0])
            self.frame_counter += 1
            if self.dvs_h5 is not None:
                self.dvs_h5.appendFrame(
                    np.asarray(frames[0]), ts=float(times[0]),
                    ev_idx=self.dvs_h5.numEventsWritten,
                )
            start = 1
            if start >= frames.shape[0]:
                return None

        if self._pr_noise_pending:
            self._calibrate_photoreceptor_noise(
                float(times[start]) - self.t_previous
            )

        # ship in the source dtype (uint8 video frames cost 4x less over the
        # host link); the device casts to f32 in the chunk program
        chunk = jnp.asarray(frames[start:])
        t_origin = self.t_origin
        rel_times = jnp.asarray(times[start:] - t_origin, dtype=jnp.float32)

        if self.mesh is not None and self.parallel_mode == "segment":
            from v2e_tpu.parallel.convert import emulate_and_compact_segmented

            W = self.segment_warmup
            if self._tail_frames is None:
                # first chunk: replicate the init frame (dt=0 replays are
                # exact no-ops through the whole model)
                self._tail_frames = jnp.broadcast_to(
                    jnp.asarray(frames[0], jnp.float32),
                    (W + 1, *frames.shape[1:]),
                )
                self._tail_times = np.full(W + 1, float(times[0]))
            S = self.n_segments or self.mesh.devices.size
            tail_rel = jnp.asarray(
                self._tail_times - t_origin, dtype=jnp.float32
            )
            self.state, outs, packed = emulate_and_compact_segmented(
                self.cfg, self.params, self.state, chunk, rel_times,
                self._tail_frames, tail_rel, S, W, self._capacity, self.mesh,
            )
            # roll the tail buffer: last W+1 frames precede the next chunk
            allf = jnp.concatenate(
                [jnp.asarray(self._tail_frames, jnp.float32),
                 jnp.asarray(chunk, jnp.float32)]
            )
            self._tail_frames = allf[-(W + 1):]
            self._tail_times = np.concatenate(
                [self._tail_times, np.asarray(times[start:], np.float64)]
            )[-(W + 1):]
        else:
            if self.cfg.pad_rows:
                # inert rows so H shards evenly (see EmulatorConfig.pad_rows)
                chunk = jnp.pad(
                    chunk, ((0, 0), (0, self.cfg.pad_rows), (0, 0))
                )
            if self.mesh is not None:
                from v2e_tpu.parallel.mesh import shard_emulator_args

                self.params, self.state, chunk, rel_times = shard_emulator_args(
                    self.mesh, self.params, self.state, chunk, rel_times
                )
            self.state, outs, packed = emulate_and_compact(
                self.cfg, self.params, self.state, chunk, rel_times, self._capacity
            )

        self.frame_counter += frames.shape[0] - start
        self.t_previous = float(times[-1])

        # rebase chunk-relative device times to keep f32 precision over long runs
        last_rel = float(times[-1] - t_origin)
        if last_rel > 8.0:
            self.state = rebase_state(self.state, jnp.float32(last_rel))
            self.t_origin += last_rel

        handle = {
            "outs": outs,
            "packed": packed,
            # arrays clamp to the cell count when the chunk is smaller than
            # the capacity bucket
            "capacity": int(packed["sparse"]["idx"].shape[0]),
            "t_origin": t_origin,
            "times": times[start:],
            "shape": tuple(chunk.shape),
            "frames_for_h5": frames[start:] if self.dvs_h5 is not None else None,
        }
        self._pre_slice(handle)
        return handle

    def submit_batch_fused(
        self, fused_fn, statics, flow_params, interp_params, frames, times
    ) -> Dict:
        """Dispatch a single-program SloMo-interpolate + emulate + compact
        chunk (see v2e_tpu.fused.fused_chunk).

        Args:
          frames: [B+1,H,W] SOURCE frames (uint8 ships 4x cheaper).
          times: [B*U] absolute f64 interpolated-frame times.

        Requires initialized state (run the first chunk through
        `submit_batch`) and single-device mode.  Returns a `collect` handle.
        """
        if self.state is None:
            raise RuntimeError(
                "submit_batch_fused needs an initialized emulator (feed the "
                "first chunk through submit_batch)"
            )
        if self.mesh is not None or self.cfg.pad_rows:
            raise RuntimeError("fused submission is single-device only")
        times = np.asarray(times, dtype=np.float64)
        if self.frame_counter and times[0] < self.t_previous:
            raise ValueError(
                f"frame time {times[0]} is earlier than previous {self.t_previous}"
            )
        if self._pr_noise_pending:
            self._calibrate_photoreceptor_noise(
                float(times[0]) - self.t_previous
            )
        if not isinstance(frames, jnp.ndarray):
            frames = jnp.asarray(frames)
        t_origin = self.t_origin
        rel_times = jnp.asarray(times - t_origin, dtype=jnp.float32)

        self.state, outs, packed = fused_fn(
            self.cfg, statics, self.params, self.state, flow_params,
            interp_params, self._capacity, frames, rel_times,
        )
        n_out = times.shape[0]
        self.frame_counter += n_out
        self.t_previous = float(times[-1])
        last_rel = float(times[-1] - t_origin)
        if last_rel > 8.0:
            self.state = rebase_state(self.state, jnp.float32(last_rel))
            self.t_origin += last_rel
        H, W = statics[0], statics[1]
        handle = {
            "outs": outs,
            "packed": packed,
            "capacity": int(packed["sparse"]["idx"].shape[0]),
            "t_origin": t_origin,
            "times": times,
            "shape": (int(n_out), H, W),
            "frames_for_h5": None,
            "fused": True,
        }
        self._pre_slice(handle)
        return handle

    def _pre_slice(self, handle: Dict) -> None:
        """Dispatch the phase-2 trim + device->host copies at SUBMIT time.

        Dispatched at collect time, `slice_packed` lands at the BACK of the
        device queue — behind every in-flight chunk — so a depth-6 pipeline
        paid ~330 ms per fetch where the link itself needs ~60 ms (measured
        round 4, V2E_COLLECT_DIAG).  Dispatching it here queues it directly
        after its producing chunk program, so by collect time the trimmed
        blob is computed and the fetch pays only the link transfer.  The
        trim capacity is predicted from the last collected occupancy (next
        power-of-two over 1.25x; event counts vary a few % chunk to chunk)
        — a mispredict falls back to the collect-time slice path, it never
        loses events.  (`copy_to_host_async` would hide the transfer too,
        but on the tunneled backend it measured 300x SLOWER than a plain
        blocking fetch — 20 s vs 62 ms for 200 KB — so it is not used.)
        """
        n_pred = self._last_nocc
        if n_pred is None:
            return
        pcap = min(
            _capacity_bucket(int(1.25 * n_pred) + 1), handle["capacity"]
        )
        total, frames = _blob_statics(handle)
        pre = slice_packed(handle["packed"]["sparse"], pcap, total, frames)
        handle["pre_sliced"] = (pcap, pre)

    def collect(self, handle: Dict):
        """Fetch + materialize a submitted chunk; writes the output sinks.

        Returns (events f64[N,4], labels, frame_offsets).  Chunks must be
        collected in submission order (sinks are sequential files).

        Split form for pipelined drivers: `collect(h)` ==
        `collect_finalize(h, collect_fetch(h))`.  A driver with one fetcher
        thread and one finalizer thread overlaps chunk N's link fetches
        with chunk N-1's host materialization (both stages stay in
        submission order); see bench.py / models/pipeline.py.
        """
        return self.collect_finalize(handle, self.collect_fetch(handle))

    def collect_fetch(self, handle: Dict) -> Dict:
        """Stage 1 of `collect`: wait for the device program, fetch the
        packed scalars + sparse blob over the link (plus any probe/state
        arrays), and handle capacity-overflow recompaction.  Device/link
        I/O only — no sink writes — so it may run concurrently with an
        earlier chunk's `collect_finalize`."""
        dev_packed = handle["packed"]
        has_shot = self.cfg.simple_shot_noise
        phases: Optional[List[Tuple[str, float]]] = None
        if _COLLECT_DIAG_ON:
            import time as _time

            phases = [("start", _time.perf_counter())]
        # phase 1: ONE small fetch (all per-frame scalars + occupancy)
        scalars_np = np.asarray(dev_packed["scalars"])
        _diag_mark(phases, "wait_phase1")
        if handle.get("fused"):
            # fused chunks append the max-flow magnitude (v2e_tpu.fused)
            handle["max_flow"] = float(scalars_np[-1:].view(np.float32)[0])
            scalars_np = scalars_np[:-1]
        packed = unpack_scalars(scalars_np)
        n_occ = packed["n_occ"]
        self._last_nocc = max(int(n_occ), 1)
        pcap, pre = handle.get("pre_sliced", (0, None))
        if n_occ > handle["capacity"]:
            # rare: compaction capacity overflow — recompact the still-
            # device-resident dense outputs at a sufficient capacity
            cap = _capacity_bucket(n_occ)
            logger.info(f"compaction capacity {handle['capacity']} -> {cap}")
            sparse = compact_chunk(self.cfg, handle["outs"], cap)
            cap_eff = int(sparse["idx"].shape[0])  # clamped to the cell count
            total, frames = _blob_statics(handle)
            packed.update(
                unpack_sparse_blob(
                    np.asarray(slice_packed(sparse, cap_eff, total, frames)),
                    cap_eff, has_shot, total, frames,
                )
            )
            self._capacity = cap
        elif pre is not None and n_occ <= pcap:
            # fast path: the submit-time pre-sliced buffer covers the chunk
            # and its D2H copy has been streaming since the chunk program
            # finished (see _pre_slice) — typically already host-resident
            _diag_mark(phases, "slice_dispatch")
            blob = np.asarray(pre)
            _diag_mark(phases, "fetch_phase2")
            total, frames = _blob_statics(handle)
            packed.update(
                unpack_sparse_blob(blob, pcap, has_shot, total, frames)
            )
            self._capacity = max(
                self._capacity, _capacity_bucket(2 * max(n_occ, 1))
            )
        else:
            # phase 2: ONE fetch of only the occupied bucket (not the 2x
            # headroom), serialized into a single buffer
            fetch_cap = min(_capacity_bucket(max(n_occ, 1)), handle["capacity"])
            total, frames = _blob_statics(handle)
            sliced = slice_packed(
                dev_packed["sparse"], fetch_cap, total, frames
            )
            _diag_mark(phases, "slice_dispatch")
            blob = np.asarray(sliced)
            _diag_mark(phases, "fetch_phase2")
            packed.update(
                unpack_sparse_blob(blob, fetch_cap, has_shot, total, frames)
            )
            # adapt grow-only: each new bucket is a recompile, so never shrink
            self._capacity = max(
                self._capacity, _capacity_bucket(2 * max(n_occ, 1))
            )
        # kept for prewarm_collect (a live reference to ANY chunk's sparse
        # arrays is enough to compile neighboring slice buckets)
        self._last_sparse = (dev_packed["sparse"], _blob_statics(handle))
        fetched = {"packed": packed}
        if self.cfg.probe is not None:
            fetched["probe"] = np.asarray(dev_packed["probe"])
        if self.cfg.emit_states and self.save_dvs_model_state:
            fetched["states"] = jax.device_get(handle["outs"]["states"])
        if phases is not None:
            for (name, t1), (_, t0) in zip(phases[1:], phases[:-1]):
                COLLECT_DIAG.setdefault(name, []).append(t1 - t0)
        return fetched

    def prewarm_collect(self, spreads=(0.5, 1.0, 2.0)) -> None:
        """Compile the phase-2 slice programs for the occupancy buckets
        around the last collected chunk's, so a mid-stream bucket crossing
        never pays a compile inside a measured window (a remote compile
        landed inside a bench window and cost it 8x, round 5).  Call after
        at least one chunk has been collected; no-op before that."""
        if self._last_sparse is None or self._last_nocc is None:
            return
        sparse, (total, frames) = self._last_sparse
        capacity = int(sparse["idx"].shape[0])
        for s in spreads:
            pcap = min(
                _capacity_bucket(int(1.25 * s * self._last_nocc) + 1),
                capacity,
            )
            slice_packed(sparse, pcap, total, frames).block_until_ready()

    def collect_finalize(self, handle: Dict, fetched: Dict):
        """Stage 2 of `collect`: host event materialization + sink writes.
        Must run in submission order (sinks are sequential files)."""
        packed = fetched["packed"]
        n_occ = packed["n_occ"]
        phases: Optional[List[Tuple[str, float]]] = None
        if _COLLECT_DIAG_ON:
            import time as _time

            phases = [("start", _time.perf_counter())]
        F, H, W = handle["shape"]
        times = handle["times"]
        rng = self._np_rng if self.shuffle else None
        if n_occ:
            events, labels, offsets = materialize_events_sparse(
                packed["idx"][:n_occ],
                packed["count"][:n_occ],
                packed["i0"][:n_occ],
                packed["shot"][:n_occ] if "shot" in packed else None,
                packed["stride"], packed["K"], packed["t_prev"],
                packed["t_frame"],
                H, W, handle["t_origin"],
                rng=rng,
                label_signal_noise=self.label_signal_noise,
            )
        else:
            events = np.empty((0, 4), dtype=np.float64)
            labels = np.empty(0, dtype=bool) if self.label_signal_noise else None
            offsets = np.zeros(F + 1, dtype=np.int64)
        _diag_mark(phases, "materialize")

        self.num_events_on += int(np.sum(packed["num_on"]))
        self.num_events_off += int(np.sum(packed["num_off"]))
        self.num_events_total = self.num_events_on + self.num_events_off

        if "probe" in fetched:
            self._record_probe({"probe": fetched["probe"]}, times)
        if "states" in fetched:
            self._handle_state_frames({"states": fetched["states"]}, times)

        # sinks
        if self.dvs_h5 is not None and handle["frames_for_h5"] is not None:
            base_idx = self.dvs_h5.numEventsWritten
            for f, fr in enumerate(np.asarray(handle["frames_for_h5"])):
                self.dvs_h5.appendFrame(
                    fr, ts=float(times[f]), ev_idx=base_idx + int(offsets[f + 1])
                )
            self.dvs_h5.appendEvents(events)
        if self.dvs_aedat2 is not None:
            self.dvs_aedat2.appendEvents(events, signnoise_label=labels)
        if self.dvs_aedat4 is not None:
            self.dvs_aedat4.appendEvents(events, signnoise_label=labels)
        if self.dvs_text is not None:
            self.dvs_text.appendEvents(events, signnoise_label=labels)
        _diag_mark(phases, "sinks")
        if phases is not None:
            for (name, t1), (_, t0) in zip(phases[1:], phases[:-1]):
                COLLECT_DIAG.setdefault(name, []).append(t1 - t0)

        return events, labels, offsets

    # ------------------------------------------------------------------
    def _record_probe(self, outs_np: Dict, times: np.ndarray) -> None:
        if self.single_pixel_states is None or "probe" not in outs_np:
            return
        probe = outs_np["probe"]  # [F, 9]
        for f in range(probe.shape[0]):
            k = self.single_pixel_sample_count
            if k >= SINGLE_PIXEL_MAX_SAMPLES:
                self.save_recorded_single_pixel_states()
                self.single_pixel_states = None
                return
            self.single_pixel_states["time"][k] = times[f]
            for i, name in enumerate(_PROBE_KEYS):
                self.single_pixel_states[name][k] = probe[f, i]
            self.single_pixel_sample_count += 1

    def save_recorded_single_pixel_states(self) -> None:
        if self.single_pixel_states is None:
            return
        path = os.path.join(self.output_folder or ".", SINGLE_PIXEL_STATES_FILENAME)
        with open(path, "wb") as f:
            pickle.dump(self.single_pixel_states, f, protocol=pickle.HIGHEST_PROTOCOL)
        logger.info(
            f"saved single-pixel states with {self.single_pixel_sample_count} "
            f"samples to {path}"
        )

    def _handle_state_frames(self, outs_np: Dict, times: np.ndarray) -> None:
        """Save model-state videos for --save_dvs_model_state.

        Interactive cv2 windows (--show_dvs_model_state in the reference,
        emulator.py:580-617) are headless-stubbed: frames are written to AVI
        when save_dvs_model_state is set.
        """
        if "states" not in outs_np or not self.save_dvs_model_state:
            return
        import cv2

        from v2e_tpu.utils.video import video_writer

        for name, stack in outs_np["states"].items():
            if self.cfg.pad_rows:
                stack = stack[:, : stack.shape[1] - self.cfg.pad_rows]
            lo, hi = MODEL_STATES[name]
            if name not in self._video_writers:
                fn = os.path.join(self.output_folder or ".", name + ".avi")
                h, w = stack.shape[1:]
                self._video_writers[name] = video_writer(fn, h, w)
            vw = self._video_writers[name]
            for f in range(stack.shape[0]):
                img = (stack[f] - lo) / (hi - lo)
                img8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
                vw.write(cv2.cvtColor(img8, cv2.COLOR_GRAY2BGR))

    # ------------------------------------------------------------------
    def save_state(self, path: str) -> None:
        """Checkpoint the emulator for chunked-conversion resume.

        The reference has no pipeline resume (SURVEY.md §5); here the full
        per-pixel state pytree + timing counters go to one .npz so a long
        conversion can continue after interruption (event sink files must
        be re-opened in append mode by the caller).
        """
        if self.state is None:
            raise RuntimeError("no state to save (no frames processed yet)")
        blobs = {"__key_data": np.asarray(jax.random.key_data(self.state.key))}
        for name in ("params", "state"):
            tree = getattr(self, name)
            flat, _ = jax.tree_util.tree_flatten_with_path(tree)
            for kp, leaf in flat:
                if leaf is None:
                    continue
                key_str = f"{name}/" + jax.tree_util.keystr(kp)
                if name == "state" and "key" in key_str:
                    continue
                blobs[key_str] = np.asarray(leaf)
        blobs["__scalars"] = np.array(
            [self.t_origin, self.t_previous, self.frame_counter,
             self.num_events_on, self.num_events_off, self._capacity],
            dtype=np.float64,
        )
        np.savez(path, **blobs)
        logger.info(f"saved emulator state to {path}")

    def load_state(self, path: str) -> None:
        """Restore a checkpoint written by `save_state`.

        The emulator must be constructed with the same configuration and
        must not have processed frames yet.
        """
        if self.state is not None:
            raise RuntimeError("load_state requires a fresh emulator")
        npz = np.load(path)
        # rebuild params/state through a dummy init for the pytree structure
        H = None
        for k in npz.files:
            if k.endswith("pos_thres"):
                H, W = npz[k].shape
        dummy = jnp.zeros((H, W), jnp.float32)
        self._key, sub = jax.random.split(self._key)
        self.params, self.state = init_state(self.cfg, dummy, jnp.float32(0.0), sub)

        def restore(name, tree):
            flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
            leaves = []
            for kp, leaf in flat:
                key_str = f"{name}/" + jax.tree_util.keystr(kp)
                if name == "state" and "key" in key_str:
                    leaves.append(
                        jax.random.wrap_key_data(jnp.asarray(npz["__key_data"]))
                    )
                elif key_str in npz.files:
                    leaves.append(jnp.asarray(npz[key_str]))
                else:
                    leaves.append(leaf)
            return jax.tree_util.tree_unflatten(treedef, leaves)

        self.params = restore("params", self.params)
        self.state = restore("state", self.state)
        sc = npz["__scalars"]
        self.t_origin = float(sc[0])
        self.t_previous = float(sc[1])
        self.frame_counter = int(sc[2])
        self.num_events_on = int(sc[3])
        self.num_events_off = int(sc[4])
        self.num_events_total = self.num_events_on + self.num_events_off
        self._capacity = int(sc[5])
        if self.output_height is None:
            self.output_height, self.output_width = H - self.cfg.pad_rows, W
        logger.info(
            f"restored emulator state from {path} "
            f"(t={self.t_previous:.4f}s, {self.frame_counter} frames)"
        )

    # ------------------------------------------------------------------
    def prepare_storage(self, n_frames: int, frame_ts) -> None:
        """DDD-format frame storage in the H5 file (reference emulator.py:374-400)."""
        if self.dvs_h5 is not None:
            self.dvs_h5.prepare_frame_storage(
                n_frames, frame_ts, self.output_height, self.output_width
            )

    def cleanup(self) -> None:
        for sink in (self.dvs_h5, self.dvs_aedat2, self.dvs_aedat4, self.dvs_text):
            if sink is not None:
                try:
                    sink.close()
                except Exception:
                    pass
        for vw in self._video_writers.values():
            vw.release()
        self._video_writers = {}
        if self.record_single_pixel_states is not None:
            self.save_recorded_single_pixel_states()
