"""Static configuration of the DVS pixel model.

`EmulatorConfig` is a frozen (hashable) dataclass passed to jitted functions
as a static argument: every flag that changes the *structure* of the compute
graph (which noise sources exist, whether CSDVS/SCIDVS are simulated, ...)
lives here, so disabled features compile away to nothing.

Parameter semantics follow the reference constructor
/root/reference/v2ecore/emulator.py:86-163 and the presets at :513-556.
"""
from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class EmulatorConfig:
    """DVS model parameters (all static / trace-time constants)."""

    # nominal log_e thresholds and their per-pixel Gaussian mismatch
    pos_thres: float = 0.2
    neg_thres: float = 0.2
    sigma_thres: float = 0.03

    # photoreceptor first-order IIR lowpass 3dB cutoff; <=0 disables
    cutoff_hz: float = 0.0

    # leak events (junction leakage in the reset switch)
    leak_rate_hz: float = 0.1
    leak_jitter_fraction: float = 0.1
    noise_rate_cov_decades: float = 0.1

    # refractory period; <=0 disables
    refractory_period_s: float = 0.0

    # shot noise: either simple Bernoulli events (photoreceptor_noise=False)
    # or Gaussian noise injected into the photoreceptor (=True)
    shot_noise_rate_hz: float = 0.0
    photoreceptor_noise: bool = False
    shot_noise_inten_factor: float = 0.25  # reference emulator.py:210

    # treat input as log-encoded HDR floating-point gray (skip lin-log)
    hdr: bool = False

    # SCIDVS adaptive-photoreceptor pixel (reference emulator.py:58-84)
    scidvs: bool = False
    scidvs_gain: float = 2.0
    scidvs_tau_s: float = 0.01
    scidvs_tau_cov: float = 0.5

    # center-surround DVS (diffuser network); None disables
    cs_lambda_pixels: Optional[float] = None
    cs_tau_p_ms: Optional[float] = None
    # "exact": closed-form DCT transient (the solution the reference's
    # Euler stepping approximates — its own TODO, emulator.py:1067);
    # "euler": capped lax.while_loop Euler stepping for cross-validation
    csdvs_solver: str = "exact"

    # PRNG seed; 0 means draw fresh entropy
    seed: int = 0

    # rows of inert padding appended to the pixel plane so H shards evenly
    # over a device mesh (pad pixels have huge thresholds / zero noise rates
    # and never emit; per-frame RNG draws stay at the LOGICAL shape so
    # padded multi-chip runs remain bit-exact vs single-device)
    pad_rows: int = 0

    # run the sequential core as the fused Pallas scan kernel when eligible
    # (no refractory/SCIDVS/CSDVS; single device — Pallas calls don't SPMD-
    # partition, so mesh-sharded runs disable this)
    use_pallas_scan: bool = True

    # compaction select scheme: "topk" (word-packed two-phase lax.top_k) or
    # "scan" (prefix-sum + binary-search gather); "" defers to the
    # V2E_SELECT env var (default topk).  Both are entry-for-entry
    # identical (tests/test_emulator.py); the knob exists for in-chunk
    # timing on real hardware.
    select: str = ""

    # observability: record one pixel's internal states per frame (x, y)
    # (reference --record_single_pixel_states, emulator.py:279-302)
    probe: Optional[tuple] = None
    # emit full state frames per step for --show/--save_dvs_model_state;
    # tuple of names from MODEL_STATE_NAMES (reference emulator.py:48-50)
    emit_states: tuple = ()

    # ---- derived structural flags -------------------------------------
    @property
    def csdvs_enabled(self) -> bool:
        return self.cs_lambda_pixels is not None

    @property
    def cs_tau_h_ms(self) -> float:
        """Surround (horizontal-cell) time constant (reference emulator.py:256-258)."""
        if not self.csdvs_enabled:
            return 0.0
        if self.cs_tau_p_ms is None or self.cs_tau_p_ms == 0:
            return 0.0
        return self.cs_tau_p_ms / (self.cs_lambda_pixels**2)

    @property
    def needs_inten01(self) -> bool:
        """Whether intensity rescaling is used (reference emulator.py:669-673)."""
        return self.cutoff_hz > 0 or self.shot_noise_rate_hz > 0

    @property
    def simple_shot_noise(self) -> bool:
        """Bernoulli shot-noise path (reference emulator.py:893)."""
        return self.shot_noise_rate_hz > 0 and not self.photoreceptor_noise

    def validate(self) -> None:
        if self.pad_rows and self.csdvs_enabled:
            raise ValueError(
                "pad_rows is incompatible with the center-surround DVS: the "
                "surround diffusion would couple logical pixels to the pad "
                "rows (use a divisor device count instead)"
            )
        if self.photoreceptor_noise:
            if self.shot_noise_rate_hz == 0:
                raise ValueError(
                    "photoreceptor_noise requires a finite shot_noise_rate_hz"
                )
            if self.cutoff_hz == 0:
                raise ValueError("photoreceptor_noise requires a finite cutoff_hz")

    # ---- presets -------------------------------------------------------
    @classmethod
    def clean(cls, **overrides) -> "EmulatorConfig":
        """The `--dvs_params clean` preset (reference emulator.py:514-523)."""
        base = dict(
            pos_thres=0.2, neg_thres=0.2, sigma_thres=0.02,
            cutoff_hz=0.0, leak_rate_hz=0.0, leak_jitter_fraction=0.0,
            noise_rate_cov_decades=0.0, shot_noise_rate_hz=0.0,
            refractory_period_s=0.0,
        )
        base.update(overrides)
        return cls(**base)

    @classmethod
    def noisy(cls, **overrides) -> "EmulatorConfig":
        """The `--dvs_params noisy` preset (reference emulator.py:525-535)."""
        base = dict(
            pos_thres=0.2, neg_thres=0.2, sigma_thres=0.05,
            cutoff_hz=30.0, leak_rate_hz=0.1, shot_noise_rate_hz=5.0,
            refractory_period_s=0.0, leak_jitter_fraction=0.1,
            noise_rate_cov_decades=0.1,
        )
        base.update(overrides)
        return cls(**base)
