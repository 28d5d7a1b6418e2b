"""Validation and calibration tooling (threshold estimation, comparisons)."""

from v2e_tpu.analysis.thres_estimator import estimate_thresholds

__all__ = ["estimate_thresholds"]
