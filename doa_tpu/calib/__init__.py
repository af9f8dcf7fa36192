"""Calibration subsystem.

The reference's two-stage procedure (SURVEY §3.3/§3.4):
  stage 1 — receiver-chain relative phase offsets from a cable-split common
            tone (`phase_offset_est` block + `phase_correct_hier`);
  stage 2 — antenna element gain/phase from a pilot at a known angle
            (`calibrate_lin_array` + `save_antenna_calib` +
            `antenna_correction`).

Here calibration is DATA: estimators produce a complex correction vector
c: c64[N]; applying it is one multiply fused into the pipeline
(doa_tpu.pipeline `correction` argument); persistence is a versioned
artifact (doa_tpu.calib.artifacts).
"""

from doa_tpu.calib.phase_offset import phase_offset_est, phase_correction
from doa_tpu.calib.element_cal import element_calibration
from doa_tpu.calib.apply import apply_correction, compose_corrections
from doa_tpu.calib.artifacts import CalibrationArtifact, save_calibration, load_calibration

__all__ = [
    "phase_offset_est",
    "phase_correction",
    "element_calibration",
    "apply_correction",
    "compose_corrections",
    "CalibrationArtifact",
    "save_calibration",
    "load_calibration",
]
