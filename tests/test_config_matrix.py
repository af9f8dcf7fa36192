"""Combination smoke sweep: every (estimators × subspace_method ×
scan_mode × compute_dtype × geometry) combination must build, compile,
and produce finite, correctly-shaped outputs on tiny inputs — catches
cross-feature wiring bugs the targeted tests can't."""

import dataclasses
import itertools

import numpy as np
import pytest

from doa_tpu.configs import (
    ArrayGeometry, DoaConfig, Estimator, GridSpec1D, GridSpec2D,
    WidebandSpec)
from doa_tpu.io import SourceSpec, synth_ula_iq, synth_ura_iq
from doa_tpu.pipeline_tpu import build_pipeline_tpu

EST_SETS = [
    (Estimator.MUSIC,),
    (Estimator.MUSIC, Estimator.CAPON),
    (Estimator.MUSIC, Estimator.ROOT_MUSIC, Estimator.ESPRIT),
]
METHODS = ["power", "eigh", "jacobi"]
SCANS = ["dense", "hierarchical"]
DTYPES = ["float32", "bfloat16"]


@pytest.mark.parametrize(
    "ests,method,scan,dtype",
    [(e, m, s, d)
     for e, m, s, d in itertools.product(EST_SETS, METHODS, SCANS, DTYPES)
     if not (s == "hierarchical" and m != "power")][::2],  # thin the grid
)
def test_ula_combo(ests, method, scan, dtype):
    cfg = DoaConfig(
        geometry=ArrayGeometry("ula", 8, 0.5),
        snapshot_size=128, overlap=64, num_sources=2,
        estimators=ests, grid=GridSpec1D(num_points=128),
        num_max_vals=2, subspace_method=method, scan_mode=scan,
        compute_dtype=dtype)
    x = synth_ula_iq(
        [SourceSpec(theta_deg=60.0), SourceSpec(theta_deg=115.0,
                                                freq_norm=0.3)],
        8, 0.5, 8 * 128, snr_db=15, seed=3)
    res = build_pipeline_tpu(cfg)(x)
    B = (8 * 128 - 128) // 64 + 1
    for est in ests:
        if est in (Estimator.MUSIC, Estimator.CAPON):
            a = np.asarray(res.peak_angles[est.value])
            assert a.shape == (B, 2)
            assert np.isfinite(a).all()
            assert ((a >= 0) & (a <= 180)).all()
    if Estimator.ROOT_MUSIC in ests:
        assert np.isfinite(np.asarray(res.root_music_angles)).all()
    if Estimator.ESPRIT in ests:
        assert np.isfinite(np.asarray(res.esprit_angles)).all()


@pytest.mark.parametrize("scan", SCANS)
@pytest.mark.parametrize("wb", [False, True])
def test_ura_combo(scan, wb):
    cfg = DoaConfig(
        geometry=ArrayGeometry("ura", 16, 0.5, shape=(4, 4)),
        snapshot_size=128, num_sources=1,
        estimators=(Estimator.MUSIC,),
        grid2d=GridSpec2D(num_az=24, num_el=12),
        wideband=(WidebandSpec(num_subbands=4, fractional_bw=0.1)
                  if wb else WidebandSpec()),
        num_max_vals=1, scan_mode=scan)
    x = synth_ura_iq([SourceSpec(az_deg=20.0, el_deg=40.0)],
                     (4, 4), 0.5, 8 * 128, snr_db=15, seed=4)
    res = build_pipeline_tpu(cfg)(x)
    a = np.asarray(res.peak_angles["music"])
    assert a.shape[-1] == 2
    assert np.isfinite(a).all()
