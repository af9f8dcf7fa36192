"""End-to-end validation of all five BASELINE presets on real TPU.

Hardware accuracy gate: CPU tests (and Pallas interpret mode) execute
exact f32 arithmetic, so they CANNOT catch TPU matmul-precision
regressions (docs/PERF.md "matmul precision"). Run this after touching
any compute path; every estimate should match truth to ~0.01 deg
(c1-c4) / the wideband tolerance (c5).

Run: timeout 3600 python validate_tpu.py
"""
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from doa_tpu import PRESETS
from doa_tpu.io.synthetic import SourceSpec, synth_ula_iq, synth_ura_iq
from doa_tpu.pipeline_tpu import build_pipeline_tpu

def log(m): print(m, flush=True)

cfg = PRESETS["c1_ula4_tone"]
x = synth_ula_iq([SourceSpec(theta_deg=72.3, freq_norm=0.1)], 4, 0.5,
                 64 * 256, snr_db=10, seed=1).astype(np.complex64)
r = build_pipeline_tpu(cfg)(x)
log(f"c1: est {np.sort(np.asarray(r.peak_angles['music']), -1).mean(0)} truth [72.3]")

cfg = PRESETS["c2_ula8_2src"]
x = synth_ula_iq([SourceSpec(theta_deg=60.0, freq_norm=0.1),
                  SourceSpec(theta_deg=110.0, freq_norm=0.31)], 8, 0.5,
                 16 * 2048, snr_db=10, seed=2).astype(np.complex64)
r = build_pipeline_tpu(cfg)(x)
for n in ("music", "capon"):
    log(f"c2 {n}: {np.sort(np.asarray(r.peak_angles[n]), -1).mean(0)} truth [60 110]")

cfg = PRESETS["c3_ula16_calib_smooth"]
srcs = [SourceSpec(theta_deg=40.0, freq_norm=0.12),
        SourceSpec(theta_deg=70.0, freq_norm=0.12),   # same tone: coherent
        SourceSpec(theta_deg=100.0, freq_norm=0.3)]
x = synth_ula_iq(srcs, 16, 0.5, 32 * 1024, snr_db=10, seed=3).astype(np.complex64)
r = build_pipeline_tpu(cfg)(x)
log(f"c3 music: {np.sort(np.asarray(r.peak_angles['music']), -1).mean(0)} truth [40 70 100]")

cfg = PRESETS["c4_ula16_streaming"]
x = synth_ula_iq([SourceSpec(theta_deg=80.0, freq_norm=0.11),
                  SourceSpec(theta_deg=100.0, freq_norm=0.27)], 16, 0.5,
                 32 * 1024, snr_db=10, seed=4).astype(np.complex64)
r = build_pipeline_tpu(cfg)(x)
log(f"c4 music: {np.sort(np.asarray(r.peak_angles['music']), -1).mean(0)} truth [80 100]")

# bench configuration (e4@8 schedule, equal-power envelope) and the
# imbalance envelope of the robust default — a real-signal accuracy pin
# for the headline number and for the ACCURACY imbalance table on
# hardware (tf32) arithmetic.
import dataclasses
from doa_tpu.configs import (
    ArrayGeometry, DoaConfig, Estimator, GridSpec1D)
bench_cfg = DoaConfig(
    geometry=ArrayGeometry(kind="ula", num_elements=16, norm_spacing=0.5),
    snapshot_size=1024, overlap=0, num_sources=2,
    estimators=(Estimator.MUSIC,), grid=GridSpec1D(num_points=1024),
    num_max_vals=2, scan_mode="pallas", cov_impl="pallas",
    power_schedule="e4", power_iters=8)
x = synth_ula_iq([SourceSpec(theta_deg=60.0, freq_norm=0.1),
                  SourceSpec(theta_deg=110.0, freq_norm=0.27)], 16, 0.5,
                 32 * 1024, snr_db=10, seed=6).astype(np.complex64)
r = build_pipeline_tpu(bench_cfg)(x)
log(f"bench cfg e4@8: {np.sort(np.asarray(r.peak_angles['music']), -1).mean(0)} truth [60 110]")

imb_cfg = dataclasses.replace(bench_cfg, scan_mode="auto",
                              cov_impl="auto", power_schedule="e1")
x = synth_ula_iq([SourceSpec(theta_deg=60.0, freq_norm=0.1),
                  SourceSpec(theta_deg=110.0, freq_norm=0.27,
                             amplitude=10 ** (-10 / 20))], 16, 0.5,
                 32 * 1024, snr_db=10, seed=7).astype(np.complex64)
r = build_pipeline_tpu(imb_cfg)(x)
log(f"default e1 @ 10dB imbalance: {np.sort(np.asarray(r.peak_angles['music']), -1).mean(0)} truth [60 110]")

cfg = PRESETS["c5_ura64_wideband"]
from doa_tpu.io.synthetic import synth_wideband_ura_iq
x = synth_wideband_ura_iq(
    [SourceSpec(az_deg=-20.0, el_deg=30.0, freq_norm=0.05,
                bandwidth_norm=0.2),
     SourceSpec(az_deg=35.0, el_deg=60.0, freq_norm=0.25,
                bandwidth_norm=0.2)],
    cfg.geometry.shape, 0.5, 32 * 1024,
    fractional_bw=cfg.wideband.fractional_bw, snr_db=10,
    seed=5)
r = build_pipeline_tpu(cfg)(x)
ang = np.asarray(r.peak_angles["music"])          # (B, k, 2) az/el
order = np.argsort(ang[..., 0], axis=-1)          # pair-sort by az per
ang = np.take_along_axis(ang, order[..., None], 1)  # window before mean
log(f"c5 music az/el: {ang.mean(0)} truth [(-20,30),(35,60)]")

# TOPS wideband fusion (r5, ops/tops.py) — hardware precision pin for
# the new compute path: Cpx einsums at the pipeline's tf32 ambient +
# the embedded Jacobi lambda_min. CPU tests are exact f32 and cannot
# catch an MXU-precision regression here.
from doa_tpu.configs import WidebandSpec
from doa_tpu.io.synthetic import synth_wideband_ula_iq
tops_cfg = DoaConfig(
    geometry=ArrayGeometry(kind="ula", num_elements=16, norm_spacing=0.5),
    snapshot_size=1024, num_sources=2, estimators=(Estimator.MUSIC,),
    grid=GridSpec1D(num_points=361),
    wideband=WidebandSpec(num_subbands=8, fractional_bw=0.4,
                          fusion="tops"),
    num_max_vals=2)
x = synth_wideband_ula_iq(
    [SourceSpec(theta_deg=60.0, freq_norm=0.0, bandwidth_norm=0.5),
     SourceSpec(theta_deg=120.0, freq_norm=0.0, bandwidth_norm=0.5)],
    16, 0.5, 32 * 1024, fractional_bw=0.4, snr_db=10, seed=8)
r = build_pipeline_tpu(tops_cfg)(x)
med = np.median(np.sort(np.asarray(r.peak_angles["tops"]), -1), 0)
log(f"tops wideband: {med} truth [60 120]")
