"""exp_tops.py — wideband fusion-mode accuracy + cost comparison (r5).

Accuracy (default mode; CPU is fine): common scene, three fusion modes
(incoherent | cssm | tops), RMSE of per-window peak estimates vs SNR.
ULA-16, F=8 subbands, fractional_bw 0.4, two equal-power band-filling
sources at 60/120 deg. Results: docs/ACCURACY.md "Wideband fusion
modes".

Cost (`python exp_tops.py perf`, run on TPU): pipelined ms/call for
fusion=incoherent vs tops at B=2048 windows/call (T=2^21 samples/ch),
G=361. Results: docs/PERF.md.
"""

import sys
import time

import numpy as np

from doa_tpu.configs import (
    ArrayGeometry, DoaConfig, Estimator, GridSpec1D, WidebandSpec)
from doa_tpu.io import SourceSpec
from doa_tpu.io.synthetic import synth_wideband_ula_iq
from doa_tpu.pipeline_tpu import build_pipeline_tpu

TRUTH = (60.0, 120.0)
SNRS = (-5.0, 0.0, 5.0, 10.0)
SEEDS = range(4)
T = 32 * 1024


def run():
    for fusion in ("incoherent", "cssm", "tops"):
        cfg = DoaConfig(
            geometry=ArrayGeometry(kind="ula", num_elements=16,
                                   norm_spacing=0.5),
            snapshot_size=1024, num_sources=2,
            estimators=(Estimator.MUSIC,),
            grid=GridSpec1D(num_points=361),
            wideband=WidebandSpec(num_subbands=8, fractional_bw=0.4,
                                  fusion=fusion),
            num_max_vals=2)
        pipe = build_pipeline_tpu(cfg)
        key = "tops" if fusion == "tops" else "music"
        row = []
        for snr in SNRS:
            errs = []
            for seed in SEEDS:
                x = synth_wideband_ula_iq(
                    [SourceSpec(theta_deg=t, freq_norm=0.0,
                                bandwidth_norm=0.5) for t in TRUTH],
                    16, 0.5, T, fractional_bw=0.4, snr_db=snr,
                    seed=seed)
                ang = np.sort(
                    np.asarray(pipe(x).peak_angles[key]), axis=-1)
                errs.append(ang - np.asarray(TRUTH))
            e = np.concatenate(errs, axis=0)
            row.append(float(np.sqrt(np.mean(e ** 2))))
        print(f"{fusion:10s} " + "  ".join(
            f"{snr:+.0f}dB {r:7.3f}" for snr, r in zip(SNRS, row)),
            flush=True)


def perf():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    B = 2048
    T = B * 1024
    x = synth_wideband_ula_iq(
        [SourceSpec(theta_deg=t, freq_norm=0.0, bandwidth_norm=0.5)
         for t in TRUTH],
        16, 0.5, T, fractional_bw=0.4, snr_db=10.0, seed=0)
    for fusion in ("incoherent", "tops"):
        cfg = DoaConfig(
            geometry=ArrayGeometry(kind="ula", num_elements=16,
                                   norm_spacing=0.5),
            snapshot_size=1024, num_sources=2,
            estimators=(Estimator.MUSIC,),
            grid=GridSpec1D(num_points=361),
            wideband=WidebandSpec(num_subbands=8, fractional_bw=0.4,
                                  fusion=fusion),
            num_max_vals=2)
        import jax.numpy as jnp
        from doa_tpu.io.native import split_c64
        pipe = build_pipeline_tpu(cfg, return_spectra=False)
        key = "tops" if fusion == "tops" else "music"
        xr_h, xi_h = split_c64(np.ascontiguousarray(x))
        xr = jax.device_put(xr_h)
        xi = jax.device_put(xi_h)
        cr = jnp.ones((16,), jnp.float32)
        ci = jnp.zeros((16,), jnp.float32)
        Ar, Ai = pipe.steering_planes
        call = lambda: pipe.jitted(  # noqa: E731
            xr, xi, cr, ci, Ar, Ai, *pipe.wb_args)

        def fence(out):
            leaf = out["peak_angles"][key]
            np.asarray(jax.device_get(leaf.ravel()[:1]))

        out = call()
        med = np.median(np.sort(
            np.asarray(out["peak_angles"][key]), -1), 0)
        fence(out)
        iters = 16
        t0 = time.perf_counter()
        for _ in range(iters):
            out = call()
        fence(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{fusion:10s} pipelined {dt * 1e3:8.2f} ms/call "
              f"({B / dt:,.0f} snapshots/s)  angles {med} "
              f"truth {list(TRUTH)}", flush=True)


if __name__ == "__main__":
    (perf if "perf" in sys.argv[1:] else run)()
