"""exp_tops.py — wideband fusion-mode accuracy comparison (r5).

Common scene, three fusion modes (incoherent | cssm | tops), RMSE of
per-window peak estimates vs SNR. ULA-16, F=8 subbands, fractional_bw
0.4, two equal-power band-filling sources at 60/120 deg.

Run (CPU is fine — accuracy only): python exp_tops.py
Results recorded in docs/ACCURACY.md "Wideband fusion modes".
"""

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


if __name__ == "__main__":
    run()
