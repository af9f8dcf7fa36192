"""Source-power-imbalance envelope sweep (docs/ACCURACY.md table).

CPU f32 (exact arithmetic — the envelope is an algorithm property;
TPU tf32 matches per validate_tpu.py). Two sources 60/110 deg at 10 dB
SNR, second source attenuated by imb dB; MUSIC RMSE/resolve per
schedule column."""
import dataclasses

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from doa_tpu.configs import (ArrayGeometry, DoaConfig, Estimator,
                             GridSpec1D)
from doa_tpu.io import SourceSpec, synth_ula_iq
from doa_tpu.pipeline_tpu import build_pipeline_tpu

BASE = DoaConfig(
    geometry=ArrayGeometry(kind="ula", num_elements=16, norm_spacing=0.5),
    snapshot_size=1024, num_sources=2,
    estimators=(Estimator.MUSIC,),
    grid=GridSpec1D(num_points=1024), num_max_vals=2)

COLS = {
    "default (esc)": dict(power_schedule="e1"),   # escalation default-on
    "e1 no-esc": dict(power_schedule="e1", subspace_escalate=False),
    "e2": dict(power_schedule="e2", subspace_escalate=False),
    "e4": dict(power_schedule="e4"),
    "e1+guard": dict(power_schedule="e1", subspace_check=True,
                     subspace_escalate=False),
    "eigh": dict(subspace_method="eigh"),
}


def run(cfg, imb_db, trials=3, windows=8):
    errs, res = [], []
    T = windows * cfg.snapshot_size
    pipe = build_pipeline_tpu(cfg)
    for tr in range(trials):
        amp = 10 ** (-imb_db / 20)
        x = synth_ula_iq(
            [SourceSpec(theta_deg=60.0, freq_norm=0.1, amplitude=1.0),
             SourceSpec(theta_deg=110.0, freq_norm=0.3, amplitude=amp)],
            16, 0.5, T, snr_db=10, seed=100 + tr)
        a = np.sort(np.asarray(pipe(x).peak_angles["music"]), -1)
        e = a - np.array([60.0, 110.0])
        ok = np.abs(e).max(-1) < 2.0
        res.append(ok)
        errs.append(e[ok])
    res = np.concatenate(res)
    errs = np.concatenate([e.ravel() for e in errs]) if any(
        e.size for e in errs) else np.array([])
    rmse = float(np.sqrt(np.mean(errs ** 2))) if errs.size else float("nan")
    return rmse, float(res.mean())


def main():
    print(f"{'imb(dB)':>8}", *[f"{c:>16}" for c in COLS], sep="")
    for imb in (0.0, 5.0, 10.0, 15.0, 20.0, 25.0):
        row = [f"{imb:8.0f}"]
        for name, over in COLS.items():
            cfg = dataclasses.replace(BASE, **over)
            rmse, p = run(cfg, imb)
            row.append(f"{rmse:10.3f}/{p:4.2f} ")
        print("".join(row), flush=True)


if __name__ == "__main__":
    main()
