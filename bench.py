"""Benchmark entry point (driver-run on real TPU hardware).

Headline metric (BASELINE.json): Covariance + eigendecomposition + MUSIC
spectrum-scan snapshots/s per chip on a 16-element ULA, 1024-sample
snapshots, 1024-angle grid — the full fused pipeline_tpu program (the
split-complex TPU path), data resident in HBM.

`vs_baseline` is the multiple of REAL-TIME at the north-star operating
point (10 Msps/channel → 9765.625 snapshots/s): vs_baseline ≥ 10 meets
the "≥10× real-time on one v5e chip" target.

Prints exactly one JSON line.
"""

import json
import sys
import time

import numpy as np


def _log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _run(T: int) -> float:
    """→ snapshots/s for a T-samples-per-call pipeline."""
    import jax
    import jax.numpy as jnp

    from doa_tpu.configs import (
        ArrayGeometry, DoaConfig, Estimator, GridSpec1D)
    from doa_tpu.pipeline_tpu import build_pipeline_tpu

    SNAP = 1024
    N = 16
    GRID = 1024
    B = T // SNAP

    cfg = DoaConfig(
        geometry=ArrayGeometry(kind="ula", num_elements=N,
                               norm_spacing=0.5),
        snapshot_size=SNAP,
        overlap=0,
        num_sources=2,
        estimators=(Estimator.MUSIC,),
        grid=GridSpec1D(num_points=GRID),
        num_max_vals=2,
    )
    pipe = build_pipeline_tpu(cfg)
    Ar, Ai = pipe.steering_planes

    # Device-resident synthetic planes (content irrelevant for throughput;
    # random so eigh/subspace see generic Hermitian matrices).
    _log(f"generating device data T=2^{T.bit_length() - 1}")
    key = jax.random.key(0)
    kr, ki = jax.random.split(key)
    xr = jax.random.normal(kr, (T, N), jnp.float32)
    xi = jax.random.normal(ki, (T, N), jnp.float32)
    cr = jnp.ones((N,), jnp.float32)
    ci = jnp.zeros((N,), jnp.float32)

    def one_call():
        out = pipe.jitted(xr, xi, cr, ci, Ar, Ai)
        # Force a device→host fetch of a (tiny) result: on remote/async
        # backends block_until_ready can return at enqueue time; a real
        # roundtrip is the only trustworthy completion fence.
        return np.asarray(out["peak_angles"]["music"])

    _log("compiling + warming")
    one_call()
    one_call()

    _log("timing")
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        one_call()
    dt = time.perf_counter() - t0
    return B * iters / dt


def main():
    SNAP = 1024
    try:
        snaps_per_s = _run(1 << 24)        # 16.8M samples/channel per call
    except Exception as e:                  # e.g. OOM on smaller devices
        _log(f"T=2^24 failed ({type(e).__name__}); retrying at 2^22")
        snaps_per_s = _run(1 << 22)
    realtime = 10e6 / SNAP                  # snapshots/s at 10 Msps
    print(json.dumps({
        "metric": "cov_eigh_music_snapshots_per_s_per_chip_16el",
        "value": round(snaps_per_s, 1),
        "unit": "snapshots/s",
        "vs_baseline": round(snaps_per_s / realtime, 3),
    }))


if __name__ == "__main__":
    main()
