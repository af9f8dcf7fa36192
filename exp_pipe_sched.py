"""Full fused-pipeline timing across power schedules (headline config)."""
import time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from doa_tpu.configs import ArrayGeometry, DoaConfig, Estimator, GridSpec1D
from doa_tpu.pipeline_tpu import build_pipeline_tpu

T = 1 << 24
SNAP, N, GRID = 1024, 16, 1024
B = T // SNAP


def fence(out):
    leaf = jax.tree_util.tree_leaves(out["peak_angles"])[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


key = jax.random.key(0)
xil = jax.random.normal(key, (T // 4, 128), jnp.float32)
for sched, iters in (("e1", 8), ("e2", 8), ("e4", 8), ("e4", 16)):
    cfg = DoaConfig(
        geometry=ArrayGeometry(kind="ula", num_elements=N,
                               norm_spacing=0.5),
        snapshot_size=SNAP, overlap=0, num_sources=2,
        estimators=(Estimator.MUSIC,), grid=GridSpec1D(num_points=GRID),
        num_max_vals=2, scan_mode="pallas", cov_impl="pallas",
        power_schedule=sched, power_iters=iters)
    pipe = build_pipeline_tpu(cfg, return_spectra=False)
    Ar, Ai = pipe.steering_planes
    cr = jnp.ones((N,), jnp.float32)
    ci = jnp.zeros((N,), jnp.float32)
    call = lambda: pipe.jitted_ilv(xil, cr, ci, Ar, Ai)  # noqa: E731
    fence(call()); fence(call())
    t0 = time.perf_counter()
    out = None
    for _ in range(16):
        out = call()
    fence(out)
    dt = (time.perf_counter() - t0) / 16
    print(f"{sched}@{iters}: {dt * 1e3:6.2f} ms  "
          f"{B / dt:,.0f} snapshots/s", flush=True)
