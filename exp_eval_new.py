"""Accuracy sweep for the round-2 estimator additions (Min-Norm,
Unitary ESPRIT) on the ACCURACY.md primary scenario, TPU hardware."""
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from doa_tpu.configs import (ArrayGeometry, DoaConfig, Estimator,
                             GridSpec1D)
from doa_tpu.eval import evaluate_ula, print_table

cfg = DoaConfig(
    geometry=ArrayGeometry(kind="ula", num_elements=16, norm_spacing=0.5),
    snapshot_size=1024, num_sources=2,
    estimators=(Estimator.MUSIC, Estimator.MIN_NORM,
                Estimator.UNITARY_ESPRIT),
    grid=GridSpec1D(num_points=1024), num_max_vals=2)

results = evaluate_ula(cfg, [60.0, 110.0],
                       snrs_db=[-10, -5, 0, 5, 10, 20],
                       trials=6, windows_per_trial=24, seed=7)
print_table(results)
