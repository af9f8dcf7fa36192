"""exp_c4_overlap.py — c4 streaming preset (overlap=512) on TPU.

Planted 70/110 deg scene via bench.py's generator; 32,767 sliding
windows per T=2**24 call (gcd-chunk prefix-sum framing). Measured r4:
1,709,164 windows/s at N=64 pipelined (19.17 ms/call), angle check
0.031 deg — docs/PERF.md "c4 streaming preset".
"""

import time, sys, dataclasses
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
def log(m): print(m, file=sys.stderr, flush=True)
def fence(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))
from doa_tpu.configs import PRESETS
from doa_tpu.pipeline_tpu import build_pipeline_tpu
import bench as B
cfg = dataclasses.replace(PRESETS["c4_ula16_streaming"], cov_impl="pallas")
N = 16
T = 1 << 24
pipe = build_pipeline_tpu(cfg, return_spectra=False)
assert pipe.fast_path
# planted 70/110 scene via bench's generator (interleaved layout)
MixR, MixI = B._mix_rows(N)
tp = 128 // (2 * N)
Mix4 = np.zeros((4 * tp, 2 * N * tp), np.float32)
ilv = np.empty((4, 2 * N), np.float32)
ilv[:, 0::2] = MixR; ilv[:, 1::2] = MixI
for p in range(tp):
    Mix4[4*p:4*(p+1), 2*N*p:2*N*(p+1)] = ilv
colw, coloff = B._feature_consts(tp)
hp = jax.lax.Precision.HIGHEST
@jax.jit
def make_input(key):
    rows = T // tp
    r = jnp.arange(rows, dtype=jnp.int32) % (B.PERIOD // tp)
    rf = (tp * r).astype(jnp.float32)
    F4 = jnp.cos(rf[:, None] * jnp.asarray(colw)[None, :] + jnp.asarray(coloff)[None, :])
    sig = jnp.einsum("rc,cd->rd", F4, jnp.asarray(Mix4), precision=hp)
    return sig + jax.random.normal(key, (rows, 2 * N * tp), jnp.float32)
xil = jax.block_until_ready(make_input(jax.random.key(0)))
cr = jnp.ones((N,), jnp.float32); ci = jnp.zeros((N,), jnp.float32)
Ar, Ai = pipe.steering_planes
call = lambda: pipe.jitted_ilv(xil, cr, ci, Ar, Ai)
log("compiling c4 (overlap=512) ...")
fence(call())
ang = np.sort(np.asarray(call()["peak_angles"]["music"]), -1)
nwin = ang.shape[0]
err = np.abs(ang - np.array([70.0, 110.0])).max()
log(f"angle check: {nwin} windows, max err {err:.4f} deg")
for iters in (16, 64):
    t0 = time.perf_counter()
    out = None
    for _ in range(iters): out = call()
    fence(out)
    dt = (time.perf_counter() - t0) / iters
    log(f"c4 pipelined N={iters}: {nwin/dt:.0f} windows/s ({dt*1e3:.2f} ms/call; "
        f"{nwin*512/dt/1e6:.0f} Msamp/s/ch-equiv x16ch)")
