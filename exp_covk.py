"""Stacked cov kernel cost anatomy (headline config).

gram_only measured 6.55 ms vs a 2.6 ms HBM-read floor (2.1 GB input).
Where does the 2.5x go?  Variants:

  read_floor  - kernel that only reduces z (pure DMA + VPU bound)
  bf16        - single-pass bf16 Gram (compute_dtype=bf16): MXU floor
  hi/lo cbN   - production split-Gram at chunks_per_block = N
  hh_only     - hi*hi pass only (no lo term): isolates the 2nd dot +
                transpose cost (timing only, wrong values)
"""
import functools
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from doa_tpu.ops.pallas.cov_embedded import (_cov_kernel_uhat,
                                             interleave_factor)

N, S, T = 16, 1024, 1 << 24
n2 = 2 * N
tp = interleave_factor(N)
n = T // S
rows = S // tp          # rows per chunk


def kernel_call(cb, compute_dtype=jnp.float32, body=None):
    body = body or functools.partial(
        _cov_kernel_uhat, N=N, hop=S, tp=tp, cb=cb,
        compute_dtype=compute_dtype)

    def f(xil):
        return pl.pallas_call(
            body,
            grid=(n // cb,),
            in_specs=[pl.BlockSpec((cb * rows, 2 * N * tp),
                                   lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((cb * n2, n2), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n * n2, n2), jnp.float32),
        )(xil)
    return jax.jit(f)


def _read_kernel(z_ref, u_ref, *, cb):
    z = z_ref[...]
    s = jnp.sum(z, axis=0, keepdims=True)          # (1, 128)
    u_ref[...] = jnp.broadcast_to(s[:, :n2], (cb * n2, n2)) * 0.0 + s[0, 0]


def _hh_kernel(z_ref, u_ref, *, cb):
    f32 = jnp.float32
    gram = lambda a, b: jax.lax.dot_general(  # noqa: E731
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=f32,
        precision=jax.lax.Precision.DEFAULT)
    outs = []
    for c in range(cb):
        z = z_ref[c * rows:(c + 1) * rows, :]
        z_hi = z.astype(jnp.bfloat16)
        U = gram(z_hi, z_hi)
        u32 = U[0:n2, 0:n2]
        for i in range(1, tp):
            u32 = u32 + U[i * n2:(i + 1) * n2, i * n2:(i + 1) * n2]
        outs.append(u32)
    u_ref[...] = jnp.concatenate(outs, axis=0)


def main():
    xil = jax.random.normal(jax.random.key(0), (T // tp, 2 * N * tp),
                            jnp.float32)
    variants = {}
    for cb in (8, 16, 32, 64):
        variants[f"hi/lo cb{cb}"] = kernel_call(cb)
    variants["bf16 cb8"] = kernel_call(8, compute_dtype=jnp.bfloat16)
    variants["bf16 cb32"] = kernel_call(32, compute_dtype=jnp.bfloat16)
    variants["hh_only cb8"] = kernel_call(
        8, body=functools.partial(_hh_kernel, cb=8))
    variants["hh_only cb32"] = kernel_call(
        32, body=functools.partial(_hh_kernel, cb=32))
    variants["read cb8"] = kernel_call(
        8, body=functools.partial(_read_kernel, cb=8))
    variants["read cb32"] = kernel_call(
        32, body=functools.partial(_read_kernel, cb=32))
    ref = None
    for name, fn in variants.items():
        try:
            out = fn(xil)
            np.asarray(jax.device_get(out.ravel()[:1]))
        except Exception as e:  # noqa: BLE001
            print(f"{name:12s} FAILED: {type(e).__name__}", flush=True)
            continue
        if name == "hi/lo cb8":
            ref = np.asarray(out[: 4 * n2])
        elif name.startswith("hi/lo") and ref is not None:
            got = np.asarray(out[: 4 * n2])
            rel = np.abs(got - ref).max() / np.abs(ref).max()
            assert rel < 1e-6, (name, rel)
        out = fn(xil)
        np.asarray(jax.device_get(out.ravel()[:1]))
        t0 = time.perf_counter()
        for _ in range(16):
            out = fn(xil)
        np.asarray(jax.device_get(out.ravel()[:1]))
        dt = (time.perf_counter() - t0) / 16
        print(f"{name:12s} {dt * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
