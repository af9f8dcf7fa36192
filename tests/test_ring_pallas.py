"""Pallas ICI ring halo exchange: structural checks everywhere, parity
of the dispatcher's XLA path on the virtual mesh, execution on real
multi-chip TPU only (skipped elsewhere — remote DMAs have no CPU
interpreter; see ops/pallas/ring.py HARDWARE SCOPE)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from doa_tpu.ops.pallas.ring import halo_exchange, halo_exchange_pallas
from doa_tpu.parallel import MeshSpec, make_mesh
from doa_tpu.parallel.mesh import SNAP_AXIS


def test_halo_exchange_xla_path_matches_reference():
    """The dispatcher's ppermute path must reproduce the sharded
    pipeline's halo semantics on the 8-device virtual mesh."""
    mesh = make_mesh(MeshSpec(8, 1))
    T, N, overlap = 512, 4, 32
    rng = np.random.default_rng(0)
    x = rng.standard_normal((T, N)).astype(np.float32)

    def fn(xl):
        return halo_exchange(xl, overlap, SNAP_AXIS, impl="xla")

    out = jax.jit(jax.shard_map(
        fn, mesh=mesh, in_specs=P(SNAP_AXIS, None),
        out_specs=P(SNAP_AXIS, None), check_vma=False))(x)
    out = np.asarray(out).reshape(8, T // 8 + overlap, N)
    for s in range(7):
        np.testing.assert_array_equal(
            out[s, T // 8:], x[(s + 1) * (T // 8):][:overlap])
    np.testing.assert_array_equal(out[7, T // 8:], 0.0)


def test_halo_exchange_pallas_structure():
    """Shape/dtype wiring of the remote-copy kernel (eval_shape needs no
    backend lowering)."""
    mesh = make_mesh(MeshSpec(8, 1))

    def fn(xl):
        return halo_exchange_pallas(xl, 32, SNAP_AXIS)

    mapped = jax.shard_map(fn, mesh=mesh, in_specs=P(SNAP_AXIS, None),
                           out_specs=P(SNAP_AXIS, None), check_vma=False)
    out = jax.eval_shape(mapped,
                         jax.ShapeDtypeStruct((512, 4), jnp.float32))
    assert out.shape == (512 + 8 * 32, 4)
    assert out.dtype == jnp.float32


@pytest.mark.skipif(
    jax.default_backend() == "cpu" or len(jax.devices()) < 2,
    reason="needs >=2 real TPU devices on ICI")
def test_halo_exchange_pallas_multichip():  # pragma: no cover
    n = len(jax.devices())
    mesh = make_mesh(MeshSpec(n, 1))
    T, N, overlap = 128 * n, 8, 16
    rng = np.random.default_rng(1)
    x = rng.standard_normal((T, N)).astype(np.float32)

    def fn(xl):
        return halo_exchange_pallas(xl, overlap, SNAP_AXIS)

    out = jax.jit(jax.shard_map(
        fn, mesh=mesh, in_specs=P(SNAP_AXIS, None),
        out_specs=P(SNAP_AXIS, None), check_vma=False))(x)
    out = np.asarray(out).reshape(n, T // n + overlap, N)
    for s in range(n - 1):
        np.testing.assert_array_equal(
            out[s, T // n:], x[(s + 1) * (T // n):][:overlap])
