"""Multi-host tests: two actual processes with jax.distributed over a
localhost coordinator (SURVEY §4: "multi-host tests via jax.distributed
with multi-process-on-one-host"). Each process owns 4 virtual CPU devices;
the global mesh spans 8; the distributed covariance psum must agree with
the single-process result.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import golden

_WORKER = r"""
import os, sys, json
import numpy as np

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)

from doa_tpu.parallel import MeshSpec, make_mesh, distributed_covariance
from doa_tpu.parallel.multihost import DistributedContext, host_local_to_global
from jax.sharding import PartitionSpec as P

assert jax.process_count() == nproc
devices = jax.devices()
assert len(devices) == 4 * nproc
mesh = make_mesh(MeshSpec(n_snap=len(devices), n_grid=1), devices)
ctx = DistributedContext(num_hosts=nproc, host_id=pid, mesh=mesh)

# Each process holds its half of a deterministic capture.
T_total, N = 8192, 8
rng = np.random.default_rng(0)
x_full = (rng.standard_normal((T_total, N))
          + 1j * rng.standard_normal((T_total, N))).astype(np.complex64)
T_local = T_total // nproc
x_local = x_full[pid * T_local:(pid + 1) * T_local]

from doa_tpu.io.native import split_c64
xr_l, xi_l = split_c64(x_local)
xr = host_local_to_global(ctx, xr_l)
xi = host_local_to_global(ctx, xi_l)

from doa_tpu.parallel.sharded import distributed_covariance
from doa_tpu.cpx import Cpx
import jax.numpy as jnp

# jitted global-psum covariance over the 8-device, 2-process mesh
from jax.sharding import NamedSharding
from doa_tpu.parallel.mesh import SNAP_AXIS


def shard_fn(xr, xi):
    Z = jnp.concatenate([xr, xi], axis=-1)
    G = jnp.einsum("si,sj->ij", Z, Z, preferred_element_type=jnp.float32)
    G = jax.lax.psum(G, SNAP_AXIS)
    total = xr.shape[0] * jax.lax.axis_size(SNAP_AXIS)
    G = G / total
    n = xr.shape[1]
    return (G[:n, :n] + G[n:, n:], G[n:, :n] - G[:n, n:])


mapped = jax.shard_map(shard_fn, mesh=mesh,
                       in_specs=(P(SNAP_AXIS, None), P(SNAP_AXIS, None)),
                       out_specs=(P(), P()), check_vma=False)
rr, ri = jax.jit(mapped)(xr, xi)
R = np.asarray(rr) + 1j * np.asarray(ri)
print(json.dumps({"pid": pid, "trace": float(np.trace(R).real),
                  "R00_re": float(R[0, 0].real),
                  "R01_im": float(R[0, 1].imag)}))
"""


@pytest.mark.skipif(os.environ.get("DOA_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
def test_two_process_distributed_covariance(tmp_path):
    port = "29471"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", port],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    # Both processes must see the SAME global covariance.
    assert abs(outs[0]["trace"] - outs[1]["trace"]) < 1e-3
    assert abs(outs[0]["R01_im"] - outs[1]["R01_im"]) < 1e-5

    # And it must equal the single-process covariance of the full capture.
    rng = np.random.default_rng(0)
    x_full = (rng.standard_normal((8192, 8))
              + 1j * rng.standard_normal((8192, 8))).astype(np.complex64)
    R_ref = golden.sample_covariance(x_full[None])[0]
    assert abs(outs[0]["trace"] - np.trace(R_ref).real) < 1e-2
    assert abs(outs[0]["R00_re"] - R_ref[0, 0].real) < 1e-3
    assert abs(outs[0]["R01_im"] - R_ref[0, 1].imag) < 1e-3
