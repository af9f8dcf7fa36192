"""Pallas TPU kernels for the hot ops (SURVEY §2.2 build-mapping note:
the reference fork's Connex-SIMD offload kernels map here).

All kernels operate on split re/im planes (no complex dtype in Pallas TPU)
and are tested in interpreter mode on CPU with golden parity; the jnp
implementations remain as the portable fallback.
"""

from doa_tpu.ops.pallas.music_scan import music_scan_pallas, pack_subspace
from doa_tpu.ops.pallas.covariance import cov_windows_pallas

__all__ = ["music_scan_pallas", "pack_subspace", "cov_windows_pallas"]
