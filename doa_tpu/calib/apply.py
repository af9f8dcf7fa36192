"""Applying calibration (reference `antenna_correction` C5 +
`phase_correct_hier` P2).

Both reference blocks are per-channel complex multiplies; here they are one
data vector fused into the pipeline's first elementwise stage (XLA folds it
into the covariance Grams — zero extra memory passes).
"""

from __future__ import annotations

import jax.numpy as jnp


def apply_correction(x, c):
    """x: c64[T, N] × c: c64[N] → corrected samples."""
    return x * jnp.asarray(c)[None, :]


def compose_corrections(*cs):
    """Compose stage-1 phase and stage-2 element corrections (elementwise
    product) into the single vector the pipeline consumes."""
    out = None
    for c in cs:
        c = jnp.asarray(c)
        out = c if out is None else out * c
    return out
