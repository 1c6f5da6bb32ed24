"""Shared helpers for the batched kernels."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Guard floor used by the reference generated code for log10 arguments
# (reference: pyjac/core/rate_subs.py:1189-1233 'fmax(..., 1.0e-300)').
TINY = 1.0e-300
LOG10 = float(np.log(10.0))


def f(packed_array):
    """Constant tensor in the active default float dtype.

    Packed data is float64 numpy; under ``jax_enable_x64`` this stays
    f64, otherwise it is demoted to f32 so a single code path serves
    both the parity configuration and the high-throughput one.
    """
    arr = jnp.asarray(packed_array)
    if arr.dtype == jnp.float64 and not jax.config.jax_enable_x64:
        arr = arr.astype(jnp.float32)
    return arr


def i(packed_array):
    return jnp.asarray(packed_array, dtype=jnp.int32)


def safe_log10(x):
    """log10 clamped away from zero exactly like the reference's
    ``log10(fmax(x, 1e-300))``; the clamp also zeroes the derivative
    below the floor, keeping forward-mode AD NaN-free."""
    return jnp.log10(jnp.maximum(x, TINY))


def safe_log(x):
    return jnp.log(jnp.maximum(x, TINY))


def int_pow(c, nu_int: int):
    """c ** nu for a small static integer nu, as repeated multiplication
    (mirrors the reference's unrolled multiplications,
    rate_subs.py:641-648)."""
    if nu_int == 0:
        return jnp.ones_like(c)
    out = c
    for _ in range(nu_int - 1):
        out = out * c
    return out
