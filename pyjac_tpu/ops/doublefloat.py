"""Double-float (two-float32) arithmetic primitives.

TPU v5e has no native float64: XLA emulates it (correct but ~20-80x
slower than f32, and unavailable inside Pallas kernels). These
primitives implement error-free transformations on f32 pairs
(hi, lo) with |lo| <= ulp(hi)/2 — roughly 2^-48 relative precision,
comfortably inside the 1e-8 parity bar — and are the building blocks
for the planned f64-grade Pallas kernel (docs/roadmap.md).

Classic algorithms: Knuth two_sum, Dekker/Veltkamp split + two_prod
(no FMA assumed: XLA:TPU lowers multiplies and adds separately).
All functions are shape-polymorphic jnp ops, usable inside Pallas.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

# Veltkamp split constant for float32 (24-bit mantissa): 2^12 + 1
_SPLIT = jnp.float32(4097.0)


class DD(NamedTuple):
    """A double-float value hi + lo."""
    hi: jnp.ndarray
    lo: jnp.ndarray


def two_sum(a, b) -> DD:
    """Error-free a + b (Knuth): s + e == a + b exactly."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return DD(s, e)


def fast_two_sum(a, b) -> DD:
    """Error-free a + b assuming |a| >= |b| (Dekker)."""
    s = a + b
    e = b - (s - a)
    return DD(s, e)


def _split(a) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Veltkamp split: a == a_hi + a_lo with 12-bit halves."""
    t = _SPLIT * a
    a_hi = t - (t - a)
    return a_hi, a - a_hi


def two_prod(a, b) -> DD:
    """Error-free a * b (Dekker): p + e == a * b exactly."""
    p = a * b
    a_hi, a_lo = _split(a)
    b_hi, b_lo = _split(b)
    e = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return DD(p, e)


def dd_from(x) -> DD:
    x = jnp.asarray(x, jnp.float32)
    return DD(x, jnp.zeros_like(x))


def dd_add(a: DD, b: DD) -> DD:
    s = two_sum(a.hi, b.hi)
    t = two_sum(a.lo, b.lo)
    c = s.lo + t.hi
    v = fast_two_sum(s.hi, c)
    w = t.lo + v.lo
    return fast_two_sum(v.hi, w)


def dd_add_f(a: DD, b) -> DD:
    s = two_sum(a.hi, b)
    return fast_two_sum(s.hi, s.lo + a.lo)


def dd_neg(a: DD) -> DD:
    return DD(-a.hi, -a.lo)


def dd_sub(a: DD, b: DD) -> DD:
    return dd_add(a, dd_neg(b))


def dd_mul(a: DD, b: DD) -> DD:
    p = two_prod(a.hi, b.hi)
    e = p.lo + (a.hi * b.lo + a.lo * b.hi)
    return fast_two_sum(p.hi, e)


def dd_mul_f(a: DD, b) -> DD:
    p = two_prod(a.hi, b)
    return fast_two_sum(p.hi, p.lo + a.lo * b)


def dd_div(a: DD, b: DD) -> DD:
    q1 = a.hi / b.hi
    r = dd_sub(a, dd_mul_f(b, q1))
    q2 = r.hi / b.hi
    r2 = dd_sub(r, dd_mul_f(b, q2))
    q3 = r2.hi / b.hi
    q = fast_two_sum(q1, q2)
    return fast_two_sum(q.hi, q.lo + q3)


def dd_sum(values_hi, values_lo, axis: int = 0) -> DD:
    """Compensated reduction of a stack of dd values along ``axis``
    via sequential dd_add (use small axes; O(n) depth)."""
    n = values_hi.shape[axis]
    acc = DD(jnp.take(values_hi, 0, axis=axis),
             jnp.take(values_lo, 0, axis=axis))
    for i in range(1, n):
        acc = dd_add(acc, DD(jnp.take(values_hi, i, axis=axis),
                             jnp.take(values_lo, i, axis=axis)))
    return acc


def dd_to_f64(a: DD):
    """Reconstruct float64 (for testing on CPU; not for TPU hot paths)."""
    return a.hi.astype(jnp.float64) + a.lo.astype(jnp.float64)
