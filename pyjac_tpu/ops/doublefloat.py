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
import numpy as np

# Veltkamp split constant for float32 (24-bit mantissa): 2^12 + 1.
# np scalars (not jnp): jnp scalars become captured device constants,
# which pallas_call kernels reject.
_SPLIT = np.float32(4097.0)


class DD(NamedTuple):
    """A double-float value hi + lo."""
    hi: jnp.ndarray
    lo: jnp.ndarray


_BARRIER_MODE = 'xla'    # 'xla' | 'bitcast' | 'none'


def _barrier(x):
    """Defeat algebraic simplification: XLA on TPU (with
    --xla_allow_excess_precision) folds error-free transformation
    patterns like (a - (s - bb)) + (b - bb) into zero, silently
    destroying double-float arithmetic (observed: 1e-8 instead of
    1e-13 accuracy). A data-dependence barrier keeps the rounding.

    Mosaic (real-TPU Pallas) has no optimization_barrier lowering, so
    kernel bodies are traced under :func:`barrier_mode` with 'bitcast'
    (an f32<->u32 round-trip Mosaic does not fold) or 'none'."""
    if _BARRIER_MODE == 'none':
        return x
    if _BARRIER_MODE == 'bitcast':
        if jnp.ndim(x) == 0:      # Mosaic tpu.bitcast is vector-only
            return x
        u = jax.lax.bitcast_convert_type(x, jnp.uint32)
        return jax.lax.bitcast_convert_type(u, jnp.float32)
    return jax.lax.optimization_barrier(x)


class barrier_mode:
    """Context manager selecting the simplification barrier used while
    *tracing* dd math (the mode is baked into the traced program)."""

    def __init__(self, mode: str):
        assert mode in ('xla', 'bitcast', 'none'), mode
        self.mode = mode

    def __enter__(self):
        global _BARRIER_MODE
        self.prev = _BARRIER_MODE
        _BARRIER_MODE = self.mode

    def __exit__(self, *exc):
        global _BARRIER_MODE
        _BARRIER_MODE = self.prev


def two_sum(a, b) -> DD:
    """Error-free a + b (Knuth): s + e == a + b exactly.

    Every intermediate is barriered: XLA (allow_excess_precision)
    reassociates partially-protected EFT expressions depending on the
    fusion context (observed: identical math giving different slices
    inside vs outside lax.scan), so each rounding must be pinned."""
    s = _barrier(a + b)
    bb = _barrier(s - a)
    t1 = _barrier(s - bb)
    t2 = _barrier(a - t1)
    t3 = _barrier(b - bb)
    e = t2 + t3
    return DD(s, e)


def fast_two_sum(a, b) -> DD:
    """Error-free a + b assuming |a| >= |b| (Dekker)."""
    s = _barrier(a + b)
    t = _barrier(s - a)
    e = b - t
    return DD(s, e)


def _split(a) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Split a == a_hi + a_lo with <=12-bit-significand halves.

    Mantissa bitmask instead of the classic Veltkamp multiply: the
    Veltkamp constant (2^12+1) * a overflows for |a| > ~8e34, turning
    legitimately-large double-float products (reverse rate constants
    reach ~1e37) into inf -> NaN.  The mask keeps sign+exponent+11
    stored mantissa bits (12 significant); the remainder has <=12
    significant bits, so all cross products in two_prod stay exact.
    Scalars keep Veltkamp (Mosaic's bitcast is vector-only; the only
    0-d dd operands are small physical constants)."""
    if jnp.ndim(a) == 0:
        t = _barrier(_SPLIT * a)
        a_hi = _barrier(t - _barrier(t - a))
        return a_hi, _barrier(a - a_hi)
    # (a scaled-Veltkamp variant was tried for speed: its exact pow2
    # pre-scale denormalizes small operands and costs 2^-24 exactness
    # there — the bitmask is correct at every magnitude)
    u = jax.lax.bitcast_convert_type(a, jnp.uint32)
    a_hi = jax.lax.bitcast_convert_type(u & jnp.uint32(0xFFFFF000),
                                        jnp.float32)
    return a_hi, _barrier(a - a_hi)


def two_prod(a, b) -> DD:
    """Error-free a * b (Dekker): p + e == a * b exactly."""
    p = _barrier(a * b)
    a_hi, a_lo = _split(a)
    b_hi, b_lo = _split(b)
    e1 = _barrier(_barrier(a_hi * b_hi) - p)
    e2 = _barrier(e1 + _barrier(a_hi * b_lo))
    e3 = _barrier(e2 + _barrier(a_lo * b_hi))
    e = e3 + _barrier(a_lo * b_lo)
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


# --- transcendentals --------------------------------------------------------
# Cody-Waite split of ln 2: C1 has a 12-bit mantissa so k * C1 is exact
# for |k| <= 2^11; C1 + C2 + C3 == ln 2 to ~2^-70
_LN2_C1 = np.float32(0.693115234375)
_LN2_C2 = np.float32(3.194618329871446e-05)
_LN2_C3 = np.float32(1.6465717678215697e-12)


def _pow2i(k):
    """2**k for small integer k (f32), via exponent-field construction."""
    biased = (k.astype(jnp.int32) + 127) << 23
    return jax.lax.bitcast_convert_type(biased, jnp.float32)


# Taylor coefficients 1/n! for exp on |r| <= ln2/2, degree 12, as
# double-float (hi, lo) pairs — f32-rounded coefficients alone cost
# ~1e-10 relative error
_EXP_COEFFS = [
    (2.0876755879584152e-09, 1.1082839809204342e-16),
    (2.5052107943679403e-08, 4.4176230446483665e-16),
    (2.755731998149713e-07, -7.575112209051195e-15),
    (2.7557318844628753e-06, 3.793571224297229e-14),
    (2.4801587642286904e-05, -3.40699609366682e-13),
    (0.00019841270113829523, -2.725596874933456e-12),
    (0.0013888889225199819, -3.3631094437103215e-11),
    (0.008333333767950535, -4.34617203337595e-10),
    (0.0416666679084301, -1.2417634698280722e-09),
    (0.1666666716337204, -4.967053879312289e-09),
    (0.5, 0.0), (1.0, 0.0), (1.0, 0.0),
]


def dd_exp(a: DD) -> DD:
    """exp(a) to ~2^-45 relative (vs f32 exp's ~2^-24).

    Argument reduction a = k ln2 + r with ln2 in double-float, then a
    degree-12 Taylor polynomial rescaled by the exact power of two.
    The tail (degrees 7-12) contributes < r^7/7! ~ 2^-21 of the result,
    so it runs in plain f32 Horner form (its 2^-24 relative error lands
    at ~2^-45 absolute) and only degrees 0-6 use dd steps — the dd
    Jacobian kernel is VPU-bound on exactly this function.
    Valid for |a.hi| < 87 (f32 exp range); full ~2^-45 precision
    requires |result| >~ 1e-30 (below that the low word goes
    f32-denormal — the intrinsic double-float range floor).
    """
    k = jnp.round(a.hi * np.float32(1.4426950408889634))   # a/ln2
    r = dd_add_f(a, -k * _LN2_C1)          # exact product (12-bit C1)
    p2 = two_prod(k, _LN2_C2)              # exact
    r = dd_add(r, DD(-p2.hi, -p2.lo))
    r = dd_add_f(r, -k * _LN2_C3)
    # f32 tail: degrees 12..7 of 1/n!
    tail = jnp.full_like(a.hi, np.float32(_EXP_COEFFS[0][0]))
    for chi, _ in _EXP_COEFFS[1:6]:
        tail = tail * r.hi + np.float32(chi)
    # dd head: degrees 6..0 seeded with the tail
    acc = DD(tail, jnp.zeros_like(tail))
    for chi, clo in _EXP_COEFFS[6:]:
        t = dd_mul(acc, r)
        acc = dd_add_f(t, np.float32(chi))
        if clo != 0.0:
            acc = dd_add_f(acc, np.float32(clo))
    # _pow2i is only valid for -127 < k < 128: an underflowed exponent
    # field wraps into garbage (observed: a single Kc-underflowing
    # reaction poisoning a whole 654-species Jacobian with NaN).
    # Saturate: underflow -> exactly 0, overflow -> inf.
    under = k < np.float32(-126.0)
    over = k > np.float32(127.0)
    scale = _pow2i(jnp.clip(k, np.float32(-126.0), np.float32(127.0)))
    hi = jnp.where(under, np.float32(0.0),
                   jnp.where(over, np.float32(np.inf), acc.hi * scale))
    lo = jnp.where(under | over, np.float32(0.0), acc.lo * scale)
    return DD(hi, lo)


def dd_log(a: DD) -> DD:
    """log(a) to ~2^-45 relative-to-log, for a > 0 and a.hi normal.

    Range-reduce a = m 2^k with m in [1, 2) (exact power-of-two
    scaling), run two dd Newton steps y <- y + (m e^{-y} - 1) on the
    f32 seed (TPU's hardware f32 log is only ~5e-6 accurate, so a
    single step leaves ~5e-9), and add k ln2 in Cody-Waite pieces.
    Without the reduction, |log a| > ~55 drives e^{-y} into the
    double-float denormal floor and costs ~2^-31.
    """
    u = jax.lax.bitcast_convert_type(a.hi, jnp.int32)
    k = ((u >> 23) & jnp.int32(0xFF)) - jnp.int32(127)
    kf = k.astype(jnp.float32)
    scale = _pow2i(-kf)                    # exact
    m = DD(a.hi * scale, a.lo * scale)
    # TPU's hardware f32 log (and exp) are only ~1e-5-accurate seeds.
    # One dd Newton from the refined seed leaves ~seed_err^2; the
    # second Newton reuses the SAME dd_exp via
    # e^{-y1} = e^{-y0} * e^{-dy} with dy tiny (cubic series) — full
    # two-step convergence for a handful of dd ops instead of a second
    # dd_exp (this function dominates the dd kernel's VPU time).
    y0 = jnp.log(m.hi)
    y0 = y0 + (m.hi * jnp.exp(-y0) - np.float32(1.0))
    e = dd_exp(DD(-y0, jnp.zeros_like(y0)))
    t = dd_mul(m, e)
    dy = dd_add_f(t, np.float32(-1.0))     # first Newton correction
    y1 = dd_add_f(dy, y0)
    # e^{-dy} ~ 1 - dy (1 - dy/2 (1 - dy/3)), |dy| <~ 1e-4
    third = dd_mul_f(dy, np.float32(1.0 / 3.0))
    inner = dd_mul(dy, dd_add_f(dd_neg(third), np.float32(0.5)))
    fac = dd_mul(dy, dd_add_f(dd_neg(inner), np.float32(1.0)))
    e2 = dd_mul(e, dd_add_f(dd_neg(fac), np.float32(1.0)))
    t2 = dd_mul(m, e2)
    corr = dd_add_f(t2, np.float32(-1.0))
    y = dd_add(corr, y1)
    # + k ln2: k*C1 exact (12-bit C1, |k| <= 2^8)
    y = dd_add_f(y, kf * _LN2_C1)
    p2 = two_prod(kf, _LN2_C2)
    y = dd_add(y, p2)
    return dd_add_f(y, kf * _LN2_C3)


def dd_const(x64) -> DD:
    """Split a float64 numpy array into an exact double-float constant."""
    import numpy as np
    x64 = np.asarray(x64, dtype=np.float64)
    hi = x64.astype(np.float32)
    lo = (x64 - hi.astype(np.float64)).astype(np.float32)
    return DD(jnp.asarray(hi), jnp.asarray(lo))


def dd_recip(a: DD) -> DD:
    """1 / a via one dd Newton step on the f32 reciprocal."""
    r0 = 1.0 / a.hi
    # r1 = r0 * (2 - a r0)
    t = dd_mul_f(a, r0)
    e = dd_add_f(DD(-t.hi, -t.lo), np.float32(2.0))
    return dd_mul_f(e, r0)
