"""Double-float array algebra + exact sliced MXU matmuls.

Builds on the scalar error-free transformations in
:mod:`pyjac_tpu.ops.doublefloat` (two_sum / two_prod / dd_exp / dd_log)
to provide what the f64-grade Pallas Jacobian kernel needs:

* :class:`DDA` — an (hi, lo) float32-pair array with operator
  overloading, so the kernel math reads like the f32 version
  (reference precision role: the f64 arithmetic of the generated C,
  e.g. pyjac/core/create_jacobian.py:2815-2821 ``{:.16e}`` literals);

* **exact sliced matmuls** — contractions like ``nu_net.T @ q`` must be
  accurate to ~2^-44 *relative to the column magnitude*, far beyond a
  single f32-accumulating MXU pass (2^-24).  Following the Ozaki-scheme
  idea, both operands are decomposed into grid-aligned slices whose
  products are small integers: every bf16 MXU pass then accumulates
  **exactly** in its f32 accumulator (all partial sums are integers
  below 2^24), and the per-pass results are recombined in double-float.
  Static (mechanism-constant) operands are sliced once at pack time in
  numpy; dynamic operands are sliced in-kernel with the classic
  round-to-grid trick ``(z + C) - C`` (optimization-barriered so XLA's
  excess-precision folding cannot elide it).

Everything here is plain jnp on static shapes: usable directly under
jit (the XLA dd path) and inside a Pallas TPU kernel body.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import doublefloat as df
from .doublefloat import DD

__all__ = [
    'DDA', 'wrap', 'const', 'to64', 'zeros_like', 'full_like', 'where',
    'exp', 'log', 'sum0', 'concat0', 'le', 'StaticSliced', 'slice_static',
    'slice_dyn', 'matmul_sliced', 'matmul_sliced_parts', 'gather_dot',
    'dot_split3',
]


def _as_dd(x) -> DD:
    if isinstance(x, DDA):
        return DD(x.hi, x.lo)
    if isinstance(x, DD):
        return x
    raise TypeError(type(x))


class DDA(NamedTuple):
    """Array of double-float values ``hi + lo`` with |lo| <= ulp(hi)/2.

    NamedTuple => automatically a JAX pytree; the tuple operators are
    overridden with arithmetic ones.  Mixed operands (python scalars,
    numpy/jnp float32 arrays) use the cheaper dd-float kernels.
    """

    hi: jnp.ndarray
    lo: jnp.ndarray

    # -- arithmetic -----------------------------------------------------
    def __add__(self, other):
        if isinstance(other, DDA):
            return DDA(*df.dd_add(_as_dd(self), _as_dd(other)))
        return DDA(*df.dd_add_f(_as_dd(self), _f32(other)))

    __radd__ = __add__

    def __sub__(self, other):
        if isinstance(other, DDA):
            return DDA(*df.dd_sub(_as_dd(self), _as_dd(other)))
        return DDA(*df.dd_add_f(_as_dd(self), -_f32(other)))

    def __rsub__(self, other):
        return DDA(*df.dd_add_f(df.dd_neg(_as_dd(self)), _f32(other)))

    def __mul__(self, other):
        if isinstance(other, DDA):
            return DDA(*df.dd_mul(_as_dd(self), _as_dd(other)))
        return DDA(*df.dd_mul_f(_as_dd(self), _f32(other)))

    __rmul__ = __mul__

    def __truediv__(self, other):
        if not isinstance(other, DDA):
            other = wrap(_f32(other))
        return DDA(*df.dd_div(_as_dd(self), _as_dd(other)))

    def __rtruediv__(self, other):
        if not isinstance(other, DDA):
            other = wrap(_f32(other))
        return DDA(*df.dd_div(_as_dd(other), _as_dd(self)))

    def __neg__(self):
        return DDA(-self.hi, -self.lo)

    # -- shape sugar -----------------------------------------------------
    @property
    def shape(self):
        return self.hi.shape

    def slice0(self, start, stop):
        return DDA(self.hi[start:stop], self.lo[start:stop])

    def reshape(self, *s):
        return DDA(self.hi.reshape(*s), self.lo.reshape(*s))

    def broadcast_to(self, shape):
        return DDA(jnp.broadcast_to(self.hi, shape),
                   jnp.broadcast_to(self.lo, shape))


def _f32(x):
    if isinstance(x, (float, int)):
        return np.float32(x)
    return x


def wrap(x) -> DDA:
    """Lift an f32 array (or scalar) to DDA with a zero low word."""
    x = jnp.asarray(x, jnp.float32)
    return DDA(x, jnp.zeros_like(x))


def const(x64) -> DDA:
    """Exact pack-time split of a float64 numpy constant (hi, lo are
    returned as *numpy* arrays so Pallas treats them as kernel inputs,
    never captured device constants)."""
    x64 = np.asarray(x64, dtype=np.float64)
    hi = x64.astype(np.float32)
    lo = (x64 - hi.astype(np.float64)).astype(np.float32)
    return DDA(hi, lo)


def to64(a: DDA):
    """Reconstruct float64 (host/test side only)."""
    return np.asarray(a.hi, np.float64) + np.asarray(a.lo, np.float64)


def zeros_like(a: DDA) -> DDA:
    return DDA(jnp.zeros_like(a.hi), jnp.zeros_like(a.hi))


def full_like(a: DDA, v: float) -> DDA:
    v64 = float(v)
    vhi = np.float32(v64)
    vlo = np.float32(v64 - float(vhi))
    return DDA(jnp.full_like(a.hi, vhi), jnp.full_like(a.hi, vlo))


def where(mask, a, b) -> DDA:
    if not isinstance(a, DDA):
        a = wrap(_f32(a) * jnp.ones((), jnp.float32))
    if not isinstance(b, DDA):
        b = wrap(_f32(b) * jnp.ones((), jnp.float32))
    return DDA(jnp.where(mask, a.hi, b.hi), jnp.where(mask, a.lo, b.lo))


def le(a: DDA, b: DDA):
    """a <= b exactly in dd (hi compare with lo tie-break): branch
    selections must match the reference's f64 compare at the boundary
    (NASA T_mid rows sit exactly on round temperatures)."""
    return (a.hi < b.hi) | ((a.hi == b.hi) & (a.lo <= b.lo))


def exp(a: DDA) -> DDA:
    return DDA(*df.dd_exp(_as_dd(a)))


def log(a: DDA) -> DDA:
    return DDA(*df.dd_log(_as_dd(a)))


def recip(a: DDA) -> DDA:
    one = wrap(jnp.ones_like(a.hi))
    return DDA(*df.dd_div(_as_dd(one), _as_dd(a)))


def sum0(a: DDA) -> DDA:
    """Compensated reduction over axis 0 -> shape (1, ...).

    Pairwise halving: log2(n) dd_add depth instead of n."""
    hi, lo = a.hi, a.lo
    while hi.shape[0] > 1:
        n = hi.shape[0]
        half = n // 2
        s = df.dd_add(DD(hi[:half], lo[:half]),
                      DD(hi[half:2 * half], lo[half:2 * half]))
        hi2, lo2 = s.hi, s.lo
        if n % 2:
            hi2 = jnp.concatenate([hi2, hi[-1:]], axis=0)
            lo2 = jnp.concatenate([lo2, lo[-1:]], axis=0)
        hi, lo = hi2, lo2
    return DDA(hi, lo)


def concat0(parts: List[DDA]) -> DDA:
    return DDA(jnp.concatenate([p.hi for p in parts], axis=0),
               jnp.concatenate([p.lo for p in parts], axis=0))


# ---------------------------------------------------------------------------
# exact sliced matmuls
# ---------------------------------------------------------------------------

def dot_split3(a_exact, b_f32):
    """(exact-in-bf16 LHS) @ (f32 RHS) to f32 accuracy via a 3-term
    bf16-exact mantissa split of the RHS (three single MXU passes).
    Exact when the LHS is one-hot (a single product survives per row)."""
    def trunc16(x):
        u = jax.lax.bitcast_convert_type(x, jnp.uint32)
        return jax.lax.bitcast_convert_type(
            u & jnp.uint32(0xFFFF0000), jnp.float32)

    hi = trunc16(b_f32)
    r1 = b_f32 - hi
    mid = trunc16(r1)
    lo = (r1 - mid).astype(jnp.bfloat16)
    ab = a_exact.astype(jnp.bfloat16)
    out = jnp.dot(ab, hi.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    out = out + jnp.dot(ab, mid.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
    return out + jnp.dot(ab, lo, preferred_element_type=jnp.float32)


def gather_dot(G_onehot, x: DDA) -> DDA:
    """One-hot gather ``G @ x`` of a dd array — exact (each output row
    selects a single element, so no accumulation rounding)."""
    return DDA(dot_split3(G_onehot, x.hi), dot_split3(G_onehot, x.lo))


@dataclass(frozen=True)
class StaticSliced:
    """A mechanism-constant matrix pre-decomposed for exact MXU passes.

    ``A ~= row_scale * sum_p slices[p]`` with slices[p] on the grid
    ``2**(-w*(p+1))`` (every entry an integer multiple), row_scale a
    power of two.  ``max_int[p]`` bounds |slices[p]| * 2**(w*(p+1)).
    """

    slices: tuple          # of np.float32 (M, K)
    row_scale: np.ndarray  # (M, 1) float32, powers of two
    w: int
    max_int: tuple         # of int, per slice: max |integer|
    max_l1: tuple          # of int, per slice: max row L1 of integers
    trunc_rel: float       # dropped-residual bound relative to row max

    @property
    def n_slices(self):
        return len(self.slices)


def slice_static(A, w: int = 8, n_slices: int = 7) -> StaticSliced:
    """Pack-time row-aligned slicing of a constant f64 matrix (numpy)."""
    A = np.asarray(A, np.float64)
    if A.ndim != 2:
        raise ValueError('slice_static wants 2-D, got %s' % (A.shape,))
    m = np.max(np.abs(A), axis=1, keepdims=True)
    safe = np.maximum(m, np.finfo(np.float64).tiny)
    scale = 2.0 ** (np.floor(np.log2(safe)) + 1.0)
    scale = np.where(m == 0.0, 1.0, scale)
    z = A / scale
    slices, max_int, max_l1 = [], [], []
    for p in range(n_slices):
        q = 2.0 ** (-w * (p + 1))
        s = np.round(z / q) * q
        slices.append(s.astype(np.float32))
        ints = np.abs(s) / q
        max_int.append(int(ints.max()) if s.any() else 0)
        max_l1.append(int(np.ceil(ints.sum(axis=1).max()))
                      if s.any() else 0)
        z = z - s
    while len(slices) > 1 and not slices[-1].any():
        slices.pop()
        max_int.pop()
        max_l1.pop()
    trunc = float(np.max(np.abs(z))) if z.size else 0.0
    return StaticSliced(tuple(slices), scale.astype(np.float32), w,
                        tuple(max_int), tuple(max_l1), trunc)


def _pow2_ceil(m):
    """Smallest power of two > m (for m > 0), elementwise f32 bit trick.

    Capped at 2^127: for m >= 2^127 the doubled exponent overflows to
    inf (scale inf -> inv 0 -> NaN through the out-scale product).
    Under the cap |z| <= 2 instead of <= 1, so first-slice integers
    reach 2^(w+1) — still bf16-exact for w <= 7 and inside the L1
    accumulation guard's margin."""
    u = jax.lax.bitcast_convert_type(m, jnp.uint32)
    e = u & jnp.uint32(0x7F800000)
    s = jax.lax.bitcast_convert_type(e, jnp.float32) * np.float32(2.0)
    s = jnp.where(e >= jnp.uint32(0x7F000000), np.float32(2.0 ** 127), s)
    return jnp.where(m > 0, s, np.float32(1.0))


def slice_dyn(x: DDA, w: int, n_slices: int):
    """In-kernel column-aligned slicing of a dd array along axis 0.

    Returns (slices, col_scale): ``x ~= col_scale * sum_p slices[p]``
    with slices[p] integer multiples of ``2**(-w*(p+1))`` bounded by
    2**w, col_scale (1, B) powers of two.  The low word is folded into
    the running residual at the last point where the next slice window
    can still absorb it (``p <= 23/w``; folding later overflows the
    bf16 integer range of the next slice and breaks pass exactness).
    The fold uses a two_sum whose error term is re-injected after the
    following extraction, so it costs only ~2^-52 of the column max."""
    m = jnp.max(jnp.abs(x.hi), axis=0, keepdims=True)
    scale = _pow2_ceil(m)
    inv = np.float32(1.0) / scale                      # exact (pow2)
    z = x.hi * inv
    p_fold = int(np.floor(23.0 / w))
    out = []
    carry = None
    for p in range(n_slices):
        if p == p_fold:
            folded = df.two_sum(z, x.lo * inv)
            z, carry = folded.hi, folded.lo
        C = np.float32(1.5 * 2.0 ** (23 - w * (p + 1)))
        t = df._barrier(z + C)
        s = df._barrier(t - C)
        out.append(s)
        z = z - s
        if p == p_fold and carry is not None:
            z = z + carry                  # |carry| << slice capacity now
            carry = None
    if n_slices <= p_fold + 1:
        raise ValueError('need > %d slices to reach the low word'
                         % (p_fold + 1))
    return out, scale


def matmul_sliced_parts(slices, row_scale, w_static: int, max_l1: int,
                        x: DDA, w_dyn: int = 7, n_dyn: int = 7,
                        bits: int = 44) -> DDA:
    """Exact-pass sliced matmul ``A @ x`` -> DDA, from raw slice parts
    (jnp or numpy arrays — usable with Pallas refs).

    Every bf16 MXU pass accumulates integers exactly; the guard bounds
    every partial sum by (max static-row L1 of integers) * 2^w_dyn,
    which stays far below K * max_int for sparse rows (stoichiometry
    has ~5 nonzeros per row at any mechanism size).  Pass results are
    combined smallest-first in double-float.  ``bits`` truncates slice
    pairs whose product magnitude is below 2**-bits of
    (row max * column max).
    """
    # factor 2: when a column max hits the 2^127 scale cap
    # (_pow2_ceil), first-slice integers reach 2^(w+1)
    worst = max_l1 * (2 ** (w_dyn + 1))
    if worst >= (1 << 24):
        raise ValueError(
            'inexact accumulation: row_L1=%d * 2^%d >= 2^24 — '
            'reduce slice widths' % (max_l1, w_dyn + 1))
    dyn, col_scale = slice_dyn(x, w_dyn, n_dyn)
    terms = []
    for p, ls in enumerate(slices):
        lb = jnp.asarray(ls).astype(jnp.bfloat16)
        for q, rs in enumerate(dyn):
            mag = w_static * (p + 1) + w_dyn * (q + 1)
            if mag - w_static - w_dyn > bits:
                continue
            d = jnp.dot(lb, rs.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            terms.append((mag, d))
    terms.sort(key=lambda t: -t[0])                 # smallest first
    acc = DD(terms[0][1], jnp.zeros_like(terms[0][1]))
    for _, d in terms[1:]:
        acc = df.dd_add_f(acc, d)
    out_scale = jnp.asarray(row_scale) * col_scale       # (M,1)*(1,B)
    return DDA(acc.hi * out_scale, acc.lo * out_scale)


def matmul_sliced(S: StaticSliced, x: DDA, w_dyn: int = 7,
                  n_dyn: int = 7, bits: int = 44) -> DDA:
    return matmul_sliced_parts(S.slices, S.row_scale, S.w,
                               max(S.max_l1), x, w_dyn, n_dyn, bits)



