"""Double-float array algebra and exact sliced matmuls (ops/ddx.py).

All checks compare against float64 on CPU (conftest enables x64).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pyjac_tpu.ops import ddx
from pyjac_tpu.ops import doublefloat as df


def _rand64(rng, shape, scale=1.0, span=0):
    """Random f64 values, optionally with a wide dynamic range."""
    v = rng.standard_normal(shape) * scale
    if span:
        v = v * 10.0 ** rng.uniform(-span, span, shape)
    return v


def test_dda_operators_match_f64():
    rng = np.random.default_rng(0)
    a64 = _rand64(rng, (16, 8), span=3)
    b64 = _rand64(rng, (16, 8), span=3)
    a = ddx.const(a64)
    b = ddx.const(b64)
    for got, want in [
        (a + b, a64 + b64),
        (a - b, a64 - b64),
        (a * b, a64 * b64),
        (a / b, a64 / b64),
        (-a, -a64),
        (a + 2.5, a64 + 2.5),
        (2.5 * a, 2.5 * a64),
        (1.0 - a, 1.0 - a64),
        (a / 2.0, a64 / 2.0),
        (6.0 / b, 6.0 / b64),
    ]:
        err = np.abs(ddx.to64(got) - want) / np.maximum(np.abs(want), 1e-30)
        assert err.max() < 1e-13, err.max()


def test_where_le_sum0_concat0():
    rng = np.random.default_rng(1)
    a64 = _rand64(rng, (7, 5))
    b64 = _rand64(rng, (7, 5))
    a, b = ddx.const(a64), ddx.const(b64)
    m = jnp.asarray(a64 > 0.0)
    w = ddx.where(m, a, b)
    assert np.allclose(ddx.to64(w), np.where(a64 > 0, a64, b64))

    # le distinguishes values that differ only in the low word
    x = ddx.DDA(jnp.float32(1.0), jnp.float32(1e-9))
    y = ddx.DDA(jnp.float32(1.0), jnp.float32(2e-9))
    assert bool(ddx.le(x, y)) and not bool(ddx.le(y, x))

    s = ddx.sum0(ddx.const(a64))
    assert np.abs(ddx.to64(s) - a64.sum(0)).max() < 1e-13

    c = ddx.concat0([a, b])
    assert np.allclose(ddx.to64(c), np.concatenate([a64, b64], 0))


def test_exp_log_accuracy():
    rng = np.random.default_rng(2)
    x64 = rng.uniform(-80.0, 80.0, (64,))
    e = ddx.exp(ddx.const(x64))
    rel = np.abs(ddx.to64(e) - np.exp(x64)) / np.exp(x64)
    # full dd precision while the low word stays f32-normal; below
    # ~1e-30 results the low word goes denormal (the intrinsic
    # double-float range floor, doublefloat.dd_exp docstring)
    big = np.exp(x64) > 1e-25
    assert rel[big].max() < 1e-13, rel[big].max()
    assert rel.max() < 1e-7, rel.max()

    y64 = 10.0 ** rng.uniform(-30, 30, (64,))
    lg = ddx.log(ddx.const(y64))
    err = np.abs(ddx.to64(lg) - np.log(y64)) / \
        np.maximum(np.abs(np.log(y64)), 1.0)
    assert err.max() < 1e-13, err.max()


def test_slice_static_exact_decomposition():
    rng = np.random.default_rng(3)
    A = _rand64(rng, (12, 40), span=2)
    A[3] = 0.0                                   # zero row
    S = ddx.slice_static(A, w=8, n_slices=7)
    recon = np.zeros_like(A)
    for s in S.slices:
        recon += s.astype(np.float64)
    recon *= S.row_scale.astype(np.float64)
    rowmax = np.maximum(np.abs(A).max(1, keepdims=True), 1e-300)
    rel = np.abs(recon - A) / rowmax
    assert rel.max() < 2.0 ** -54, rel.max()
    # integer grid property
    for p, s in enumerate(S.slices):
        q = 2.0 ** (-8 * (p + 1))
        ints = s / q
        assert np.allclose(ints, np.round(ints))
        assert np.abs(ints).max() <= 256


def test_slice_static_small_integer_single_slice():
    nu = np.array([[0.0, 1.0, 2.0, -1.0], [3.0, 0.0, -2.0, 1.0]])
    S = ddx.slice_static(nu, w=8, n_slices=7)
    assert S.n_slices == 1
    assert S.trunc_rel == 0.0


def test_slice_dyn_exact_decomposition():
    rng = np.random.default_rng(4)
    x64 = _rand64(rng, (40, 16), span=4)
    x = ddx.const(x64)
    slices, scale = ddx.slice_dyn(x, w=8, n_slices=7)
    recon = np.zeros((40, 16))
    for s in slices:
        recon += np.asarray(s, np.float64)
    recon *= np.asarray(scale, np.float64)
    colmax = np.abs(x64).max(0, keepdims=True)
    rel = np.abs(recon - x64) / colmax
    # bound: truncation below slice 7 (56 bits) plus the error-free
    # fold's deferred carry (~2^-49 of the column max)
    assert rel.max() < 2.0 ** -46, rel.max()
    for p, s in enumerate(slices):
        q = 2.0 ** (-8 * (p + 1))
        ints = np.asarray(s, np.float64) / q
        assert np.allclose(ints, np.round(ints))
        assert np.abs(ints).max() <= 256


@pytest.mark.parametrize('K,w', [(53, 8), (325, 7)])
def test_matmul_sliced_f64_grade(K, w):
    rng = np.random.default_rng(5)
    # LHS like stoichiometry: small integers, some fractional rows
    A = rng.integers(-3, 4, (48, K)).astype(np.float64)
    A[5] *= 0.85                                  # fractional coefficients
    X = _rand64(rng, (K, 24), span=5)
    S = ddx.slice_static(A, w=8, n_slices=7)
    got = ddx.to64(ddx.matmul_sliced(S, ddx.const(X), w_dyn=w, n_dyn=7))
    want = A @ X
    colmax = np.abs(A[:, :, None] * X[None, :, :]).sum(1)  # |terms| sum
    rel = np.abs(got - want) / np.maximum(colmax, 1e-300)
    assert rel.max() < 1e-12, rel.max()


def test_matmul_sliced_rejects_inexact_accumulation():
    A = np.full((4, 2000), 255.0)
    S = ddx.slice_static(A, w=8)
    X = ddx.const(np.ones((2000, 4)))
    with pytest.raises(ValueError):
        ddx.matmul_sliced(S, X, w_dyn=8)


def test_gather_dot_near_exact():
    rng = np.random.default_rng(6)
    x64 = _rand64(rng, (30, 8), span=6)
    idx = rng.integers(0, 30, 100)
    G = np.zeros((100, 30), np.float32)
    G[np.arange(100), idx] = 1.0
    got = ddx.to64(ddx.gather_dot(jnp.asarray(G), ddx.const(x64)))
    want = x64[idx]
    # the truncation-based 3-term split leaves ~1 bit of rounding on
    # the low word: ~2^-51 relative, far inside the 2^-44 budget
    rel = np.abs(got - want) / np.abs(want)
    assert rel.max() < 2.0 ** -48, rel.max()
    # the high word is gathered exactly
    hi = ddx.gather_dot(jnp.asarray(G), ddx.const(x64)).hi
    assert np.array_equal(np.asarray(hi), x64.astype(np.float32)[idx])


def test_barrier_modes():
    # two_sum must stay error-free under every barrier mode on CPU
    a = jnp.float32(1.0)
    b = jnp.float32(1e-9)
    for mode in ('xla', 'bitcast', 'none'):
        with df.barrier_mode(mode):
            s = df.two_sum(jnp.full((8,), a), jnp.full((8,), b))
        total = np.asarray(s.hi, np.float64) + np.asarray(s.lo, np.float64)
        assert np.all(total == 1.0 + 1e-9), mode


def test_dd_exp_saturates_out_of_range():
    """Underflow -> exactly 0, overflow -> inf: _pow2i's exponent field
    wraps into garbage outside (-127, 128) (observed: a single
    Kc-underflowing reaction poisoning a 654-species Jacobian)."""
    x = ddx.const(np.array([-200.0, -120.0, 0.0, 95.0]))
    e = ddx.exp(x)
    hi = np.asarray(e.hi)
    assert hi[0] == 0.0
    assert np.isfinite(hi[1]) and hi[1] >= 0.0
    assert hi[2] == 1.0
    assert np.isinf(hi[3])
    assert np.isfinite(np.asarray(e.lo)[[0, 3]]).all()
