"""Double-float primitive tests: ~2^-48 precision from f32 pairs."""

import jax.numpy as jnp
import numpy as np
import pytest

from pyjac_tpu.ops import doublefloat as dd


@pytest.fixture(scope='module')
def rnd():
    rng = np.random.default_rng(3)
    a = rng.uniform(-1e6, 1e6, size=256)
    b = rng.uniform(-1e6, 1e6, size=256)
    return a, b


def _err(got_dd, want64):
    got = np.asarray(dd.dd_to_f64(got_dd))
    return np.abs((got - want64) / np.maximum(np.abs(want64), 1e-300)).max()


def test_two_sum_exact(rnd):
    a, b = rnd
    s = dd.two_sum(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32))
    a32 = a.astype(np.float32).astype(np.float64)
    b32 = b.astype(np.float32).astype(np.float64)
    np.testing.assert_array_equal(
        np.asarray(s.hi).astype(np.float64) +
        np.asarray(s.lo).astype(np.float64), a32 + b32)


def test_two_prod_exact(rnd):
    a, b = rnd
    p = dd.two_prod(jnp.asarray(a, jnp.float32),
                    jnp.asarray(b, jnp.float32))
    a32 = a.astype(np.float32).astype(np.float64)
    b32 = b.astype(np.float32).astype(np.float64)
    np.testing.assert_array_equal(
        np.asarray(p.hi).astype(np.float64) +
        np.asarray(p.lo).astype(np.float64), a32 * b32)


def test_dd_mul_add_precision(rnd):
    a, b = rnd
    x = dd.dd_from(a)
    y = dd.dd_from(b)
    a32 = a.astype(np.float32).astype(np.float64)
    b32 = b.astype(np.float32).astype(np.float64)
    assert _err(dd.dd_add(x, y), a32 + b32) < 1e-13
    assert _err(dd.dd_mul(x, y), a32 * b32) < 1e-13
    assert _err(dd.dd_div(x, y), a32 / b32) < 1e-13


def test_dd_sum_beats_f32():
    """Compensated reduction keeps ~2^-48; plain f32 loses to 2^-24."""
    rng = np.random.default_rng(0)
    vals = rng.uniform(0.0, 1.0, size=(326, 64))
    want = vals.astype(np.float32).astype(np.float64).sum(axis=0)
    hi = jnp.asarray(vals, jnp.float32)
    lo = jnp.zeros_like(hi)
    got = dd.dd_sum(hi, lo, axis=0)
    err_dd = np.abs(np.asarray(dd.dd_to_f64(got)) - want).max() / \
        np.abs(want).max()
    err_f32 = np.abs(np.asarray(hi.sum(0), dtype=np.float64) -
                     want).max() / np.abs(want).max()
    assert err_dd < 1e-12
    assert err_dd < err_f32 / 100


def test_dd_cancellation():
    """(a + tiny) - a recovers tiny exactly in dd, zero in f32."""
    a = dd.dd_from(jnp.asarray([1.0e8], jnp.float32))
    tiny = dd.dd_from(jnp.asarray([1.0e-3], jnp.float32))
    s = dd.dd_sub(dd.dd_add(a, tiny), a)
    got = float(np.asarray(dd.dd_to_f64(s))[0])
    # recovers the f32-rounded tiny exactly
    assert got == pytest.approx(float(np.float32(1.0e-3)), rel=1e-12)
    # plain f32 loses it completely
    assert float((jnp.float32(1e8) + jnp.float32(1e-3)) -
                 jnp.float32(1e8)) == 0.0


def test_dd_exp_precision():
    rng = np.random.default_rng(1)
    # |x| < 60: below exp(-60) the dd low word goes denormal
    x = rng.uniform(-60.0, 60.0, size=512)
    a = dd.dd_from(jnp.asarray(x, jnp.float32))
    got = np.asarray(dd.dd_to_f64(dd.dd_exp(a)))
    want = np.exp(np.asarray(a.hi, dtype=np.float64))
    rel = np.abs((got - want) / want).max()
    assert rel < 1e-12, rel
    # vs plain f32 exp (~6e-8): must be orders better
    f32rel = np.abs((np.exp(np.asarray(a.hi)).astype(np.float64) - want) /
                    want).max()
    assert rel < f32rel / 1e3


def test_dd_exp_with_low_part():
    """The low word shifts the result: exp(hi+lo) != exp(hi)."""
    hi = jnp.asarray([10.0], jnp.float32)
    lo = jnp.asarray([1e-5], jnp.float32)
    got = float(np.asarray(dd.dd_to_f64(dd.dd_exp(dd.DD(hi, lo))))[0])
    want = float(np.exp(np.float64(10.0) + np.float64(
        np.float32(1e-5))))
    assert got == pytest.approx(want, rel=1e-12)


def test_dd_log_precision():
    rng = np.random.default_rng(2)
    x = rng.uniform(1e-20, 1e20, size=512)
    a = dd.dd_from(jnp.asarray(x, jnp.float32))
    got = np.asarray(dd.dd_to_f64(dd.dd_log(a)))
    want = np.log(np.asarray(a.hi, dtype=np.float64))
    err = np.abs(got - want).max()        # absolute (log scale)
    assert err < 5e-12, err


def test_dd_exp_log_roundtrip():
    rng = np.random.default_rng(4)
    x = rng.uniform(0.1, 60.0, size=128)
    a = dd.dd_from(jnp.asarray(x, jnp.float32))
    back = dd.dd_log(dd.dd_exp(a))
    got = np.asarray(dd.dd_to_f64(back))
    want = np.asarray(a.hi, dtype=np.float64)
    assert np.abs(got - want).max() < 1e-11
