"""Profiling/cost-model and remaining-surface tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from pyjac_tpu.profiling import cost_estimate, speed_of_light, timed


def test_cost_estimate_scales(h2o2_packed):
    c_rates = cost_estimate(h2o2_packed, 'rates')
    c_jac = cost_estimate(h2o2_packed, 'jacobian')
    assert c_jac.flops_per_state > 5 * c_rates.flops_per_state
    assert c_jac.arithmetic_intensity() > 0
    with pytest.raises(ValueError):
        cost_estimate(h2o2_packed, 'nope')


def test_speed_of_light(h2o2_packed):
    sol = speed_of_light(h2o2_packed)
    assert sol['compute_bound_evals_per_sec'] > 1e6
    assert sol['memory_bound_evals_per_sec'] > 1e5


def test_timed(h2o2_packed, h2o2_states):
    import jax

    from pyjac_tpu.ops.dydt import dydt_conp
    st = h2o2_states
    y = jnp.asarray(st['y'][:16])
    P = jnp.asarray(st['P'][:16])
    fn = jax.jit(lambda p, yy: dydt_conp(h2o2_packed, 0.0, p, yy))
    out, dt = timed(fn, P, y, iters=2)
    assert dt > 0
    assert out.shape == (16, 10)


def test_libgen_conv_export(h2o2_packed, h2o2_states, tmp_path):
    """AOT export of the CONV kernels."""
    import jax

    from pyjac_tpu.libgen import generate_library, load_library
    from pyjac_tpu.ops.dydt import dydt_conv
    from pyjac_tpu.ops.thermo import eval_conc
    out = str(tmp_path / 'libconv')
    generate_library(h2o2_packed, out, kernels=('dydt',), conp=False)
    lib = load_library(out)
    assert lib['manifest']['conp'] is False
    st = h2o2_states
    sel = np.linspace(100, len(st['T']) - 1, 6).astype(int)
    T = jnp.asarray(st['T'][sel])
    P = jnp.asarray(st['P'][sel])
    Y = jnp.asarray(st['Y_full'][sel, :-1])
    _, _, rho, _ = eval_conc(h2o2_packed, T, P, Y)
    y = jnp.asarray(st['y'][sel])
    f = lib['dydt'](rho, y)
    f_ref = dydt_conv(h2o2_packed, 0.0, rho, y)
    scale = float(jnp.abs(f_ref).max())
    np.testing.assert_allclose(np.asarray(f) / scale,
                               np.asarray(f_ref) / scale, atol=1e-12)
