"""Structural sparsity mask vs the actual numerical Jacobian."""

import jax.numpy as jnp
import numpy as np
import pytest

from pyjac_tpu.ops.jacobian import eval_jacobian
from pyjac_tpu.ops.sparse import sparsity_summary, structural_sparsity
from pyjac_tpu.ops.thermo import eval_conc


@pytest.mark.parametrize('conp', [True, False])
def test_mask_covers_numerical_jacobian(h2o2_packed, h2o2_states, conp):
    """Entries outside the structural mask must be numerically zero."""
    st = h2o2_states
    sel = np.linspace(0, len(st['T']) - 1, 30).astype(int)
    y = jnp.asarray(st['y'][sel])
    P = jnp.asarray(st['P'][sel])
    if conp:
        param = P
    else:
        T = jnp.asarray(st['T'][sel])
        Y = jnp.asarray(st['Y_full'][sel, :-1])
        _, _, param, _ = eval_conc(h2o2_packed, T, P, Y)
    J = np.asarray(eval_jacobian(h2o2_packed, 0.0, param, y, conp=conp))
    mask = structural_sparsity(h2o2_packed, conp=conp)
    outside = J[:, ~mask]
    scale = np.abs(J).max()
    assert np.abs(outside).max() <= scale * 1e-14


def test_summary(h2o2_packed):
    s = sparsity_summary(h2o2_packed)
    assert 0 < s['conv']['fill'] <= s['conp']['fill'] <= 1.0
    assert s['conp']['total'] == 100
