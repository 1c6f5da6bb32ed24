"""AOT library export/load tests (the libgen analog)."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from pyjac_tpu.libgen import generate_library, load_library
from pyjac_tpu.ops.jacobian import jacobian_and_dydt


def test_generate_and_load(h2o2_packed, h2o2_states, tmp_path):
    out = str(tmp_path / 'lib')
    man = generate_library(h2o2_packed, out,
                           kernels=('dydt', 'jacobian_and_dydt'))
    manifest = json.load(open(man))
    assert manifest['n_species'] == 10
    assert set(manifest['kernels']) == {'dydt', 'jacobian_and_dydt'}

    lib = load_library(out)
    st = h2o2_states
    # symbolic batch: exercise two different batch sizes from ONE
    # artifact; skip the leading equilibrated pilot states (their net
    # rates are pure cancellation noise)
    for B in (5, 17):
        sel = np.linspace(100, len(st['T']) - 1, B).astype(int)
        y = jnp.asarray(st['y'][sel])
        P = jnp.asarray(st['P'][sel])
        J, f = lib['jacobian_and_dydt'](P, y)
        J_ref, f_ref = jacobian_and_dydt(h2o2_packed, 0.0, P, y)
        scale = float(jnp.abs(J_ref).max())
        np.testing.assert_allclose(np.asarray(J) / scale,
                                   np.asarray(J_ref) / scale, atol=1e-12)
        f2 = lib['dydt'](P, y)
        fscale = float(jnp.abs(f_ref).max())
        np.testing.assert_allclose(np.asarray(f2) / fscale,
                                   np.asarray(f_ref) / fscale, atol=1e-12)
