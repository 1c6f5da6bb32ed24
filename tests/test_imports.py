"""Import smoke tests and version check.

Mirrors the reference's CI-run test strategy — import-only assertions
per module plus a semantic-version parse
(reference: pyjac/tests/test_core.py:14-60, tests/test_version.py:12).
"""

import importlib
import re

import pytest

MODULES = [
    'pyjac_tpu',
    'pyjac_tpu.cli',
    'pyjac_tpu.libgen',
    'pyjac_tpu.utils',
    'pyjac_tpu.core.chemkin',
    'pyjac_tpu.core.constants',
    'pyjac_tpu.core.cti',
    'pyjac_tpu.core.ir',
    'pyjac_tpu.core.mech',
    'pyjac_tpu.core.pack',
    'pyjac_tpu.ops.common',
    'pyjac_tpu.ops.dydt',
    'pyjac_tpu.ops.jacobian',
    'pyjac_tpu.ops.rates',
    'pyjac_tpu.ops.thermo',
    'pyjac_tpu.parallel.mesh',
    'pyjac_tpu.runtime.stateio',
    'pyjac_tpu.testers.functional',
    'pyjac_tpu.testers.numpy_oracle',
    'pyjac_tpu.testers.pasr',
    'pyjac_tpu.testers.performance',
    'pyjac_tpu.testers.synthetic',
]


@pytest.mark.parametrize('name', MODULES)
def test_importable(name):
    assert importlib.import_module(name) is not None


def test_version_semver():
    import pyjac_tpu
    assert re.match(r'^\d+\.\d+\.\d+', pyjac_tpu.__version__)


def test_public_api_complete():
    import pyjac_tpu
    for name in pyjac_tpu.__all__:
        assert hasattr(pyjac_tpu, name), name


def test_common_helpers():
    import jax.numpy as jnp
    import numpy as np

    from pyjac_tpu.ops.common import int_pow, safe_log, safe_log10
    c = jnp.asarray([0.0, 1.0, 4.0])
    np.testing.assert_allclose(np.asarray(int_pow(c, 3)), [0., 1., 64.])
    np.testing.assert_allclose(np.asarray(int_pow(c, 0)), [1., 1., 1.])
    assert np.isfinite(np.asarray(safe_log10(c))).all()
    assert np.isfinite(np.asarray(safe_log(c))).all()
