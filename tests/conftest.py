"""Test configuration: force an 8-device virtual CPU mesh with float64.

The parity bar (max rel err <= 1e-8, BASELINE.md) requires f64, and the
multi-chip sharding tests need multiple devices; both are provided by
the host CPU platform with a forced device count. This must run before
any JAX computation.
"""

import os

os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '') +
                           ' --xla_force_host_platform_device_count=8')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import pathlib  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REPO = pathlib.Path(__file__).resolve().parent.parent
REF_DATA = pathlib.Path('/root/reference/data')
LOCAL_DATA = REPO / 'tests' / 'data'


def data_path(name: str) -> str:
    """Find a fixture in the local test data dir or the reference tree."""
    for base in (LOCAL_DATA, REF_DATA):
        p = base / name
        if p.exists():
            return str(p)
    pytest.skip('fixture %s not available' % name)


@pytest.fixture(scope='session')
def h2o2_inp():
    return data_path('h2o2.inp')


@pytest.fixture(scope='session')
def h2o2_cti():
    return data_path('h2o2.cti')


@pytest.fixture(scope='session')
def pasr_states():
    """PaSR fixture states: (n_states, 3 + NSP) = [t, T, P, Y...]."""
    d = np.load(data_path('h2_pasr_output.npy'))
    return d.reshape(-1, d.shape[-1])


@pytest.fixture(scope='session')
def h2o2_mech(h2o2_cti):
    from pyjac_tpu.core.mech import Mechanism
    return Mechanism.from_files(h2o2_cti)


@pytest.fixture(scope='session')
def h2o2_packed(h2o2_mech):
    from pyjac_tpu.core.pack import pack
    return pack(h2o2_mech)


@pytest.fixture(scope='session')
def h2o2_states(h2o2_mech, pasr_states):
    """Pivoted state vectors [T, Y_1..Y_{N-1}] plus (T, P, Y_full)."""
    d = pasr_states
    T, P = d[:, 1], d[:, 2]
    Yfull = d[:, 3:][:, h2o2_mech.fwd_spec_mapping]
    y = np.concatenate([T[:, None], Yfull[:, :-1]], axis=1)
    return {'y': y, 'T': T, 'P': P, 'Y_full': Yfull}
