"""Double-float Jacobian kernel (ops/pallas_dd.py).

The parity bar (BASELINE.md): thresholded per-entry relative error vs
the reference's f64 <= 1e-8.  The dd path is validated against the f64
XLA Jacobian (exact on CPU under x64) and the reference-C golden
fixture, on every reaction-category mix we have goldens for.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pyjac_tpu.core.mech import Mechanism
from pyjac_tpu.core.pack import pack
from pyjac_tpu.ops.jacobian import jacobian_and_dydt
from pyjac_tpu.ops.pallas_dd import PallasDDJacobian, jacobian_dd_xla

from tests.test_golden_parity import GOLDEN


def _thresholded(test, ref):
    """Reference metric: per-entry relative error ignoring entries
    below ||J||/1e20 (reference: functional_tester/test.py:1456-1460)."""
    n = len(ref)
    t2 = np.asarray(test).reshape(n, -1)
    r2 = np.asarray(ref).reshape(n, -1)
    norms = np.linalg.norm(r2, axis=-1, keepdims=True)
    mask = np.abs(r2) > norms / 1e20
    rel = np.abs(t2 - r2) / np.where(mask, np.abs(r2), 1.0)
    return float((rel * mask).max())


def _floored(test, ref, floor=1e-9):
    """Cancellation-aware metric used by the synthetic golden tests:
    entries below rowmax*floor are compared on that absolute scale
    (entries ~1e-16 of the row norm carry O(1) relative error even in
    f64 — kappa ~ 1e9 cancellation; matching them relatively is
    meaningless for any arithmetic)."""
    n = len(ref)
    t2 = np.asarray(test).reshape(n, -1)
    r2 = np.asarray(ref).reshape(n, -1)
    denom = np.maximum(np.abs(r2),
                       np.abs(r2).max(-1, keepdims=True) * floor + 1e-300)
    return float((np.abs(t2 - r2) / denom).max())


@pytest.fixture(scope='module')
def h2o2(h2o2_inp):
    mech = Mechanism.from_files(h2o2_inp)
    return mech, pack(mech)


@pytest.fixture(scope='module')
def golden():
    return np.load(GOLDEN)


def test_dd_xla_meets_baseline_bar_vs_f64(h2o2, golden):
    _, packed = h2o2
    y, P = golden['y'], golden['P']
    Jref, fref = jacobian_and_dydt(packed, 0.0, jnp.asarray(P),
                                   jnp.asarray(y))
    Jdd, fdd = jacobian_dd_xla(packed, P, y, n_dyn=10)
    assert _thresholded(Jdd, np.asarray(Jref)) < 1e-8
    scale = np.abs(np.asarray(fref)).max()
    assert np.abs(np.asarray(fdd) - np.asarray(fref)).max() / scale < 1e-10


def test_dd_xla_vs_reference_c_golden(h2o2, golden):
    """The round-2 headline: dd arithmetic meets the 1e-8 golden bar."""
    _, packed = h2o2
    n = len(golden['T'])
    Jdd, _ = jacobian_dd_xla(packed, golden['P'], golden['y'], n_dyn=10)
    Jl = np.asarray(Jdd).transpose(0, 2, 1).reshape(n, -1)
    err = _thresholded(Jl, golden['ref_jac'])
    assert err < 1e-8, 'dd vs reference C: %.3e' % err


# NOTE: no interpret-mode test for the dd Pallas kernel — interpret
# execution of the dd graph is impractically slow on CPU (>10 min even
# eagerly for one 64-state block). The kernel's CPU-checkable math is
# covered by jacobian_dd_xla (same _compute_dd/_column_block_dd code),
# and the compiled kernel is cross-validated on-chip against the golden
# fixtures and the XLA path (docs/performance.md).


def test_dd_xla_all_features_synthetic(tmp_path):
    """PLOG + Chebyshev + SRI + chemically-activated + fractional nu."""
    from pyjac_tpu.testers.synthetic import random_states, \
        synthetic_mechanism
    path = tmp_path / 'synth.inp'
    path.write_text(synthetic_mechanism(n_species=9, n_reactions=24,
                                        seed=7))
    mech = Mechanism.from_files(str(path))
    packed = pack(mech)
    assert packed.has_plog and packed.has_cheb and packed.has_sri
    y, _, P = random_states(mech, 64, seed=3)
    Jref, _ = jacobian_and_dydt(packed, 0.0, jnp.asarray(P),
                                jnp.asarray(y))
    assert _floored(np.asarray(jacobian_dd_xla(packed, P, y,
                                               n_dyn=10)[0]),
                    np.asarray(Jref)) < 1e-8


def test_dd_xla_vs_synth_reference_c_golden(tmp_path):
    """dd vs the reference's generated C on the all-features mech."""
    from pyjac_tpu.testers.synthetic import synthetic_mechanism
    g = np.load(GOLDEN.parent / 'golden_synth_refc.npz')
    path = tmp_path / 'synth.inp'
    path.write_text(synthetic_mechanism(n_species=9, n_reactions=24,
                                        seed=7))
    mech = Mechanism.from_files(str(path))
    packed = pack(mech)
    n = len(g['T'])
    Jdd, _ = jacobian_dd_xla(packed, g['P'], g['y'], n_dyn=10)
    Jl = np.asarray(Jdd).transpose(0, 2, 1).reshape(n, -1)
    err = _floored(Jl, g['ref_jac'])
    assert err < 1e-8, 'dd vs synth reference C: %.3e' % err


def test_dd_xla_conv(tmp_path):
    from pyjac_tpu.testers.synthetic import random_states, \
        synthetic_mechanism
    path = tmp_path / 'synth.inp'
    path.write_text(synthetic_mechanism(n_species=9, n_reactions=24,
                                        seed=7))
    mech = Mechanism.from_files(str(path))
    packed = pack(mech)
    y, _, _ = random_states(mech, 64, seed=4)
    rho = np.full(64, 1.2)
    Jref, fref = jacobian_and_dydt(packed, 0.0, jnp.asarray(rho),
                                   jnp.asarray(y), conp=False)
    Jdd, fdd = jacobian_dd_xla(packed, rho, y, conp=False, n_dyn=10)
    assert _floored(np.asarray(Jdd), np.asarray(Jref)) < 1e-8
    scale = np.abs(np.asarray(fref)).max()
    assert np.abs(np.asarray(fdd) - np.asarray(fref)).max() / scale < 1e-10


def test_big_kernel_traces_any_size(tmp_path):
    """PallasDDJacobianBig (n-heptane-class kernel) builds and traces
    without R*N one-hot constants; numerics are validated on-chip
    against the regular dd kernel (6.6e-15) and the f64 XLA Jacobian
    (docs/performance.md) — interpret mode is impractically slow on CPU.
    """
    import jax

    from pyjac_tpu.ops.pallas_dd import PallasDDJacobianBig
    from pyjac_tpu.testers.synthetic import synthetic_mechanism
    path = tmp_path / 'm.inp'
    path.write_text(synthetic_mechanism(n_species=21, n_reactions=60,
                                        seed=11, gri_mix=True))
    mech = Mechanism.from_files(str(path))
    packed = pack(mech)
    big = PallasDDJacobianBig(packed, block_b=128, jb=8)
    # the only (R, N)-scaling constants are the nu contraction slices
    # themselves (2 * N * R f32 by design) — no per-slot one-hots
    R, N = packed.n_reactions, packed.n_species
    for nm, v in big.consts.items():
        if nm.startswith(('nuT_s', 'nuR_s')):
            continue
        assert v.size < R * N / 2, (nm, v.shape)
    B = 128
    sh = jax.ShapeDtypeStruct((N, B), jnp.float32)
    sp = jax.ShapeDtypeStruct((1, B), jnp.float32)
    out = jax.eval_shape(big.call_tr, sh, sh, sp, sp)
    assert out[0].shape == (big.n_cols_pad, N, B)
    assert out[2].shape == (N, B)
