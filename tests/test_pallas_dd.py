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


def test_kernel_rejects_wrong_state_width(tmp_path):
    """A (B, N') batch from a DIFFERENT mechanism variant must raise a
    clear ValueError up front, not a Mosaic block-shape lowering error
    (hit in practice pairing 10-species .cti states with the 9-species
    .inp pack)."""
    from pyjac_tpu.ops.pallas_dd import (PallasDDJacobian,
                                         PallasDDJacobianBig,
                                         PallasDDJacobianSparse)
    from pyjac_tpu.ops.pallas_jacobian import PallasJacobian
    from pyjac_tpu.testers.synthetic import plausible_mechanism
    path = tmp_path / 'plaus.inp'
    path.write_text(plausible_mechanism(12, 30, seed=2))
    packed = pack(Mechanism.from_files(str(path)))
    bad = np.ones((8, packed.n_species + 1))
    for cls in (PallasJacobian, PallasDDJacobian, PallasDDJacobianBig,
                PallasDDJacobianSparse):
        with pytest.raises(ValueError, match='state batch'):
            cls(packed, interpret=True)(bad, np.full(8, 101325.0))


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
    # themselves (2 * N * R f32 by design) — no per-slot one-hots.
    # The compact pres-mod gather/scatter tables (pmc_/pdc_, round 4)
    # scale as R * R_presmod and live in the XLA parts stage only:
    # they must stay OUT of the streamed column-kernel consts.
    R, N = packed.n_reactions, packed.n_species
    for nm, v in big.consts.items():
        if nm.startswith(('nuT_s', 'nuR_s', 'pmc_', 'pdc_')):
            continue
        assert v.size < R * N / 2, (nm, v.shape)
    assert not [nm for nm in big.kconsts
                if nm.startswith(('pmc_', 'pdc_'))]
    B = 128
    sh = jax.ShapeDtypeStruct((N, B), jnp.float32)
    sp = jax.ShapeDtypeStruct((1, B), jnp.float32)
    out = jax.eval_shape(big.call_tr, sh, sh, sp, sp)
    assert out[0].shape == (big.n_cols_pad, N, B)
    assert out[2].shape == (N, B)


# ---------------------------------------------------------------------------
# round 3: compressed per-column ("touched") assembly + log-space rates
# ---------------------------------------------------------------------------

def _states_for(mech, n=8, **kw):
    from pyjac_tpu.testers.synthetic import random_states
    y, _, P = random_states(mech, n, **kw)
    return y.astype(np.float64), P.astype(np.float64)


def _synth_packed(tmp_path, name='m.inp', **kw):
    from pyjac_tpu.testers.synthetic import synthetic_mechanism
    path = tmp_path / name
    path.write_text(synthetic_mechanism(**kw))
    mech = Mechanism.from_files(str(path))
    return mech, pack(mech)


def test_compact_pdep_bit_identical(tmp_path):
    """Compact pdep-row falloff evaluation (round 4: the falloff /
    chemact machinery runs on the one-hot-gathered pdep row set and
    scatters back, the PLOG/Chebyshev row economy applied to pressure
    modification) is an exact refactor — identical dd ops on exactly
    gathered inputs — so it must match the dense-masked path to the
    last bit on every category (the all-features synthetic has Troe,
    SRI, chemact, spec-pdep, PLOG and Chebyshev rows)."""
    from pyjac_tpu.ops import thermo

    mech, packed = _synth_packed(tmp_path, n_species=9, n_reactions=24,
                                 seed=7)
    assert (np.asarray(packed.falloff_mask) |
            np.asarray(packed.chemact_mask)).any()
    y, P = _states_for(mech)
    Jf, ff = jacobian_dd_xla(packed, P, y, compact_pdep=False)
    Jc, fc = jacobian_dd_xla(packed, P, y, compact_pdep=True)
    assert np.array_equal(np.asarray(Jf), np.asarray(Jc))
    assert np.array_equal(np.asarray(ff), np.asarray(fc))
    # conv mode exercises the rho-based c_u / psi branches
    _, _, rho, _ = thermo.eval_conc(packed, jnp.asarray(y[:, 0]),
                                    jnp.asarray(P),
                                    jnp.asarray(y[:, 1:]))
    rho = np.asarray(rho)
    Jf2, _ = jacobian_dd_xla(packed, rho, y, conp=False,
                             compact_pdep=False)
    Jc2, _ = jacobian_dd_xla(packed, rho, y, conp=False,
                             compact_pdep=True)
    assert np.array_equal(np.asarray(Jf2), np.asarray(Jc2))


def test_sparse_columns_bit_identical(tmp_path):
    """The compressed per-column assembly (the reference's touched[]
    structure, create_jacobian.py:2641/3301-3404) contracts only the
    reactions participating in each column; on the same slice grids it
    must agree with the dense dd path to the last bit."""
    from pyjac_tpu.ops.pallas_dd import jacobian_dd_xla_sparse

    mech, packed = _synth_packed(tmp_path, n_species=9, n_reactions=24,
                                 seed=7)
    y, P = _states_for(mech)
    Jd, fd = jacobian_dd_xla(packed, P, y)
    Js, fs = jacobian_dd_xla_sparse(packed, P, y)
    assert np.array_equal(np.asarray(Jd), np.asarray(Js))
    assert np.array_equal(np.asarray(fd), np.asarray(fs))


def test_sparse_columns_conv_bit_identical(tmp_path):
    from pyjac_tpu.ops import thermo
    from pyjac_tpu.ops.pallas_dd import jacobian_dd_xla_sparse

    mech, packed = _synth_packed(tmp_path, n_species=9, n_reactions=24,
                                 seed=7)
    y, P = _states_for(mech)
    _, _, rho, _ = thermo.eval_conc(packed, jnp.asarray(y[:, 0]),
                                    jnp.asarray(P),
                                    jnp.asarray(y[:, 1:]))
    rho = np.asarray(rho)
    Jd, _ = jacobian_dd_xla(packed, rho, y, conp=False)
    Js, _ = jacobian_dd_xla_sparse(packed, rho, y, conp=False)
    assert np.array_equal(np.asarray(Jd), np.asarray(Js))


def test_sparse_col_pack_structure(tmp_path):
    """Compression bookkeeping: every (reaction, column) participation
    is covered, padding is masked, Rmax is the padded max."""
    from pyjac_tpu.ops.pallas_dd import _consts_dd, _sparse_col_pack

    mech, packed = _synth_packed(tmp_path, n_species=9, n_reactions=24,
                                 seed=7)
    _, meta = _consts_dd(packed)
    SC = _sparse_col_pack(packed, meta, jb=4)
    J = meta['J']
    assert SC['nuc'].shape == (SC['J_pad'], meta['N'], SC['Rmax'])
    # padded nuc columns are exactly zero
    nuc = SC['nuc'].reshape(SC['J_pad'], meta['N'], SC['Rmax'])
    pad = ~SC['valid']
    assert (np.abs(nuc.transpose(0, 2, 1)[pad]) == 0).all()
    # every nu_net nonzero in a reduced column appears in its set
    nu = np.asarray(packed.nu_net)
    for j in range(J):
        touching = set(np.nonzero(nu[:, j])[0].tolist())
        have = set(SC['ridx'][j][SC['valid'][j]].tolist())
        assert touching <= have


def test_sparse_columns_expanded_bit_identical(tmp_path):
    """Role-expanded tables (single arithmetic-free gather; signs and
    role linear combination folded into duplicated nu columns) agree
    bit-for-bit with the dense dd path."""
    from pyjac_tpu.ops.pallas_dd import jacobian_dd_xla_sparse

    mech, packed = _synth_packed(tmp_path, n_species=9, n_reactions=24,
                                 seed=7)
    y, P = _states_for(mech)
    Jd, fd = jacobian_dd_xla(packed, P, y)
    Jx, fx = jacobian_dd_xla_sparse(packed, P, y, expanded=True)
    assert np.array_equal(np.asarray(Jd), np.asarray(Jx))
    assert np.array_equal(np.asarray(fd), np.asarray(fx))


def test_log_rates_xla_matches_linear(tmp_path):
    """Log-space dd rates (single exponential of ln kf (- ln Kc) +
    sum nu ln C; reference math rate_subs.py:660-809) agree with the
    linear-space dd path within dd roundoff, including the exact-zero
    structure for zero concentrations (sub-f32-floor entries exempt)."""
    mech, packed = _synth_packed(tmp_path, n_species=9, n_reactions=24,
                                 seed=7)
    y, P = _states_for(mech, 16)
    # force exact zero concentrations in a few states
    y[:4, 3] = 0.0
    y[:2, 5] = 0.0
    Jd, fd = jacobian_dd_xla(packed, P, y)
    Jl, fl = jacobian_dd_xla(packed, P, y, log_rates=True)
    Jd, Jl = np.asarray(Jd), np.asarray(Jl)
    scale = np.abs(Jd).max()
    assert np.abs(Jl - Jd).max() / scale < 1e-11
    m = np.abs(Jd) > 1e-11 * scale
    assert np.abs((Jl - Jd)[m] / Jd[m]).max() < 1e-9
    # zero structure: may differ only where the linear value is below
    # the dd pipeline's f32 range floor relative to the matrix scale
    zd, zl = Jd == 0.0, Jl == 0.0
    mism = zd != zl
    assert (np.abs(Jd[mism]) / scale < 1e-20).all()
    fscale = np.abs(np.asarray(fd)).max()
    assert np.abs(np.asarray(fl) - np.asarray(fd)).max() / fscale < 1e-9


def test_log_rates_plog_placeholder_sign(tmp_path):
    """A PLOG row with a zero placeholder main Arrhenius line keeps its
    full rate through the kernel log path (A_sign_eff neutralisation,
    mirroring eval_kf's sign-before-overwrite ordering)."""
    import re

    from pyjac_tpu.testers.synthetic import synthetic_mechanism
    text = synthetic_mechanism(n_species=9, n_reactions=24, seed=7)
    lines = text.splitlines()
    first_plog = next(k for k, ln in enumerate(lines) if 'PLOG' in ln)
    main = next(k for k in range(first_plog - 1, -1, -1)
                if '<=>' in lines[k])
    lines[main] = re.sub(r'\d\.\d+E\+\d+', '0.000E+00', lines[main],
                         count=1)
    path = tmp_path / 'z.inp'
    path.write_text('\n'.join(lines))
    mech = Mechanism.from_files(str(path))
    packed = pack(mech)
    assert packed.has_plog and packed.has_negative_A
    y, P = _states_for(mech)
    Jd, _ = jacobian_dd_xla(packed, P, y)
    Jl, _ = jacobian_dd_xla(packed, P, y, log_rates=True)
    scale = np.abs(np.asarray(Jd)).max()
    assert np.abs(np.asarray(Jl) - np.asarray(Jd)).max() / scale < 1e-11


def test_big_kernel_sparse_traces(tmp_path):
    """Sparse-column Big kernel builds and traces; numerics validated
    on-chip (interpret mode is impractically slow) and bit-exactly on
    CPU via jacobian_dd_xla_sparse."""
    import jax

    from pyjac_tpu.ops.pallas_dd import PallasDDJacobianBig

    mech, packed = _synth_packed(tmp_path, n_species=21, n_reactions=60,
                                 seed=11, gri_mix=True)
    big = PallasDDJacobianBig(packed, block_b=128, jb=8,
                              sparse_cols=True)
    assert big.SC['Rmax'] <= 48
    N = packed.n_species
    B = 128
    sh = jax.ShapeDtypeStruct((N, B), jnp.float32)
    sp = jax.ShapeDtypeStruct((1, B), jnp.float32)
    out = jax.eval_shape(big.call_tr, sh, sh, sp, sp)
    assert out[0].shape == (big.n_cols_pad, N, B)


def test_big_kernel_parts_tiled_traces(tmp_path):
    """Reaction-tiled Mosaic parts kernel (round-4: the 654-class
    speed path — the barriered XLA parts stage was 79% of that pass).
    Builds + traces with every shape[0]==R constant streamed by the
    reaction grid axis; on-chip numerics via the verify skill."""
    import jax

    from pyjac_tpu.ops.pallas_dd import PallasDDJacobianBig

    mech, packed = _synth_packed(tmp_path, n_species=21, n_reactions=60,
                                 seed=11, gri_mix=True)
    big = PallasDDJacobianBig(packed, block_b=128, jb=8, tile_r=16,
                              sparse_cols=True, parts_kernel=True)
    N = packed.n_species
    B = 256
    sh = jax.ShapeDtypeStruct((N, B), jnp.float32)
    sp = jax.ShapeDtypeStruct((1, B), jnp.float32)
    out = jax.eval_shape(big.call_tr, sh, sh, sp, sp)
    assert out[0].shape == (big.n_cols_pad, N, B)
    assert out[2].shape == (N, B)


def test_parts_tiled_kernel_matches_xla_sections(tmp_path):
    """The tiled parts kernel's role arrays (interpret mode) match the
    identical `_compute_reaction_parts` section traced under plain
    barriered XLA.  Interpret runs Mosaic kernels through XLA, whose
    per-program fusion perturbs dd low words ~1e-11 relative (the
    round-2 scan-context lesson); on real TPU hardware Mosaic performs
    none of those rewrites, so this bounds kernel-body bugs while the
    exactness claim is validated on-chip (docs/performance.md)."""
    import jax

    from pyjac_tpu.ops import doublefloat as df
    from pyjac_tpu.ops.pallas_dd import (DDA, PallasDDJacobianBig,
                                         _compute_reaction_parts,
                                         _compute_state_thermo,
                                         _tiled_role_spec)
    from pyjac_tpu.testers.synthetic import random_states

    mech, packed = _synth_packed(tmp_path, n_species=9, n_reactions=24,
                                 seed=7, gri_mix=True)
    big = PallasDDJacobianBig(packed, block_b=8, jb=8, tile_r=8,
                              sparse_cols=True, parts_kernel=True,
                              interpret=True)
    meta = big.meta
    Call = {k: jnp.asarray(v) for k, v in big.consts.items()}
    y, _, P = random_states(mech, 16, seed=3)
    y64 = y.astype(np.float64)
    P64 = P.astype(np.float64)
    yh = y64.T.astype(np.float32)
    yl = (y64.T - yh.astype(np.float64)).astype(np.float32)
    ph = P64[None].astype(np.float32)
    plo = (P64[None] - ph.astype(np.float64)).astype(np.float32)
    ydd = DDA(jnp.asarray(yh), jnp.asarray(yl))
    pdd = DDA(jnp.asarray(ph), jnp.asarray(plo))

    def ref():
        with df.barrier_mode('xla'):
            st = _compute_state_thermo(meta, Call, ydd, pdd)
            rp = _compute_reaction_parts(meta, Call, st)
        return st, rp

    st, rp_ref = jax.jit(ref)()
    rp_k = big.parts_stage(st, 16)
    for nm in _tiled_role_spec(meta):
        if nm.startswith('vals_f'):
            a, b = (rp_k['vals_f'][int(nm[6:])],
                    rp_ref['vals_f'][int(nm[6:])])
        elif nm.startswith('vals_p'):
            a, b = (rp_k['vals_p'][int(nm[6:])],
                    rp_ref['vals_p'][int(nm[6:])])
        else:
            a, b = rp_k[nm], rp_ref[nm]
        av = np.asarray(a.hi, np.float64) + np.asarray(a.lo, np.float64)
        bv = np.asarray(b.hi, np.float64) + np.asarray(b.lo, np.float64)
        s = max(np.abs(bv).max(), 1e-300)
        assert np.abs(av - bv).max() / s < 5e-9, nm


def test_sparse_stage_b_fused_interpret_numerics(tmp_path):
    """CPU numerics for the fused-gather stage-B column kernel
    (previously trace-only in CI; a kernel regression would have
    surfaced only in a manual on-chip verify).  Stage-A outputs come
    from the identical eager XLA dd section; the fused kernel runs in
    interpret mode EAGERLY (a barriered dd jit on XLA:CPU is a
    minutes-long compile, and eager per-op dispatch keeps every EFT
    exact) and must match the XLA sparse-expanded reference path."""
    from pyjac_tpu.ops import doublefloat as df
    from pyjac_tpu.ops.pallas_dd import (
        DDA, PallasDDJacobianSparse, _compute_dd, _postcol_stream_spec,
        _stack_expanded_src, jacobian_dd_xla_sparse)

    mech, packed = _synth_packed(tmp_path, n_species=6, n_reactions=10,
                                 seed=7, gri_mix=True)
    B = 8
    pjs = PallasDDJacobianSparse(packed, block_b=8, block_b_cols=8,
                                 jb=4, fuse_gather=True, interpret=True)
    y, P = _states_for(mech, n=B)
    y64, P64 = y.astype(np.float64), np.asarray(P, np.float64)
    yh = y64.T.astype(np.float32)
    yl = (y64.T - yh.astype(np.float64)).astype(np.float32)
    ph = P64[None].astype(np.float32)
    plo = (P64[None] - ph.astype(np.float64)).astype(np.float32)

    C = {k: jnp.asarray(v) for k, v in pjs.consts.items()}
    with df.barrier_mode('xla'):
        parts = _compute_dd(pjs.meta, C, DDA(jnp.asarray(yh),
                                             jnp.asarray(yl)),
                            DDA(jnp.asarray(ph), jnp.asarray(plo)))
        src = _stack_expanded_src(pjs.meta, C, parts)
    pad = pjs.n_src_pad - src.hi.shape[0]
    zpad = jnp.zeros((pad, B), jnp.float32)
    src_h = jnp.concatenate([src.hi, zpad], 0)
    src_l = jnp.concatenate([src.lo, zpad], 0)
    postvals = []
    for nm, _ in _postcol_stream_spec(pjs.meta):
        postvals += [parts[nm].hi, parts[nm].lo]

    Jh, Jl = pjs.stage_b_fused_fn(src_h, src_l, postvals)
    Jk = (np.asarray(Jh, np.float64) +
          np.asarray(Jl, np.float64))[:pjs.meta['J']].transpose(2, 1, 0)

    Jref, _ = jacobian_dd_xla_sparse(packed, P, y, expanded=True)
    Jref = np.asarray(Jref)
    scale = np.abs(Jref).max()
    err = np.abs(Jk - Jref[:, :, 1:]).max() / scale
    assert err < 5e-9, err


@pytest.mark.parametrize('expanded,conp', [(False, True), (True, True),
                                           (True, False)])
def test_big_pipeline_interpret_numerics(tmp_path, expanded, conp):
    """END-TO-END CPU numerics for the 654-class pipeline (tiled+split
    parts kernels -> sparse column kernel) in eager interpret mode:
    the full `PallasDDJacobianBig(sparse_cols=True, parts_kernel=True)`
    public __call__ against the XLA dd reference.  Previously only the
    parts SECTION had interpret numerics; the column kernel and the
    stage plumbing were trace-only in CI.  ``expanded`` covers the
    round-5 single-gather assembly (`expanded_cols=True`, the
    flagship fused-gather tables at big-mech scale); ``conp=False``
    the constant-volume formulation through the same pipeline."""
    from pyjac_tpu.ops.pallas_dd import PallasDDJacobianBig
    from pyjac_tpu.testers.synthetic import random_states

    mech, packed = _synth_packed(tmp_path, n_species=9, n_reactions=24,
                                 seed=7, gri_mix=True)
    big = PallasDDJacobianBig(packed, block_b=8, jb=8, tile_r=8,
                              sparse_cols=True, parts_kernel=True,
                              expanded_cols=expanded, conp=conp,
                              interpret=True)
    assert big._split_r1          # the split path is the default
    y, _, P = random_states(mech, 8, seed=3)
    y = y.astype(np.float64)
    P = P.astype(np.float64)
    if not conp:
        P = np.full(len(y), 1.2)      # CONV parameter is density
    Jk, fk = big(y, P)
    Jref, fref = jacobian_dd_xla(packed, P, y, conp=conp)
    Jref, fref = np.asarray(Jref), np.asarray(fref)
    s = np.abs(Jref).max()
    assert np.abs(np.asarray(Jk) - Jref).max() / s < 5e-9
    sf = np.abs(fref).max()
    assert np.abs(np.asarray(fk) - fref).max() / sf < 5e-9


def test_rmax_classes_bit_identical(tmp_path):
    """Variable-Rmax column classes (``rmax_classes``: columns sorted
    by role count, blocks partitioned into per-class tables with
    class-sized Rmax) are exactly the uniform-Rmax expanded pipeline:
    padding rows are exact zeros in the integer-sliced MXU passes and
    every class shares the global ``nu_max_l1`` slice scaling, so the
    host-unpermuted output is bitwise-equal.  The 654-class mech's
    mean role count is 16 against Rmax=40 — the classes halve the
    column kernel's streamed+contracted rows there."""
    from pyjac_tpu.ops.pallas_dd import PallasDDJacobianBig
    from pyjac_tpu.testers.synthetic import random_states

    mech, packed = _synth_packed(tmp_path, n_species=9, n_reactions=24,
                                 seed=7, gri_mix=True)
    kw = dict(block_b=8, jb=1, tile_r=8, sparse_cols=True,
              parts_kernel=True, expanded_cols=True, interpret=True)
    b1 = PallasDDJacobianBig(packed, **kw)
    b2 = PallasDDJacobianBig(packed, rmax_classes=3, **kw)
    assert b2.col_classes and len(b2.col_classes) > 1
    assert b2.col_classes[-1]['Rmax'] < b2.SC['Rmax']
    orig = np.concatenate([c['orig'] for c in b2.col_classes])
    assert sorted(orig.tolist()) == list(range(b2.meta['J']))
    y, _, P = random_states(mech, 8, seed=3)
    y = y.astype(np.float64)
    P = P.astype(np.float64)
    J1, f1 = b1(y, P)
    J2, f2 = b2(y, P)
    assert np.array_equal(np.asarray(J1), np.asarray(J2))
    assert np.array_equal(np.asarray(f1), np.asarray(f2))


def test_permute_reactions_dd_bitwise(tmp_path):
    """Reaction reordering (core.pack.permute_reactions) is exactly
    invariant on the dd path: per-row math is elementwise and the
    stoichiometric contractions are exact integer-grid MXU passes —
    the basis of the split-grid tiled parts kernel's internal
    pres-mod-first sort."""
    from pyjac_tpu.core.pack import (permute_reactions,
                                     presmod_first_order)

    mech, packed = _synth_packed(tmp_path, n_species=9, n_reactions=24,
                                 seed=7)
    y, P = _states_for(mech)
    perm = presmod_first_order(packed)
    assert not np.array_equal(perm, np.arange(len(perm)))
    p2 = permute_reactions(packed, perm)
    J1, f1 = jacobian_dd_xla(packed, P, y)
    J2, f2 = jacobian_dd_xla(p2, P, y)
    assert np.array_equal(np.asarray(J1), np.asarray(J2))
    assert np.array_equal(np.asarray(f1), np.asarray(f2))


def test_split_presmod_tiled_matches_unsplit(tmp_path):
    """The split-grid tiled parts stage (pres-mod rows sorted first;
    elementary tiles trace a has_pres_mod=False body) produces the
    same role arrays as the single-kernel stage, modulo the internal
    permutation and interpret-mode XLA fusion noise (~1e-11)."""
    import jax

    from pyjac_tpu.ops import doublefloat as df
    from pyjac_tpu.ops.pallas_dd import (DDA, PallasDDJacobianBig,
                                         _compute_state_thermo,
                                         _tiled_role_spec)
    from pyjac_tpu.testers.synthetic import random_states

    mech, packed = _synth_packed(tmp_path, n_species=9, n_reactions=24,
                                 seed=7, gri_mix=True)
    big_s = PallasDDJacobianBig(packed, block_b=8, jb=8, tile_r=8,
                                sparse_cols=True, parts_kernel=True,
                                interpret=True)
    big_u = PallasDDJacobianBig(packed, block_b=8, jb=8, tile_r=8,
                                sparse_cols=True, parts_kernel=True,
                                split_presmod=False, interpret=True)
    assert big_s._split_r1 and big_s._perm is not None
    assert big_u._split_r1 is None
    perm = np.asarray(big_s._perm)

    y, _, P = random_states(mech, 16, seed=3)
    y64, P64 = y.astype(np.float64), P.astype(np.float64)
    yh = y64.T.astype(np.float32)
    yl = (y64.T - yh.astype(np.float64)).astype(np.float32)
    ph = P64[None].astype(np.float32)
    plo = (P64[None] - ph.astype(np.float64)).astype(np.float32)
    ydd = DDA(jnp.asarray(yh), jnp.asarray(yl))
    pdd = DDA(jnp.asarray(ph), jnp.asarray(plo))

    def run(big):
        Call = {k: jnp.asarray(v) for k, v in big.consts.items()}
        with df.barrier_mode('xla'):
            st = jax.jit(lambda: _compute_state_thermo(
                big.meta, Call, ydd, pdd))()
        return big.parts_stage(st, 16)

    rp_s, rp_u = run(big_s), run(big_u)
    for nm in _tiled_role_spec(big_u.meta):
        if nm.startswith('vals_f'):
            a, b = rp_s['vals_f'][int(nm[6:])], rp_u['vals_f'][int(nm[6:])]
        elif nm.startswith('vals_p'):
            a, b = rp_s['vals_p'][int(nm[6:])], rp_u['vals_p'][int(nm[6:])]
        else:
            a, b = rp_s[nm], rp_u[nm]
        av = np.asarray(a.hi, np.float64) + np.asarray(a.lo, np.float64)
        bv = (np.asarray(b.hi, np.float64) +
              np.asarray(b.lo, np.float64))[perm]     # unsplit -> sorted
        s = max(np.abs(bv).max(), 1e-300)
        assert np.abs(av - bv).max() / s < 5e-9, nm


def _extreme_kc_mech(tmp_path, a5x=36000.0):
    """A+B<=>2X with extreme product thermo: kr = kf/Kc ~ 2.6e39
    overflows the f32 exponent range while every finished Jacobian
    entry fits (trace-level X attenuates the reverse derivatives).
    The reference's f64 C handles this trivially (rate_subs.py:660-809
    Kc path); the dd pipeline needs log-space rates."""
    from pyjac_tpu.testers.synthetic import tiny_mechanism
    path = tmp_path / 'extreme.inp'
    path.write_text(tiny_mechanism(a5x=a5x))
    mech = Mechanism.from_files(str(path))
    return mech, pack(mech)


def _extreme_states(n=8, seed=0):
    rng = np.random.default_rng(seed)
    T = rng.uniform(1000.0, 1400.0, n)
    Y = np.zeros((n, 3))
    Y[:, 0] = rng.uniform(0.1, 0.3, n)
    Y[:, 1] = rng.uniform(0.2, 0.5, n)
    Y[:, 2] = 10.0 ** rng.uniform(-7, -5.5, n)     # trace product
    y = np.concatenate([T[:, None], Y], axis=1)
    P = np.full(n, 101325.0 * 10)
    return y, P


def test_log_rates_full_range(tmp_path):
    """f64-range parity (reference rate_subs.py:660-809): when kr =
    kf/Kc exceeds the f32 exponent range but the finished Jacobian
    fits, the linear dd pipeline overflows and the log-space mode
    reproduces the true-f64 Jacobian inside the 1e-8 parity bar."""
    import jax.numpy as jnp

    from pyjac_tpu.ops import rates
    from pyjac_tpu.ops.jacobian import jacobian_and_dydt

    mech, packed = _extreme_kc_mech(tmp_path)
    y, P = _extreme_states()
    Tj, Pj = jnp.asarray(y[:, 0]), jnp.asarray(P)
    kr = (np.asarray(rates.eval_kf(packed, Tj, Pj)) /
          np.asarray(rates.eval_kc(packed, Tj)))
    assert kr.max() > 1e39                       # beyond f32 range
    Jref, _ = jacobian_and_dydt(packed, 0.0, Pj, jnp.asarray(y))
    Jref = np.asarray(Jref)                      # true f64 (CPU)
    assert np.isfinite(Jref).all() and np.abs(Jref).max() < 1e38

    Jlin, _ = jacobian_dd_xla(packed, P, y)
    assert not np.isfinite(np.asarray(Jlin)).all()   # documented limit
    Jlog, _ = jacobian_dd_xla(packed, P, y, log_rates=True)
    Jlog = np.asarray(Jlog)
    assert np.isfinite(Jlog).all()
    assert _thresholded(Jlog, Jref) < 1e-8


def test_sparse_pipeline_fused_traces(tmp_path):
    """Flagship sparse pipeline builds and traces in both gather modes
    with identical output structure; fused == three-stage was probed
    bit-identical on-chip (numerics pinned on CPU via
    jacobian_dd_xla_sparse(expanded=True))."""
    import jax

    from pyjac_tpu.ops.pallas_dd import PallasDDJacobianSparse

    mech, packed = _synth_packed(tmp_path, n_species=21, n_reactions=60,
                                 seed=11, gri_mix=True)
    N = packed.n_species
    outs = []
    for fuse in (False, True):
        pj = PallasDDJacobianSparse(packed, block_b=128,
                                    block_b_cols=128, fuse_gather=fuse)
        B = 2 * max(pj.block_b, pj.block_b_cols)
        sh = jax.ShapeDtypeStruct((N, B), jnp.float32)
        sp = jax.ShapeDtypeStruct((1, B), jnp.float32)
        out = jax.eval_shape(pj.call_tr, sh, sh, sp, sp)
        assert out[0].shape == (pj.n_cols_pad, N, B)    # J columns hi
        assert out[4].shape == (N, B)                   # dydt hi
        outs.append(tuple((o.shape, o.dtype) for o in out))
    assert outs[0] == outs[1]


def test_compute_dd_precomputed_state_bit_identical(tmp_path):
    """The round-4 tiled parts kernel will feed the (N, B) state +
    thermo section in as inputs (one evaluation per batch tile, not
    per reaction tile); the split path must be bit-identical to the
    monolithic one."""
    from pyjac_tpu.ops.ddx import DDA
    from pyjac_tpu.ops.pallas_dd import (_compute_dd,
                                         _compute_state_thermo,
                                         _consts_dd, _split64)

    mech, packed = _synth_packed(tmp_path, n_species=13, n_reactions=40,
                                 seed=7, gri_mix=True)
    y, P = _states_for(mech, 8)
    consts, meta = _consts_dd(packed, conp=True)
    C = {k: jnp.asarray(v) for k, v in consts.items()}
    yd = DDA(*_split64(jnp.asarray(y).T))
    pd = DDA(*_split64(jnp.asarray(P, jnp.float64)[None]))
    p1 = _compute_dd(meta, C, yd, pd)
    pre = _compute_state_thermo(meta, C, yd, pd)
    p2 = _compute_dd(meta, C, yd, pd, pre=pre)
    for k in ('f_out', 'col0', 'cp', 'mw_avg', 'psi_q' if
              meta['has_pres_mod'] else 'f_out'):
        a, b = p1[k], p2[k]
        assert jnp.array_equal(a.hi, b.hi) and jnp.array_equal(a.lo,
                                                               b.lo), k
    for s in range(meta['Sf']):
        assert jnp.array_equal(p1['vals_f'][s].hi, p2['vals_f'][s].hi)
