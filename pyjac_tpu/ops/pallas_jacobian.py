"""Pallas TPU kernel: fused analytical Jacobian + dy/dt.

The XLA-composed Jacobian (ops/jacobian.py) is memory-bound: its
(B, R, N) intermediates stream through HBM. This kernel is the explicit
analog of the reference's CUDA shared-memory manager
(reference: pyjac/core/shared_memory.py): it tiles the state batch,
keeps *every* per-state intermediate — concentrations, rate constants,
rates of progress, falloff terms, slot derivatives, and the Jacobian
assembly operand — resident in VMEM, and touches HBM only for the state
tile in and the Jacobian tile out (~12 KB/state instead of ~230 KB).

Design choices (see docs/architecture.md):

* **batch-minor layout**: all per-reaction values are (R, B_T), per-
  species values (N, B_T) — the state index rides the 128-wide vector
  lanes, mirroring the reference GPU code's ``INDEX()`` SoA layout.
* **gathers as GEMMs**: slot concentration gathers and the
  stoichiometric scatter both become matmuls against static one-hot
  matrices, which Mosaic maps onto the MXU (TPU has no fast gather).
* the final species-block contraction is one (N, R) @ (R, J*B_T) GEMM
  per tile.

f32, CONP and CONV, covering every reaction category — Arrhenius,
third-body, Lindemann / Troe / SRI falloff, chemically-activated, PLOG,
Chebyshev, negative-A and fractional stoichiometry; only sign-flipping
PLOG ladders and very large mechanisms (one-hot constants beyond ~50 MB)
fall back to the XLA path (see ``supports``).  The f64-grade variant of
this kernel is :mod:`pyjac_tpu.ops.pallas_dd`.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.constants import PA, RU

_LN_PA_RU = math.log(PA / RU)
_LOG10 = math.log(10.0)
_TINY32 = np.float32(1.0e-30)    # f32-range guard (1e-300 in the f64 ref)
_F0 = np.float32(0.0)
_F1 = np.float32(1.0)
_FM1 = np.float32(-1.0)


def _dot(a, b):
    """f32-exact matmul: Mosaic's default f32 dot is a single bf16 pass
    (~4e-3 relative error); HIGHEST runs the multi-pass decomposition."""
    return jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)


def _dot_x(a, b):
    """Matmul whose LHS is exactly representable in bf16 (one-hot
    selection matrices, small-integer stoichiometry).

    Mosaic has no per-operand precision, so the bf16 3-way split of the
    RHS is done by hand: b = hi + mid + lo with each term bf16-exact,
    giving ~f32-exact results from three single-pass MXU dots (an exact
    LHS never needs splitting).
    """
    # split by mantissa truncation with explicit bit ops: plain bf16
    # cast round-trips are elided under --xla_allow_excess_precision and
    # reduce_precision has no Mosaic lowering. Truncation (not RNE)
    # still yields an exact 3-term decomposition, each term
    # bf16-representable.
    def trunc16(x):
        u = jax.lax.bitcast_convert_type(x, jnp.uint32)
        return jax.lax.bitcast_convert_type(
            u & jnp.uint32(0xFFFF0000), jnp.float32)

    hi = trunc16(b)
    r1 = b - hi
    mid = trunc16(r1)
    lo = (r1 - mid).astype(jnp.bfloat16)
    ab = a.astype(jnp.bfloat16)
    out = jnp.dot(ab, hi.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    out = out + jnp.dot(ab, mid.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
    return out + jnp.dot(ab, lo, preferred_element_type=jnp.float32)


def _dot_ex(a, b):
    """Matmul with BOTH operands exact in bf16 (one-hot x one-hot):
    a single MXU pass with f32 accumulation is exact."""
    return jnp.dot(a, b, precision=jax.lax.Precision.DEFAULT,
                   preferred_element_type=jnp.float32)


def check_state_width(y, n_state: int, cls: str) -> None:
    """Validate the (B, N) state batch width up front.

    A wrong-width batch (the classic mistake: states drawn for a
    different variant of the same mechanism, e.g. the 10-species
    ``.cti`` vs the 9-species ``.inp`` H2/O2) otherwise surfaces as an
    inscrutable Mosaic block-shape lowering error deep inside
    ``pallas_call``."""
    shape = getattr(y, 'shape', None)
    if shape is None or len(shape) != 2 or shape[1] != n_state:
        raise ValueError(
            '%s: state batch must be (B, %d) = [T, Y_1..Y_%d] for this '
            'mechanism (got %s); check that the states were drawn for '
            'the SAME mechanism file the kernel was packed from'
            % (cls, n_state, n_state - 1, (shape,)))


def supports(packed) -> bool:
    """Whether this kernel covers the mechanism's reaction categories.

    PLOG / Chebyshev / negative-A / fractional stoichiometry are all
    handled; only sign-flipping PLOG tables (negative A inside a PLOG
    ladder) are not.
    """
    if packed.has_plog and bool((packed.plog_sign < 0).any()):
        return False
    # the one-hot gather/scatter constants scale as R*N; beyond ~50 MB
    # of VMEM constants the kernel cannot stage them (n-heptane-class
    # mechanisms need the blocked assembly on the roadmap)
    R, N = packed.n_reactions, packed.n_species
    Sf = packed.reac_sp.shape[1]
    Sp = packed.prod_sp.shape[1]
    const_bytes = 4 * R * (N * (Sf + Sp + 3) + (N - 1) * (Sf + Sp + 2))
    return const_bytes < 50 * 1024 * 1024


def _consts(packed, dtype=np.float32):
    """Static constant tensors in kernel layout (numpy, built once)."""
    N = packed.n_species
    R = packed.n_reactions
    Sf = packed.reac_sp.shape[1]
    Sp = packed.prod_sp.shape[1]
    J = N - 1
    f = lambda x: np.asarray(x, dtype=dtype)

    # per-slot gather one-hots: (R, N) so C_slot_s = G_s @ C
    def gather_mats(sp_idx, S):
        out = []
        for si in range(S):
            G = np.zeros((R, N), dtype=dtype)
            G[np.arange(R), sp_idx[:, si]] = 1.0
            out.append(G)
        return out

    # per-slot scatter weights for the P1 assembly:
    # W_s[r, j] = onehot(sp[r, s] == j) * inv_mw[j] (reduced columns),
    # last_s[r] = 1 when the slot hits the eliminated species
    def scatter_w(sp_idx, S):
        # pure 0/1 masks (bf16-exact); the inv_mw[j] factor is applied
        # as a per-column SMEM scalar in the kernel loop
        W = np.zeros((S, R, J), dtype=dtype)
        last = np.zeros((S, R), dtype=dtype)
        for si in range(S):
            for r in range(R):
                j = sp_idx[r, si]
                if j < J:
                    W[si, r, j] = 1.0
                else:
                    last[si, r] = 1.0
        return W, last

    Wf, lastf = scatter_w(packed.reac_sp, Sf)
    Wp, lastp = scatter_w(packed.prod_sp, Sp)

    alpha_tilde = (packed.eff_m1[:, :-1] * packed.inv_mw[None, :-1] -
                   (packed.eff_m1[:, -1] * packed.inv_mw[-1])[:, None])
    pd = np.asarray(packed.pdep_sp_idx)
    pd_tilde = np.zeros((R, J))
    for r in np.where(pd >= 0)[0]:
        if pd[r] < J:
            pd_tilde[r, pd[r]] += packed.inv_mw[pd[r]]
        else:
            pd_tilde[r, :] -= packed.inv_mw[-1]
    pd_onehot = np.zeros((R, N))
    rows = np.where(pd >= 0)[0]
    pd_onehot[rows, np.maximum(pd[rows], 0)] = 1.0

    troe = packed.troe_mask
    sri = packed.sri_mask

    # PLOG / Chebyshev gathered-row constants
    extra = {}
    if packed.has_plog:
        Rp, Pmax = packed.plog_lnP.shape
        scat = np.zeros((R, Rp), dtype=dtype)
        scat[packed.plog_idx, np.arange(Rp)] = 1.0
        plog_mask = np.zeros((R, 1), dtype=dtype)
        plog_mask[packed.plog_idx] = 1.0
        extra['plog_scat'] = scat
        extra['plog_mask'] = plog_mask
        extra['plog_n'] = f(packed.plog_n)[:, None]
        for k in range(Pmax):
            extra['plog_lnP%d' % k] = f(packed.plog_lnP[:, k])[:, None]
            extra['plog_logA%d' % k] = f(packed.plog_logA[:, k])[:, None]
            extra['plog_beta%d' % k] = f(packed.plog_beta[:, k])[:, None]
            extra['plog_Ta%d' % k] = f(packed.plog_Ta[:, k])[:, None]
    if packed.has_cheb:
        Rc = packed.cheb_coef.shape[0]
        scat = np.zeros((R, Rc), dtype=dtype)
        scat[packed.cheb_idx, np.arange(Rc)] = 1.0
        cheb_mask = np.zeros((R, 1), dtype=dtype)
        cheb_mask[packed.cheb_idx] = 1.0
        extra['cheb_scat'] = scat
        extra['cheb_mask'] = cheb_mask
        extra['cheb_tsum'] = f(packed.cheb_tlim[:, 0])[:, None]
        extra['cheb_tsub'] = f(packed.cheb_tlim[:, 1])[:, None]
        extra['cheb_psum'] = f(packed.cheb_plim[:, 0])[:, None]
        extra['cheb_psub'] = f(packed.cheb_plim[:, 1])[:, None]
        NT, NP = packed.cheb_coef.shape[1:]
        for i in range(NT):
            for j in range(NP):
                extra['cheb_a%d_%d' % (i, j)] = \
                    f(packed.cheb_coef[:, i, j])[:, None]

    c = {
        'inv_mw_row': f(packed.inv_mw)[None, :],           # (1, N)
        'mw_col': f(packed.mw)[:, None],                   # (N, 1)
        'T_mid': f(packed.T_mid)[:, None],                 # (N, 1)
        'a_lo': f(packed.a_lo),                            # (N, 7)
        'a_hi': f(packed.a_hi),                            # (N, 7)
        'nu_net_T': f(packed.nu_net.T),                    # (N, R)
        'sum_nu': f(packed.sum_nu)[:, None],               # (R, 1)
        'logA': f(packed.logA)[:, None],
        'beta': f(packed.beta)[:, None],
        'Ta': f(packed.Ta)[:, None],
        'rev_mask': f(packed.rev_mask)[:, None],
        **{'G_f%d' % i: g for i, g in
           enumerate(gather_mats(packed.reac_sp, Sf))},    # (R, N) each
        **{'G_p%d' % i: g for i, g in
           enumerate(gather_mats(packed.prod_sp, Sp))},
        **{'nu_f%d' % i: f(packed.reac_nu[:, i])[:, None]
           for i in range(Sf)},                            # (R, 1) each
        **{'nu_p%d' % i: f(packed.prod_nu[:, i])[:, None]
           for i in range(Sp)},
        **{'W_f%d' % i: f(Wf[i]) for i in range(Sf)},      # (R, J) each
        **{'W_p%d' % i: f(Wp[i]) for i in range(Sp)},
        **{'last_f%d' % i: f(lastf[i])[:, None] for i in range(Sf)},
        **{'last_p%d' % i: f(lastp[i])[:, None] for i in range(Sp)},
        'ordf': f(packed.reac_nu.sum(1))[:, None],         # (R, 1)
        'ordr': f(packed.prod_nu.sum(1))[:, None],
        'u_vec': f(packed.inv_mw[:-1] - packed.inv_mw[-1])[None, :],
        'winv': f(packed.inv_mw[:-1])[None, :],            # (1, J) SMEM
        'eff_m1': f(packed.eff_m1),                        # (R, N)
        'alpha_tilde': f(alpha_tilde),                     # (R, J)
        'pd_tilde': f(pd_tilde),
        'pd_onehot': f(pd_onehot),                         # (R, N)
        'spec_mask': f(pd >= 0)[:, None],
        'thd_mask': f(packed.thd_only_mask)[:, None],
        'fall_mask': f(packed.falloff_mask)[:, None],
        'chem_mask': f(packed.chemact_mask)[:, None],
        'pdep_mask': f(packed.falloff_mask |
                       packed.chemact_mask)[:, None],
        'low_logA': f(packed.low_logA)[:, None],
        'low_beta': f(packed.low_beta)[:, None],
        'low_Ta': f(packed.low_Ta)[:, None],
        'high_logA': f(packed.high_logA)[:, None],
        'high_beta': f(packed.high_beta)[:, None],
        'high_Ta': f(packed.high_Ta)[:, None],
        'troe_mask': f(troe)[:, None],
        'troe_a': f(packed.troe_par[:, 0])[:, None],
        'troe_T3': f(np.where(troe, packed.troe_par[:, 1], 1.0))[:, None],
        'troe_T1': f(np.where(troe, packed.troe_par[:, 2], 1.0))[:, None],
        'troe_T2': f(packed.troe_par[:, 3])[:, None],
        'troe_has2': f(packed.troe_has_T2)[:, None],
        'sri_mask': f(sri)[:, None],
        'sri_a': f(packed.sri_par[:, 0])[:, None],
        'sri_b': f(packed.sri_par[:, 1])[:, None],
        'sri_c': f(np.where(sri, packed.sri_par[:, 2], 1.0))[:, None],
        'sri_d': f(packed.sri_par[:, 3])[:, None],
        'sri_e': f(packed.sri_par[:, 4])[:, None],
        'A_sign': f(packed.A_sign)[:, None],
        **extra,
    }
    frac_f = [bool((packed.reac_nu[:, i] !=
                    np.round(packed.reac_nu[:, i])).any())
              for i in range(Sf)]
    frac_p = [bool((packed.prod_nu[:, i] !=
                    np.round(packed.prod_nu[:, i])).any())
              for i in range(Sp)]
    meta = {'N': N, 'R': R, 'Sf': Sf, 'Sp': Sp, 'J': J,
            'conp': True,
            'frac_f': frac_f, 'frac_p': frac_p,
            'max_nu': packed.max_nu_int,
            'has_rev': packed.has_rev,
            'has_pres_mod': packed.has_pres_mod,
            'has_troe': packed.has_troe,
            'has_sri': packed.has_sri,
            'has_chemact': packed.has_chemact,
            'has_spec_pdep': packed.has_specific_pdep_sp,
            'has_troe2': bool(packed.troe_has_T2.any()),
            'has_neg_A': packed.has_negative_A,
            'has_frac_nu': packed.has_frac_nu,
            'has_plog': packed.has_plog,
            'has_cheb': packed.has_cheb,
            'plog_P': packed.plog_lnP.shape[1] if packed.has_plog else 0,
            'cheb_NT': packed.cheb_coef.shape[1] if packed.has_cheb else 0,
            'cheb_NP': packed.cheb_coef.shape[2] if packed.has_cheb else 0}
    return c, meta


_CONST_ORDER = None  # filled at first build for stable arg ordering


def _kernel(meta, names, *refs):
    nc = len(names)
    cref = {nm: refs[i] for i, nm in enumerate(names)}
    y_ref, P_ref = refs[nc], refs[nc + 1]
    J_ref, f_ref, cp_scr = refs[nc + 2], refs[nc + 3], refs[nc + 4]
    C_ = {nm: cref[nm][...] for nm in names
          if nm not in ('u_vec', 'winv')}
    parts = _compute(meta, C_, y_ref[...], P_ref[...])
    (col0, f_out, vals_f, vals_p, psi_q, xi_q, v_u, v_1, mwJ, rho_inv,
     fk, eW, denomT, sh, cp, mw_avg, invT, fT) = parts
    f_ref[...] = f_out
    N, J, Sf, Sp = meta['N'], meta['J'], meta['Sf'], meta['Sp']
    # output layout: J_ref[(col, row, b)]; column 0 is the T column
    J_ref[0] = col0
    cp_scr[...] = cp
    nuT = C_['nu_net_T']

    cp_N = cp[J:N, :]                                   # (1, B) static

    def body(j, _):
        # dynamic lane slicing is unsupported by Mosaic on this stack;
        # fetch column j of each (R, J) weight matrix as W @ e_j with a
        # one-hot built from iota (cheap (R, J) @ (J, 1) matvec)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (J, 1), 0)
        e_j = (col_ids == j).astype(jnp.float32)         # (J, 1)

        w_j = cref['winv'][0, j]                         # SMEM scalar

        P1_col = vals_f[0] * _dot_ex(cref['W_f0'][...], e_j)
        for s in range(1, Sf):
            P1_col = P1_col + vals_f[s] * _dot_ex(
                cref['W_f%d' % s][...], e_j)
        for s in range(Sp):
            P1_col = P1_col - vals_p[s] * _dot_ex(
                cref['W_p%d' % s][...], e_j)
        P1_col = P1_col * w_j
        if meta['has_pres_mod']:
            P1_col = P1_col + psi_q * _dot(cref['alpha_tilde'][...], e_j)
            if meta['has_spec_pdep']:
                P1_col = P1_col + xi_q * _dot(cref['pd_tilde'][...], e_j)
        u_j = cref['u_vec'][0, j]                        # SMEM scalar
        dcol = _dot_x(nuT, P1_col)
        dcol = dcol + v_u * u_j + v_1
        r_j = (-mw_avg * u_j) if meta['conp'] else \
            jnp.zeros_like(mw_avg)
        cp_j = cp_scr[pl.ds(j, 1), :]                    # (1, B)
        JYY_col = mwJ * rho_inv * dcol[0:J] - fk[0:J] * r_j
        JTY_col = (-jnp.sum(eW * dcol, axis=0, keepdims=True) / denomT -
                   fT * (r_j + (cp_j - cp_N) / sh))
        J_ref[pl.ds(j + 1, 1)] = jnp.concatenate(
            [JTY_col, JYY_col], axis=0)[None]
        return _

    # int32 bounds: under jax_enable_x64 a python-int loop index turns
    # int64, which Mosaic's conversion helper cannot lower (it recurses)
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(J), body, jnp.int32(0))


def _compute(meta, C_, y_tile, P_tile):
    """Pure math on a (N, B) state tile; shared by the Pallas kernel and
    the interpret/debug path."""
    N, R, Sf, Sp, J = (meta['N'], meta['R'], meta['Sf'], meta['Sp'],
                       meta['J'])

    conp = meta['conp']
    T = y_tile[0:1, :]                               # (1, B)
    Yr = y_tile[1:, :]                               # (J, B)
    logT = jnp.log(T)
    invT = 1.0 / T

    y_N = 1.0 - jnp.sum(Yr, axis=0, keepdims=True)   # (1, B)
    Y_full = jnp.concatenate([Yr, y_N], axis=0)      # (N, B)
    inv_wbar = _dot(C_['inv_mw_row'], Y_full)   # (1, B)
    mw_avg = 1.0 / inv_wbar
    if conp:
        P = P_tile[0:1, :]
        rho = P * mw_avg / (RU * T)
    else:
        rho = P_tile[0:1, :]                         # density given
        P = rho * RU * T * inv_wbar
    conc = rho * Y_full * C_['inv_mw_row'].T          # (N, B)

    # --- thermo (two-range NASA select), all (N, B) -----------------------
    sel = (T <= C_['T_mid'])                          # (N, B) via bcast
    def dual(idx_fn):
        lo = idx_fn(C_['a_lo'])
        hi = idx_fn(C_['a_hi'])
        return jnp.where(sel, lo, hi)

    def poly_cp(a):
        return (a[:, 0:1] + T * (a[:, 1:2] + T * (a[:, 2:3] + T * (
            a[:, 3:4] + a[:, 4:5] * T))))

    def poly_h(a):
        return a[:, 5:6] + T * (a[:, 0:1] + T * (a[:, 1:2] / 2 + T * (
            a[:, 2:3] / 3 + T * (a[:, 3:4] / 4 + a[:, 4:5] / 5 * T))))

    def poly_smh(a):
        return (a[:, 0:1] * (logT - 1.0) + T * (a[:, 1:2] / 2 + T * (
            a[:, 2:3] / 6 + T * (a[:, 3:4] / 12 + a[:, 4:5] / 20 * T)))
            - a[:, 5:6] * invT + a[:, 6:7])

    def poly_dsmh(a):
        return (a[:, 0:1] * invT + a[:, 1:2] / 2 + T * (a[:, 2:3] / 3 +
                T * (a[:, 3:4] / 4 + a[:, 4:5] / 5 * T)) +
                a[:, 5:6] * invT * invT)

    def poly_dcp(a):
        return (a[:, 1:2] + T * (2 * a[:, 2:3] + T * (3 * a[:, 3:4] +
                4 * a[:, 4:5] * T)))

    RUinv_mw = RU * C_['inv_mw_row'].T               # (N, 1)
    cp = RUinv_mw * dual(poly_cp)
    h = RUinv_mw * dual(poly_h)
    if not conp:
        cp = cp - RUinv_mw                           # cv = cp - R/W
        h = h - RUinv_mw * T                         # u = h - (R/W) T
    dcp = RUinv_mw * dual(poly_dcp)
    smh = dual(poly_smh)
    dsmh = dual(poly_dsmh)

    # --- forward/reverse rate constants, (R, B) ---------------------------
    kf = jnp.exp(C_['logA'] + C_['beta'] * logT - C_['Ta'] * invT)
    if meta['has_neg_A']:
        kf = kf * C_['A_sign']
    dlnkf_dT = (C_['beta'] + C_['Ta'] * invT) * invT
    aP = jnp.zeros_like(kf)          # dln kf / dln P (PLOG/Chebyshev)

    if meta['has_plog']:
        lnP = jnp.log(P)                               # (1, B)
        Pm = meta['plog_P']
        lnks, dlnks = [], []
        for k in range(Pm):
            lnks.append(C_['plog_logA%d' % k] +
                        C_['plog_beta%d' % k] * logT -
                        C_['plog_Ta%d' % k] * invT)
            dlnks.append((C_['plog_beta%d' % k] +
                          C_['plog_Ta%d' % k] * invT) * invT)
        cnt = jnp.zeros_like(lnks[0])
        for k in range(Pm):
            cnt = cnt + (lnP > C_['plog_lnP%d' % k]).astype(jnp.float32)
        n_r = C_['plog_n']
        idx_lo = jnp.clip(cnt - 1.0, _F0, jnp.maximum(n_r - 2.0, _F0))
        idx_hi = jnp.minimum(idx_lo + 1.0, n_r - 1.0)

        def sel(fields, idx):
            out = jnp.zeros_like(fields[0])
            for k in range(Pm):
                out = out + jnp.where(idx == np.float32(k), fields[k], _F0)
            return out

        lnPs = [jnp.broadcast_to(C_['plog_lnP%d' % k], lnks[0].shape)
                for k in range(Pm)]
        lo, hi = sel(lnks, idx_lo), sel(lnks, idx_hi)
        dlo, dhi = sel(dlnks, idx_lo), sel(dlnks, idx_hi)
        P_lo, P_hi = sel(lnPs, idx_lo), sel(lnPs, idx_hi)
        den = P_hi - P_lo
        safe = jnp.where(den == 0.0, _F1, den)
        w_raw = (lnP - P_lo) / safe
        w = jnp.clip(w_raw, _F0, _F1)
        interior = ((w_raw > 0.0) & (w_raw < 1.0) &
                    (den != 0.0)).astype(jnp.float32)
        kf_p = jnp.exp(lo + (hi - lo) * w)
        dlnkf_p = dlo + (dhi - dlo) * w
        aP_p = interior * (hi - lo) / safe
        notp = 1.0 - C_['plog_mask']
        kf = kf * notp + _dot_x(C_['plog_scat'], kf_p)
        dlnkf_dT = dlnkf_dT * notp + _dot(
            C_['plog_scat'], dlnkf_p)
        aP = aP + _dot_x(C_['plog_scat'], aP_p)

    if meta['has_cheb']:
        NT, NP = meta['cheb_NT'], meta['cheb_NP']
        Tred = ((2.0 * invT) - C_['cheb_tsum']) / C_['cheb_tsub']
        lgP = jnp.log(jnp.maximum(P, _TINY32)) / _LOG10
        Pred = (2.0 * lgP - C_['cheb_psum']) / C_['cheb_psub']

        def chebs(x, n):
            ps = [jnp.ones_like(x)]
            ds = [jnp.zeros_like(x)]
            if n > 1:
                ps.append(x)
                ds.append(jnp.ones_like(x))
            for _ in range(2, n):
                ds.append(2.0 * ps[-1] + 2.0 * x * ds[-1] - ds[-2])
                ps.append(2.0 * x * ps[-1] - ps[-2])
            return ps, ds

        Tp, dTp = chebs(Tred, NT)
        Pp, dPp = chebs(Pred, NP)
        lgk = jnp.zeros_like(Tred)
        dlgk_dTred = jnp.zeros_like(Tred)
        dlgk_dPred = jnp.zeros_like(Tred)
        for i in range(NT):
            for j in range(NP):
                a = C_['cheb_a%d_%d' % (i, j)]
                lgk = lgk + a * Tp[i] * Pp[j]
                dlgk_dTred = dlgk_dTred + a * dTp[i] * Pp[j]
                dlgk_dPred = dlgk_dPred + a * Tp[i] * dPp[j]
        kf_c = jnp.exp(_LOG10 * lgk)
        dTred_dT = (-2.0 * invT * invT) / C_['cheb_tsub']
        dlnkf_c = _LOG10 * dlgk_dTred * dTred_dT
        aP_c = _LOG10 * dlgk_dPred * (2.0 / (_LOG10 * C_['cheb_psub']))
        notc = 1.0 - C_['cheb_mask']
        kf = kf * notc + _dot_x(C_['cheb_scat'], kf_c)
        dlnkf_dT = dlnkf_dT * notc + _dot(
            C_['cheb_scat'], dlnkf_c)
        aP = aP + _dot_x(C_['cheb_scat'], aP_c)
    if meta['has_rev']:
        lnKc = (_dot_x(C_['nu_net_T'].T, smh) +
                C_['sum_nu'] * (_LN_PA_RU - logT))
        kr = C_['rev_mask'] * kf * jnp.exp(-lnKc)
        dlnKc_dT = (_dot_x(C_['nu_net_T'].T, dsmh) -
                    C_['sum_nu'] * invT)
        dlnkr_dT = dlnkf_dT - dlnKc_dT
    else:
        kr = jnp.zeros_like(kf)
        dlnkr_dT = jnp.zeros_like(kf)

    # --- slot products and derivatives (all per-slot 2-D (R, B)) ----------
    def slot_products(prefix, S):
        cgs, pows = [], []
        for si in range(S):
            cg = _dot_x(C_['G_%s%d' % (prefix, si)], conc)
            nu_s = C_['nu_%s%d' % (prefix, si)]
            if meta['frac_%s' % prefix][si]:
                lc = jnp.log(jnp.maximum(cg, _TINY32))
                powv = jnp.where(nu_s == 0.0, _F1, jnp.exp(nu_s * lc))
            else:
                powv = jnp.where(nu_s == 0.0, _F1, cg)
                acc = cg
                for k in range(2, meta['max_nu'] + 1):
                    acc = acc * cg
                    powv = jnp.where(nu_s >= float(k), acc, powv)
            cgs.append(cg)
            pows.append(powv)
        total = pows[0]
        for si in range(1, S):
            total = total * pows[si]
        dvals = []
        for si in range(S):
            cg = cgs[si]
            nu_s = C_['nu_%s%d' % (prefix, si)]
            if meta['frac_%s' % prefix][si]:
                lc = jnp.log(jnp.maximum(cg, _TINY32))
                dpow = jnp.where(nu_s == 0.0, _F0,
                                 jnp.exp((nu_s - 1.0) * lc))
            else:
                dpow = jnp.where(nu_s == 0.0, _F1, cg)
                dacc = cg
                for k in range(2, meta['max_nu']):
                    dacc = dacc * cg
                    dpow = jnp.where(nu_s - 1.0 >= float(k), dacc, dpow)
                dpow = jnp.where(nu_s <= 1.0,
                                 jnp.where(nu_s == 0.0, _F0, _F1), dpow)
            excl = None
            for s2 in range(S):
                if s2 == si:
                    continue
                excl = pows[s2] if excl is None else excl * pows[s2]
            if excl is None:
                excl = jnp.ones_like(total)
            dvals.append(nu_s * dpow * excl)
        return total, dvals

    Pif, dPif = slot_products('f', Sf)
    Pir, dPir = slot_products('p', Sp)
    Rf = kf * Pif
    Rr = kr * Pir
    qnet = Rf - Rr

    # --- pressure modification, (R, B) --------------------------------------
    pm = jnp.ones_like(kf)
    dpm_dT = jnp.zeros_like(kf)
    c_u_pm = jnp.zeros_like(kf)
    psi = jnp.zeros_like(kf)
    xi = jnp.zeros_like(kf)
    if meta['has_pres_mod']:
        m_tb = P / (RU * T)                           # (1, B)
        thd = m_tb + _dot(C_['eff_m1'], conc)
        tm = C_['thd_mask']
        pm = pm + tm * (thd - 1.0)
        if conp:
            dpm_dT = dpm_dT + tm * (-thd * invT)
            c_u_pm = c_u_pm + tm * (-mw_avg * (thd - m_tb))
        else:
            c_u_pm = c_u_pm + tm * rho               # d m_tb/dY_j = rho u_j
        psi = psi + tm * rho

        fall = C_['fall_mask']
        chem = C_['chem_mask']
        pdep = C_['pdep_mask']
        k0 = jnp.where(fall > 0.5,
                       jnp.exp(C_['low_logA'] + C_['low_beta'] * logT -
                               C_['low_Ta'] * invT), kf)
        dlnk0 = jnp.where(fall > 0.5,
                          (C_['low_beta'] + C_['low_Ta'] * invT) * invT,
                          dlnkf_dT)
        if meta['has_chemact']:
            kinf = jnp.where(chem > 0.5,
                             jnp.exp(C_['high_logA'] +
                                     C_['high_beta'] * logT -
                                     C_['high_Ta'] * invT), kf)
            dlnkinf = jnp.where(chem > 0.5,
                                (C_['high_beta'] +
                                 C_['high_Ta'] * invT) * invT, dlnkf_dT)
        else:
            kinf = kf
            dlnkinf = dlnkf_dT
        if meta['has_spec_pdep']:
            c_pd = _dot_x(C_['pd_onehot'], conc)
            sm = C_['spec_mask']
            X = jnp.where(sm > 0.5, c_pd, thd)
        else:
            sm = jnp.zeros_like(fall)
            X = jnp.broadcast_to(thd, kf.shape)
        ratio = k0 / kinf
        Pr = ratio * X
        L = jnp.log(jnp.maximum(Pr, _TINY32)) / _LOG10
        dL_dPr = jnp.where(Pr > _TINY32,
                           _F1 / (_LOG10 * jnp.maximum(Pr, _TINY32)),
                           _F0)
        F = jnp.ones_like(Pr)
        dF_dT = jnp.zeros_like(Pr)
        dF_dL = jnp.zeros_like(Pr)
        if meta['has_troe']:
            e3 = jnp.exp(-T / C_['troe_T3'])
            e1 = jnp.exp(-T / C_['troe_T1'])
            Fc = (1.0 - C_['troe_a']) * e3 + C_['troe_a'] * e1
            dFc = (-(1.0 - C_['troe_a']) / C_['troe_T3'] * e3 -
                   C_['troe_a'] / C_['troe_T1'] * e1)
            if meta['has_troe2']:
                e2 = jnp.exp(-C_['troe_T2'] * invT)
                Fc = Fc + C_['troe_has2'] * e2
                dFc = dFc + C_['troe_has2'] * C_['troe_T2'] * invT * \
                    invT * e2
            cc = jnp.log(jnp.maximum(Fc, _TINY32)) / _LOG10
            dcc = jnp.where(Fc > _TINY32,
                            dFc / (_LOG10 * jnp.maximum(Fc, _TINY32)),
                            _F0)
            A_ = L - 0.67 * cc - 0.4
            B_ = 0.806 - 1.1762 * cc - 0.14 * L
            AB = A_ / B_
            g = 1.0 / (1.0 + AB * AB)
            Ft = jnp.exp(_LOG10 * cc * g)
            dg_dc = -g * g * 2.0 * AB * ((-0.67) * B_ + 1.1762 * A_) / \
                (B_ * B_)
            dg_dL = -g * g * 2.0 * AB * (B_ + 0.14 * A_) / (B_ * B_)
            tmask = C_['troe_mask']
            F = jnp.where(tmask > 0.5, Ft, F)
            dF_dT = jnp.where(tmask > 0.5,
                              Ft * _LOG10 * (g + cc * dg_dc) * dcc,
                              dF_dT)
            dF_dL = jnp.where(tmask > 0.5, Ft * _LOG10 * cc * dg_dL,
                              dF_dL)
        if meta['has_sri']:
            eb = jnp.exp(-C_['sri_b'] * invT)
            ec = jnp.exp(-T / C_['sri_c'])
            base = jnp.maximum(C_['sri_a'] * eb + ec, _TINY32)
            Xs = 1.0 / (1.0 + L * L)
            Fs = jnp.exp(Xs * jnp.log(base)) * C_['sri_d'] * \
                jnp.exp(C_['sri_e'] * logT)
            dbase = C_['sri_a'] * C_['sri_b'] * invT * invT * eb - \
                ec / C_['sri_c']
            smask = C_['sri_mask']
            F = jnp.where(smask > 0.5, Fs, F)
            dF_dT = jnp.where(smask > 0.5,
                              Fs * (Xs * dbase / base + C_['sri_e'] *
                                    invT), dF_dT)
            dF_dL = jnp.where(smask > 0.5,
                              Fs * jnp.log(base) *
                              (-2.0 * L * Xs * Xs), dF_dL)

        G_ = jnp.where(fall > 0.5, Pr / (1.0 + Pr), _F1 / (1.0 + Pr))
        dG_dPr = jnp.where(fall > 0.5, _F1, _FM1) / ((1.0 + Pr) *
                                                     (1.0 + Pr))
        Phi = F * dG_dPr + G_ * dF_dL * dL_dPr
        if conp:
            dPr_dT = Pr * (dlnk0 - dlnkinf - invT)   # dlnX/dT = -1/T
        else:
            dPr_dT = Pr * (dlnk0 - dlnkinf)          # X independent of T
        pm_p = F * G_
        pm = jnp.where(pdep > 0.5, pm_p, pm)
        dpm_dT = jnp.where(pdep > 0.5, G_ * dF_dT + Phi * dPr_dT,
                           dpm_dT)
        if conp:
            cu_mix = -mw_avg * (thd - m_tb)
        else:
            cu_mix = jnp.broadcast_to(rho, thd.shape)
        if meta['has_spec_pdep']:
            cu_spec = -mw_avg * X if conp else jnp.zeros_like(X)
            cu_X = jnp.where(sm > 0.5, cu_spec, cu_mix)
        else:
            cu_X = jnp.broadcast_to(cu_mix, kf.shape)
        c_u_pm = jnp.where(pdep > 0.5, Phi * ratio * cu_X, c_u_pm)
        psi = jnp.where(pdep > 0.5,
                        jnp.where(sm > 0.5, _F0, Phi * ratio * rho),
                        psi)
        if meta['has_spec_pdep']:
            xi = jnp.where((pdep > 0.5) & (sm > 0.5), Phi * ratio * rho,
                           xi)

    # --- dq/dT, (R, B) -------------------------------------------------------
    dq_dT = pm * (Rf * dlnkf_dT - Rr * dlnkr_dT) + dpm_dT * qnet
    if conp:
        dq_dT = dq_dT + pm * (-invT) * (C_['ordf'] * Rf -
                                        C_['ordr'] * Rr)
    elif meta['has_plog'] or meta['has_cheb']:
        dq_dT = dq_dT + pm * qnet * aP * invT        # dln P/dT = 1/T

    # --- assembly, one reduced-species column at a time --------------------
    # Everything stays 2-D (R, B)/(N, B): Mosaic-friendly, and each
    # column contraction is one small (N, R) @ (R, B) MXU GEMM.
    B_T = T.shape[-1]
    pmrho = pm * rho                                   # (R, B)
    vals_f = [pmrho * kf * dPif[s] for s in range(Sf)]   # (R, B) each
    vals_p = [pmrho * kr * dPir[s] for s in range(Sp)]

    c_1 = jnp.zeros_like(kf)
    w_last = C_['inv_mw_row'][0, N - 1]
    for s in range(Sf):
        c_1 = c_1 - vals_f[s] * C_['last_f%d' % s] * w_last
    for s in range(Sp):
        c_1 = c_1 + vals_p[s] * C_['last_p%d' % s] * w_last

    # rank-one coefficient on u_vec
    c_u = c_u_pm * qnet
    if conp:
        c_u = c_u + pm * (C_['ordf'] * Rf -
                          C_['ordr'] * Rr) * (-mw_avg)
    elif meta['has_plog'] or meta['has_cheb']:
        c_u = c_u + pm * qnet * aP * mw_avg          # dln P/dY_j = W u_j

    # --- stoichiometric contractions ------------------------------------------
    q = pm * qnet
    omega = _dot_x(C_['nu_net_T'], q)          # (N, B)
    domega_dT = _dot_x(C_['nu_net_T'], dq_dT)
    v_u = _dot_x(C_['nu_net_T'], c_u)
    v_1 = _dot_x(C_['nu_net_T'], c_1)

    # --- thermodynamic closure -------------------------------------------------
    rho_inv = 1.0 / rho
    fk = omega * C_['mw_col'] * rho_inv                 # (N, B)
    sh = jnp.sum(cp * Y_full, axis=0, keepdims=True)    # (1, B)
    dsh_dT = jnp.sum(dcp * Y_full, axis=0, keepdims=True)
    eW = h * C_['mw_col']                               # (N, B)
    denomT = rho * sh
    fT = -jnp.sum(eW * omega, axis=0, keepdims=True) / denomT
    mwJ = C_['mw_col'][0:J]
    psi_q = psi * qnet
    xi_q = xi * qnet

    # temperature column (column 0)
    dlnrho_dT = -invT if conp else jnp.zeros_like(invT)
    JYT = mwJ * rho_inv * domega_dT[0:J] - fk[0:J] * dlnrho_dT
    JTT = (-(jnp.sum(cp * C_['mw_col'] * omega, axis=0, keepdims=True) +
             jnp.sum(eW * domega_dT, axis=0, keepdims=True)) / denomT -
           fT * (dlnrho_dT + dsh_dT / sh))
    col0 = jnp.concatenate([JTT, JYT], axis=0)          # (N, B)
    f_out = jnp.concatenate([fT, fk[0:J]], axis=0)

    return (col0, f_out, vals_f, vals_p, psi_q, xi_q, v_u, v_1, mwJ,
            rho_inv, fk, eW, denomT, sh, cp, mw_avg, invT, fT)


class PallasJacobian:
    """Callable wrapper: builds the kernel once per mechanism.

    ``__call__(y, P)`` takes the standard batch-major (B, N) states and
    returns (J, f) batch-major; ``call_tr`` takes/returns the native
    batch-minor layout: states (N, B) -> (J_cols (N, N, B) in
    (column, row, batch) order, dydt (N, B)) with no transposes, for
    benchmarking the pure kernel.
    """

    def __init__(self, packed, block_b: int = 0,
                 interpret: bool = False, conp: bool = True):
        if not supports(packed):
            raise NotImplementedError(
                'sign-flipping PLOG tables: use the XLA path '
                '(ops.jacobian.eval_jacobian)')
        self.packed = packed
        if block_b <= 0:
            # largest state tile whose (R, block) working set fits the
            # ~100 MB scoped-VMEM budget (measured: R=326 fits 1024,
            # R=784 fits 256)
            import math as _math
            block_b = 2 ** int(_math.log2(
                max(128, min(1024, 350000.0 / packed.n_reactions))))
        self.block_b = block_b
        self.interpret = interpret
        self.consts, self.meta = _consts(packed)
        self.meta['conp'] = bool(conp)
        self.conp = bool(conp)
        self.names = list(self.consts.keys())
        N = self.meta['N']

        kern = functools.partial(_kernel, self.meta, self.names)
        n_const = len(self.names)

        def call_tr(y_tr, P_row):
            B = y_tr.shape[-1]
            grid = (B // block_b,)
            # index maps derive zeros from the grid index so their
            # dtype follows it (python-int zeros turn i64 under
            # jax_enable_x64, which Mosaic cannot legalize)
            const_specs = [
                pl.BlockSpec(self.consts[nm].shape,
                             (lambda nd: (lambda i: (i * 0,) * nd))(
                                 self.consts[nm].ndim),
                             memory_space=(pltpu.SMEM if nm in ('u_vec', 'winv')
                                           else pltpu.VMEM))
                for nm in self.names]
            in_specs = const_specs + [
                pl.BlockSpec((N, block_b), lambda i: (i * 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_b), lambda i: (i * 0, i),
                             memory_space=pltpu.VMEM),
            ]
            out_specs = [
                pl.BlockSpec((N, N, block_b), lambda i: (i * 0, i * 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N, block_b), lambda i: (i * 0, i),
                             memory_space=pltpu.VMEM),
            ]
            out_shape = [
                # layout: (column, row, batch); column 0 = temperature
                jax.ShapeDtypeStruct((N, N, B), jnp.float32),
                jax.ShapeDtypeStruct((N, B), jnp.float32),
            ]
            args = [jnp.asarray(self.consts[nm]) for nm in self.names]
            return pl.pallas_call(
                kern, grid=grid, in_specs=in_specs,
                out_specs=out_specs, out_shape=out_shape,
                scratch_shapes=[pltpu.VMEM((N, block_b), jnp.float32)],
                interpret=self.interpret,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(*args, y_tr, P_row)

        self.call_tr = jax.jit(call_tr)

    def __call__(self, y, P):
        check_state_width(y, self.packed.n_species, 'PallasJacobian')
        y = jnp.asarray(y, jnp.float32)
        P = jnp.asarray(P, jnp.float32)
        B = y.shape[0]
        pad = (-B) % self.block_b
        if pad:
            y = jnp.concatenate([y, jnp.repeat(y[-1:], pad, 0)], 0)
            P = jnp.concatenate([P, jnp.repeat(P[-1:], pad, 0)], 0)
        J_tr, f_tr = self.call_tr(y.T, P[None, :])
        # kernel layout is (column, row, batch) -> (batch, row, column)
        J = jnp.transpose(J_tr, (2, 1, 0))[:B]
        f = f_tr.T[:B]
        return J, f
