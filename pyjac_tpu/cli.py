"""Command-line interface.

Mirrors the reference's CLI surface (reference: pyjac/utils.py:306-435,
pyjac/__main__.py:7-26) mapped onto the TPU-native pipeline: instead of
emitting C/CUDA source into ``build_path``, it packs the mechanism into
constant tensors, writes the packed archive plus a JSON manifest (the
``mechanism.h`` analog: NSP/NN/FWD_RATES/REV_RATES/PRES_MOD_RATES,
species table, last-species pivot — mech_auxiliary.py:133-161), and can
self-validate the analytical Jacobian against forward-mode AD.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog='pyjac_tpu',
        description='pyjac_tpu: TPU-native analytical chemical Jacobians '
                    '(JAX/XLA), a ground-up rebuild of pyJac.')
    parser.add_argument('-l', '--lang', type=str, default='tpu',
                        choices=['tpu', 'jax'],
                        help='Target platform (kept for pyJac CLI parity; '
                             'both values mean the JAX/XLA pipeline).')
    parser.add_argument('-i', '--input', type=str, required=True,
                        help='Input mechanism filename '
                             '(.inp/.dat Chemkin; .cti/.yaml/.xml Cantera).')
    parser.add_argument('-t', '--thermo', type=str, default=None,
                        help='Thermodynamic database filename, or nothing '
                             'if contained in the mechanism file.')
    parser.add_argument('-ic', '--initial-conditions', type=str,
                        dest='initial_conditions', default='',
                        help='Comma-separated initial conditions: '
                             'T,P,Sp1=x1,... (T in K, P in atm, species '
                             'in moles).')
    parser.add_argument('-b', '--build_path', default='./out/',
                        help='Output folder for the packed mechanism '
                             'archive and manifest.')
    parser.add_argument('-ls', '--last_species', type=str, default=None,
                        help='Species eliminated by the 1-sum(Y) closure; '
                             'defaults to the first of N2, AR, HE present.')
    parser.add_argument('-sj', '--skip_jac', action='store_true',
                        default=False,
                        help='Skip the Jacobian self-validation step '
                             '(rates only).')
    parser.add_argument('--conv', action='store_true', default=False,
                        help='Validate in constant-volume (CONV) mode '
                             'instead of constant-pressure (CONP).')
    parser.add_argument('--validate', action='store_true', default=False,
                        help='Cross-check the closed-form Jacobian against '
                             'forward-mode AD on sampled states.')
    parser.add_argument('--states', type=int, default=16,
                        help='Number of random states for --validate.')
    # ---- accepted-for-parity no-ops (CUDA/cache-optimizer specific in
    # the reference, utils.py:357-411; meaningless under XLA/TPU) ------
    noop = parser.add_argument_group(
        'reference-compatibility (accepted, no effect on TPU)')
    noop.add_argument('-co', '--cache-optimizer', dest='cache_optimizer',
                      action='store_true', default=False,
                      help='no-op: operand locality is XLA\'s job once '
                           'constants are packed tensors')
    noop.add_argument('-nosmem', '--no-shared-memory', dest='no_shared',
                      action='store_true', default=False,
                      help='no-op: VMEM staging is automatic (Pallas/XLA)')
    noop.add_argument('-pshare', '--prefer-shared', dest='L1_preferred',
                      action='store_false', default=True,
                      help='no-op: no L1/shared split on TPU')
    noop.add_argument('-nb', '--num-blocks', type=int, default=8,
                      help='no-op: grid sizing is derived from the batch')
    noop.add_argument('-nt', '--num-threads', type=int, default=64,
                      help='no-op: see --num-blocks')
    noop.add_argument('-mt', '--multi-threaded', type=int, default=None,
                      help='no-op: single XLA compile replaces the '
                           'multiprocess codegen')
    noop.add_argument('-fopt', '--force-optimize', action='store_true',
                      default=False,
                      help='no-op: nothing to re-optimize')
    return parser


def main(argv=None) -> int:
    args = get_parser().parse_args(argv)

    from .core.mech import Mechanism
    from .core.pack import pack, save_packed

    if args.cache_optimizer or args.no_shared or not args.L1_preferred \
            or args.force_optimize:
        print('note: CUDA/cache-optimizer flags are accepted for pyJac '
              'CLI compatibility but have no effect on TPU',
              file=sys.stderr)

    mech = Mechanism.from_files(args.input, args.thermo,
                                last_spec=args.last_species)
    packed = pack(mech)

    os.makedirs(args.build_path, exist_ok=True)
    archive = os.path.join(args.build_path, 'mech_packed.npz')
    save_packed(packed, archive)

    manifest = {
        'source': args.input,
        'NSP': packed.n_species,
        'NN': packed.n_species + 1,
        'FWD_RATES': packed.n_reactions,
        'REV_RATES': packed.n_rev,
        'PRES_MOD_RATES': packed.n_pres_mod,
        'last_species': mech.specs[-1].name,
        'species': mech.species_names,
        'fwd_spec_mapping': list(mech.fwd_spec_mapping),
        'back_spec_mapping': list(mech.back_spec_mapping),
        'features': {
            'reversible': packed.has_rev,
            'third_body': packed.has_thd_only,
            'falloff': packed.has_falloff,
            'chemically_activated': packed.has_chemact,
            'troe': packed.has_troe,
            'sri': packed.has_sri,
            'plog': packed.has_plog,
            'chebyshev': packed.has_cheb,
        },
    }
    man_path = os.path.join(args.build_path, 'mechanism_info.json')
    with open(man_path, 'w') as fh:
        json.dump(manifest, fh, indent=2)

    print('packed %d species / %d reactions (last species: %s)' %
          (packed.n_species, packed.n_reactions, mech.specs[-1].name))
    print('wrote %s and %s' % (archive, man_path))

    if args.initial_conditions:
        import numpy as np

        from .utils import parse_initial_conditions, state_vector
        T, P, Y = parse_initial_conditions(packed, args.initial_conditions)
        y0 = state_vector(packed, np.asarray(T), Y)
        np.save(os.path.join(args.build_path, 'initial_state.npy'),
                np.concatenate([[P], y0]))
        print('initial state: T=%.2f K, P=%.1f Pa -> initial_state.npy'
              % (T, P))

    if args.validate and not args.skip_jac:
        import jax
        jax.config.update('jax_enable_x64', True)
        import jax.numpy as jnp
        import numpy as np

        from .ops.jacobian import eval_jacobian, jacobian_fwd
        from .ops.thermo import eval_conc
        from .testers.synthetic import random_states

        y, T, P = random_states(mech, args.states, seed=0)
        conp = not args.conv
        if conp:
            param = jnp.asarray(P)
        else:
            _, _, rho, _ = eval_conc(packed, jnp.asarray(T),
                                     jnp.asarray(P), jnp.asarray(y[:, 1:]))
            param = rho
        J = eval_jacobian(packed, 0.0, param, jnp.asarray(y), conp=conp)
        # on accelerators the AD oracle differentiates the log-space
        # dydt: TPU float64 is emulated as float32 pairs whose exponent
        # range tops out near 1e38, and jacfwd's linear-space
        # exponential tangents overflow it
        on_cpu = jax.default_backend() == 'cpu'
        J_ref = jacobian_fwd(packed, 0.0, param, jnp.asarray(y),
                             conp=conp, log_space=not on_cpu)
        Jn, Jr = np.asarray(J), np.asarray(J_ref)
        scale = float(np.abs(Jr).max()) + 1e-300
        err = float(np.abs(Jn - Jr).max()) / scale
        print('jacobian self-validation (%s, %d states): '
              'max scaled err %.3e' %
              ('CONP' if conp else 'CONV', args.states, err))
        if not (err <= 1e-8):        # NaN must fail, not slip through
            print('VALIDATION FAILED', file=sys.stderr)
            return 1
    return 0
