"""Generate the flagship benchmark state ensemble.

The reference benches on PaSR-sampled physics (reference:
pyjac/performance_tester/performance_tester.py:316-338 packs PaSR .npy
data into data.bin).  The flagship benchmark mechanism is synthetic
(real GRI-3.0 is unobtainable offline), and its random NASA-7 thermo
admits no meaningful time integration: mixed compositions sit ~1e21/s
off any kinetic manifold (measured dT/dt ~ -1.6e21 K/s), so a PaSR
run — whose chemistry substep integrates particles in time — diverges
for any horizon.  This generator reproduces the *structural properties*
PaSR sampling gives real mechanisms, using the framework's own
chemistry:

* **stream sparsity** — each state zeroes a random subset of species
  (PaSR particles are convex combinations of a few inlet/pilot
  streams; most species are exactly absent), exercising the kernels'
  exact-zero paths;
* **manifold proximity** — damped Newton steps toward quasi-steady
  state (solve J dy = f, the implicit-integrator inner iteration) damp
  the fast modes, leaving states where forward and reverse rates
  nearly cancel — the near-equilibrium cancellation structure that
  makes the thresholded parity metric hard, and the regime implicit
  integrators actually evaluate Jacobians in;
* **physical T/P bands** — T in [1500, 2500] K at 10 atm, clipped
  during relaxation.

Output: tests/data/flagship_states.npz with (y, P) in internal packed
order, f64; bench.py tiles these to its batch size (the reference
likewise loops its fixed PaSR dataset).

Run: python tools/make_bench_states.py [--n 4096] [--out PATH]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=4096)
    ap.add_argument('--seed', type=int, default=7)
    ap.add_argument('--newton', type=int, default=3)
    ap.add_argument('--out', default=os.path.join(
        os.path.dirname(__file__), '..', 'tests', 'data',
        'flagship_states.npz'))
    args = ap.parse_args(argv)

    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_packed
    from pyjac_tpu.integrate import gauss_solve
    from pyjac_tpu.ops.dydt import dydt
    from pyjac_tpu.ops.jacobian import eval_jacobian
    from pyjac_tpu.testers.synthetic import random_states

    mech, packed = _flagship_packed()
    N = packed.n_species
    rng = np.random.default_rng(args.seed)

    y, _, P = random_states(mech, args.n, seed=args.seed,
                            T_range=(1500.0, 2500.0))
    y = y.astype(np.float64)
    P = P.astype(np.float64)

    # stream sparsity: zero a random subset of the reduced species
    # (between 20% and 70% per state), keeping at least 5 present
    Y = y[:, 1:]
    for i in range(args.n):
        k = rng.integers(int(0.2 * (N - 1)), int(0.7 * (N - 1)))
        drop = rng.choice(N - 1, size=k, replace=False)
        Y[i, drop] = 0.0
    # renormalise so the eliminated species keeps a physical share
    ssum = Y.sum(axis=1, keepdims=True)
    Y *= np.where(ssum > 0.9, 0.9 / ssum, 1.0)
    y[:, 1:] = Y

    f0 = np.abs(np.asarray(dydt(packed, 0.0, jnp.asarray(P),
                                jnp.asarray(y)))).max()

    # damped Newton toward quasi-steady state: the implicit-integrator
    # inner iteration, batched (fast modes damp; positivity clipped)
    for it in range(args.newton):
        J = eval_jacobian(packed, 0.0, jnp.asarray(P), jnp.asarray(y))
        f = dydt(packed, 0.0, jnp.asarray(P), jnp.asarray(y))
        step = np.asarray(gauss_solve(J, f))
        # per-state damping: cap the temperature move at 150 K and the
        # mass-fraction move at 0.05
        alpha = np.minimum(
            1.0, np.minimum(
                150.0 / (np.abs(step[:, 0]) + 1e-300),
                0.05 / (np.abs(step[:, 1:]).max(axis=1) + 1e-300)))
        y = y - alpha[:, None] * step
        y[:, 0] = np.clip(y[:, 0], 1200.0, 2800.0)
        y[:, 1:] = np.clip(y[:, 1:], 0.0, 1.0)
        s = y[:, 1:].sum(axis=1, keepdims=True)
        y[:, 1:] *= np.where(s > 1.0, 1.0 / s, 1.0)
        fi = np.abs(np.asarray(dydt(packed, 0.0, jnp.asarray(P),
                                    jnp.asarray(y)))).max()
        print('newton %d: max|dydt| %.3e (start %.3e)' % (it, fi, f0))

    f = np.asarray(dydt(packed, 0.0, jnp.asarray(P), jnp.asarray(y)))
    J = np.asarray(eval_jacobian(packed, 0.0, jnp.asarray(P),
                                 jnp.asarray(y)))
    assert np.isfinite(f).all() and np.isfinite(J).all()
    nz = int((y[:, 1:] == 0.0).sum())
    print('states: %d, exact-zero mass fractions: %d (%.0f%%), '
          'T %.0f..%.0f K' % (args.n, nz,
                              100.0 * nz / (args.n * (N - 1)),
                              y[:, 0].min(), y[:, 0].max()))
    np.savez_compressed(args.out, y=y, P=P, seed=args.seed,
                        newton=args.newton)
    print('wrote %s (%.1f MB)' % (args.out,
                                  os.path.getsize(args.out) / 1e6))


if __name__ == '__main__':
    main()
