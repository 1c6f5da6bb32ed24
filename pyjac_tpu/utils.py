"""State-vector utilities: mass/mole conversion, initial conditions.

TPU-native equivalents of the reference's generated ``mass_mole`` source
(reference: pyjac/core/rate_subs.py:2493+ ``write_mass_mole``) and of the
``set_same_initial_conditions`` initializer
(reference: pyjac/core/mech_auxiliary.py:210-311).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .core.constants import PA, RU
from .core.pack import PackedMechanism


def mole_to_mass(packed: PackedMechanism, X: np.ndarray) -> np.ndarray:
    """Mole fractions (..., N) -> mass fractions (..., N)."""
    X = np.asarray(X)
    mw = np.asarray(packed.mw)
    num = X * mw
    return num / num.sum(axis=-1, keepdims=True)


def mass_to_mole(packed: PackedMechanism, Y: np.ndarray) -> np.ndarray:
    """Mass fractions (..., N) -> mole fractions (..., N)."""
    Y = np.asarray(Y)
    inv = np.asarray(packed.inv_mw)
    num = Y * inv
    return num / num.sum(axis=-1, keepdims=True)


def get_density(packed: PackedMechanism, T, P, Y) -> np.ndarray:
    """Mixture mass density [kg/m^3] from T [K], P [Pa], mass fractions
    (..., N) (the generated ``getDensity``)."""
    inv = np.asarray(packed.inv_mw)
    mw_avg = 1.0 / (np.asarray(Y) * inv).sum(axis=-1)
    return np.asarray(P) * mw_avg / (RU * np.asarray(T))


def parse_initial_conditions(packed: PackedMechanism,
                             spec: str) -> Tuple[float, float, np.ndarray]:
    """Parse 'T,P,Sp1=x1,Sp2=x2,...' into (T [K], P [Pa], Y mass fractions).

    T in Kelvin, P in atmospheres, species amounts in moles (normalized
    to mole fractions), matching the reference
    (mech_auxiliary.py:222-261; CLI help in utils.py:344-354).
    """
    parts = [p.strip() for p in spec.split(',') if p.strip()]
    if len(parts) < 3:
        raise ValueError(
            'initial conditions need at least T,P,Species=moles: %r' % spec)
    T = float(parts[0])
    P = float(parts[1]) * PA
    names = {nm.upper(): i for i, nm in enumerate(packed.species_names)}
    X = np.zeros(packed.n_species)
    for item in parts[2:]:
        if '=' not in item:
            raise ValueError('bad species entry %r (want NAME=moles)' % item)
        nm, val = item.split('=', 1)
        key = nm.strip().upper()
        if key not in names:
            raise ValueError('unknown species %r in initial conditions'
                             % nm.strip())
        X[names[key]] = float(val)
    total = X.sum()
    if total <= 0:
        raise ValueError('no positive species amounts in %r' % spec)
    X /= total
    Y = mole_to_mass(packed, X)
    return T, P, Y


def state_vector(packed: PackedMechanism, T, Y_full) -> np.ndarray:
    """Build y = [T, Y_1..Y_{N-1}] from temperature and full mass
    fractions (..., N)."""
    T = np.asarray(T)
    Y_full = np.asarray(Y_full)
    return np.concatenate([T[..., None], Y_full[..., :-1]], axis=-1)


def full_mass_fractions(y: np.ndarray) -> np.ndarray:
    """Recover the full (..., N) mass-fraction vector from a state
    vector, via the 1 - sum closure."""
    Y = np.asarray(y)[..., 1:]
    y_N = 1.0 - Y.sum(axis=-1, keepdims=True)
    return np.concatenate([Y, y_N], axis=-1)


def permute_to_internal(packed: PackedMechanism,
                        values: np.ndarray) -> np.ndarray:
    """Reorder per-species data from the original mechanism order to the
    internal (last-species-pivoted) order."""
    fwd = np.asarray(packed.mech.fwd_spec_mapping)
    return np.asarray(values)[..., fwd]


def permute_to_original(packed: PackedMechanism,
                        values: np.ndarray) -> np.ndarray:
    """Inverse of :func:`permute_to_internal`."""
    back = np.asarray(packed.mech.back_spec_mapping)
    return np.asarray(values)[..., back]


def check_dd_range(packed: PackedMechanism, y, P, conp: bool = True,
                   limit: float = 1e30) -> dict:
    """Pre-flight range check for the double-float (f64-grade) TPU
    kernels: evaluate the true-f64 Jacobian on CPU and report states
    whose ``max|J|`` exceeds ``limit``.

    Double-float arithmetic has 2^-48 precision but **float32 range**
    (the same floor as this platform's XLA f64 emulation): a state
    whose Jacobian magnitudes approach the f32 exponent ceiling
    (~3.4e38) overflows the hi word to inf and NaN-poisons masked
    multiplies.  Run this on any NEW mechanism/state set before
    spending a multi-minute on-chip compile — the round-5 654-class
    "kernel NaN" was exactly out-of-range DATA
    (``synthetic_mechanism``'s random thermo put 55/64 states beyond
    f32 range; the reference's f64 C, with 2^-1022 range, would not
    NaN — a platform constraint, not a parity gap).

    Returns ``{'ok': bool, 'max_abs_j': float, 'per_state': (B,),
    'bad_states': indices with max|J| > limit}``.  ``limit`` defaults
    to 1e30 (headroom under f32 max for dd intermediates).

    Requires ``jax_enable_x64`` (raises otherwise, like
    :func:`ops.pallas_dd.jacobian_dd_xla`).
    """
    import jax

    if not jax.config.jax_enable_x64:
        raise RuntimeError('check_dd_range needs jax_enable_x64 for '
                           'its true-f64 reference evaluation')
    from .ops.jacobian import eval_jacobian

    y64 = np.asarray(y, np.float64)
    P64 = np.broadcast_to(np.asarray(P, np.float64), y64.shape[:1])
    with jax.default_device(jax.devices('cpu')[0]):
        J = np.asarray(eval_jacobian(packed, 0.0, P64, y64, conp=conp))
    per_state = np.abs(J).reshape(len(y64), -1).max(axis=1)
    bad = np.nonzero(~(per_state <= limit))[0]    # catches NaN too
    return {
        'ok': len(bad) == 0,
        'max_abs_j': float(np.nanmax(per_state)),
        'per_state': per_state,
        'bad_states': bad,
    }
