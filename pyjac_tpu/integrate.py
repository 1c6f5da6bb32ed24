"""Batched stiff ODE integration on-device, using the analytical Jacobian.

The reference generates Jacobian code *for* external implicit
integrators (its companion project accelerInt); the TPU rebuild closes
the loop natively: a Rosenbrock(2,3) solver (the ode23s linearly
implicit method of Shampine & Reichelt 1997) runs entirely inside one
``jax.jit`` program — per-state adaptive time stepping via
``lax.while_loop`` with acceptance masks, dense batched LU solves on the
(B, N, N) iteration matrix, and the framework's closed-form Jacobian —
so a million thermochemical states integrate in parallel across a TPU
mesh with no host round-trips.

This is the TPU-idiomatic equivalent of one-CUDA-thread-per-ODE
integration, with the linear algebra on the MXU instead of per-thread
scalar code.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .ops.dydt import dydt as dydt_dispatch
from .ops.jacobian import eval_jacobian

_D = 1.0 / (2.0 + math.sqrt(2.0))
_E32 = 6.0 + math.sqrt(2.0)


def gauss_solve(A, b):
    """Batched dense solve via Gaussian elimination with partial
    pivoting, in pure jnp ops with ``lax.fori_loop`` over the pivot
    index — trace size is O(1) in N, so the integrator compiles in
    reasonable time at any mechanism size (the statically-unrolled
    round-2 version grew an O(N^2) trace and already took ~3 min to
    compile at GRI scale).

    XLA:TPU's LU-decomposition lowering does not compile under f64
    emulation on this platform (jnp.linalg.solve / lu_factor both die in
    the backend for float64 operands), so the iteration-matrix solves
    use this elimination instead: O(N^3) like LU, compiles in every
    dtype, and vectorizes over the batch. ``A`` is (B, N, N), ``b`` is
    (B, N); returns x with A @ x == b.
    """
    N = A.shape[-1]
    M0 = jnp.concatenate([A, b[..., None]], axis=-1)     # (B, N, N+1)
    idx = jnp.arange(N)

    def elim_body(k, M):
        col = jnp.abs(jnp.take(M, k, axis=2))            # (B, N)
        col = jnp.where(idx[None, :] >= k, col, -jnp.inf)
        p = jnp.argmax(col, axis=1)                      # (B,)
        perm = jnp.where(idx[None, :] == k, p[:, None],
                         jnp.where(idx[None, :] == p[:, None], k,
                                   idx[None, :]))
        M = jnp.take_along_axis(M, perm[:, :, None], axis=1)
        piv_row = jnp.take(M, k, axis=1)                 # (B, N+1)
        fac = jnp.take(M, k, axis=2) / jnp.take(piv_row, k,
                                                axis=1)[:, None]
        fac = jnp.where(idx[None, :] > k, fac, 0.0)
        return M - fac[:, :, None] * piv_row[:, None, :]

    M = jax.lax.fori_loop(0, N, elim_body, M0)

    def back_body(i, x):
        k = N - 1 - i
        row = jnp.take(M, k, axis=1)                     # (B, N+1)
        s = jnp.sum(row[:, :N] * x, axis=-1)
        v = (row[:, N] - s) / jnp.take(row, k, axis=1)
        return x.at[:, k].set(v)

    return jax.lax.fori_loop(0, N, back_body, jnp.zeros_like(b))


STATUS_SUCCESS = 0        # reached t_end
STATUS_UNDERFLOW = 1      # step size underflowed (stiff failure)
STATUS_BUDGET = 2         # per-state step budget exhausted mid-run
STATUS_STALLED = 3        # cut off by the global 2*max_steps backstop
#                           while its own attempt budget still had room


class IntegrateResult(NamedTuple):
    y: jnp.ndarray          # (B, N) final states
    t: jnp.ndarray          # (B,) final times (== t_end on success)
    steps: jnp.ndarray      # (B,) accepted steps
    rejected: jnp.ndarray   # (B,) rejected steps
    success: jnp.ndarray    # (B,) bool
    status: jnp.ndarray     # (B,) int32 STATUS_* code


def integrate(packed, y0, param, t_end, conp: bool = True,
              rtol: float = 1e-6, atol: float = 1e-10,
              max_steps: int = 100000, first_step: Optional[float] = None,
              jacobian: str = 'xla', method: str = 'ros23'):
    """Integrate dy/dt from 0 to ``t_end`` for a batch of states.

    Parameters mirror the physics kernels: ``y0`` is (B, N) states
    ``[T, Y_1..Y_{N-1}]``, ``param`` is pressure (CONP) or density
    (CONV) per state, ``t_end`` a scalar or per-state array. Entirely
    jittable; every state adapts its own step size.

    ``max_steps`` is a *per-state* attempt budget (accepted + rejected
    steps): one stiff straggler no longer burns the whole batch's
    budget, and a state that runs out is reported with
    ``status == STATUS_BUDGET`` (distinct from step-size underflow,
    ``STATUS_UNDERFLOW``).  A global iteration backstop of
    ``2 * max_steps`` bounds the while_loop.

    ``jacobian='dd'`` evaluates the stage Jacobian with the
    double-float Pallas kernel (TPU only; ~27x the emulated-f64 XLA
    path at GRI scale) — the dominant cost of each Rosenbrock step.
    Requires a supported mechanism and a batch divisible by 128; falls
    back to the XLA Jacobian otherwise.

    ``method`` selects the Rosenbrock scheme: ``'ros23'`` (default,
    the ode23s 3-stage order-2(3) method) or ``'rodas3'`` (4-stage
    order-3(2), stiffly accurate, L-stable — the RODAS3 tableau of
    Sandu et al. as distributed with KPP; one extra linear solve per
    step buys larger accepted steps on stiff ignition problems).
    """
    if method not in ('ros23', 'rodas3'):
        raise ValueError('unknown method %r' % (method,))
    y0 = jnp.asarray(y0)
    B, N = y0.shape
    param = jnp.broadcast_to(jnp.asarray(param, dtype=y0.dtype), (B,))
    t_end = jnp.broadcast_to(jnp.asarray(t_end, dtype=y0.dtype), (B,))

    def f(y):
        return dydt_dispatch(packed, 0.0, param, y, conp=conp)

    use_dd = False
    if jacobian == 'dd':
        import jax as _jax

        from .ops.pallas_dd import PallasDDJacobian, supports
        blk = 256 if B % 256 == 0 else (128 if B % 128 == 0 else 0)
        if (supports(packed) and blk and
                _jax.default_backend() != 'cpu'):
            _pjdd = PallasDDJacobian(packed, block_b=blk, conp=conp)
            use_dd = True
        else:
            # the dd kernel is ~27x the emulated-f64 XLA path at GRI
            # scale: falling back silently would be an invisible perf
            # cliff (trace-time warning; the decision is Python-level)
            import warnings
            reason = ('mechanism outside Pallas coverage'
                      if not supports(packed) else
                      'batch size %d not divisible by 128' % B
                      if not blk else 'no TPU backend')
            warnings.warn("integrate(jacobian='dd'): falling back to "
                          'the XLA Jacobian (%s)' % reason, stacklevel=2)

    if use_dd:
        p_row = param[None, :]

        def jac(y):
            yt = y.T
            yh = yt.astype(jnp.float32)
            yl = (yt - yh.astype(y.dtype)).astype(jnp.float32)
            ph = p_row.astype(jnp.float32)
            plo = (p_row - ph.astype(y.dtype)).astype(jnp.float32)
            Jh, Jl, _, _ = _pjdd.call_tr(yh, yl, ph, plo)
            # kernel layout (column, row, batch) -> (batch, row, column)
            return (jnp.transpose(Jh, (2, 1, 0)).astype(y.dtype) +
                    jnp.transpose(Jl, (2, 1, 0)).astype(y.dtype))
    else:
        def jac(y):
            return eval_jacobian(packed, 0.0, param, y, conp=conp)

    if first_step is None:
        h0 = t_end * 1e-6
    else:
        h0 = jnp.full((B,), first_step, dtype=y0.dtype)

    eye = jnp.eye(N, dtype=y0.dtype)

    class Carry(NamedTuple):
        y: jnp.ndarray
        t: jnp.ndarray
        h: jnp.ndarray
        steps: jnp.ndarray
        rejected: jnp.ndarray
        failed: jnp.ndarray
        iters: jnp.ndarray

    def attempts(c):
        return c.steps + c.rejected

    def cond(c: Carry):
        active = (c.t < t_end) & ~c.failed & \
            (attempts(c) < max_steps)
        return jnp.any(active) & (c.iters < 2 * max_steps)

    def body(c: Carry):
        active = (c.t < t_end) & ~c.failed & \
            (attempts(c) < max_steps)
        h = jnp.minimum(c.h, t_end - c.t)
        h = jnp.where(active, h, 1.0)          # benign value on done rows

        F0 = f(c.y)
        J = jac(c.y)
        gamma = _D if method == 'ros23' else 0.5
        W = eye - (h * gamma)[:, None, None] * J

        def solve(rhs):
            return gauss_solve(W, rhs)

        if method == 'ros23':
            k1 = solve(F0)
            F1 = f(c.y + 0.5 * h[:, None] * k1)
            k2 = solve(F1 - k1) + k1
            y_new = c.y + h[:, None] * k2
            F2 = f(y_new)
            k3 = solve(F2 - _E32 * (k2 - F1) - 2.0 * (k1 - F0))
            err_vec = (h / 6.0)[:, None] * (k1 - 2.0 * k2 + k3)
        else:
            # RODAS3 in the KPP stage form: (I - h g J) K_i =
            # h g F(Y_i) + g sum_j C_ij K_j, with gamma = 1/2,
            # A = [[0],[2,0],[2,0,1]], C = [[4],[1,-1],[1,-1,-8/3]],
            # M = [2,0,1,1], E = [0,0,0,1]; stage 2 reuses F(y).
            hc = h[:, None]
            K1 = solve(0.5 * hc * F0)
            K2 = solve(0.5 * hc * F0 + 2.0 * K1)
            Y3 = c.y + 2.0 * K1
            K3 = solve(0.5 * (hc * f(Y3) + K1 - K2))
            Y4 = Y3 + K3
            K4 = solve(0.5 * (hc * f(Y4) + K1 - K2) - (4.0 / 3.0) * K3)
            y_new = c.y + 2.0 * K1 + K3 + K4
            err_vec = K4

        scale = atol + rtol * jnp.maximum(jnp.abs(c.y), jnp.abs(y_new))
        err = jnp.sqrt(jnp.mean((err_vec / scale) ** 2, axis=-1))
        err = jnp.where(jnp.isfinite(err), err, jnp.inf)

        accept = (err <= 1.0) & active
        # PI-less step controller with the usual safety factors
        factor = jnp.clip(0.9 * jnp.power(jnp.maximum(err, 1e-16),
                                          -1.0 / 3.0), 0.2, 5.0)
        h_next = jnp.where(accept, h * factor,
                           h * jnp.maximum(factor, 0.2) * 0.5)
        h_next = jnp.where(jnp.isfinite(h_next) & (h_next > 0.0),
                           h_next, h * 0.5)

        y_out = jnp.where(accept[:, None], y_new, c.y)
        t_out = jnp.where(accept, c.t + h, c.t)
        # a step that underflows the representable dt is a failure
        too_small = active & (h_next < 1e-14 * t_end) & ~accept
        return Carry(
            y=y_out, t=t_out,
            h=jnp.where(active, h_next, c.h),
            steps=c.steps + accept.astype(jnp.int32),
            rejected=c.rejected + (active & ~accept).astype(jnp.int32),
            failed=c.failed | too_small,
            iters=c.iters + 1,
        )

    init = Carry(y=y0, t=jnp.zeros((B,), y0.dtype), h=h0,
                 steps=jnp.zeros((B,), jnp.int32),
                 rejected=jnp.zeros((B,), jnp.int32),
                 failed=jnp.zeros((B,), bool),
                 iters=jnp.zeros((), jnp.int32))
    out = jax.lax.while_loop(cond, body, init)
    success = (out.t >= t_end) & ~out.failed
    att = out.steps + out.rejected
    status = jnp.where(
        success, STATUS_SUCCESS,
        jnp.where(out.failed, STATUS_UNDERFLOW,
                  jnp.where(att >= max_steps, STATUS_BUDGET,
                            STATUS_STALLED))).astype(jnp.int32)
    return IntegrateResult(out.y, out.t, out.steps, out.rejected, success,
                           status)


def ignition_delay(packed, y0, param, t_end, threshold: float = 400.0,
                   conp: bool = True, n_points: int = 64,
                   rtol: float = 1e-6, atol: float = 1e-10):
    """Crude batched ignition-delay estimate: bisection on the time at
    which T rises ``threshold`` K above the initial temperature.

    Demonstrates a full production workflow (integrate -> observe ->
    decide) running device-side over the whole batch.
    """
    import numpy as np

    @jax.jit
    def metric(y_init, par, horizon):
        res = integrate(packed, y_init, par, horizon, conp=conp,
                        rtol=rtol, atol=atol)
        return res.y[:, 0]

    y0 = jnp.asarray(y0)
    T0 = np.asarray(y0[:, 0])
    lo = np.zeros(len(T0))
    hi = np.full(len(T0), float(t_end))
    for _ in range(int(math.log2(n_points)) + 4):
        mid = 0.5 * (lo + hi)
        Tm = metric(y0, jnp.asarray(param), jnp.asarray(mid))
        ignited = np.asarray(Tm) > T0 + threshold
        hi = np.where(ignited, mid, hi)
        lo = np.where(ignited, lo, mid)
    return 0.5 * (lo + hi)
