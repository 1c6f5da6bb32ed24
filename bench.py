"""Headline benchmark: fused analytical Jacobian + dy/dt throughput.

Mirrors the reference's performance tester metric (wall-clock for N
eval_jacob evaluations, reference: pyjac/performance_tester/tester.c.in:
23-31) on a GRI-3.0-sized mechanism (53 species / 325 reactions) at
**parity precision** (f64-grade double-float arithmetic, BASELINE.md),
on one chip.

The headline path is the double-float Pallas kernel
(pyjac_tpu/ops/pallas_dd.py): (hi, lo) f32 pairs at ~2^-48 relative
precision, validated on-chip against the reference's generated C at
7.2e-10 thresholded max relative error (bar: 1e-8).

Prints ONE JSON line:
  {"metric": ..., "value": evals/sec/chip, "unit": ..., "vs_baseline": x}
vs_baseline is measured against the north-star target of 1e6
Jacobian+dydt evals/sec/chip (BASELINE.json).
"""

import json
import sys
import time

sys.setrecursionlimit(100000)   # deep Pallas kernel traces

import numpy as np


def _split64_cols(x64):
    hi = x64.astype(np.float32)
    return hi, (x64 - hi.astype(np.float64)).astype(np.float32)


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_packed
    from pyjac_tpu.ops.pallas_dd import PallasDDJacobian
    from pyjac_tpu.testers.synthetic import random_states

    mech, packed = _flagship_packed()
    dev = jax.devices()[0]
    print('bench device: %s' % (dev,), file=sys.stderr)

    B = 65536
    repeats = 3
    queue = 4           # queued dispatches per timed pass (one host
    # sync per pass: block_until_ready is unreliable on axon and each
    # sync costs a ~30 ms tunnel roundtrip)

    y, _, P = random_states(mech, B, seed=1, T_range=(1500.0, 2500.0))
    y64 = y.astype(np.float64).T
    P64 = P.astype(np.float64)[None]
    yh, yl = _split64_cols(y64)
    ph, plo = _split64_cols(P64)
    yh, yl, ph, plo = map(jnp.asarray, (yh, yl, ph, plo))

    pj = PallasDDJacobian(packed)
    # full on-device reductions: every output element feeds the
    # checksum so XLA cannot dead-code-eliminate any of the kernel,
    # while the host transfer stays a single scalar per output.
    # jnp.sum (not nansum): a NaN anywhere must poison the checksum so
    # the non-finite guard below catches a broken kernel
    fn = jax.jit(lambda a, b, c, d: [jnp.sum(x)
                                     for x in pj.call_tr(a, b, c, d)])

    t0 = time.time()
    chk = float(fn(yh, yl, ph, plo)[0])
    print('compile+first run: %.1fs (block_b=%d)' %
          (time.time() - t0, pj.block_b), file=sys.stderr)
    if not np.isfinite(chk):
        raise SystemExit('non-finite benchmark output')

    times = []
    for _ in range(repeats):
        t0 = time.time()
        pending = [fn(yh, yl, ph, plo) for _ in range(queue)]
        acc = float(sum(p[0] for p in pending))
        if not np.isfinite(acc):
            raise SystemExit('non-finite benchmark output')
        times.append((time.time() - t0) / queue)
    best = min(times)
    evals_per_sec = B / best
    print('times per %d-state pass: %s' %
          (B, ['%.3f' % t for t in times]), file=sys.stderr)

    # secondary (stderr): the f32 Pallas kernel — the pure-throughput
    # configuration; the headline stays parity precision
    try:
        from pyjac_tpu.ops.pallas_jacobian import PallasJacobian, supports
        if supports(packed):
            pf = PallasJacobian(packed)
            Bp = 262144
            yp, _, Pp = random_states(mech, Bp, seed=1,
                                      T_range=(1500.0, 2500.0))
            ytr = jnp.asarray(yp.T, jnp.float32)
            Prow = jnp.asarray(Pp[None], jnp.float32)
            fnp = jax.jit(lambda yt, pr: [jnp.sum(x)
                                          for x in pf.call_tr(yt, pr)])
            float(fnp(ytr, Prow)[0])
            dts = []
            for _ in range(3):
                t0 = time.time()
                pend = [fnp(ytr, Prow) for _ in range(6)]
                float(sum(p[0] for p in pend))
                dts.append((time.time() - t0) / 6)
            print('pallas f32 kernel: %.0f evals/s/chip (B=%d)' %
                  (Bp / min(dts), Bp), file=sys.stderr)
    except Exception as e:        # keep the headline metric robust
        print('pallas f32 secondary bench skipped: %s' % e,
              file=sys.stderr)

    target = 1.0e6      # BASELINE.json north star
    print(json.dumps({
        'metric': 'gri_scale_jacobian_dydt_throughput_f64grade_dd',
        'value': round(evals_per_sec, 1),
        'unit': 'evals/sec/chip',
        'vs_baseline': round(evals_per_sec / target, 4),
    }))


if __name__ == '__main__':
    main()
