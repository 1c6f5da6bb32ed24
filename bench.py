"""Headline benchmark: fused analytical Jacobian + dy/dt throughput.

Mirrors the reference's performance tester metric (wall-clock for N
eval_jacob evaluations, reference: pyjac/performance_tester/tester.c.in:
23-31) on a GRI-3.0-sized mechanism (53 species / 325 reactions) in
float64 (the parity precision, BASELINE.md), on one chip.

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


def main():
    import jax
    jax.config.update('jax_enable_x64', True)
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_packed
    from pyjac_tpu.ops.jacobian import jacobian_and_dydt
    from pyjac_tpu.testers.synthetic import random_states

    mech, packed = _flagship_packed()
    dev = jax.devices()[0]
    print('bench device: %s' % (dev,), file=sys.stderr)

    chunk = 8192        # fits HBM at GRI scale in f64 with headroom
    total = 65536
    repeats = 3

    y, _, P = random_states(mech, chunk, seed=1)
    yj = jnp.asarray(y)
    Pj = jnp.asarray(P)

    @jax.jit
    def step(pres, ystate):
        J, f = jacobian_and_dydt(packed, 0.0, pres, ystate)
        # full on-device reductions: every output element feeds the
        # checksum so XLA cannot dead-code-eliminate any of the kernel,
        # while the host transfer stays a single scalar
        return jnp.sum(J) + jnp.sum(f)

    t0 = time.time()
    chk0 = float(step(Pj, yj))  # host sync (block_until_ready is
    # unreliable on the experimental axon platform, and each host sync
    # costs a ~30 ms tunnel roundtrip -- so chunks are queued and the
    # pass synced once)
    print('compile+first run: %.1fs' % (time.time() - t0), file=sys.stderr)
    if not np.isfinite(chk0):
        raise SystemExit('non-finite benchmark output')

    n_chunks = total // chunk
    times = []
    for _ in range(repeats):
        t0 = time.time()
        pending = [step(Pj, yj) for _ in range(n_chunks)]
        acc = float(sum(pending))
        times.append(time.time() - t0)
    best = min(times)
    evals_per_sec = total / best
    print('times per %d-state pass: %s' %
          (total, ['%.3f' % t for t in times]), file=sys.stderr)

    # secondary (stderr): the Pallas fused kernel in f32 — the
    # throughput configuration; the headline stays f64, the precision
    # that meets the 1e-8 parity bar
    del yj, Pj, pending
    import gc
    gc.collect()
    try:
        from pyjac_tpu.ops.pallas_jacobian import PallasJacobian, supports
        if supports(packed):
            pj = PallasJacobian(packed)   # adaptive batch tile (1024
            # at GRI scale with the raised VMEM limit)
            Bp = 262144
            yp, _, Pp = random_states(mech, Bp, seed=1,
                                      T_range=(1500.0, 2500.0))
            ytr = jnp.asarray(yp.T, jnp.float32)
            Prow = jnp.asarray(Pp[None], jnp.float32)
            fnp = jax.jit(lambda yt, pr: [jnp.nansum(x)
                                          for x in pj.call_tr(yt, pr)])
            float(fnp(ytr, Prow)[0])
            # best of 3 timed passes: the first pass after compile
            # still pays pipeline warmup (~2.5x) on this platform
            dts = []
            for _ in range(3):
                t0 = time.time()
                pend = [fnp(ytr, Prow) for _ in range(6)]
                float(sum(p[0] for p in pend))
                dts.append((time.time() - t0) / 6)
            print('pallas f32 kernel: %.0f evals/s/chip (B=%d)' %
                  (Bp / min(dts), Bp), file=sys.stderr)
    except Exception as e:        # keep the headline metric robust
        print('pallas secondary bench skipped: %s' % e, file=sys.stderr)

    target = 1.0e6      # BASELINE.json north star
    print(json.dumps({
        'metric': 'gri_scale_jacobian_dydt_throughput_f64',
        'value': round(evals_per_sec, 1),
        'unit': 'evals/sec/chip',
        'vs_baseline': round(evals_per_sec / target, 4),
    }))


if __name__ == '__main__':
    main()
