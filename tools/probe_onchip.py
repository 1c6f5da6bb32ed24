"""On-chip measurement probes for the round-5 verdict items.

Each job runs the real-TPU measurement the docs cite (docs/
performance.md), using the bench.py methodology: queued dispatches
with a single full-output ``jnp.sum`` checksum sync per pass (axon's
``block_until_ready`` is unreliable; slicing lets XLA DCE the kernel),
best-of-N passes (the first post-compile loop can be 40x slow —
pipeline warmup).

Jobs (run ONE at a time — concurrent TPU processes wedge the axon
compile service, CLAUDE.md):

* ``flagship-verify`` — the headline Pallas sparse pipeline evaluated
  on the reference-C golden's 128 PaSR states ON-CHIP, gated against
  ``tests/data/golden_flagship_refc.npz`` (the reference
  build-and-compare loop, pyjac/functional_tester/test.py:1146-1186,
  closed on hardware).
* ``usc2`` — 111 sp / 784 rxn (USC-Mech II size) through the fused
  sparse pipeline with compact pres-mod rows: throughput, stage-A
  split, and floored parity vs a CPU true-f64 reference computed in a
  subprocess (reference mechanism-size axis, BASELINE configs).
* ``fullfeat`` — the all-features 9-species synthetic (PLOG +
  Chebyshev + SRI + chemically-activated + fractional nu): f64-grade
  dd parity vs the reference-C golden ON-CHIP plus throughput — the
  categories' first on-chip dd number (reference codegen treats them
  first-class: rate_subs.py:149-251 Cheb, :598-632 PLOG, :1229-1256
  SRI).
"""

import argparse
import os
import subprocess
import sys
import tempfile
import time

sys.setrecursionlimit(100000)

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, 'tests', 'data')
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _write_mech(kind):
    from pyjac_tpu.testers.synthetic import (plausible_mechanism,
                                             synthetic_mechanism)
    text = {
        'flagship': lambda: plausible_mechanism(53, 325, seed=42),
        # plausible, not synthetic: random-thermo states at this size
        # put max|J| past f32 range (the CPU range check fires at
        # seed 3 — the 654-class round-5 lesson at USC-II scale);
        # plausible(111,784,5) measures max|J| ~9e17, 102 pres-mod rows
        'usc2': lambda: plausible_mechanism(111, 784, seed=5),
        'fullfeat': lambda: synthetic_mechanism(9, 24, seed=7),
        # LLNL n-heptane class (BASELINE config 5); plausible for the
        # same range reason as usc2 (max|J| ~6.4e17 over 64 states)
        'big654': lambda: plausible_mechanism(654, 2716, seed=5),
    }[kind]()
    fh = tempfile.NamedTemporaryFile('w', suffix='.inp', delete=False)
    fh.write(text)
    fh.close()
    return fh.name


def _packed(kind):
    from pyjac_tpu.core.mech import Mechanism
    from pyjac_tpu.core.pack import pack
    mech = Mechanism.from_files(_write_mech(kind))
    return mech, pack(mech)


def _split_tr(y64, P64):
    import jax.numpy as jnp
    yh = y64.T.astype(np.float32)
    yl = (y64.T - yh.astype(np.float64)).astype(np.float32)
    ph = P64[None].astype(np.float32)
    plo = (P64[None] - ph.astype(np.float64)).astype(np.float32)
    return map(jnp.asarray, (yh, yl, ph, plo))


def _throughput(fn_sum, args, B, repeats=3, queue=8):
    import numpy as np
    t0 = time.time()
    chk = float(fn_sum(*args)[0])
    compile_s = time.time() - t0
    if not np.isfinite(chk):
        raise SystemExit('non-finite probe output')
    times = []
    for _ in range(repeats):
        t0 = time.time()
        pending = [fn_sum(*args) for _ in range(queue)]
        acc = float(sum(p[0] for p in pending))
        if not np.isfinite(acc):
            raise SystemExit('non-finite probe output')
        times.append((time.time() - t0) / queue)
    return B / min(times), min(times), compile_s, times


def _floored(test, ref, floor=1e-10):
    denom = np.maximum(np.abs(ref),
                       np.abs(ref).max(-1, keepdims=True) * floor +
                       1e-300)
    return float((np.abs(test - ref) / denom).max())


def _norm_rel(test, ref):
    return float((np.abs(test - ref).max(-1) /
                  np.abs(ref).max(-1)).max())


def job_flagship_verify():
    """Headline pipeline vs reference-C golden, on hardware."""
    from pyjac_tpu.ops.pallas_dd import PallasDDJacobianSparse
    g = np.load(os.path.join(DATA, 'golden_flagship_refc.npz'))
    _, packed = _packed('flagship')
    pj = PallasDDJacobianSparse(packed, fuse_gather=True)
    n = len(g['T'])
    t0 = time.time()
    J, f = pj(g['y'], g['P'])          # pads 128 -> block internally
    print('flagship-verify eval (incl compile): %.1fs'
          % (time.time() - t0))
    Jl = J.transpose(0, 2, 1).reshape(n, -1)
    print('ON-CHIP flagship vs reference C: '
          'J floored@1e-10 %.3e, J norm-rel %.3e, f norm-rel %.3e'
          % (_floored(Jl, g['ref_jac']), _norm_rel(Jl, g['ref_jac']),
             _norm_rel(f, g['ref_dydt'])))


def _cpu_ref(kind, n, out_path):
    """CPU true-f64 (J, f) reference for `n` random states, computed in
    a SUBPROCESS (this process owns the TPU backend; x64 + cpu config
    must be set before jax is live)."""
    code = (
        "import numpy as np, jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_enable_x64', True)\n"
        "import jax.numpy as jnp, sys, runpy\n"
        "sys.path.insert(0, %r)\n"
        "probe = runpy.run_path(%r)\n"
        "from pyjac_tpu.testers.synthetic import random_states\n"
        "from pyjac_tpu.ops.jacobian import jacobian_and_dydt\n"
        "mech, packed = probe['_packed'](%r)\n"
        "y, _, P = random_states(mech, %d, seed=3)\n"
        "J, f = jacobian_and_dydt(packed, 0.0, jnp.asarray(P),\n"
        "                         jnp.asarray(y))\n"
        "J = np.asarray(J)\n"
        "assert np.abs(J).max() < 1e30, 'state set out of dd range'\n"
        "np.savez(%r, y=y, P=P, J=J, f=np.asarray(f))\n"
        % (REPO, os.path.abspath(__file__), kind, n, out_path))
    subprocess.run([sys.executable, '-c', code], check=True,
                   timeout=1800)
    return np.load(out_path)


def job_usc2(B=32768):
    import jax
    import jax.numpy as jnp

    from pyjac_tpu.ops.pallas_dd import PallasDDJacobianSparse
    from pyjac_tpu.testers.synthetic import random_states

    ref = _cpu_ref('usc2', 4, '/tmp/probe_usc2_ref.npz')
    mech, packed = _packed('usc2')
    pj = PallasDDJacobianSparse(packed, fuse_gather=True)
    print('usc2 blocks: A=%d cols=%d jb=%d'
          % (pj.block_b, pj.block_b_cols, pj.meta['jb']))

    # parity first (small shape compiles fast; also warms the service)
    J, f = pj(ref['y'], ref['P'])
    Jl = J.transpose(0, 2, 1).reshape(len(ref['y']), -1)
    rl = ref['J'].transpose(0, 2, 1).reshape(len(ref['y']), -1)
    print('ON-CHIP usc2 vs CPU true-f64: J floored@1e-10 %.3e, '
          'f norm-rel %.3e'
          % (_floored(Jl, rl), _norm_rel(f, ref['f'])))

    y, _, P = random_states(mech, B, seed=1, T_range=(1500.0, 2500.0))
    args = tuple(_split_tr(y.astype(np.float64), P.astype(np.float64)))
    fn = jax.jit(lambda a, b, c, d: [jnp.sum(x)
                                     for x in pj.call_tr(a, b, c, d)])
    rate, best, compile_s, times = _throughput(fn, args, B)
    print('usc2 fused sparse + compact pres-mod: %.0f evals/s/chip '
          '(B=%d, best %.4fs, passes %s, compile %.0fs)'
          % (rate, B, best, ['%.3f' % t for t in times], compile_s))

    # stage-A split (the binding-stage name the verdict asks for)
    fa = jax.jit(lambda a, b, c, d: [jnp.sum(x)
                                     for x in pj.stage_a_fn(a, b, c, d)])
    ra, besta, ca, _ = _throughput(fa, args, B)
    print('usc2 stage A alone: %.4fs of %.4fs (%.0f%%; compile %.0fs)'
          % (besta, best, 100.0 * besta / best, ca))


def job_fullfeat(B=262144):
    import jax
    import jax.numpy as jnp

    from pyjac_tpu.ops import pallas_dd

    g = np.load(os.path.join(DATA, 'golden_synth_refc.npz'))
    _, packed = _packed('fullfeat')
    try:
        pj = pallas_dd.PallasDDJacobianSparse(packed, fuse_gather=True)
        kind = 'sparse'
    except NotImplementedError as e:
        # expected: fractional-nu (deep) columns are outside the
        # expanded sparse pack — the dense dd kernel is the path
        print('sparse pipeline declined (%s) -> dense dd kernel' % e)
        pj = pallas_dd.PallasDDJacobian(packed)
        kind = 'dense'

    n = len(g['T'])
    t0 = time.time()
    J, f = pj(g['y'], g['P'])
    print('fullfeat %s eval (incl compile): %.1fs'
          % (kind, time.time() - t0))
    Jl = J.transpose(0, 2, 1).reshape(n, -1)
    print('ON-CHIP fullfeat dd (%s) vs reference C: '
          'J floored@1e-10 %.3e, J norm-rel %.3e, f norm-rel %.3e'
          % (kind, _floored(Jl, g['ref_jac']),
             _norm_rel(Jl, g['ref_jac']),
             _norm_rel(f, g['ref_dydt'])))

    reps = -(-B // n)
    y = np.tile(g['y'], (reps, 1))[:B]
    P = np.tile(g['P'], reps)[:B]
    args = tuple(_split_tr(y, P))
    fn = jax.jit(lambda a, b, c, d: [jnp.sum(x)
                                     for x in pj.call_tr(a, b, c, d)])
    rate, best, compile_s, times = _throughput(fn, args, B)
    print('fullfeat dd (%s, PLOG+Cheb+SRI+chemact+frac-nu): '
          '%.0f evals/s/chip (B=%d, best %.4fs, passes %s, '
          'compile %.0fs)'
          % (kind, rate, B, best, ['%.3f' % t for t in times],
             compile_s))


def job_big654(B=1024, block_b=128, jb=16, tile_r=512,
               skip_split=False, expanded=False, classes=1):
    """654-class tiled+split parts pipeline: throughput + the stage
    split the round-5 docs cite (full pass vs everything-the-column-
    kernel-streams), with the kernel-shape knobs exposed so tuning
    configs are one flag away (each config is a fresh ~10-min remote
    compile — budget accordingly)."""
    import jax
    import jax.numpy as jnp

    from pyjac_tpu.ops.pallas_dd import DDA, PallasDDJacobianBig
    from pyjac_tpu.testers.synthetic import random_states

    mech, packed = _packed('big654')
    pj = PallasDDJacobianBig(packed, block_b=block_b, jb=jb,
                             tile_r=tile_r, sparse_cols=True,
                             parts_kernel=True, split_presmod=True,
                             expanded_cols=expanded,
                             rmax_classes=classes)
    print('big654 config: block_b=%d jb=%d tile_r=%d split_r1=%s '
          'Rmax=%d expanded=%s classes=%s'
          % (block_b, jb, tile_r, pj._split_r1, pj.SC['Rmax'],
             expanded,
             pj.col_classes and [(c['Rmax'], c['n_cols'])
                                 for c in pj.col_classes]))

    # parity on CPU-checked states first (B=block_b compiles fast and
    # warms the service; CPU true-f64 at 654 species: ~minutes for 4
    # states in a subprocess)
    ref = _cpu_ref('big654', 4, '/tmp/probe_big654_ref.npz')
    nref = len(ref['y'])
    yp = np.repeat(ref['y'], block_b // nref, axis=0)
    Pp = np.repeat(ref['P'], block_b // nref, axis=0)
    Jp, fp = pj(yp.astype(np.float64), Pp.astype(np.float64))
    Jl = np.asarray(Jp)[::block_b // nref].transpose(0, 2, 1).reshape(
        nref, -1)
    rl = ref['J'].transpose(0, 2, 1).reshape(nref, -1)
    print('ON-CHIP big654 vs CPU true-f64: J floored@1e-10 %.3e, '
          'J norm-rel %.3e, f norm-rel %.3e'
          % (_floored(Jl, rl), _norm_rel(Jl, rl),
             _norm_rel(np.asarray(fp)[::block_b // nref], ref['f'])))

    y, _, P = random_states(mech, B, seed=1, T_range=(1500.0, 2500.0))
    args = tuple(_split_tr(y.astype(np.float64), P.astype(np.float64)))
    fn = jax.jit(lambda a, b, c, d: [jnp.sum(x)
                                     for x in pj.call_tr(a, b, c, d)])
    rate, best, compile_s, times = _throughput(fn, args, B, queue=4)
    print('big654 tiled+split parts pipeline: %.0f evals/s/chip '
          '(B=%d, best %.4fs, passes %s, compile %.0fs)'
          % (rate, B, best, ['%.3f' % t for t in times], compile_s))

    if skip_split:
        return
    # stage split: tiled_stage = state/thermo (XLA) + Mosaic parts
    # tiles + closure/compressed assembly — everything upstream of the
    # column kernel.  Column-kernel share = full - tiled.
    def tiled_sum(a, b, c, d):
        out, col0, f_out, _ = pj.tiled_stage(DDA(a, b), DDA(c, d),
                                             a.shape[-1])
        acc = jnp.sum(f_out.hi)
        for v in out:
            acc = acc + jnp.sum(v)
        return [acc]
    ft = jax.jit(tiled_sum)
    _, bestt, ct, _ = _throughput(ft, args, B, queue=4)
    print('big654 tiled (parts) stage alone: %.4fs of %.4fs '
          '(%.0f%%; column kernel ~%.4fs; stage compile %.0fs)'
          % (bestt, best, 100.0 * bestt / best, best - bestt, ct))


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument('job', choices=['flagship-verify', 'usc2',
                                    'fullfeat', 'big654'])
    ap.add_argument('--b', type=int, default=0)
    ap.add_argument('--block-b', type=int, default=128)
    ap.add_argument('--jb', type=int, default=16)
    ap.add_argument('--tile-r', type=int, default=512)
    ap.add_argument('--skip-split', action='store_true')
    ap.add_argument('--expanded', action='store_true')
    ap.add_argument('--classes', type=int, default=1)
    args = ap.parse_args()
    if args.job == 'flagship-verify':
        job_flagship_verify()
    elif args.job == 'usc2':
        job_usc2(**({'B': args.b} if args.b else {}))
    elif args.job == 'big654':
        job_big654(B=args.b or 1024, block_b=args.block_b, jb=args.jb,
                   tile_r=args.tile_r, skip_split=args.skip_split,
                   expanded=args.expanded, classes=args.classes)
    else:
        job_fullfeat(**({'B': args.b} if args.b else {}))


if __name__ == '__main__':
    main()
