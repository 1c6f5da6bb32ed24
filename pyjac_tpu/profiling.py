"""Profiling and cost accounting.

The reference's observability is a wall-clock timer and CSV lines
(reference: pyjac/performance_tester/timer.h:24-53, tester.c.in:31).
The TPU rebuild exposes:

* :func:`trace` — a context manager around the JAX profiler producing
  TensorBoard-compatible traces of the compiled kernels,
* :func:`cost_estimate` — closed-form FLOP / byte accounting per kernel
  per state, derived from the packed mechanism (the basis for
  roofline/speed-of-light analysis of the hot kernels),
* :func:`timed` — wall-clock timing with a forced host sync
  (``block_until_ready`` alone is unreliable on the experimental axon
  TPU platform; a scalar device->host transfer is the dependable
  barrier).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Callable, Dict


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile a block of device work into ``log_dir``."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class CostEstimate:
    flops_per_state: float
    transcendentals_per_state: float
    bytes_per_state: float

    def arithmetic_intensity(self) -> float:
        return self.flops_per_state / max(self.bytes_per_state, 1.0)


def cost_estimate(packed, kernel: str = 'jacobian',
                  dtype_bytes: int = 8) -> CostEstimate:
    """Analytic per-state cost of a kernel for roofline analysis."""
    N = packed.n_species
    R = packed.n_reactions
    Sf = packed.reac_sp.shape[1]
    Sp = packed.prod_sp.shape[1]

    # rates: kf/Kc exponentials, slot products, nu^T q matmul
    trans = 3.0 * R                      # exp(kf), exp(Kc), assorted logs
    flops_rates = R * (10 + 3 * (Sf + Sp)) + 2.0 * R * N   # + spec matmul
    bytes_rates = (N + 4 * R) * dtype_bytes

    if kernel == 'rates':
        return CostEstimate(flops_rates, trans, bytes_rates)
    if kernel == 'dydt':
        return CostEstimate(flops_rates + 8.0 * N, trans + 2 * N,
                            bytes_rates + 2 * N * dtype_bytes)
    if kernel == 'jacobian':
        # dominant: dense nu^T @ P1 matmul (N x R)(R x N-1) plus the
        # O(R N) P1/D assembly and O(R) scalar derivative terms
        flops = (flops_rates + 2.0 * R * N * (N - 1) + 10.0 * R * N +
                 40.0 * R + 8.0 * N * N)
        bytes_ = (3.0 * R * N + N * N + 6 * R) * dtype_bytes
        return CostEstimate(flops, trans + 4.0 * R, bytes_)
    raise ValueError('unknown kernel ' + kernel)


def speed_of_light(packed, kernel: str = 'jacobian',
                   dtype_bytes: int = 4,
                   peak_flops: float = 4.9e13,
                   peak_bw: float = 8.2e11) -> Dict[str, float]:
    """Upper-bound throughput (evals/s) from the roofline model.

    Defaults approximate a TPU v5e in f32 (MXU ~49 TFLOP/s, HBM
    ~820 GB/s).
    """
    c = cost_estimate(packed, kernel, dtype_bytes)
    return {
        'compute_bound_evals_per_sec': peak_flops / c.flops_per_state,
        'memory_bound_evals_per_sec': peak_bw / c.bytes_per_state,
        'arithmetic_intensity': c.arithmetic_intensity(),
    }


def timed(fn: Callable, *args, iters: int = 5, warmup: int = 1):
    """(result, seconds_per_call) with a reliable device barrier."""
    import jax.numpy as jnp
    import numpy as np

    def sync(res):
        leaves = res if isinstance(res, (tuple, list)) else (res,)
        total = 0.0
        for leaf in leaves:
            total += float(jnp.asarray(leaf).ravel()[0])
        return total

    result = None
    for _ in range(max(warmup, 1)):
        result = fn(*args)
        sync(result)
    t0 = time.perf_counter()
    for _ in range(iters):
        result = fn(*args)
        sync(result)
    return result, (time.perf_counter() - t0) / iters
