"""Tracing / profiling helpers.

The reference's only observability hook is human-readable Kokkos kernel
names surfacing in nvprof/Kokkos-Tools (reference:
include/operators/portable_laplace_operator.h:604, :797;
include/multigrid/portable_geometric_transfer.h:804).  The TPU-native
equivalents: jax.named_scope annotations (visible in XLA HLO and the
profiler timeline), jax.profiler traces, and a dispatch-robust timing
helper (device execution is asynchronous; naive wall-clock timing measures
dispatch, not compute).
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Callable

import jax
import jax.numpy as jnp

named_scope = jax.named_scope


@contextlib.contextmanager
def trace(dirname: str):
    """Capture a jax.profiler trace (open with TensorBoard / Perfetto)."""
    jax.profiler.start_trace(dirname)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def measure_op(f: Callable, x0: jnp.ndarray, iterations=(2, 8),
               params=None, repeats: int = 1,
               progress: Callable | None = None) -> float:
    """Per-iteration wall time of x -> f(x) (or f(params, x) when ``params``
    is given), robust to async dispatch.

    Runs the op inside a single jitted lax.fori_loop, synchronizes through a
    scalar readback, and returns the slope between two iteration counts —
    this removes dispatch/RPC overhead and works on backends where
    block_until_ready is unreliable (e.g. tunneled TPU attachments).
    Pass large operator pytrees via ``params`` so they become jit arguments
    rather than closure constants embedded in the compiled program.
    ``repeats`` > 1 takes the minimum of several timed runs per iteration
    count — the tunneled relay's per-call jitter is one-sided, so best-of-k
    recovers the true steady-state slope.

    ``progress(slope_so_far, k)`` — optional callback after each repeat
    round (both iteration counts timed k times); a truthy return stops
    further repeats (bench.py's deadline-aware early-out, VERDICT r4
    item 1).  Repeat rounds alternate between the two iteration counts so a
    slope exists after round 1.
    """
    runs = {}
    for n in iterations:
        if params is None:

            @jax.jit
            def loop(v, n=n):
                y = jax.lax.fori_loop(0, n, lambda i, u: f(u), v)
                return jnp.sum(y.ravel()[:1])

            runs[n] = (lambda loop=loop: float(loop(x0)))
        else:

            @jax.jit
            def loop(prm, v, n=n):
                y = jax.lax.fori_loop(0, n, lambda i, u: f(prm, u), v)
                return jnp.sum(y.ravel()[:1])

            runs[n] = (lambda loop=loop: float(loop(params, x0)))
        runs[n]()  # compile + warm
    n0, n1 = iterations
    best = {n: None for n in iterations}
    slope = None
    for k in range(max(1, repeats)):
        for n in iterations:
            t0 = time.perf_counter()
            runs[n]()
            dt = time.perf_counter() - t0
            best[n] = dt if best[n] is None else min(best[n], dt)
        slope = (best[n1] - best[n0]) / (n1 - n0)
        if progress is not None and progress(slope, k + 1):
            break
    return slope


class SolverLog:
    """Rank-0-style structured logging (the ConditionalOStream analog,
    reference: source/geometric_multigrid/program.cc:118,132)."""

    def __init__(self, enabled: bool = True, json_lines: bool = False):
        self.enabled = enabled
        self.json_lines = json_lines
        self.records: list[dict] = []

    def log(self, **fields):
        self.records.append(fields)
        if not self.enabled:
            return
        if self.json_lines:
            print(json.dumps(fields))
        else:
            print(" ".join(f"{k}={v}" for k, v in fields.items()))
