"""Tracing / profiling helpers.

The reference has no profiler — only wall-clock deltas in logs
(train…py:659,739-740,1472; SURVEY.md §5).  Here: ``jax.profiler`` trace
capture plus a throughput meter that accounts for the fixed host<->device
round-trip of remote TPU attachments (the axon tunnel adds ~26 ms per synced
call, which otherwise poisons per-step measurements).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax

# fixed host<->device round-trip of the tunneled TPU attachment (seconds)
TUNNEL_RTT = 0.026


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def measure_steps(step_fn: Callable, state, batch, n_steps: int = 10,
                  warmup: int = 1, sync: Optional[Callable] = None,
                  subtract_rtt: bool = True) -> dict:
    """Steady-state per-step time for a carried step function.

    ``step_fn(state, batch) -> (state, aux)``; chains ``n_steps`` calls
    device-side (the carried state forms the dependency) and syncs ONCE at the
    end, so the tunnel round trip is paid once and subtracted.
    """
    for _ in range(warmup):
        state, aux = step_fn(state, batch)
    jax.block_until_ready(jax.tree_util.tree_leaves(aux)[0])
    t0 = time.time()
    for _ in range(n_steps):
        state, aux = step_fn(state, batch)
    leaf = jax.tree_util.tree_leaves(aux)[0]
    _ = float(leaf.sum()) if hasattr(leaf, "sum") else jax.block_until_ready(leaf)
    dt = time.time() - t0
    if subtract_rtt:
        dt = max(dt - TUNNEL_RTT, 1e-9)
    per_step = dt / n_steps
    return {"seconds_per_step": per_step, "steps_per_sec": 1.0 / per_step,
            "state": state}
