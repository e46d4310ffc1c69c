"""Nesterov dual-averaging step-size adaptation (Hoffman & Gelman 2014 §3.2).

Used during HMC/NUTS warmup to drive the average acceptance probability to a
target (0.8 by default).  When chains are sharded over the ``dp`` mesh axis,
the per-iteration acceptance statistic is psum-averaged across devices so all
chains share one adapted step size (SURVEY.md §2.3 communication table)."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class DualAveragingState(NamedTuple):
    log_step: jnp.ndarray       # current log step size
    log_step_avg: jnp.ndarray   # averaged iterate
    h_bar: jnp.ndarray          # running accept-error average
    mu: jnp.ndarray             # shrinkage target
    t: jnp.ndarray              # iteration counter


def da_init(step_size: float) -> DualAveragingState:
    log_eps = jnp.log(jnp.asarray(step_size))
    return DualAveragingState(
        log_step=log_eps,
        log_step_avg=jnp.zeros(()),
        h_bar=jnp.zeros(()),
        mu=jnp.log(10.0) + log_eps,
        t=jnp.zeros(()),
    )


def da_update(state: DualAveragingState, accept_prob: jnp.ndarray,
              target: float = 0.8, gamma: float = 0.05, t0: float = 10.0,
              kappa: float = 0.75) -> DualAveragingState:
    t = state.t + 1.0
    eta_h = 1.0 / (t + t0)
    h_bar = (1.0 - eta_h) * state.h_bar + eta_h * (target - accept_prob)
    log_step = state.mu - jnp.sqrt(t) / gamma * h_bar
    eta = t ** (-kappa)
    log_step_avg = eta * log_step + (1.0 - eta) * state.log_step_avg
    return DualAveragingState(log_step, log_step_avg, h_bar, state.mu, t)


def da_final(state: DualAveragingState) -> jnp.ndarray:
    """Adapted step size to use after warmup."""
    return jnp.exp(state.log_step_avg)
