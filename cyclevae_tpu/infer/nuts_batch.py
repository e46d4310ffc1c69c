"""Batched-chain NUTS: all chains ride the target's batch axis in lockstep.

Same motivation as hmc.hmc_sample_batch (chains fill the MXU tile instead of
vmapping independent tree builds): every outer doubling iteration j, all
still-active chains build a 2^j-leaf subtree simultaneously — one batched
leapfrog per leaf — with per-chain direction draws, U-turn flags, divergence
flags, and progressive-sampling decisions applied by masking.  A chain whose
trajectory terminated stops updating (its state freezes) while the remaining
chains continue; the transition ends when every chain is done or max_depth is
reached.

The tree mechanics (multinomial weights, biased progressive sampling,
trailing-zero-bit boundary stack) mirror infer/nuts.py exactly, vectorized
over the chain axis.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .dual_averaging import da_final, da_init, da_update
from .nuts import NUTSConfig, _tz


def _bdot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Per-chain dot product over all non-chain axes: (C, ...) -> (C,)."""
    C = a.shape[0]
    return jnp.sum(a.reshape(C, -1) * b.reshape(C, -1), axis=-1)


def _bwhere(mask: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Broadcast a (C,) mask over chain-batched arrays."""
    return jnp.where(mask.reshape((-1,) + (1,) * (x.ndim - 1)), x, y)


def nuts_kernel_batch(key, logjoint_batch, z, step_size, inv_mass,
                      cfg: NUTSConfig):
    """One batched NUTS transition: z (C, ...) -> (C, ...), stats per chain."""
    C = z.shape[0]
    max_depth = cfg.max_depth

    def total_lj(z):
        return jnp.sum(logjoint_batch(z))

    grad_fn = jax.grad(total_lj)

    def kinetic(p):
        return 0.5 * jnp.sum((inv_mass * p ** 2).reshape(C, -1), axis=-1)

    def leapfrog(z, p, g, direction):
        eps = (step_size * direction).reshape((C,) + (1,) * (z.ndim - 1))
        p_half = p + 0.5 * eps * g
        z_new = z + eps * inv_mass * p_half
        g_new = grad_fn(z_new)
        p_new = p_half + 0.5 * eps * g_new
        logp_new = logjoint_batch(z_new)
        return z_new, p_new, g_new, logp_new

    k_mom, k_run = jax.random.split(key)
    p0 = jax.random.normal(k_mom, z.shape) / jnp.sqrt(inv_mass)
    g0 = grad_fn(z)
    h0 = -logjoint_batch(z) + kinetic(p0)

    class Carry(NamedTuple):
        key: jax.Array
        depth: jnp.ndarray          # scalar outer iteration
        z_minus: jnp.ndarray
        p_minus: jnp.ndarray
        g_minus: jnp.ndarray
        z_plus: jnp.ndarray
        p_plus: jnp.ndarray
        g_plus: jnp.ndarray
        z_prop: jnp.ndarray
        log_w_total: jnp.ndarray    # (C,)
        done: jnp.ndarray           # (C,) bool
        diverged: jnp.ndarray       # (C,)
        sum_alpha: jnp.ndarray      # (C,)
        n_alpha: jnp.ndarray        # (C,)

    def build_subtree(key, z0, p0_, g0_, direction, depth, active):
        n_leaves = jnp.int32(1) << depth
        stack_z = jnp.zeros((max_depth + 1,) + z.shape)
        stack_p = jnp.zeros((max_depth + 1,) + z.shape)

        class Sub(NamedTuple):
            key: jax.Array
            j: jnp.ndarray
            z: jnp.ndarray
            p: jnp.ndarray
            g: jnp.ndarray
            z_prop: jnp.ndarray
            log_w: jnp.ndarray       # (C,)
            turning: jnp.ndarray     # (C,)
            diverged: jnp.ndarray    # (C,)
            stack_z: jnp.ndarray
            stack_p: jnp.ndarray
            sum_alpha: jnp.ndarray
            n_alpha: jnp.ndarray

        def sub_cond(s: Sub):
            # run while any chain still needs leaves
            live = jnp.logical_and(
                active, jnp.logical_not(jnp.logical_or(s.turning, s.diverged)))
            return jnp.logical_and(s.j < n_leaves, jnp.any(live))

        def sub_body(s: Sub):
            live = jnp.logical_and(
                active, jnp.logical_not(jnp.logical_or(s.turning, s.diverged)))
            z_new, p_new, g_new, logp_new = leapfrog(s.z, s.p, s.g, direction)
            # frozen chains keep their old state
            z_new = _bwhere(live, z_new, s.z)
            p_new = _bwhere(live, p_new, s.p)
            g_new = _bwhere(live, g_new, s.g)
            h = -logp_new + kinetic(p_new)
            log_w_leaf = jnp.where(live, h0 - h, -jnp.inf)
            div_new = jnp.logical_and(live, jnp.logical_or(
                ~jnp.isfinite(log_w_leaf),
                log_w_leaf < -cfg.divergence_threshold))
            alpha = jnp.where(live, jnp.minimum(1.0, jnp.exp(log_w_leaf)), 0.0)

            log_w_new = jnp.logaddexp(s.log_w, log_w_leaf)
            key, k_acc = jax.random.split(s.key)
            take = jnp.logical_and(
                live, jax.random.uniform(k_acc, (C,))
                < jnp.exp(log_w_leaf - log_w_new))
            z_prop = _bwhere(take, z_new, s.z_prop)

            slot = _tz(s.j, max_depth)
            is_even = (s.j & 1) == 0
            stack_z = jnp.where(is_even, s.stack_z.at[slot].set(z_new),
                                s.stack_z)
            stack_p = jnp.where(is_even, s.stack_p.at[slot].set(p_new),
                                s.stack_p)

            def check_level(k, turning):
                complete = ((s.j + 1) % (jnp.int32(1) << k)) == 0
                f = s.j + 1 - (jnp.int32(1) << k)
                fslot = _tz(f, max_depth)
                zf = stack_z[fslot]
                pf = stack_p[fslot]
                d = z_new - zf
                turn_k = jnp.logical_or(
                    direction * _bdot(d, pf) < 0,
                    direction * _bdot(d, p_new) < 0)
                hit = jnp.logical_and(complete, k >= 1)
                return jnp.where(jnp.logical_and(hit, live),
                                 jnp.logical_or(turning, turn_k), turning)

            turning = jax.lax.fori_loop(1, depth + 1, check_level, s.turning)
            return Sub(key, s.j + 1, z_new, p_new, g_new, z_prop,
                       jnp.where(live, log_w_new, s.log_w),
                       turning, jnp.logical_or(s.diverged, div_new),
                       stack_z, stack_p, s.sum_alpha + alpha,
                       s.n_alpha + live.astype(jnp.float32))

        init = Sub(key, jnp.int32(0), z0, p0_, g0_, z0,
                   jnp.full((C,), -jnp.inf), jnp.zeros((C,), bool),
                   jnp.zeros((C,), bool), stack_z, stack_p,
                   jnp.zeros((C,)), jnp.zeros((C,)))
        return jax.lax.while_loop(sub_cond, sub_body, init)

    def outer_cond(c: Carry):
        return jnp.logical_and(c.depth < max_depth,
                               jnp.logical_not(jnp.all(c.done)))

    def outer_body(c: Carry):
        key, k_dir, k_sub, k_swap = jax.random.split(c.key, 4)
        active = jnp.logical_not(c.done)
        direction = jnp.where(jax.random.bernoulli(k_dir, shape=(C,)),
                              1.0, -1.0)
        fwd = direction > 0
        z0 = _bwhere(fwd, c.z_plus, c.z_minus)
        p0_ = _bwhere(fwd, c.p_plus, c.p_minus)
        g0_ = _bwhere(fwd, c.g_plus, c.g_minus)
        s = build_subtree(k_sub, z0, p0_, g0_, direction, c.depth, active)

        ok = jnp.logical_and(
            active,
            jnp.logical_not(jnp.logical_or(s.turning, s.diverged)))
        accept_prob = jnp.minimum(1.0, jnp.exp(s.log_w - c.log_w_total))
        take = jnp.logical_and(ok, jax.random.uniform(k_swap, (C,))
                               < accept_prob)
        z_prop = _bwhere(take, s.z_prop, c.z_prop)
        log_w_total = jnp.where(ok, jnp.logaddexp(c.log_w_total, s.log_w),
                                c.log_w_total)

        ext_r = jnp.logical_and(ok, fwd)
        ext_l = jnp.logical_and(ok, jnp.logical_not(fwd))
        z_plus = _bwhere(ext_r, s.z, c.z_plus)
        p_plus = _bwhere(ext_r, s.p, c.p_plus)
        g_plus = _bwhere(ext_r, s.g, c.g_plus)
        z_minus = _bwhere(ext_l, s.z, c.z_minus)
        p_minus = _bwhere(ext_l, s.p, c.p_minus)
        g_minus = _bwhere(ext_l, s.g, c.g_minus)

        d = z_plus - z_minus
        turning_top = jnp.logical_or(_bdot(d, p_minus) < 0,
                                     _bdot(d, p_plus) < 0)
        done = jnp.logical_or(
            c.done,
            jnp.logical_or(jnp.logical_or(s.turning, s.diverged),
                           turning_top))
        return Carry(key, c.depth + 1, z_minus, p_minus, g_minus,
                     z_plus, p_plus, g_plus, z_prop, log_w_total, done,
                     jnp.logical_or(c.diverged, s.diverged),
                     c.sum_alpha + s.sum_alpha, c.n_alpha + s.n_alpha)

    init = Carry(k_run, jnp.int32(0), z, p0, g0, z, p0, g0, z,
                 jnp.zeros((C,)), jnp.zeros((C,), bool),
                 jnp.zeros((C,), bool), jnp.zeros((C,)), jnp.zeros((C,)))
    c = jax.lax.while_loop(outer_cond, outer_body, init)
    stats = {
        "accept_stat": c.sum_alpha / jnp.maximum(c.n_alpha, 1.0),  # (C,)
        "diverged": c.diverged,
        "n_leapfrog": c.n_alpha,
        # chain hit max_depth without a U-turn/divergence terminating its
        # trajectory — the transition was effectively fixed-length HMC; a
        # high rate means max_depth (or the metric) is too small for the
        # posterior at the adapted step size
        "saturated": jnp.logical_not(c.done),
    }
    return c.z_prop, stats


def nuts_sample_batch(
    key: jax.Array,
    logjoint_batch: Callable[[jnp.ndarray], jnp.ndarray],
    z0_chains: jnp.ndarray,
    cfg: NUTSConfig = NUTSConfig(),
) -> Tuple[jnp.ndarray, dict]:
    """Batched-chain NUTS with shared dual-averaging + pooled mass adaptation.
    Returns (samples (n_samples, C, ...), info)."""
    da0 = da_init(cfg.step_size)
    inv_mass0 = jnp.ones_like(z0_chains[0])

    def make_warmup_body(inv_mass):
        def warmup_body(carry, key):
            z, da, w_sum, w2_sum, n = carry
            z, stats = nuts_kernel_batch(key, logjoint_batch, z,
                                         jnp.exp(da.log_step), inv_mass, cfg)
            da = da_update(da, jnp.mean(stats["accept_stat"]),
                           target=cfg.target_accept)
            return ((z, da, w_sum + z, w2_sum + z ** 2, n + 1),
                    stats["accept_stat"])
        return warmup_body

    # Windowed warmup (same scheme as hmc.hmc_sample_batch): phase 1 adapts
    # the step size under the identity metric and collects moments, the
    # pooled cross-chain variance becomes the diagonal inverse mass, and
    # phase 2 re-adapts the step size under the new metric.
    keys = jax.random.split(key, cfg.n_warmup + cfg.n_samples + 1)
    n1 = cfg.n_warmup // 2
    (z, da, w_sum, w2_sum, n), warm_acc1 = jax.lax.scan(
        make_warmup_body(inv_mass0),
        (z0_chains, da0, jnp.zeros_like(z0_chains),
         jnp.zeros_like(z0_chains), 0.0), keys[:n1])
    var = jnp.mean(w2_sum / n - (w_sum / n) ** 2, axis=0)
    inv_mass = jnp.maximum(var, 1e-3)
    (z, da, _, _, _), warm_acc2 = jax.lax.scan(
        make_warmup_body(inv_mass),
        (z, da_init(da_final(da)), jnp.zeros_like(z), jnp.zeros_like(z), 0.0),
        keys[n1:cfg.n_warmup])
    warm_acc = jnp.concatenate([warm_acc1, warm_acc2])
    step_size = da_final(da)

    def sample_body(z, key):
        z, stats = nuts_kernel_batch(key, logjoint_batch, z, step_size,
                                     inv_mass, cfg)
        return z, (z, stats["accept_stat"], stats["diverged"],
                   stats["n_leapfrog"], stats["saturated"])

    z, (samples, acc, div, n_lf, sat) = jax.lax.scan(sample_body, z,
                                                     keys[cfg.n_warmup:-1])
    info = {
        "accept_stat": jnp.mean(acc),
        "warmup_accept_stat": jnp.mean(warm_acc),
        "divergence_rate": jnp.mean(div.astype(jnp.float32)),
        "step_size": step_size,
        "inv_mass": inv_mass,
        # mean LIVE leapfrogs per chain per transition (tree depth is
        # data-dependent; benches use this to report grad-evals/s)
        "mean_leapfrog": jnp.mean(n_lf),
        # fraction of (chain, iteration) transitions that hit max_depth
        # without the U-turn criterion terminating the trajectory
        "saturation_rate": jnp.mean(sat.astype(jnp.float32)),
    }
    return samples, info
