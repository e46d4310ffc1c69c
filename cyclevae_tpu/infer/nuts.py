"""No-U-Turn Sampler (multinomial, iterative) with dual-averaging warmup.

Clean-room implementation of progressive-sampling NUTS (Hoffman & Gelman 2014;
multinomial weighting + biased progressive sampling per Betancourt 2017),
structured for XLA:

  * ONE leapfrog step lives in the compiled graph; trajectory doubling is a
    ``lax.while_loop`` over subtree leaves, so compile size is independent of
    ``max_depth`` (a statically-unrolled recursive tree would inline
    2^max_depth decoder scans).
  * Within-subtree U-turn checks use the trailing-zero-bit stack: even leaf j
    is stored at slot tz(j) (tz(0) := max_depth); completing leaf j checks
    every level k with (j+1) % 2^k == 0 against the stored first leaf of that
    sub-subtree.  The scheme never overwrites a state before its last use.
  * Chains vmap/shard exactly as in hmc.py (chains on the ``dp`` axis).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .dual_averaging import da_final, da_init, da_update


class NUTSConfig(NamedTuple):
    step_size: float = 0.1
    max_depth: int = 8
    n_warmup: int = 200
    n_samples: int = 500
    target_accept: float = 0.8
    divergence_threshold: float = 1000.0


def _tz(n, cap):
    """Trailing zeros of n (int32), capped; tz(0) -> cap."""
    def body(state):
        n, count = state
        return n >> 1, count + 1
    def cond(state):
        n, count = state
        return jnp.logical_and(n & 1 == 0, count < cap)
    _, count = jax.lax.while_loop(cond, body, (jnp.maximum(n, 0), 0))
    return jnp.where(n == 0, cap, count)


def _uturn(z_plus, p_plus, z_minus, p_minus):
    d = (z_plus - z_minus).ravel()
    return jnp.logical_or(jnp.dot(d, p_minus.ravel()) < 0,
                          jnp.dot(d, p_plus.ravel()) < 0)


def nuts_kernel(key, logjoint, z, step_size, inv_mass, cfg: NUTSConfig):
    """One NUTS transition. Returns (z_new, stats dict)."""
    vg = jax.value_and_grad(logjoint)
    max_depth = cfg.max_depth

    def kinetic(p):
        return 0.5 * jnp.sum(inv_mass * p ** 2)

    def leapfrog(z, p, g, direction):
        eps = step_size * direction
        p_half = p + 0.5 * eps * g
        z_new = z + eps * inv_mass * p_half
        logp_new, g_new = vg(z_new)
        p_new = p_half + 0.5 * eps * g_new
        return z_new, p_new, g_new, logp_new

    k_mom, k_run = jax.random.split(key)
    p0 = jax.random.normal(k_mom, z.shape) / jnp.sqrt(inv_mass)
    logp0, g0 = vg(z)
    h0 = -logp0 + kinetic(p0)

    class Carry(NamedTuple):
        key: jax.Array
        depth: jnp.ndarray
        # overall trajectory ends in physical-time order
        z_minus: jnp.ndarray
        p_minus: jnp.ndarray
        g_minus: jnp.ndarray
        z_plus: jnp.ndarray
        p_plus: jnp.ndarray
        g_plus: jnp.ndarray
        # proposal + total multinomial weight
        z_prop: jnp.ndarray
        log_w_total: jnp.ndarray
        done: jnp.ndarray
        diverged: jnp.ndarray
        # acceptance-statistic accumulators (for dual averaging)
        sum_alpha: jnp.ndarray
        n_alpha: jnp.ndarray

    def build_subtree(key, z0, p0_, g0_, direction, depth):
        """2^depth leapfrogs from (z0, p0_) in direction; returns end state,
        subtree proposal, weight, turning/diverged flags, accept stats."""
        n_leaves = jnp.int32(1) << depth
        # bit-trick boundary stack
        stack_z = jnp.zeros((max_depth + 1,) + z.shape)
        stack_p = jnp.zeros((max_depth + 1,) + z.shape)

        class Sub(NamedTuple):
            key: jax.Array
            j: jnp.ndarray
            z: jnp.ndarray
            p: jnp.ndarray
            g: jnp.ndarray
            z_prop: jnp.ndarray
            log_w: jnp.ndarray
            turning: jnp.ndarray
            diverged: jnp.ndarray
            stack_z: jnp.ndarray
            stack_p: jnp.ndarray
            sum_alpha: jnp.ndarray
            n_alpha: jnp.ndarray

        def sub_cond(s: Sub):
            return jnp.logical_and(
                s.j < n_leaves,
                jnp.logical_not(jnp.logical_or(s.turning, s.diverged)))

        def sub_body(s: Sub):
            z_new, p_new, g_new, logp_new = leapfrog(s.z, s.p, s.g, direction)
            h = -logp_new + kinetic(p_new)
            log_w_leaf = h0 - h
            diverged = jnp.logical_or(~jnp.isfinite(log_w_leaf),
                                      log_w_leaf < -cfg.divergence_threshold)
            alpha = jnp.minimum(1.0, jnp.exp(log_w_leaf))
            # progressive multinomial within the subtree
            log_w_new = jnp.logaddexp(s.log_w, log_w_leaf)
            key, k_acc = jax.random.split(s.key)
            take = (jax.random.uniform(k_acc)
                    < jnp.exp(log_w_leaf - log_w_new))
            z_prop = jnp.where(take, z_new, s.z_prop)
            # store even leaves at slot tz(j); check odd-completing levels
            slot = _tz(s.j, max_depth)
            is_even = (s.j & 1) == 0
            stack_z = jnp.where(is_even,
                                s.stack_z.at[slot].set(z_new), s.stack_z)
            stack_p = jnp.where(is_even,
                                s.stack_p.at[slot].set(p_new), s.stack_p)

            # U-turn checks for every completed sub-subtree level
            def check_level(k, turning):
                complete = ((s.j + 1) % (jnp.int32(1) << k)) == 0
                f = s.j + 1 - (jnp.int32(1) << k)
                fslot = _tz(f, max_depth)
                zf = stack_z[fslot]
                pf = stack_p[fslot]
                d = (z_new - zf).ravel()
                turn_k = jnp.logical_or(
                    jnp.dot(d, direction * pf.ravel()) < 0,
                    jnp.dot(d, direction * p_new.ravel()) < 0)
                return jnp.where(jnp.logical_and(complete, k >= 1),
                                 jnp.logical_or(turning, turn_k), turning)

            turning = jax.lax.fori_loop(1, depth + 1, check_level, s.turning)
            return Sub(key, s.j + 1, z_new, p_new, g_new, z_prop,
                       log_w_new, turning, jnp.logical_or(s.diverged, diverged),
                       stack_z, stack_p, s.sum_alpha + alpha, s.n_alpha + 1.0)

        init = Sub(key, jnp.int32(0), z0, p0_, g0_, z0,
                   -jnp.inf, jnp.asarray(False), jnp.asarray(False),
                   stack_z, stack_p, jnp.zeros(()), jnp.zeros(()))
        s = jax.lax.while_loop(sub_cond, sub_body, init)
        return s

    def outer_cond(c: Carry):
        return jnp.logical_and(c.depth < max_depth, jnp.logical_not(c.done))

    def outer_body(c: Carry):
        key, k_dir, k_sub, k_swap = jax.random.split(c.key, 4)
        direction = jnp.where(jax.random.bernoulli(k_dir), 1.0, -1.0)
        z0 = jnp.where(direction > 0, c.z_plus, c.z_minus)
        p0_ = jnp.where(direction > 0, c.p_plus, c.p_minus)
        g0_ = jnp.where(direction > 0, c.g_plus, c.g_minus)
        s = build_subtree(k_sub, z0, p0_, g0_, direction, c.depth)

        ok = jnp.logical_not(jnp.logical_or(s.turning, s.diverged))
        # biased progressive sampling toward the new subtree
        accept_prob = jnp.minimum(1.0, jnp.exp(s.log_w - c.log_w_total))
        take = jnp.logical_and(ok, jax.random.uniform(k_swap) < accept_prob)
        z_prop = jnp.where(take, s.z_prop, c.z_prop)
        log_w_total = jnp.where(ok, jnp.logaddexp(c.log_w_total, s.log_w),
                                c.log_w_total)

        # extend the trajectory ends (only when the subtree was not rejected)
        z_plus = jnp.where(jnp.logical_and(ok, direction > 0), s.z, c.z_plus)
        p_plus = jnp.where(jnp.logical_and(ok, direction > 0), s.p, c.p_plus)
        g_plus = jnp.where(jnp.logical_and(ok, direction > 0), s.g, c.g_plus)
        # Negative-eps leapfrog traces the exact flow backward, so s.p IS the
        # physical momentum at the left end — no negation convention needed
        # (unlike formulations that flip momentum and integrate forward).
        z_minus = jnp.where(jnp.logical_and(ok, direction < 0), s.z, c.z_minus)
        p_minus = jnp.where(jnp.logical_and(ok, direction < 0), s.p, c.p_minus)
        g_minus = jnp.where(jnp.logical_and(ok, direction < 0), s.g, c.g_minus)

        turning_top = _uturn(z_plus, p_plus, z_minus, p_minus)
        done = jnp.logical_or(jnp.logical_or(s.turning, s.diverged),
                              turning_top)
        return Carry(key, c.depth + 1, z_minus, p_minus, g_minus,
                     z_plus, p_plus, g_plus, z_prop, log_w_total, done,
                     jnp.logical_or(c.diverged, s.diverged),
                     c.sum_alpha + s.sum_alpha, c.n_alpha + s.n_alpha)

    init = Carry(k_run, jnp.int32(0), z, p0, g0, z, p0, g0, z,
                 jnp.zeros(()), jnp.asarray(False), jnp.asarray(False),
                 jnp.zeros(()), jnp.zeros(()))
    c = jax.lax.while_loop(outer_cond, outer_body, init)
    stats = {
        "accept_stat": c.sum_alpha / jnp.maximum(c.n_alpha, 1.0),
        "depth": c.depth.astype(jnp.float32),
        "diverged": c.diverged,
        "n_leapfrog": c.n_alpha,
    }
    return c.z_prop, stats


def nuts_sample(
    key: jax.Array,
    logjoint: Callable[[jnp.ndarray], jnp.ndarray],
    z0: jnp.ndarray,
    cfg: NUTSConfig = NUTSConfig(),
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, dict]:
    """Single-chain NUTS with dual-averaging step size + diagonal mass warmup.
    vmap over the leading axis for chains (as hmc.hmc_sample_chains)."""

    def cross_chain_mean(x):
        if axis_name is not None:
            return jax.lax.pmean(x, axis_name)
        return x

    da0 = da_init(cfg.step_size)
    inv_mass0 = jnp.ones_like(z0)

    def warmup_body(carry, key):
        z, da, w_sum, w2_sum, n = carry
        step_size = jnp.exp(da.log_step)
        z, stats = nuts_kernel(key, logjoint, z, step_size, inv_mass0, cfg)
        da = da_update(da, cross_chain_mean(stats["accept_stat"]),
                       target=cfg.target_accept)
        return (z, da, w_sum + z, w2_sum + z ** 2, n + 1), stats["accept_stat"]

    keys = jax.random.split(key, cfg.n_warmup + cfg.n_samples + 1)
    (z, da, w_sum, w2_sum, n), warm_acc = jax.lax.scan(
        warmup_body, (z0, da0, jnp.zeros_like(z0), jnp.zeros_like(z0), 0.0),
        keys[:cfg.n_warmup])
    step_size = da_final(da)
    var = cross_chain_mean(w2_sum / n - (w_sum / n) ** 2)
    inv_mass = jnp.maximum(var, 1e-3)

    def sample_body(z, key):
        z, stats = nuts_kernel(key, logjoint, z, step_size, inv_mass, cfg)
        return z, (z, stats["accept_stat"], stats["depth"], stats["diverged"])

    z, (samples, acc, depth, div) = jax.lax.scan(sample_body, z,
                                                 keys[cfg.n_warmup:-1])
    info = {
        "accept_stat": jnp.mean(acc),
        "warmup_accept_stat": jnp.mean(warm_acc),
        "mean_depth": jnp.mean(depth),
        "divergence_rate": jnp.mean(div.astype(jnp.float32)),
        "step_size": step_size,
        "inv_mass": inv_mass,
    }
    return samples, info


def nuts_sample_chains(key, logjoint, z0_chains, cfg: NUTSConfig = NUTSConfig(),
                       shared_adaptation: bool = True):
    keys = jax.random.split(key, z0_chains.shape[0])
    axis = "chains" if shared_adaptation else None
    return jax.vmap(lambda k, z: nuts_sample(k, logjoint, z, cfg, axis_name=axis),
                    axis_name="chains")(keys, z0_chains)


def nuts_sample_sharded(mesh, key, logjoint, z0_chains,
                        cfg: NUTSConfig = NUTSConfig()):
    """NUTS chains sharded on the dp mesh axis (same collective-adaptation
    scheme as hmc.hmc_sample_sharded)."""
    from jax.sharding import PartitionSpec as P

    n_chains = z0_chains.shape[0]
    keys = jax.random.split(key, n_chains)

    def local(keys, z0s):
        def per_chain(k, z):
            return nuts_sample(k, logjoint, z, cfg,
                               axis_name=("chains", "dp"))
        samples, info = jax.vmap(per_chain, axis_name="chains")(keys, z0s)
        info = {k: jax.lax.pmean(v, "dp") for k, v in info.items()}
        return samples, info

    # check_vma=False: see hmc.hmc_sample_sharded
    fn = jax.shard_map(local, mesh=mesh, in_specs=(P("dp"), P("dp")),
                       out_specs=(P("dp"), P()), check_vma=False)
    return fn(keys, z0_chains)
