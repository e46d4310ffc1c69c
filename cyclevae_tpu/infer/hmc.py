"""Hamiltonian Monte Carlo with leapfrog integration + dual-averaging warmup.

TPU-first design: the leapfrog chain is a ``lax.scan`` (gradients of the
log-joint flow through the decoder's AR scan), chains are a vmapped batch
axis, and multi-chip scaling shards CHAINS on the ``dp`` mesh axis — the
framework's unit of data parallelism (SURVEY.md §2.3).  Step-size adaptation
statistics are averaged over all chains (``lax.pmean`` under shard_map /
plain mean single-device) so every chain shares one adapted step size.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .dual_averaging import da_final, da_init, da_update


class HMCConfig(NamedTuple):
    step_size: float = 0.1
    n_leapfrog: int = 16
    n_warmup: int = 200
    n_samples: int = 500
    target_accept: float = 0.8
    adapt_mass: bool = True


def _leapfrog(logjoint_grad, z, p, step_size, n_steps, inv_mass):
    def body(carry, _):
        z, p = carry
        g = logjoint_grad(z)[1]
        p_half = p + 0.5 * step_size * g
        z_new = z + step_size * inv_mass * p_half
        g_new = logjoint_grad(z_new)[1]
        p_new = p_half + 0.5 * step_size * g_new
        return (z_new, p_new), None

    (z, p), _ = jax.lax.scan(body, (z, p), None, length=n_steps)
    return z, p


def _kinetic(p, inv_mass):
    return 0.5 * jnp.sum(inv_mass * p ** 2)


def hmc_sample(
    key: jax.Array,
    logjoint: Callable[[jnp.ndarray], jnp.ndarray],
    z0: jnp.ndarray,
    cfg: HMCConfig = HMCConfig(),
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, dict]:
    """Single-chain HMC; vmap over the leading axis of z0/key for chains.

    Returns (samples (n_samples, *z.shape), info dict with accept_prob,
    adapted step_size, inv_mass).  ``axis_name``: set when running under
    shard_map to pmean the adaptation statistics across devices.
    """
    vg = jax.value_and_grad(logjoint)
    logjoint_grad = lambda z: vg(z)

    def cross_chain_mean(x):
        if axis_name is None:
            return x
        # apply vmap/mesh axes one at a time (a joint pmean over a vmap axis
        # and a shard_map axis trips varying-state checks)
        names = axis_name if isinstance(axis_name, tuple) else (axis_name,)
        for name in names:
            x = jax.lax.pmean(x, name)
        return x

    def one_step(z, key, step_size, inv_mass):
        k_mom, k_acc = jax.random.split(key)
        p = jax.random.normal(k_mom, z.shape) / jnp.sqrt(inv_mass)
        logp0 = logjoint(z)
        h0 = -logp0 + _kinetic(p, inv_mass)
        z_new, p_new = _leapfrog(logjoint_grad, z, p, step_size,
                                 cfg.n_leapfrog, inv_mass)
        h1 = -logjoint(z_new) + _kinetic(p_new, inv_mass)
        log_accept = jnp.minimum(0.0, h0 - h1)
        accept_prob = jnp.exp(jnp.where(jnp.isfinite(log_accept),
                                        log_accept, -jnp.inf))
        accept = jax.random.uniform(k_acc) < accept_prob
        z_out = jnp.where(accept, z_new, z)
        return z_out, accept_prob

    # ---- warmup: dual averaging (+ diagonal mass from warmup variance) ----
    da0 = da_init(cfg.step_size)
    inv_mass0 = jnp.ones_like(z0)

    def warmup_body(carry, key):
        z, da, w_sum, w2_sum, n = carry
        step_size = jnp.exp(da.log_step)
        z, accept_prob = one_step(z, key, step_size, inv_mass0)
        da = da_update(da, cross_chain_mean(accept_prob),
                       target=cfg.target_accept)
        return (z, da, w_sum + z, w2_sum + z ** 2, n + 1), accept_prob

    keys = jax.random.split(key, cfg.n_warmup + cfg.n_samples + 1)
    (z, da, w_sum, w2_sum, n), warm_acc = jax.lax.scan(
        warmup_body, (z0, da0, jnp.zeros_like(z0), jnp.zeros_like(z0), 0.0),
        keys[:cfg.n_warmup])
    step_size = da_final(da)
    if cfg.adapt_mass:
        var = cross_chain_mean(w2_sum / n - (w_sum / n) ** 2)
        inv_mass = jnp.maximum(var, 1e-3)  # inv mass = posterior variance
    else:
        inv_mass = inv_mass0

    # ---- sampling ----
    def sample_body(z, key):
        z, accept_prob = one_step(z, key, step_size, inv_mass)
        return z, (z, accept_prob)

    z, (samples, acc) = jax.lax.scan(sample_body, z,
                                     keys[cfg.n_warmup:-1])
    info = {
        "accept_prob": jnp.mean(acc),
        "warmup_accept_prob": jnp.mean(warm_acc),
        "step_size": step_size,
        "inv_mass": inv_mass,
    }
    return samples, info


def hmc_sample_batch(key, logjoint_batch, z0_chains,
                     cfg: HMCConfig = HMCConfig()):
    """Multi-chain HMC where chains ride the target's BATCH axis.

    ``logjoint_batch(z (C, ...)) -> (C,)``: one fused evaluation for all
    chains (e.g. logjoint.make_utterance_logjoint_batched routes chains
    through the decoder batch dim, filling the MXU tile).  Acceptance is
    per-chain; dual-averaging / mass adaptation share statistics across
    chains.  Returns (samples (n_samples, C, ...), info).
    """
    C = z0_chains.shape[0]
    chain_axes = tuple(range(1, z0_chains.ndim))

    def total_lj(z):
        return jnp.sum(logjoint_batch(z))

    grad_fn = jax.grad(total_lj)  # per-chain grads (chains are independent)

    def kinetic(p, inv_mass):
        return 0.5 * jnp.sum(inv_mass * p ** 2, axis=chain_axes)

    def leapfrog(z, p, step_size, inv_mass):
        def body(carry, _):
            z, p = carry
            p_half = p + 0.5 * step_size * grad_fn(z)
            z_new = z + step_size * inv_mass * p_half
            p_new = p_half + 0.5 * step_size * grad_fn(z_new)
            return (z_new, p_new), None
        (z, p), _ = jax.lax.scan(body, (z, p), None, length=cfg.n_leapfrog)
        return z, p

    def one_step(z, key, step_size, inv_mass):
        k_mom, k_acc = jax.random.split(key)
        p = jax.random.normal(k_mom, z.shape) / jnp.sqrt(inv_mass)
        h0 = -logjoint_batch(z) + kinetic(p, inv_mass)
        z_new, p_new = leapfrog(z, p, step_size, inv_mass)
        h1 = -logjoint_batch(z_new) + kinetic(p_new, inv_mass)
        log_accept = jnp.minimum(0.0, h0 - h1)                      # (C,)
        accept_prob = jnp.exp(jnp.where(jnp.isfinite(log_accept),
                                        log_accept, -jnp.inf))
        accept = jax.random.uniform(k_acc, (C,)) < accept_prob
        mask = accept.reshape((C,) + (1,) * len(chain_axes))
        return jnp.where(mask, z_new, z), accept_prob

    da0 = da_init(cfg.step_size)
    inv_mass0 = jnp.ones_like(z0_chains[0])

    def make_warmup_body(inv_mass):
        def warmup_body(carry, key):
            z, da, w_sum, w2_sum, n = carry
            z, acc = one_step(z, key, jnp.exp(da.log_step), inv_mass)
            da = da_update(da, jnp.mean(acc), target=cfg.target_accept)
            return (z, da, w_sum + z, w2_sum + z ** 2, n + 1), acc
        return warmup_body

    keys = jax.random.split(key, cfg.n_warmup + cfg.n_samples + 1)
    if cfg.adapt_mass:
        # Windowed warmup (Stan-style): phase 1 dual-averages the step size
        # under the identity metric while collecting posterior moments;
        # the diagonal inverse mass is set from the pooled cross-chain
        # variance; phase 2 then RE-adapts the step size under the new
        # metric (a step size tuned for the identity mass is wrong once the
        # metric changes — the r4 sweep's flat ESS came from exactly that).
        n1 = cfg.n_warmup // 2
        (z, da, w_sum, w2_sum, n), warm_acc1 = jax.lax.scan(
            make_warmup_body(inv_mass0),
            (z0_chains, da0, jnp.zeros_like(z0_chains),
             jnp.zeros_like(z0_chains), 0.0), keys[:n1])
        var = jnp.mean(w2_sum / n - (w_sum / n) ** 2, axis=0)
        inv_mass = jnp.maximum(var, 1e-3)
        da1 = da_init(da_final(da))
        (z, da, _, _, _), warm_acc2 = jax.lax.scan(
            make_warmup_body(inv_mass),
            (z, da1, jnp.zeros_like(z), jnp.zeros_like(z), 0.0),
            keys[n1:cfg.n_warmup])
        warm_acc = jnp.concatenate([warm_acc1, warm_acc2])
        step_size = da_final(da)
    else:
        (z, da, w_sum, w2_sum, n), warm_acc = jax.lax.scan(
            make_warmup_body(inv_mass0),
            (z0_chains, da0, jnp.zeros_like(z0_chains),
             jnp.zeros_like(z0_chains), 0.0), keys[:cfg.n_warmup])
        step_size = da_final(da)
        inv_mass = inv_mass0

    def sample_body(z, key):
        z, acc = one_step(z, key, step_size, inv_mass)
        return z, (z, acc)

    z, (samples, acc) = jax.lax.scan(sample_body, z, keys[cfg.n_warmup:-1])
    info = {
        "accept_prob": jnp.mean(acc),
        "warmup_accept_prob": jnp.mean(warm_acc),
        "step_size": step_size,
        "inv_mass": inv_mass,
    }
    return samples, info


def hmc_sample_chains(key, logjoint, z0_chains, cfg: HMCConfig = HMCConfig(),
                      shared_adaptation: bool = True):
    """vmapped multi-chain HMC on one device: z0_chains (C, *shape).
    With shared_adaptation, the dual-averaging/mass statistics are averaged
    over all chains (vmap axis) so they share one schedule."""
    keys = jax.random.split(key, z0_chains.shape[0])
    axis = "chains" if shared_adaptation else None
    return jax.vmap(lambda k, z: hmc_sample(k, logjoint, z, cfg, axis_name=axis),
                    axis_name="chains")(keys, z0_chains)


def hmc_sample_sharded(mesh, key, logjoint, z0_chains,
                       cfg: HMCConfig = HMCConfig()):
    """Chains sharded over the dp mesh axis via shard_map.  Dual-averaging and
    mass adaptation statistics are pmean'd over BOTH the intra-device vmap
    axis and the cross-device dp axis, so every chain in the fleet shares one
    adapted schedule (pmean over ICI — SURVEY.md §2.3)."""
    from jax.sharding import PartitionSpec as P

    n_chains = z0_chains.shape[0]
    keys = jax.random.split(key, n_chains)

    def local(keys, z0s):
        def per_chain(k, z):
            return hmc_sample(k, logjoint, z, cfg,
                              axis_name=("chains", "dp"))
        samples, info = jax.vmap(per_chain, axis_name="chains")(keys, z0s)
        info = {k: jax.lax.pmean(v, "dp") for k, v in info.items()}
        return samples, info

    # check_vma=False: jax 0.9's varying-manual-axes checker rejects pmean
    # over the mesh axis from inside vmap; the collective itself is fine
    fn = jax.shard_map(local, mesh=mesh, in_specs=(P("dp"), P("dp")),
                       out_specs=(P("dp"), P()), check_vma=False)
    # multi-process mesh (launch_multihost): inputs must be GLOBAL arrays —
    # each process contributes its addressable shards of the same host value
    if not all(d.process_index == jax.process_index()
               for d in mesh.devices.flat):
        from jax.sharding import NamedSharding

        from ..parallel.mesh import _put_global

        sh = NamedSharding(mesh, P("dp"))
        keys = _put_global(jax.device_get(keys), sh)
        z0_chains = _put_global(jax.device_get(z0_chains), sh)
    return fn(keys, z0_chains)
