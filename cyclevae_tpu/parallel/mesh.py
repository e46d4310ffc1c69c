"""Device mesh + sharding rules.

The reference has NO in-process distribution: its multi-node story is Kaldi
shell dispatch (run.pl/slurm.pl, SURVEY.md §2.3) with the filesystem as data
plane.  The TPU-native replacement is one SPMD program over a
``jax.sharding.Mesh``:

  * the data-parallel axis ``dp`` shards the *batch-like* dimensions —
    utterances during VI training, chains for HMC, particles for SMC;
  * model parameters are replicated (a 1024-unit GRU needs no TP/PP);
  * reductions (loss sums, metric means, adaptation stats, resampling
    weights) become XLA collectives inserted automatically by jit over
    NamedSharding inputs, riding ICI.

Multi-host: call ``jax.distributed.initialize()`` before building the mesh;
the same code then spans hosts (each host feeds its local shard).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_dp: Optional[int] = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first n_dp devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_dp is None:
        n_dp = len(devices)
    return Mesh(np.array(devices[:n_dp]), axis_names=("dp",))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (e.g. params) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh: Mesh, batch: Dict):
    """Shard batch-like arrays along their leading (utterance/chain/particle)
    axis over ``dp``."""
    sharding = NamedSharding(mesh, P("dp"))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def make_sharded_train_step(cfg, optimizer, seg_len: int, n_segs: int,
                            mesh: Mesh):
    """DP-sharded version of vi.train.make_train_step.

    Parameters/optimizer state are replicated; the utterance batch is sharded
    on ``dp``.  The per-segment loss sums over utterances, so XLA inserts the
    cross-device psum automatically; every device applies identical Adam
    updates (gradients are reduced before the update inside jit).
    """
    from ..vi.train import TrainState, init_cycle_state, segment_loss
    import jax.numpy as jnp
    import optax

    repl = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("dp"))

    def step_fn(ts: TrainState, batch: Dict):
        B = batch["feats"].shape[0]
        T = n_segs * seg_len
        frame_idx = jnp.arange(T)
        mask_full = (frame_idx[None, :] < batch["flens"][:, None]).astype(
            batch["feats"].dtype)

        def to_segs(x):
            if x.ndim == 4:  # (n_cyc, B, T, D) per-cycle many-to-many arrays
                xr = x[:, :, :T].reshape(x.shape[0], x.shape[1], n_segs,
                                         seg_len, x.shape[3])
                return jnp.moveaxis(xr, 2, 0)
            x = x[:, :T]
            return x.reshape(x.shape[0], n_segs, seg_len, *x.shape[2:]).swapaxes(0, 1)

        segs = {
            "feats": to_segs(batch["feats"]),
            "src_code": to_segs(batch["src_code"]),
            "trg_code": to_segs(batch["trg_code"]),
            "cv_excit": to_segs(batch["cv_excit"]),
            "mask": to_segs(mask_full),
        }
        state0 = init_cycle_state(cfg, ts.params, B)

        def seg_step(carry, seg):
            params, opt_state, cyc_state, rng = carry
            rng, k_seg = jax.random.split(rng)
            cyc_state = jax.tree_util.tree_map(jax.lax.stop_gradient, cyc_state)
            (loss, (new_cyc_state, metrics)), grads = jax.value_and_grad(
                segment_loss, has_aux=True)(params, cfg, k_seg, seg, cyc_state, True)
            updates, new_opt = optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return (new_params, new_opt, new_cyc_state, rng), metrics

        (params, opt_state, _, rng), metrics = jax.lax.scan(
            seg_step, (ts.params, ts.opt_state, state0, ts.rng), segs)
        return TrainState(params, opt_state, rng, ts.step + 1), metrics

    # params/opt keep their (replicated) placement from `replicate`; the batch
    # is constrained to the utterance-axis dp sharding
    del repl
    return jax.jit(
        step_fn,
        in_shardings=(None, {k: dp for k in
                             ("feats", "src_code", "trg_code", "cv_excit", "flens")}),
        donate_argnums=(0,),
    )
