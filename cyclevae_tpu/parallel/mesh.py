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

import os
import zlib
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


def _put_global(value, sharding: NamedSharding):
    """Place a host value under a sharding that may span processes.

    Single-process (all mesh devices addressable): plain ``device_put``.
    Multi-process: every process holds the SAME host value (the recipe's
    data loading is deterministic per epoch — the loader seeds numpy from
    the checkpointed RNG state identically on every process), so each
    contributes its local shards via ``make_array_from_callback`` —
    ``device_put`` cannot target non-addressable devices.

    The same-host-value invariant is load-bearing: a per-process RNG or
    file-ordering divergence would silently assemble an inconsistent global
    array.  Set ``CYCLEVAE_VERIFY_GLOBAL=1`` to cross-check a CRC of the
    host bytes across processes on every placement (costs one tiny
    all-gather; meant for bring-up of new loaders/clusters, not steady
    state).
    """
    if sharding.is_fully_addressable:
        return jax.device_put(value, sharding)
    host = np.asarray(value)
    if os.environ.get("CYCLEVAE_VERIFY_GLOBAL") == "1":
        _verify_same_across_processes(host)
    return jax.make_array_from_callback(host.shape, sharding,
                                        lambda idx: host[idx])


def _verify_same_across_processes(host: np.ndarray) -> None:
    """Assert every process holds byte-identical host data (CRC all-gather)."""
    from jax.experimental import multihost_utils

    digest = np.uint32(zlib.crc32(np.ascontiguousarray(host).tobytes()))
    digests = multihost_utils.process_allgather(digest)
    if not (digests == digests[0]).all():
        raise AssertionError(
            "global-array invariant violated: host value differs across "
            f"processes (crc32 per process: {digests.tolist()}) — the "
            "loader produced divergent data; check per-process RNG seeding "
            "and file ordering")


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (e.g. params) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda v: _put_global(v, sharding), tree)


def batch_spec(ndim: int) -> P:
    """PartitionSpec for a batch array: the utterance/chain/particle axis is
    sharded on ``dp``.  That axis is axis 0 for 1-3D arrays but axis 1 for the
    4-D many-to-many per-cycle arrays (n_cyc, B, T, D) — n_cyc (typically 2)
    rarely divides the device count, and it is not the data axis anyway."""
    return P(None, "dp") if ndim == 4 else P("dp")


def shard_batch(mesh: Mesh, batch: Dict):
    """Shard batch-like arrays along their utterance/chain/particle axis over
    ``dp`` (ndim-aware, see batch_spec; multi-process-safe, see _put_global)."""
    return {k: _put_global(v, NamedSharding(mesh, batch_spec(np.ndim(v))))
            for k, v in batch.items()}


def make_sharded_train_step(cfg, optimizer, seg_len: int, n_segs: int,
                            mesh: Mesh):
    """DP-sharded version of vi.train.make_train_step.

    Parameters/optimizer state are replicated; the utterance batch is sharded
    on ``dp``.  The per-segment loss sums over utterances, so XLA inserts the
    cross-device psum automatically; every device applies identical Adam
    updates (gradients are reduced before the update inside jit).
    """
    from ..vi.train import build_step_fn

    # The step body is EXACTLY the single-device one (vi.train.build_step_fn).
    # Shardings are enforced with in-graph constraints rather than trusting
    # the caller to have committed the inputs via replicate()/shard_batch():
    # a host numpy batch would otherwise silently run fully replicated.
    # Constraints are ndim-aware (4-D many-to-many arrays shard axis 1); the
    # per-segment loss sums over utterances, so XLA inserts the cross-device
    # psum automatically; every device applies identical Adam updates.
    step = build_step_fn(cfg, optimizer, seg_len, n_segs)
    repl = NamedSharding(mesh, P())

    def sharded_step(ts, batch):
        ts = jax.lax.with_sharding_constraint(ts, repl)
        batch = {
            k: jax.lax.with_sharding_constraint(
                v, NamedSharding(mesh, batch_spec(np.ndim(v))))
            for k, v in batch.items()
        }
        return step(ts, batch)

    return jax.jit(sharded_step, donate_argnums=(0,))
