"""Checkpoint / resume with full RNG state.

Reference contract (train…py:152-167): every epoch persist encoder+decoder
params, optimizer state, numpy + framework RNG state, and the epoch counter —
resume reproduces the exact training trajectory.  Here: params/opt-state
pytrees (numpy-ified), the JAX PRNG key, the numpy Generator state, and the
epoch index, pickled to ``checkpoint-<epoch>.pkl``.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(checkpoint_dir: str, params, opt_state, jax_key,
                    np_rng: np.random.Generator, epoch: int,
                    name: Optional[str] = None) -> str:
    os.makedirs(checkpoint_dir, exist_ok=True)
    ckpt = {
        "params": _to_numpy(params),
        "opt_state": _to_numpy(opt_state),
        "jax_key": np.asarray(jax_key),
        "np_rng_state": np_rng.bit_generator.state,
        "epoch": epoch,
    }
    path = os.path.join(checkpoint_dir, name or f"checkpoint-{epoch}.pkl")
    # atomic: rolling checkpoints (checkpoint-latest.pkl) are overwritten in
    # place every epoch — a crash mid-write must not corrupt the resume point
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(ckpt, f)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


def latest_checkpoint(checkpoint_dir: str) -> str:
    """Path of the newest checkpoint: ``checkpoint-latest.pkl`` if the
    trainer maintains one, else the highest-numbered ``checkpoint-<N>.pkl``."""
    rolling = os.path.join(checkpoint_dir, "checkpoint-latest.pkl")
    if os.path.exists(rolling):
        return rolling
    epochs = [int(f[len("checkpoint-"):-len(".pkl")])
              for f in os.listdir(checkpoint_dir)
              if f.startswith("checkpoint-") and f.endswith(".pkl")
              and f[len("checkpoint-"):-len(".pkl")].isdigit()]
    if not epochs:
        raise FileNotFoundError(f"no checkpoints in {checkpoint_dir}")
    return os.path.join(checkpoint_dir, f"checkpoint-{max(epochs)}.pkl")


def restore_np_rng(state) -> np.random.Generator:
    rng = np.random.default_rng()
    rng.bit_generator.state = state
    return rng
