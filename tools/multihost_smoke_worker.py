"""Worker for the 2-process jax.distributed smoke test.

Launched (once per process) by tools/launch_multihost.py — which has already
called ``jax.distributed.initialize`` — this runs ONE DP-sharded train step
over the GLOBAL device mesh (devices spanning both processes) and prints the
summed loss.  The test asserts both processes print the same value, proving
the multi-host launch path end-to-end: env-var wiring -> distributed init ->
global mesh -> cross-process collectives (gloo on CPU; ICI on a real slice)
-> identical replicated results.

Replaces what the reference could only smoke-test via Slurm shell dispatch
(src/utils/slurm.pl, egs/one-to-one/cmd.sh:14-20).
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def main():
    from cyclevae_tpu.parallel import (
        make_mesh, make_sharded_train_step, replicate, shard_batch)
    from cyclevae_tpu.vi.train import (
        CycleVAEConfig, TrainState, init_cyclevae, make_optimizer)

    assert jax.process_count() >= 2, "expected a multi-process launch"
    mesh = make_mesh()  # ALL global devices, across processes

    cfg = CycleVAEConfig(hidden_units=32, n_cyc=2)
    B, seg, n_segs = len(jax.devices()), 16, 2
    T = seg * n_segs
    rng = np.random.default_rng(0)
    t = np.arange(T)[None, :, None]
    feats = (np.sin(t * 0.05 + np.arange(54)[None, None, :])
             + 0.1 * rng.normal(size=(B, T, 54))).astype(np.float32)
    batch = {
        "feats": feats,
        "src_code": np.tile([1.0, 0.0], (B, T, 1)).astype(np.float32),
        "trg_code": np.tile([0.0, 1.0], (B, T, 1)).astype(np.float32),
        "cv_excit": feats[..., :4],
        "flens": np.asarray([T] * B, dtype=np.int32),
    }

    params = init_cyclevae(jax.random.PRNGKey(0), cfg,
                           np.zeros(54, np.float32), np.ones(54, np.float32))
    opt = make_optimizer(cfg, lr=1e-4)
    ts = TrainState(replicate(mesh, params),
                    replicate(mesh, opt.init(params)),
                    replicate(mesh, jax.random.PRNGKey(7)),
                    replicate(mesh, jnp.zeros((), jnp.int32)))
    step = make_sharded_train_step(cfg, opt, seg, n_segs, mesh)
    with mesh:
        ts, metrics = step(ts, shard_batch(mesh, batch))
    loss = float(jnp.sum(metrics["loss"]))
    print(f"SMOKE_OK proc={jax.process_index()}/{jax.process_count()} "
          f"devices={jax.device_count()} loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
