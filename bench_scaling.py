"""Scaling-efficiency report: sharded-chain HMC samples/s at 1..N devices.

BASELINE.json north star: ">=80% linear samples/s scaling from 1 host to N
hosts".  Real multi-chip hardware is unavailable in this environment, so by
default this measures WEAK scaling on the virtual CPU mesh (chains per device
held constant, devices 1 -> N; run with
``XLA_FLAGS=--xla_force_host_platform_device_count=8`` which this script sets
up-front).  On a real slice, run with JAX_PLATFORMS unset after
``jax.distributed.initialize()`` — the code path is identical
(parallel.make_mesh + infer.hmc.hmc_sample_sharded).

Writes BENCH_SCALING.json: per-device-count samples/s and efficiency vs the
single-device rate.
"""

import json
import os
import time

if __name__ == "__main__":
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")

import numpy as np


def main():
    import jax
    if os.environ.get("CYCLEVAE_SCALING_CPU", "1") == "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cyclevae_tpu.infer.hmc import HMCConfig, hmc_sample_sharded
    from cyclevae_tpu.infer.logjoint import make_gaussian_logjoint
    from cyclevae_tpu.parallel import make_mesh

    dim = 64
    mean = jnp.zeros(dim)
    cov = jnp.ones(dim)
    lj = make_gaussian_logjoint(mean, cov)
    cfg = HMCConfig(step_size=0.2, n_leapfrog=16, n_warmup=50, n_samples=200)
    chains_per_device = 4

    n_dev_all = [n for n in (1, 2, 4, 8) if n <= len(jax.devices())]
    results = {}
    base_rate = None
    for n_dev in n_dev_all:
        mesh = make_mesh(n_dev)
        C = chains_per_device * n_dev
        z0 = jnp.zeros((C, dim))
        # warmup compile
        s, info = hmc_sample_sharded(mesh, jax.random.PRNGKey(0), lj, z0, cfg)
        jax.block_until_ready(s)
        t0 = time.time()
        s, info = hmc_sample_sharded(mesh, jax.random.PRNGKey(1), lj, z0, cfg)
        jax.block_until_ready(s)
        dt = time.time() - t0
        total = C * (cfg.n_warmup + cfg.n_samples)
        rate = total / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * n_dev)
        results[str(n_dev)] = {"samples_per_sec": round(rate, 1),
                               "efficiency": round(eff, 3)}
        print(f"devices={n_dev}: {rate:.0f} samples/s, "
              f"efficiency={eff:.2%}")

    with open("BENCH_SCALING.json", "w") as f:
        json.dump({"metric": "hmc_samples_per_sec_weak_scaling",
                   "chains_per_device": chains_per_device,
                   "platform": jax.devices()[0].platform,
                   "results": results}, f, indent=2)


if __name__ == "__main__":
    main()
