#!/usr/bin/env python
"""Multi-host launch helper.

Replaces the reference's Kaldi dispatchers (src/utils/run.pl, slurm.pl +
conf/slurm.conf — SURVEY.md §2.3 "multi-node scheduling"): instead of shell
job arrays with the filesystem as data plane, the TPU framework runs ONE SPMD
program per host.  This wrapper initializes jax.distributed from standard
cluster environment variables and execs the recipe; under Slurm:

    srun --ntasks-per-node=1 python tools/launch_multihost.py \
         -m cyclevae_tpu --stage 4 --work /shared/work

On Cloud TPU pods, `jax.distributed.initialize()` auto-detects the slice
topology and this wrapper is a no-op passthrough.
"""

import os
import runpy
import sys


def main():
    import jax

    # Force a platform before the backend initializes (the axon TPU plugin
    # ignores the JAX_PLATFORMS env var — this is the documented escape
    # hatch, same contract as cyclevae_tpu.enable_compilation_cache).
    platform = os.environ.get("CYCLEVAE_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
        if platform == "cpu":
            # cross-process CPU collectives need the gloo transport
            jax.config.update("jax_cpu_collectives_implementation", "gloo")

    kwargs = {}
    # Explicit convention (non-Slurm clusters, smoke tests)
    if "CYCLEVAE_NUM_PROCESSES" in os.environ:
        n = int(os.environ["CYCLEVAE_NUM_PROCESSES"])
        if n > 1:
            if "CYCLEVAE_PROCESS_ID" not in os.environ:
                raise SystemExit(
                    "CYCLEVAE_NUM_PROCESSES=%d requires CYCLEVAE_PROCESS_ID "
                    "(0..%d) to be set for each process; optional: "
                    "CYCLEVAE_COORDINATOR (default 127.0.0.1), "
                    "CYCLEVAE_PORT (default 8476)" % (n, n - 1))
            pid = int(os.environ["CYCLEVAE_PROCESS_ID"])
            if not 0 <= pid < n:
                raise SystemExit(
                    "CYCLEVAE_PROCESS_ID=%d out of range for "
                    "CYCLEVAE_NUM_PROCESSES=%d" % (pid, n))
            coord = os.environ.get("CYCLEVAE_COORDINATOR", "127.0.0.1")
            kwargs = dict(
                coordinator_address=f"{coord}:{os.environ.get('CYCLEVAE_PORT', '8476')}",
                num_processes=n,
                process_id=pid,
            )
    # Slurm convention -> jax.distributed
    elif "SLURM_JOB_NUM_NODES" in os.environ and "SLURM_PROCID" in os.environ:
        n = int(os.environ["SLURM_JOB_NUM_NODES"])
        if n > 1:
            nodelist = os.environ.get("SLURM_JOB_NODELIST", "")
            coord = os.environ.get("CYCLEVAE_COORDINATOR",
                                   nodelist.split(",")[0].split("[")[0])
            kwargs = dict(
                coordinator_address=f"{coord}:{os.environ.get('CYCLEVAE_PORT', '8476')}",
                num_processes=n,
                process_id=int(os.environ["SLURM_PROCID"]),
            )
    jax.distributed.initialize(**kwargs)
    print(f"[launch_multihost] process {jax.process_index()}/{jax.process_count()}"
          f" local devices: {jax.local_device_count()}"
          f" global devices: {jax.device_count()}")

    # exec the requested module/script with the remaining argv
    argv = sys.argv[1:]
    if argv and argv[0] == "-m":
        mod = argv[1]
        sys.argv = [mod] + argv[2:]
        runpy.run_module(mod, run_name="__main__")
    elif argv:
        sys.argv = argv
        runpy.run_path(argv[0], run_name="__main__")
    else:
        print("usage: launch_multihost.py -m <module> [args...] | <script> [args...]")
        sys.exit(2)


if __name__ == "__main__":
    main()
