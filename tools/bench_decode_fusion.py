"""A/B bench for the fused stage-5/6 device path (VERDICT r1 weak #7).

Measures the device time of one decode pair's 3-direction fan-out two ways:
  sequential — 3 separate jitted AR decodes (the reference's structure,
               decode_gru-cyclevae_gauss.py:309-323: one forward per
               direction) + per-call posterior-mean encode
  fused      — ONE batched encode_mean + ONE 3-row batched decode
               (pipeline/decode.device_decode_pair)

Timing: K repeats with one sync at the end, minus the fixed ~26 ms tunnel
round trip per synced call (utils/profiling.py methodology).

Usage:  python tools/bench_decode_fusion.py <checkpoint.pkl> <model.json>
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(ckpt_path: str, model_json: str, T: int = 600, K: int = 10):
    import jax
    import jax.numpy as jnp

    from cyclevae_tpu import enable_compilation_cache
    enable_compilation_cache()
    from cyclevae_tpu.pipeline.decode import Codec, _speaker_codes, \
        device_decode_pair
    from cyclevae_tpu.pipeline.train_stage import model_config
    from cyclevae_tpu.utils.config import load_config
    from cyclevae_tpu.vi.checkpoint import load_checkpoint
    from cyclevae_tpu.vi.train import CycleVAEParams

    exp = load_config(model_json)
    ckpt = load_checkpoint(ckpt_path)
    params = CycleVAEParams(*jax.tree_util.tree_map(jnp.asarray,
                                                    ckpt["params"]))
    cfg = model_config(exp)
    codec = Codec(params, cfg)

    # MEASURE the per-sync round trip rather than assuming the historical
    # 26 ms: tunnel sessions vary (a reattached terminal measured 0.1 ms),
    # and with 8 synced calls per sequential pair a stale constant
    # over-subtracts ~200 ms and flips the A/B verdict.
    from bench import measure_rtt
    rtt = measure_rtt(jax, jnp)
    rng = np.random.default_rng(0)
    feat = rng.normal(size=(T, cfg.in_dim)).astype(np.float32)
    feat_trg = rng.normal(size=(T - 40, cfg.in_dim)).astype(np.float32)
    key = jax.random.PRNGKey(0)

    # --- fused path (current production path) ---
    device_decode_pair(codec, key, feat, feat_trg)        # warmup/compile
    t0 = time.time()
    for _ in range(K):
        out = device_decode_pair(codec, key, feat, feat_trg)
    _ = np.asarray(out[2])
    # each device_decode_pair makes 3 synced host fetches: encode_mean pulls
    # lat and z separately (decode.py:175) and decode_batch pulls the stack
    fused = max((time.time() - t0) / K - 3 * rtt, 1e-9)

    # --- sequential path (reference structure) ---
    def seq_pair():
        lat_s = codec.encode(feat)
        z_s = codec.latent_mean(key, lat_s)
        lat_t = codec.encode(feat_trg)
        z_t = codec.latent_mean(key, lat_t)
        a = codec.decode(_speaker_codes(T, cfg.n_spk, 1), z_s)
        b = codec.decode(_speaker_codes(T, cfg.n_spk, 0), z_s)
        c = codec.decode(_speaker_codes(T - 40, cfg.n_spk, 1), z_t)
        return a, b, c

    seq_pair()                                            # warmup/compile
    t0 = time.time()
    for _ in range(K):
        a, b, c = seq_pair()
    # 7 synced fetches: 2 encode + 2 latent_mean + 3 decode (one np.asarray
    # each, decode.py:141-153)
    seq = max((time.time() - t0) / K - 7 * rtt, 1e-9)

    print(json.dumps({
        "metric": "stage6_device_path_ms_per_pair",
        "fused_ms": round(fused * 1e3, 1),
        "sequential_ms": round(seq * 1e3, 1),
        "speedup": round(seq / fused, 2),
        "frames": T,
    }))


if __name__ == "__main__":
    main(*sys.argv[1:3])
