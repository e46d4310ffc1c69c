"""Pallas TPU kernel: WaveRNN autoregressive sampling loop.

The vocoder sampling loop (one mu-law sample per step through a GRU +
softmax head) is the canonical "WaveNet-like sampling loop" workload
(BASELINE.json config 5).  Per-chip speed-of-light needs:

  * weights VMEM-resident across the whole loop (w_hh is 896x2688),
  * the previous-sample embedding FUSED into a (256, 3H) gate-table row
    gather — no matmul on the feedback path,
  * on-chip PRNG (pltpu.prng_random_bits) for Gumbel-max categorical
    sampling without any host round trip or per-step RNG streaming,
  * conditioning gates streamed per step as (1, 3H) blocks.

The grid is the time axis (sequential on TPU); batch B rides the sublane
dimension.  Parity reference: models.wavernn.generate_xla (temperature=0
greedy mode matches exactly; sampled mode matches in distribution).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(seed_ref, cond_gates_ref, emb_tab_ref, whh_ref, bhh_ref,
            w1_ref, b1_ref, w2_ref, b2_ref, temp_ref,
            out_ref, h_s, idx_s, *, hidden: int, n_classes: int, T: int,
            B: int):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        pltpu.prng_seed(seed_ref[0])
        h_s[:] = jnp.zeros_like(h_s)
        idx_s[:] = jnp.full_like(idx_s, n_classes // 2)

    h = h_s[:]
    # feedback path: one-hot(idx) @ gate-table — a (B, K)@(K, 3H) MXU matmul
    # (vector gathers are unsupported in Pallas TPU; the one-hot contraction
    # is cheap relative to the (B, H)@(H, 3H) recurrence matmul)
    idx = idx_s[:]                                    # (B, 1) int32
    classes = jax.lax.broadcasted_iota(jnp.int32, (B, n_classes), 1)
    onehot = (classes == idx).astype(jnp.float32)     # (B, K)
    emb_rows = jnp.dot(onehot, emb_tab_ref[:],
                       preferred_element_type=jnp.float32)
    gx = cond_gates_ref[0] + emb_rows
    gh = jnp.dot(h, whh_ref[:], preferred_element_type=jnp.float32) + bhh_ref[:]
    r = jax.nn.sigmoid(gx[:, :hidden] + gh[:, :hidden])
    z = jax.nn.sigmoid(gx[:, hidden:2 * hidden] + gh[:, hidden:2 * hidden])
    n = jnp.tanh(gx[:, 2 * hidden:] + r * gh[:, 2 * hidden:])
    h_new = (1.0 - z) * n + z * h

    f = jnp.maximum(jnp.dot(h_new, w1_ref[:],
                            preferred_element_type=jnp.float32) + b1_ref[:], 0.0)
    logits = jnp.dot(f, w2_ref[:],
                     preferred_element_type=jnp.float32) + b2_ref[:]

    # Gumbel-max categorical sampling with on-chip PRNG.  prng_random_bits
    # yields SIGNED int32: mask to the low 23 bits (non-negative) before the
    # float cast — an arithmetic shift would make half the uniforms negative,
    # log(u) would go NaN and the argmax would be decided by the NaN pattern
    # alone, ignoring the logits.  (Mosaic supports int32->f32 but not
    # uint32->f32, hence the mask rather than a bitcast.)
    bits = pltpu.prng_random_bits((B, n_classes))
    u = (bits & 0x7fffff).astype(jnp.float32) * (1.0 / (1 << 23))  # [0, 1)
    gumbel = -jnp.log(-jnp.log(u + 1e-9) + 1e-9)
    temp = temp_ref[0]
    scores = jnp.where(temp > 0.0, logits / jnp.maximum(temp, 1e-6) + gumbel,
                       logits)
    new_idx = jnp.argmax(scores, axis=-1).astype(jnp.int32)  # (B,)

    out_ref[0] = new_idx[:, None]
    idx_s[:] = new_idx[:, None]
    h_s[:] = h_new


def pallas_wavernn_generate(
    params: Dict,
    cfg,
    cond: jnp.ndarray,          # (B, T, cond_dim)
    seed: int,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """Generate mu-law sample indices (B, T) for all steps in one kernel."""
    from ..models.wavernn import embed_gate_table

    B, T, _ = cond.shape
    H = cfg.hidden_units
    K = cfg.n_classes
    threeH = 3 * H

    emb_tab = embed_gate_table(params)                       # (K, 3H)
    w_cond = params["gru"]["w_ih"][:, cfg.embed_dim:]
    cond_gates = cond @ w_cond.T + params["gru"]["b_ih"]     # (B, T, 3H)
    cond_gates_t = jnp.swapaxes(cond_gates, 0, 1)            # (T, B, 3H)

    grid_spec = pl.GridSpec(
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # seed (1,)
            pl.BlockSpec((1, B, threeH), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, threeH), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, threeH), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, threeH), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, cfg.fc_dim), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cfg.fc_dim), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.fc_dim, K), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),           # temperature (1,)
        ],
        out_specs=[
            pl.BlockSpec((1, B, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, 1), jnp.int32),
        ],
    )
    kernel = functools.partial(_kernel, hidden=H, n_classes=K, T=T, B=B)
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((T, B, 1), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * (H * threeH + H * cfg.fc_dim + cfg.fc_dim * K),
            bytes_accessed=T * B * threeH * 4,
            transcendentals=3 * T * B * H,
        ),
    )(jnp.asarray([seed], jnp.int32), cond_gates_t,
      emb_tab.astype(jnp.float32),
      params["gru"]["w_hh"].T.astype(jnp.float32),
      params["gru"]["b_hh"][None].astype(jnp.float32),
      params["fc1"]["w"].T.astype(jnp.float32),
      params["fc1"]["b"][None].astype(jnp.float32),
      params["fc2"]["w"].T.astype(jnp.float32),
      params["fc2"]["b"][None].astype(jnp.float32),
      jnp.asarray([temperature], jnp.float32))
    return out[:, :, 0].T                                    # (B, T)
