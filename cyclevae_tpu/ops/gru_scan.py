"""Autoregressive GRU evaluation as ``lax.scan`` with hoisted input projections.

The reference steps the GRU one frame at a time in a Python loop, re-launching
a cuDNN GRU kernel per frame and concatenating trajectories on the fly
(reference: src/nets/gru_vae.py:376-399 — the throughput-limiting hot loop).

TPU-first redesign:
  * The conv-context part of the input-gate projection does not depend on the
    AR feedback, so we hoist it out of the recurrence: one big
    (B*T, C_conv) @ (C_conv, 3H) MXU matmul computes ``W_ih[:, :C_conv] x_t +
    b_ih`` for ALL frames at once.
  * The recurrence keeps only what is inherently sequential: the AR-feedback
    slice of the input projection (out_dim columns of w_ih), the hidden-side
    matmul, the gate nonlinearities, and the output projection that produces
    the next feedback frame.  All of it lives in one ``lax.scan`` body, which
    XLA fuses into a single compiled loop — no per-frame kernel launches.
  * Gate math follows the torch GRU cell exactly (r, z, n row order; the reset
    gate multiplies only the hidden-side candidate including its bias), so
    reference checkpoints/parity tests transfer.

Throughput therefore comes from batching (utterances x chains x particles),
never from time — matching SURVEY.md §7 "Hard parts".
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp


def precompute_input_gates(gru_layer0: Dict, conv_seq: jnp.ndarray) -> jnp.ndarray:
    """Hoisted input-side projection for layer 0: (B, T, C_conv) -> (B, T, 3H).

    Computes ``conv_seq @ w_ih[:, :C_conv].T + b_ih`` — the part of the torch
    input projection that sees the (known-ahead) conv context rather than the
    AR feedback.
    """
    c_conv = conv_seq.shape[-1]
    w_x = gru_layer0["w_ih"][:, :c_conv]  # (3H, C_conv)
    return conv_seq @ w_x.T + gru_layer0["b_ih"]


def _gru_cell(gates_x: jnp.ndarray, h: jnp.ndarray, w_hh: jnp.ndarray,
              b_hh: jnp.ndarray, hidden: int) -> jnp.ndarray:
    """One torch-semantics GRU cell step given precomputed input-side gates."""
    gates_h = h @ w_hh.T + b_hh
    r = jax.nn.sigmoid(gates_x[..., :hidden] + gates_h[..., :hidden])
    z = jax.nn.sigmoid(gates_x[..., hidden:2 * hidden] + gates_h[..., hidden:2 * hidden])
    n = jnp.tanh(gates_x[..., 2 * hidden:] + r * gates_h[..., 2 * hidden:])
    return (1.0 - z) * n + z * h


def gru_ar_scan(
    gru_layers: List[Dict],
    out_proj: Dict,
    conv_seq: jnp.ndarray,
    y0: jnp.ndarray,
    h0: jnp.ndarray,
    out_drop_mask: Optional[jnp.ndarray] = None,
    res_seq: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run the AR recurrence over a whole segment.

    Args:
      gru_layers: torch-layout GRU params (see layers.init_gru_stack).
      out_proj:   dense H -> out_dim projection (reference out_1).
      conv_seq:   (B, T, C_conv) context embeddings.
      y0:         (B, out_dim) initial AR feedback (normalized domain).
      h0:         (L, B, H) initial hidden state.
      out_drop_mask: optional (B, T, H) inverted-dropout mask applied to the GRU
        output before the projection — note the reference drops the output
        BEFORE out_1 so the AR feedback itself is dropped (gru_vae.py:376-382).
      res_seq: optional (B, T, out_dim) residual added to the projection output
        INSIDE the recurrence, so the AR feedback carries the residual too —
        the reference's ``res`` mode (gru_vae.py:373,388-399 adds
        ``x_in[:, i, res_stdim:res_endim]`` to out_1's output per frame).

    Returns: (trj (B, T, out_dim) normalized-domain outputs, y_T, h_T).
    """
    hidden = gru_layers[0]["w_hh"].shape[1]
    n_layers = len(gru_layers)
    w_out, b_out = out_proj["w"], out_proj["b"]
    w_ih_y = gru_layers[0]["w_ih"][:, conv_seq.shape[-1]:]  # (3H, out_dim)

    gates_x0 = precompute_input_gates(gru_layers[0], conv_seq)  # (B, T, 3H)
    # time-major for scan
    gates_x0_t = jnp.swapaxes(gates_x0, 0, 1)  # (T, B, 3H)
    xs = {"gx": gates_x0_t}
    if out_drop_mask is not None:
        xs["mask"] = jnp.swapaxes(out_drop_mask, 0, 1)
    if res_seq is not None:
        xs["res"] = jnp.swapaxes(res_seq, 0, 1)

    def step(carry, x_t):
        h, y = carry
        gx0 = x_t["gx"]
        mask_t = x_t.get("mask")
        gx = gx0 + y @ w_ih_y.T
        new_h = []
        inp_gates = gx
        for l in range(n_layers):
            p = gru_layers[l]
            if l > 0:
                inp_gates = new_h[l - 1] @ p["w_ih"].T + p["b_ih"]
            h_l = _gru_cell(inp_gates, h[l], p["w_hh"], p["b_hh"], hidden)
            new_h.append(h_l)
        out = new_h[-1]
        if mask_t is not None:
            out = out * mask_t
        y_new = out @ w_out.T + b_out
        if "res" in x_t:
            y_new = x_t["res"] + y_new
        return (jnp.stack(new_h), y_new), y_new

    (h_T, y_T), trj_t = jax.lax.scan(step, (h0, y0), xs)
    return jnp.swapaxes(trj_t, 0, 1), y_T, h_T
