"""Building blocks: two-sided dilated conv (as one window matmul) and GRU params.

TPU-first design notes
----------------------
The reference stacks non-causal dilated Conv1d layers with NO nonlinearity in
between (reference: src/nets/gru_vae.py:36-66 — ``forward`` chains ``conv[i]``
directly).  A composition of linear convolutions is a single linear map from the
``kernel**layers``-frame window to the output channels, so we precompute the
composed weight once and evaluate the whole context embedding as ONE matmul
(B*T, rec*C_in) @ (rec*C_in, C_out) that tiles onto the MXU — instead of two
skinny convolutions that do not.

GRU parameters use the torch gate layout [r, z, n] over rows of ``w_ih``/``w_hh``
(reference uses torch.nn.GRU: src/nets/gru_vae.py:308-310) so parity tests can
load identical weights; the recurrence itself is evaluated by ``lax.scan`` in
:mod:`cyclevae_tpu.ops.gru_scan`.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def xavier_uniform(key, shape, dtype=jnp.float32):
    """torch.nn.init.xavier_uniform_ semantics: U(-a, a), a = sqrt(6/(fan_in+fan_out)).

    For 2-D (out, in): fan_in = in, fan_out = out.  For conv (out, in, k):
    fan_in = in*k, fan_out = out*k (torch's _calculate_fan_in_and_fan_out).
    """
    if len(shape) == 2:
        fan_in, fan_out = shape[1], shape[0]
    elif len(shape) == 3:
        receptive = shape[2]
        fan_in, fan_out = shape[1] * receptive, shape[0] * receptive
    else:
        raise ValueError(f"unsupported shape {shape}")
    a = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)


# ---------------------------------------------------------------------------
# Two-sided dilated convolution stack
# ---------------------------------------------------------------------------

def init_dilconv(key, in_dim: int, kernel_size: int = 3, layers: int = 2) -> Dict:
    """Init the dilated conv stack: layer i maps in_dim*k^i -> in_dim*k^(i+1),
    dilation k^i; zero bias (reference gru_vae.py:36-51, initialize :21-33)."""
    params = {"w": [], "b": []}
    keys = jax.random.split(key, layers)
    for i in range(layers):
        c_in = in_dim * (kernel_size ** i)
        c_out = in_dim * (kernel_size ** (i + 1))
        w = xavier_uniform(keys[i], (c_out, c_in, kernel_size))
        params["w"].append(w)
        params["b"].append(jnp.zeros((c_out,)))
    return params


def dilconv_effective(params: Dict, kernel_size: int = 3) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compose the linear conv stack into one (rec*C_in, C_out) weight + bias.

    Layer l has taps at offsets ``o * kernel_size**l`` for o in [0, k).  The
    composed operator has taps covering a window of ``rec = k**L`` frames.
    Returns ``w_eff`` laid out so that ``window.reshape(rec*C_in) @ w_eff + b_eff``
    equals the stacked convolution output at that frame (window = frames
    [t-pad, t+pad] of the zero-padded input).
    """
    layers = len(params["w"])
    # taps: dict offset -> (C_cur, C_in) matrix for current composition
    w0 = params["w"][0]
    taps = {o: w0[:, :, o] for o in range(w0.shape[2])}
    bias = params["b"][0]
    for l in range(1, layers):
        wl, bl = params["w"][l], params["b"][l]
        dil = kernel_size ** l
        new_taps: Dict[int, jnp.ndarray] = {}
        for o_l in range(wl.shape[2]):
            w_piece = wl[:, :, o_l]
            for off, mat in taps.items():
                key_off = off + o_l * dil
                contrib = w_piece @ mat
                new_taps[key_off] = new_taps.get(key_off, 0) + contrib
        # bias: each output tap position sees the (constant) bias of the previous
        # layer through every kernel tap, plus its own bias
        bias = sum(wl[:, :, o] @ bias for o in range(wl.shape[2])) + bl
        taps = new_taps
    rec = kernel_size ** layers
    c_in = params["w"][0].shape[1]
    c_out = params["w"][-1].shape[0]
    w_eff = jnp.zeros((rec, c_in, c_out))
    for off, mat in taps.items():
        w_eff = w_eff.at[off].set(mat.T)
    return w_eff.reshape(rec * c_in, c_out), bias


def window_gather(x: jnp.ndarray, rec: int) -> jnp.ndarray:
    """(B, T, C) -> (B, T, rec*C): concat frames [t-pad, t+pad] with zero padding.

    ``rec`` must be odd (even receptive fields change the output length in the
    reference's padding scheme and are not supported).
    """
    assert rec % 2 == 1, "receptive field must be odd (use an odd kernel size)"
    pad = (rec - 1) // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    T = x.shape[1]
    cols = [xp[:, o : o + T, :] for o in range(rec)]
    return jnp.concatenate(cols, axis=-1).reshape(x.shape[0], T, rec * x.shape[2])


def dilconv_apply(params: Dict, x: jnp.ndarray, kernel_size: int = 3) -> jnp.ndarray:
    """Apply the composed conv stack: one window-gather + one MXU matmul.

    x: (B, T, C_in) -> (B, T, C_out) with C_out = C_in * k**layers.
    Exactly equal (to float tolerance) to the reference's stacked Conv1d
    (gru_vae.py:53-66) because no nonlinearity separates the layers.
    """
    w_eff, b_eff = dilconv_effective(params, kernel_size)
    rec = kernel_size ** len(params["w"])
    win = window_gather(x, rec)  # (B, T, rec*C_in) — window is [c @ t-pad .. c @ t+pad]
    # reference layout: tap offset major, channel minor -> (rec, C) flattened; our
    # window_gather produces offset-major too, matching w_eff's reshape
    return win @ w_eff + b_eff


# ---------------------------------------------------------------------------
# GRU stack + dense
# ---------------------------------------------------------------------------

def init_gru_stack(key, input_dim: int, hidden_units: int, n_layers: int = 1) -> List[Dict]:
    """torch-layout GRU params per layer: w_ih (3H, in), w_hh (3H, H), b_ih, b_hh.

    Gate row order [r, z, n] (torch convention). Weights xavier-uniform over the
    full stacked matrix, biases zero — matching reference ``initialize``
    (gru_vae.py:21-33) which xavier-inits each named weight tensor as a whole.
    """
    layers = []
    for l in range(n_layers):
        key, k1, k2 = jax.random.split(key, 3)
        in_l = input_dim if l == 0 else hidden_units
        layers.append({
            "w_ih": xavier_uniform(k1, (3 * hidden_units, in_l)),
            "w_hh": xavier_uniform(k2, (3 * hidden_units, hidden_units)),
            "b_ih": jnp.zeros((3 * hidden_units,)),
            "b_hh": jnp.zeros((3 * hidden_units,)),
        })
    return layers


def init_dense(key, in_dim: int, out_dim: int) -> Dict:
    """1x1-conv projection as a dense layer (reference out_1, gru_vae.py:314)."""
    return {"w": xavier_uniform(key, (out_dim, in_dim)), "b": jnp.zeros((out_dim,))}
