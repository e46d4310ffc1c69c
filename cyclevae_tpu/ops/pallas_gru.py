"""Pallas TPU kernel: fused autoregressive GRU scan with VMEM-resident weights.

Why: the XLA ``lax.scan`` recurrence re-reads the GRU weights from HBM every
frame (~13.4 MB/step for hu=1024), measured at ~55 us/frame — 26x off the
MXU flop bound (~2 us at B=16).  This kernel runs the WHOLE time loop as a
sequential 1-D grid with the weight matrices held in VMEM across iterations
(TPU grid steps with constant index_maps keep their blocks resident), so per
frame only the (B, 3H) hoisted input-gate slice streams in and the (B, out)
output streams out.

Scope: single-layer GRU (the flagship hl1 config; multi-layer falls back to
ops.gru_scan).  Three kernels: inference forward (pallas_gru_ar), training
forward streaming the h_seq VJP residual (pallas_gru_ar_train), and the
reverse-time cotangent scan for the custom VJP (pallas_gru_ar_bwd) — so both
directions of training keep weights VMEM-resident (ops/gru_ar_vjp.py).

Gate math matches torch exactly (see ops/gru_scan.py): [r, z, n] row order,
reset gate multiplies only the hidden-side candidate including its bias.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(gx_ref, wy_ref, whh_ref, bhh_ref, wout_ref, bout_ref,
            y0_ref, h0_ref, trj_ref, ylast_ref, hlast_ref, h_s, y_s,
            *, hidden: int, T: int):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_s[:] = h0_ref[:]
        y_s[:] = y0_ref[:]

    h = h_s[:]
    y = y_s[:]
    # input-side gates: hoisted conv projection + AR feedback projection.
    # Activations cast to the weight dtype so bf16 weights get native-bf16 MXU
    # passes (f32 accumulation via preferred_element_type).
    wdt = whh_ref.dtype
    gx = gx_ref[0].astype(jnp.float32) + jnp.dot(
        y.astype(wdt), wy_ref[:], preferred_element_type=jnp.float32)
    gh = jnp.dot(h.astype(wdt), whh_ref[:],
                 preferred_element_type=jnp.float32) + bhh_ref[:]
    r = jax.nn.sigmoid(gx[:, :hidden] + gh[:, :hidden])
    z = jax.nn.sigmoid(gx[:, hidden:2 * hidden] + gh[:, hidden:2 * hidden])
    n = jnp.tanh(gx[:, 2 * hidden:] + r * gh[:, 2 * hidden:])
    h_new = (1.0 - z) * n + z * h
    y_new = jnp.dot(h_new.astype(wdt), wout_ref[:],
                    preferred_element_type=jnp.float32) + bout_ref[:]

    trj_ref[0] = y_new
    h_s[:] = h_new
    y_s[:] = y_new

    @pl.when(t == T - 1)
    def _():
        ylast_ref[:] = y_new
        hlast_ref[:] = h_new


def _kernel_train(gx_ref, wy_ref, whh_ref, bhh_ref, wout_ref, bout_ref,
                  y0_ref, h0_ref, mask_ref,
                  trj_ref, ylast_ref, hlast_ref, hseq_ref, h_s, y_s,
                  *, hidden: int, T: int):
    """Training-mode fused step: also streams out h_t (the VJP residual) and
    applies the (inverted-)dropout mask on the GRU output before the
    projection, as the reference does (gru_vae.py:376-382)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_s[:] = h0_ref[:]
        y_s[:] = y0_ref[:]

    h = h_s[:]
    y = y_s[:]
    wdt = whh_ref.dtype
    gx = gx_ref[0].astype(jnp.float32) + jnp.dot(
        y.astype(wdt), wy_ref[:], preferred_element_type=jnp.float32)
    gh = jnp.dot(h.astype(wdt), whh_ref[:],
                 preferred_element_type=jnp.float32) + bhh_ref[:]
    r = jax.nn.sigmoid(gx[:, :hidden] + gh[:, :hidden])
    z = jax.nn.sigmoid(gx[:, hidden:2 * hidden] + gh[:, hidden:2 * hidden])
    n = jnp.tanh(gx[:, 2 * hidden:] + r * gh[:, 2 * hidden:])
    h_new = (1.0 - z) * n + z * h
    o = h_new * mask_ref[0].astype(jnp.float32)
    y_new = jnp.dot(o.astype(wdt), wout_ref[:],
                    preferred_element_type=jnp.float32) + bout_ref[:]

    trj_ref[0] = y_new
    hseq_ref[0] = h_new.astype(hseq_ref.dtype)
    h_s[:] = h_new
    y_s[:] = y_new

    @pl.when(t == T - 1)
    def _():
        ylast_ref[:] = y_new
        hlast_ref[:] = h_new


def pallas_gru_ar_train(
    gru_layer: Dict,
    out_proj: Dict,
    gates_x: jnp.ndarray,   # (B, T, 3H) hoisted input-side gates (incl b_ih)
    y0: jnp.ndarray,        # (B, out)
    h0: jnp.ndarray,        # (B, H)
    out_mask: jnp.ndarray,  # (B, T, H) inverted-dropout mask (ones if no do)
    weight_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused AR-GRU forward for the TRAINING path: returns
    (trj (B,T,out), y_T, h_T, h_seq (B,T,H)) — h_seq is the residual the
    custom VJP needs to recompute gates in bulk (ops/gru_ar_vjp.py)."""
    B, T, threeH = gates_x.shape
    hidden = gru_layer["w_hh"].shape[1]
    out_dim = out_proj["w"].shape[0]
    conv_dim = gru_layer["w_ih"].shape[1] - out_dim

    wy = gru_layer["w_ih"][:, conv_dim:].T.astype(weight_dtype)
    whh = gru_layer["w_hh"].T.astype(weight_dtype)
    bhh = gru_layer["b_hh"][None].astype(jnp.float32)
    wout = out_proj["w"].T.astype(weight_dtype)
    bout = out_proj["b"][None].astype(jnp.float32)

    # streams ride at the weight dtype (exact upcast in-kernel: bf16 inputs
    # ARE bf16-precise already, so bf16 streaming halves HBM traffic without
    # changing a single forward bit); the h_seq residual is stored at the
    # same dtype for the backward's in-kernel recompute
    sdt = jnp.dtype(weight_dtype)
    gates_x_t = jnp.swapaxes(gates_x, 0, 1).astype(sdt)
    mask_t = jnp.swapaxes(out_mask, 0, 1).astype(sdt)

    grid_spec = pl.GridSpec(
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, threeH), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_dim, threeH), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, threeH), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, threeH), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, out_dim), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out_dim), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, out_dim), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, hidden), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, hidden), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, out_dim), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, out_dim), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, hidden), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, hidden), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, hidden), jnp.float32),
            pltpu.VMEM((B, out_dim), jnp.float32),
        ],
    )
    kernel = functools.partial(_kernel_train, hidden=hidden, T=T)
    trj_t, y_T, h_T, hseq_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        # the default 16 MiB scoped-vmem stack overflows at B>=256 (the
        # streamed h_seq/trj output blocks); v5e has 128 MiB VMEM — raise the
        # cap so big fused batches (bsu>=128 with 2 directions) compile
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        out_shape=[
            jax.ShapeDtypeStruct((T, B, out_dim), jnp.float32),
            jax.ShapeDtypeStruct((B, out_dim), jnp.float32),
            jax.ShapeDtypeStruct((B, hidden), jnp.float32),
            jax.ShapeDtypeStruct((T, B, hidden), sdt),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * (hidden * 3 * hidden + out_dim * 3 * hidden
                               + hidden * out_dim),
            bytes_accessed=T * B * (threeH + 2 * hidden) * sdt.itemsize
            + T * B * out_dim * 4
            + (hidden + out_dim) * threeH * sdt.itemsize,
            transcendentals=3 * T * B * hidden,
        ),
    )(gates_x_t, wy, whh, bhh, wout, bout,
      y0.astype(jnp.float32), h0.astype(jnp.float32), mask_t)
    return (jnp.swapaxes(trj_t, 0, 1), y_T, h_T,
            jnp.swapaxes(hseq_t, 0, 1))


def _kernel_bwd(dtrj_ref, gx_in_ref, yprev_ref, hprev_ref, mask_ref,
                wout_ref, whh_ref, whh_t_ref, wy_ref, wy_t_ref, bhh_ref,
                dhT_ref, dyT_ref,
                dgx_ref, dgh_ref, dytot_ref, dh0_ref, dy0_ref, dh_s, dy_s,
                *, hidden: int, T: int):
    """Reverse-time cotangent scan of the AR-GRU (see ops/gru_ar_vjp._bwd)
    with IN-KERNEL gate recomputation: rather than materializing the
    recomputed activations (gx, gh, r, z, n — six (B,T,{H,3H}) arrays) in
    HBM and streaming them back in (the round-2 design; ~4x this kernel's
    HBM traffic), each reversed step recomputes them in VMEM from the saved
    forward residuals (gates_x, y_prev, h_prev).  The recompute matmuls hit
    the MXU on VMEM-resident weights, so the trade is two extra per-step
    matmuls against hundreds of MB of HBM round-trips per call.  Gate values
    match the forward bit-exactly: the recompute consumes the same operands
    (h_prev at the streamed dtype, the hoisted input gates) the forward
    kernel consumed."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        dh_s[:] = dhT_ref[:]
        dy_s[:] = dyT_ref[:]

    wdt = whh_ref.dtype
    h_prev = hprev_ref[0].astype(jnp.float32)
    # ---- recompute this step's gates (bulk-free; matches fwd kernel) ----
    gx = gx_in_ref[0].astype(jnp.float32) + jnp.dot(
        yprev_ref[0].astype(wdt), wy_t_ref[:],
        preferred_element_type=jnp.float32)
    gh = jnp.dot(hprev_ref[0].astype(wdt), whh_t_ref[:],
                 preferred_element_type=jnp.float32) + bhh_ref[:]
    r = jax.nn.sigmoid(gx[:, :hidden] + gh[:, :hidden])
    z = jax.nn.sigmoid(gx[:, hidden:2 * hidden] + gh[:, hidden:2 * hidden])
    ghn = gh[:, 2 * hidden:]
    n = jnp.tanh(gx[:, 2 * hidden:] + r * ghn)

    # ---- cotangent algebra ----
    dy_tot = dtrj_ref[0] + dy_s[:]
    do = jnp.dot(dy_tot.astype(wdt), wout_ref[:],
                 preferred_element_type=jnp.float32)
    dh_tot = dh_s[:] + do * mask_ref[0].astype(jnp.float32)
    dz = dh_tot * (h_prev - n)
    dn = dh_tot * (1.0 - z)
    dgn = dn * (1.0 - n * n)
    dr = dgn * ghn
    dghn = dgn * r
    dgr = dr * r * (1.0 - r)
    dgz = dz * z * (1.0 - z)
    dgx_t = jnp.concatenate([dgr, dgz, dgn], axis=-1)
    dgh_t = jnp.concatenate([dgr, dgz, dghn], axis=-1)
    dh_prev = dh_tot * z + jnp.dot(dgh_t.astype(wdt), whh_ref[:],
                                   preferred_element_type=jnp.float32)
    dy_prev = jnp.dot(dgx_t.astype(wdt), wy_ref[:],
                      preferred_element_type=jnp.float32)

    dgx_ref[0] = dgx_t.astype(dgx_ref.dtype)
    dgh_ref[0] = dgh_t.astype(dgh_ref.dtype)
    dytot_ref[0] = dy_tot
    dh_s[:] = dh_prev
    dy_s[:] = dy_prev

    @pl.when(t == T - 1)
    def _():
        dh0_ref[:] = dh_prev
        dy0_ref[:] = dy_prev


def pallas_gru_ar_bwd(
    wout: jnp.ndarray,      # (out, H)   weight dtype (bf16 in the fast config)
    whh: jnp.ndarray,       # (3H, H)
    wy: jnp.ndarray,        # (3H, out)
    bhh: jnp.ndarray,       # (3H,)
    d_trj: jnp.ndarray,     # (B, T, out) output cotangents
    gates_x: jnp.ndarray,   # (B, T, 3H) hoisted input-side gates (fwd residual)
    y_prev: jnp.ndarray,    # (B, T, out) AR feedback fed at each step
    h_prev: jnp.ndarray,    # (B, T, H)  hidden state entering each step
    out_mask: jnp.ndarray,  # (B, T, H)
    d_hT: jnp.ndarray,      # (B, H)
    d_yT: jnp.ndarray,      # (B, out)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused reverse scan with in-kernel gate recompute.  Returns
    (dgx (B,T,3H), dgh (B,T,3H), dy_tot (B,T,out), dh0 (B,H), dy0 (B,out)).

    Streams (gates_x / y_prev / h_prev / out_mask in; dgx / dgh out) ride at
    the WEIGHT dtype — bf16 halves this kernel's HBM traffic and feeds the
    downstream weight-gradient einsums MXU-native operands; the sequential
    cotangent carries (dh, dy) and all gate algebra stay f32 in VMEM."""
    B, T, H = h_prev.shape
    out_dim = d_trj.shape[-1]
    threeH = 3 * H
    wdt = whh.dtype
    sdt = jnp.dtype(wdt)    # stream dtype follows the weight dtype

    rev = lambda t: (T - 1 - t, 0, 0)
    fixed = lambda t: (0, 0)

    def tblock(d):
        return pl.BlockSpec((1, B, d), rev, memory_space=pltpu.VMEM)

    def wblock(a, b):
        return pl.BlockSpec((a, b), fixed, memory_space=pltpu.VMEM)

    grid_spec = pl.GridSpec(
        grid=(T,),
        in_specs=[
            tblock(out_dim),                     # d_trj
            tblock(threeH),                      # gates_x
            tblock(out_dim),                     # y_prev
            tblock(H),                           # h_prev
            tblock(H),                           # out_mask
            wblock(out_dim, H),                  # wout
            wblock(threeH, H),                   # whh   (dgh @ whh)
            wblock(H, threeH),                   # whh.T (recompute gh)
            wblock(threeH, out_dim),             # wy    (dgx @ wy)
            wblock(out_dim, threeH),             # wy.T  (recompute gx)
            wblock(1, threeH),                   # bhh
            pl.BlockSpec((B, H), fixed, memory_space=pltpu.VMEM),       # d_hT
            pl.BlockSpec((B, out_dim), fixed, memory_space=pltpu.VMEM),  # d_yT
        ],
        out_specs=[
            tblock(threeH),                      # dgx
            tblock(threeH),                      # dgh
            tblock(out_dim),                     # dy_tot
            pl.BlockSpec((B, H), fixed, memory_space=pltpu.VMEM),       # dh0
            pl.BlockSpec((B, out_dim), fixed, memory_space=pltpu.VMEM),  # dy0
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, out_dim), jnp.float32),
        ],
    )
    tm = lambda a, dt: jnp.swapaxes(a, 0, 1).astype(dt)
    kernel = functools.partial(_kernel_bwd, hidden=H, T=T)
    dgx_t, dgh_t, dytot_t, dh0, dy0 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        out_shape=[
            jax.ShapeDtypeStruct((T, B, threeH), sdt),
            jax.ShapeDtypeStruct((T, B, threeH), sdt),
            jax.ShapeDtypeStruct((T, B, out_dim), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, out_dim), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * (out_dim * H + 2 * threeH * H
                               + 2 * threeH * out_dim),
            bytes_accessed=T * B * (2 * H + 2 * out_dim + 3 * threeH)
            * sdt.itemsize + T * B * out_dim * 4,
            transcendentals=3 * T * B * H,
        ),
    )(tm(d_trj, jnp.float32), tm(gates_x, sdt), tm(y_prev, sdt),
      tm(h_prev, sdt), tm(out_mask, sdt),
      wout.astype(wdt), whh.astype(wdt), whh.T.astype(wdt),
      wy.astype(wdt), wy.T.astype(wdt), bhh[None].astype(jnp.float32),
      d_hT.astype(jnp.float32), d_yT.astype(jnp.float32))
    sw = lambda a: jnp.swapaxes(a, 0, 1)
    return sw(dgx_t), sw(dgh_t), sw(dytot_t), dh0, dy0


def pallas_gru_ar(
    gru_layer: Dict,
    out_proj: Dict,
    gates_x: jnp.ndarray,   # (B, T, 3H) hoisted input-side gates (incl b_ih)
    y0: jnp.ndarray,        # (B, out)
    h0: jnp.ndarray,        # (B, H)
    weight_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused AR-GRU over a segment. Returns (trj (B,T,out), y_T, h_T).

    ``weight_dtype=jnp.bfloat16`` halves VMEM residency (MXU-native) at ~1e-2
    relative output tolerance.
    """
    B, T, threeH = gates_x.shape
    hidden = gru_layer["w_hh"].shape[1]
    out_dim = out_proj["w"].shape[0]
    conv_dim = gru_layer["w_ih"].shape[1] - out_dim

    wy = gru_layer["w_ih"][:, conv_dim:].T.astype(weight_dtype)   # (out, 3H)
    whh = gru_layer["w_hh"].T.astype(weight_dtype)                # (H, 3H)
    bhh = gru_layer["b_hh"][None].astype(jnp.float32)             # (1, 3H)
    wout = out_proj["w"].T.astype(weight_dtype)                   # (H, out)
    bout = out_proj["b"][None].astype(jnp.float32)                # (1, out)

    # stream the hoisted gates at the weight dtype (exact upcast in-kernel)
    gates_x_t = jnp.swapaxes(gates_x, 0, 1).astype(weight_dtype)  # (T, B, 3H)

    grid_spec = pl.GridSpec(
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, threeH), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_dim, threeH), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, threeH), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, threeH), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, out_dim), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out_dim), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, out_dim), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, hidden), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, out_dim), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, out_dim), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, hidden), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, hidden), jnp.float32),
            pltpu.VMEM((B, out_dim), jnp.float32),
        ],
    )
    kernel = functools.partial(_kernel, hidden=hidden, T=T)
    trj_t, y_T, h_T = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        # see pallas_gru_ar_train: raise the 16 MiB scoped-vmem cap for
        # large fused batches (chains/particles/utterances ride B)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        out_shape=[
            jax.ShapeDtypeStruct((T, B, out_dim), jnp.float32),
            jax.ShapeDtypeStruct((B, out_dim), jnp.float32),
            jax.ShapeDtypeStruct((B, hidden), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * (hidden * 3 * hidden + out_dim * 3 * hidden
                               + hidden * out_dim),
            bytes_accessed=T * B * threeH * jnp.dtype(weight_dtype).itemsize
            + T * B * out_dim * 4
            + (hidden + out_dim) * threeH * jnp.dtype(weight_dtype).itemsize,
            transcendentals=3 * T * B * hidden,
        ),
    )(gates_x_t, wy, whh, bhh, wout, bout,
      y0.astype(jnp.float32), h0.astype(jnp.float32))
    return jnp.swapaxes(trj_t, 0, 1), y_T, h_T
