"""Pure-functional GRU-RNN VAE nets: encoder / decoder with AR feedback.

Functional re-design of the reference's stateful ``GRU_RNN`` module
(reference: src/nets/gru_vae.py:265-463).  The forward contract is identical —
``(trj_out, y_last, h_last) = apply(params, x, y_in, h_in)`` so hidden + AR
state can be carried (detached) across TBPTT segments — but everything is a
pytree + pure function suitable for jit/grad/vmap/pjit.

Key reference semantics preserved:
  * frozen input standardization / output un-normalization baked from data
    stats (train…py:344-347, excluded from optimization :369-372) — represented
    here directly as (mean, scale) vectors rather than frozen 1x1 convs;
  * dilated-conv context embedding with receptive field kernel**layers frames
    (gru_vae.py:36-66), evaluated as a single window matmul;
  * AR feedback: the GRU input is concat(conv_out[t], y_prev) where y_prev is
    the model's own previous NORMALIZED output (gru_vae.py:365-399);
  * encoder log-variance clamp at ln 1e-6 = -13.8155... (gru_vae.py:410-435);
    Laplace clamp at -7.2543... for the laplace surface;
  * dropout on conv output and on GRU output BEFORE the projection, so the AR
    feedback is dropped too (gru_vae.py:354-399).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .layers import (
    dilconv_effective,
    init_dense,
    init_dilconv,
    init_gru_stack,
    window_gather,
)
from ..ops.gru_scan import gru_ar_scan

# ln(1e-6): minimum log-variance lane value (reference gru_vae.py:412)
LOG_VAR_MIN = -13.815510557964274
# Laplace log-scale clamp (reference gru_vae.py:417)
LOG_SCALE_MIN = -7.25432886926211


@dataclass(frozen=True)
class GRURNNConfig:
    in_dim: int = 54
    out_dim: int = 50
    hidden_units: int = 1024
    hidden_layers: int = 1
    kernel_size: int = 3
    dilation_size: int = 2          # number of conv layers; rec field = k**layers
    do_prob: float = 0.0
    scale_in: bool = True
    scale_out: bool = True
    # "bfloat16" runs the conv/GRU/projection matmuls in bf16 (f32 master
    # params, f32 normalization + clamps + losses) — the standard TPU mixed-
    # precision split; f32 by default for reference-exact numerics
    compute_dtype: str = "float32"

    @property
    def rec_field(self) -> int:
        return self.kernel_size ** self.dilation_size

    @property
    def conv_dim(self) -> int:
        return self.in_dim * self.rec_field

    @property
    def tot_in_dim(self) -> int:
        return self.conv_dim + self.out_dim


def init_gru_rnn(key, cfg: GRURNNConfig) -> Dict:
    """Initialize parameters (xavier-uniform weights / zero biases, matching
    reference ``initialize`` gru_vae.py:21-33). Normalization stats start as
    identity; bake data stats in with ``set_scale_stats``."""
    k_conv, k_gru, k_out = jax.random.split(key, 3)
    params = {
        "conv": init_dilconv(k_conv, cfg.in_dim, cfg.kernel_size, cfg.dilation_size),
        "gru": init_gru_stack(k_gru, cfg.tot_in_dim, cfg.hidden_units, cfg.hidden_layers),
        "out": init_dense(k_out, cfg.hidden_units, cfg.out_dim),
    }
    if cfg.scale_in:
        params["scale_in"] = {
            "mean": jnp.zeros((cfg.in_dim,)),
            "scale": jnp.ones((cfg.in_dim,)),
        }
    if cfg.scale_out:
        params["scale_out"] = {
            "mean": jnp.zeros((cfg.out_dim,)),
            "scale": jnp.ones((cfg.out_dim,)),
        }
    return params


def set_scale_stats(params: Dict, mean_in=None, scale_in=None,
                    mean_out=None, scale_out=None) -> Dict:
    """Bake frozen normalization stats (reference train…py:344-347)."""
    params = dict(params)
    if mean_in is not None:
        params["scale_in"] = {"mean": jnp.asarray(mean_in), "scale": jnp.asarray(scale_in)}
    if mean_out is not None:
        params["scale_out"] = {"mean": jnp.asarray(mean_out), "scale": jnp.asarray(scale_out)}
    return params


def init_hidden(cfg: GRURNNConfig, batch: int) -> jnp.ndarray:
    return jnp.zeros((cfg.hidden_layers, batch, cfg.hidden_units))


def _bernoulli_fast(key: jax.Array, p: float, shape) -> jnp.ndarray:
    """Bernoulli(p) dropout draw on the fast hardware-RNG path.

    jax.random's default threefry lowers to long vector xor/shift fusion
    chains — the step trace showed mask generation for the 8 per-segment
    (B,T,{conv,H}) dropout masks costing ~6% of the whole train step.  On
    TPU, derive an ``rbg`` key (lowers to the XLA RngBitGenerator hardware
    path) from the threefry key: still a pure, reproducible function of the
    incoming key, same Bernoulli(p) marginal, ~10x cheaper to draw.
    Off-TPU keeps plain ``jax.random.bernoulli`` (test determinism there is
    cross-checked against recorded trajectories).

    Documented trade (advisor r3): because the backend is branched at trace
    time, the same seed draws DIFFERENT masks on TPU vs CPU, so a TPU
    training trajectory cannot be bit-reproduced off-TPU by default.  Set
    ``CYCLEVAE_DROPOUT_RNG=threefry`` to force the portable threefry path on
    every backend when bit-reproduction across platforms matters more than
    the ~6%-of-step mask cost (or ``=rbg`` to force the hardware path)."""
    forced = os.environ.get("CYCLEVAE_DROPOUT_RNG", "")
    if forced == "threefry":
        return jax.random.bernoulli(key, p, shape)
    if forced != "rbg" and jax.default_backend() != "tpu":
        return jax.random.bernoulli(key, p, shape)
    return _bernoulli_rbg(key, p, shape)


def _bernoulli_rbg(key: jax.Array, p: float, shape) -> jnp.ndarray:
    kd = key if jnp.issubdtype(key.dtype, jnp.uint32) \
        else jax.random.key_data(key)          # raw PRNGKey vs typed key
    kd = jnp.asarray(kd, jnp.uint32).reshape(-1)
    rbg_key = jax.random.wrap_key_data(
        jnp.concatenate([kd, kd ^ jnp.uint32(0x9E3779B9)]), impl="rbg")
    return jax.random.uniform(rbg_key, shape) < p


def gru_rnn_apply(
    params: Dict,
    cfg: GRURNNConfig,
    x: jnp.ndarray,
    y_in: jnp.ndarray,
    h_in: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    do: bool = False,
    clamp_vae: bool = False,
    clamp_vae_laplace: bool = False,
    relu_vae: bool = False,
    lat_dim: int = 32,
    use_pallas: bool = False,
    softmax: bool = False,
    sigmoid: bool = False,
    exp: bool = False,
    res: bool = False,
    res_stdim: int = 0,
    res_endim: Optional[int] = None,
    noise: float = 0.0,
    differentiable: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Forward over a (B, T, in_dim) segment.

    Returns (trj_out (B, T, out_dim), y_last (B, out_dim), h_last (L, B, H)).
    ``y_last`` is in the NORMALIZED domain (pre-scale_out) — it is the value to
    feed back as ``y_in`` for the next TBPTT segment, exactly the reference's
    carry contract (train…py:1298-1316).

    Aux surface (reference gru_vae.py:359,373,445-450; used by the VQ /
    classifier model variants, not the gauss pipeline):
      * ``res``: residual AR mode — each frame's output (and its AR feedback)
        is ``x_norm[t, res_stdim:res_endim] + out_1(gru_out)``;
      * ``softmax`` / ``sigmoid`` / ``exp`` output heads applied to trj_out
        (exp head: ``(exp(trj)-1)/10000``); the AR feedback stays pre-head;
      * ``relu_vae``: variance-lane parameterization — relu'd variance lanes
        clamped at 1e-6 instead of a log-variance clamp (gru_vae.py:412-435);
      * ``noise``: additive N(0, noise²) on the normalized input (:348-350).
    """
    B, T, _ = x.shape
    if cfg.scale_in:
        s = params["scale_in"]
        x = (x - s["mean"]) / s["scale"]
    if noise > 0.0:
        assert rng is not None, "input noise requires an rng key"
        rng, k_noise = jax.random.split(rng)
        x = x + noise * jax.random.normal(k_noise, x.shape, dtype=x.dtype)

    cdt = jnp.dtype(cfg.compute_dtype)
    cast = (lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(cdt) if a.dtype == jnp.float32 else a, t)) \
        if cdt != jnp.float32 else (lambda t: t)
    x = cast(x)

    # context embedding: one window matmul (see layers.dilconv_apply docstring)
    w_eff, b_eff = dilconv_effective(cast(params["conv"]), cfg.kernel_size)
    conv_seq = window_gather(x, cfg.rec_field) @ w_eff + b_eff  # (B, T, conv_dim)

    out_mask = None
    if do and cfg.do_prob > 0.0:
        assert rng is not None, "dropout requires an rng key"
        k_conv, k_out = jax.random.split(rng)
        keep = 1.0 - cfg.do_prob
        conv_mask = _bernoulli_fast(k_conv, keep, conv_seq.shape) / keep
        conv_seq = conv_seq * conv_mask.astype(conv_seq.dtype)
        out_mask = (
            _bernoulli_fast(k_out, keep, (B, T, cfg.hidden_units)) / keep
        ).astype(conv_seq.dtype)

    if h_in is None:
        h_in = init_hidden(cfg, B)
    y_in = y_in.astype(conv_seq.dtype)
    h_in = h_in.astype(conv_seq.dtype)

    res_seq = None
    if res:
        end = cfg.out_dim + res_stdim if res_endim is None else res_endim
        res_seq = x[..., res_stdim:end]

    gru_p = cast(params["gru"])
    out_p = cast(params["out"])
    if use_pallas and cfg.hidden_layers == 1 and res_seq is None:
        # fused Pallas AR scan with VMEM-resident weights (~1.36x over the
        # XLA scan at batch >=128, 82% of the bf16 matmul roofline)
        from ..ops.gru_scan import precompute_input_gates
        if do or differentiable or jax.default_backend() == "cpu":
            # training path (differentiable; also any CPU run): custom-VJP
            # wrapper — Pallas fwd on TPU, XLA fallback elsewhere, reverse-
            # scan bwd with in-kernel gate recompute (ops/gru_ar_vjp.py).
            # A do_prob=0 training config still needs the VJP, so route by
            # `do`, not by mask presence, with an all-ones mask when off.
            # ``differentiable=True`` forces this path for grad-needing
            # callers without dropout (HMC/NUTS log-joints, infer/logjoint).
            from ..ops.gru_ar_vjp import gru_ar_fused
            g0 = gru_p[0]
            conv_dim = conv_seq.shape[-1]
            gx = precompute_input_gates(g0, conv_seq)
            if out_mask is None:
                out_mask = jnp.ones(
                    (B, T, cfg.hidden_units), dtype=conv_seq.dtype)
            trj, y_last, h_last1 = gru_ar_fused(
                g0["w_ih"][:, conv_dim:], g0["w_hh"], g0["b_hh"],
                out_p["w"], out_p["b"], gx, y_in, h_in[0], out_mask, "auto")
        else:
            # inference path (no grad, TPU backend): raw fused kernel — no
            # h_seq streaming, fastest variant.
            from ..ops.pallas_gru import pallas_gru_ar
            gx = precompute_input_gates(gru_p[0], conv_seq)
            trj, y_last, h_last1 = pallas_gru_ar(
                gru_p[0], out_p, gx, y_in, h_in[0],
                weight_dtype=cdt)
        h_last = h_last1[None]
    else:
        trj, y_last, h_last = gru_ar_scan(
            gru_p, out_p, conv_seq, y_in, h_in, out_mask, res_seq
        )

    trj = trj.astype(jnp.float32)
    y_last = y_last.astype(jnp.float32)
    h_last = h_last.astype(jnp.float32)

    if cfg.scale_out:
        s = params["scale_out"]
        trj_out = trj * s["scale"] + s["mean"]
    else:
        trj_out = trj
        if clamp_vae or clamp_vae_laplace:
            if relu_vae:
                aux = jnp.maximum(jax.nn.relu(trj_out[..., lat_dim:]), 1e-6)
            else:
                vmin = LOG_VAR_MIN if clamp_vae else LOG_SCALE_MIN
                aux = jnp.maximum(trj_out[..., lat_dim:], vmin)
            trj_out = jnp.concatenate([trj_out[..., :lat_dim], aux], axis=-1)
        elif relu_vae:
            trj_out = jnp.concatenate(
                [trj_out[..., :lat_dim],
                 jax.nn.relu(trj_out[..., lat_dim:])], axis=-1)

    # output heads (reference gru_vae.py:445-450); AR feedback stays pre-head
    if exp:
        trj_out = (jnp.exp(trj_out) - 1.0) / 10000.0
    elif softmax:
        trj_out = jax.nn.softmax(trj_out, axis=-1)
    elif sigmoid:
        trj_out = jax.nn.sigmoid(trj_out)

    return trj_out, y_last, h_last


# ---------------------------------------------------------------------------
# Sampling + KL (reference gru_vae.py:69-144)
# ---------------------------------------------------------------------------

def sampling_vae_batch(key, param: jnp.ndarray, lat_dim: Optional[int] = None) -> jnp.ndarray:
    """Reparameterized Gaussian draw; param = concat(mu, log_var) on last axis."""
    if lat_dim is None:
        lat_dim = param.shape[-1] // 2
    mu = param[..., :lat_dim]
    log_var = param[..., lat_dim:]
    eps = jax.random.normal(key, mu.shape, dtype=param.dtype)
    return mu + jnp.exp(log_var / 2.0) * eps


def sampling_vae_laplace_batch(key, param: jnp.ndarray, lat_dim: Optional[int] = None) -> jnp.ndarray:
    """Laplace reparameterization by inverse CDF (reference gru_vae.py:101-114)."""
    if lat_dim is None:
        lat_dim = param.shape[-1] // 2
    mu = param[..., :lat_dim]
    log_scale = param[..., lat_dim:]
    eps = jax.random.uniform(key, mu.shape, dtype=param.dtype,
                             minval=-0.4999, maxval=0.5)
    return mu - jnp.exp(log_scale) * jnp.sign(eps) * jnp.log1p(-2.0 * jnp.abs(eps))


def loss_vae(param: jnp.ndarray, lat_dim: Optional[int] = None,
             mask: Optional[jnp.ndarray] = None,
             relu_vae: bool = False) -> jnp.ndarray:
    """KL(q(z|x) || N(0, I)) = mean_T 0.5 * sum_D (exp(lv) + mu^2 - lv - 1).

    param: (T, 2D) or (..., T, 2D); mean over the frame axis.  ``mask`` (same
    leading shape, (…, T)) selects valid frames for padded batches — the
    reference instead slices ``[:flen]`` dynamically (train…py:1370).
    ``relu_vae``: the aux lanes hold the VARIANCE directly (reference
    gru_vae.py:123-127), i.e. 0.5 * sum(v + mu^2 - log v - 1).
    """
    if lat_dim is None:
        lat_dim = param.shape[-1] // 2
    mu = param[..., :lat_dim]
    lv = param[..., lat_dim:]
    if relu_vae:
        per_frame = 0.5 * jnp.sum(lv + mu ** 2 - jnp.log(lv) - 1.0, axis=-1)
    else:
        per_frame = 0.5 * jnp.sum(jnp.exp(lv) + mu ** 2 - lv - 1.0, axis=-1)
    if mask is None:
        return jnp.mean(per_frame, axis=-1)
    denom = jnp.maximum(jnp.sum(mask, axis=-1), 1.0)
    return jnp.sum(per_frame * mask, axis=-1) / denom


def loss_vae_laplace(param: jnp.ndarray, lat_dim: Optional[int] = None,
                     mask: Optional[jnp.ndarray] = None,
                     relu_vae: bool = False) -> jnp.ndarray:
    """KL(Laplace(mu, b) || Laplace(0, 1)) per reference gru_vae.py:130-144.
    ``relu_vae``: aux lanes hold the scale b directly (:140-142)."""
    if lat_dim is None:
        lat_dim = param.shape[-1] // 2
    mu = param[..., :lat_dim]
    aux = param[..., lat_dim:]
    mu_abs = jnp.abs(mu)
    if relu_vae:
        scale, log_b = aux, jnp.log(aux)
    else:
        scale, log_b = jnp.exp(aux), aux
    per_frame = jnp.sum(-log_b + scale * jnp.exp(-mu_abs / scale) + mu_abs - 1.0, axis=-1)
    if mask is None:
        return jnp.mean(per_frame, axis=-1)
    denom = jnp.maximum(jnp.sum(mask, axis=-1), 1.0)
    return jnp.sum(per_frame * mask, axis=-1) / denom
