"""WaveRNN-class neural vocoder: mu-law sample-level GRU conditioned on the
54-d acoustic features.

Capability extension (reference surface: FeatureDatasetNeuVoco,
src/utils/dataset.py:517-563, defines the wav+feature pairing but ships no
vocoder; BASELINE.json config 5 asks for a "WaveNet-like vocoder sampling
loop in Pallas").

TPU-first design:
  * Training is teacher-forced: the sample-level feedback is ground truth, so
    the only sequential op is the GRU hidden recurrence — one ``lax.scan``
    over samples, batched over clips; input-side projections (conditioning +
    embedded previous sample) are hoisted into big parallel matmuls.
  * The embedding side is FUSED with the GRU input projection: the previous
    sample takes one of 256 discrete values, so ``embed @ W_ih_embed^T`` is
    precomputed into a (256, 3H) gate table — generation needs only a row
    gather per step, no matmul (ops/pallas_wavernn).
  * Generation runs as a Pallas kernel (sequential grid, VMEM-resident
    weights, on-chip PRNG for Gumbel-max sampling) with an XLA scan fallback.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .layers import init_dense, xavier_uniform
from ..ops.gru_scan import _gru_cell


@dataclass(frozen=True)
class WaveRNNConfig:
    n_classes: int = 256          # mu-law quantization levels
    embed_dim: int = 128
    cond_dim: int = 128
    hidden_units: int = 896
    fc_dim: int = 128
    feat_dim: int = 54
    # speaker conditioning: when > 0 the conditioning input is the acoustic
    # features with an n_spk one-hot speaker code appended (multi-speaker
    # training pools every speaker's data into one model — the round-2
    # single-speaker vocoder was data-limited at ~4 min of speech)
    n_spk: int = 0
    # samples per frame — FRACTIONAL: 5 ms @ 22.05 kHz = 110.25 = 441/4.
    # The old integer hop (110) drifted ~14 ms over a 6 s utterance.
    hop: float = 110.25

    @property
    def cond_in_dim(self) -> int:
        return self.feat_dim + self.n_spk


def hop_fraction(cfg: WaveRNNConfig) -> Tuple[int, int]:
    """Exact rational (num, den) for the samples-per-frame hop."""
    from fractions import Fraction
    fr = Fraction(cfg.hop).limit_denominator(1000)
    return fr.numerator, fr.denominator


def n_samples_for(cfg: WaveRNNConfig, n_frames: int) -> int:
    num, den = hop_fraction(cfg)
    return n_frames * num // den


# ---------------------------------------------------------------------------
# mu-law codec
# ---------------------------------------------------------------------------

def mulaw_encode(x: jnp.ndarray, n_classes: int = 256) -> jnp.ndarray:
    """[-1, 1] float -> [0, n_classes) int mu-law indices."""
    mu = n_classes - 1
    y = jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / jnp.log1p(mu)
    return jnp.clip(((y + 1.0) / 2.0 * mu + 0.5), 0, mu).astype(jnp.int32)


def mulaw_decode(idx: jnp.ndarray, n_classes: int = 256) -> jnp.ndarray:
    mu = n_classes - 1
    y = 2.0 * idx.astype(jnp.float32) / mu - 1.0
    return jnp.sign(y) * (jnp.expm1(jnp.abs(y) * jnp.log1p(mu))) / mu


# ---------------------------------------------------------------------------
# params / cond net
# ---------------------------------------------------------------------------

def init_wavernn(key, cfg: WaveRNNConfig) -> Dict:
    ks = jax.random.split(key, 6)
    H = cfg.hidden_units
    in_dim = cfg.embed_dim + cfg.cond_dim
    return {
        "embed": xavier_uniform(ks[0], (cfg.n_classes, cfg.embed_dim)),
        "cond": init_dense(ks[1], cfg.cond_in_dim, cfg.cond_dim),
        "gru": {
            "w_ih": xavier_uniform(ks[2], (3 * H, in_dim)),
            "w_hh": xavier_uniform(ks[3], (3 * H, H)),
            "b_ih": jnp.zeros((3 * H,)),
            "b_hh": jnp.zeros((3 * H,)),
        },
        "fc1": init_dense(ks[4], H, cfg.fc_dim),
        "fc2": init_dense(ks[5], cfg.fc_dim, cfg.n_classes),
    }


def upsample_cond(params: Dict, cfg: WaveRNNConfig,
                  feats: jnp.ndarray) -> jnp.ndarray:
    """(B, F, feat_dim) frame features -> (B, n_samples_for(F), cond_dim) by
    dense + TRUE-fractional-hop linear interpolation: sample n sits at frame
    position (n + 0.5)/hop - 0.5, so conditioning stays sample-accurate for
    non-integer hops (110.25 @ 22.05 kHz/5 ms; nearest-repeat of 110 drifted
    ~14 ms over 6 s).  One static gather + lerp — TPU-friendly."""
    c = jnp.tanh(feats @ params["cond"]["w"].T + params["cond"]["b"])
    F = c.shape[1]
    N = n_samples_for(cfg, F)
    pos = (jnp.arange(N) + 0.5) * (F / N) - 0.5
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, F - 1)
    i1 = jnp.minimum(i0 + 1, F - 1)
    w = jnp.clip(pos - i0, 0.0, 1.0)[None, :, None]
    return c[:, i0] * (1.0 - w) + c[:, i1] * w


def embed_gate_table(params: Dict) -> jnp.ndarray:
    """(n_classes, 3H) fused table: embed -> input-gate contribution."""
    w_emb = params["gru"]["w_ih"][:, :params["embed"].shape[1]]
    return params["embed"] @ w_emb.T


def _logits(params: Dict, h: jnp.ndarray) -> jnp.ndarray:
    f = jax.nn.relu(h @ params["fc1"]["w"].T + params["fc1"]["b"])
    return f @ params["fc2"]["w"].T + params["fc2"]["b"]


def teacher_forced_logits(params: Dict, cfg: WaveRNNConfig,
                          cond: jnp.ndarray, prev_idx: jnp.ndarray,
                          h0: Optional[jnp.ndarray] = None
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Training forward: cond (B, T, cond_dim), prev_idx (B, T) ground-truth
    previous samples.  Returns (logits (B, T, n_classes), h_T)."""
    B, T, _ = cond.shape
    H = cfg.hidden_units
    emb_tab = embed_gate_table(params)                       # (K, 3H)
    w_cond = params["gru"]["w_ih"][:, cfg.embed_dim:]
    gates_x = (cond @ w_cond.T + params["gru"]["b_ih"]
               + emb_tab[prev_idx])                          # (B, T, 3H)
    if h0 is None:
        h0 = jnp.zeros((B, H))

    gx_t = jnp.swapaxes(gates_x, 0, 1)

    def step(h, gx):
        h_new = _gru_cell(gx, h, params["gru"]["w_hh"],
                          params["gru"]["b_hh"], H)
        return h_new, h_new

    h_T, hs = jax.lax.scan(step, h0, gx_t)
    hs = jnp.swapaxes(hs, 0, 1)                              # (B, T, H)
    return _logits(params, hs), h_T


def wavernn_loss(params: Dict, cfg: WaveRNNConfig, feats: jnp.ndarray,
                 wav: jnp.ndarray) -> jnp.ndarray:
    """Teacher-forced NLL: feats (B, F, feat_dim), wav (B, F*hop) in [-1, 1]."""
    cond = upsample_cond(params, cfg, feats)
    idx = mulaw_encode(wav, cfg.n_classes)                   # (B, T)
    prev = jnp.concatenate(
        [jnp.full_like(idx[:, :1], cfg.n_classes // 2), idx[:, :-1]], axis=1)
    logits, _ = teacher_forced_logits(params, cfg, cond, prev)
    logp = jax.nn.log_softmax(logits)
    nll = -jnp.take_along_axis(logp, idx[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def generate_xla(params: Dict, cfg: WaveRNNConfig, key, cond: jnp.ndarray,
                 temperature: float = 1.0) -> jnp.ndarray:
    """XLA-scan AR sampler (fallback / reference for the Pallas kernel).
    cond (T, cond_dim) -> sampled mu-law indices (T,)."""
    H = cfg.hidden_units
    emb_tab = embed_gate_table(params)
    w_cond = params["gru"]["w_ih"][:, cfg.embed_dim:]
    cond_gates = cond @ w_cond.T + params["gru"]["b_ih"]     # (T, 3H)

    def step(carry, inp):
        h, prev = carry
        gx_cond, k = inp
        gx = gx_cond + emb_tab[prev]
        h_new = _gru_cell(gx[None], h[None], params["gru"]["w_hh"],
                          params["gru"]["b_hh"], H)[0]
        logits = _logits(params, h_new[None])[0]
        if temperature > 0:
            g = -jnp.log(-jnp.log(jax.random.uniform(
                k, logits.shape, minval=1e-9, maxval=1.0)))
            idx = jnp.argmax(logits / temperature + g)
        else:
            idx = jnp.argmax(logits)
        return (h_new, idx.astype(jnp.int32)), idx.astype(jnp.int32)

    T = cond.shape[0]
    keys = jax.random.split(key, T)
    (h, _), idxs = jax.lax.scan(
        step, (jnp.zeros((H,)), jnp.int32(cfg.n_classes // 2)),
        (cond_gates, keys))
    return idxs
