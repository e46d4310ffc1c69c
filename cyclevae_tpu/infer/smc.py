"""Sequential Monte Carlo over frame-sequence latents (bootstrap filter).

The frame-sequence latent z_{1:T} of the CycleVAE decoder is a state-space
model: prior z_t ~ N(0, I), observation x_t ~ Laplace(dec(z)_t, b) where the
decoder is autoregressive — so each PARTICLE carries the decoder's recurrent
state (GRU hidden h, AR feedback y).  The filter is one ``lax.scan`` over
time with particles as a vmapped batch axis; throughput scales by sharding
PARTICLES on the ``dp`` mesh axis (SURVEY.md §2.3):

  * weight normalization = psum over the particle axis,
  * systematic resampling uses a global cumulative distribution — computed
    from an all-gathered weight vector (small: n_particles floats), while the
    particle STATE exchange stays an all_gather over ICI.

Generic: ``smc_filter`` takes (init, propagate, log_weight) callables, so the
same engine runs the decoder SSM and test targets (linear-Gaussian vs Kalman).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class SMCConfig(NamedTuple):
    n_particles: int = 256
    ess_threshold: float = 0.5   # resample when ESS/N drops below this
    resample: str = "systematic"


def systematic_resample_indices(key, log_w: jnp.ndarray) -> jnp.ndarray:
    """Systematic resampling: N ancestors from normalized weights."""
    n = log_w.shape[0]
    w = jax.nn.softmax(log_w)
    cum = jnp.cumsum(w)
    u0 = jax.random.uniform(key, (), minval=0.0, maxval=1.0 / n)
    pts = u0 + jnp.arange(n) / n
    return jnp.searchsorted(cum, pts)


def smc_filter(
    key: jax.Array,
    T: int,
    init: Callable[[jax.Array], any],
    propagate: Callable[[jax.Array, any, int], any],
    log_weight: Callable[[any, int], jnp.ndarray],
    cfg: SMCConfig = SMCConfig(),
    store: Optional[Callable[[any], any]] = None,
) -> Tuple[any, dict]:
    """Bootstrap particle filter.

    init(key) -> particle state pytree (single particle)
    propagate(key, state, t) -> new state (single particle, one step)
    log_weight(state, t) -> incremental log-likelihood of observation t
    store(state) -> per-step value to record for SMOOTHING (e.g. the latent
    z_t); when given, info carries the genealogy: ``stored`` (T, n, ...)
    pre-resample values and ``ancestors`` (T, n) resampling indices, which
    ``trace_ancestry``/``smc_smoothed_trajectories`` turn into full-trajectory
    posterior draws aligned with the final weights.

    Returns (final particle states (vmapped pytree), info with
    log_marginal (SMC estimate of log p(x_{1:T})), ess trajectory,
    resampled flags).
    """
    n = cfg.n_particles
    key, k_init = jax.random.split(key)
    states = jax.vmap(init)(jax.random.split(k_init, n))

    def step(carry, t):
        key, states, log_w, log_Z = carry
        key, k_prop, k_res = jax.random.split(key, 3)
        states = jax.vmap(lambda k, s: propagate(k, s, t))(
            jax.random.split(k_prop, n), states)
        log_inc = jax.vmap(lambda s: log_weight(s, t))(states)
        log_w = log_w + log_inc
        stored = jax.vmap(store)(states) if store is not None else None

        # marginal-likelihood increment + ESS
        log_sum = jax.nn.logsumexp(log_w)
        w_norm = jnp.exp(log_w - log_sum)
        ess = 1.0 / jnp.sum(w_norm ** 2)

        def do_resample(args):
            key_r, states, log_w = args
            idx = systematic_resample_indices(key_r, log_w)
            states_r = jax.tree_util.tree_map(lambda x: x[idx], states)
            # after resampling: uniform weights carrying the average weight
            log_w_r = jnp.full((n,), log_sum - jnp.log(n))
            return states_r, log_w_r, jnp.asarray(True), idx

        def no_resample(args):
            _, states, log_w = args
            return states, log_w, jnp.asarray(False), jnp.arange(n)

        states, log_w, resampled, anc = jax.lax.cond(
            ess < cfg.ess_threshold * n, do_resample, no_resample,
            (k_res, states, log_w))
        out = (ess, resampled) if store is None else (ess, resampled,
                                                      stored, anc)
        return (key, states, log_w, log_Z), out

    log_w0 = jnp.full((n,), -jnp.log(n))
    (key, states, log_w, _), outs = jax.lax.scan(
        step, (key, states, log_w0, 0.0), jnp.arange(T))
    log_marginal = jax.nn.logsumexp(log_w)
    info = {"log_marginal": log_marginal, "ess": outs[0],
            "resampled": outs[1], "log_w": log_w}
    if store is not None:
        info["stored"], info["ancestors"] = outs[2], outs[3]
    return states, info


def trace_ancestry(stored, ancestors: jnp.ndarray):
    """Turn filter genealogy into full-trajectory draws (ancestor tracing).

    ``stored``: pytree with leading (T, n, ...) — the PRE-resample per-step
    values; ``ancestors``: (T, n) where ancestors[t][j] is the pre-resample
    index at time t of post-resample particle j (identity when step t did not
    resample).  Returns a pytree (T, n, ...) where lane j is the complete
    time trajectory of FINAL particle j — weight it with softmax(final log_w).

    This is the O(T·n) genealogy smoother: exact draws from the SMC
    approximation of p(z_{1:T} | x_{1:T}) (degeneracy caveat: deep ancestry
    collapses onto few lineages for T >> resampling interval; raise
    n_particles or use the guided proposal to push resampling times out).
    """
    T, n = ancestors.shape

    def back(idx, t):
        pre = ancestors[t][idx]
        vals = jax.tree_util.tree_map(lambda x: x[t][pre], stored)
        return pre, vals

    _, traj_rev = jax.lax.scan(back, jnp.arange(n),
                               jnp.arange(T - 1, -1, -1))
    return jax.tree_util.tree_map(lambda x: jnp.flip(x, axis=0), traj_rev)


def smc_smoothed_trajectories(info: dict):
    """(trajectories (T, n, ...), normalized final weights (n,)) from a
    ``store=``-enabled smc_filter/smc_filter_sharded info dict.  The smoothed
    posterior mean at t is ``einsum('nj,tn...->t...', w, traj)``."""
    traj = trace_ancestry(info["stored"], info["ancestors"])
    w = jax.nn.softmax(info["log_w"])
    return traj, w


# ---------------------------------------------------------------------------
# CycleVAE decoder SSM wiring
# ---------------------------------------------------------------------------

def make_decoder_ssm(params, cfg, feats, spk_code, obs_scale: float = 1.0,
                     proposal: str = "prior",
                     enc_lat: "jnp.ndarray" = None,
                     guide_weight: float = 1.0):
    """(init, propagate, log_weight) for SMC over the decoder's frame latents.

    Each particle state: {z_t, gru hidden h (L, H), AR feedback y, out_t}.

    proposal="prior": bootstrap filter, z_t ~ N(0, I).
    proposal="amortized": GUIDED filter — z_t drawn from a tempered version
    of the amortized encoder posterior q(z_t | x) = N(mu_t, sigma_t^2) (pass
    ``enc_lat`` = encoder output (T, 2*lat)); the weight carries the
    importance correction log N(z; 0, I) - log proposal(z).
    ``guide_weight`` w in (0, 1] tempers the guide toward the prior:
    proposal = N(w*mu_t, w*sigma_t^2 + (1-w)) — w=1 is the raw encoder
    posterior, w->0 recovers the bootstrap filter.

    Measured behaviour (DIAG_SMC_AMORTIZED*.json + RESULTS.md [r5], trained
    hu1024 flagship): the raw guide (w=1) pays KL(q||prior) — ~2.8
    nats/frame on real speech, up to ~14 on out-of-distribution input —
    that the center-tap SSM's likelihood gain does not cover; it loses
    log-marginal and ESS in every measured regime.  The TEMPERED guide
    (w≈0.3–0.5) beats bootstrap on both metrics over short (~64-frame)
    windows, but over long filters (T≥256) the proposal/model mismatch
    (q was trained against the full two-sided-conv decoder, the SSM weights
    with the center-tap approximation) compounds through the AR state and
    the prior proposal wins by hundreds of nats.  RECOMMENDED DEFAULT:
    proposal="prior"; use the tempered guide only for short fixed-lag
    windows.
    """
    from ..models.layers import dilconv_effective, window_gather
    from ..ops.gru_scan import _gru_cell

    dec_cfg = cfg.dec_cfg
    mcep = feats[..., cfg.stdim:]
    import math
    beta = (10.0 / math.log(10.0)) * math.sqrt(2.0) / obs_scale
    s_out = params.decoder["scale_out"]
    y0 = (0.0 - s_out["mean"]) / s_out["scale"]
    gru = params.decoder["gru"]
    out_p = params.decoder["out"]
    hidden = gru[0]["w_hh"].shape[1]
    n_layers = len(gru)
    lat_dim = cfg.lat_dim

    # Conv context depends on a window of z values; for the bootstrap SSM we
    # use the per-frame center tap only (kernel context of the sampled z
    # trajectory would make the state non-Markov).  The effective center-tap
    # weight comes from the composed conv operator.
    w_eff, b_eff = dilconv_effective(params.decoder["conv"], dec_cfg.kernel_size)
    rec = dec_cfg.rec_field
    c_in = dec_cfg.in_dim
    center = (rec // 2) * c_in
    w_center = w_eff[center:center + c_in, :]  # (in_dim, conv_dim)

    if proposal == "amortized":
        assert enc_lat is not None, "amortized proposal needs enc_lat"
        w = guide_weight
        q_mu = w * enc_lat[..., :lat_dim]
        # tempered variance: w*sigma^2 + (1-w), in log space for the draw
        q_logvar = jnp.log(w * jnp.exp(enc_lat[..., lat_dim:]) + (1.0 - w))

    def init(key):
        state = {
            "h": jnp.zeros((n_layers, hidden)),
            "y": y0,
            "out": jnp.zeros((cfg.out_dim,)),
            "z": jnp.zeros((lat_dim,)),
        }
        if proposal == "amortized":
            state["log_iw"] = jnp.zeros(())  # importance correction of step t
        return state

    def propagate(key, state, t):
        eps = jax.random.normal(key, (lat_dim,))
        if proposal == "amortized":
            z = q_mu[t] + jnp.exp(0.5 * q_logvar[t]) * eps
            # log N(z; 0, I) - log q(z | x): prior / proposal correction
            log_p = -0.5 * jnp.sum(z ** 2)
            log_q = -0.5 * jnp.sum(q_logvar[t] + eps ** 2)
            state = dict(state, log_iw=log_p - log_q)
        else:
            z = eps
        x_t = jnp.concatenate([spk_code[t], z])          # (in_dim,)
        conv_t = x_t @ w_center + b_eff                  # (conv_dim,)
        gx = (jnp.concatenate([conv_t, state["y"]])
              @ gru[0]["w_ih"].T + gru[0]["b_ih"])
        h = state["h"]
        new_h = []
        inp_gates = gx
        for l in range(n_layers):
            if l > 0:
                inp_gates = new_h[l - 1] @ gru[l]["w_ih"].T + gru[l]["b_ih"]
            h_l = _gru_cell(inp_gates, h[l], gru[l]["w_hh"], gru[l]["b_hh"],
                            hidden)
            new_h.append(h_l)
        y = new_h[-1] @ out_p["w"].T + out_p["b"]
        out = y * s_out["scale"] + s_out["mean"]
        new_state = {"h": jnp.stack(new_h), "y": y, "out": out, "z": z}
        if proposal == "amortized":
            new_state["log_iw"] = state["log_iw"]
        return new_state

    def log_weight(state, t):
        lw = -beta * jnp.sum(jnp.abs(state["out"] - mcep[t]))
        if proposal == "amortized":
            lw = lw + state["log_iw"]
        return lw

    return init, propagate, log_weight


def smc_filter_sharded(mesh, key, T, init, propagate, log_weight,
                       cfg: SMCConfig = SMCConfig(), store=None):
    """Particles sharded on the dp axis via shard_map.  Weight normalization
    and ESS are psum'd; systematic resampling all-gathers the (small) weight
    vector to index into the all-gathered particle states.

    ``store``: as in smc_filter — records pre-resample per-step values and
    GLOBAL ancestor indices; info["stored"] comes back (T, n, ...) with the
    particle axis dp-sharded and info["ancestors"]/"log_w" replicated, so
    ``trace_ancestry``/``smc_smoothed_trajectories`` apply unchanged."""
    from jax.sharding import PartitionSpec as P

    n = cfg.n_particles
    n_dev = mesh.devices.size
    assert n % n_dev == 0
    key, shared_key = jax.random.split(key)

    def local(keys, shared_key):
        # NOTE: systematic resampling must draw the SAME u0 on every device,
        # so the resample key derives from the replicated shared_key + t,
        # never from the per-device stream.
        n_local = n // n_dev
        key = keys[0]
        key, k_init = jax.random.split(key)
        states = jax.vmap(init)(jax.random.split(k_init, n_local))

        def step(carry, t):
            key, states, log_w, _ = carry
            key, k_prop = jax.random.split(key)
            k_res = jax.random.fold_in(shared_key, t)
            states = jax.vmap(lambda k, s: propagate(k, s, t))(
                jax.random.split(k_prop, n_local), states)
            log_inc = jax.vmap(lambda s: log_weight(s, t))(states)
            log_w = log_w + log_inc
            stored = jax.vmap(store)(states) if store is not None else None
            dev = jax.lax.axis_index("dp")
            ident = dev * n_local + jnp.arange(n_local)  # global self-indices

            # global normalization via collectives
            local_max = jnp.max(log_w)
            gmax = jax.lax.pmax(local_max, "dp")
            sum_exp = jax.lax.psum(jnp.sum(jnp.exp(log_w - gmax)), "dp")
            log_sum = gmax + jnp.log(sum_exp)
            ess = 1.0 / jax.lax.psum(
                jnp.sum(jnp.exp(2.0 * (log_w - log_sum))), "dp")

            def do_resample(args):
                k_res, states, log_w = args
                # gather the full weight vector + states, then pick this
                # device's slice of ancestors
                all_w = jax.lax.all_gather(log_w, "dp").reshape(-1)
                all_states = jax.tree_util.tree_map(
                    lambda x: jax.lax.all_gather(x, "dp").reshape(
                        (-1,) + x.shape[1:]), states)
                idx_all = systematic_resample_indices(k_res, all_w)
                idx_local = jax.lax.dynamic_slice_in_dim(
                    idx_all, dev * n_local, n_local)
                states_r = jax.tree_util.tree_map(lambda x: x[idx_local],
                                                  all_states)
                # mark device-varying (the value is replicated arithmetic,
                # but the carry slot is a per-device array)
                log_w_r = jax.lax.pcast(
                    jnp.full((n_local,), log_sum - jnp.log(n)), "dp",
                    to="varying")
                return states_r, log_w_r, jnp.asarray(True), idx_local

            def no_resample(args):
                _, states, log_w = args
                return states, log_w, jnp.asarray(False), ident

            states, log_w, resampled, anc_local = jax.lax.cond(
                ess < cfg.ess_threshold * n, do_resample, no_resample,
                (k_res, states, log_w))
            out = (ess, resampled)
            if store is not None:
                out = out + (stored, anc_local)
            return (key, states, log_w, log_sum), out

        def _vary(x):
            return jax.lax.pcast(x, "dp", to="varying")

        log_w0 = _vary(jnp.full((n_local,), -jnp.log(n)))
        states = jax.tree_util.tree_map(_vary, states)
        (key, states, log_w, _), outs = jax.lax.scan(
            step, (key, states, log_w0, 0.0), jnp.arange(T))
        lmax = jax.lax.pmax(jnp.max(log_w), "dp")
        log_marginal = lmax + jnp.log(
            jax.lax.psum(jnp.sum(jnp.exp(log_w - lmax)), "dp"))
        info = {"log_marginal": log_marginal, "ess": outs[0],
                "resampled": outs[1]}
        if store is not None:
            info["stored"], info["anc_local"] = outs[2], outs[3]
        return states, info, log_w

    keys = jax.random.split(key, n_dev)
    out_specs = ({"log_marginal": P(), "ess": P(), "resampled": P()}
                 if store is None else
                 {"log_marginal": P(), "ess": P(), "resampled": P(),
                  "stored": P(None, "dp"), "anc_local": P(None, "dp")})
    fn = jax.shard_map(local, mesh=mesh, in_specs=(P("dp"), P()),
                       out_specs=(P("dp"), out_specs, P("dp")))
    states, info, log_w = fn(keys, shared_key)
    if store is not None:
        info["ancestors"] = info.pop("anc_local")  # already global indices
        info["log_w"] = log_w
    return states, info
