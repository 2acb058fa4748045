"""Denoising loops as ``lax.scan``-compiled pure step functions.

The reference runs Python for-loops that call the model once per step with a
mutable text-emb cache (kandinsky2/model/gaussian_diffusion.py:427-475,
kandinsky2/model/samplers.py:205-331, 474-637).  Here each sampler family is a
pure ``step(x, index) -> x`` function scanned on device, so an entire
prior/decoder denoising trajectory compiles to one XLA program.  Conditioning
is encoded once by the caller and closed over by ``model_fn``; classifier-free
guidance batch-doubling happens inside ``model_fn``.

``model_fn(x, t_model)`` contract:
  * ``x``: current sample, batch ``B`` (the *useful* half; CFG doubling is the
    model_fn's business).
  * ``t_model``: float32 [B] timestep values as the network expects them
    (already mapped through timestep_map / rescaled).
  * returns the (already guidance-mixed) model output, with variance channels
    when the sampler needs them.

Stateful variant (``model_state`` argument): when a loop receives an initial
``model_state`` pytree, ``model_fn(x, t_model, state, pos) -> (out, state)``
and the state rides the scan carry.  This powers cross-step feature caching
(DeepCache-style turbo mode, ops-level cache of the UNet's deep branch) —
``pos`` is the 0-based ladder position so the model can decide refresh steps.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import schedules as _sched
from .gaussian import (
    MeanType,
    Schedule,
    VarType,
    extract,
    p_mean_variance,
    predict_eps_from_xstart,
)

__all__ = [
    "p_sample_loop",
    "ddim_respaced_loop",
    "DDIMTables",
    "make_ddim_tables",
    "ddim_loop",
    "plms_loop",
    "DPMTables",
    "make_dpmpp_tables",
    "make_dpmpp_karras_tables",
    "dpmpp_2m_loop",
]


def _step_noise(rng, noise_seq, i_pos, shape, dtype):
    """Per-step noise: from an injected sequence (parity tests) or fold_in."""
    if noise_seq is not None:
        return noise_seq[i_pos]
    return jax.random.normal(jax.random.fold_in(rng, i_pos), shape, dtype)


def p_sample_loop(
    model_fn: Callable,
    sched: Schedule,
    x_T: jnp.ndarray,
    rng: Optional[jax.Array] = None,
    *,
    mean_type: MeanType = MeanType.EPSILON,
    var_type: VarType = VarType.LEARNED_RANGE,
    clip_denoised: bool = True,
    denoised_fn: Optional[Callable] = None,
    init_step: Optional[int] = None,
    noise_seq: Optional[jnp.ndarray] = None,
    channel_axis: int = 1,
    model_state=None,
    threshold_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Ancestral sampling loop (gaussian_diffusion.py:352-475) as one scan.

    ``init_step`` truncates the ladder for img2img
    (gaussian_diffusion.py:453-455). ``noise_seq`` optionally injects the
    per-step Gaussian noise ([num_steps, *x.shape], ordered from t=T-1 down)
    for bit-exact comparison against the reference.  With ``model_state``
    the stateful contract applies (module docstring).  ``threshold_axis``:
    mesh axis the dynamic-threshold percentile spans under row-sharded
    spatial parallelism.
    """
    num = sched.num_timesteps if init_step is None else init_step
    indices = jnp.arange(num - 1, -1, -1, dtype=jnp.int32)
    B = x_T.shape[0]
    stateful = model_state is not None

    def step(carry, scan_in):
        x, state = carry
        pos, i = scan_in
        t = jnp.full((B,), i, dtype=jnp.int32)
        if stateful:
            model_out, state = model_fn(x, sched.model_timesteps(t), state, pos)
        else:
            model_out = model_fn(x, sched.model_timesteps(t))
        out = p_mean_variance(
            sched,
            model_out.astype(jnp.float32),
            x,
            t,
            mean_type=mean_type,
            var_type=var_type,
            clip_denoised=clip_denoised,
            denoised_fn=denoised_fn,
            channel_axis=channel_axis,
            threshold_axis=threshold_axis,
        )
        noise = _step_noise(rng, noise_seq, pos, x.shape, x.dtype)
        nonzero = (t != 0).astype(x.dtype).reshape((B,) + (1,) * (x.ndim - 1))
        sample = out["mean"] + nonzero * jnp.exp(0.5 * out["log_variance"]) * noise
        return (sample, state), None

    positions = jnp.arange(num, dtype=jnp.int32)
    (x, _), _ = jax.lax.scan(
        step, (x_T.astype(jnp.float32), model_state), (positions, indices)
    )
    return x


def ddim_respaced_loop(
    model_fn: Callable,
    sched: Schedule,
    x_T: jnp.ndarray,
    rng: Optional[jax.Array] = None,
    *,
    mean_type: MeanType = MeanType.EPSILON,
    var_type: VarType = VarType.LEARNED_RANGE,
    clip_denoised: bool = True,
    denoised_fn: Optional[Callable] = None,
    eta: float = 0.0,
    noise_seq: Optional[jnp.ndarray] = None,
    channel_axis: int = 1,
) -> jnp.ndarray:
    """DDIM over a respaced schedule (gaussian_diffusion.py:477-635).

    Used by the prior when ``timestep_respacing`` starts with "ddim"."""
    num = sched.num_timesteps
    indices = jnp.arange(num - 1, -1, -1, dtype=jnp.int32)
    B = x_T.shape[0]

    def step(x, scan_in):
        pos, i = scan_in
        t = jnp.full((B,), i, dtype=jnp.int32)
        model_out = model_fn(x, sched.model_timesteps(t))
        out = p_mean_variance(
            sched,
            model_out.astype(jnp.float32),
            x,
            t,
            mean_type=mean_type,
            var_type=var_type,
            clip_denoised=clip_denoised,
            denoised_fn=denoised_fn,
            channel_axis=channel_axis,
        )
        eps = predict_eps_from_xstart(sched, x, t, out["pred_xstart"])
        nd = x.ndim
        alpha_bar = extract(sched.alphas_cumprod, t, nd)
        alpha_bar_prev = extract(sched.alphas_cumprod_prev, t, nd)
        sigma = (
            eta
            * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
            * jnp.sqrt(1 - alpha_bar / alpha_bar_prev)
        )
        mean_pred = (
            out["pred_xstart"] * jnp.sqrt(alpha_bar_prev)
            + jnp.sqrt(1 - alpha_bar_prev - sigma**2) * eps
        )
        if eta == 0.0:
            return mean_pred, None
        noise = _step_noise(rng, noise_seq, pos, x.shape, x.dtype)
        nonzero = (t != 0).astype(x.dtype).reshape((B,) + (1,) * (nd - 1))
        return mean_pred + nonzero * sigma * noise, None

    positions = jnp.arange(num, dtype=jnp.int32)
    x, _ = jax.lax.scan(step, x_T.astype(jnp.float32), (positions, indices))
    return x


class DDIMTables(NamedTuple):
    """Per-ladder-step constants for the standalone DDIM/PLMS samplers
    (samplers.py:82-149), precomputed host-side in float64."""

    timesteps: jnp.ndarray  # int32 [S] ladder values fed to the model
    alphas: jnp.ndarray  # float32 [S]
    alphas_prev: jnp.ndarray
    sqrt_one_minus_alphas: jnp.ndarray
    sigmas: jnp.ndarray


def make_ddim_tables(
    base_alphas_cumprod: np.ndarray,
    num_steps: int,
    *,
    num_ddpm_steps: int = 1000,
    eta: float = 0.0,
    init_step: Optional[int] = None,
) -> DDIMTables:
    """Build the ladder + tables used by DDIMSampler/PLMSSampler.make_schedule
    (samplers.py:82-149), including img2img truncation (samplers.py:11-18)."""
    if len(base_alphas_cumprod) != num_ddpm_steps:
        raise ValueError(
            "make_ddim_tables needs the *base* (un-respaced) alphas_cumprod of "
            f"length {num_ddpm_steps}, got {len(base_alphas_cumprod)}; pass the "
            "full-process schedule, not a respaced one"
        )
    ladder = _sched.ddim_ladder(num_steps, num_ddpm_steps, init_step=init_step)
    sigmas, alphas, alphas_prev = _sched.ddim_sampling_parameters(
        np.asarray(base_alphas_cumprod, dtype=np.float64), ladder, eta
    )
    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    return DDIMTables(
        timesteps=jnp.asarray(ladder, dtype=jnp.int32),
        alphas=f32(alphas),
        alphas_prev=f32(alphas_prev),
        sqrt_one_minus_alphas=f32(np.sqrt(1.0 - alphas)),
        sigmas=f32(sigmas),
    )


def _ddim_update(tables: DDIMTables, x, e_t, index, noise):
    """x_{t-1} from eps at ladder ``index`` (samplers.py:310-331)."""
    nd = x.ndim
    shp = (1,) * nd
    a_t = tables.alphas[index].reshape(shp)
    a_prev = tables.alphas_prev[index].reshape(shp)
    sigma_t = tables.sigmas[index].reshape(shp)
    sqrt_one_minus_at = tables.sqrt_one_minus_alphas[index].reshape(shp)
    pred_x0 = (x - sqrt_one_minus_at * e_t) / jnp.sqrt(a_t)
    dir_xt = jnp.sqrt(1.0 - a_prev - sigma_t**2) * e_t
    x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt + sigma_t * noise
    return x_prev, pred_x0


def ddim_loop(
    model_fn: Callable,
    tables: DDIMTables,
    x_T: jnp.ndarray,
    rng: Optional[jax.Array] = None,
    *,
    eta: float = 0.0,
    noise_seq: Optional[jnp.ndarray] = None,
    model_state=None,
) -> jnp.ndarray:
    """Latent-diffusion-style DDIM loop (samplers.py:205-331), scanned.

    ``model_fn`` returns eps only (guidance already applied).  With
    ``model_state`` the stateful contract applies (module docstring)."""
    total = int(tables.timesteps.shape[0])
    B = x_T.shape[0]
    stateful = model_state is not None

    def step(carry, pos):
        x, state = carry
        index = total - pos - 1
        ts = jnp.full((B,), tables.timesteps[index], dtype=jnp.float32)
        if stateful:
            e_t, state = model_fn(x, ts, state, pos)
        else:
            e_t = model_fn(x, ts)
        e_t = e_t.astype(jnp.float32)
        if eta == 0.0:
            noise = jnp.zeros_like(x)
        else:
            noise = _step_noise(rng, noise_seq, pos, x.shape, x.dtype)
        x_prev, _ = _ddim_update(tables, x, e_t, index, noise)
        return (x_prev, state), None

    (x, _), _ = jax.lax.scan(
        step, (x_T.astype(jnp.float32), model_state),
        jnp.arange(total, dtype=jnp.int32),
    )
    return x


class DPMTables(NamedTuple):
    """Per-step constants for DPM-Solver++(2M), stored in *walk order*
    (pos 0 = largest t), precomputed host-side in float64.

    Beyond-reference sampler: the reference ships only DDIM/PLMS
    (samplers.py:68-637); DPM-Solver++ is a second-order exponential
    integrator of the same probability-flow ODE (data-prediction
    formulation), reaching DDIM-50 quality in ~20-25 steps.  It shares the
    reference's uniform timestep ladder (samplers.py:33-51) so step counts
    and img2img ``init_step`` truncation behave identically."""

    timesteps: jnp.ndarray  # [S] ladder values fed to the model (int for the
    #   discrete ladders; float32 continuous t for the Karras grid)
    alpha: jnp.ndarray  # float32 [S] sqrt(abar_t)
    sigma: jnp.ndarray  # float32 [S] sqrt(1-abar_t)
    sigma_ratio: jnp.ndarray  # sigma_{t_next} / sigma_t
    alpha_next: jnp.ndarray  # sqrt(abar_{t_next})
    phi: jnp.ndarray  # expm1(-h), h = lambda_next - lambda
    c2: jnp.ndarray  # h / (2 h_prev); 0 at pos 0 (first-order start)


def make_dpmpp_tables(
    base_alphas_cumprod: np.ndarray,
    num_steps: Optional[int] = None,
    *,
    num_ddpm_steps: int = 1000,
    init_step: Optional[int] = None,
    ladder: Optional[np.ndarray] = None,
) -> DPMTables:
    """DPM-Solver++(2M) tables over a timestep ladder.

    ``lambda_t = log(alpha_t / sigma_t)`` is the half-log-SNR; the 2M update
    integrates the data-prediction ODE exactly under a linear-in-lambda model
    of x0 (Lu et al., DPM-Solver++).  All tables are float64 host-side.

    Two ladder conventions, matching the two scheduler families:
    * default (``num_steps``): the reference's uniform DDIM ladder
      (samplers.py:33-51) with the LDM final target ``abar[0]``;
    * explicit ``ladder`` (descending, e.g. ``paired.ddpm_ladder``): the
      diffusers convention where the final step targets ``abar = 1`` —
      ``h`` is infinite there, so the last update degenerates (exactly) to
      returning the x0 prediction, matching a zero-final-sigma scheduler.
    """
    if len(base_alphas_cumprod) != num_ddpm_steps:
        raise ValueError(
            "make_dpmpp_tables needs the *base* (un-respaced) alphas_cumprod "
            f"of length {num_ddpm_steps}, got {len(base_alphas_cumprod)}; "
            "pass the full-process schedule, not a respaced one"
        )
    abar = np.asarray(base_alphas_cumprod, dtype=np.float64)
    if ladder is None:
        if num_steps is None:
            raise ValueError("pass num_steps or an explicit ladder")
        asc = _sched.ddim_ladder(num_steps, num_ddpm_steps, init_step=init_step)
        # same alphas/alphas_prev pairing the DDIM sampler uses
        _, alphas, alphas_prev = _sched.ddim_sampling_parameters(abar, asc, 0.0)
        cur = alphas[::-1]
        nxt = alphas_prev[::-1]
        ladder_desc = asc[::-1]
    else:
        ladder_desc = np.asarray(ladder, np.int64)
        if len(ladder_desc) > 1 and ladder_desc[0] < ladder_desc[-1]:
            raise ValueError("explicit ladder must be descending (walk order)")
        cur = abar[ladder_desc]
        nxt = np.append(abar[ladder_desc[1:]], 1.0)  # prev_t = -1 -> abar = 1
    return _dpm_tables_from_abar(
        cur, nxt, np.ascontiguousarray(ladder_desc).astype(np.float64)
    )


def _dpm_tables_from_abar(cur, nxt, t_values) -> DPMTables:
    """Shared 2M table math: walk-order abar pairs + model-facing t values."""
    with np.errstate(divide="ignore"):
        lam = lambda a: 0.5 * (np.log(a) - np.log1p(-a))
        h = lam(nxt) - lam(cur)  # > 0 while denoising; inf on a final abar=1
    c2 = np.zeros_like(h)
    c2[1:] = np.where(np.isinf(h[1:]), 0.0, h[1:] / (2.0 * h[:-1]))
    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    return DPMTables(
        timesteps=f32(t_values),
        alpha=f32(np.sqrt(cur)),
        sigma=f32(np.sqrt(1.0 - cur)),
        sigma_ratio=f32(np.sqrt((1.0 - nxt) / (1.0 - cur))),
        alpha_next=f32(np.sqrt(nxt)),
        phi=f32(np.expm1(-h)),  # expm1(-inf) = -1: final step emits x0
        c2=f32(c2),
    )


def make_dpmpp_tables_from_respaced(sched) -> DPMTables:
    """2M tables straight from a respaced ``Schedule`` (the prior's "25"):
    the kept steps' alphas_cumprod ARE the base values at the ladder
    (respace.py:89-96), and alphas_cumprod_prev supplies the walk targets
    (final target abar=1 -> the last step emits the x0 prediction).
    Model-facing t values go through ``timestep_map`` + rescaling, matching
    what the ancestral loop feeds the network."""
    acp = np.asarray(sched.alphas_cumprod, np.float64)
    prev = np.asarray(sched.alphas_cumprod_prev, np.float64)
    tm = np.asarray(sched.timestep_map, np.float64)
    if sched.rescale_timesteps:
        tm = tm * (1000.0 / sched.original_num_steps)
    return _dpm_tables_from_abar(acp[::-1], prev[::-1], tm[::-1])


def make_dpmpp_karras_tables(
    base_alphas_cumprod: np.ndarray,
    num_steps: int,
    *,
    num_ddpm_steps: int = 1000,
    rho: float = 7.0,
    init_step: Optional[int] = None,
) -> DPMTables:
    """DPM-Solver++(2M) tables over a Karras sigma grid (continuous time).

    Karras et al. (EDM) spacing concentrates steps where the ODE curvature
    lives: sigma_i = (smax^(1/rho) + i/(S-1)·(smin^(1/rho) - smax^(1/rho)))^rho.
    Each sigma maps back to a *continuous* model timestep by log-sigma
    interpolation over the discrete schedule (the timestep embedding is
    sinusoidal, so fractional t is well-defined).  The final step targets
    abar = 1 and therefore emits the x0 prediction (zero final sigma).
    ``init_step`` caps sigma_max for img2img ladder truncation."""
    if len(base_alphas_cumprod) != num_ddpm_steps:
        raise ValueError(
            "make_dpmpp_karras_tables needs the *base* (un-respaced) "
            f"alphas_cumprod of length {num_ddpm_steps}"
        )
    abar = np.asarray(base_alphas_cumprod, dtype=np.float64)
    sig_grid = np.sqrt((1.0 - abar) / abar)  # ascending in t
    t_hi = num_ddpm_steps - 1 if init_step is None else min(
        max(init_step - 1, 1), num_ddpm_steps - 1
    )
    smin, smax = sig_grid[0], sig_grid[t_hi]
    ramp = np.linspace(0.0, 1.0, num_steps)
    sigmas = (
        smax ** (1.0 / rho) + ramp * (smin ** (1.0 / rho) - smax ** (1.0 / rho))
    ) ** rho  # descending walk order
    # sigma -> continuous t by log-sigma interpolation
    t_cont = np.interp(np.log(sigmas), np.log(sig_grid), np.arange(num_ddpm_steps))
    cur = 1.0 / (1.0 + sigmas**2)  # abar at each walk position
    nxt = np.append(cur[1:], 1.0)  # final step targets abar = 1 (emit x0)
    return _dpm_tables_from_abar(cur, nxt, t_cont)


def dpmpp_2m_loop(
    model_fn: Callable,
    tables: DPMTables,
    x_T: jnp.ndarray,
    *,
    prediction: str = "epsilon",  # "epsilon" | "xstart"
    denoised_fn: Optional[Callable] = None,
    model_state=None,
) -> jnp.ndarray:
    """Deterministic DPM-Solver++(2M) loop, scanned.

    ``model_fn`` returns the (guidance-mixed) eps — or the x0 prediction
    directly with ``prediction="xstart"`` (the prior's convention,
    prior.py:268).  Second-order multistep: each step reuses the previous
    step's x0 prediction, so it costs exactly one model eval like DDIM.
    ``denoised_fn`` optionally post-processes each x0 prediction (clipping /
    inpaint blending).  With ``model_state`` the stateful (turbo) contract
    applies."""
    total = int(tables.timesteps.shape[0])
    B = x_T.shape[0]
    stateful = model_state is not None
    nd = x_T.ndim
    shp = (1,) * nd

    def step(carry, pos):
        x, x0_prev, state = carry
        ts = jnp.full((B,), tables.timesteps[pos], dtype=jnp.float32)
        if stateful:
            out, state = model_fn(x, ts, state, pos)
        else:
            out = model_fn(x, ts)
        out = out.astype(jnp.float32)
        alpha = tables.alpha[pos].reshape(shp)
        sigma = tables.sigma[pos].reshape(shp)
        if prediction == "xstart":
            x0 = out
        else:
            x0 = (x - sigma * out) / alpha
        if denoised_fn is not None:
            x0 = denoised_fn(x0)
        c = tables.c2[pos].reshape(shp)  # 0 at pos 0 -> D = x0
        D = (1.0 + c) * x0 - c * x0_prev
        x = (
            tables.sigma_ratio[pos].reshape(shp) * x
            - tables.alpha_next[pos].reshape(shp) * tables.phi[pos].reshape(shp) * D
        )
        return (x, x0, state), None

    (x, _, _), _ = jax.lax.scan(
        step,
        (x_T.astype(jnp.float32), jnp.zeros_like(x_T, jnp.float32), model_state),
        jnp.arange(total, dtype=jnp.int32),
    )
    return x


def plms_loop(
    model_fn: Callable,
    tables: DDIMTables,
    x_T: jnp.ndarray,
    *,
    model_state=None,
) -> jnp.ndarray:
    """PLMS (pseudo linear multistep) loop (samplers.py:474-637), scanned with
    a fixed-size eps-history buffer instead of a Python list.

    The first step's "pseudo improved Euler" needs a second model eval at
    ``t_next``; it is unrolled outside the scan so the scanned body stays a
    single model eval. PLMS is always eta=0 (samplers.py:356-357).
    With ``model_state`` the stateful contract applies (module docstring).
    """
    total = int(tables.timesteps.shape[0])
    B = x_T.shape[0]
    x = x_T.astype(jnp.float32)
    zero_noise = jnp.zeros_like(x)
    stateful = model_state is not None
    state = model_state

    def eval_model(x, index, state, pos):
        ts = jnp.full((B,), tables.timesteps[index], dtype=jnp.float32)
        if stateful:
            out, state = model_fn(x, ts, state, pos)
        else:
            out = model_fn(x, ts)
        return out.astype(jnp.float32), state

    # --- step 0 unrolled: improved Euler (samplers.py:618-622) ---
    index0 = total - 1
    e_t, state = eval_model(x, index0, state, jnp.asarray(0, jnp.int32))
    x_prev0, _ = _ddim_update(tables, x, e_t, index0, zero_noise)
    index_next = max(total - 2, 0)
    e_t_next, state = eval_model(
        x_prev0, index_next, state, jnp.asarray(0, jnp.int32)
    )
    e_t_prime = (e_t + e_t_next) / 2
    x, _ = _ddim_update(tables, x, e_t_prime, index0, zero_noise)

    # history: most recent last; padded with zeros, count tracks validity
    hist = jnp.stack([zero_noise, zero_noise, e_t])

    def step(carry, pos):
        x, hist, state = carry
        index = total - pos - 1
        e_t, state = eval_model(x, index, state, pos)
        n_old = jnp.minimum(pos, 3)  # number of valid history entries
        # Adams-Bashforth blends by history length (samplers.py:623-633)
        ab2 = (3 * e_t - hist[2]) / 2
        ab3 = (23 * e_t - 16 * hist[2] + 5 * hist[1]) / 12
        ab4 = (55 * e_t - 59 * hist[2] + 37 * hist[1] - 9 * hist[0]) / 24
        e_t_prime = jnp.where(n_old == 1, ab2, jnp.where(n_old == 2, ab3, ab4))
        x_prev, _ = _ddim_update(tables, x, e_t_prime, index, zero_noise)
        hist = jnp.stack([hist[1], hist[2], e_t])
        return (x_prev, hist, state), None

    if total > 1:
        (x, _, _), _ = jax.lax.scan(
            step, (x, hist, state), jnp.arange(1, total, dtype=jnp.int32)
        )
    return x
