"""Gaussian diffusion math as pure JAX functions over a schedule pytree.

This is the TPU-native counterpart of the reference's ``GaussianDiffusion`` /
``SpacedDiffusion`` classes (reference: kandinsky2/model/gaussian_diffusion.py,
kandinsky2/model/respace.py).  Design differences, deliberate:

* All schedule arrays are precomputed host-side in float64 (matching the
  reference's numpy accuracy) and stored as float32 device constants inside a
  :class:`Schedule` dataclass that is a registered pytree, so samplers can be
  ``jax.jit``-ed / ``lax.scan``-ed over it with zero host sync.
* Everything is a pure function of ``(schedule, arrays)``; there is no model
  wrapper object — timestep mapping (respace.py:121-133) is one gather.
* The dynamic-threshold clip that the reference runs on CPU numpy every step
  (gaussian_diffusion.py:284-294) is implemented on-device with
  ``jnp.percentile``.
"""

from __future__ import annotations

import enum
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from . import schedules as _sched


class MeanType(enum.Enum):
    """What the model predicts (gaussian_diffusion.py:64-71)."""

    PREVIOUS_X = "previous_x"
    START_X = "start_x"
    EPSILON = "epsilon"


class VarType(enum.Enum):
    """How the model variance is produced (gaussian_diffusion.py:74-84)."""

    LEARNED = "learned"
    FIXED_SMALL = "fixed_small"
    FIXED_LARGE = "fixed_large"
    LEARNED_RANGE = "learned_range"


class LossType(enum.Enum):
    MSE = "mse"
    RESCALED_MSE = "rescaled_mse"
    KL = "kl"
    RESCALED_KL = "rescaled_kl"


@struct.dataclass
class Schedule:
    """All per-timestep diffusion constants for a (possibly respaced) process.

    Array fields are ``[num_timesteps]`` float32; static fields configure the
    process.  ``timestep_map`` maps compressed timesteps back to the original
    process (respace.py:89-96) and is the identity when no respacing is used.
    """

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    alphas_cumprod_next: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    log_betas: jnp.ndarray
    fixed_large_variance: jnp.ndarray
    log_fixed_large_variance: jnp.ndarray
    timestep_map: jnp.ndarray  # int32 [num_timesteps]
    num_timesteps: int = struct.field(pytree_node=False)
    original_num_steps: int = struct.field(pytree_node=False)
    rescale_timesteps: bool = struct.field(pytree_node=False)

    def model_timesteps(self, t: jnp.ndarray) -> jnp.ndarray:
        """Map compressed timestep indices to the values fed to the model
        (respace.py:128-133): gather through timestep_map, then optionally
        rescale to [0, 1000)."""
        new_t = self.timestep_map[t]
        if self.rescale_timesteps:
            return new_t.astype(jnp.float32) * (1000.0 / self.original_num_steps)
        return new_t.astype(jnp.float32)


def make_schedule(
    *,
    steps: int = 1000,
    noise_schedule: str = "linear",
    timestep_respacing: str | list | None = "",
    linear_start: float = 0.0001,
    linear_end: float = 0.02,
    rescale_timesteps: bool = False,
    dtype=jnp.float32,
) -> Schedule:
    """Build a :class:`Schedule`, optionally respaced.

    Mirrors ``create_gaussian_diffusion`` + ``SpacedDiffusion``
    (model_creation.py:86-128, respace.py:75-97): all intermediate math in
    float64 numpy, then cast once.
    """
    base_betas = _sched.named_betas(noise_schedule, steps, linear_start, linear_end)
    if not timestep_respacing:
        timestep_respacing = [steps]
    use_timesteps = _sched.space_timesteps(steps, timestep_respacing)
    betas, timestep_map = _sched.respace_betas(base_betas, use_timesteps)

    betas = np.asarray(betas, dtype=np.float64)
    num_timesteps = int(betas.shape[0])
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    alphas_cumprod_next = np.append(alphas_cumprod[1:], 0.0)

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    posterior_log_variance_clipped = np.log(
        np.append(posterior_variance[1], posterior_variance[1:])
    )
    fixed_large = np.append(posterior_variance[1], betas[1:])

    as_dev = lambda a: jnp.asarray(a, dtype=dtype)
    return Schedule(
        betas=as_dev(betas),
        alphas_cumprod=as_dev(alphas_cumprod),
        alphas_cumprod_prev=as_dev(alphas_cumprod_prev),
        alphas_cumprod_next=as_dev(alphas_cumprod_next),
        sqrt_alphas_cumprod=as_dev(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=as_dev(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=as_dev(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=as_dev(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=as_dev(np.sqrt(1.0 / alphas_cumprod - 1)),
        posterior_variance=as_dev(posterior_variance),
        posterior_log_variance_clipped=as_dev(posterior_log_variance_clipped),
        posterior_mean_coef1=as_dev(
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        ),
        posterior_mean_coef2=as_dev(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ),
        log_betas=as_dev(np.log(betas)),
        fixed_large_variance=as_dev(fixed_large),
        log_fixed_large_variance=as_dev(np.log(fixed_large)),
        timestep_map=jnp.asarray(timestep_map, dtype=jnp.int32),
        num_timesteps=num_timesteps,
        original_num_steps=steps,
        rescale_timesteps=rescale_timesteps,
    )


def extract(arr: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-timestep constants and broadcast against an ndim tensor
    (gaussian_diffusion.py:816-828).  ``t`` is a [B] int array."""
    out = arr[t]
    return out.reshape(out.shape + (1,) * (ndim - out.ndim))


def q_sample(
    sched: Schedule, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray
) -> jnp.ndarray:
    """Sample q(x_t | x_0) (gaussian_diffusion.py:183-199)."""
    nd = x_start.ndim
    return (
        extract(sched.sqrt_alphas_cumprod, t, nd) * x_start
        + extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * noise
    )


def q_mean_variance(sched: Schedule, x_start, t):
    nd = x_start.ndim
    mean = extract(sched.sqrt_alphas_cumprod, t, nd) * x_start
    variance = extract(1.0 - sched.alphas_cumprod, t, nd)
    log_variance = extract(sched.log_one_minus_alphas_cumprod, t, nd)
    return mean, variance, log_variance


def q_posterior_mean_variance(sched: Schedule, x_start, x_t, t):
    """q(x_{t-1} | x_t, x_0) (gaussian_diffusion.py:201-221)."""
    nd = x_t.ndim
    mean = (
        extract(sched.posterior_mean_coef1, t, nd) * x_start
        + extract(sched.posterior_mean_coef2, t, nd) * x_t
    )
    variance = extract(sched.posterior_variance, t, nd)
    log_variance = extract(sched.posterior_log_variance_clipped, t, nd)
    return mean, variance, log_variance


def predict_xstart_from_eps(sched: Schedule, x_t, t, eps):
    nd = x_t.ndim
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t
        - extract(sched.sqrt_recipm1_alphas_cumprod, t, nd) * eps
    )


def predict_xstart_from_xprev(sched: Schedule, x_t, t, xprev):
    nd = x_t.ndim
    return (
        extract(1.0 / sched.posterior_mean_coef1, t, nd) * xprev
        - extract(sched.posterior_mean_coef2 / sched.posterior_mean_coef1, t, nd) * x_t
    )


def predict_eps_from_xstart(sched: Schedule, x_t, t, pred_xstart):
    nd = x_t.ndim
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t - pred_xstart
    ) / extract(sched.sqrt_recipm1_alphas_cumprod, t, nd)


def dynamic_threshold(
    x: jnp.ndarray, percentile: float = 99.5,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """On-device dynamic threshold matching gaussian_diffusion.py:284-294.

    The reference computes a per-sample percentile of |x| on CPU numpy and then
    uses only the FIRST sample's value (``[0]``) to clip/normalize the whole
    batch; we keep that exact behavior (one scalar from batch element 0) but
    stay on device.

    ``axis_name``: under spatial (row-sharded) parallelism the percentile
    must span the FULL image, not the local row shard — gather the rows over
    the named mesh axis first (the statistic is tiny; the clip stays local).
    """
    v = jnp.abs(x[0]).astype(jnp.float32)
    if axis_name is not None:
        v = jax.lax.all_gather(v, axis_name, axis=0, tiled=True)
    s = jnp.percentile(v, percentile)
    s = jnp.maximum(s, 1.0)
    return jnp.clip(x, -s, s) / s


def process_xstart(
    x: jnp.ndarray,
    clip_denoised: bool,
    denoised_fn: Optional[Callable] = None,
    threshold_axis: Optional[str] = None,
) -> jnp.ndarray:
    """denoised_fn then (optionally) dynamic threshold, in reference order
    (gaussian_diffusion.py:284-294)."""
    if denoised_fn is not None:
        x = denoised_fn(x)
    if clip_denoised:
        x = dynamic_threshold(x, axis_name=threshold_axis)
    return x


def p_mean_variance(
    sched: Schedule,
    model_output: jnp.ndarray,
    x: jnp.ndarray,
    t: jnp.ndarray,
    *,
    mean_type: MeanType,
    var_type: VarType,
    clip_denoised: bool = True,
    denoised_fn: Optional[Callable] = None,
    channel_axis: int = 1,
    threshold_axis: Optional[str] = None,
):
    """Compute p(x_{t-1} | x_t) stats from a model output
    (gaussian_diffusion.py:223-322), as a pure function — the model has
    already been applied by the caller.  ``threshold_axis``: mesh axis the
    dynamic-threshold percentile gathers over under spatial parallelism.

    ``channel_axis`` selects where the learned-variance channels live: 1 for
    torch-layout arrays (parity tests), -1 for NHWC latents.

    Returns dict(mean, variance, log_variance, pred_xstart).
    """
    nd = x.ndim

    if var_type in (VarType.LEARNED, VarType.LEARNED_RANGE):
        model_output, model_var_values = jnp.split(model_output, 2, axis=channel_axis)
        if var_type == VarType.LEARNED:
            model_log_variance = model_var_values
            model_variance = jnp.exp(model_log_variance)
        else:
            min_log = extract(sched.posterior_log_variance_clipped, t, nd)
            max_log = extract(sched.log_betas, t, nd)
            frac = (model_var_values + 1) / 2
            model_log_variance = frac * max_log + (1 - frac) * min_log
            model_variance = jnp.exp(model_log_variance)
    elif var_type == VarType.FIXED_LARGE:
        model_variance = jnp.broadcast_to(
            extract(sched.fixed_large_variance, t, nd), x.shape
        )
        model_log_variance = jnp.broadcast_to(
            extract(sched.log_fixed_large_variance, t, nd), x.shape
        )
    elif var_type == VarType.FIXED_SMALL:
        model_variance = jnp.broadcast_to(extract(sched.posterior_variance, t, nd), x.shape)
        model_log_variance = jnp.broadcast_to(
            extract(sched.posterior_log_variance_clipped, t, nd), x.shape
        )
    else:
        raise NotImplementedError(var_type)

    if mean_type == MeanType.PREVIOUS_X:
        pred_xstart = process_xstart(
            predict_xstart_from_xprev(sched, x, t, model_output),
            clip_denoised,
            denoised_fn,
            threshold_axis,
        )
        model_mean = model_output
    elif mean_type in (MeanType.START_X, MeanType.EPSILON):
        if mean_type == MeanType.START_X:
            pred_xstart = process_xstart(
                model_output, clip_denoised, denoised_fn, threshold_axis
            )
        else:
            pred_xstart = process_xstart(
                predict_xstart_from_eps(sched, x, t, model_output),
                clip_denoised,
                denoised_fn,
                threshold_axis,
            )
        model_mean, _, _ = q_posterior_mean_variance(sched, pred_xstart, x, t)
    else:
        raise NotImplementedError(mean_type)

    return {
        "mean": model_mean,
        "variance": model_variance,
        "log_variance": model_log_variance,
        "pred_xstart": pred_xstart,
    }


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL between two Gaussians (reference: kandinsky2/model/losses.py:12-39)."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    return 0.5 * (
        1.0 + jnp.tanh(jnp.sqrt(2.0 / jnp.pi) * (x + 0.044715 * jnp.power(x, 3)))
    )


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of a discretized Gaussian on [-1,1] images
    (reference: kandinsky2/model/losses.py:49-75)."""
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, 1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, 1e-12))
    cdf_delta = cdf_plus - cdf_min
    log_probs = jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(
            x > 0.999, log_one_minus_cdf_min, jnp.log(jnp.clip(cdf_delta, 1e-12))
        ),
    )
    return log_probs


def mean_flat(x):
    return x.mean(axis=tuple(range(1, x.ndim)))


def vb_terms_bpd(
    sched: Schedule,
    model_output: jnp.ndarray,
    x_start: jnp.ndarray,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    *,
    mean_type: MeanType,
    var_type: VarType,
    channel_axis: int = 1,
):
    """Per-sample variational-bound term in bits (gaussian_diffusion.py:637-668):
    KL(q(x_{t-1}|x_t,x_0) || p(x_{t-1}|x_t)), decoder NLL at t=0."""
    true_mean, _, true_logvar = q_posterior_mean_variance(sched, x_start, x_t, t)
    out = p_mean_variance(
        sched, model_output, x_t, t, mean_type=mean_type, var_type=var_type,
        clip_denoised=False, channel_axis=channel_axis,
    )
    ln2 = float(np.log(2.0))
    kl = mean_flat(
        normal_kl(true_mean, true_logvar, out["mean"], out["log_variance"])
    ) / ln2
    decoder_nll = mean_flat(
        -discretized_gaussian_log_likelihood(
            x_start, means=out["mean"], log_scales=0.5 * out["log_variance"]
        )
    ) / ln2
    return jnp.where(t == 0, decoder_nll, kl), out["pred_xstart"]


def prior_bpd(sched: Schedule, x_start: jnp.ndarray) -> jnp.ndarray:
    """Prior KL term of the VLB in bits/dim (gaussian_diffusion.py:744-758)."""
    B = x_start.shape[0]
    t = jnp.full((B,), sched.num_timesteps - 1, jnp.int32)
    qt_mean, _, qt_logvar = q_mean_variance(sched, x_start, t)
    kl = normal_kl(qt_mean, qt_logvar, 0.0, 0.0)
    return mean_flat(kl) / float(np.log(2.0))


def calc_bpd_loop(
    sched: Schedule,
    model_fn: Callable,
    x_start: jnp.ndarray,
    rng: jax.Array,
    *,
    mean_type: MeanType = MeanType.EPSILON,
    var_type: VarType = VarType.LEARNED_RANGE,
    channel_axis: int = -1,
):
    """Full VLB evaluation (gaussian_diffusion.py:760-813) as one scan over
    timesteps.  Returns dict(total_bpd [B], prior_bpd [B], vb [B,T],
    xstart_mse [B,T], mse [B,T])."""
    B = x_start.shape[0]

    def step(_, t_scalar):
        t = jnp.full((B,), t_scalar, jnp.int32)
        noise = jax.random.normal(
            jax.random.fold_in(rng, t_scalar), x_start.shape, jnp.float32
        )
        x_t = q_sample(sched, x_start, t, noise)
        model_output = model_fn(x_t, sched.model_timesteps(t)).astype(jnp.float32)
        vb, pred_xstart = vb_terms_bpd(
            sched, model_output, x_start, x_t, t,
            mean_type=mean_type, var_type=var_type, channel_axis=channel_axis,
        )
        xstart_mse = mean_flat((pred_xstart - x_start) ** 2)
        eps = predict_eps_from_xstart(sched, x_t, t, pred_xstart)
        mse = mean_flat((eps - noise) ** 2)
        return None, (vb, xstart_mse, mse)

    ts = jnp.arange(sched.num_timesteps - 1, -1, -1, dtype=jnp.int32)
    _, (vb, xstart_mse, mse) = jax.lax.scan(step, None, ts)
    pb = prior_bpd(sched, x_start)
    return {
        "total_bpd": vb.sum(axis=0) + pb,
        "prior_bpd": pb,
        "vb": vb.T,
        "xstart_mse": xstart_mse.T,
        "mse": mse.T,
    }


def training_losses(
    sched: Schedule,
    model_fn: Callable,
    x_start: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
    *,
    mean_type: MeanType = MeanType.EPSILON,
    var_type: VarType = VarType.LEARNED_RANGE,
    loss_type: LossType = LossType.RESCALED_MSE,
    channel_axis: int = -1,
):
    """Hybrid MSE + (frozen-mean) VLB training loss
    (gaussian_diffusion.py:670-742).  ``model_fn(x_t, t_model)`` applies the
    network; returns dict(loss, mse, vb) of per-sample [B] terms."""
    x_t = q_sample(sched, x_start, t, noise)
    model_output = model_fn(x_t, sched.model_timesteps(t)).astype(jnp.float32)
    terms = {}
    if loss_type in (LossType.KL, LossType.RESCALED_KL):
        vb, _ = vb_terms_bpd(
            sched, model_output, x_start, x_t, t,
            mean_type=mean_type, var_type=var_type, channel_axis=channel_axis,
        )
        if loss_type == LossType.RESCALED_KL:
            vb = vb * sched.num_timesteps
        terms["loss"] = vb
        return terms
    if var_type in (VarType.LEARNED, VarType.LEARNED_RANGE):
        mean_part, var_part = jnp.split(model_output, 2, axis=channel_axis)
        # learn the variance with the VLB, without moving the mean
        frozen = jnp.concatenate(
            [jax.lax.stop_gradient(mean_part), var_part], axis=channel_axis
        )
        vb, _ = vb_terms_bpd(
            sched, frozen, x_start, x_t, t,
            mean_type=mean_type, var_type=var_type, channel_axis=channel_axis,
        )
        if loss_type == LossType.RESCALED_MSE:
            vb = vb * (sched.num_timesteps / 1000.0)
        terms["vb"] = vb
        model_output = mean_part
    if mean_type == MeanType.EPSILON:
        target = noise
    elif mean_type == MeanType.START_X:
        target = x_start
    else:
        target = q_posterior_mean_variance(sched, x_start, x_t, t)[0]
    terms["mse"] = mean_flat((target - model_output) ** 2)
    terms["loss"] = terms["mse"] + terms.get("vb", 0.0)
    return terms
