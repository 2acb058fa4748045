"""Decoder (unCLIP 2.1 UNet) fine-tuning (reference: kandinsky2/train_utils/
trainer_2_1_uclip.py:39-81, train_2_1_unclip.py, train_module_pl2_1.py).

TPU-first design:

* One jitted ``train_step`` containing: timestep sampling, q_sample, UNet
  forward, hybrid MSE+VLB loss, grad, optimizer update, EMA — compiled once.
* Data parallel comes from jit-over-Mesh: batch arrays sharded on the 'data'
  axis, params replicated/TP-sharded (kandinsky2_tpu.parallel) — XLA inserts
  the gradient reductions, replacing the torch.distributed machinery.
* Parameter freezing (train_utils/utils.py:212-229: resblocks vs attention)
  is an optax mask, not requires_grad mutation.
* Frozen encoders (MoVQ, text encoder, CLIP visual) run in the data pipeline
  step ``prepare_cond`` (trainer_2_1_uclip.py:14-37) ahead of the train step.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..diffusion import make_schedule
from ..diffusion.gaussian import training_losses
from .ema import ema_update
from .resample import (
    LossAwareState,
    init_loss_aware,
    loss_aware_sample,
    loss_aware_update,
    uniform_sample,
)


def decoder_freeze_mask(params, freeze_resblocks=False, freeze_attention=False):
    """Trainable-leaf mask replicating freeze_decoder's name rules
    (train_utils/utils.py:212-229)."""
    res_markers = ("in_layers", "h_upd", "x_upd", "emb_layers", "out_layers")
    attn_markers = ("proj_out", "qkv")

    def decide(path, _):
        name = "/".join(
            p.key if hasattr(p, "key") else str(p) for p in path
        ).lower()
        if any(m in name for m in res_markers):
            return not freeze_resblocks
        if any(m in name for m in attn_markers):
            return not freeze_attention
        return True

    return jax.tree_util.tree_map_with_path(decide, params)


def masked_optimizer(tx: optax.GradientTransformation, trainable_mask):
    """Zero updates for frozen leaves."""
    return optax.multi_transform(
        {True: tx, False: optax.set_to_zero()},
        jax.tree_util.tree_map(bool, trainable_mask),
    )


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    ema_params: Any
    step: jnp.ndarray
    sampler_state: Optional[LossAwareState] = None


def make_unclip_train_step(
    unet,
    diffusion_config: dict,
    tx: optax.GradientTransformation,
    *,
    schedule_sampler: str = "uniform",
    ema_decay: Optional[float] = 0.9999,
    inpainting: bool = False,
    data_axis: Optional[str] = None,
    sp_axis: Optional[str] = None,
    remat: bool = False,
    accum_steps: int = 1,
):
    """Build (init_state, train_step).  ``remat`` wraps the UNet forward in
    jax.checkpoint — required at full model size on a single chip (activation
    memory of the 1.22B backward exceeds HBM otherwise).

    ``train_step(state, batch, rng)`` expects a batch dict with:
      image_latents [B,h,w,4] (MoVQ-encoded, scaled), full_emb, pooled_emb,
      image_emb, and optionally inpaint_image/inpaint_mask.
    Returns (state, metrics).

    ``data_axis``/``sp_axis`` name mesh axes for use *inside shard_map* (see
    ``make_spdp_train_fn``): with ``data_axis`` the batch dimension is
    sharded (grads pmean'd, reference DDP); with ``sp_axis`` the latent ROWS
    are sharded spatially — the UNet runs its halo-exchange/psum'd-norm/
    gathered-KV SP path (parallel/spatial.py), removing the single-chip
    activation-memory cap on training resolution.  Plain jit-over-Mesh data
    parallelism needs neither (XLA inserts the reductions itself).

    ``accum_steps`` > 1 runs the forward/backward as a ``lax.scan`` over
    that many microbatches (B divisible), accumulating gradients in fp32:
    peak activation memory drops to one microbatch's while the update is
    exactly the full-batch gradient (t/noise are drawn for the full batch
    up front; equal slice sizes make the mean of slice-means the global
    mean).  Composes with remat, SP, DP, and FSDP.
    """
    from ..configs import schedule_kwargs

    if sp_axis is not None and getattr(unet, "sp_axis", None) != sp_axis:
        unet = unet.clone(sp_axis=sp_axis, parent=None)

    skw = schedule_kwargs(diffusion_config, "")
    sched = make_schedule(**skw["make_schedule"])
    mean_type, var_type, loss_type = (
        skw["mean_type"], skw["var_type"], skw["loss_type"],
    )

    def init_state(params) -> TrainState:
        return TrainState(
            params=params,
            opt_state=tx.init(params),
            # a COPY, not an alias: the SP path donates the TrainState, and
            # XLA rejects donating the same buffer twice (params + ema)
            ema_params=(
                jax.tree_util.tree_map(jnp.array, params)
                if ema_decay is not None else None
            ),
            step=jnp.zeros((), jnp.int32),
            sampler_state=(
                init_loss_aware(sched.num_timesteps)
                if schedule_sampler == "loss-second-moment" else None
            ),
        )

    def train_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        if data_axis is not None:
            # distinct examples per data shard => distinct t/noise draws
            rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))
        rng_t, rng_n = jax.random.split(rng)
        if sp_axis is not None:
            # one t per example across the whole sp group (same rng_t), but
            # independent noise per row shard: fold the shard index in
            rng_n = jax.random.fold_in(rng_n, jax.lax.axis_index(sp_axis))
        B = batch["image_latents"].shape[0]
        if schedule_sampler == "loss-second-moment":
            t, weights = loss_aware_sample(rng_t, state.sampler_state, B)
        else:
            t, weights = uniform_sample(rng_t, sched.num_timesteps, B)
        noise = jax.random.normal(
            rng_n, batch["image_latents"].shape, jnp.float32
        )

        def loss_fn(params, mb, t_m, noise_m, weights_m):
            def raw_model_fn(params, x_t, t_model):
                kwargs = dict(
                    full_emb=mb["full_emb"],
                    pooled_emb=mb["pooled_emb"],
                    image_emb=mb["image_emb"],
                )
                if inpainting:
                    kwargs["inpaint_image"] = mb["inpaint_image"]
                    kwargs["inpaint_mask"] = mb["inpaint_mask"]
                return unet.apply({"params": params}, x_t, t_model, **kwargs)

            if remat:
                raw_model_fn = jax.checkpoint(raw_model_fn)

            def model_fn(x_t, t_model):
                return raw_model_fn(params, x_t, t_model)

            terms = training_losses(
                sched, model_fn, mb["image_latents"].astype(jnp.float32),
                t_m, noise_m,
                mean_type=mean_type, var_type=var_type, loss_type=loss_type,
                channel_axis=-1,
            )
            if sp_axis is not None:
                # per-example terms are means over the LOCAL row shard;
                # equal shards make the cross-shard pmean the global mean
                terms = jax.tree_util.tree_map(
                    lambda v: jax.lax.pmean(v, sp_axis), terms
                )
            loss = jnp.mean(terms["loss"] * weights_m)
            return loss, terms

        if accum_steps == 1:
            (loss, terms), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, batch, t, noise, weights)
        else:
            # Gradient accumulation: scan over microbatches so peak
            # activation (and remat-backward) memory is that of B/accum
            # examples, while t/noise are drawn for the FULL batch first —
            # the accumulated gradient equals the full-batch gradient
            # exactly (equal slice sizes => mean of means is the mean).
            if B % accum_steps:
                raise ValueError(
                    f"batch size {B} not divisible by accum_steps "
                    f"{accum_steps}"
                )

            def slices(v):
                return v.reshape((accum_steps, B // accum_steps) + v.shape[1:])

            xs = {
                "batch": jax.tree_util.tree_map(slices, batch),
                "t": slices(t), "noise": slices(noise), "w": slices(weights),
            }

            def body(carry, xs_m):
                g_acc, l_acc = carry
                (l, terms_m), g = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(state.params, xs_m["batch"], xs_m["t"], xs_m["noise"],
                  xs_m["w"])
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                return (g_acc, l_acc + l), terms_m

            zeros = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params
            )
            (g_sum, l_sum), terms = jax.lax.scan(
                body, (zeros, jnp.zeros((), jnp.float32)), xs
            )
            grads = jax.tree_util.tree_map(lambda g: g / accum_steps, g_sum)
            loss = l_sum / accum_steps
            # per-example terms come back (accum, B/accum) — flatten to (B,)
            # in the original example order for the loss-aware sampler
            terms = jax.tree_util.tree_map(
                lambda v: v.reshape((B,) + v.shape[2:]), terms
            )
        if sp_axis is not None:
            # Inside shard_map (check_vma=False) the forward pmean over the
            # sp axis transposes so each shard's param cotangent is exactly
            # its local+halo contribution; pmean'ing the grads recovers the
            # true global gradient (tests/test_spatial_parallel.py pins this
            # against the single-device gradient).
            grads = jax.lax.pmean(grads, sp_axis)
        if data_axis is not None:
            grads = jax.lax.pmean(grads, data_axis)
            loss = jax.lax.pmean(loss, data_axis)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # EMA is optional: the shadow tree doubles parameter memory, which
        # does not fit for full-size single-chip fine-tuning
        ema_params = (
            ema_update(state.ema_params, params, ema_decay,
                       num_updates=state.step)
            if ema_decay is not None else None
        )
        sampler_state = state.sampler_state
        if schedule_sampler == "loss-second-moment":
            sampler_state = loss_aware_update(
                sampler_state, t, terms["loss"], axis_name=data_axis
            )
        metrics = {"mse": jnp.mean(terms["mse"]) if "mse" in terms else loss}
        if "vb" in terms:
            metrics["vb"] = jnp.mean(terms["vb"])
        if data_axis is not None:
            # globalize the per-shard aux means (loss was already pmean'd)
            metrics = {k: jax.lax.pmean(v, data_axis) for k, v in metrics.items()}
        metrics["loss"] = loss
        return (
            TrainState(
                params=params, opt_state=opt_state, ema_params=ema_params,
                step=state.step + 1, sampler_state=sampler_state,
            ),
            metrics,
        )

    return init_state, train_step


def make_spdp_train_fn(
    unet,
    diffusion_config: dict,
    tx: optax.GradientTransformation,
    mesh,
    *,
    data_axis: Optional[str] = "data",
    sp_axis: str = "sp",
    **step_kwargs,
):
    """(init_state, train_fn) with the whole train step inside shard_map over
    an ``(data, sp)`` mesh: examples sharded over ``data_axis``, latent ROWS
    over ``sp_axis``, params/optimizer replicated.  Spatial sharding divides
    the UNet's activation (and backward-remat) memory by the sp-axis size —
    the scale-out path for training at resolutions a single chip cannot hold
    (the torch reference needs 80 GB GPUs for full-size 768² training; this
    is the TPU answer).  Gradient exactness vs a single device is pinned by
    tests/test_spatial_parallel.py::test_spatial_unet_gradients_match_single_device.

    Constraints: global batch divisible by the data-axis size; latent height
    divisible by ``sp * 2^(levels-1)`` (equal row shards at every UNet
    resolution).  Pass ``data_axis=None`` for an sp-only mesh.
    """
    from jax.sharding import PartitionSpec as P

    init_state, train_step = make_unclip_train_step(
        unet, diffusion_config, tx,
        data_axis=data_axis, sp_axis=sp_axis, **step_kwargs,
    )
    cache: dict = {}

    def train_fn(state: TrainState, batch, rng):
        key = tuple(sorted((k, v.ndim) for k, v in batch.items()))
        if key not in cache:
            specs = {
                k: (P(data_axis, sp_axis) if v == 4 else P(data_axis))
                for k, v in key
            }
            # donate the incoming TrainState: this path exists for models
            # whose memory doesn't fit — holding old+new state would double
            # parameter/optimizer HBM
            cache[key] = jax.jit(jax.shard_map(
                train_step,
                mesh=mesh,
                in_specs=(P(), specs, P()),
                out_specs=(P(), P()),
                check_vma=False,
            ), donate_argnums=(0,))
        return cache[key](state, batch, rng)

    return init_state, train_fn


def make_fsdp_train_fn(
    unet,
    diffusion_config: dict,
    tx: optax.GradientTransformation,
    mesh,
    *,
    tp: bool = False,
    min_elems: int = 1 << 16,
    tp_min_size: int = 1024,
    **step_kwargs,
):
    """(init_fn, train_fn, place_state) with the TrainState ZeRO-3-sharded
    over the mesh's data axis (``parallel.fsdp_state_shardings``): parameter,
    optimizer and EMA HBM all divide by the data-axis size, which is what
    lets the full 1.22B decoder train WITH Adam moments and an EMA shadow on
    a v5e-8 (replicated, params+Adam+EMA alone exceed a chip's HBM).

    Unlike ``make_spdp_train_fn`` this is plain jit-over-Mesh — no axis names
    in the step; XLA's SPMD partitioner inserts the parameter all-gathers and
    gradient reduce-scatters over ICI from the input/output shardings alone
    (the scaling-book FSDP recipe).  ``tp=True`` composes the tensor-parallel
    kernel rule on the model axis with the FSDP shard on a remaining
    dimension.  The numbers are bit-identical to the unsharded step — only
    the layout changes (tests/test_fsdp_accum.py pins this).

    ``train_fn(state, batch, rng)`` donates ``state``; batch leaves are
    placed on the data axis.  ``place_state(state)`` (re)applies the state
    shardings — use it after restoring a checkpoint.
    """
    from ..parallel.mesh import data_sharding, fsdp_state_shardings

    init_state, train_step = make_unclip_train_step(
        unet, diffusion_config, tx, **step_kwargs
    )
    cache: dict = {}

    def shardings_for(state):
        return fsdp_state_shardings(
            state, mesh, tp=tp, min_elems=min_elems, tp_min_size=tp_min_size
        )

    def place_state(state):
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, s), state, shardings_for(state)
        )

    def init_fn(params):
        return place_state(init_state(params))

    def train_fn(state, batch, rng):
        key = tuple(sorted((k, v.shape) for k, v in batch.items()))
        if key not in cache:
            shardings = shardings_for(state)

            def step_pinned(state, batch, rng):
                new_state, metrics = train_step(state, batch, rng)
                new_state = jax.tree_util.tree_map(
                    jax.lax.with_sharding_constraint, new_state, shardings
                )
                return new_state, metrics

            cache[key] = jax.jit(step_pinned, donate_argnums=(0,))
        batch = {
            k: jax.device_put(v, data_sharding(mesh, v.ndim))
            for k, v in batch.items()
        }
        return cache[key](state, batch, rng)

    return init_fn, train_fn, place_state


def train_unclip(
    *,
    unet,
    params,
    diffusion_config: dict,
    loader,
    prepare_batch: Callable,
    tx: Optional[optax.GradientTransformation] = None,
    num_epochs: int = 1,
    save_every: int = 1000,
    save_path: str = "checkpoints/unclip",
    schedule_sampler: str = "uniform",
    inpainting: bool = False,
    freeze_resblocks: bool = False,
    freeze_attention: bool = False,
    ema_decay: float = 0.9999,
    seed: int = 0,
    log_every: int = 50,
    remat: bool = False,
    mesh_shape: Optional[tuple] = None,
    fsdp: Optional[int] = None,
    accum_steps: int = 1,
):
    """Single-host training loop (trainer_2_1_uclip.py:39-81 semantics +
    atomic checkpointing).  ``prepare_batch(raw)`` runs the frozen encoders
    (MoVQ/text/CLIP) and returns the train-step batch dict.

    ``mesh_shape=(data, sp)`` runs the shard_map'ed spatial x data parallel
    step (``make_spdp_train_fn``) over the first data*sp devices: batch
    divisible by ``data``, latent rows by ``sp * 2^(levels-1)``.  Either
    entry may be 1 (e.g. ``(1, 8)`` = pure row sharding).

    ``fsdp=N`` instead ZeRO-shards the whole TrainState (params, optimizer
    moments, EMA) over an N-device data axis (``make_fsdp_train_fn``) —
    the path that fits full-size training state in per-chip HBM.
    ``accum_steps`` scans the forward/backward over microbatches on any
    path, cutting activation memory without changing the update.

    Resume is full-fidelity: the entire TrainState (params, optimizer state,
    EMA, sampler history, step-folded RNG position) is restored, so a
    resumed run is bitwise-identical to an uninterrupted one given the same
    batch sequence (tests/test_checkpoint_resume.py)."""
    from .checkpoint import (
        latest_train_state,
        restore_train_state,
        save_checkpoint,
        save_train_state,
    )

    if tx is None:
        tx = optax.adafactor(learning_rate=5e-6)  # train_configs default lr
    mask = decoder_freeze_mask(params, freeze_resblocks, freeze_attention)
    tx = masked_optimizer(tx, mask)
    place_state = None
    if fsdp is not None and mesh_shape is not None:
        raise ValueError(
            "fsdp and mesh_shape (spatial x data) are separate paths; "
            "pick one"
        )
    if fsdp is not None:
        from ..parallel import make_mesh

        mesh = make_mesh(fsdp, model_parallel=1)
        init_state, train_step, place_state = make_fsdp_train_fn(
            unet, diffusion_config, tx, mesh,
            schedule_sampler=schedule_sampler, ema_decay=ema_decay,
            inpainting=inpainting, remat=remat, accum_steps=accum_steps,
        )
    elif mesh_shape is not None:
        import numpy as _np
        from jax.sharding import Mesh

        d, s = mesh_shape
        devs = jax.devices()
        if len(devs) < d * s:
            raise ValueError(
                f"mesh_shape {mesh_shape} needs {d * s} devices, "
                f"have {len(devs)}"
            )
        mesh = Mesh(_np.asarray(devs[:d * s]).reshape(d, s), ("data", "sp"))
        init_state, train_step = make_spdp_train_fn(
            unet, diffusion_config, tx, mesh,
            schedule_sampler=schedule_sampler, ema_decay=ema_decay,
            inpainting=inpainting, remat=remat, accum_steps=accum_steps,
        )
    else:
        init_state, train_step = make_unclip_train_step(
            unet, diffusion_config, tx, schedule_sampler=schedule_sampler,
            ema_decay=ema_decay, inpainting=inpainting, remat=remat,
            accum_steps=accum_steps,
        )
        train_step = jax.jit(train_step)
    state = init_state(params)
    state_file, start_step = latest_train_state(save_path)
    if state_file:
        state = restore_train_state(state_file, state)
        if place_state is not None:
            # restoring materializes replicated arrays; re-apply the ZeRO
            # shardings so the resumed run keeps the FSDP memory footprint
            state = place_state(state)
    rng = jax.random.PRNGKey(seed)
    step = start_step
    for _ in range(num_epochs):
        for raw in loader:
            batch = prepare_batch(raw)
            state, metrics = train_step(state, batch, rng)
            step += 1
            if step % log_every == 0:
                m = {k: float(v) for k, v in jax.device_get(metrics).items()}
                print(f"step {step}: {m}", flush=True)
            if step % save_every == 0:
                save_train_state(save_path, state, step)
    save_train_state(save_path, state, step)
    save_checkpoint(save_path, state.params, step)  # inference weight export
    return state
