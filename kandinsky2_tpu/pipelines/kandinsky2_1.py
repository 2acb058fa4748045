"""Kandinsky 2.1 pipeline — the flagship text→image stack, TPU-native.

Public API mirrors the reference (kandinsky2/kandinsky2_1_model.py:21-548):
``generate_text2img``, ``generate_img2img``, ``generate_inpainting``,
``mix_images`` with the same signatures and defaults.

TPU-first architecture (vs the reference's per-step Python loop):

* Conditioning (CLIP text tower → prior → image emb; XLM-R text emb; UNet
  conditioning projections) is encoded ONCE per call; the entire denoising
  trajectory runs as a single ``lax.scan`` XLA program
  (prior: 25 steps of the 1B transformer; decoder: N steps of the 1.22B UNet).
* The sampler carries batch B; classifier-free guidance doubles the batch
  inside the model closure only (kandinsky2_1_model.py:222-233 semantics,
  without dragging a junk second half through the sampler).
* Compiled executables are cached per (task, sampler, steps, latent shape,
  batch) — resolutions are 64-px bucketed exactly like the reference
  (kandinsky2_1_model.py:106-113), so a handful of XLA programs cover a
  session.

All image tensors are NHWC.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import CONFIG_2_1, create_model, deep_copy_config, schedule_kwargs
from ..diffusion import (
    ddim_loop,
    dpmpp_2m_loop,
    make_ddim_tables,
    make_dpmpp_karras_tables,
    make_dpmpp_tables,
    make_schedule,
    p_sample_loop,
    plms_loop,
    q_sample,
)
from ..models.movq import MOVQ
from ..models.prior import PriorTransformer, prior_sample_fn
from ..models.text_encoders import CLIPTextTower, CLIPViT, TextEncoder
from ..utils import (
    as_prompt_list,
    check_noise,
    get_new_h_w,
    prepare_image,
    prepare_image_batch,
    prepare_mask,
    process_images,
    resolve_batch,
)

CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def clip_preprocess(pil_image, image_size: int = 224) -> np.ndarray:
    """CLIP preprocessing (resize+center-crop+normalize), NHWC [1,S,S,3]."""
    from PIL import Image

    w, h = pil_image.size
    scale = image_size / min(w, h)
    pil_image = pil_image.resize(
        (round(w * scale), round(h * scale)), resample=Image.BICUBIC
    )
    w, h = pil_image.size
    left, top = (w - image_size) // 2, (h - image_size) // 2
    pil_image = pil_image.crop((left, top, left + image_size, top + image_size))
    arr = np.asarray(pil_image.convert("RGB"), np.float32) / 255.0
    arr = (arr - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD
    return arr[None]


class Kandinsky2_1:
    """Five-model pipeline: prior, CLIP (text+vision), XLM-R text encoder,
    latent UNet, MoVQ (kandinsky2_1_model.py:23-104)."""

    def __init__(
        self,
        config: Optional[dict] = None,
        params: Optional[Dict[str, Any]] = None,
        tokenizer1=None,
        tokenizer2=None,
        clip_mean=None,
        clip_std=None,
        task_type: str = "text2img",
        dtype=jnp.bfloat16,
        seed: int = 0,
    ):
        self.config = deep_copy_config(config or CONFIG_2_1)
        self.task_type = task_type
        self.dtype = dtype
        mc = self.config["model_config"]
        mc["inpainting"] = task_type == "inpainting"
        if task_type not in ("text2img", "inpainting"):
            raise ValueError("Only text2img and inpainting is available")

        hp = self.config["prior"]["params"]["model"]["hparams"]
        self.prior = PriorTransformer(
            text_ctx=hp["text_ctx"], xf_width=hp["xf_width"],
            xf_layers=hp["xf_layers"], xf_heads=hp["xf_heads"],
            xf_final_ln=hp["xf_final_ln"], clip_dim=hp["clip_dim"],
            clip_xf_width=hp["clip_xf_width"], dtype=dtype,
        )
        # optional tower-size overrides (tiny configs for tests/CI)
        self.clip_text = CLIPTextTower(
            dtype=dtype, **self.config.get("clip_text_params", {})
        )
        self.clip_vision = CLIPViT(
            dtype=dtype, **self.config.get("clip_vision_params", {})
        )
        te = self.config["text_enc_params"]
        te_extra = {
            k: te[k]
            for k in ("layers", "heads", "intermediate", "vocab_size", "max_positions")
            if k in te
        }
        self.text_encoder = TextEncoder(
            model_name=te["model_name"], in_features=te["in_features"],
            out_features=te["out_features"], dtype=dtype, **te_extra,
        )
        self.unet = create_model(**mc, dtype=dtype)
        ie = self.config["image_enc_params"]
        self.scale = ie["scale"]
        dd = ie["params"]["ddconfig"]
        self.movq = MOVQ(
            z_channels=dd["z_channels"], embed_dim=ie["params"]["embed_dim"],
            n_embed=ie["params"]["n_embed"], ch=dd["ch"],
            ch_mult=tuple(dd["ch_mult"]), num_res_blocks=dd["num_res_blocks"],
            attn_resolutions=tuple(dd["attn_resolutions"]),
            resolution=dd["resolution"], dtype=dtype,
        )
        self.clip_image_size = self.config.get("clip_image_size", 224)

        self.params = params
        self.tokenizer1 = tokenizer1
        self.tokenizer2 = tokenizer2
        self.clip_mean = (
            jnp.asarray(clip_mean, jnp.float32).reshape(1, -1)
            if clip_mean is not None else None
        )
        self.clip_std = (
            jnp.asarray(clip_std, jnp.float32).reshape(1, -1)
            if clip_std is not None else None
        )
        self._rng = jax.random.PRNGKey(seed)
        self._jit_cache: Dict[Any, Any] = {}
        # prior/decoder schedule kwargs (configs mirror the reference)
        self._prior_diff_cfg = self.config["prior"]["params"]["diffusion"]
        self._decoder_diff_cfg = self.config["diffusion_config"]
        # img2img re-noising uses the DEFAULT linear(1e-4, 2e-2) schedule, a
        # reference quirk: utils.py:42-47 calls model/utils.get_named_beta_
        # schedule which ignores the decoder's linear_start/end overrides.
        self._img2img_sched = make_schedule(steps=1000, noise_schedule="linear")

    # ------------------------------------------------------------------
    # initialization helpers
    # ------------------------------------------------------------------

    def init_random_params(self, rng: Optional[jax.Array] = None, cast=None):
        """Random-init all five models (tests / benchmarking)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        ks = jax.random.split(rng, 6)
        hp = self.config["prior"]["params"]["model"]["hparams"]
        mc = self.config["model_config"]
        B = 1
        lat = jnp.zeros((B, 32, 32, 4))
        t = jnp.zeros((B,))

        def _cast(tree):
            # cast each model right after init so fp32 originals free before
            # the next model initializes (peak = one model, not the fleet)
            if cast is None:
                return tree
            out = jax.tree_util.tree_map(lambda a: a.astype(cast), tree)
            jax.block_until_ready(out)
            return out

        init = {}
        init["prior"] = _cast(jax.jit(self.prior.init)(
            ks[0], jnp.zeros((B, hp["clip_dim"])), t,
            jnp.zeros((B, hp["clip_dim"])),
            jnp.zeros((B, hp["text_ctx"], hp["clip_xf_width"])),
            jnp.ones((B, hp["text_ctx"]), bool),
        )["params"])
        ctx = self.clip_text.context_length
        init["clip_text"] = _cast(jax.jit(self.clip_text.init)(
            ks[1], jnp.zeros((B, ctx), jnp.int32)
        )["params"])
        init["clip_vision"] = _cast(jax.jit(self.clip_vision.init)(
            ks[2], jnp.zeros((B, self.clip_image_size, self.clip_image_size, 3))
        )["params"])
        te_len = min(77, self.text_encoder.max_positions - 2)
        init["text_encoder"] = _cast(jax.jit(self.text_encoder.init)(
            ks[3], jnp.zeros((B, te_len), jnp.int32), jnp.ones((B, te_len), jnp.int32)
        )["params"])
        cond = dict(
            full_emb=jnp.zeros((B, 77, mc["text_encoder_in_dim1"])),
            pooled_emb=jnp.zeros((B, mc["text_encoder_in_dim2"])),
            image_emb=jnp.zeros((B, mc["image_encoder_in_dim"])),
        )
        if mc["inpainting"]:
            cond.update(
                inpaint_image=jnp.zeros_like(lat),
                inpaint_mask=jnp.zeros_like(lat[..., :1]),
            )
        init["unet"] = _cast(jax.jit(
            lambda k: self.unet.init(k, lat, t, **cond)
        )(ks[4])["params"])
        init["movq"] = _cast(jax.jit(self.movq.init)(
            ks[5], jnp.zeros((B, 64, 64, 3))
        )["params"])
        self.params = init
        if self.clip_mean is None:
            self.clip_mean = jnp.zeros((1, hp["clip_dim"]), jnp.float32)
            self.clip_std = jnp.ones((1, hp["clip_dim"]), jnp.float32)
        return init

    def shard(self, mesh=None, model_parallel: Optional[int] = None,
              min_size: int = 1024, min_candidate_frac: float = 0.5,
              verbose: bool = True):
        """Tensor-parallel placement over a ``(data, model)`` mesh for
        multi-chip serving (v5e-8) — see ``parallel.shard_pipeline``."""
        from ..parallel import shard_pipeline

        return shard_pipeline(
            self, mesh=mesh, model_parallel=model_parallel,
            min_size=min_size, min_candidate_frac=min_candidate_frac,
            verbose=verbose,
        )

    def set_seed(self, seed: int) -> None:
        """Reset the pipeline RNG for reproducible generation."""
        import jax as _jax

        self._rng = _jax.random.PRNGKey(seed)

    def _next_rng(self):
        self._rng, k = jax.random.split(self._rng)
        return k

    def _jit(self, key, builder):
        if key not in self._jit_cache:
            self._jit_cache[key] = builder()
        return self._jit_cache[key]

    # ------------------------------------------------------------------
    # conditioning encoders
    # ------------------------------------------------------------------

    def encode_text(self, prompt, batch_size: int):
        """XLM-R full/pooled embeddings for [prompt]*B + [""]*B
        (kandinsky2_1_model.py:115-131).  ``prompt`` may be a list of B
        distinct prompts (serving batches)."""
        enc = self.tokenizer1(
            as_prompt_list(prompt, batch_size) + [""] * batch_size,
            max_length=min(77, self.text_encoder.max_positions - 2),
            padding="max_length", truncation=True,
            return_attention_mask=True, add_special_tokens=True,
            return_tensors="np",
        )
        tokens = jnp.asarray(enc["input_ids"])
        mask = jnp.asarray(enc["attention_mask"])
        fn = self._jit(
            ("text_enc", tokens.shape),
            lambda: jax.jit(
                lambda p, t, m: self.text_encoder.apply({"params": p}, t, m)
            ),
        )
        return fn(self.params["text_encoder"], tokens, mask)

    def generate_clip_emb(
        self, prompt, batch_size=1, prior_cf_scale=4, prior_steps="25",
        negative_prior_prompt="", noise=None, noise_seq=None,
    ):
        """CLIP text feats -> guided prior sample (kandinsky2_1_model.py:133-175).

        ``noise``: optional [B, clip_dim] array used as the prior's x_T
        instead of an internal draw; ``noise_seq``: [S, B, clip_dim] per-step
        ancestral noise (p-sampler prior ladders only) — together they make
        the prior trajectory a pure function of its inputs for fixed-seed
        cross-framework comparison."""
        tok, mask = self.tokenizer2.padded_tokens_and_mask(
            as_prompt_list(prompt, batch_size), self.prior.text_ctx
        )
        cf_tok, cf_mask = self.tokenizer2.padded_tokens_and_mask(
            as_prompt_list(negative_prior_prompt, batch_size), self.prior.text_ctx
        )
        tok = jnp.asarray(np.concatenate([tok, cf_tok]))
        mask = jnp.asarray(np.concatenate([mask, cf_mask]))
        ps = str(prior_steps)
        use_ddim = ps.startswith("ddim")
        use_dpmpp = ps.startswith("dpmpp")  # "dpmpp10": 2M prior sampling
        skw = schedule_kwargs(
            self._prior_diff_cfg, ps[5:] if use_dpmpp else ps
        )
        sched = make_schedule(**skw["make_schedule"])

        if noise_seq is not None and (use_ddim or use_dpmpp):
            raise ValueError(
                "noise_seq only applies to the ancestral (p-sampler) prior "
                "ladder; ddim/dpmpp prior trajectories are deterministic "
                "given noise="
            )
        hp = self.config["prior"]["params"]["model"]["hparams"]
        noise = check_noise(noise, (batch_size, hp["clip_dim"]), "noise")

        def build():
            # x_T/nseq default to None so the no-injection call keeps the
            # exact argument structure (and compiled HLO) of prior rounds;
            # jit retraces per pytree structure when arrays are supplied.
            def fn(params, tok, mask, scale, rng, x_T=None, nseq=None):
                seq, feat = self.clip_text.apply(
                    {"params": params["clip_text"]}, tok
                )
                return prior_sample_fn(
                    self.prior.apply, {"params": params["prior"]}, sched,
                    feat, seq, mask, scale, self.clip_mean, self.clip_std,
                    rng, use_ddim=use_ddim, use_dpmpp=use_dpmpp,
                    x_T=x_T, noise_seq=nseq,
                )
            return jax.jit(fn)

        fn = self._jit(("prior", str(prior_steps), tok.shape[0]), build)
        args = [
            self.params, tok, mask,
            jnp.asarray(prior_cf_scale, jnp.float32), self._next_rng(),
        ]
        if noise is not None or noise_seq is not None:
            args += [noise, check_noise(
                noise_seq,
                (sched.num_timesteps, batch_size, hp["clip_dim"]),
                "noise_seq")]
        emb = fn(*args)
        return emb

    def encode_images(self, image, is_pil: bool = False):
        """CLIP image embedding (kandinsky2_1_model.py:177-181)."""
        if is_pil:
            image = clip_preprocess(image, self.clip_image_size)
        image = jnp.asarray(image)
        fn = self._jit(
            ("clip_vision", image.shape),
            lambda: jax.jit(
                lambda p, x: self.clip_vision.apply({"params": p}, x)
            ),
        )
        return fn(self.params["clip_vision"], image)

    def create_zero_img_emb(self, batch_size: int):
        img = jnp.zeros((1, self.clip_image_size, self.clip_image_size, 3))
        emb = self.encode_images(img)
        return jnp.tile(emb, (batch_size, 1))

    # ------------------------------------------------------------------
    # core generation
    # ------------------------------------------------------------------

    def _build_latent_fn(
        self, *, sampler, num_steps, new_h, new_w, batch_size, init_step,
        inpainting, turbo_interval=1, sp_mesh=None, with_nseq=False,
    ):
        """One jitted program: UNet conditioning encode -> scanned denoise ->
        MoVQ decode.

        With ``sp_mesh`` the whole program runs spatially parallel inside
        shard_map: latent/image ROWS shard over the mesh's "sp" axis
        (conditioning is replicated compute), so one generation's
        activations spread across all devices — the high-resolution path
        past one chip's HBM.  Deterministic samplers match the single-device
        trajectory; p_sampler folds the device index into its noise stream.

        ``turbo_interval`` > 1 enables DeepCache-style sampling: the UNet's
        deep branch (everything below level 0) is recomputed every
        ``turbo_interval`` steps and reused in between, skipping ~2/3 of the
        per-step FLOPs on cached steps.  Non-parity (small quality drift);
        interval 1 is the exact reference trajectory."""
        mc = self.config["model_config"]
        C = mc["in_channels"]
        dkw = schedule_kwargs(
            self._decoder_diff_cfg,
            str(num_steps) if sampler == "p_sampler" else "",
        )
        sched = make_schedule(**dkw["make_schedule"])
        if sampler in ("ddim_sampler", "plms_sampler"):
            tables = make_ddim_tables(
                np.asarray(sched.alphas_cumprod, np.float64), num_steps,
                init_step=init_step,
            )
        elif sampler == "dpmpp_sampler":
            tables = make_dpmpp_tables(
                np.asarray(sched.alphas_cumprod, np.float64), num_steps,
                init_step=init_step,
            )
        elif sampler == "dpmpp_karras_sampler":
            tables = make_dpmpp_karras_tables(
                np.asarray(sched.alphas_cumprod, np.float64), num_steps,
                init_step=init_step,
            )
        turbo = turbo_interval > 1
        if turbo:
            from ..models.unet import deep_cache_spec

            cache_ds, cache_ch = deep_cache_spec(self.unet)

        if sp_mesh is None:
            unet, movq = self.unet, self.movq
        else:
            from ..parallel.spatial import check_sp_rows

            check_sp_rows(new_h, sp_mesh.shape["sp"],
                          len(self.unet.channel_mult))
            unet = self.unet.clone(sp_axis="sp", parent=None)
            movq = self.movq.clone(sp_axis="sp", parent=None)
        threshold_axis = None if sp_mesh is None else "sp"

        def fn(params, full_emb, pooled_emb, image_emb, guidance_scale, rng,
               x_T, inpaint_image, inpaint_mask, nseq=None):
            if sp_mesh is not None and sampler == "p_sampler":
                # independent ancestral noise per row shard (the
                # deterministic samplers need no per-device stream)
                rng = jax.random.fold_in(rng, jax.lax.axis_index("sp"))
            # conditioning once (2B batch: [cond; uncond])
            xf_proj, xf_out = unet.apply(
                {"params": params["unet"]}, full_emb, pooled_emb, image_emb,
                method=type(unet).encode_conditioning,
            )

            def unet_in(x, t_model):
                x2 = jnp.concatenate([x, x], axis=0)
                t2 = jnp.concatenate([t_model, t_model], axis=0)
                args = (x2, t2, xf_proj, xf_out)
                if inpainting:
                    args += (
                        jnp.concatenate([inpaint_image, inpaint_image], 0),
                        jnp.concatenate([inpaint_mask, inpaint_mask], 0),
                    )
                return args

            def mix(out):
                eps, rest = out[..., :C], out[..., C:]
                cond_eps, uncond_eps = eps[:batch_size], eps[batch_size:]
                eps_g = uncond_eps + guidance_scale * (cond_eps - uncond_eps)
                if sampler == "p_sampler":
                    return jnp.concatenate([eps_g, rest[:batch_size]], axis=-1)
                return eps_g

            def model_fn(x, t_model):
                out = unet.apply(
                    {"params": params["unet"]}, *unet_in(x, t_model),
                    method=type(unet).denoise,
                )
                return mix(out)

            def model_fn_turbo(x, t_model, cache, pos):
                refresh = (pos % turbo_interval) == 0
                out, cache = unet.apply(
                    {"params": params["unet"]}, *unet_in(x, t_model),
                    cache, refresh, method=type(unet).denoise_cached,
                )
                return mix(out), cache

            model_state = None
            if turbo:
                rows = new_h // cache_ds
                if sp_mesh is not None:
                    rows //= sp_mesh.shape["sp"]
                model_state = jnp.zeros(
                    (2 * batch_size, rows, new_w // cache_ds, cache_ch),
                    self.dtype,
                )

            if inpainting:
                def denoised_fn(x0):
                    x0 = jnp.clip(x0, -2, 2)
                    return x0 * (1 - inpaint_mask) + inpaint_image * inpaint_mask
            else:
                denoised_fn = lambda x0: jnp.clip(x0, -2, 2)

            active_fn = model_fn_turbo if turbo else model_fn
            if sampler == "p_sampler":
                samples = p_sample_loop(
                    active_fn, sched, x_T, rng,
                    mean_type=dkw["mean_type"], var_type=dkw["var_type"],
                    clip_denoised=True, denoised_fn=denoised_fn,
                    init_step=init_step, channel_axis=-1,
                    model_state=model_state, noise_seq=nseq,
                    # the dynamic-threshold percentile must span the FULL
                    # image, not this device's row shard
                    threshold_axis=threshold_axis,
                )
            elif sampler == "ddim_sampler":
                samples = ddim_loop(active_fn, tables, x_T,
                                    model_state=model_state)
            elif sampler == "plms_sampler":
                samples = plms_loop(active_fn, tables, x_T,
                                    model_state=model_state)
            elif sampler in ("dpmpp_sampler", "dpmpp_karras_sampler"):
                samples = dpmpp_2m_loop(active_fn, tables, x_T,
                                        model_state=model_state)
            else:
                raise ValueError(
                    "Only p_sampler, ddim_sampler, plms_sampler, "
                    "dpmpp_sampler and dpmpp_karras_sampler are available"
                )
            img = movq.apply(
                {"params": params["movq"]},
                (samples / self.scale).astype(self.dtype),
                method=type(movq).decode,
            )
            return img.astype(jnp.float32)

        if sp_mesh is None:
            return jax.jit(fn)

        from jax.sharding import PartitionSpec as P

        row = P(None, "sp", None, None)
        specs = [P(), P(), P(), P(), P(), P(), row, row, row]
        if with_nseq:
            # injected per-step ancestral noise: rows shard like the latent
            specs.append(P(None, None, "sp", None, None))
            wrapped = fn
        else:
            wrapped = lambda *args: fn(*args)  # fixed 9-arg signature
        return jax.jit(jax.shard_map(
            wrapped,
            mesh=sp_mesh,
            in_specs=tuple(specs),
            out_specs=row,
            check_vma=False,
        ))

    def generate_img(
        self, prompt, img_prompt, batch_size=1, guidance_scale=7,
        init_step=None, noise=None, init_img=None, img_mask=None,
        h=512, w=512, sampler="ddim_sampler", num_steps=50,
        turbo_interval=1, sp_mesh=None, noise_seq=None,
    ):
        """Core decoder loop + MoVQ decode (kandinsky2_1_model.py:183-292).
        ``img_prompt`` is the CFG-doubled [cond; uncond] image embedding.
        ``sp_mesh``: run the denoise+decode spatially parallel (rows sharded
        over the mesh's "sp" axis) — see _build_latent_fn.

        ``noise``: the starting latent x_T ([B, h/8, w/8, C]); ``noise_seq``:
        [S, B, h/8, w/8, C] per-step ancestral noise for the p_sampler —
        injecting both makes the trajectory a pure function of its inputs
        (fixed-seed cross-framework comparison, SURVEY §7 RNG parity)."""
        new_h, new_w = get_new_h_w(h, w)
        if noise_seq is not None and sampler != "p_sampler":
            raise ValueError(
                "noise_seq only applies to the ancestral p_sampler; "
                f"{sampler} is deterministic given noise="
            )
        inpainting = self.task_type == "inpainting"
        with_nseq = noise_seq is not None
        full_emb, pooled_emb = self.encode_text(prompt, batch_size)
        fn = self._jit(
            ("gen", sampler, num_steps, new_h, new_w, batch_size, init_step,
             inpainting, turbo_interval,
             None if sp_mesh is None else tuple(d.id for d in sp_mesh.devices.flat),
             with_nseq),
            lambda: self._build_latent_fn(
                sampler=sampler, num_steps=num_steps, new_h=new_h, new_w=new_w,
                batch_size=batch_size, init_step=init_step, inpainting=inpainting,
                turbo_interval=turbo_interval, sp_mesh=sp_mesh,
                with_nseq=with_nseq,
            ),
        )
        C = self.config["model_config"]["in_channels"]
        if noise is None:
            x_T = jax.random.normal(
                self._next_rng(), (batch_size, new_h, new_w, C), jnp.float32,
            )
        else:
            x_T = jnp.asarray(noise, jnp.float32)
        zeros_lat = jnp.zeros_like(x_T)
        zeros_mask = jnp.zeros_like(x_T[..., :1])
        args = [
            self.params, full_emb, pooled_emb, img_prompt,
            jnp.asarray(guidance_scale, jnp.float32), self._next_rng(), x_T,
            init_img if init_img is not None else zeros_lat,
            img_mask if img_mask is not None else zeros_mask,
        ]
        if with_nseq:
            # p_sample_loop runs init_step steps when the ladder is truncated
            n_anc = num_steps if init_step is None else init_step
            args.append(check_noise(
                noise_seq, (n_anc,) + tuple(x_T.shape), "noise_seq"))
        images = fn(*args)
        images = np.asarray(images)[:, :h, :w, :]
        return process_images(images)

    def _build_text2img_fused_fn(
        self, *, sampler, num_steps, new_h, new_w, batch_size, prior_steps,
        turbo_interval=1, with_nseq=False,
    ):
        """ONE XLA program for the whole text2img trajectory: CLIP text tower
        → guided prior (25-step scan) → zero-image negative emb → UNet
        conditioning → decoder scan → MoVQ decode.  This realizes the
        "prior→UNet→MoVQ compiles to a single XLA program per resolution"
        design (vs the reference's five separate model invocations)."""
        ps = str(prior_steps)
        use_ddim = ps.startswith("ddim")
        use_dpmpp = ps.startswith("dpmpp")
        pkw = schedule_kwargs(self._prior_diff_cfg, ps[5:] if use_dpmpp else ps)
        prior_sched = make_schedule(**pkw["make_schedule"])
        decode_fn = self._build_latent_fn(
            sampler=sampler, num_steps=num_steps, new_h=new_h, new_w=new_w,
            batch_size=batch_size, init_step=None, inpainting=False,
            turbo_interval=turbo_interval, with_nseq=with_nseq,
        )

        def fn(params, prior_tok, prior_mask, txt_tokens, txt_mask,
               prior_scale, guidance_scale, rng, x_T, prior_x_T=None,
               nseq=None, prior_nseq=None):
            seq, feat = self.clip_text.apply(
                {"params": params["clip_text"]}, prior_tok
            )
            image_emb = prior_sample_fn(
                self.prior.apply, {"params": params["prior"]}, prior_sched,
                feat, seq, prior_mask, prior_scale, self.clip_mean,
                self.clip_std, rng, use_ddim=use_ddim, use_dpmpp=use_dpmpp,
                x_T=prior_x_T, noise_seq=prior_nseq,
            )
            zero_img = jnp.zeros(
                (1, self.clip_image_size, self.clip_image_size, 3)
            )
            zero_emb = jnp.tile(
                self.clip_vision.apply({"params": params["clip_vision"]},
                                       zero_img),
                (batch_size, 1),
            )
            img_prompt = jnp.concatenate([image_emb, zero_emb], 0).astype(
                self.dtype
            )
            full_emb, pooled_emb = self.text_encoder.apply(
                {"params": params["text_encoder"]}, txt_tokens, txt_mask
            )
            zeros_lat = jnp.zeros_like(x_T)
            return decode_fn(
                params, full_emb, pooled_emb, img_prompt, guidance_scale,
                jax.random.fold_in(rng, 7), x_T, zeros_lat,
                zeros_lat[..., :1], nseq,
            )

        return jax.jit(fn)

    def _generate_text2img_fused(
        self, prompt, num_steps, batch_size, guidance_scale, h, w, sampler,
        prior_cf_scale, prior_steps, negative_prior_prompt, turbo_interval=1,
        noise=None, prior_noise=None, noise_seq=None, prior_noise_seq=None,
    ):
        new_h, new_w = get_new_h_w(h, w)
        prompts = as_prompt_list(prompt, batch_size)
        tok, mask = self.tokenizer2.padded_tokens_and_mask(
            prompts, self.prior.text_ctx
        )
        cf_tok, cf_mask = self.tokenizer2.padded_tokens_and_mask(
            as_prompt_list(negative_prior_prompt, batch_size), self.prior.text_ctx
        )
        prior_tok = jnp.asarray(np.concatenate([tok, cf_tok]))
        prior_mask = jnp.asarray(np.concatenate([mask, cf_mask]))
        enc = self.tokenizer1(
            prompts + [""] * batch_size,
            max_length=min(77, self.text_encoder.max_positions - 2),
            padding="max_length", truncation=True, return_attention_mask=True,
            add_special_tokens=True, return_tensors="np",
        )
        if noise_seq is not None and sampler != "p_sampler":
            raise ValueError(
                "noise_seq only applies to the ancestral p_sampler; "
                f"{sampler} is deterministic given noise="
            )
        with_nseq = noise_seq is not None
        fn = self._jit(
            ("t2i_fused", sampler, num_steps, new_h, new_w, batch_size,
             str(prior_steps), turbo_interval, with_nseq),
            lambda: self._build_text2img_fused_fn(
                sampler=sampler, num_steps=num_steps, new_h=new_h, new_w=new_w,
                batch_size=batch_size, prior_steps=prior_steps,
                turbo_interval=turbo_interval, with_nseq=with_nseq,
            ),
        )
        C = self.config["model_config"]["in_channels"]
        if noise is None:
            x_T = jax.random.normal(
                self._next_rng(), (batch_size, new_h, new_w, C), jnp.float32,
            )
        else:
            x_T = check_noise(noise, (batch_size, new_h, new_w, C), "noise")
        args = [
            self.params, prior_tok, prior_mask,
            jnp.asarray(enc["input_ids"]), jnp.asarray(enc["attention_mask"]),
            jnp.asarray(prior_cf_scale, jnp.float32),
            jnp.asarray(guidance_scale, jnp.float32), self._next_rng(), x_T,
        ]
        if (prior_noise is not None or with_nseq
                or prior_noise_seq is not None):
            hp = self.config["prior"]["params"]["model"]["hparams"]
            args.append(check_noise(
                prior_noise, (batch_size, hp["clip_dim"]), "prior_noise"))
            args.append(
                None if not with_nseq else check_noise(
                    noise_seq, (num_steps,) + tuple(x_T.shape), "noise_seq"))
            if prior_noise_seq is not None:
                ps = str(prior_steps)
                if ps.startswith(("ddim", "dpmpp")):
                    raise ValueError(
                        "prior_noise_seq only applies to the ancestral "
                        "(p-sampler) prior ladder; ddim/dpmpp prior "
                        "trajectories are deterministic given prior_noise="
                    )
                prior_sched = make_schedule(
                    **schedule_kwargs(self._prior_diff_cfg, ps)["make_schedule"]
                )
                args.append(check_noise(
                    prior_noise_seq,
                    (prior_sched.num_timesteps, batch_size, hp["clip_dim"]),
                    "prior_noise_seq"))
        images = fn(*args)
        return process_images(np.asarray(images)[:, :h, :w, :])

    def generate_text2img(
        self, prompt, num_steps=100, batch_size=1, guidance_scale=7,
        h=512, w=512, sampler="ddim_sampler", prior_cf_scale=4,
        prior_steps="25", negative_prior_prompt="", negative_decoder_prompt="",
        fused=True, turbo_interval=1, sp_mesh=None,
        noise=None, prior_noise=None, noise_seq=None, prior_noise_seq=None,
    ):
        """kandinsky2_1_model.py:299-351.  With ``fused`` (default) and no
        negative decoder prompt the whole trajectory runs as one XLA
        program.  ``prompt`` may be a list of distinct prompts; batch_size
        is then inferred (one compiled program serves all of them).
        ``turbo_interval`` > 1 enables DeepCache-style deep-branch reuse
        (non-parity speedup; see _build_latent_fn).  ``sp_mesh``: run the
        denoise+decode spatially parallel — image rows sharded over the
        mesh's "sp" axis (parallel/spatial.py) for resolutions past one
        chip's HBM; the prior/text stages run replicated.

        Noise injection (identical across the fused and staged paths, so a
        fixed-seed torch comparison can share exact noise tensors):
        ``noise`` = decoder x_T [B, h/8, w/8, C]; ``prior_noise`` = prior
        x_T [B, clip_dim] (applies to the positive prior run);
        ``noise_seq`` = [num_steps, B, h/8, w/8, C] per-step ancestral noise
        (p_sampler only); ``prior_noise_seq`` = [S_prior, B, clip_dim]
        per-step ancestral noise for the stochastic ("25"-style) prior
        ladder."""
        batch_size = resolve_batch(prompt, batch_size)
        if sp_mesh is None and fused and negative_decoder_prompt == "":
            return self._generate_text2img_fused(
                prompt, num_steps, batch_size, guidance_scale, h, w, sampler,
                prior_cf_scale, prior_steps, negative_prior_prompt,
                turbo_interval=turbo_interval, noise=noise,
                prior_noise=prior_noise, noise_seq=noise_seq,
                prior_noise_seq=prior_noise_seq,
            )
        image_emb = self.generate_clip_emb(
            prompt, batch_size=batch_size, prior_cf_scale=prior_cf_scale,
            prior_steps=prior_steps, negative_prior_prompt=negative_prior_prompt,
            noise=prior_noise, noise_seq=prior_noise_seq,
        )
        if negative_decoder_prompt == "":
            zero_image_emb = self.create_zero_img_emb(batch_size)
        else:
            zero_image_emb = self.generate_clip_emb(
                negative_decoder_prompt, batch_size=batch_size,
                prior_cf_scale=prior_cf_scale, prior_steps=prior_steps,
                negative_prior_prompt=negative_prior_prompt,
            )
        image_emb = jnp.concatenate([image_emb, zero_image_emb], axis=0).astype(
            self.dtype
        )
        return self.generate_img(
            prompt=prompt, img_prompt=image_emb, batch_size=batch_size,
            guidance_scale=guidance_scale, h=h, w=w, sampler=sampler,
            num_steps=num_steps, turbo_interval=turbo_interval,
            sp_mesh=sp_mesh, noise=noise, noise_seq=noise_seq,
        )

    def generate_text2img_hires(
        self, prompt, num_steps=50, batch_size=1, guidance_scale=7,
        h=768, w=768, sampler="ddim_sampler", low_scale=0.5, low_steps=None,
        strength=0.65, prior_cf_scale=4, prior_steps="25",
        negative_prior_prompt="", turbo_interval=1, sp_mesh=None,
        noise=None, prior_noise=None,
    ):
        """Two-stage hires generation (training-free, beyond reference;
        cf. Bottleneck Sampling, arxiv 2503.18940): run the full ladder at
        ``low_scale`` resolution (~low_scale² of the per-step cost), LANCZOS-
        upsample, then img2img-refine at full resolution on the truncated
        ladder.  ``strength`` follows the reference img2img convention
        (kandinsky2_1_model.py:463-469): re-noise to t = 1000·(1-strength),
        so the default 0.65 refines with ~⅓ of the steps at light noise,
        keeping stage-1 composition.  The prior runs ONCE — its image
        embedding is reused for both stages.  Defaults cost ≈ 0.25·S low +
        0.35·S refine step-equivalents vs S single-stage.
        """
        from PIL import Image as _Image

        batch_size = resolve_batch(prompt, batch_size)
        image_emb = self.generate_clip_emb(
            prompt, batch_size=batch_size, prior_cf_scale=prior_cf_scale,
            prior_steps=prior_steps,
            negative_prior_prompt=negative_prior_prompt, noise=prior_noise,
        )
        image_emb = jnp.concatenate(
            [image_emb, self.create_zero_img_emb(batch_size)], axis=0
        ).astype(self.dtype)
        lo_h, lo_w = max(64, int(h * low_scale)), max(64, int(w * low_scale))
        low_sp = sp_mesh
        if sp_mesh is not None:
            from ..parallel.spatial import sp_rows_ok

            # the low stage only shards if ITS latent height divides; the
            # full-res refine (the memory-critical stage) always does
            if not sp_rows_ok(get_new_h_w(lo_h, lo_w)[0],
                              sp_mesh.shape["sp"],
                              len(self.unet.channel_mult)):
                low_sp = None
        low = self.generate_img(
            prompt=prompt, img_prompt=image_emb, batch_size=batch_size,
            guidance_scale=guidance_scale,
            h=lo_h, w=lo_w,
            sampler=sampler, num_steps=low_steps or num_steps,
            turbo_interval=turbo_interval, sp_mesh=low_sp,
        )
        ups = [im.resize((w, h), _Image.LANCZOS) for im in low]
        return self.generate_img2img(
            prompt, ups, strength=strength, num_steps=num_steps,
            batch_size=batch_size, guidance_scale=guidance_scale, h=h, w=w,
            sampler=sampler, prior_cf_scale=prior_cf_scale,
            prior_steps=prior_steps, image_emb=image_emb,
            turbo_interval=turbo_interval, sp_mesh=sp_mesh, noise=noise,
        )

    def mix_images(
        self, images_texts, weights, num_steps=100, batch_size=1,
        guidance_scale=7, h=512, w=512, sampler="ddim_sampler",
        prior_cf_scale=4, prior_steps="25", negative_prior_prompt="",
        negative_decoder_prompt="", sp_mesh=None, noise=None, noise_seq=None,
    ):
        """Weighted image-embedding fusion (kandinsky2_1_model.py:353-425).
        ``noise``/``noise_seq`` inject the decoder x_T / per-step ancestral
        noise (see generate_text2img)."""
        assert len(images_texts) == len(weights) and len(images_texts) > 0
        image_emb = None
        for obj, wgt in zip(images_texts, weights):
            if isinstance(obj, str):
                emb = wgt * self.generate_clip_emb(
                    obj, batch_size=1, prior_cf_scale=prior_cf_scale,
                    prior_steps=prior_steps,
                    negative_prior_prompt=negative_prior_prompt,
                )
            else:
                emb = self.encode_images(obj, is_pil=True) * wgt
            image_emb = emb if image_emb is None else image_emb + emb
        image_emb = jnp.tile(image_emb, (batch_size, 1))
        if negative_decoder_prompt == "":
            zero_image_emb = self.create_zero_img_emb(batch_size)
        else:
            zero_image_emb = self.generate_clip_emb(
                negative_decoder_prompt, batch_size=batch_size,
                prior_cf_scale=prior_cf_scale, prior_steps=prior_steps,
                negative_prior_prompt=negative_prior_prompt,
            )
        image_emb = jnp.concatenate([image_emb, zero_image_emb], axis=0).astype(
            self.dtype
        )
        return self.generate_img(
            prompt="", img_prompt=image_emb, batch_size=batch_size,
            guidance_scale=guidance_scale, h=h, w=w, sampler=sampler,
            num_steps=num_steps, sp_mesh=sp_mesh, noise=noise,
            noise_seq=noise_seq,
        )

    def generate_img2img(
        self, prompt, pil_img, strength=0.7, num_steps=100, batch_size=1,
        guidance_scale=7, h=512, w=512, sampler="ddim_sampler",
        prior_cf_scale=4, prior_steps="25", image_emb=None, turbo_interval=1,
        sp_mesh=None, noise=None, prior_noise=None, noise_seq=None,
    ):
        """kandinsky2_1_model.py:427-484: MoVQ-encode, q_sample re-noise at the
        strength-derived step, truncated ladder.

        ``pil_img`` may be a list of per-prompt images (len == batch) —
        each batch row then starts from its own init image.  A precomputed
        CFG-doubled ``image_emb`` skips the prior run (the staged hires
        path reuses stage 1's).  ``noise`` replaces the q_sample re-noising
        draw ([B, h/8, w/8, C]); ``prior_noise``/``noise_seq`` as in
        generate_text2img."""
        batch_size = resolve_batch(prompt, batch_size)
        if image_emb is None:
            image_emb = self.generate_clip_emb(
                prompt, batch_size=batch_size, prior_cf_scale=prior_cf_scale,
                prior_steps=prior_steps, noise=prior_noise,
            )
            zero_image_emb = self.create_zero_img_emb(batch_size)
            image_emb = jnp.concatenate(
                [image_emb, zero_image_emb], axis=0
            ).astype(self.dtype)
        if not 0.0 < strength < 1.0:
            raise ValueError(
                f"strength={strength} out of range: (0, 1) exclusive — "
                "1.0 would fully re-noise (use text2img), 0 runs no steps"
            )
        image = jnp.asarray(prepare_image_batch(pil_img, w, h, batch_size))
        latent = self._movq_encode(image) * self.scale
        if sampler == "p_sampler":
            skw = schedule_kwargs(self._decoder_diff_cfg, str(num_steps))
            sched = make_schedule(**skw["make_schedule"])
            start_step = int(sched.num_timesteps * (1 - strength))
            t_noise = int(np.asarray(sched.timestep_map)[start_step - 1])
        else:
            start_step = int(1000 * (1 - strength))
            t_noise = start_step - 1
        renoise = (
            check_noise(noise, tuple(latent.shape), "noise")
            if noise is not None
            else jax.random.normal(self._next_rng(), latent.shape, jnp.float32)
        )
        latent = q_sample(
            self._img2img_sched, latent.astype(jnp.float32),
            jnp.full((latent.shape[0],), t_noise, jnp.int32), renoise,
        )
        if latent.shape[0] != batch_size:
            latent = jnp.tile(latent, (batch_size, 1, 1, 1))
        return self.generate_img(
            prompt=prompt, img_prompt=image_emb, batch_size=batch_size,
            guidance_scale=guidance_scale, h=h, w=w, sampler=sampler,
            num_steps=num_steps, noise=latent, init_step=start_step,
            turbo_interval=turbo_interval, sp_mesh=sp_mesh,
            noise_seq=noise_seq,
        )

    def generate_inpainting(
        self, prompt, pil_img, img_mask, num_steps=100, batch_size=1,
        guidance_scale=7, h=512, w=512, sampler="ddim_sampler",
        prior_cf_scale=4, prior_steps="25", negative_prior_prompt="",
        negative_decoder_prompt="", sp_mesh=None,
        noise=None, prior_noise=None, noise_seq=None,
    ):
        """kandinsky2_1_model.py:486-548: latent-mask-blended inpainting.

        ``pil_img``/``img_mask`` may be per-prompt lists (len == batch) so a
        serving tier can coalesce distinct users' inpainting requests into
        one compiled program — each batch row consumes its own init image
        and mask.  ``noise``/``prior_noise``/``noise_seq`` as in
        generate_text2img."""
        batch_size = resolve_batch(prompt, batch_size)
        image_emb = self.generate_clip_emb(
            prompt, batch_size=batch_size, prior_cf_scale=prior_cf_scale,
            prior_steps=prior_steps, negative_prior_prompt=negative_prior_prompt,
            noise=prior_noise,
        )
        zero_image_emb = self.create_zero_img_emb(batch_size)
        image_emb = jnp.concatenate([image_emb, zero_image_emb], axis=0).astype(
            self.dtype
        )
        image = jnp.asarray(prepare_image_batch(pil_img, w, h, batch_size))
        latent = self._movq_encode(image) * self.scale
        lh, lw = latent.shape[1:3]
        masks = (
            list(img_mask) if isinstance(img_mask, (list, tuple))
            else [img_mask]
        )
        if len(masks) not in (1, batch_size):
            raise ValueError(
                f"got {len(masks)} masks for batch {batch_size}; pass one "
                "mask, or exactly batch_size masks (one per row)"
            )
        prepped = []
        for m in masks:
            m = np.asarray(m, np.float32)
            # nearest-resize the pixel mask to the latent grid, then erode
            yi = (np.arange(lh) * (m.shape[0] / lh)).astype(np.int32)
            xi = (np.arange(lw) * (m.shape[1] / lw)).astype(np.int32)
            prepped.append(prepare_mask(m[yi][:, xi]))
        mask = jnp.asarray(np.stack(prepped), jnp.float32)[..., None]
        latent = jnp.asarray(latent, jnp.float32)
        if latent.shape[0] != batch_size:
            latent = jnp.tile(latent, (batch_size, 1, 1, 1))
        if mask.shape[0] != batch_size:
            mask = jnp.tile(mask, (batch_size, 1, 1, 1))
        return self.generate_img(
            prompt=prompt, img_prompt=image_emb, batch_size=batch_size,
            guidance_scale=guidance_scale, h=h, w=w, sampler=sampler,
            num_steps=num_steps, init_img=latent, img_mask=mask,
            sp_mesh=sp_mesh, noise=noise, noise_seq=noise_seq,
        )

    # ------------------------------------------------------------------

    def _movq_encode(self, image):
        fn = self._jit(
            ("movq_enc", tuple(image.shape)),
            lambda: jax.jit(
                lambda p, x: self.movq.apply(
                    {"params": p}, x.astype(self.dtype), method=self.movq.encode
                ).astype(jnp.float32)
            ),
        )
        return fn(self.params["movq"], image)

    def decode_latents(self, latents, sp_mesh=None, axis="sp"):
        """MoVQ-decode raw sampler latents (B, h/8, w/8, 4) to uint8 PIL
        images.  With ``sp_mesh`` the decode runs spatially parallel —
        image rows sharded over the mesh axis with halo-exchange convs
        (parallel/spatial.py) — for resolutions whose decoder activations
        exceed one chip's HBM (e.g. 4096²).  Numerically the single-device
        decoder to ~1e-4 (tests/test_spatial_parallel.py)."""
        lat = (jnp.asarray(latents, jnp.float32) / self.scale).astype(self.dtype)
        if sp_mesh is None:
            fn = self._jit(
                ("movq_dec", tuple(lat.shape)),
                lambda: jax.jit(
                    lambda p, z: self.movq.apply(
                        {"params": p}, z, method=self.movq.decode
                    ).astype(jnp.float32)
                ),
            )
            img = fn(self.params["movq"], lat)
        else:
            from ..parallel.spatial import spatial_decode

            img = spatial_decode(
                self.movq, self.params["movq"], lat, sp_mesh, axis=axis,
                method="decode",
            ).astype(jnp.float32)
        return process_images(np.asarray(img))
