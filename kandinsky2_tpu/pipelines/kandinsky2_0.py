"""Kandinsky 2.0 pipeline, TPU-native.

Public API mirrors the reference (kandinsky2/kandinsky2_model.py:18-381):
``generate_text2img / generate_img2img / generate_inpainting`` with the same
signatures (dynamic_threshold_v, denoised_type, ddim_eta knobs).  Latent
diffusion with TWO text streams — mCLIP-XLMR (640-d pooled) and mT5-small
(512-d sequence) — and a KL-VAE latent space (scale 0.0512, configs.py:40).

Same TPU architecture as the 2.1 pipeline: conditioning encoded once, scanned
denoise loop, per-shape executable cache.  Note the reference's stochastic
DDIM default (ddim_eta 0.05/0.8, kandinsky2_model.py:122,265) is supported
through the ddim tables' sigma column.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import CONFIG_2_0, create_model, deep_copy_config, schedule_kwargs
from ..diffusion import (
    ddim_loop,
    dpmpp_2m_loop,
    dynamic_threshold,
    make_ddim_tables,
    make_dpmpp_karras_tables,
    make_dpmpp_tables,
    make_schedule,
    p_sample_loop,
    plms_loop,
    q_sample,
)
from ..models.movq import AutoencoderKL
from ..models.t5 import T5Encoder
from ..models.text_encoders import TextEncoder
from ..utils import (
    as_prompt_list,
    check_noise,
    get_new_h_w,
    prepare_image,
    prepare_mask,
    process_images,
    resolve_batch,
)


class Kandinsky2:
    """2.0 pipeline: dual text encoders + KL-VAE + GLIDE-style UNet."""

    def __init__(
        self,
        config: Optional[dict] = None,
        params: Optional[Dict[str, Any]] = None,
        tokenizer1=None,
        tokenizer2=None,
        task_type: str = "text2img",
        dtype=jnp.bfloat16,
        seed: int = 0,
    ):
        self.config = deep_copy_config(config or CONFIG_2_0)
        self.task_type = task_type
        self.dtype = dtype
        mc = self.config["model_config"]
        mc["version"] = "2.0"
        if task_type in ("text2img", "img2img"):
            mc["inpainting"] = False
        elif task_type == "inpainting":
            mc["inpainting"] = True
        else:
            raise ValueError("Only text2img, img2img and inpainting is available")

        te1 = self.config["text_enc_params1"]
        te1_extra = {
            k: te1[k]
            for k in ("layers", "heads", "intermediate", "vocab_size",
                      "max_positions", "in_features", "out_features")
            if k in te1
        }
        te1_extra.setdefault("in_features", 1024)
        te1_extra.setdefault("out_features", 640)
        self.text_encoder1 = TextEncoder(
            model_name="multiclip", dtype=dtype, **te1_extra
        )
        self.text_encoder2 = T5Encoder(
            dtype=dtype, **self.config.get("t5_params", {})
        )
        self.unet = create_model(**mc, dtype=dtype)
        ie = self.config["image_enc_params"]
        self.scale = ie["scale"]
        dd = ie["params"]["ddconfig"]
        self.image_encoder = AutoencoderKL(
            z_channels=dd["z_channels"], embed_dim=ie["params"]["embed_dim"],
            ch=dd["ch"], ch_mult=tuple(dd["ch_mult"]),
            num_res_blocks=dd["num_res_blocks"],
            attn_resolutions=tuple(dd["attn_resolutions"]),
            resolution=dd["resolution"], dtype=dtype,
        )
        self.params = params
        self.tokenizer1 = tokenizer1
        self.tokenizer2 = tokenizer2
        self._rng = jax.random.PRNGKey(seed)
        self._jit_cache: Dict[Any, Any] = {}
        self._diff_cfg = self.config["diffusion_config"]
        # img2img q_sample quirk: default linear(1e-4, 2e-2) schedule
        # (utils.py:42-47); 2.0's decoder schedule happens to be the same.
        self._img2img_sched = make_schedule(steps=1000, noise_schedule="linear")

    # ------------------------------------------------------------------

    def init_random_params(self, rng=None, cast=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        ks = jax.random.split(rng, 4)
        mc = self.config["model_config"]

        def _cast(tree):
            if cast is None:
                return tree
            out = jax.tree_util.tree_map(lambda a: a.astype(cast), tree)
            jax.block_until_ready(out)
            return out

        L1 = min(77, self.text_encoder1.max_positions - 2)
        init = {}
        init["text_encoder1"] = _cast(jax.jit(self.text_encoder1.init)(
            ks[0], jnp.zeros((1, L1), jnp.int32), jnp.ones((1, L1), jnp.int32)
        )["params"])
        init["text_encoder2"] = _cast(jax.jit(self.text_encoder2.init)(
            ks[1], jnp.zeros((1, 77), jnp.int32), jnp.ones((1, 77), jnp.int32)
        )["params"])
        cond = dict(
            full_emb1=jnp.zeros((1, L1, mc["text_encoder_in_dim1"])),
            pooled_emb1=jnp.zeros((1, mc["text_encoder_in_dim2"])),
            full_emb2=jnp.zeros((1, 77, 512)),
            pooled_emb2=None,
        )
        if mc["inpainting"]:
            cond.update(
                inpaint_image=jnp.zeros((1, 32, 32, 4)),
                inpaint_mask=jnp.zeros((1, 32, 32, 1)),
            )
        init["unet"] = _cast(jax.jit(
            lambda k: self.unet.init(
                k, jnp.zeros((1, 32, 32, 4)), jnp.zeros((1,)), **cond
            )
        )(ks[2])["params"])
        init["image_encoder"] = _cast(jax.jit(self.image_encoder.init)(
            ks[3], jnp.zeros((1, 64, 64, 3))
        )["params"])
        self.params = init
        return init

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

    def shard(self, mesh=None, model_parallel=None, min_size: int = 1024,
              min_candidate_frac: float = 0.5, verbose: bool = True):
        """Tensor-parallel placement over a ``(data, model)`` mesh for
        multi-chip serving — see ``parallel.shard_pipeline``."""
        from ..parallel import shard_pipeline

        return shard_pipeline(
            self, mesh=mesh, model_parallel=model_parallel,
            min_size=min_size, min_candidate_frac=min_candidate_frac,
            verbose=verbose,
        )

    def encode_text(self, prompt, batch_size: int):
        """Both text streams for [prompt]*B + [""]*B
        (kandinsky2_model.py:86-102, 133-144).  ``prompt`` may be a list of
        B distinct prompts (serving batches)."""
        prompts = as_prompt_list(prompt, batch_size)
        enc1 = self.tokenizer1(
            prompts + [""] * batch_size,
            max_length=min(77, self.text_encoder1.max_positions - 2),
            padding="max_length", truncation=True, return_attention_mask=True,
            add_special_tokens=True, return_tensors="np",
        )
        enc2 = self.tokenizer2(
            prompts + [""] * batch_size,
            max_length=77, padding="max_length", truncation=True,
            return_attention_mask=True, add_special_tokens=True,
            return_tensors="np",
        )
        t1, m1 = jnp.asarray(enc1["input_ids"]), jnp.asarray(enc1["attention_mask"])
        t2, m2 = jnp.asarray(enc2["input_ids"]), jnp.asarray(enc2["attention_mask"])

        def build():
            def fn(params, t1, m1, t2, m2):
                full1, pooled1 = self.text_encoder1.apply(
                    {"params": params["text_encoder1"]}, t1, m1
                )
                full2 = self.text_encoder2.apply(
                    {"params": params["text_encoder2"]}, t2, m2
                )
                return full1, pooled1, full2
            return jax.jit(fn)

        fn = self._jit(("text20", t1.shape, t2.shape), build)
        return fn(self.params, t1, m1, t2, m2)

    # ------------------------------------------------------------------

    def _build_gen_fn(self, *, sampler, num_steps, new_h, new_w, batch_size,
                      init_step, inpainting, ddim_eta, denoised_type,
                      dynamic_threshold_v, sp_mesh=None, with_nseq=False):
        dkw = schedule_kwargs(
            self._diff_cfg, str(num_steps) if sampler == "p_sampler" else ""
        )
        sched = make_schedule(**dkw["make_schedule"])
        if sampler in ("ddim_sampler", "plms_sampler"):
            tables = make_ddim_tables(
                np.asarray(sched.alphas_cumprod, np.float64), num_steps,
                eta=ddim_eta if sampler == "ddim_sampler" else 0.0,
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

        if sp_mesh is None:
            unet, vae = self.unet, self.image_encoder
        else:
            from ..parallel.spatial import check_sp_rows

            check_sp_rows(new_h, sp_mesh.shape["sp"],
                          len(self.unet.channel_mult))
            unet = self.unet.clone(sp_axis="sp", parent=None)
            vae = self.image_encoder.clone(sp_axis="sp", parent=None)
        threshold_axis = None if sp_mesh is None else "sp"

        def fn(params, full1, pooled1, full2, g, rng, x_T, inpaint_image,
               inpaint_mask, nseq=None):
            if sp_mesh is not None and (
                sampler == "p_sampler"
                or (sampler == "ddim_sampler" and ddim_eta != 0.0)
            ):
                # independent per-row-shard noise for the stochastic samplers
                rng = jax.random.fold_in(rng, jax.lax.axis_index("sp"))
            xf_proj, xf_out = unet.apply(
                {"params": params["unet"]}, full1, pooled1, full2, None,
                method=type(unet).encode_conditioning,
            )

            def model_fn(x, t_model):
                x2 = jnp.concatenate([x, x], axis=0)
                t2 = jnp.concatenate([t_model, t_model], axis=0)
                if inpainting:
                    out = unet.apply(
                        {"params": params["unet"]}, x2, t2, xf_proj, xf_out,
                        jnp.concatenate([inpaint_image, inpaint_image], 0),
                        jnp.concatenate([inpaint_mask, inpaint_mask], 0),
                        method=type(unet).denoise,
                    )
                else:
                    out = unet.apply(
                        {"params": params["unet"]}, x2, t2, xf_proj, xf_out,
                        method=type(unet).denoise,
                    )
                eps, rest = out[..., :4], out[..., 4:]
                cond_eps, uncond_eps = eps[:batch_size], eps[batch_size:]
                eps_g = uncond_eps + g * (cond_eps - uncond_eps)
                if sampler == "p_sampler":
                    return jnp.concatenate([eps_g, rest[:batch_size]], axis=-1)
                return eps_g

            # reference: non-inpainting p_sampler passes denoised_fn=None and
            # relies on p_mean_variance's dynamic-threshold clip
            # (kandinsky2_model.py:164-202); inpainting blends after an
            # explicit threshold/clip chosen by denoised_type.
            denoised_fn = None
            if inpainting:
                def denoised_fn(x0):
                    if denoised_type == "clip_denoised":
                        x0 = jnp.clip(x0, -1, 1)
                    elif denoised_type == "dynamic_threshold":
                        x0 = dynamic_threshold(
                            x0, dynamic_threshold_v,
                            axis_name=threshold_axis,
                        )
                    return x0 * (1 - inpaint_mask) + inpaint_image * inpaint_mask

            if sampler == "p_sampler":
                samples = p_sample_loop(
                    model_fn, sched, x_T, rng,
                    mean_type=dkw["mean_type"], var_type=dkw["var_type"],
                    clip_denoised=True, denoised_fn=denoised_fn,
                    init_step=init_step, channel_axis=-1,
                    threshold_axis=threshold_axis, noise_seq=nseq,
                )
            elif sampler == "ddim_sampler":
                samples = ddim_loop(model_fn, tables, x_T, rng, eta=ddim_eta,
                                    noise_seq=nseq)
            elif sampler == "plms_sampler":
                samples = plms_loop(model_fn, tables, x_T)
            elif sampler in ("dpmpp_sampler", "dpmpp_karras_sampler"):
                samples = dpmpp_2m_loop(model_fn, tables, x_T)
            else:
                raise ValueError(
                    "Only p_sampler, ddim_sampler, plms_sampler, "
                    "dpmpp_sampler and dpmpp_karras_sampler are available"
                )
            img = vae.apply(
                {"params": params["image_encoder"]},
                (samples / self.scale).astype(self.dtype),
                method=type(vae).decode,
            )
            return img.astype(jnp.float32)

        if sp_mesh is None:
            return jax.jit(fn)

        from jax.sharding import PartitionSpec as P

        row = P(None, "sp", None, None)
        specs = [P(), P(), P(), P(), P(), P(), row, row, row]
        if with_nseq:
            # injected per-step noise: rows shard like the latent
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
        self, prompt, batch_size=1, num_steps=50, guidance_scale=7,
        progress=True, dynamic_threshold_v=99.5,
        denoised_type="dynamic_threshold", init_step=None, noise=None,
        init_img=None, img_mask=None, h=512, w=512, sampler="ddim_sampler",
        ddim_eta=0.8, sp_mesh=None, noise_seq=None,
    ):
        """kandinsky2_model.py:104-250.  ``sp_mesh``: run denoise + KL-VAE
        decode spatially parallel — latent/image rows sharded over the
        mesh's "sp" axis (parallel/spatial.py), the dynamic-threshold
        percentile gathered across shards — for resolutions past one chip's
        HBM (see _build_gen_fn).

        ``noise``: the starting latent x_T; ``noise_seq``: per-step noise
        for the stochastic samplers (p_sampler, or ddim with eta > 0) —
        injecting both makes the trajectory a pure function of its inputs
        (fixed-seed cross-framework comparison, SURVEY §7 RNG parity)."""
        batch_size = resolve_batch(prompt, batch_size)
        new_h, new_w = get_new_h_w(h, w)
        stochastic = sampler == "p_sampler" or (
            sampler == "ddim_sampler" and ddim_eta != 0.0)
        if noise_seq is not None and not stochastic:
            raise ValueError(
                "noise_seq only applies to the stochastic samplers "
                "(p_sampler, or ddim_sampler with eta > 0); "
                f"{sampler} here is deterministic given noise="
            )
        with_nseq = noise_seq is not None
        inpainting = self.task_type == "inpainting"
        full1, pooled1, full2 = self.encode_text(prompt, batch_size)
        fn = self._jit(
            ("gen20", sampler, num_steps, new_h, new_w, batch_size, init_step,
             inpainting, round(ddim_eta, 6), denoised_type,
             round(dynamic_threshold_v, 4),
             None if sp_mesh is None else tuple(d.id for d in sp_mesh.devices.flat),
             with_nseq),
            lambda: self._build_gen_fn(
                sampler=sampler, num_steps=num_steps, new_h=new_h, new_w=new_w,
                batch_size=batch_size, init_step=init_step,
                inpainting=inpainting, ddim_eta=ddim_eta,
                denoised_type=denoised_type,
                dynamic_threshold_v=dynamic_threshold_v, sp_mesh=sp_mesh,
                with_nseq=with_nseq,
            ),
        )
        if noise is None:
            x_T = jax.random.normal(
                self._next_rng(), (batch_size, new_h, new_w, 4), jnp.float32
            )
        else:
            x_T = jnp.asarray(noise, jnp.float32)
        zeros = jnp.zeros_like(x_T)
        args = [
            self.params, full1, pooled1, full2,
            jnp.asarray(guidance_scale, jnp.float32), self._next_rng(), x_T,
            init_img if init_img is not None else zeros,
            img_mask if img_mask is not None else zeros[..., :1],
        ]
        if with_nseq:
            if sampler == "p_sampler":
                # p_sampler's init_step is in respaced units: the scan makes
                # exactly init_step (or num_steps) draws.
                n_anc = num_steps if init_step is None else init_step
            else:
                # ddim with eta > 0 draws once per entry of the (possibly
                # img2img-truncated) ladder — init_step here is in 1000-step
                # DDPM units, NOT a draw count (~num_steps·strength draws).
                from ..diffusion.schedules import ddim_ladder

                n_anc = len(ddim_ladder(num_steps, init_step=init_step))
            args.append(check_noise(
                noise_seq, (n_anc,) + tuple(x_T.shape), "noise_seq"))
        images = fn(*args)
        return process_images(np.asarray(images)[:, :h, :w, :])

    def generate_text2img(
        self, prompt, num_steps=100, batch_size=1, guidance_scale=7,
        progress=True, dynamic_threshold_v=99.5,
        denoised_type="dynamic_threshold", h=512, w=512,
        sampler="ddim_sampler", ddim_eta=0.05, sp_mesh=None, noise=None,
        noise_seq=None,
    ):
        return self.generate_img(
            prompt=prompt, batch_size=batch_size, num_steps=num_steps,
            guidance_scale=guidance_scale, progress=progress,
            dynamic_threshold_v=dynamic_threshold_v,
            denoised_type=denoised_type, h=h, w=w, sampler=sampler,
            ddim_eta=ddim_eta, sp_mesh=sp_mesh, noise=noise,
            noise_seq=noise_seq,
        )

    def generate_img2img(
        self, prompt, pil_img, strength=0.7, num_steps=100, guidance_scale=7,
        progress=True, dynamic_threshold_v=99.5,
        denoised_type="dynamic_threshold", sampler="ddim_sampler",
        ddim_eta=0.05, sp_mesh=None, noise=None, noise_seq=None,
    ):
        """kandinsky2_model.py:287-331 (batch 1, 512²).  ``noise`` replaces
        the q_sample re-noising draw; ``noise_seq`` as in generate_img."""
        image = jnp.asarray(prepare_image(pil_img))
        latent = self._vae_encode_sample(image) * self.scale
        if sampler == "p_sampler":
            skw = schedule_kwargs(self._diff_cfg, str(num_steps))
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
        return self.generate_img(
            prompt=prompt, batch_size=1, num_steps=num_steps,
            guidance_scale=guidance_scale, progress=progress,
            dynamic_threshold_v=dynamic_threshold_v,
            denoised_type=denoised_type, noise=latent, init_step=start_step,
            sampler=sampler, ddim_eta=ddim_eta, sp_mesh=sp_mesh,
            noise_seq=noise_seq,
        )

    def generate_inpainting(
        self, prompt, pil_img, img_mask, num_steps=100, guidance_scale=7,
        progress=True, dynamic_threshold_v=99.5,
        denoised_type="dynamic_threshold", sampler="ddim_sampler",
        ddim_eta=0.05, sp_mesh=None, noise=None, noise_seq=None,
    ):
        """kandinsky2_model.py:333-381 (mask 1 = keep).  ``noise``/
        ``noise_seq`` inject x_T / per-step noise (see generate_img)."""
        image = jnp.asarray(prepare_image(pil_img))
        latent = self._vae_encode_sample(image) * self.scale
        lh, lw = latent.shape[1:3]
        mask = np.asarray(img_mask, np.float32)
        yi = (np.arange(lh) * (mask.shape[0] / lh)).astype(np.int32)
        xi = (np.arange(lw) * (mask.shape[1] / lw)).astype(np.int32)
        mask = prepare_mask(mask[yi][:, xi])[None, :, :, None]
        return self.generate_img(
            prompt=prompt, batch_size=1, num_steps=num_steps,
            guidance_scale=guidance_scale, progress=progress,
            dynamic_threshold_v=dynamic_threshold_v,
            denoised_type=denoised_type, init_img=latent,
            img_mask=jnp.asarray(mask), sampler=sampler, ddim_eta=ddim_eta,
            sp_mesh=sp_mesh, noise=noise, noise_seq=noise_seq,
        )

    def decode_latents(self, latents, sp_mesh=None, axis="sp"):
        """KL-VAE-decode raw sampler latents (B, h/8, w/8, 4) to uint8 PIL
        images.  With ``sp_mesh`` the decode runs spatially parallel — image
        rows sharded over the mesh axis (parallel/spatial.py) — for
        resolutions whose decoder activations exceed one chip's HBM."""
        lat = (jnp.asarray(latents, jnp.float32) / self.scale).astype(self.dtype)
        if sp_mesh is None:
            fn = self._jit(
                ("vae_dec", tuple(lat.shape)),
                lambda: jax.jit(
                    lambda p, z: self.image_encoder.apply(
                        {"params": p}, z, method=self.image_encoder.decode
                    ).astype(jnp.float32)
                ),
            )
            img = fn(self.params["image_encoder"], lat)
        else:
            from ..parallel.spatial import spatial_decode

            img = spatial_decode(
                self.image_encoder, self.params["image_encoder"], lat,
                sp_mesh, axis=axis, method="decode",
            ).astype(jnp.float32)
        return process_images(np.asarray(img))

    def _vae_encode_sample(self, image):
        fn = self._jit(
            ("vae_enc", tuple(image.shape)),
            lambda: jax.jit(
                lambda p, x, k: self.image_encoder.apply(
                    {"params": p}, x.astype(self.dtype), k,
                    method=self.image_encoder.sample_posterior,
                ).astype(jnp.float32)
            ),
        )
        return fn(self.params["image_encoder"], image, self._next_rng())


def get_kandinsky2_0(device=None, task_type="text2img",
                     cache_dir="/tmp/kandinsky2", use_auth_token=None,
                     dtype=None):
    """Download + convert 2.0 checkpoints (kandinsky2/__init__.py:12-87)."""
    import jax.numpy as jnp

    from ..weights.hub import fetch_2_0
    from ..weights.load_kandinsky import build_kandinsky20

    paths = fetch_2_0(cache_dir, task_type, use_auth_token)
    return build_kandinsky20(paths, task_type=task_type,
                             dtype=dtype or jnp.bfloat16)
