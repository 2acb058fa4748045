"""Kandinsky 2.2 pipeline, TPU-native.

Public API mirrors the reference façade (kandinsky2/kandinsky2_2_model.py:
15-173): ``generate_text2img / generate_img2img / mix_images /
generate_inpainting`` with the same signatures/defaults (prior 25 steps CFG 4,
decoder 50 steps CFG 4, 64-px-aligned sizes).  The reference delegates the hot
loops to HF diffusers; here they are scanned XLA programs:

* prior: CLIP-bigG text tower -> 20-layer prior (UnCLIP scheduler:
  sample-prediction, fixed_small_log variance, clip ±10)
* decoder: 1.22B added-KV UNet (DDPM scheduler: eps-prediction, learned_range
  variance, clip ±2) -> MoVQ decode
* ControlNet-depth: same decoder UNet with a hint conv-stack
  (``controlnet_hint=True``), LoRA deltas apply as weight-tree transforms.

CFG ordering follows diffusers: [negative; positive] halves, variance taken
from the positive half.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion.paired import ddpm_ladder, paired_ancestral_loop, unclip_ladder
from ..diffusion.schedules import named_betas
from ..models.movq import MOVQ
from ..models.prior22 import HFCLIPText, PriorTransformer22
from ..models.text_encoders import HFCLIPVision
from ..models.unet22 import UNet22
from ..utils import (
    as_prompt_list,
    check_noise,
    prepare_image_batch,
    process_images,
    resolve_batch,
)
from .kandinsky2_1 import clip_preprocess


def get_new_h_w_64(h: int, w: int) -> tuple[int, int]:
    """64-pixel alignment (kandinsky2_2_model.py:46-53)."""
    return ((h + 63) // 64) * 64, ((w + 63) // 64) * 64


class Kandinsky2_2:
    """Image encoder (ViT-bigG) + prior + decoder UNet + MoVQ."""

    def __init__(
        self,
        task_type: str = "text2img",
        params: Optional[Dict[str, Any]] = None,
        tokenizer=None,  # CLIP BPE tokenizer (padded_tokens_and_mask)
        dtype=jnp.bfloat16,
        overrides: Optional[dict] = None,
        seed: int = 0,
    ):
        if task_type not in ("text2img", "img2img", "inpainting", "controlnet"):
            raise ValueError("Only text2img, img2img, inpainting is available")
        self.task_type = task_type
        self.dtype = dtype
        ov = overrides or {}
        self.image_encoder = HFCLIPVision(dtype=dtype, **ov.get("image_encoder", {}))
        self.text_encoder = HFCLIPText(dtype=dtype, **ov.get("text_encoder", {}))
        self.prior = PriorTransformer22(dtype=dtype, **ov.get("prior", {}))
        in_ch = {"text2img": 4, "img2img": 4, "inpainting": 9, "controlnet": 8}[
            task_type
        ]
        # checkpoint-config overrides (weights/configs22.py) win over the
        # task-type defaults
        unet_kw = dict(
            in_channels=in_ch,
            controlnet_hint=(task_type == "controlnet"),
            dtype=dtype,
        )
        unet_kw.update(ov.get("unet", {}))
        self.unet = UNet22(**unet_kw)
        self.movq = MOVQ(dtype=dtype, **ov.get("movq", {}))
        self.movq_scale = 1.0
        self.tokenizer = tokenizer
        self.params = params
        self._rng = jax.random.PRNGKey(seed)
        self._jit_cache: Dict[Any, Any] = {}
        # base schedules: prior cosine ("squaredcos_cap_v2"), decoder linear
        self._prior_acp = jnp.asarray(
            np.cumprod(1.0 - named_betas("cosine", 1000)), jnp.float32
        )
        self._decoder_acp = jnp.asarray(
            np.cumprod(1.0 - named_betas("linear", 1000, 0.00085, 0.012)),
            jnp.float32,
        )
        self._decoder_sqrt_acp = jnp.sqrt(self._decoder_acp)

    # ------------------------------------------------------------------

    def init_random_params(self, rng=None, cast=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        ks = jax.random.split(rng, 5)
        D = self.prior.embedding_dim
        ctx = self.text_encoder.context_length

        def _cast(tree):
            # cast per model so fp32 originals free before the next init
            # (at full size the five fp32 trees together exceed v5e HBM)
            if cast is None:
                return tree
            out = jax.tree_util.tree_map(lambda a: a.astype(cast), tree)
            jax.block_until_ready(out)
            return out

        init = {}
        init["image_encoder"] = _cast(jax.jit(self.image_encoder.init)(
            ks[0],
            jnp.zeros((1, self.image_encoder.image_size, self.image_encoder.image_size, 3)),
        )["params"])
        init["text_encoder"] = _cast(jax.jit(self.text_encoder.init)(
            ks[1], jnp.zeros((1, ctx), jnp.int32)
        )["params"])
        init["prior"] = _cast(jax.jit(self.prior.init)(
            ks[2], jnp.zeros((1, D)), jnp.zeros((1,)), jnp.zeros((1, D)),
            jnp.zeros((1, self.prior.num_embeddings, self.text_encoder.hidden)),
            jnp.ones((1, self.prior.num_embeddings), bool),
        )["params"])
        kw = {}
        if self.task_type == "controlnet":
            kw["hint"] = jnp.zeros((1, 64, 64, 3))
        init["unet"] = _cast(jax.jit(
            lambda k: self.unet.init(
                k, jnp.zeros((1, 8, 8, self.unet.in_channels - (4 if self.task_type == "controlnet" else 0))),
                jnp.zeros((1,)), jnp.zeros((1, self.unet.encoder_hid_dim)), **kw
            )
        )(ks[3])["params"])
        init["movq"] = _cast(jax.jit(self.movq.init)(
            ks[4], jnp.zeros((1, 64, 64, 3))
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
        multi-chip serving — see ``parallel.shard_pipeline``.  Covers the
        whole params dict (ViT-bigG prior towers, 2.2 UNet, MoVQ); the
        full-size trees are audited spec-by-spec in
        tests/test_sharding_audit.py."""
        from ..parallel import shard_pipeline

        return shard_pipeline(
            self, mesh=mesh, model_parallel=model_parallel,
            min_size=min_size, min_candidate_frac=min_candidate_frac,
            verbose=verbose,
        )

    # ------------------------------------------------------------------
    # prior
    # ------------------------------------------------------------------

    def _encode_text(self, prompts):
        toks, mask = self.tokenizer.padded_tokens_and_mask(
            prompts, self.text_encoder.context_length
        )
        fn = self._jit(
            ("text_enc22", toks.shape),
            lambda: jax.jit(
                lambda p, t: self.text_encoder.apply({"params": p}, t)
            ),
        )
        hidden, proj = fn(self.params["text_encoder"], jnp.asarray(toks))
        return hidden, proj, jnp.asarray(mask)

    def get_zero_embed(self, batch_size=1):
        img = jnp.zeros(
            (1, self.image_encoder.image_size, self.image_encoder.image_size, 3)
        )
        fn = self._jit(
            ("img_enc22", img.shape),
            lambda: jax.jit(
                lambda p, x: self.image_encoder.apply({"params": p}, x)
            ),
        )
        return jnp.tile(fn(self.params["image_encoder"], img), (batch_size, 1))

    def encode_image(self, pil_image):
        arr = jnp.asarray(clip_preprocess(pil_image, self.image_encoder.image_size))
        fn = self._jit(
            ("img_enc22", arr.shape),
            lambda: jax.jit(
                lambda p, x: self.image_encoder.apply({"params": p}, x)
            ),
        )
        return fn(self.params["image_encoder"], arr)

    def run_prior(
        self, prompt, batch_size=1, prior_steps=25, guidance_scale=4,
        negative_prompt="", sampler="ddpm", noise=None, noise_seq=None,
    ):
        """Guided prior sampling -> de-normalized image embeds [B, 1280]
        (diffusers KandinskyV22PriorPipeline semantics).  ``sampler="dpmpp"``
        (beyond reference) runs the 2M solver on the x0-predicting prior —
        same quality class at ~10 steps.

        ``noise``: [B, D] prior x_T instead of an internal draw;
        ``noise_seq``: [S, B, D] per-step ancestral noise (ddpm sampler) —
        injecting both makes the trajectory a pure function of its inputs
        for fixed-seed cross-framework comparison (SURVEY §7 RNG parity)."""
        hidden, proj, mask = self._encode_text(
            as_prompt_list(negative_prompt, batch_size)
            + as_prompt_list(prompt, batch_size)
        )
        ladder = unclip_ladder(prior_steps)
        D = self.prior.embedding_dim
        if sampler == "dpmpp":
            from ..diffusion import dpmpp_2m_loop, make_dpmpp_tables

            dpm_tables = make_dpmpp_tables(
                np.asarray(self._prior_acp, np.float64), ladder=ladder,
            )
            if noise_seq is not None:
                raise ValueError(
                    "noise_seq only applies to the ancestral ddpm prior; "
                    "dpmpp is deterministic given noise="
                )
        elif sampler != "ddpm":
            raise ValueError("2.2 prior samplers: 'ddpm' (parity) or 'dpmpp'")
        noise = check_noise(noise, (batch_size, D), "noise")
        noise_seq = check_noise(
            noise_seq, (len(ladder), batch_size, D), "noise_seq")

        def build():
            # x_T/nseq default None: the no-injection call keeps the exact
            # argument structure (and compiled HLO) of prior rounds; jit
            # retraces per pytree structure when arrays are supplied.
            def fn(params, hidden, proj, mask, g, rng, x_T=None, nseq=None):
                def model_fn(x, t):
                    x2 = jnp.concatenate([x, x], 0)
                    t2 = jnp.concatenate([t, t], 0)
                    out = self.prior.apply(
                        {"params": params["prior"]}, x2, t2, proj, hidden, mask
                    )
                    uncond, text = out[:batch_size], out[batch_size:]
                    return uncond + g * (text - uncond)

                if x_T is None:
                    x_T = jax.random.normal(rng, (batch_size, D), jnp.float32)
                if sampler == "dpmpp":
                    lat = dpmpp_2m_loop(
                        model_fn, dpm_tables, x_T, prediction="xstart",
                        denoised_fn=lambda v: jnp.clip(v, -10.0, 10.0),
                    )
                else:
                    lat = paired_ancestral_loop(
                        model_fn, self._prior_acp, ladder, x_T,
                        jax.random.fold_in(rng, 1), prediction="sample",
                        variance="fixed_small_log", clip_range=10.0,
                        noise_seq=nseq,
                    )
                mean = params["prior"]["clip_mean"]
                std = params["prior"]["clip_std"]
                return lat * std + mean

            return jax.jit(fn)

        fn = self._jit(("prior22", prior_steps, batch_size, sampler), build)
        args = [
            self.params, hidden, proj, mask,
            jnp.asarray(guidance_scale, jnp.float32), self._next_rng(),
        ]
        if noise is not None or noise_seq is not None:
            args += [noise, noise_seq]
        return fn(*args)

    def run_prior_emb2emb(
        self, image, prompt, strength=0.3, batch_size=1, prior_steps=25,
        guidance_scale=4, negative_prompt="", sampler="ddpm", noise=None,
        noise_seq=None,
    ):
        """Prior img2img in embedding space (the diffusers
        ``KandinskyV22PriorEmb2EmbPipeline`` the reference façade imports,
        kandinsky2/kandinsky2_2_model.py:8-44): instead of pure noise, the
        guided prior ladder starts from an existing CLIP image embedding
        normalized and re-noised to the strength-derived step — the
        embedding-space mirror of decoder img2img.

        ``image`` is a PIL image (encoded with the ViT-bigG tower) or a
        precomputed de-normalized embedding of shape [D] / [1, D] / [B, D].
        ``strength`` in (0, 1]: fraction of the prior ladder actually run
        (1.0 ≈ ignore the input, small values stay close to it).  Returns
        de-normalized image embeds [B, D] for the decoder.

        ``noise``: [B, D] replaces the re-noising draw; ``noise_seq``:
        [S, B, D] per-step ancestral noise (ddpm sampler) — see run_prior."""
        batch_size = resolve_batch(prompt, batch_size)
        hidden, proj, mask = self._encode_text(
            as_prompt_list(negative_prompt, batch_size)
            + as_prompt_list(prompt, batch_size)
        )
        full = unclip_ladder(prior_steps)
        t_start = max(prior_steps - min(int(prior_steps * strength), prior_steps), 0)
        ladder = full[t_start:]
        if len(ladder) == 0:
            raise ValueError(
                f"strength={strength} with prior_steps={prior_steps} leaves "
                "no prior steps; use strength >= "
                f"{1.0 / prior_steps:.3f} (or pass the embedding straight to "
                "the decoder)"
            )
        emb = image if hasattr(image, "shape") else self.encode_image(image)
        emb = jnp.asarray(emb, jnp.float32)
        if emb.ndim == 1:
            emb = emb[None]
        if emb.shape[0] != batch_size:
            emb = jnp.tile(emb, (batch_size, 1))
        t0 = int(ladder[0])
        if sampler == "dpmpp":
            from ..diffusion import dpmpp_2m_loop, make_dpmpp_tables

            dpm_tables = make_dpmpp_tables(
                np.asarray(self._prior_acp, np.float64), ladder=ladder,
            )
            if noise_seq is not None:
                raise ValueError(
                    "noise_seq only applies to the ancestral ddpm prior; "
                    "dpmpp is deterministic given noise="
                )
        elif sampler != "ddpm":
            raise ValueError("2.2 prior samplers: 'ddpm' (parity) or 'dpmpp'")
        D = self.prior.embedding_dim
        noise = check_noise(noise, (batch_size, D), "noise")
        noise_seq = check_noise(
            noise_seq, (len(ladder), batch_size, D), "noise_seq")

        def build():
            def fn(params, emb, hidden, proj, mask, g, rng, inj=None,
                   nseq=None):
                def model_fn(x, t):
                    x2 = jnp.concatenate([x, x], 0)
                    t2 = jnp.concatenate([t, t], 0)
                    out = self.prior.apply(
                        {"params": params["prior"]}, x2, t2, proj, hidden, mask
                    )
                    uncond, text = out[:batch_size], out[batch_size:]
                    return uncond + g * (text - uncond)

                mean = params["prior"]["clip_mean"]
                std = params["prior"]["clip_std"]
                lat0 = (emb - mean) / std
                a = jnp.sqrt(self._prior_acp[t0])
                noise = (
                    inj if inj is not None
                    else jax.random.normal(rng, lat0.shape, jnp.float32)
                )
                x_T = a * lat0 + jnp.sqrt(1.0 - a**2) * noise
                if sampler == "dpmpp":
                    lat = dpmpp_2m_loop(
                        model_fn, dpm_tables, x_T, prediction="xstart",
                        denoised_fn=lambda v: jnp.clip(v, -10.0, 10.0),
                    )
                else:
                    lat = paired_ancestral_loop(
                        model_fn, self._prior_acp, ladder, x_T,
                        jax.random.fold_in(rng, 1), prediction="sample",
                        variance="fixed_small_log", clip_range=10.0,
                        noise_seq=nseq,
                    )
                return lat * std + mean

            return jax.jit(fn)

        fn = self._jit(
            ("prior22_emb2emb", prior_steps, len(ladder), batch_size, sampler),
            build,
        )
        args = [
            self.params, emb, hidden, proj, mask,
            jnp.asarray(guidance_scale, jnp.float32), self._next_rng(),
        ]
        if noise is not None or noise_seq is not None:
            args += [noise, noise_seq]
        return fn(*args)

    # ------------------------------------------------------------------
    # decoder
    # ------------------------------------------------------------------

    def _build_decoder_fn(self, *, steps, lat_h, lat_w, batch_size, task,
                          ladder=None, turbo_interval=1, sampler="ddpm",
                          sp_mesh=None, with_nseq=False):
        ladder = ddpm_ladder(steps) if ladder is None else ladder
        if sampler in ("dpmpp", "dpmpp_karras"):
            from ..diffusion import (
                dpmpp_2m_loop,
                make_dpmpp_karras_tables,
                make_dpmpp_tables,
            )

            if sampler == "dpmpp_karras":
                # cap sigma_max at the ladder's start so a truncated img2img
                # ladder (x_T only partially noised) keeps its init content
                dpm_tables = make_dpmpp_karras_tables(
                    np.asarray(self._decoder_acp, np.float64), len(ladder),
                    init_step=int(ladder[0]) + 1,
                )
            else:
                dpm_tables = make_dpmpp_tables(
                    np.asarray(self._decoder_acp, np.float64), ladder=ladder,
                )
        elif sampler != "ddpm":
            raise ValueError(
                "2.2 decoder samplers: 'ddpm' (parity), 'dpmpp' or "
                "'dpmpp_karras'"
            )
        turbo = turbo_interval > 1
        if turbo:
            from ..models.unet22 import deep_cache_spec22

            cache_ds, cache_ch = deep_cache_spec22(self.unet)

        if sp_mesh is None:
            unet, movq = self.unet, self.movq
        else:
            from ..parallel.spatial import check_sp_rows

            check_sp_rows(lat_h, sp_mesh.shape["sp"],
                          len(self.unet.block_out_channels))
            unet = self.unet.clone(sp_axis="sp", parent=None)
            movq = self.movq.clone(sp_axis="sp", parent=None)

        def fn(params, image_embeds, rng, x_T, extra_a, extra_b, g,
               nseq=None):
            """extra_a/extra_b: (masked_image, mask) for inpainting,
            (hint, -) for controlnet, unused otherwise — all CFG-halved B.
            ``nseq``: injected per-step ancestral noise (ddpm sampler)."""
            kw = {}
            if task == "controlnet":
                kw["hint"] = jnp.concatenate([extra_a, extra_a], 0)
            # conditioning for the CFG-doubled [negative; positive] batch
            if sp_mesh is not None and sampler == "ddpm":
                # independent ancestral noise per row shard
                rng = jax.random.fold_in(rng, jax.lax.axis_index("sp"))
            encoder_states, aug_emb, hint_latent = unet.apply(
                {"params": params["unet"]}, image_embeds,
                method=type(unet).encode_conditioning, **kw,
            )

            def unet_in(x, t):
                x2 = jnp.concatenate([x, x], 0)
                if task == "inpainting":
                    m2 = jnp.concatenate([extra_b, extra_b], 0)
                    i2 = jnp.concatenate([extra_a, extra_a], 0)
                    x2 = jnp.concatenate([x2, i2, m2], axis=-1)
                t2 = jnp.concatenate([t, t], 0)
                return x2, t2

            def mix(out):
                out = out.astype(jnp.float32)
                eps, var = out[..., :4], out[..., 4:]
                uncond, text = eps[:batch_size], eps[batch_size:]
                guided = uncond + g * (text - uncond)
                if sampler != "ddpm":  # ODE solver: eps only, no variance
                    return guided
                return jnp.concatenate([guided, var[batch_size:]], axis=-1)

            def model_fn(x, t):
                x2, t2 = unet_in(x, t)
                out = unet.apply(
                    {"params": params["unet"]}, x2, t2, encoder_states,
                    aug_emb, hint_latent, method=type(unet).denoise,
                )
                return mix(out)

            def model_fn_turbo(x, t, cache, pos):
                refresh = (pos % turbo_interval) == 0
                x2, t2 = unet_in(x, t)
                out, cache = unet.apply(
                    {"params": params["unet"]}, x2, t2, encoder_states,
                    aug_emb, hint_latent, cache, refresh,
                    method=type(unet).denoise_cached,
                )
                return mix(out), cache

            model_state = None
            if turbo:
                rows = lat_h // cache_ds
                if sp_mesh is not None:
                    rows //= sp_mesh.shape["sp"]
                model_state = jnp.zeros(
                    (2 * batch_size, rows, lat_w // cache_ds, cache_ch),
                    self.dtype,
                )

            active_fn = model_fn_turbo if turbo else model_fn
            if sampler != "ddpm":
                lat = dpmpp_2m_loop(
                    active_fn, dpm_tables, x_T,
                    denoised_fn=lambda x0: jnp.clip(x0, -2.0, 2.0),
                    model_state=model_state,
                )
            else:
                lat = paired_ancestral_loop(
                    active_fn, self._decoder_acp, ladder, x_T, rng,
                    prediction="epsilon", variance="learned_range",
                    clip_range=2.0, model_state=model_state, noise_seq=nseq,
                )
            img = movq.apply(
                {"params": params["movq"]}, lat.astype(self.dtype),
                method=type(movq).decode,
            )
            return img.astype(jnp.float32)

        if sp_mesh is None:
            return jax.jit(fn)

        from jax.sharding import PartitionSpec as P

        row = P(None, "sp", None, None)
        # hint (extra_a for controlnet) is a full-resolution PIXEL map fed to
        # the replicated hint encoder; rows of x_T / inpaint tensors shard
        extra_a_spec = P() if task == "controlnet" else row
        specs = [P(), P(), P(), row, extra_a_spec, row, P()]
        if with_nseq:
            # injected per-step ancestral noise: rows shard like the latent
            specs.append(P(None, None, "sp", None, None))
            wrapped = fn
        else:
            wrapped = lambda *args: fn(*args)  # fixed 7-arg signature
        return jax.jit(jax.shard_map(
            wrapped,
            mesh=sp_mesh,
            in_specs=tuple(specs),
            out_specs=row,
            check_vma=False,
        ))

    def _decode_loop(self, image_embeds, batch_size, steps, guidance, h, w,
                     x_T=None, extra_a=None, extra_b=None, task=None,
                     ladder=None, turbo_interval=1, sampler="ddpm",
                     sp_mesh=None, noise_seq=None):
        task = task or self.task_type
        lat_h, lat_w = h // 8, w // 8
        if noise_seq is not None and sampler != "ddpm":
            raise ValueError(
                "noise_seq only applies to the ancestral ddpm decoder; "
                f"{sampler} is deterministic given noise="
            )
        with_nseq = noise_seq is not None
        key = ("dec22", task, steps, lat_h, lat_w, batch_size,
               None if ladder is None else len(ladder), turbo_interval,
               sampler, None if sp_mesh is None else tuple(d.id for d in sp_mesh.devices.flat),
               with_nseq)
        fn = self._jit(
            key,
            lambda: self._build_decoder_fn(
                steps=steps, lat_h=lat_h, lat_w=lat_w, batch_size=batch_size,
                task=task, ladder=ladder, turbo_interval=turbo_interval,
                sampler=sampler, sp_mesh=sp_mesh, with_nseq=with_nseq,
            ),
        )
        if x_T is None:
            x_T = jax.random.normal(
                self._next_rng(), (batch_size, lat_h, lat_w, 4), jnp.float32
            )
        zeros = jnp.zeros((batch_size, lat_h, lat_w, 4), jnp.float32)
        if extra_a is None:
            extra_a = zeros
        if extra_b is None:
            extra_b = zeros[..., :1]
        args = [
            self.params, image_embeds.astype(self.dtype), self._next_rng(),
            x_T, extra_a, extra_b, jnp.asarray(guidance, jnp.float32),
        ]
        if with_nseq:
            n_steps = steps if ladder is None else len(ladder)
            args.append(check_noise(
                noise_seq, (n_steps,) + tuple(x_T.shape), "noise_seq"))
        images = fn(*args)
        return process_images(np.asarray(images))

    # ------------------------------------------------------------------
    # public API (kandinsky2_2_model.py:55-173)
    # ------------------------------------------------------------------

    def _embs_for(self, prompt, negative_prior_prompt, negative_decoder_prompt,
                  batch_size, prior_steps, prior_guidance_scale,
                  prior_sampler="ddpm", prior_noise=None,
                  prior_noise_seq=None):
        img_emb = self.run_prior(
            prompt, batch_size, prior_steps, prior_guidance_scale,
            negative_prior_prompt, sampler=prior_sampler, noise=prior_noise,
            noise_seq=prior_noise_seq,
        )
        if negative_decoder_prompt == "":
            negative_emb = self.get_zero_embed(batch_size)
        else:
            negative_emb = self.run_prior(
                negative_decoder_prompt, batch_size, prior_steps,
                prior_guidance_scale, sampler=prior_sampler,
            )
        # diffusers CFG ordering: [negative; positive]
        return jnp.concatenate([negative_emb, img_emb], axis=0)

    def generate_text2img(
        self, prompt, batch_size=1, decoder_steps=50, prior_steps=25,
        decoder_guidance_scale=4, prior_guidance_scale=4, h=512, w=512,
        negative_prior_prompt="", negative_decoder_prompt="",
        turbo_interval=1, sampler="ddpm", prior_sampler="ddpm",
        sp_mesh=None, noise=None, noise_seq=None, prior_noise=None,
        prior_noise_seq=None,
    ):
        """``sampler``: 'ddpm' is the diffusers-parity ancestral scheduler;
        'dpmpp'/'dpmpp_karras' (beyond reference) is deterministic
        DPM-Solver++(2M) — comparable quality in ~20-25 decoder steps.
        ``prior_sampler="dpmpp"`` runs the 2M solver on the prior too
        (~10 prior steps).

        Noise injection (fixed-seed cross-framework comparison, SURVEY §7):
        ``noise`` = decoder x_T [B, h/8, w/8, 4]; ``noise_seq`` =
        [decoder_steps, B, h/8, w/8, 4] per-step ancestral noise (ddpm);
        ``prior_noise`` [B, D] / ``prior_noise_seq`` [prior_steps, B, D]
        feed the positive prior run the same way.  With all four injected
        the whole trajectory is independent of the pipeline RNG."""
        batch_size = resolve_batch(prompt, batch_size)
        h, w = get_new_h_w_64(h, w)
        embs = self._embs_for(
            prompt, negative_prior_prompt, negative_decoder_prompt,
            batch_size, prior_steps, prior_guidance_scale,
            prior_sampler=prior_sampler, prior_noise=prior_noise,
            prior_noise_seq=prior_noise_seq,
        )
        return self._decode_loop(
            embs, batch_size, decoder_steps, decoder_guidance_scale, h, w,
            turbo_interval=turbo_interval, sampler=sampler, sp_mesh=sp_mesh,
            x_T=check_noise(noise, (batch_size, h // 8, w // 8, 4), "noise"),
            noise_seq=noise_seq,
        )

    def generate_img2img(
        self, prompt, image, strength=0.4, batch_size=1, decoder_steps=100,
        prior_steps=25, decoder_guidance_scale=4, prior_guidance_scale=4,
        h=512, w=512, negative_prior_prompt="", negative_decoder_prompt="",
        sampler="ddpm", image_embeds=None, turbo_interval=1, sp_mesh=None,
        noise=None, noise_seq=None, prior_noise=None, prior_noise_seq=None,
    ):
        """``image`` may be a list of per-prompt init images (len == batch);
        a precomputed CFG-doubled ``image_embeds`` skips the prior run (the
        staged hires path reuses stage 1's).  ``noise`` replaces the
        re-noising draw ([B, h/8, w/8, 4]); ``noise_seq``/``prior_noise`` as
        in generate_text2img."""
        batch_size = resolve_batch(prompt, batch_size)
        h, w = get_new_h_w_64(h, w)
        if image_embeds is None:
            embs = self._embs_for(
                prompt, negative_prior_prompt, negative_decoder_prompt,
                batch_size, prior_steps, prior_guidance_scale,
                prior_noise=prior_noise, prior_noise_seq=prior_noise_seq,
            )
        else:
            embs = image_embeds
        full = ddpm_ladder(decoder_steps)
        t_start = max(len(full) - int(decoder_steps * strength), 0)
        ladder = full[t_start:]
        if len(ladder) == 0:
            raise ValueError(
                f"strength={strength} with decoder_steps={decoder_steps} "
                "leaves no refine steps; use strength >= "
                f"{1.0 / decoder_steps:.3f} (or skip img2img entirely)"
            )
        init = jnp.asarray(prepare_image_batch(image, w, h, batch_size))
        lat = self._movq_encode(init) * self.movq_scale
        if lat.shape[0] != batch_size:
            lat = jnp.tile(lat, (batch_size, 1, 1, 1))
        t0 = int(ladder[0])
        renoise = (
            check_noise(noise, tuple(lat.shape), "noise")
            if noise is not None
            else jax.random.normal(self._next_rng(), lat.shape, jnp.float32)
        )
        a = self._decoder_sqrt_acp[t0]
        x_T = a * lat + jnp.sqrt(1.0 - a**2) * renoise
        return self._decode_loop(
            embs, batch_size, decoder_steps, decoder_guidance_scale, h, w,
            x_T=x_T, ladder=ladder, task="img2img", sampler=sampler,
            turbo_interval=turbo_interval, sp_mesh=sp_mesh,
            noise_seq=noise_seq,
        )

    def generate_text2img_hires(
        self, prompt, batch_size=1, decoder_steps=25, prior_steps=25,
        decoder_guidance_scale=4, prior_guidance_scale=4, h=768, w=768,
        low_scale=0.5, low_steps=None, strength=0.35,
        negative_prior_prompt="", negative_decoder_prompt="",
        sampler="ddpm", turbo_interval=1, sp_mesh=None,
        noise=None, prior_noise=None,
    ):
        """Two-stage hires generation (beyond reference, mirrors the 2.1
        method): full ladder at ``low_scale`` resolution, LANCZOS upsample,
        then img2img refine on the last ``strength`` fraction of the ladder
        (2.2/diffusers strength convention).  The prior runs once.
        ``noise`` injects the refine stage's re-noising draw;
        ``prior_noise`` the prior x_T."""
        from PIL import Image as _Image

        batch_size = resolve_batch(prompt, batch_size)
        h, w = get_new_h_w_64(h, w)
        embs = self._embs_for(
            prompt, negative_prior_prompt, negative_decoder_prompt,
            batch_size, prior_steps, prior_guidance_scale,
            prior_noise=prior_noise,
        )
        lh, lw = get_new_h_w_64(
            max(64, int(h * low_scale)), max(64, int(w * low_scale))
        )
        low_sp = sp_mesh
        if sp_mesh is not None:
            from ..parallel.spatial import sp_rows_ok

            # shard the low stage only if ITS latent height divides; the
            # full-res refine (the memory-critical stage) always does
            if not sp_rows_ok(lh // 8, sp_mesh.shape["sp"],
                              len(self.unet.block_out_channels)):
                low_sp = None
        low = self._decode_loop(
            embs, batch_size, low_steps or decoder_steps,
            decoder_guidance_scale, lh, lw, sampler=sampler,
            turbo_interval=turbo_interval, sp_mesh=low_sp,
        )
        ups = [im.resize((w, h), _Image.LANCZOS) for im in low]
        return self.generate_img2img(
            prompt, ups, strength=strength, batch_size=batch_size,
            decoder_steps=decoder_steps,
            decoder_guidance_scale=decoder_guidance_scale, h=h, w=w,
            sampler=sampler, image_embeds=embs,
            turbo_interval=turbo_interval, sp_mesh=sp_mesh, noise=noise,
        )

    def mix_images(
        self, images_texts, weights, batch_size=1, decoder_steps=50,
        prior_steps=25, decoder_guidance_scale=4, prior_guidance_scale=4,
        h=512, w=512, negative_prior_prompt="", negative_decoder_prompt="",
        sampler="ddpm", sp_mesh=None, noise=None, noise_seq=None,
    ):
        """prior.interpolate (kandinsky2_2_model.py:114-142): weighted sum of
        per-condition image embeddings.  ``noise``/``noise_seq`` inject the
        decoder x_T / per-step ancestral noise (see generate_text2img)."""
        assert len(images_texts) == len(weights) and len(images_texts) > 0
        h, w = get_new_h_w_64(h, w)
        emb = None
        for obj, wgt in zip(images_texts, weights):
            if isinstance(obj, str):
                e = self.run_prior(
                    obj, 1, prior_steps, prior_guidance_scale,
                    negative_prior_prompt,
                )
            else:
                e = self.encode_image(obj)
            emb = wgt * e if emb is None else emb + wgt * e
        emb = jnp.tile(emb, (batch_size, 1))
        if negative_decoder_prompt == "":
            neg = self.get_zero_embed(batch_size)
        else:
            neg = self.run_prior(
                negative_decoder_prompt, batch_size, prior_steps,
                prior_guidance_scale,
            )
        embs = jnp.concatenate([neg, emb], axis=0)
        return self._decode_loop(
            embs, batch_size, decoder_steps, decoder_guidance_scale, h, w,
            sampler=sampler, sp_mesh=sp_mesh,
            x_T=check_noise(noise, (batch_size, h // 8, w // 8, 4), "noise"),
            noise_seq=noise_seq,
        )

    def generate_inpainting(
        self, prompt, pil_img, img_mask, batch_size=1, decoder_steps=50,
        prior_steps=25, decoder_guidance_scale=4, prior_guidance_scale=4,
        h=512, w=512, negative_prior_prompt="", negative_decoder_prompt="",
        sampler="ddpm", sp_mesh=None, noise=None, noise_seq=None,
        prior_noise=None, prior_noise_seq=None,
    ):
        """``img_mask``: 1 = repaint (diffusers >= 0.19 convention for
        Kandinsky inpainting).

        ``pil_img``/``img_mask`` may be per-prompt lists (len == batch) so a
        serving tier can coalesce distinct users' inpainting requests into
        one compiled program — each batch row consumes its own init image
        and mask.  ``noise``/``noise_seq``/``prior_noise`` as in
        generate_text2img."""
        batch_size = resolve_batch(prompt, batch_size)
        h, w = get_new_h_w_64(h, w)
        embs = self._embs_for(
            prompt, negative_prior_prompt, negative_decoder_prompt,
            batch_size, prior_steps, prior_guidance_scale,
            prior_noise=prior_noise, prior_noise_seq=prior_noise_seq,
        )
        init = jnp.asarray(prepare_image_batch(pil_img, w, h, batch_size))
        lat = self._movq_encode(init) * self.movq_scale
        lh, lw = lat.shape[1:3]
        masks = (
            list(img_mask) if isinstance(img_mask, (list, tuple))
            else [img_mask]
        )
        if len(masks) not in (1, batch_size):
            raise ValueError(
                f"got {len(masks)} masks for batch {batch_size}; pass one "
                "mask, or exactly batch_size masks (one per row)"
            )
        keeps = []
        for m in masks:
            keep = 1.0 - np.asarray(m, np.float32)
            yi = (np.arange(lh) * (keep.shape[0] / lh)).astype(np.int32)
            xi = (np.arange(lw) * (keep.shape[1] / lw)).astype(np.int32)
            keeps.append(keep[yi][:, xi])
        keep = jnp.asarray(np.stack(keeps))[..., None]
        if lat.shape[0] != batch_size:
            lat = jnp.tile(lat, (batch_size, 1, 1, 1))
        if keep.shape[0] != batch_size:
            keep = jnp.tile(keep, (batch_size, 1, 1, 1))
        masked = lat * keep
        return self._decode_loop(
            embs, batch_size, decoder_steps, decoder_guidance_scale, h, w,
            extra_a=masked, extra_b=keep, task="inpainting", sampler=sampler,
            sp_mesh=sp_mesh,
            x_T=check_noise(noise, (batch_size, lh, lw, 4), "noise"),
            noise_seq=noise_seq,
        )

    def generate_controlnet(
        self, prompt, hint=None, batch_size=1, decoder_steps=50, prior_steps=25,
        decoder_guidance_scale=4, prior_guidance_scale=4, h=512, w=512,
        negative_prior_prompt="", negative_decoder_prompt="",
        sampler="ddpm", image=None, strength=0.5, image_embeds=None,
        sp_mesh=None, noise=None, noise_seq=None, prior_noise=None,
        prior_noise_seq=None,
    ):
        """ControlNet-depth: ``hint`` is an [H, W, 3] array in [0, 1]
        (e.g. MiDaS depth, host-side preprocessing as in
        notebooks/kandinsky2_2_controlnet.ipynb; ``depth.make_hint``
        produces one from any RGB photo).  With ``image`` the decoder runs
        the notebook's ControlnetImg2Img flow: the init image is
        MoVQ-encoded and re-noised at the ``strength``-derived step, and —
        when ``hint`` is omitted — also supplies the depth hint.  A
        precomputed CFG-doubled ``image_embeds`` skips the prior run (the
        notebook feeds emb2emb prior outputs here).  ``noise`` injects the
        decoder x_T (pure text2img flow) or the re-noising draw (img2img
        flow); ``noise_seq``/``prior_noise`` as in generate_text2img."""
        batch_size = resolve_batch(prompt, batch_size)
        h, w = get_new_h_w_64(h, w)
        if hint is None:
            if image is None:
                raise ValueError("generate_controlnet needs hint= or image=")
            from ..depth import make_hint

            hint = make_hint(image, h=h, w=w)
        if image_embeds is None:
            embs = self._embs_for(
                prompt, negative_prior_prompt, negative_decoder_prompt,
                batch_size, prior_steps, prior_guidance_scale,
                prior_noise=prior_noise, prior_noise_seq=prior_noise_seq,
            )
        else:
            embs = image_embeds
        hint = jnp.asarray(hint, jnp.float32)
        if hint.ndim == 3:
            hint = hint[None]
        hint = jnp.tile(hint, (batch_size, 1, 1, 1))
        x_T = None
        ladder = None
        if image is not None:
            full = ddpm_ladder(decoder_steps)
            t_start = max(len(full) - int(decoder_steps * strength), 0)
            ladder = full[t_start:]
            if len(ladder) == 0:
                raise ValueError(
                    f"strength={strength} with decoder_steps={decoder_steps} "
                    "leaves no refine steps; use strength >= "
                    f"{1.0 / decoder_steps:.3f}"
                )
            init = jnp.asarray(prepare_image_batch(image, w, h, batch_size))
            lat = self._movq_encode(init) * self.movq_scale
            if lat.shape[0] != batch_size:
                lat = jnp.tile(lat, (batch_size, 1, 1, 1))
            t0 = int(ladder[0])
            renoise = (
                check_noise(noise, tuple(lat.shape), "noise")
                if noise is not None
                else jax.random.normal(
                    self._next_rng(), lat.shape, jnp.float32)
            )
            a = self._decoder_sqrt_acp[t0]
            x_T = a * lat + jnp.sqrt(1.0 - a**2) * renoise
        elif noise is not None:
            x_T = check_noise(
                noise, (batch_size, h // 8, w // 8, 4), "noise")
        return self._decode_loop(
            embs, batch_size, decoder_steps, decoder_guidance_scale, h, w,
            extra_a=hint, task="controlnet", sampler=sampler, x_T=x_T,
            ladder=ladder, sp_mesh=sp_mesh, noise_seq=noise_seq,
        )

    # ------------------------------------------------------------------

    def _movq_encode(self, image):
        fn = self._jit(
            ("movq_enc22", tuple(image.shape)),
            lambda: jax.jit(
                lambda p, x: self.movq.apply(
                    {"params": p}, x.astype(self.dtype), method=self.movq.encode
                ).astype(jnp.float32)
            ),
        )
        return fn(self.params["movq"], image)

    def decode_latents(self, latents, sp_mesh=None, axis="sp"):
        """MoVQ-decode raw decoder latents (B, h/8, w/8, 4) to uint8 PIL
        images.  With ``sp_mesh`` the decode runs spatially parallel —
        image rows sharded over the mesh axis with halo-exchange convs
        (parallel/spatial.py) — for resolutions whose decoder activations
        exceed one chip's HBM.  Numerically the single-device decoder to
        ~1e-4 (tests/test_spatial_parallel.py)."""
        lat = jnp.asarray(latents, jnp.float32).astype(self.dtype)
        if sp_mesh is None:
            fn = self._jit(
                ("movq_dec22", tuple(lat.shape)),
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
