"""Host-side image/mask helpers (reference: kandinsky2/utils.py), NHWC.

The reference's O(H*W) Python mask-erosion double loop (utils.py:11-30) is a
vectorized 6-neighborhood erosion here.
"""

from __future__ import annotations

import numpy as np

from .diffusion import Schedule, q_sample as _q_sample

try:  # PIL is only needed at the pipeline edges
    from PIL import Image
except Exception:  # pragma: no cover
    Image = None


def prepare_image(pil_image, w: int = 512, h: int = 512) -> np.ndarray:
    """PIL -> [1, H, W, 3] float32 in [-1, 1] (utils.py:33-39), NHWC."""
    pil_image = pil_image.resize((w, h), resample=Image.BICUBIC, reducing_gap=1)
    arr = np.array(pil_image.convert("RGB")).astype(np.float32) / 127.5 - 1
    return arr[None]


def prepare_image_batch(images, w: int, h: int, batch_size: int) -> np.ndarray:
    """One init image or a per-batch list -> [1 or B, H, W, 3] array.

    A list must match ``batch_size`` (each batch row gets its own init image
    — the staged hires handoff); a single image is returned with batch 1 for
    the caller to tile after noising."""
    if isinstance(images, (list, tuple)):
        if len(images) != batch_size:
            raise ValueError(
                f"got {len(images)} init images for batch {batch_size}"
            )
        return np.concatenate([prepare_image(im, w=w, h=h) for im in images])
    return prepare_image(images, w=w, h=h)


def prepare_mask(mask: np.ndarray) -> np.ndarray:
    """Erode the keep-region by one latent pixel (utils.py:11-30), vectorized.

    ``mask``: [1, H, W, 1] (or [H, W]) with 1 = keep, 0 = inpaint.  Every pixel
    whose old value is 0 zeroes the 6-neighborhood {(±1,0), (0,±1), (−1,−1),
    (+1,+1)} — the reference loop touches exactly those offsets.
    """
    squeeze_to = mask.shape
    m = np.asarray(mask, dtype=np.float32)
    if m.ndim == 4:
        hw = m[0, :, :, 0]
    elif m.ndim == 2:
        hw = m
    else:
        raise ValueError(f"mask shape {mask.shape}")
    from . import native

    if native.available():
        out = native.erode_mask(hw)
        return out.reshape(squeeze_to).astype(np.float32)
    pad = np.pad(hw, 1, constant_values=1.0)
    out = hw.copy()
    # offsets (dy, dx) whose zero forces this pixel to zero: the transpose of
    # the write-offsets in the reference loop
    for dy, dx in [(1, 0), (0, 1), (1, 1), (-1, 0), (0, -1), (-1, -1)]:
        out = out * pad[1 + dy : 1 + dy + hw.shape[0], 1 + dx : 1 + dx + hw.shape[1]]
    out = out * hw
    return out.reshape(squeeze_to).astype(np.float32)


def q_sample(x_start, t, sched: Schedule, noise=None, rng=None):
    """Standalone forward-noising for img2img (utils.py:42-54); schedule is
    precomputed instead of rebuilt per call."""
    import jax

    if noise is None:
        noise = jax.random.normal(rng, x_start.shape, x_start.dtype)
    return _q_sample(sched, x_start, t, noise)


def process_images(batch: np.ndarray):
    """[-1,1] NHWC floats -> list of PIL images (utils.py:57-70); the
    conversion runs in the native host-ops library when available."""
    from . import native

    scaled = native.f32_to_u8_images(np.asarray(batch, np.float32))
    return [Image.fromarray(scaled[i]) for i in range(scaled.shape[0])]


def as_prompt_list(prompt, batch_size: int) -> list[str]:
    """Normalize a prompt argument to a per-sample list of length B.

    The reference API takes one prompt string repeated ``batch_size`` times
    (kandinsky2_1_model.py:299-351); we additionally accept a list of
    *distinct* prompts so a serving tier can coalesce different users'
    requests into one compiled program (the tokenizers and conditioning
    encoders batch naturally).  A single-element list broadcasts.
    """
    if isinstance(prompt, str):
        return [prompt] * batch_size
    prompts = [str(p) for p in prompt]
    if len(prompts) == 1 and batch_size > 1:
        return prompts * batch_size
    if len(prompts) != batch_size:
        raise ValueError(
            f"got {len(prompts)} prompts for batch_size={batch_size}; pass "
            "one prompt, or exactly batch_size prompts"
        )
    return prompts


def check_noise(noise, shape, name: str = "noise"):
    """Validate user-injected noise against the shape the trajectory needs.

    Returns the array as float32, or None unchanged.  Day-one fidelity
    validation (SURVEY §7 "RNG parity") feeds torch-generated normal draws
    through the public API; a silent shape mismatch there would broadcast or
    crash deep inside a scanned program, so fail loud at the boundary.
    """
    if noise is None:
        return None
    import jax.numpy as jnp

    arr = jnp.asarray(noise, jnp.float32)
    if tuple(arr.shape) != tuple(shape):
        raise ValueError(
            f"{name} has shape {tuple(arr.shape)}, expected {tuple(shape)} "
            "(the exact tensor the pipeline would have drawn internally)"
        )
    return arr


def resolve_batch(prompt, batch_size: int) -> int:
    """Infer batch size from a prompt list when the caller left it at 1."""
    if not isinstance(prompt, str) and batch_size == 1:
        return max(len(list(prompt)), 1)
    return batch_size


def get_new_h_w(h: int, w: int) -> tuple[int, int]:
    """Pixel dims -> latent dims, 64-px aligned (kandinsky2_1_model.py:106-113):
    latent cell = 8 * ceil(dim/64)."""
    new_h = (h + 63) // 64
    new_w = (w + 63) // 64
    return new_h * 8, new_w * 8
