"""Host-side monocular depth hints for the 2.2 ControlNet-depth decoder.

The reference drives ControlNet with MiDaS run host-side
(notebooks/kandinsky2_2_controlnet.ipynb: ``MidasDetector`` ->
``make_hint`` -> normalized [0,1] 3-channel map).  This module provides the
same hint contract without the network-gated MiDaS weights:

* :func:`make_hint` — the notebook's hint formatting: any HxW depth map ->
  float32 [H, W, 3] in [0, 1] (channels replicated), resized to the target.
* :func:`dpt_estimator` — the REAL estimator: a converted DPT
  (models/dpt.py, parity-tested against transformers' torch
  DPTForDepthEstimation) built from a local HF snapshot
  (``weights.hub.fetch_dpt``); preprocessing host-side, inference jitted.
* :func:`heuristic_depth` — a documented, deterministic NON-PARITY fallback
  estimator built from classic monocular cues (ground-plane vertical prior,
  local sharpness, luma).  It produces a smooth, plausible depth field good
  enough to drive the ControlNet stack end-to-end offline; it is NOT MiDaS
  and makes no quality claim against it.
* a pluggable estimator hook: any callable ``pil_image -> HxW float array``
  drops into :func:`make_hint` via ``estimator=``;
  :func:`default_estimator` picks the DPT when ``$KANDINSKY2_DPT_DIR`` (or
  an explicit dir) holds a snapshot, the heuristic otherwise.

Everything here is numpy preprocessing on the host — depth never enters the
jitted programs except as the finished hint tensor.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Optional

import numpy as np

__all__ = ["heuristic_depth", "make_hint", "dpt_estimator", "default_estimator"]


def _box_blur(x: np.ndarray, radius: int) -> np.ndarray:
    """Separable box blur with edge replication (no scipy dependency)."""
    if radius <= 0:
        return x
    k = 2 * radius + 1
    pad = np.pad(x, ((radius, radius), (0, 0)), mode="edge")
    csum = np.cumsum(pad, axis=0)
    csum = np.concatenate([np.zeros((1,) + csum.shape[1:]), csum], axis=0)
    x = (csum[k:] - csum[:-k]) / k
    pad = np.pad(x, ((0, 0), (radius, radius)), mode="edge")
    csum = np.cumsum(pad, axis=1)
    csum = np.concatenate([np.zeros((csum.shape[0], 1)), csum], axis=1)
    return (csum[:, k:] - csum[:, :-k]) / k


def _normalize01(x: np.ndarray) -> np.ndarray:
    lo, hi = float(x.min()), float(x.max())
    if hi - lo < 1e-8:
        return np.zeros_like(x)
    return (x - lo) / (hi - lo)


def heuristic_depth(image) -> np.ndarray:
    """Deterministic monocular-cue depth estimate, [H, W] float32 in [0, 1]
    (1 = near, matching MiDaS' inverse-depth convention).

    NON-PARITY fallback: combines a ground-plane vertical prior (lower image
    rows are nearer), local sharpness (in-focus regions are nearer), and a
    dark-is-far luma prior, each smoothed.  Use a converted MiDaS for real
    depth; this exists so the ControlNet path is drivable offline from any
    RGB photo."""
    arr = np.asarray(image, np.float32)
    if arr.ndim == 3:
        luma = (
            0.299 * arr[..., 0] + 0.587 * arr[..., 1] + 0.114 * arr[..., 2]
        )
    else:
        luma = arr
    if luma.max() > 1.5:  # uint8-range input
        luma = luma / 255.0
    H, W = luma.shape
    r = max(1, min(H, W) // 64)

    # ground-plane prior: rows near the bottom are near the camera
    vertical = np.linspace(0.0, 1.0, H, dtype=np.float32)[:, None]
    vertical = np.broadcast_to(vertical, (H, W))

    # sharpness: local high-frequency energy, heavily smoothed
    smooth = _box_blur(luma, r)
    highfreq = np.abs(luma - smooth)
    sharpness = _normalize01(_box_blur(highfreq, 4 * r))

    # luma prior: haze/sky is bright and far -> darker is nearer
    darkness = _normalize01(_box_blur(1.0 - luma, 2 * r))

    depth = 0.6 * vertical + 0.25 * sharpness + 0.15 * darkness
    return _normalize01(_box_blur(depth, r)).astype(np.float32)


def _resize_bilinear(x: np.ndarray, h: int, w: int) -> np.ndarray:
    """Tiny bilinear resize (avoids importing PIL for float maps)."""
    H, W = x.shape
    yy = np.linspace(0, H - 1, h, dtype=np.float32)
    xx = np.linspace(0, W - 1, w, dtype=np.float32)
    y0 = np.clip(np.floor(yy).astype(np.int64), 0, H - 1)
    x0 = np.clip(np.floor(xx).astype(np.int64), 0, W - 1)
    y1 = np.minimum(y0 + 1, H - 1)
    x1 = np.minimum(x0 + 1, W - 1)
    wy = (yy - y0)[:, None]
    wx = (xx - x0)[None, :]
    top = x[y0][:, x0] * (1 - wx) + x[y0][:, x1] * wx
    bot = x[y1][:, x0] * (1 - wx) + x[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


def dpt_estimator(repo_dir: str, dtype=None) -> Callable:
    """Build a reference-grade depth estimator from a local HF DPT snapshot
    (config.json + model.safetensors / pytorch_model.bin) — hybrid
    (Intel/dpt-hybrid-midas, ``fetch_dpt``'s default: the exact MiDaS model
    the reference notebook's MidasDetector runs, so ControlNet hints match
    the decoder's training-time conditioner distribution) or pure-ViT
    (Intel/dpt-large: sharper depth, but a hint-distribution shift vs what
    kandinsky-2-2-controlnet-depth was trained on).

    Returns a callable ``image -> [H, W] float32`` relative inverse depth
    (MiDaS convention) that preprocesses host-side (bicubic resize to the
    model's native square size, (x/255 - 0.5)/0.5) and runs the jitted
    :class:`models.dpt.DPTDepth` on the device — the drop-in ``estimator=``
    for :func:`make_hint`, replacing the heuristic with the trained model
    the reference notebook uses."""
    import jax
    import jax.numpy as jnp

    from .models.dpt import DPTDepth, dpt_overrides
    from .weights.convert import convert_state_dict

    with open(os.path.join(repo_dir, "config.json")) as f:
        cfg = json.load(f)
    model = DPTDepth(dtype=dtype or jnp.float32, **dpt_overrides(cfg))

    st = os.path.join(repo_dir, "model.safetensors")
    if os.path.exists(st):
        from safetensors.numpy import load_file

        sd = load_file(st)
    else:
        import torch

        sd = torch.load(os.path.join(repo_dir, "pytorch_model.bin"),
                        map_location="cpu", weights_only=False)
    size = model.image_size
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, size, size, 3)))["params"]
    )
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_state_dict(sd, shapes, strict=True)
    )
    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x))

    def estimate(image) -> np.ndarray:
        from PIL import Image

        if not isinstance(image, Image.Image):
            arr = np.asarray(image)
            if arr.dtype != np.uint8:
                arr = np.clip(arr * (255.0 if arr.max() <= 1.5 else 1.0),
                              0, 255).astype(np.uint8)
            image = Image.fromarray(arr)
        im = image.convert("RGB").resize((size, size), Image.BICUBIC)
        x = np.asarray(im, np.float32)[None] / 255.0
        x = (x - 0.5) / 0.5
        return np.asarray(fwd(params, jnp.asarray(x))[0], np.float32)

    estimate.model = model
    estimate.params = params
    return estimate


def default_estimator(repo_dir: Optional[str] = None) -> Callable:
    """The best available estimator: converted DPT when a snapshot exists
    (``repo_dir`` or ``$KANDINSKY2_DPT_DIR``), else the documented
    heuristic."""
    repo_dir = repo_dir or os.environ.get("KANDINSKY2_DPT_DIR")
    if repo_dir and os.path.exists(os.path.join(repo_dir, "config.json")):
        return dpt_estimator(repo_dir)
    return heuristic_depth


def make_hint(
    image,
    h: Optional[int] = None,
    w: Optional[int] = None,
    estimator: Optional[Callable] = None,
) -> np.ndarray:
    """RGB image -> ControlNet hint [H, W, 3] float32 in [0, 1].

    Mirrors the reference notebook's ``make_hint`` (depth map -> HWC3 ->
    /255 in torch CHW; ours is NHWC): the depth channel is replicated to 3
    channels and normalized to [0, 1].  ``estimator`` maps a PIL/array image
    to an HxW depth map; the default is :func:`default_estimator` — the
    converted DPT when ``$KANDINSKY2_DPT_DIR`` points at a snapshot, else
    the heuristic."""
    estimator = estimator or default_estimator()
    depth = np.asarray(estimator(image), np.float32)
    if depth.ndim == 3:
        depth = depth[..., 0]
    depth = _normalize01(depth)
    if h is not None and w is not None and depth.shape != (h, w):
        depth = _resize_bilinear(depth, h, w)
    return np.repeat(depth[..., None], 3, axis=-1).astype(np.float32)
