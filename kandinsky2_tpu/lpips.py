"""Native LPIPS (Learned Perceptual Image Patch Similarity, AlexNet variant)
in JAX — the BASELINE.json acceptance metric (LPIPS < 0.02 vs the torch
reference at a fixed seed) implemented in-repo so the gate produces a number
without the third-party ``lpips``/``torchvision`` packages at runtime.

Formula (Zhang et al. 2018, "The Unreasonable Effectiveness of Deep Features
as a Perceptual Metric", v0.1 'alex' weights):

    d(a, b) = sum_l  mean_{h,w}  sum_c  w_l[c] * (na_l - nb_l)^2[h, w, c]

where ``na_l``/``nb_l`` are channel-unit-normalized AlexNet feature maps of
the two images at the five ReLU taps, and ``w_l`` are the trained
non-negative linear-head weights.  Inputs are RGB in [-1, 1]; a fixed
per-channel shift/scale maps them to the backbone's expected statistics.

Weights: ``convert_lpips_state_dicts`` maps the published torch files — a
torchvision ``alexnet`` state_dict (features.0/3/6/8/10 convs) plus the
``lpips`` package's ``lin0..lin4.model.1.weight`` heads — to our layout;
``save_lpips_weights``/``load_lpips_weights`` round-trip a single
safetensors file, which is what ``validate.py --lpips-weights FILE``
consumes.  Converter CLI:

    python -m kandinsky2_tpu.lpips --alex alexnet.pth --lin lpips_alex.pth \
        --out /path/lpips_alex.safetensors
    python -m kandinsky2_tpu.lpips --weights lpips_alex.safetensors \
        --images a.png b.png          # prints the distance
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

# published input normalization constants (lpips ScalingLayer buffers)
SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# AlexNet feature stack: (layer key, out_ch, kernel, stride, pad,
# maxpool-before?).  Taps are the post-ReLU activations of each conv.
_CONVS = (
    ("features.0", 64, 11, 4, 2, False),
    ("features.3", 192, 5, 1, 2, True),
    ("features.6", 384, 3, 1, 1, True),
    ("features.8", 256, 3, 1, 1, False),
    ("features.10", 256, 3, 1, 1, False),
)
CHANNELS = tuple(c[1] for c in _CONVS)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _maxpool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """torch MaxPool2d(3, stride=2): VALID padding, NHWC."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


def alexnet_features(params: Dict, x: jnp.ndarray) -> List[jnp.ndarray]:
    """Five tapped AlexNet feature maps for NHWC images in [-1, 1]."""
    h = (x - jnp.asarray(SHIFT)) / jnp.asarray(SCALE)
    feats = []
    for key, _, _, stride, pad, pool_before in _CONVS:
        if pool_before:
            h = _maxpool_3x3_s2(h)
        h = jax.lax.conv_general_dilated(
            h, params[key]["kernel"],
            window_strides=(stride, stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + params[key]["bias"]
        h = jax.nn.relu(h)
        feats.append(h)
    return feats


def _unit_normalize(f: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Channel-unit normalization (lpips normalize_tensor: /(||f||+eps))."""
    norm = jnp.sqrt(jnp.sum(jnp.square(f), axis=-1, keepdims=True))
    return f / (norm + eps)


def lpips_distance(params: Dict, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """LPIPS distance per batch row; ``a``/``b`` NHWC RGB in [-1, 1]."""
    fa = alexnet_features(params, a)
    fb = alexnet_features(params, b)
    total = 0.0
    for i, (x, y) in enumerate(zip(fa, fb)):
        d = jnp.square(_unit_normalize(x) - _unit_normalize(y))
        w = params[f"lin{i}"]["weight"]  # [ch], non-negative
        total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
    return total


def lpips_images(params: Dict, img_a, img_b) -> float:
    """LPIPS between two PIL images / HWC uint8 arrays (jitted)."""
    to = lambda im: jnp.asarray(
        np.asarray(im, np.float32)[None] / 127.5 - 1.0
    )
    fn = jax.jit(lpips_distance)
    return float(fn(params, to(img_a), to(img_b))[0])


# ---------------------------------------------------------------------------
# weights
# ---------------------------------------------------------------------------


def init_random_lpips(seed: int = 0) -> Dict:
    """Random-weight LPIPS tree (tests / oracle comparisons)."""
    rng = np.random.default_rng(seed)
    params: Dict = {}
    in_ch = 3
    for key, out_ch, k, _, _, _ in _CONVS:
        params[key] = {
            "kernel": rng.normal(0, 0.05, (k, k, in_ch, out_ch)).astype(
                np.float32
            ),
            "bias": rng.normal(0, 0.05, (out_ch,)).astype(np.float32),
        }
        in_ch = out_ch
    for i, ch in enumerate(CHANNELS):
        params[f"lin{i}"] = {
            "weight": rng.uniform(0, 0.1, (ch,)).astype(np.float32)
        }
    return jax.tree_util.tree_map(jnp.asarray, params)


def convert_lpips_state_dicts(alex_sd: Dict, lin_sd: Dict) -> Dict:
    """torchvision alexnet state_dict + lpips lin-head state_dict -> ours.

    ``alex_sd``: features.{0,3,6,8,10}.{weight,bias}, conv weights OIHW.
    ``lin_sd``: lin{i}.model.1.weight (or lins.{i}.model.1.weight) of shape
    [1, ch, 1, 1].
    """

    def to_np(t):
        if isinstance(t, np.ndarray):
            return t
        return t.detach().cpu().float().numpy()

    params: Dict = {}
    for key, out_ch, k, _, _, _ in _CONVS:
        w = to_np(alex_sd[f"{key}.weight"])
        if w.shape[:2] != (out_ch, w.shape[1]) or w.shape[2] != k:
            raise ValueError(f"unexpected {key}.weight shape {w.shape}")
        params[key] = {
            "kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
            "bias": to_np(alex_sd[f"{key}.bias"]),
        }
    for i, ch in enumerate(CHANNELS):
        for lk in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if lk in lin_sd:
                w = to_np(lin_sd[lk]).reshape(-1)
                break
        else:
            raise KeyError(f"lin{i} head not found in lin state dict")
        if w.shape != (ch,):
            raise ValueError(f"lin{i} head has {w.shape[0]} ch, wanted {ch}")
        if (w < 0).any():
            # the paper constrains heads non-negative; a negative value means
            # a wrong file, not a valid metric
            raise ValueError(f"lin{i} head has negative weights")
        params[f"lin{i}"] = {"weight": w.astype(np.float32)}
    return params


def save_lpips_weights(params: Dict, path: str) -> None:
    from safetensors.numpy import save_file

    flat = {}
    for key, sub in params.items():
        for leaf, arr in sub.items():
            flat[f"{key}.{leaf}"] = np.ascontiguousarray(
                np.asarray(arr, np.float32)
            )
    save_file(flat, path)


def load_lpips_weights(path: str) -> Dict:
    from safetensors.numpy import load_file

    flat = load_file(path)
    params: Dict = {}
    for fk, arr in flat.items():
        key, leaf = fk.rsplit(".", 1)
        params.setdefault(key, {})[leaf] = jnp.asarray(arr)
    expected = {c[0] for c in _CONVS} | {f"lin{i}" for i in range(5)}
    missing = expected - set(params)
    if missing:
        raise KeyError(f"LPIPS weights file {path} missing {sorted(missing)}")
    return params


def _unwrap_lpips_sd(sd) -> Dict:
    """Normalize a torch.load result to a flat tensor dict.

    Accepts a plain state_dict, a pickled module (unwrapped via its
    ``state_dict()``), or a full ``lpips.LPIPS`` pickle/state_dict — whose
    backbone lives under ``net.sliceK.IDX.*`` (lpips pretrained_networks
    keeps torchvision's original feature indices inside each slice); those
    keys are mapped back to torchvision's ``features.IDX.*`` namespace so
    one full-LPIPS file can serve as BOTH the alexnet and the lin input.
    """
    if hasattr(sd, "state_dict") and callable(sd.state_dict):
        sd = sd.state_dict()
    out = {}
    for k, v in sd.items():
        if k.startswith("net.slice"):
            k = "features." + k.split(".", 2)[2]
        out[k] = v
    return out


def convert_torch_files(alex_path: str, lin_path: str, out_path: str) -> None:
    """Convert torch LPIPS weights to our safetensors layout.  Each input may
    be a state_dict, a pickled module, or a full ``lpips.LPIPS`` checkpoint
    (pass the same file for both paths in that case)."""
    import torch

    alex_sd = _unwrap_lpips_sd(
        torch.load(alex_path, map_location="cpu", weights_only=False))
    lin_sd = _unwrap_lpips_sd(
        torch.load(lin_path, map_location="cpu", weights_only=False))
    save_lpips_weights(convert_lpips_state_dicts(alex_sd, lin_sd), out_path)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m kandinsky2_tpu.lpips",
        description="convert LPIPS torch weights / compute LPIPS natively",
    )
    ap.add_argument("--alex", help="torchvision alexnet state_dict (.pth)")
    ap.add_argument("--lin", help="lpips package lin-head file (alex.pth)")
    ap.add_argument("--out", help="output safetensors path for --alex/--lin")
    ap.add_argument("--weights", help="converted safetensors weights")
    ap.add_argument("--images", nargs=2, metavar=("A", "B"),
                    help="two image paths to score")
    args = ap.parse_args(argv)
    if args.alex and args.lin and args.out:
        convert_torch_files(args.alex, args.lin, args.out)
        print(json.dumps({"written": args.out}))
        return 0
    if args.weights and args.images:
        from PIL import Image

        params = load_lpips_weights(args.weights)
        a = Image.open(args.images[0]).convert("RGB")
        b = Image.open(args.images[1]).convert("RGB")
        print(json.dumps({"lpips_alex": lpips_images(params, a, b)}))
        return 0
    ap.print_help()
    return 2


if __name__ == "__main__":
    sys.exit(main())
