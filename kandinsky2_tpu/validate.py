"""One-command real-weights validation harness.

    python -m kandinsky2_tpu.validate --version 2.1 --out report.json

Stages (each recorded in the JSON report; the harness runs as far as the
environment allows and reports exactly where it stopped):

1. **fetch**    — download the published checkpoints
                  (reference: kandinsky2/__init__.py:104-152).
2. **build**    — torch→flax conversion + pipeline assembly
                  (weights/load_kandinsky*.py).
3. **generate** — seeded generation at a fixed prompt/size/steps.
4. **metrics**  — PSNR / windowed SSIM / CLIP-cosine drift vs stored
                  reference images (``--reference-dir``).  The BASELINE
                  LPIPS<0.02 gate runs natively in JAX with
                  ``--lpips-weights FILE`` (converted once via ``python -m
                  kandinsky2_tpu.lpips``); without weights the report marks
                  it *not evaluated* rather than faking it.
5. **report**   — one JSON document with per-stage status.

Offline environments (no network) complete stage 0 (plumbing) and stop at
``fetch`` with a structured error — the post-fetch path is the same code the
test suite drives with tiny random checkpoints (tests/test_validate.py), so
the moment weights exist this command validates them end to end.
"""

from __future__ import annotations

import argparse
import json
import os
import time
import traceback
from typing import Callable, Optional

import numpy as np

VALIDATION_PROMPT = "red cat, 4k photo"
SEED = 0


def _stage(report: dict, name: str, fn: Callable):
    """Run one stage, recording status/duration; re-raises _StopValidation."""
    t0 = time.time()
    entry = {"status": "running"}
    report["stages"][name] = entry
    try:
        out = fn()
        entry["status"] = "ok"
        return out
    except Exception as e:  # noqa: BLE001 - every failure goes in the report
        entry["status"] = "failed"
        entry["error"] = f"{type(e).__name__}: {e}"
        entry["traceback"] = traceback.format_exc(limit=8)
        raise _StopValidation(name) from e
    finally:
        entry["seconds"] = round(time.time() - t0, 3)


class _StopValidation(Exception):
    def __init__(self, stage: str):
        self.stage = stage
        super().__init__(stage)


def lpips_available() -> bool:
    try:  # pragma: no cover - optional deps absent in this image
        import lpips  # noqa: F401

        return True
    except ImportError:
        pass
    try:  # pragma: no cover
        import torchvision  # noqa: F401

        return True
    except ImportError:
        return False


def compute_lpips(img_a, img_b) -> Optional[float]:
    """Real LPIPS (AlexNet) when the optional package exists, else None."""
    if not lpips_available():  # the honest path in this image
        return None
    import lpips  # pragma: no cover - needs network-installed package
    import torch

    net = lpips.LPIPS(net="alex")
    to_t = lambda im: torch.from_numpy(
        np.asarray(im, np.float32).transpose(2, 0, 1)[None] / 127.5 - 1.0
    )
    with torch.no_grad():
        return float(net(to_t(img_a), to_t(img_b)).item())


def run_generation(pipe, *, h: int = 256, w: int = 256, num_steps: int = 20,
                   sampler: str = "ddim_sampler", prompt: str = VALIDATION_PROMPT,
                   seed: int = SEED, **kw):
    """Stage 3: seeded generation — shared by the CLI and the offline test."""
    pipe.set_seed(seed)
    return pipe.generate_text2img(prompt, num_steps=num_steps, h=h, w=w,
                                  sampler=sampler, **kw)


def run_generation_22(pipe, *, h: int = 256, w: int = 256,
                      decoder_steps: int = 20, prior_steps: int = 10,
                      sampler: str = "ddpm",
                      prompt: str = VALIDATION_PROMPT, seed: int = SEED):
    pipe.set_seed(seed)
    return pipe.generate_text2img(prompt, decoder_steps=decoder_steps,
                                  prior_steps=prior_steps, h=h, w=w,
                                  sampler=sampler)


def run_metrics(report: dict, images, reference_dir: Optional[str],
                out_dir: str, pipe=None,
                lpips_weights: Optional[str] = None) -> None:
    """Stage 4: save outputs; compare against stored reference images.

    ``lpips_weights``: path to a converted LPIPS safetensors file
    (``python -m kandinsky2_tpu.lpips --alex ... --lin ... --out FILE``);
    when given, the BASELINE LPIPS<0.02 gate runs natively in JAX with no
    torch/lpips dependency."""
    from .eval import clip_perceptual_distance, ms_ssim, psnr, ssim

    native_lpips = None
    if lpips_weights:
        from .lpips import lpips_images, load_lpips_weights

        _lp_params = load_lpips_weights(lpips_weights)
        native_lpips = lambda x, y: lpips_images(_lp_params, x, y)

    os.makedirs(out_dir, exist_ok=True)
    out_paths = []
    for i, im in enumerate(images):
        p = os.path.join(out_dir, f"generated_{i}.png")
        im.save(p)
        out_paths.append(p)
    report["outputs"] = out_paths

    if not reference_dir:
        report["metrics"] = {
            "note": "no --reference-dir given; outputs saved as the new "
                    "reference set (bootstrap mode)"
        }
        return
    from PIL import Image

    metrics = []
    for i, im in enumerate(images):
        ref_path = os.path.join(reference_dir, f"generated_{i}.png")
        if not os.path.exists(ref_path):
            metrics.append({"index": i, "error": f"missing {ref_path}"})
            continue
        ref = Image.open(ref_path).convert("RGB")
        a = np.asarray(im, np.float64)
        b = np.asarray(ref, np.float64)
        m = {
            "index": i,
            "psnr_db": round(psnr(a, b), 3),
            "ssim": round(ssim(a, b), 5),
            # multi-scale SSIM: the strongest offline perceptual proxy
            # (the LPIPS gate proper still needs the lpips package)
            "ms_ssim": round(ms_ssim(a, b), 5),
        }
        if native_lpips is not None:
            lp = native_lpips(im, ref)
            m["lpips_backend"] = "native-jax"
        else:
            lp = compute_lpips(im, ref)
            if lp is not None:
                m["lpips_backend"] = "lpips-pkg"
        if lp is not None:
            m["lpips_alex"] = round(lp, 5)
            m["lpips_gate_0.02"] = bool(lp < 0.02)
        else:
            m["lpips_alex"] = None
            m["lpips_gate_0.02"] = (
                "not evaluated: pass --lpips-weights FILE (converted via "
                "python -m kandinsky2_tpu.lpips) or install lpips"
            )
        if pipe is not None and hasattr(pipe, "encode_images"):
            m["clip_cosine_drift"] = round(
                clip_perceptual_distance(pipe, im, ref), 5
            )
        metrics.append(m)
    report["metrics"] = metrics


def validate(version: str = "2.1", task_type: str = "text2img",
             cache_dir: str = "/tmp/kandinsky2", out_dir: str = "/tmp/k2_validate",
             reference_dir: Optional[str] = None, h: int = 256, w: int = 256,
             num_steps: int = 20, sampler: Optional[str] = None,
             use_auth_token=None,
             pipe_builder: Optional[Callable] = None,
             lpips_weights: Optional[str] = None) -> dict:
    """Run the full validation ladder; returns the report dict.

    ``pipe_builder`` overrides stages 1-2 (the offline test injects a tiny
    random pipeline there; production leaves it None).
    """
    report = {
        "version": version, "task_type": task_type, "prompt": VALIDATION_PROMPT,
        "seed": SEED, "h": h, "w": w, "num_steps": num_steps,
        "stages": {}, "ok": False,
    }
    try:
        if pipe_builder is not None:
            pipe = _stage(report, "build", pipe_builder)
        elif version == "2.1":
            from .weights.hub import fetch_2_1
            from .weights.load_kandinsky import build_kandinsky21

            paths = _stage(report, "fetch", lambda: fetch_2_1(
                cache_dir, task_type, use_auth_token))
            pipe = _stage(report, "build", lambda: build_kandinsky21(
                paths, task_type=task_type))
        elif version == "2.0":
            from .weights.hub import fetch_2_0
            from .weights.load_kandinsky import build_kandinsky20

            paths = _stage(report, "fetch", lambda: fetch_2_0(
                cache_dir, task_type, use_auth_token))
            pipe = _stage(report, "build", lambda: build_kandinsky20(
                paths, task_type=task_type))
        elif version == "2.2":
            # 2.2 weights live in diffusers snapshots (prior + decoder repos);
            # fetch_2_2 downloads them under <cache_dir>/2_2 (a pre-populated
            # cache with the same layout is used as-is)
            from .weights.hub import fetch_2_2
            from .weights.load_kandinsky22 import build_kandinsky22

            paths = _stage(report, "fetch", lambda: fetch_2_2(
                cache_dir, task_type, use_auth_token))
            pipe = _stage(report, "build", lambda: build_kandinsky22(
                paths["prior_dir"], paths["decoder_dir"],
                task_type=task_type))
        else:
            raise ValueError(f"unknown version {version!r}")

        if version == "2.2":
            images = _stage(report, "generate", lambda: run_generation_22(
                pipe, h=h, w=w, decoder_steps=num_steps,
                sampler=sampler or "ddpm"))
        else:
            images = _stage(report, "generate", lambda: run_generation(
                pipe, h=h, w=w, num_steps=num_steps,
                sampler=sampler or "ddim_sampler"))
        _stage(report, "metrics", lambda: run_metrics(
            report, images, reference_dir, out_dir,
            pipe=pipe if version != "2.2" else None,
            lpips_weights=lpips_weights))
        report["ok"] = True
    except _StopValidation as stop:
        report["stopped_at"] = stop.stage
    return report


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m kandinsky2_tpu.validate",
        description="fetch -> convert -> seeded generate -> metrics -> JSON",
    )
    ap.add_argument("--version", default="2.1", choices=["2.0", "2.1", "2.2"])
    ap.add_argument("--task-type", default="text2img")
    ap.add_argument("--cache-dir", default="/tmp/kandinsky2")
    ap.add_argument("--out-dir", default="/tmp/k2_validate")
    ap.add_argument("--reference-dir", default=None,
                    help="directory of stored reference generated_<i>.png")
    ap.add_argument("--out", default=None, help="report JSON path")
    ap.add_argument("--h", type=int, default=256)
    ap.add_argument("--w", type=int, default=256)
    ap.add_argument("--num-steps", type=int, default=20)
    ap.add_argument("--sampler", default=None,
                    help="override the sampler (e.g. dpmpp_sampler / dpmpp) "
                    "for sampler-quality comparisons against a reference set")
    ap.add_argument("--lpips-weights", default=None,
                    help="converted LPIPS safetensors (python -m "
                    "kandinsky2_tpu.lpips --alex ... --lin ... --out FILE); "
                    "runs the BASELINE LPIPS<0.02 gate natively in JAX")
    args = ap.parse_args(argv)

    report = validate(
        version=args.version, task_type=args.task_type,
        cache_dir=args.cache_dir, out_dir=args.out_dir,
        reference_dir=args.reference_dir, h=args.h, w=args.w,
        num_steps=args.num_steps, sampler=args.sampler,
        lpips_weights=args.lpips_weights,
    )
    text = json.dumps(report, indent=2, default=str)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
