"""Output-fidelity metrics for checkpoint/conversion validation.

BASELINE.md gates output fidelity at LPIPS < 0.02 vs the torch reference at a
fixed seed.  Offline (no LPIPS weights available) the suite proves fidelity
by seeded bit-parity (tests/test_e2e_seeded_parity.py); this module provides
the runtime metrics for validating real checkpoints:

* psnr / ssim — classical pixel metrics
* clip_perceptual_distance — an LPIPS-style perceptual distance using the
  pipeline's own (jitted) CLIP vision tower features, so no extra weights are
  needed beyond what the pipeline already loads.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 255.0) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(20 * np.log10(data_range) - 10 * np.log10(mse))


def ssim(a: np.ndarray, b: np.ndarray, data_range: float = 255.0) -> float:
    """Global (single-window) SSIM — sufficient as a conversion sanity gate."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    mu_a, mu_b = a.mean(), b.mean()
    va, vb = a.var(), b.var()
    cov = ((a - mu_a) * (b - mu_b)).mean()
    return float(
        ((2 * mu_a * mu_b + c1) * (2 * cov + c2))
        / ((mu_a**2 + mu_b**2 + c1) * (va + vb + c2))
    )


def clip_perceptual_distance(pipe, img_a, img_b) -> float:
    """LPIPS-style distance: 1 - cosine similarity of CLIP image embeddings
    computed with the pipeline's own vision tower.  ``img_a``/``img_b`` are
    PIL images."""
    ea = np.asarray(pipe.encode_images(img_a, is_pil=True), np.float64)[0]
    eb = np.asarray(pipe.encode_images(img_b, is_pil=True), np.float64)[0]
    cos = float(
        np.dot(ea, eb) / (np.linalg.norm(ea) * np.linalg.norm(eb) + 1e-12)
    )
    return 1.0 - cos


def latent_rmse(a, b) -> float:
    return float(
        jnp.sqrt(jnp.mean((jnp.asarray(a, jnp.float32) - jnp.asarray(b, jnp.float32)) ** 2))
    )
