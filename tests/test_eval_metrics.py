"""Fidelity metric sanity checks."""

import numpy as np

from kandinsky2_tpu.eval import latent_rmse, psnr, ssim


def test_psnr_ssim():
    a = (np.random.RandomState(0).rand(32, 32, 3) * 255).astype(np.float32)
    assert psnr(a, a) == float("inf")
    assert abs(ssim(a, a) - 1.0) < 1e-9
    b = a + np.random.RandomState(1).randn(*a.shape).astype(np.float32) * 5
    p = psnr(a, b)
    assert 25 < p < 45
    assert 0.5 < ssim(a, b) <= 1.0
    assert latent_rmse(a, b) > 0
