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


def test_ms_ssim():
    from kandinsky2_tpu.eval import ms_ssim

    rs = np.random.RandomState(2)
    a = (rs.rand(192, 192, 3) * 255).astype(np.float32)
    # identity: every scale's term is 1
    assert abs(ms_ssim(a, a) - 1.0) < 1e-9
    # ordering: light noise scores above heavy noise, both in (0, 1]
    light = np.clip(a + rs.randn(*a.shape) * 5, 0, 255)
    heavy = np.clip(a + rs.randn(*a.shape) * 60, 0, 255)
    ms_l, ms_h = ms_ssim(a, light), ms_ssim(a, heavy)
    assert 0 < ms_h < ms_l <= 1.0
    # a global luminance shift barely touches contrast-structure scales:
    # MS-SSIM must forgive it more than a same-energy noise corruption
    shifted = np.clip(a + 12.0, 0, 255)
    noisy = np.clip(a + rs.randn(*a.shape) * 12.0, 0, 255)
    assert ms_ssim(a, shifted) > ms_ssim(a, noisy)
    # small images fall back to fewer scales instead of raising
    s = a[:24, :24]
    assert 0 < ms_ssim(s, s) <= 1.0

    try:
        ms_ssim(a[:8, :8], a[:8, :8])
        raised = False
    except ValueError:
        raised = True
    assert raised, "sub-window images must raise"
