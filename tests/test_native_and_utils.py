"""Native host-ops parity (C++ vs numpy vs the torch reference) and host
utils (mask erosion vs reference prepare_mask, process_images roundtrip)."""

import numpy as np
import torch

from kandinsky2_tpu import native
from kandinsky2_tpu.utils import get_new_h_w, prepare_mask, process_images

from ref_loader import _ensure_pkg
import importlib


def ref_utils():
    """Import kandinsky2/utils.py via a parentless package (it only needs
    .model.utils)."""
    _ensure_pkg("refk", "/root/reference/kandinsky2")
    return importlib.import_module("refk.utils")


def test_native_builds():
    assert native.available(), "C++ hostops library failed to build"


def test_f32_to_u8_matches_reference():
    rng = np.random.RandomState(0)
    batch = (rng.rand(2, 16, 16, 3).astype(np.float32) * 2.4 - 1.2)
    ours = native.f32_to_u8_images(batch)
    ref = ref_utils()
    theirs = ref.process_images(torch.tensor(np.transpose(batch, (0, 3, 1, 2))))
    for i in range(2):
        np.testing.assert_array_equal(ours[i], np.asarray(theirs[i]))


def test_erode_mask_matches_reference():
    rng = np.random.RandomState(1)
    mask = (rng.rand(12, 10) > 0.4).astype(np.float32)
    ref = ref_utils()
    theirs = (
        ref.prepare_mask(torch.tensor(mask)[None, None]).numpy().squeeze()
    )
    ours_native = native.erode_mask(mask)
    np.testing.assert_array_equal(ours_native, theirs)
    # numpy path (prepare_mask with 2-D input falls back when native absent;
    # here exercise the vectorized branch directly)
    from kandinsky2_tpu import utils as U

    pad = np.pad(mask, 1, constant_values=1.0)
    out = mask.copy()
    for dy, dx in [(1, 0), (0, 1), (1, 1), (-1, 0), (0, -1), (-1, -1)]:
        out = out * pad[1 + dy : 1 + dy + 12, 1 + dx : 1 + dx + 10]
    np.testing.assert_array_equal(out * mask, theirs)


def test_prepare_mask_shapes():
    m = np.ones((1, 8, 8, 1), np.float32)
    m[0, 3:5, 3:5, 0] = 0
    out = prepare_mask(m)
    assert out.shape == (1, 8, 8, 1)
    assert out.sum() < m.sum()


def test_get_new_h_w():
    # kandinsky2_1_model.py:106-113
    assert get_new_h_w(512, 512) == (64, 64)
    assert get_new_h_w(768, 768) == (96, 96)
    assert get_new_h_w(65, 512) == (16, 64)


def test_process_images_roundtrip():
    rng = np.random.RandomState(2)
    batch = rng.rand(1, 8, 8, 3).astype(np.float32) * 2 - 1
    imgs = process_images(batch)
    back = np.asarray(imgs[0]).astype(np.float32) / 127.5 - 1
    assert np.abs(back - batch[0]).max() < 1 / 127.0
