"""Host-side depth-hint producer (kandinsky2_tpu/depth.py): hint contract of
the reference notebook's make_hint (HWC3, [0,1]) plus the documented
non-parity heuristic estimator."""

import numpy as np
from PIL import Image

from kandinsky2_tpu.depth import heuristic_depth, make_hint


def photo(size=96, seed=0):
    rng = np.random.RandomState(seed)
    yy = np.linspace(0, 1, size, dtype=np.float32)[:, None]
    img = np.stack(
        [
            0.2 + 0.5 * yy + 0.05 * rng.rand(size, size),
            0.4 + 0.2 * yy + 0.05 * rng.rand(size, size),
            0.8 - 0.5 * yy + 0.05 * rng.rand(size, size),
        ],
        axis=-1,
    )
    return Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8))


def test_heuristic_depth_contract():
    d = heuristic_depth(photo())
    assert d.shape == (96, 96) and d.dtype == np.float32
    assert 0.0 <= d.min() and d.max() <= 1.0
    # deterministic
    np.testing.assert_array_equal(d, heuristic_depth(photo()))
    # ground-plane prior dominates: bottom rows nearer (larger) than top rows
    assert d[-8:].mean() > d[:8].mean() + 0.2


def test_make_hint_contract():
    h = make_hint(photo(), h=64, w=48)
    assert h.shape == (64, 48, 3) and h.dtype == np.float32
    assert 0.0 <= h.min() and h.max() <= 1.0
    # channels replicated (notebook HWC3 semantics)
    np.testing.assert_array_equal(h[..., 0], h[..., 1])
    np.testing.assert_array_equal(h[..., 0], h[..., 2])


def test_make_hint_custom_estimator():
    # pluggable estimator hook (converted MiDaS drops in here)
    grad = lambda img: np.tile(
        np.linspace(1, 0, 32, dtype=np.float32)[:, None], (1, 32)
    )
    h = make_hint(photo(), h=32, w=32, estimator=grad)
    np.testing.assert_allclose(h[0, :, 0], 1.0)
    np.testing.assert_allclose(h[-1, :, 0], 0.0)


def test_flat_input_does_not_blow_up():
    flat = Image.fromarray(np.full((32, 32, 3), 128, np.uint8))
    h = make_hint(flat)
    assert np.isfinite(h).all()
