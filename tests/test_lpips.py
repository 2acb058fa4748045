"""Native LPIPS: numpy-oracle parity, torch-state-dict conversion, metric
properties, and the validate.py --lpips-weights wiring.

The oracle reimplements the published formula (scaling layer -> AlexNet
features -> channel unit-normalization -> squared diff -> non-negative
linear heads -> spatial mean -> sum over taps) with plain numpy loops, so
the jitted JAX path is checked against an independent derivation."""

import numpy as np
import pytest

import jax.numpy as jnp

from kandinsky2_tpu import lpips as L


# ---------------------------------------------------------------------------
# numpy oracle
# ---------------------------------------------------------------------------


def _np_conv2d(x, kernel, bias, stride, pad):
    """NHWC x HWIO, explicit padding — plain loops, small shapes only."""
    x = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    kh, kw, cin, cout = kernel.shape
    n, h, w, _ = x.shape
    oh = (h - kh) // stride + 1
    ow = (w - kw) // stride + 1
    out = np.zeros((n, oh, ow, cout), np.float32)
    for i in range(oh):
        for j in range(ow):
            patch = x[:, i * stride:i * stride + kh, j * stride:j * stride + kw, :]
            out[:, i, j, :] = np.tensordot(patch, kernel, axes=([1, 2, 3], [0, 1, 2]))
    return out + bias


def _np_maxpool(x):
    n, h, w, c = x.shape
    oh = (h - 3) // 2 + 1
    ow = (w - 3) // 2 + 1
    out = np.zeros((n, oh, ow, c), np.float32)
    for i in range(oh):
        for j in range(ow):
            out[:, i, j, :] = x[:, 2 * i:2 * i + 3, 2 * j:2 * j + 3, :].max((1, 2))
    return out


def _np_lpips(params, a, b):
    def feats(x):
        h = (x - L.SHIFT) / L.SCALE
        out = []
        for key, _, _, stride, pad, pool in L._CONVS:
            if pool:
                h = _np_maxpool(h)
            p = params[key]
            h = np.maximum(
                _np_conv2d(h, np.asarray(p["kernel"]), np.asarray(p["bias"]),
                           stride, pad), 0.0)
            out.append(h)
        return out

    total = 0.0
    for i, (x, y) in enumerate(zip(feats(a), feats(b))):
        xn = x / (np.sqrt((x ** 2).sum(-1, keepdims=True)) + 1e-10)
        yn = y / (np.sqrt((y ** 2).sum(-1, keepdims=True)) + 1e-10)
        d = (xn - yn) ** 2
        w = np.asarray(params[f"lin{i}"]["weight"])
        total = total + (d * w).sum(-1).mean((1, 2))
    return total


@pytest.fixture(scope="module")
def params():
    return L.init_random_lpips(seed=3)


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(7)
    a = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), -1, 1).astype(np.float32)
    return a, b


def test_matches_numpy_oracle(params, images):
    a, b = images
    got = np.asarray(L.lpips_distance(params, jnp.asarray(a), jnp.asarray(b)))
    want = _np_lpips(params, a, b)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)
    assert (want > 0).all()  # distinct images -> strictly positive


def test_metric_properties(params, images):
    a, b = images
    d_aa = np.asarray(L.lpips_distance(params, jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(d_aa, 0.0, atol=1e-8)
    d_ab = np.asarray(L.lpips_distance(params, jnp.asarray(a), jnp.asarray(b)))
    d_ba = np.asarray(L.lpips_distance(params, jnp.asarray(b), jnp.asarray(a)))
    np.testing.assert_allclose(d_ab, d_ba, rtol=1e-6)


def test_torch_state_dict_conversion(params, images):
    """Synthesize the published torch layouts (alexnet OIHW convs + lpips
    lin{i}.model.1.weight [1,ch,1,1]) from the random tree; conversion must
    reproduce the same distances bit-for-bit."""
    alex_sd, lin_sd = {}, {}
    for key, _, _, _, _, _ in L._CONVS:
        alex_sd[f"{key}.weight"] = np.ascontiguousarray(
            np.asarray(params[key]["kernel"]).transpose(3, 2, 0, 1))
        alex_sd[f"{key}.bias"] = np.asarray(params[key]["bias"])
    for i, ch in enumerate(L.CHANNELS):
        lin_sd[f"lin{i}.model.1.weight"] = np.asarray(
            params[f"lin{i}"]["weight"]).reshape(1, ch, 1, 1)
    converted = L.convert_lpips_state_dicts(alex_sd, lin_sd)
    a, b = images
    got = np.asarray(L.lpips_distance(converted, jnp.asarray(a), jnp.asarray(b)))
    want = np.asarray(L.lpips_distance(params, jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(got, want)


def test_conversion_rejects_negative_heads(params):
    alex_sd = {}
    for key, *_ in L._CONVS:
        alex_sd[f"{key}.weight"] = np.ascontiguousarray(
            np.asarray(params[key]["kernel"]).transpose(3, 2, 0, 1))
        alex_sd[f"{key}.bias"] = np.asarray(params[key]["bias"])
    lin_sd = {
        f"lin{i}.model.1.weight": -np.ones((1, ch, 1, 1), np.float32)
        for i, ch in enumerate(L.CHANNELS)
    }
    with pytest.raises(ValueError, match="negative"):
        L.convert_lpips_state_dicts(alex_sd, lin_sd)


def test_save_load_roundtrip(params, images, tmp_path):
    p = str(tmp_path / "lpips_alex.safetensors")
    L.save_lpips_weights(params, p)
    loaded = L.load_lpips_weights(p)
    a, b = images
    got = np.asarray(L.lpips_distance(loaded, jnp.asarray(a), jnp.asarray(b)))
    want = np.asarray(L.lpips_distance(params, jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(got, want)


def test_lpips_images_pil(params):
    from PIL import Image

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    im = Image.fromarray(arr)
    assert L.lpips_images(params, im, im) == 0.0


def test_validate_reports_native_lpips(params, tmp_path):
    """--lpips-weights makes validate's metrics stage emit a real number with
    no torch/lpips import."""
    from PIL import Image

    from kandinsky2_tpu.validate import run_metrics

    wpath = str(tmp_path / "w.safetensors")
    L.save_lpips_weights(params, wpath)
    rng = np.random.default_rng(1)
    img = Image.fromarray(rng.integers(0, 256, (64, 64, 3), dtype=np.uint8))
    ref_dir = tmp_path / "ref"
    ref_dir.mkdir()
    img.save(ref_dir / "generated_0.png")
    report = {}
    run_metrics(report, [img], str(ref_dir), str(tmp_path / "out"),
                lpips_weights=wpath)
    m = report["metrics"][0]
    assert m["lpips_alex"] == 0.0
    assert m["lpips_gate_0.02"] is True
    assert m["lpips_backend"] == "native-jax"
