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


def _torch_layout_dicts(params):
    """torch-layout (OIHW / [1,ch,1,1]) numpy dicts from the random tree."""
    alex_sd, lin_sd = {}, {}
    for key, *_ in L._CONVS:
        alex_sd[f"{key}.weight"] = np.ascontiguousarray(
            np.asarray(params[key]["kernel"]).transpose(3, 2, 0, 1))
        alex_sd[f"{key}.bias"] = np.asarray(params[key]["bias"])
    for i, ch in enumerate(L.CHANNELS):
        lin_sd[f"lin{i}.model.1.weight"] = np.asarray(
            params[f"lin{i}"]["weight"]).reshape(1, ch, 1, 1)
    return alex_sd, lin_sd


def test_convert_torch_files_unwraps_pickled_modules(params, images, tmp_path):
    """convert_torch_files must unwrap pickled MODULE objects, not only
    state_dicts — lpips/torchvision checkpoints are often saved as full
    modules (the r4 `sd = sd.state_dict()` loop-rebind bug made this crash)."""
    torch = pytest.importorskip("torch")

    alex_sd, lin_sd = _torch_layout_dicts(params)
    feats = torch.nn.Sequential()
    in_ch, last = 3, 0
    for key, out_ch, k, stride, pad, _ in L._CONVS:
        idx = int(key.split(".")[1])
        while last < idx:
            feats.add_module(str(last), torch.nn.Identity())
            last += 1
        conv = torch.nn.Conv2d(in_ch, out_ch, k, stride=stride, padding=pad)
        with torch.no_grad():
            conv.weight.copy_(torch.from_numpy(alex_sd[f"{key}.weight"]))
            conv.bias.copy_(torch.from_numpy(alex_sd[f"{key}.bias"]))
        feats.add_module(str(idx), conv)
        last = idx + 1
        in_ch = out_ch
    alex_mod = torch.nn.Module()
    alex_mod.features = feats
    lin_mod = torch.nn.Module()
    for i, ch in enumerate(L.CHANNELS):
        head = torch.nn.Conv2d(ch, 1, 1, bias=False)
        with torch.no_grad():
            head.weight.copy_(
                torch.from_numpy(lin_sd[f"lin{i}.model.1.weight"]))
        sub = torch.nn.Module()
        sub.model = torch.nn.Sequential(torch.nn.Identity(), head)
        setattr(lin_mod, f"lin{i}", sub)

    ap = str(tmp_path / "alex_module.pth")
    lp = str(tmp_path / "lin_module.pth")
    op = str(tmp_path / "converted.safetensors")
    torch.save(alex_mod, ap)
    torch.save(lin_mod, lp)
    L.convert_torch_files(ap, lp, op)
    loaded = L.load_lpips_weights(op)
    a, b = images
    got = np.asarray(L.lpips_distance(loaded, jnp.asarray(a), jnp.asarray(b)))
    want = np.asarray(L.lpips_distance(params, jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(got, want)


def test_convert_full_lpips_checkpoint_single_file(params, images, tmp_path):
    """A full lpips.LPIPS state_dict keeps the backbone under
    net.sliceK.IDX.* (torchvision feature indices preserved inside each
    slice); one such file passed as BOTH inputs must convert."""
    torch = pytest.importorskip("torch")

    alex_sd, lin_sd = _torch_layout_dicts(params)
    slice_of = {0: "slice1", 3: "slice2", 6: "slice3", 8: "slice4",
                10: "slice5"}
    full = {"scaling_layer.shift": torch.zeros(1, 3, 1, 1),
            "scaling_layer.scale": torch.ones(1, 3, 1, 1)}
    for key, *_ in L._CONVS:
        idx = int(key.split(".")[1])
        full[f"net.{slice_of[idx]}.{idx}.weight"] = torch.from_numpy(
            alex_sd[f"{key}.weight"])
        full[f"net.{slice_of[idx]}.{idx}.bias"] = torch.from_numpy(
            alex_sd[f"{key}.bias"])
    for k, v in lin_sd.items():
        full[k] = torch.from_numpy(v)
    p = str(tmp_path / "lpips_full.pth")
    op = str(tmp_path / "converted.safetensors")
    torch.save(full, p)
    L.convert_torch_files(p, p, op)
    loaded = L.load_lpips_weights(op)
    a, b = images
    got = np.asarray(L.lpips_distance(loaded, jnp.asarray(a), jnp.asarray(b)))
    want = np.asarray(L.lpips_distance(params, jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(got, want)
