"""The one-command validation harness (python -m kandinsky2_tpu.validate):
offline it must run the full post-fetch ladder on an injected pipeline and
stop cleanly at fetch when the network is absent."""

import pytest
import json
import os

import numpy as np

import jax.numpy as jnp

from kandinsky2_tpu.validate import validate
from test_pipeline21 import StubBPETokenizer, StubHFTokenizer, tiny_config


def tiny_builder():
    from kandinsky2_tpu.pipelines import Kandinsky2_1

    pipe = Kandinsky2_1(
        config=tiny_config(), tokenizer1=StubHFTokenizer(),
        tokenizer2=StubBPETokenizer(), dtype=jnp.float32,
    )
    pipe.init_random_params()
    return pipe


@pytest.mark.slow
def test_validate_full_ladder_offline(tmp_path):
    """Bootstrap run saves references; second run scores PSNR=inf/SSIM=1
    against them (same seed => identical outputs)."""
    out_dir = str(tmp_path / "out")
    rep1 = validate(pipe_builder=tiny_builder, out_dir=out_dir,
                    h=64, w=64, num_steps=4)
    assert rep1["ok"], rep1
    assert rep1["stages"]["build"]["status"] == "ok"
    assert rep1["stages"]["generate"]["status"] == "ok"
    assert rep1["stages"]["metrics"]["status"] == "ok"
    assert os.path.exists(rep1["outputs"][0])
    assert "bootstrap" in rep1["metrics"]["note"]

    rep2 = validate(pipe_builder=tiny_builder, out_dir=str(tmp_path / "out2"),
                    reference_dir=out_dir, h=64, w=64, num_steps=4)
    assert rep2["ok"], rep2
    m = rep2["metrics"][0]
    assert m["psnr_db"] == float("inf") or m["psnr_db"] > 90
    assert m["ssim"] > 0.999
    # the LPIPS gate is honestly marked unevaluated without the package
    assert m["lpips_alex"] is None
    assert "not evaluated" in str(m["lpips_gate_0.02"])
    assert m["clip_cosine_drift"] < 1e-5
    json.dumps(rep2, default=str)  # report is JSON-serializable


def test_validate_stops_at_fetch_offline(monkeypatch):
    import kandinsky2_tpu.weights.hub as hub

    def no_network(*a, **k):
        raise OSError("network unavailable")

    monkeypatch.setattr(hub, "fetch_2_1", no_network)
    rep = validate(version="2.1", h=64, w=64, num_steps=4)
    assert not rep["ok"]
    assert rep["stopped_at"] == "fetch"
    assert rep["stages"]["fetch"]["status"] == "failed"
    assert "network unavailable" in rep["stages"]["fetch"]["error"]


def test_metrics_detect_drift(tmp_path):
    """A perturbed reference image scores below the parity thresholds."""
    from PIL import Image

    from kandinsky2_tpu.validate import run_metrics

    rng = np.random.RandomState(0)
    # smooth structured base (noise-on-noise keeps SSIM high; real images
    # are smooth, so perturbation must degrade the windowed statistic)
    g = np.linspace(0, 255, 64)
    base = np.stack(
        [np.add.outer(g, g) / 2] * 3, axis=-1
    ).astype(np.uint8)
    ref_dir = tmp_path / "ref"
    ref_dir.mkdir()
    noisy = np.clip(
        base.astype(np.int32) + rng.randint(-40, 40, base.shape), 0, 255
    ).astype(np.uint8)
    Image.fromarray(noisy).save(ref_dir / "generated_0.png")
    report = {}
    run_metrics(report, [Image.fromarray(base)], str(ref_dir),
                str(tmp_path / "out"))
    m = report["metrics"][0]
    assert m["psnr_db"] < 30 and m["ssim"] < 0.9
