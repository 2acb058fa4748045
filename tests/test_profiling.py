"""Absolute perf accounting (profiling.py): the roofline math the README's
MFU table rests on, oracle-checked offline.

The device-measurement path (``_measure``) is exercised on the TPU by
``bench.py --profile``; here we pin the pure parts: peak lookup + env
override, and stage_report's achieved-TFLOPs / MFU / two-axis roofline
arithmetic against hand-computed values.
"""

import numpy as np
import pytest

from kandinsky2_tpu.profiling import (
    _chip_peaks,
    chip_peak_flops,
    hlo_traffic,
    stage_report,
)


def test_chip_peaks_env_override(monkeypatch):
    monkeypatch.setenv("KANDINSKY2_TPU_PEAK_TFLOPS", "100")
    monkeypatch.setenv("KANDINSKY2_TPU_PEAK_GBS", "500")
    flops, bw = _chip_peaks()
    assert flops == 100e12 and bw == 500e9
    assert chip_peak_flops() == 100e12


def test_chip_peaks_unknown_device_is_none(monkeypatch):
    monkeypatch.delenv("KANDINSKY2_TPU_PEAK_TFLOPS", raising=False)

    class Dev:
        device_kind = "QuantumAbacus 9000"

    assert _chip_peaks(Dev()) == (None, None)


def test_chip_peaks_known_prefixes(monkeypatch):
    monkeypatch.delenv("KANDINSKY2_TPU_PEAK_TFLOPS", raising=False)

    class Dev:
        device_kind = "TPU v5 lite0"

    flops, bw = _chip_peaks(Dev())
    assert flops == 197e12 and bw == 819e9  # v5e public spec


def test_stage_report_oracle():
    """Hand-computed roofline: 1 TFLOP in 10 ms on a (100 TFLOP/s, 1 TB/s)
    chip moving 5 GB -> 100 GFLOP/s achieved? No: 1e12/0.01 = 100 TFLOP/s
    => MFU 100%? Work it out exactly below."""
    stages = {"s": {"seconds": 0.01, "flops": 5e11, "bytes": 5e9}}
    rep = stage_report(stages, peak_flops=100e12, peak_bw=1000e9)["s"]
    # achieved = 5e11 / 0.01 = 5e13 = 50 TFLOP/s -> 50% MFU
    assert rep["achieved_tflops"] == pytest.approx(50.0)
    assert rep["mfu_pct"] == pytest.approx(50.0)
    # bandwidth: 5e9 B / 0.01 s = 500 GB/s of 1000 -> 50%
    assert rep["achieved_gbps"] == pytest.approx(500.0)
    assert rep["hbm_bw_pct"] == pytest.approx(50.0)
    # intensity 100 FLOP/B < ridge 100e12/1000e9 = 100 -> tie goes compute
    assert rep["flops_per_byte"] == pytest.approx(100.0)
    # floors: compute 5e11/1e14 = 5 ms; bw 5e9/1e12 = 5 ms (equal)
    assert rep["roofline_floor_seconds"] == pytest.approx(0.005)
    assert rep["roofline_bound"] == "compute"  # compute_floor >= bw_floor
    assert rep["pct_of_roofline"] == pytest.approx(50.0)


def test_stage_report_memory_bound_verdict():
    # 1 GFLOP over 10 GB: intensity 0.1 -> memory-bound on any real chip
    stages = {"s": {"seconds": 0.02, "flops": 1e9, "bytes": 10e9}}
    rep = stage_report(stages, peak_flops=100e12, peak_bw=1000e9)["s"]
    assert rep["roofline_bound"] == "memory"
    # bw floor = 10e9/1e12 = 10 ms; measured 20 ms -> 50% of roofline
    assert rep["pct_of_roofline"] == pytest.approx(50.0)
    assert rep["roofline_floor_seconds"] == pytest.approx(0.01)


def test_stage_report_no_peaks_degrades():
    stages = {"s": {"seconds": 0.01, "flops": 1e9, "bytes": 0.0}}
    rep = stage_report(stages, peak_flops=None, peak_bw=None)["s"]
    assert "mfu_pct" not in rep and "roofline_bound" not in rep
    assert rep["flops_per_byte"] is None
    assert rep["achieved_tflops"] == pytest.approx(0.1)


def test_hlo_traffic_matmul_bounds():
    """matmul+gelu+residual: params/outputs are counted exactly, the floor
    never drops below the information-theoretic minimum (read each input
    once, write the output once), and XLA's per-use aggregate — the r4
    bug — sits at or above our per-buffer model."""
    import jax
    import jax.numpy as jnp

    def f(x, w):
        return jax.nn.gelu(jnp.dot(x, w)) + x

    x = jnp.zeros((256, 512), jnp.float32)
    w = jnp.zeros((512, 512), jnp.float32)
    compiled = jax.jit(f).lower(x, w).compile()
    t = hlo_traffic(compiled.as_text())
    params = (256 * 512 + 512 * 512) * 4
    out = 256 * 512 * 4
    assert t["param_bytes"] == params
    assert t["output_bytes"] == out
    # the minimum possible traffic; exact equality depends on fusion
    # decisions (the backend may or may not materialize the dot), so pin
    # the bound, not the fusion
    assert params + out <= t["hbm_floor_bytes"] <= t["hbm_bytes"]
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    assert float(ca["bytes accessed"]) >= t["hbm_bytes"]


def test_hlo_traffic_floor_le_model_and_positive():
    """Bound invariants on a graph with operand re-use across instructions:
    floor <= model, both >= param+output (every materialized buffer is
    written), both finite."""
    import jax
    import jax.numpy as jnp

    def f(x, w1, w2):
        a = jnp.tanh(jnp.dot(x, w1))
        b = jnp.tanh(jnp.dot(x, w2))  # x consumed by two instructions
        return jnp.dot(a, b.T)

    x = jnp.zeros((128, 256), jnp.float32)
    w1 = jnp.zeros((256, 128), jnp.float32)
    w2 = jnp.zeros((256, 128), jnp.float32)
    compiled = jax.jit(f).lower(x, w1, w2).compile()
    t = hlo_traffic(compiled.as_text())
    assert 0 < t["hbm_floor_bytes"] <= t["hbm_bytes"]
    assert t["hbm_floor_bytes"] >= t["param_bytes"] + t["output_bytes"]


def test_stage_report_floor_above_wall_raises():
    """pct_of_roofline <= 100 is enforced, not just reported: a stage whose
    'floor' beats its measured wall (the r4 prior_step pathology) must
    raise instead of emitting an impossible number."""
    stages = {"s": {
        "seconds": 0.005, "flops": 1e9, "bytes": 10e9,
        "hbm_bytes": 10e9, "hbm_floor_bytes": 10e9,
    }}
    with pytest.raises(AssertionError, match="not a floor"):
        stage_report(stages, peak_flops=100e12, peak_bw=1000e9)


def test_stage_report_uses_floor_bytes_for_roofline():
    """The roofline floor is built from hbm_floor_bytes, while achieved
    bandwidth uses the traffic model — the split that keeps the floor a
    floor when the model overcounts."""
    stages = {"s": {
        "seconds": 0.02, "flops": 1e9, "bytes": 30e9,
        "hbm_bytes": 16e9, "hbm_floor_bytes": 10e9,
    }}
    rep = stage_report(stages, peak_flops=100e12, peak_bw=1000e9)["s"]
    assert rep["roofline_floor_seconds"] == pytest.approx(0.01)
    assert rep["pct_of_roofline"] == pytest.approx(50.0)
    assert rep["achieved_gbps"] == pytest.approx(800.0)  # model bytes
    assert rep["hbm_gb"] == pytest.approx(16.0)
    assert rep["hbm_floor_gb"] == pytest.approx(10.0)
    assert rep["xla_bytes_gb"] == pytest.approx(30.0)


def test_profile_21_on_cpu_smoke():
    """profile_21 runs end to end on the CPU backend (peaks unknown ->
    no MFU keys) against a tiny pipeline and models the per-image cost."""
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    import jax.numpy as jnp

    from kandinsky2_tpu.pipelines import Kandinsky2_1
    from kandinsky2_tpu.profiling import profile_21
    from test_pipeline21 import StubBPETokenizer, StubHFTokenizer, tiny_config

    pipe = Kandinsky2_1(
        config=tiny_config(), tokenizer1=StubHFTokenizer(),
        tokenizer2=StubBPETokenizer(), task_type="text2img",
        dtype=jnp.float32,
    )
    pipe.init_random_params()
    prof = profile_21(pipe, h=64, w=64, steps=4, prior_steps=3, iters=2)
    assert set(prof["stages"]) == {
        "unet_step", "movq_decode", "prior_step", "clip_text", "xlmr"}
    for s in prof["stages"].values():
        assert s["seconds"] > 0 and np.isfinite(s["gflops"])
    m = prof["model"]
    assert m["per_image_seconds_modeled"] > 0
    assert 0 <= m["unet_share_pct"] <= 100
