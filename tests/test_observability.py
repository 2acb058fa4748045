"""Observability: stage timing, NaN guard, scan-safe progress."""

import jax
import jax.numpy as jnp
import numpy as np

from kandinsky2_tpu import observability as obs


def test_stage_report():
    rep = obs.StageReport()
    x = jnp.ones((8, 8))
    with rep.stage("a", result_to_sync=x):
        y = x * 2
    with rep.stage("b"):
        pass
    s = str(rep)
    assert "a" in s and "b" in s and "total" in s
    assert rep.times["a"] >= 0


def test_guard_finite_flag():
    x = jnp.array([1.0, float("nan")])
    # disabled: passthrough, no host callback
    assert obs.guard_finite(x, "x") is x
    obs.GUARD_NANS = True
    try:
        out = jax.jit(lambda v: obs.guard_finite(v, "x") * 2)(x)
        assert out.shape == x.shape
    finally:
        obs.GUARD_NANS = False


def test_scan_progress_inside_scan(capsys):
    def step(c, i):
        obs.scan_progress(i, 4, label="t")
        return c + 1, None

    out, _ = jax.lax.scan(step, jnp.zeros(()), jnp.arange(4))
    jax.effects_barrier()
    assert float(out) == 4.0
