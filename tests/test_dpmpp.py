"""DPM-Solver++(2M) sampler: coefficient correctness and pipeline wiring.

Beyond-reference: the torch reference ships DDIM/PLMS only
(kandinsky2/model/samplers.py); DPM-Solver++ integrates the same
probability-flow ODE to second order.  Correctness anchors:

* On a model whose x0-prediction is constant (point-mass data), the
  data-prediction exponential integrator is EXACT, and equals the DDIM(eta=0)
  update step-for-step — any error in the lambda/phi/ratio tables breaks this
  equality.
* On a nonlinear eps model, 2M at S steps must beat DDIM at S steps against
  a fine-grained DDIM reference solution of the same ODE.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kandinsky2_tpu.diffusion import (
    ddim_loop,
    dpmpp_2m_loop,
    make_ddim_tables,
    make_dpmpp_karras_tables,
    make_dpmpp_tables,
    make_schedule,
)


@pytest.fixture(scope="module")
def base_acp():
    sched = make_schedule(
        steps=1000, linear_start=0.00085, linear_end=0.012,
    )
    return np.asarray(sched.alphas_cumprod, np.float64)


def _eps_point_mass(base_acp, target):
    """Exact eps for data = point mass at ``target``."""
    acp = jnp.asarray(base_acp, jnp.float32)

    def model_fn(x, t):
        a = acp[t.astype(jnp.int32)].reshape((-1,) + (1,) * (x.ndim - 1))
        return (x - jnp.sqrt(a) * target) / jnp.sqrt(1.0 - a)

    return model_fn


def test_dpmpp_matches_ddim_on_point_mass(base_acp):
    """Both solvers are exact for constant-x0 dynamics => identical output."""
    target = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 8, 4)),
                         jnp.float32)
    model_fn = _eps_point_mass(base_acp, target)
    x_T = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))

    for steps in (5, 10, 25):
        dd = make_ddim_tables(base_acp, steps)
        dp = make_dpmpp_tables(base_acp, steps)
        out_ddim = ddim_loop(model_fn, dd, x_T)
        out_dpm = dpmpp_2m_loop(model_fn, dp, x_T)
        np.testing.assert_allclose(
            np.asarray(out_dpm), np.asarray(out_ddim), atol=2e-4, rtol=0,
            err_msg=f"steps={steps}",
        )


def test_dpmpp_tables_walk_order(base_acp):
    dp = make_dpmpp_tables(base_acp, 10)
    ts = np.asarray(dp.timesteps)
    assert (np.diff(ts) < 0).all(), "tables must be in descending walk order"
    assert float(dp.c2[0]) == 0.0, "first step must be first-order"
    assert (np.asarray(dp.phi) < 0).all(), "phi = expm1(-h) with h > 0"


def test_dpmpp_second_order_beats_ddim(base_acp):
    """Nonlinear eps model: 2M at S steps closer to the fine-step solution
    than DDIM at S steps (the whole point of the second-order method)."""
    rng = np.random.default_rng(2)
    W = jnp.asarray(rng.normal(size=(16, 16)) / 4.0, jnp.float32)
    acp = jnp.asarray(base_acp, jnp.float32)

    def model_fn(x, t):
        # smooth nonlinear x0-prediction bounded in [-1,1] => well-behaved ODE
        a = acp[t.astype(jnp.int32)].reshape((-1, 1))
        x0_pred = jnp.tanh(x @ W)
        return (x - jnp.sqrt(a) * x0_pred) / jnp.sqrt(1.0 - a)

    x_T = jax.random.normal(jax.random.PRNGKey(3), (2, 16))
    ref = ddim_loop(model_fn, make_ddim_tables(base_acp, 500), x_T)

    S = 10
    err_ddim = float(jnp.abs(
        ddim_loop(model_fn, make_ddim_tables(base_acp, S), x_T) - ref
    ).max())
    err_dpm = float(jnp.abs(
        dpmpp_2m_loop(model_fn, make_dpmpp_tables(base_acp, S), x_T) - ref
    ).max())
    assert err_dpm < err_ddim, (err_dpm, err_ddim)
    assert err_dpm < 0.6 * err_ddim, (
        f"expected a clear second-order win: dpm={err_dpm} ddim={err_ddim}"
    )


def test_dpmpp_base_schedule_guard(base_acp):
    with pytest.raises(ValueError, match="base"):
        make_dpmpp_tables(base_acp[:100], 10)


def test_dpmpp_explicit_ladder_final_step_emits_x0(base_acp):
    """diffusers-convention ladder ends at t=0 targeting abar=1: the last
    update must collapse to returning the x0 prediction exactly."""
    from kandinsky2_tpu.diffusion.paired import ddpm_ladder

    ladder = ddpm_ladder(10)
    dp = make_dpmpp_tables(base_acp, ladder=ladder)
    assert float(dp.phi[-1]) == -1.0
    assert float(dp.sigma_ratio[-1]) == 0.0
    assert float(dp.alpha_next[-1]) == 1.0
    assert float(dp.c2[-1]) == 0.0
    assert all(np.isfinite(np.asarray(f)).all() for f in dp)

    # and the loop runs with it on a point-mass model, landing on the target
    target = jnp.asarray(np.random.default_rng(5).normal(size=(1, 4, 4, 2)),
                         jnp.float32)
    out = dpmpp_2m_loop(_eps_point_mass(base_acp, target), dp,
                        jax.random.normal(jax.random.PRNGKey(6), (1, 4, 4, 2)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(target), atol=1e-3)


def test_dpmpp_ladder_order_guard(base_acp):
    with pytest.raises(ValueError, match="descending"):
        make_dpmpp_tables(base_acp, ladder=np.array([0, 100, 200]))


def test_dpmpp_karras_grid_properties(base_acp):
    dp = make_dpmpp_karras_tables(base_acp, 12)
    ts = np.asarray(dp.timesteps)
    assert ts.dtype == np.float32
    assert (np.diff(ts) < 0).all(), "continuous t must descend"
    assert 0.0 <= ts[-1] and ts[0] <= 999.0
    sig = np.asarray(dp.sigma) / np.asarray(dp.alpha)
    assert (np.diff(sig) < 0).all(), "Karras sigmas must descend"
    # zero-final-sigma convention: last step emits x0
    assert float(dp.phi[-1]) == -1.0 and float(dp.alpha_next[-1]) == 1.0
    # Karras spacing is denser at low sigma than the uniform ladder's tail
    assert all(np.isfinite(np.asarray(f)).all() for f in dp)

    # init_step truncation caps the starting sigma
    dp_trunc = make_dpmpp_karras_tables(base_acp, 12, init_step=500)
    assert float(dp_trunc.timesteps[0]) <= 500.0


def test_dpmpp_karras_exact_on_point_mass(base_acp):
    """With an interpolated-abar point-mass model (x0-pred constant), the
    solver is exact regardless of grid, so the Karras walk must land on the
    target — validating the sigma->t mapping and table consistency."""
    acp = jnp.asarray(base_acp, jnp.float32)
    grid = jnp.arange(len(base_acp), dtype=jnp.float32)
    target = jnp.asarray(np.random.default_rng(9).normal(size=(1, 6, 6, 3)),
                         jnp.float32)

    def model_fn(x, t):
        a = jnp.interp(t, grid, acp).reshape((-1,) + (1,) * (x.ndim - 1))
        return (x - jnp.sqrt(a) * target) / jnp.sqrt(1.0 - a)

    dp = make_dpmpp_karras_tables(base_acp, 8)
    out = dpmpp_2m_loop(
        model_fn, dp, jax.random.normal(jax.random.PRNGKey(10), (1, 6, 6, 3))
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(target), atol=1e-3)


@pytest.mark.slow
def test_pipeline21_dpmpp_turbo_smoke():
    """Deep-branch caching (model_state) rides the dpmpp scan carry."""
    from test_pipeline21 import StubBPETokenizer, StubHFTokenizer, tiny_config
    from kandinsky2_tpu.pipelines import Kandinsky2_1

    p = Kandinsky2_1(
        config=tiny_config(), tokenizer1=StubHFTokenizer(),
        tokenizer2=StubBPETokenizer(), dtype=jnp.float32,
    )
    p.init_random_params()
    imgs = p.generate_text2img(
        "a red cat", num_steps=4, h=64, w=64, sampler="dpmpp_sampler",
        turbo_interval=2,
    )
    assert np.isfinite(np.asarray(imgs[0], np.float32)).all()


@pytest.mark.slow
def test_prior_dpmpp_21():
    """prior_steps="dpmppN" runs the 2M solver on the x0-predicting prior,
    in both the standalone prior call and the fused text2img program."""
    from test_pipeline21 import StubBPETokenizer, StubHFTokenizer, tiny_config
    from kandinsky2_tpu.pipelines import Kandinsky2_1

    p = Kandinsky2_1(
        config=tiny_config(), tokenizer1=StubHFTokenizer(),
        tokenizer2=StubBPETokenizer(), dtype=jnp.float32,
    )
    p.init_random_params()
    emb = p.generate_clip_emb("a red cat", prior_steps="dpmpp5")
    assert emb.shape[0] == 1 and np.isfinite(np.asarray(emb)).all()
    # deterministic solver: same seed => same embedding
    p.set_seed(3)
    e1 = np.asarray(p.generate_clip_emb("a red cat", prior_steps="dpmpp5"))
    p.set_seed(3)
    e2 = np.asarray(p.generate_clip_emb("a red cat", prior_steps="dpmpp5"))
    np.testing.assert_array_equal(e1, e2)

    imgs = p.generate_text2img(
        "a red cat", num_steps=4, h=64, w=64, sampler="dpmpp_sampler",
        prior_steps="dpmpp5",
    )
    assert np.isfinite(np.asarray(imgs[0], np.float32)).all()


@pytest.mark.slow
def test_pipeline22_img2img_dpmpp():
    """dpmpp over the strength-truncated 2.2 img2img ladder."""
    from PIL import Image
    from test_pipeline22 import make_pipe

    p = make_pipe("text2img")
    src = Image.fromarray(
        (np.random.default_rng(0).random((64, 64, 3)) * 255).astype(np.uint8)
    )
    imgs = p.generate_img2img(
        "a red cat", src, strength=0.5, decoder_steps=6, prior_steps=3,
        h=64, w=64, sampler="dpmpp",
    )
    assert np.isfinite(np.asarray(imgs[0], np.float32)).all()


@pytest.mark.slow
def test_pipeline22_img2img_karras_respects_truncation():
    """Regression: dpmpp_karras on a strength-truncated img2img ladder must
    cap sigma_max at the ladder start (x_T is only partially noised) —
    verified via the table start matching the ladder's noise level."""
    from kandinsky2_tpu.diffusion.paired import ddpm_ladder

    base = make_schedule(steps=1000, linear_start=0.00085, linear_end=0.012)
    acp = np.asarray(base.alphas_cumprod, np.float64)
    full = ddpm_ladder(100)
    t_start = len(full) - 40
    ladder = full[t_start:]  # strength 0.4: re-noised only to t = ladder[0]
    from kandinsky2_tpu.diffusion import make_dpmpp_karras_tables

    dp = make_dpmpp_karras_tables(acp, len(ladder),
                                  init_step=int(ladder[0]) + 1)
    sig_start = float(dp.sigma[0] / dp.alpha[0])
    sig_ladder = float(np.sqrt((1 - acp[ladder[0]]) / acp[ladder[0]]))
    assert abs(sig_start - sig_ladder) / sig_ladder < 1e-3
    # without the cap, the tables would start at full-process sigma_max
    sig_full = float(np.sqrt((1 - acp[-1]) / acp[-1]))
    assert sig_start < 0.5 * sig_full

    # and the pipeline path runs
    from PIL import Image
    from test_pipeline22 import make_pipe

    p = make_pipe("text2img")
    src = Image.fromarray(
        (np.random.default_rng(1).random((64, 64, 3)) * 255).astype(np.uint8)
    )
    imgs = p.generate_img2img(
        "a red cat", src, strength=0.5, decoder_steps=6, prior_steps=3,
        h=64, w=64, sampler="dpmpp_karras",
    )
    assert np.isfinite(np.asarray(imgs[0], np.float32)).all()


@pytest.mark.slow
def test_prior_dpmpp_22():
    from test_pipeline22 import make_pipe

    p = make_pipe("text2img")
    emb = p.run_prior("a red cat", prior_steps=5, sampler="dpmpp")
    assert emb.shape == (1, p.prior.embedding_dim)
    assert np.isfinite(np.asarray(emb)).all()
    with pytest.raises(ValueError, match="prior samplers"):
        p.run_prior("a red cat", prior_steps=5, sampler="bogus")

    # the full 2.2 stack: karras decoder + dpmpp prior + turbo caching
    imgs = p.generate_text2img(
        "a red cat", decoder_steps=6, prior_steps=4, h=64, w=64,
        sampler="dpmpp_karras", prior_sampler="dpmpp", turbo_interval=2,
    )
    assert np.isfinite(np.asarray(imgs[0], np.float32)).all()


@pytest.mark.slow
def test_pipeline21_dpmpp_karras_smoke():
    from test_pipeline21 import StubBPETokenizer, StubHFTokenizer, tiny_config
    from kandinsky2_tpu.pipelines import Kandinsky2_1

    p = Kandinsky2_1(
        config=tiny_config(), tokenizer1=StubHFTokenizer(),
        tokenizer2=StubBPETokenizer(), dtype=jnp.float32,
    )
    p.init_random_params()
    imgs = p.generate_text2img(
        "a red cat", num_steps=6, h=64, w=64, sampler="dpmpp_karras_sampler",
    )
    a = np.asarray(imgs[0], np.float32)
    assert a.shape == (64, 64, 3) and np.isfinite(a).all()


@pytest.mark.slow
def test_pipeline21_dpmpp_smoke():
    from test_pipeline21 import StubBPETokenizer, StubHFTokenizer, tiny_config
    from kandinsky2_tpu.pipelines import Kandinsky2_1

    p = Kandinsky2_1(
        config=tiny_config(), tokenizer1=StubHFTokenizer(),
        tokenizer2=StubBPETokenizer(), dtype=jnp.float32,
    )
    p.init_random_params()
    imgs = p.generate_text2img(
        "a red cat", num_steps=5, h=64, w=64, sampler="dpmpp_sampler",
    )
    a = np.asarray(imgs[0], np.float32)
    assert a.shape == (64, 64, 3) and np.isfinite(a).all()


@pytest.mark.slow
def test_pipeline22_dpmpp_smoke():
    from test_pipeline22 import make_pipe

    p = make_pipe("text2img")
    imgs = p.generate_text2img(
        "a red cat", decoder_steps=5, prior_steps=3, h=64, w=64,
        sampler="dpmpp",
    )
    a = np.asarray(imgs[0], np.float32)
    assert a.shape == (64, 64, 3) and np.isfinite(a).all()


@pytest.mark.slow
def test_pipeline20_dpmpp_smoke():
    from test_pipeline20 import StubHFTok, tiny_config20
    from kandinsky2_tpu.pipelines.kandinsky2_0 import Kandinsky2

    p = Kandinsky2(
        config=tiny_config20(), tokenizer1=StubHFTok(),
        tokenizer2=StubHFTok(), dtype=jnp.float32,
    )
    p.init_random_params()
    for s in ("dpmpp_sampler", "dpmpp_karras_sampler"):
        imgs = p.generate_text2img(
            "a red cat", num_steps=5, h=64, w=64, sampler=s,
        )
        a = np.asarray(imgs[0], np.float32)
        assert a.shape == (64, 64, 3) and np.isfinite(a).all(), s
