"""Public-API signature parity: every parameter of the reference pipelines'
generate_* methods must be accepted by ours (a reference user's call sites
keep working verbatim); extras we add must be keyword-only-with-default."""

import inspect
import sys
import types

import pytest

from ref_loader import _ensure_pkg, stub_clip, stub_pytorch_lightning


def _stub_omegaconf():
    if "omegaconf" in sys.modules:
        return
    m = types.ModuleType("omegaconf")
    m.OmegaConf = object
    dc = types.ModuleType("omegaconf.dictconfig")
    dc.DictConfig = dict
    m.dictconfig = dc
    sys.modules["omegaconf"] = m
    sys.modules["omegaconf.dictconfig"] = dc


def _stub_diffusers():
    if "diffusers" in sys.modules:
        return
    m = types.ModuleType("diffusers")
    for cls in ("KandinskyV22Pipeline", "KandinskyV22PriorPipeline",
                "KandinskyV22Img2ImgPipeline", "KandinskyV22InpaintPipeline"):
        setattr(m, cls, type(cls, (), {}))
    models = types.ModuleType("diffusers.models")
    models.UNet2DConditionModel = type("UNet2DConditionModel", (), {})
    m.models = models
    sys.modules["diffusers"] = m
    sys.modules["diffusers.models"] = models


def _ref_pipeline(name):
    stub_clip()
    stub_pytorch_lightning()
    _stub_omegaconf()
    _stub_diffusers()
    _ensure_pkg("refk", "/root/reference/kandinsky2")
    import importlib

    return importlib.import_module(f"refk.{name}")


def _param_names(fn):
    return [
        p.name
        for p in inspect.signature(fn).parameters.values()
        if p.name not in ("self",)
    ]


def _check(ref_fn, our_fn):
    ours = inspect.signature(our_fn).parameters
    for name in _param_names(ref_fn):
        assert name in ours, f"missing reference parameter: {name}"
    # our additions must not break positional call sites
    ref_names = set(_param_names(ref_fn))
    for name, p in ours.items():
        if name in ("self",) or name in ref_names:
            continue
        assert p.default is not inspect.Parameter.empty, (
            f"added parameter {name} must have a default"
        )


@pytest.mark.parametrize(
    "method", ["generate_text2img", "generate_img2img", "generate_inpainting",
               "mix_images"]
)
def test_21_signatures(method):
    ref = _ref_pipeline("kandinsky2_1_model").Kandinsky2_1
    from kandinsky2_tpu.pipelines import Kandinsky2_1

    _check(getattr(ref, method), getattr(Kandinsky2_1, method))


@pytest.mark.parametrize(
    "method", ["generate_text2img", "generate_img2img", "generate_inpainting"]
)
def test_20_signatures(method):
    ref = _ref_pipeline("kandinsky2_model").Kandinsky2
    from kandinsky2_tpu.pipelines import Kandinsky2

    _check(getattr(ref, method), getattr(Kandinsky2, method))


@pytest.mark.parametrize(
    "method", ["generate_text2img", "generate_img2img", "generate_inpainting",
               "mix_images"]
)
def test_22_signatures(method):
    ref = _ref_pipeline("kandinsky2_2_model").Kandinsky2_2
    from kandinsky2_tpu.pipelines import Kandinsky2_2

    _check(getattr(ref, method), getattr(Kandinsky2_2, method))


def test_compile_cache_enabled_at_import():
    """Package import points the persistent compilation cache somewhere
    (env-gated) so serving restarts never pay full-size cold compiles."""
    import jax

    import kandinsky2_tpu  # noqa: F401

    assert jax.config.jax_compilation_cache_dir
