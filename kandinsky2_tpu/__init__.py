"""kandinsky2_tpu — a TPU-native (JAX/XLA/Pallas) framework with the
capabilities of ai-forever/Kandinsky-2.

Public factory mirrors the reference (kandinsky2/__init__.py:164-192):

    from kandinsky2_tpu import get_kandinsky2
    model = get_kandinsky2(task_type="text2img", model_version="2.1")
    images = model.generate_text2img("a red cat", num_steps=100)

The ``device`` argument is accepted for API compatibility and ignored — JAX
owns device placement (the default backend is the TPU).
"""

import os as _os

from .configs import CONFIG_2_0, CONFIG_2_1

__version__ = "0.1.0"


def enable_compile_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at ``path`` (default
    ``$KANDINSKY2_TPU_CACHE_DIR`` or /tmp/jax_cache).

    Full-size programs take minutes to tens of minutes to compile over a
    tunneled TPU; the persistent cache turns every later process start into
    seconds.  Called automatically at package import unless
    ``KANDINSKY2_TPU_NO_CACHE=1`` — serving restarts and user scripts get
    warm starts without knowing about the cache (round-2 review: the cache
    was configured only in bench.py, so first pipeline calls from any other
    entry point paid the full cold compile)."""
    import jax

    path = path or _os.environ.get("KANDINSKY2_TPU_CACHE_DIR", "/tmp/jax_cache")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path


if _os.environ.get("KANDINSKY2_TPU_NO_CACHE", "") not in ("1", "true"):
    enable_compile_cache()


def get_kandinsky2_1(
    device=None,
    task_type: str = "text2img",
    cache_dir: str = "/tmp/kandinsky2",
    use_auth_token=None,
    use_flash_attention: bool = True,
    dtype=None,
):
    """Download + convert the 2.1 checkpoints and build the pipeline
    (reference kandinsky2/__init__.py:90-161)."""
    from .weights.hub import fetch_2_1
    from .weights.load_kandinsky import build_kandinsky21

    paths = fetch_2_1(cache_dir, task_type, use_auth_token)
    return build_kandinsky21(paths, task_type=task_type, dtype=dtype)


def get_kandinsky2(
    device=None,
    task_type: str = "text2img",
    cache_dir: str = "/tmp/kandinsky2",
    use_auth_token=None,
    model_version: str = "2.1",
    use_flash_attention: bool = True,
    dtype=None,
):
    """Reference-compatible entry point (kandinsky2/__init__.py:164-192)."""
    if model_version == "2.1":
        return get_kandinsky2_1(
            device, task_type=task_type, cache_dir=cache_dir,
            use_auth_token=use_auth_token,
            use_flash_attention=use_flash_attention, dtype=dtype,
        )
    if model_version == "2.2":
        # 2.2 checkpoints are diffusers-format snapshots; fetch the prior and
        # task-matched decoder repos and assemble a loaded pipeline, matching
        # the reference one-liner (kandinsky2_2_model.py:17-44).
        from .weights.hub import fetch_2_2
        from .weights.load_kandinsky22 import build_kandinsky22

        paths = fetch_2_2(cache_dir, task_type, use_auth_token)
        return build_kandinsky22(
            paths["prior_dir"], paths["decoder_dir"],
            task_type=task_type, dtype=dtype,
        )
    if model_version == "2.0":
        from .pipelines.kandinsky2_0 import get_kandinsky2_0

        return get_kandinsky2_0(
            device, task_type=task_type, cache_dir=cache_dir,
            use_auth_token=use_auth_token, dtype=dtype,
        )
    raise ValueError("Only 2.0, 2.1 and 2.2 are available")
