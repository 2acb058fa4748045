"""Import pieces of the torch reference (/root/reference) for parity tests.

The reference package's top-level ``__init__`` pulls in unavailable deps
(huggingface downloads, omegaconf, clip), so we mount its submodule
directories as standalone namespace packages and stub the ``clip`` package.
Reference code is only *executed* for comparison — never copied.
"""

import importlib
import sys
import types

REF_MODEL = "/root/reference/kandinsky2/model"
REF_VQGAN = "/root/reference/kandinsky2/vqgan"
REF_TRAIN = "/root/reference/kandinsky2/train_utils"


def _ensure_pkg(name: str, path: str) -> types.ModuleType:
    if name in sys.modules:
        return sys.modules[name]
    pkg = types.ModuleType(name)
    pkg.__path__ = [path]
    sys.modules[name] = pkg
    return pkg


def stub_clip() -> None:
    """Minimal stand-in for the OpenAI ``clip`` package (tokenizer only),
    enough to import reference prior.py."""
    if "clip" in sys.modules:
        return
    clip = types.ModuleType("clip")
    st = types.ModuleType("clip.simple_tokenizer")

    class SimpleTokenizer:
        def __init__(self, bpe_path=None):
            self.encoder = {"<|startoftext|>": 49406, "<|endoftext|>": 49407}

        def encode(self, text):
            return [min(ord(c), 49405) for c in text]

    st.SimpleTokenizer = SimpleTokenizer
    st.default_bpe = lambda: None
    clip.simple_tokenizer = st
    clip.load = None
    sys.modules["clip"] = clip
    sys.modules["clip.simple_tokenizer"] = st


def ref_model(name: str):
    """Import ``kandinsky2/model/<name>.py`` from the reference."""
    stub_clip()
    _ensure_pkg("refk_model", REF_MODEL)
    return importlib.import_module(f"refk_model.{name}")


def stub_pytorch_lightning() -> None:
    """autoencoder.py subclasses pl.LightningModule; nn.Module suffices."""
    if "pytorch_lightning" in sys.modules:
        return
    import torch

    pl = types.ModuleType("pytorch_lightning")
    pl.LightningModule = torch.nn.Module
    pl.LightningDataModule = object
    sys.modules["pytorch_lightning"] = pl


def ref_vqgan(name: str):
    """Import ``kandinsky2/vqgan/<name>.py`` from the reference."""
    stub_pytorch_lightning()
    _ensure_pkg("refk_vqgan", REF_VQGAN)
    return importlib.import_module(f"refk_vqgan.{name}")


def ref_train(name: str):
    _ensure_pkg("refk_train", REF_TRAIN)
    return importlib.import_module(f"refk_train.{name}")
