"""Checkpoint download + cache (same UX as the reference factory,
kandinsky2/__init__.py:12-161).

Files land in ``<cache_dir>/<version>/...`` with the reference's layout so a
cache populated by the torch reference is reused as-is.  All fetching is
gated: offline environments can point the loaders at pre-downloaded files.
"""

from __future__ import annotations

import os
import urllib.request

REPO_2_0 = "sberbank-ai/Kandinsky_2.0"
REPO_2_1 = "sberbank-ai/Kandinsky_2.1"

TEXT_ENCODER_FILES = [
    "config.json",
    "pytorch_model.bin",
    "sentencepiece.bpe.model",
    "special_tokens_map.json",
    "tokenizer.json",
    "tokenizer_config.json",
]

# openai CLIP ViT-L/14 (the 2.1 pipeline loads it via clip.load,
# kandinsky2_1_model.py:64)
CLIP_VIT_L14_URL = (
    "https://openaipublic.azureedge.net/clip/models/"
    "b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737a03836/ViT-L-14.pt"
)
CLIP_BPE_URL = (
    "https://github.com/openai/CLIP/raw/main/clip/bpe_simple_vocab_16e6.txt.gz"
)


def _hf_download(repo_id: str, filename: str, dest: str, use_auth_token=None):
    if os.path.exists(dest):
        return dest
    from huggingface_hub import hf_hub_download

    os.makedirs(os.path.dirname(dest), exist_ok=True)
    path = hf_hub_download(
        repo_id=repo_id, filename=filename, token=use_auth_token
    )
    if os.path.abspath(path) != os.path.abspath(dest):
        import shutil

        shutil.copyfile(path, dest)
    return dest


def _url_download(url: str, dest: str):
    if os.path.exists(dest):
        return dest
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    tmp = dest + ".tmp"
    urllib.request.urlretrieve(url, tmp)
    os.replace(tmp, dest)
    return dest


def fetch_2_1(cache_dir: str = "/tmp/kandinsky2", task_type: str = "text2img",
              use_auth_token=None) -> dict:
    """Download all 2.1 artifacts (kandinsky2/__init__.py:100-158); returns
    a dict of local paths."""
    cd = os.path.join(cache_dir, "2_1")
    decoder = "decoder_fp16.ckpt" if task_type == "text2img" else "inpainting_fp16.ckpt"
    paths = {
        "decoder": _hf_download(REPO_2_1, decoder, os.path.join(cd, decoder),
                                use_auth_token),
        "prior": _hf_download(REPO_2_1, "prior_fp16.ckpt",
                              os.path.join(cd, "prior_fp16.ckpt"), use_auth_token),
        "movq": _hf_download(REPO_2_1, "movq_final.ckpt",
                             os.path.join(cd, "movq_final.ckpt"), use_auth_token),
        "clip_stats": _hf_download(REPO_2_1, "ViT-L-14_stats.th",
                                   os.path.join(cd, "ViT-L-14_stats.th"),
                                   use_auth_token),
        "text_encoder": os.path.join(cd, "text_encoder"),
        "clip": _url_download(CLIP_VIT_L14_URL, os.path.join(cd, "ViT-L-14.pt")),
        "bpe": _url_download(CLIP_BPE_URL, os.path.join(cd, "bpe_simple_vocab_16e6.txt.gz")),
    }
    for name in TEXT_ENCODER_FILES:
        _hf_download(REPO_2_1, f"text_encoder/{name}",
                     os.path.join(cd, "text_encoder", name), use_auth_token)
    return paths


def fetch_2_0(cache_dir: str = "/tmp/kandinsky2", task_type: str = "text2img",
              use_auth_token=None) -> dict:
    """kandinsky2/__init__.py:12-84."""
    cd = os.path.join(cache_dir, "2_0")
    unet = "Kandinsky-2-0-inpainting.pt" if task_type == "inpainting" else "Kandinsky-2-0.pt"
    paths = {
        "unet": _hf_download(REPO_2_0, unet, os.path.join(cd, unet), use_auth_token),
        "vae": _hf_download(REPO_2_0, "vae.ckpt", os.path.join(cd, "vae.ckpt"),
                            use_auth_token),
        "text_encoder1": os.path.join(cd, "text_encoder1"),
        "text_encoder2": os.path.join(cd, "text_encoder2"),
    }
    for name in TEXT_ENCODER_FILES:
        _hf_download(REPO_2_0, f"text_encoder1/{name}",
                     os.path.join(cd, "text_encoder1", name), use_auth_token)
    for name in ["config.json", "pytorch_model.bin", "spiece.model",
                 "special_tokens_map.json", "tokenizer_config.json"]:
        _hf_download(REPO_2_0, f"text_encoder2/{name}",
                     os.path.join(cd, "text_encoder2", name), use_auth_token)
    return paths


KANDINSKY_22_REPOS = {
    "prior": "kandinsky-community/kandinsky-2-2-prior",
    "decoder": "kandinsky-community/kandinsky-2-2-decoder",
    "decoder-inpaint": "kandinsky-community/kandinsky-2-2-decoder-inpaint",
    "controlnet-depth": "kandinsky-community/kandinsky-2-2-controlnet-depth",
}
