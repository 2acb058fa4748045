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

# decoder repo key by pipeline task (kandinsky2_2_model.py:26-42: text2img /
# img2img / mix share the base decoder; inpainting and controlnet-depth have
# their own UNet repos)
_DECODER_KEY_BY_TASK = {
    "text2img": "decoder",
    "img2img": "decoder",
    "inpainting": "decoder-inpaint",
    "controlnet": "controlnet-depth",
}

# per-subfolder file manifests of the diffusers snapshots.  Inner tuples are
# alternatives tried in order (safetensors exports vs older .bin exports).
_PRIOR_SUBFOLDERS = {
    "prior": [
        "config.json",
        ("diffusion_pytorch_model.safetensors", "diffusion_pytorch_model.bin"),
    ],
    "image_encoder": [
        "config.json",
        ("model.safetensors", "pytorch_model.bin"),
    ],
    "text_encoder": [
        "config.json",
        ("model.safetensors", "pytorch_model.bin"),
    ],
    "tokenizer": [
        "vocab.json",
        "merges.txt",
        "tokenizer_config.json",
        "special_tokens_map.json",
    ],
}
_DECODER_SUBFOLDERS = {
    "unet": [
        "config.json",
        ("diffusion_pytorch_model.safetensors", "diffusion_pytorch_model.bin"),
    ],
    "movq": [
        "config.json",
        ("diffusion_pytorch_model.safetensors", "diffusion_pytorch_model.bin"),
    ],
}


def _hf_download_any(repo_id: str, filenames, dest_dir: str,
                     use_auth_token=None) -> str:
    """Download the first of ``filenames`` that exists in ``repo_id``,
    into ``dest_dir`` keeping the basename.  Short-circuits offline when any
    candidate is already cached locally."""
    if isinstance(filenames, str):
        filenames = (filenames,)
    for name in filenames:
        dest = os.path.join(dest_dir, os.path.basename(name))
        if os.path.exists(dest):
            return dest
    last_err = None
    for name in filenames:
        dest = os.path.join(dest_dir, os.path.basename(name))
        try:
            return _hf_download(repo_id, name, dest, use_auth_token)
        except Exception as e:  # missing-on-hub or transient; try the next
            last_err = e
    raise FileNotFoundError(
        f"none of {filenames} available from {repo_id}: {last_err}"
    )


def _fetch_snapshot(repo_id: str, local_dir: str, manifest: dict,
                    use_auth_token=None) -> str:
    for subfolder, files in manifest.items():
        sub_dir = os.path.join(local_dir, subfolder)
        for entry in files:
            names = entry if isinstance(entry, tuple) else (entry,)
            _hf_download_any(
                repo_id, tuple(f"{subfolder}/{n}" for n in names),
                sub_dir, use_auth_token,
            )
    return local_dir


# Depth producer for the ControlNet-depth task.  The default is the MiDaS
# hybrid — the EXACT model the reference notebook's MidasDetector runs
# (notebooks/kandinsky2_2_controlnet.ipynb: dpt_hybrid-midas), i.e. the
# conditioner whose hint statistics the kandinsky-2-2-controlnet-depth
# decoder was trained against.  The pure-ViT Intel/dpt-large also loads
# (higher-quality depth, but a distribution shift vs the training hints).
DPT_REPO = "Intel/dpt-hybrid-midas"
DPT_LARGE_REPO = "Intel/dpt-large"


def fetch_dpt(cache_dir: str = "/tmp/kandinsky2", repo_id: str = DPT_REPO,
              use_auth_token=None) -> str:
    """Download a HF DPT depth snapshot (hybrid or pure-ViT); returns the
    local dir for ``depth.dpt_estimator`` (pre-populated caches
    short-circuit offline)."""
    local = os.path.join(cache_dir, "dpt", repo_id.replace("/", "__"))
    _hf_download_any(repo_id, "config.json", local, use_auth_token)
    _hf_download_any(
        repo_id, ("model.safetensors", "pytorch_model.bin"), local,
        use_auth_token,
    )
    return local


def fetch_2_2(cache_dir: str = "/tmp/kandinsky2", task_type: str = "text2img",
              use_auth_token=None) -> dict:
    """Download the 2.2 diffusers snapshots the task needs (reference
    kandinsky2/kandinsky2_2_model.py:17-44 ``from_pretrained``s the prior
    repo's image_encoder/text_encoder/tokenizer/prior and the decoder repo's
    unet/movq).  Layout: ``<cache_dir>/2_2/{prior,<decoder-key>}/<subfolder>``.

    Returns ``{"prior_dir", "decoder_dir", "tokenizer_dir"}`` — the local
    snapshot dirs ``load_kandinsky22.build_kandinsky22`` consumes.  A cache
    pre-populated with the same layout is used as-is (no network touched)."""
    if task_type not in _DECODER_KEY_BY_TASK:
        raise ValueError(
            f"unknown 2.2 task_type {task_type!r}; "
            f"one of {sorted(_DECODER_KEY_BY_TASK)}"
        )
    cd = os.path.join(cache_dir, "2_2")
    decoder_key = _DECODER_KEY_BY_TASK[task_type]
    prior_dir = _fetch_snapshot(
        KANDINSKY_22_REPOS["prior"], os.path.join(cd, "prior"),
        _PRIOR_SUBFOLDERS, use_auth_token,
    )
    decoder_dir = _fetch_snapshot(
        KANDINSKY_22_REPOS[decoder_key], os.path.join(cd, decoder_key),
        _DECODER_SUBFOLDERS, use_auth_token,
    )
    return {
        "prior_dir": prior_dir,
        "decoder_dir": decoder_dir,
        "tokenizer_dir": os.path.join(prior_dir, "tokenizer"),
    }
