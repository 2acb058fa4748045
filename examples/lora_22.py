"""Rank-4 LoRA on the 2.2 decoder (reference notebooks/lora_decoder.ipynb):
init factors, merge as a weight delta, generate."""
import jax
from common import argparser, make_pipe22
from kandinsky2_tpu.models.lora import init_lora, merge_lora

args = argparser().parse_args()
pipe, kw = make_pipe22(args.small)
loras = init_lora(pipe.params["unet"], jax.random.PRNGKey(0), rank=4)
print(f"{len(loras)} attention kernels adapted")
pipe.params["unet"] = merge_lora(pipe.params["unet"], loras, scale=1.0)
imgs = pipe.generate_text2img(args.prompt, **kw)
imgs[0].save(args.out)
print("saved", args.out, imgs[0].size)
