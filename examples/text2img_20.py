"""2.0 text2img (reference notebooks/Kandinsky_2_0_text2img.ipynb)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))
from common import argparser, StubHFTokenizer

args = argparser().parse_args()
if args.small:
    import jax.numpy as jnp
    from test_pipeline20 import tiny_config20
    from kandinsky2_tpu.pipelines import Kandinsky2

    pipe = Kandinsky2(config=tiny_config20(), tokenizer1=StubHFTokenizer(),
                      tokenizer2=StubHFTokenizer(), dtype=jnp.bfloat16)
    pipe.init_random_params(cast=jnp.bfloat16)
    kw = dict(num_steps=4, h=64, w=64)
else:
    from kandinsky2_tpu import get_kandinsky2

    pipe = get_kandinsky2(task_type="text2img", model_version="2.0")
    kw = dict(num_steps=100)
imgs = pipe.generate_text2img(args.prompt, sampler="ddim_sampler",
                              ddim_eta=0.05, **kw)
imgs[0].save(args.out)
print("saved", args.out, imgs[0].size)
